"""Deterministic shading paths — BASELINE configs 1 and 2.

``shade_primary`` is the CPU reference renderer's shading
(software.rs:260-276): primary ray only, ``color * (sun·n / 2 + 1)``,
black background. ``shade_shadow`` adds the hard shadow term that the
reference left commented out (software.rs:270-271):
``lighting *= shadow/2 + 0.5`` plus a simple sky gradient for misses —
this is the config-2 ("primary + hard shadow rays with sky/sun shading")
path. Both are fully deterministic, so they anchor the pixel-exact
parity tests between backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voxtracer.core.vecmath import dot
from voxtracer.kernels.traverse import dense_raycast, leaf_rgb, svo_raycast


def _svo_cast(table, root, height):
    def cast(start, d, distance=None):
        kw = {} if distance is None else dict(distance=distance)
        r = svo_raycast(table, root, height, start, d, **kw)
        return r, leaf_rgb(table, r["node"])

    return cast


def _dense_cast(solid, rgb, size):
    def cast(start, d, distance=None):
        kw = {} if distance is None else dict(distance=distance)
        r = dense_raycast(solid, start, d, size, **kw)
        v = r["voxel"]
        col = rgb[v[..., 0], v[..., 1], v[..., 2]]
        return r, jnp.where(r["hit"][..., None], col, 0.0)

    return cast


def shade_primary(cast, start, d, sun):
    """software.rs raytrace(): N·L-ish lighting, black background."""
    r, rgb = cast(start, d)
    lighting = dot(sun, r["normal"]) / 2.0 + 1.0
    return rgb * lighting[..., None] * r["hit"][..., None]


def sky_color(d, sun):
    """Simple analytic sky for the deterministic config-2 path: horizon-to-
    zenith blue gradient plus a white sun disk (voxtracer's own model —
    the reference has no deterministic sky)."""
    zenith = jnp.asarray([0.25, 0.45, 0.85], jnp.float32)
    horizon = jnp.asarray([0.65, 0.75, 0.9], jnp.float32)
    h = jnp.clip(d[..., 1], 0.0, 1.0)[..., None]
    sky = horizon * (1 - h) + zenith * h
    from voxtracer.core.sampling import COS_SUN_RADIUS

    disk = (dot(d, sun) > COS_SUN_RADIUS)[..., None]
    return jnp.where(disk, jnp.asarray([10.0, 10.0, 10.0]), sky)


def shade_shadow(cast, start, d, sun, shadow_eps: float = 1.0e-3):
    """Config 2: primary + hard sun-shadow ray + sky for misses.

    The shadow ray starts at hit_point - d*eps (the nudge the reference's
    commented-out line used, software.rs:270).
    """
    r, rgb = cast(start, d)
    hit = r["hit"]
    p = start + d * r["t"][..., None] - d * shadow_eps
    sr, _ = cast(p, jnp.broadcast_to(sun, d.shape))
    lit = ~sr["hit"]
    lighting = dot(sun, r["normal"]) / 2.0 + 1.0
    lighting = lighting * jnp.where(lit, 1.0, 0.5)
    surface = rgb * lighting[..., None]
    return jnp.where(hit[..., None], surface, sky_color(d, sun))


def _tiled(frame_fn, start, d, tiles: int):
    """Run a frame function over row bands via lax.map, so each band's
    lockstep traversal exits as soon as that band is done."""
    if tiles <= 1:
        return frame_fn(start, d)
    h = d.shape[0]
    assert h % tiles == 0
    split = lambda a: a.reshape((tiles, h // tiles) + a.shape[1:])
    out = jax.lax.map(lambda ab: frame_fn(ab[0], ab[1]), (split(start), split(d)))
    return out.reshape(d.shape[:-1] + (3,))


def svo_primary_frame(table, root, height: int, start, d, sun, tiles: int = 1):
    cast = _svo_cast(table, root, height)
    return _tiled(lambda s, dd: shade_primary(cast, s, dd, sun), start, d, tiles)


def svo_shadow_frame(table, root, height: int, start, d, sun, tiles: int = 1):
    cast = _svo_cast(table, root, height)
    return _tiled(lambda s, dd: shade_shadow(cast, s, dd, sun), start, d, tiles)


def dense_primary_frame(solid, rgb, size: int, start, d, sun):
    return shade_primary(_dense_cast(solid, rgb, size), start, d, sun)


def dense_shadow_frame(solid, rgb, size: int, start, d, sun):
    return shade_shadow(_dense_cast(solid, rgb, size), start, d, sun)
