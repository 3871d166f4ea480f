"""Planet surface + exponential-atmosphere fog scattering.

Behavioral reference: ``raycast_planet`` (raytrace.wgsl:262-327).

The model: the voxel world sits on a planet of radius 6,371,000 m (the
world's y=0 plane touches the planet's north pole); the atmosphere is an
exponential fog shell with half-life altitude 10400/ln2 m, truncated at
10 half-lives. A ray intersects the shell [t0, t1]; an opaque planet
surface hit clips t1 and returns gray ground. Scattering is free-path
sampled against the per-segment optical depth of N equal march segments —
note the reference marches from the *far* end t1 toward t0 (its segment
parameterization runs a: 0->1 as t: t1->t0), and we reproduce that
faithfully since it changes where scatter events land.

``n_steps`` trades fidelity for speed: 1000 matches the reference
discretization (the oracle setting); the production default 64 is
statistically close (the integrand varies on the 15 km scale of the fog
half-life, far coarser than the segments) and is validated by the
mean-transmittance tests (SURVEY.md §7.3).

RNG: consumes a fixed 3 draws (1 free-path + 2 in cos_hemisphere) on
every call regardless of outcome, for cross-backend bit parity.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core import rng as vrng
from voxtracer.core.sampling import cos_hemisphere
from voxtracer.core.vecmath import dot, normalize

PLANET_RADIUS = 6371000.0  # raytrace.wgsl:262
FOG_HALFLIFE = 10400.0 / math.log(2.0)  # raytrace.wgsl:263
FOG_RADIUS = PLANET_RADIUS + 10.0 * FOG_HALFLIFE  # raytrace.wgsl:264
FOG_FACTOR = math.log(2.0) / FOG_HALFLIFE  # raytrace.wgsl:265

GROUND_RGBA = (0.25, 0.25, 0.25, 0.0)  # raytrace.wgsl:300
FOG_RGBA = (1.0, 1.0, 1.0, 0.0)  # raytrace.wgsl:320


@partial(jax.jit, static_argnames=("n_steps", "backend"))
def raycast_planet(
    state, start, direction, sea_level_density, n_steps: int = 64,
    backend: str = "auto",
):
    """Vectorized planet/fog cast.

    Args:
      state: (..., 3) uint32 RNG state.
      start, direction: (..., 3) float32 (direction unit-length).
      sea_level_density: (...,) per-ray fog density (wavelength-dependent).
      n_steps: static march segment count.
      backend: 'jnp' (the XLA oracle path), 'pallas' (the fused TPU march
        kernel, kernels/pallas/fog.py), or 'auto' (pallas on TPU).

    Returns (new_state, result) where result has hit (...,), t (...,),
    rgba (...,4), normal (...,3).
    """
    if backend == "auto":
        # Measured on v5e (PERF.md): XLA fuses this march well enough that
        # the Pallas kernel is at parity (19.8 vs 15.5 ms per 2M x 64-seg
        # cast) while costing minutes of Mosaic compile time — so the
        # fused-jnp path is the default and Pallas stays opt-in.
        backend = "jnp"
    if backend == "pallas":
        return _raycast_planet_pallas(state, start, direction,
                                      sea_level_density, n_steps)
    p = start + jnp.asarray([0.0, PLANET_RADIUS, 0.0], jnp.float32)
    b = 2.0 * dot(p, direction)
    c = dot(p, p) - FOG_RADIUS * FOG_RADIUS
    det = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t0 = jnp.maximum((-b - sq) / 2.0, 0.0)
    t1 = (-b + sq) / 2.0
    valid = (det >= 0.0) & (t1 >= 0.0)

    # opaque planet surface clips the far end
    c_pl = dot(p, p) - PLANET_RADIUS * PLANET_RADIUS
    det_pl = b * b - 4.0 * c_pl
    sq_pl = jnp.sqrt(jnp.maximum(det_pl, 0.0))
    t0_pl = (-b - sq_pl) / 2.0
    surf = valid & (det_pl >= 0.0) & (t0_pl > 0.0)
    t1 = jnp.where(surf, t0_pl, t1)

    hit = surf
    t_hit = jnp.where(surf, t1, 0.0)
    normal = jnp.where(
        surf[..., None],
        normalize(p + direction * t1[..., None]),
        jnp.zeros_like(p),
    )
    rgba = jnp.where(
        surf[..., None],
        jnp.asarray(GROUND_RGBA, jnp.float32),
        jnp.zeros((4,), jnp.float32),
    )

    # fog march: far -> near free-path sampling (raytrace.wgsl:304-324)
    n = n_steps
    density_scaled = (t1 - t0) / n * sea_level_density
    state, r = vrng.random3(state)
    y0 = -jnp.log(1.0 - r[..., 0])

    def seg(i, carry):
        y, found, t_sc = carry
        a1 = (i + 1).astype(jnp.float32) / n
        a0 = i.astype(jnp.float32) / n
        t_s0 = a0 * t0 + (1.0 - a0) * t1
        t_s1 = a1 * t0 + (1.0 - a1) * t1
        alt = (
            jnp.linalg.norm(p + direction * t_s1[..., None], axis=-1)
            - PLANET_RADIUS
        )
        d_seg = density_scaled * jnp.exp(-alt * FOG_FACTOR)
        scatter = ~found & (y < d_seg)
        frac = jnp.where(d_seg > 0, y / jnp.maximum(d_seg, 1e-30), 0.0)
        t_new = frac * t_s0 + (1.0 - frac) * t_s1
        t_sc = jnp.where(scatter, t_new, t_sc)
        found = found | scatter
        y = jnp.where(found, y, y - d_seg)
        return (y, found, t_sc)

    _, found, t_sc = jax.lax.fori_loop(
        0, n, seg, (y0, jnp.zeros_like(valid), jnp.zeros_like(t1))
    )
    found = found & valid
    state, scatter_dir = cos_hemisphere(state, direction)

    hit = jnp.where(valid, hit | found, False)
    t_hit = jnp.where(found, t_sc, jnp.where(valid, t_hit, 0.0))
    normal = jnp.where(found[..., None], scatter_dir, normal)
    rgba = jnp.where(found[..., None], jnp.asarray(FOG_RGBA, jnp.float32), rgba)

    return state, dict(hit=hit, t=t_hit, rgba=rgba, normal=normal)


def _raycast_planet_pallas(state, start, direction, sea_level_density, n_steps):
    """Pallas-backed variant: RNG draws and result assembly stay in XLA
    (identical draw order to the jnp path); the march runs fused in VMEM."""
    from voxtracer.kernels.pallas.fog import fog_march

    batch_shape = direction.shape[:-1]
    start_b = jnp.broadcast_to(start, direction.shape).reshape(-1, 3)
    dir_b = direction.reshape(-1, 3)
    dens_b = jnp.broadcast_to(sea_level_density, batch_shape).reshape(-1)

    state, r = vrng.random3(state)
    y0 = -jnp.log(1.0 - r[..., 0]).reshape(-1)
    code, t = fog_march(start_b, dir_b, dens_b, y0, n_steps=n_steps)
    code = code.reshape(batch_shape)
    t = t.reshape(batch_shape)

    state, scatter_dir = cos_hemisphere(state, direction)

    surf = code == 1
    found = code == 2
    hit = code > 0
    p = start + jnp.asarray([0.0, PLANET_RADIUS, 0.0], jnp.float32)
    normal = jnp.where(
        surf[..., None],
        normalize(p + direction * t[..., None]),
        jnp.where(found[..., None], scatter_dir, jnp.zeros_like(direction)),
    )
    rgba = jnp.where(
        surf[..., None],
        jnp.asarray(GROUND_RGBA, jnp.float32),
        jnp.where(
            found[..., None],
            jnp.asarray(FOG_RGBA, jnp.float32),
            jnp.zeros((4,), jnp.float32),
        ),
    )
    return state, dict(hit=hit, t=t, rgba=rgba, normal=normal)


def transmittance_to_escape(start, direction, sea_level_density, n_steps=256):
    """Deterministic helper: probability a ray escapes the atmosphere
    without scattering or hitting the planet (for statistical tests)."""
    p = start + jnp.asarray([0.0, PLANET_RADIUS, 0.0], jnp.float32)
    b = 2.0 * dot(p, direction)
    c = dot(p, p) - FOG_RADIUS * FOG_RADIUS
    det = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t0 = jnp.maximum((-b - sq) / 2.0, 0.0)
    t1 = (-b + sq) / 2.0
    valid = (det >= 0.0) & (t1 >= 0.0)
    c_pl = dot(p, p) - PLANET_RADIUS * PLANET_RADIUS
    det_pl = b * b - 4.0 * c_pl
    sq_pl = jnp.sqrt(jnp.maximum(det_pl, 0.0))
    t0_pl = (-b - sq_pl) / 2.0
    surf = valid & (det_pl >= 0.0) & (t0_pl > 0.0)
    t1 = jnp.where(surf, t0_pl, t1)

    n = n_steps
    density_scaled = (t1 - t0) / n * sea_level_density

    def seg(i, tau):
        a1 = (i + 1).astype(jnp.float32) / n
        t_s1 = a1 * t0 + (1.0 - a1) * t1
        alt = (
            jnp.linalg.norm(p + direction * t_s1[..., None], axis=-1)
            - PLANET_RADIUS
        )
        return tau + density_scaled * jnp.exp(-alt * FOG_FACTOR)

    tau = jax.lax.fori_loop(0, n, seg, jnp.zeros_like(t1))
    escape = jnp.where(valid, jnp.exp(-tau), 1.0)
    return jnp.where(surf, 0.0, escape)
