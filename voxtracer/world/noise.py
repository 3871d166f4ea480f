"""Gradient noise in pure jnp — device-side procedural terrain inputs.

2D simplex-class gradient noise with an integer-hash gradient lattice and
fractional-Brownian-motion stacking. The reference uses the Rust `noise`
crate's OpenSimplex + Fbm (worldgen.rs:14-15); bit parity with that crate
is not a goal (SURVEY.md §7.2 item 6) — distribution parity is: values in
[-1, 1], similar spectral content, deterministic from an integer seed.

Everything here is jit-friendly and vectorized: evaluating an 8192^2
heightmap is a single fused elementwise program on the TPU VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_F2 = 0.3660254037844386  # (sqrt(3)-1)/2
_G2 = 0.21132486540518713  # (3-sqrt(3))/6


def _hash2(ix, iy, seed):
    """Integer lattice hash -> uint32 (PCG-flavored avalanche)."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + iy.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        + jnp.uint32(seed)
    )
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    return h


def _grad2(h):
    """Map hash to one of 8 unit-ish gradients; returns (gx, gy)."""
    idx = (h & jnp.uint32(7)).astype(jnp.int32)
    gx = jnp.asarray([1.0, -1.0, 1.0, -1.0, 1.41421356, -1.41421356, 0.0, 0.0])
    gy = jnp.asarray([1.0, 1.0, -1.0, -1.0, 0.0, 0.0, 1.41421356, -1.41421356])
    return gx[idx], gy[idx]


def simplex2(x, y, seed: int = 0):
    """2D simplex gradient noise, roughly in [-1, 1]."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    s = (x + y) * _F2
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    t = (i + j) * _G2
    x0 = x - (i - t)
    y0 = y - (j - t)
    upper = x0 > y0
    i1 = jnp.where(upper, 1.0, 0.0)
    j1 = jnp.where(upper, 0.0, 1.0)
    x1 = x0 - i1 + _G2
    y1 = y0 - j1 + _G2
    x2 = x0 - 1.0 + 2.0 * _G2
    y2 = y0 - 1.0 + 2.0 * _G2
    ii = i.astype(jnp.int32)
    jj = j.astype(jnp.int32)

    def corner(cx, cy, hx, hy):
        gx, gy = _grad2(_hash2(hx, hy, seed))
        tt = 0.5 - cx * cx - cy * cy
        tt = jnp.maximum(tt, 0.0)
        tt = tt * tt
        return tt * tt * (gx * cx + gy * cy)

    n = (
        corner(x0, y0, ii, jj)
        + corner(x1, y1, ii + i1.astype(jnp.int32), jj + j1.astype(jnp.int32))
        + corner(x2, y2, ii + 1, jj + 1)
    )
    return 70.0 * n


@partial(jax.jit, static_argnames=("octaves", "seed", "lacunarity", "gain"))
def fbm2(x, y, seed: int = 0, octaves: int = 7, lacunarity: float = 2.0, gain: float = 0.5):
    """Fractional Brownian motion: `octaves` stacked simplex2 layers,
    amplitude-normalized to roughly [-1, 1]."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    total = jnp.zeros(jnp.broadcast_shapes(x.shape, y.shape), jnp.float32)
    amp = 1.0
    freq = 1.0
    norm = 0.0
    for o in range(octaves):
        total = total + amp * simplex2(x * freq, y * freq, seed=seed + o * 1013)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm
