"""Pallas TPU kernel for the atmosphere march (planet + fog free-path).

The fog march is the integrator's FLOP hot spot: N segments of pure
elementwise math per cast, twice per bounce (raytrace.wgsl:304-324). In
XLA the fori_loop carries ~10 HBM-resident arrays per segment — at 2M
rays that's gigabytes of round-trip traffic per cast. This kernel runs
the whole march per ray tile in VMEM/registers: HBM sees exactly one
read of the ray inputs and one write of the outputs.

The math matches kernels/atmosphere.raycast_planet expression-for-
expression (sphere intersection, far-to-near segment march, free-path
consumption), so jnp-vs-Pallas parity holds to float tolerance
(transcendentals may differ in the last ulp between XLA and Mosaic).
Sampling of the scatter direction (cos_hemisphere) stays in XLA so the
RNG draw order is identical in both backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxtracer.kernels.atmosphere import (
    FOG_FACTOR,
    FOG_RADIUS,
    PLANET_RADIUS,
)

LANES = 128
# One VREG (8x128) per carried value: larger tiles make the vectorized
# fori carry dozens of vector registers and Mosaic's register allocation
# fails (observed on v5e at 256 rows).
TILE_ROWS = 8  # rays per grid cell = TILE_ROWS * LANES


def _fog_kernel(n_steps: int, px, py, pz, dx, dy, dz, dens, y0,
                code_ref, t_ref):
    pyr = py[:] + PLANET_RADIUS
    pp = px[:] * px[:] + pyr * pyr + pz[:] * pz[:]
    b = 2.0 * (px[:] * dx[:] + pyr * dy[:] + pz[:] * dz[:])
    c = pp - FOG_RADIUS * FOG_RADIUS
    det = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t0 = jnp.maximum((-b - sq) / 2.0, 0.0)
    t1 = (-b + sq) / 2.0
    valid = (det >= 0.0) & (t1 >= 0.0)

    c_pl = pp - PLANET_RADIUS * PLANET_RADIUS
    det_pl = b * b - 4.0 * c_pl
    sq_pl = jnp.sqrt(jnp.maximum(det_pl, 0.0))
    t0_pl = (-b - sq_pl) / 2.0
    surf = valid & (det_pl >= 0.0) & (t0_pl > 0.0)
    t1 = jnp.where(surf, t0_pl, t1)

    n = n_steps
    density_scaled = (t1 - t0) / n * dens[:]

    # NOTE: the scatter flag is carried as f32 0/1 — Mosaic cannot carry
    # vector<i1> masks across scf.for iterations (fails to legalize).
    def seg(i, carry):
        y, found, t_sc = carry
        a1 = (i + 1).astype(jnp.float32) / n
        a0 = i.astype(jnp.float32) / n
        t_s0 = a0 * t0 + (1.0 - a0) * t1
        t_s1 = a1 * t0 + (1.0 - a1) * t1
        sx = px[:] + dx[:] * t_s1
        sy = pyr + dy[:] * t_s1
        sz = pz[:] + dz[:] * t_s1
        alt = jnp.sqrt(sx * sx + sy * sy + sz * sz) - PLANET_RADIUS
        d_seg = density_scaled * jnp.exp(-alt * FOG_FACTOR)
        scatter = (found < 0.5) & (y < d_seg)
        frac = jnp.where(d_seg > 0, y / jnp.maximum(d_seg, 1e-30), 0.0)
        t_new = frac * t_s0 + (1.0 - frac) * t_s1
        t_sc = jnp.where(scatter, t_new, t_sc)
        found = jnp.where(scatter, 1.0, found)
        y = jnp.where(found > 0.5, y, y - d_seg)
        return (y, found, t_sc)

    _, found_f, t_sc = jax.lax.fori_loop(
        0, n, seg, (y0[:], jnp.zeros_like(t1), jnp.zeros_like(t1))
    )
    found = (found_f > 0.5) & valid

    # code: 0 = miss, 1 = planet surface, 2 = fog scatter
    code = jnp.where(found, 2, jnp.where(surf, 1, 0))
    code_ref[:] = code.astype(jnp.int32)
    t_ref[:] = jnp.where(found, t_sc, jnp.where(surf & valid, t1, 0.0))


@partial(jax.jit, static_argnames=("n_steps",))
def fog_march(start, direction, density, y0, n_steps: int = 64):
    """Tiled Pallas atmosphere march.

    start/direction: (B, 3) f32; density/y0: (B,) f32.
    Returns (code (B,) int32 [0 miss / 1 surface / 2 fog], t (B,) f32).
    """
    B = start.shape[0]
    tile = TILE_ROWS * LANES
    Bp = max(pl.cdiv(B, tile) * tile, tile)

    def pad2(a):
        a = a.reshape(-1)
        return jnp.pad(a, (0, Bp - B)).reshape(Bp // LANES, LANES)

    args = [
        pad2(start[:, 0]), pad2(start[:, 1]), pad2(start[:, 2]),
        pad2(direction[:, 0]), pad2(direction[:, 1]), pad2(direction[:, 2]),
        pad2(density), pad2(y0),
    ]
    grid = (Bp // tile,)
    spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    code, t = pl.pallas_call(
        partial(_fog_kernel, n_steps),
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=(
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32),
        ),
    )(*args)
    return code.reshape(-1)[:B], t.reshape(-1)[:B]
