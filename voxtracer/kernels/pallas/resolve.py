"""Pallas TPU kernel for the rasterizer's dense per-tile resolve fold.

The resolve is the rasterizer's resolution-driven stage: every tile
folds its K nearest candidate boxes into a per-ray best-hit carry
(kernels/raster.py resolve_scan). In XLA the fold is a chunked scan
whose (tiles, rays) carry round-trips HBM every chunk step — ~10x the
minimal traffic. Here one grid step holds 8 tiles' carry in
VMEM/registers for the WHOLE candidate loop: HBM sees one read of the
rays/candidates and one write of the final carry.

Layout (the Mosaic-safe shape vocabulary — PERF.md):
* rays: one TILE per sublane, its 64 rays in lanes 0..63 of an
  (8, 128) block (lanes 64..127 are dead padding, masked by the carry
  slicing on the way out);
* candidate geometry: (8, K) blocks — tile per sublane, candidate per
  lane; the per-candidate broadcast is a STATIC (8, 1) slice splat
  (no dynamic lane indexing: the K loop is unrolled, so this kernel
  is for the main resolve's small static K, not the widen rounds);
* the fold is candidate-sequential (strict <, first-seen wins), which
  is bit-identical to resolve_scan's chunked argmin tie-break, and the
  slab math replicates _mirrored_slab op-for-op, so the kernel is
  bit-exact vs the XLA path (tests/test_pallas_resolve.py).

Opt-in (VOXT_PALLAS_RESOLVE=1): remote Mosaic compiles are minutes-slow
and occasionally fail with opaque errors (CLAUDE.md), so the XLA scan
stays the default until the TPU A/B lands.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_RAYS = 64  # rays per raster tile (kernels/raster.py TILE**2)
ROWS = 8  # tiles per grid step (one per sublane)
MAX_UNROLL_K = 32  # widen rounds (K up to 1024) stay on the XLA scan


def _resolve_kernel(K: int, bound: float, distance: float,
                    s0x, s0y, s0z, ivx, ivy, ivz, flx, fly, flz,
                    lox, loy, loz, hix, hiy, hiz, cr, cg, cb, plb,
                    t0, p0, r0, g0, b0,
                    t_ref, p_ref, r_ref, g_ref, b_ref):
    s0 = (s0x[:], s0y[:], s0z[:])
    iv = (ivx[:], ivy[:], ivz[:])
    fl = (flx[:] > 0.5, fly[:] > 0.5, flz[:] > 0.5)
    glo = (lox[:], loy[:], loz[:])
    ghi = (hix[:], hiy[:], hiz[:])
    grgb = (cr[:], cg[:], cb[:])
    plbv = plb[:]
    t_b = t0[:]
    p_b = p0[:]
    rgb_b = [r0[:], g0[:], b0[:]]

    for k in range(K):
        bc = lambda a: jnp.broadcast_to(a[:, k:k + 1], (ROWS, LANES))
        ti = []
        to = []
        for ax in range(3):
            lo_a = bc(glo[ax])
            hi_a = bc(ghi[ax])
            mlo = jnp.where(fl[ax], bound - hi_a, lo_a)
            mhi = jnp.where(fl[ax], bound - lo_a, hi_a)
            ti.append((mlo - s0[ax]) * iv[ax])
            to.append((mhi - s0[ax]) * iv[ax])
        t_in = jnp.maximum(jnp.maximum(jnp.maximum(ti[0], ti[1]), ti[2]),
                           0.0)
        t_out = jnp.minimum(jnp.minimum(jnp.minimum(to[0], to[1]), to[2]),
                            distance)
        plk = jnp.broadcast_to(plbv[:, k:k + 1], (ROWS, LANES))
        hit = (t_in < t_out) & (t_in > 0.0) & (plk >= 0)
        axis = jnp.where(ti[0] == t_in, 0,
                         jnp.where(ti[1] == t_in, 1, 2)).astype(jnp.int32)
        tc = jnp.where(hit, t_in, jnp.float32(jnp.inf))
        better = tc < t_b
        t_b = jnp.where(better, tc, t_b)
        p_b = jnp.where(better, plk + axis, p_b)
        for c in range(3):
            rgb_b[c] = jnp.where(better, bc(grgb[c]), rgb_b[c])

    t_ref[:] = t_b
    p_ref[:] = p_b
    r_ref[:] = rgb_b[0]
    g_ref[:] = rgb_b[1]
    b_ref[:] = rgb_b[2]


def resolve_fold(carry, glo_c, ghi_c, rgb_c, plb_c, d_loc, cam_pos,
                 tree_height: int, distance: float,
                 interpret: bool = False):
    """Drop-in for kernels/raster.py resolve_scan's carry_rgb form.

    carry: (t (N, R), pl (N, R) i32, rgb (N, R, 3)); glo_c/ghi_c/rgb_c:
    (N, K, 3) candidate box corners/albedo decoded from the sorted pair
    records (kernels/raster.py _decode — the caller already holds them
    positionally, no gather here); plb_c: (N, K) i32 owner << 2, or -4
    for invalid rows (masked by the kernel's plk >= 0 test); d_loc:
    (N, R, 3) ray dirs; distance: static float. R is the per-tile ray
    count: 64 for plain frames (lanes padded to 128), or a multiple of
    128 for the k-batched jitter resolve (kernels/raster.py: R = KS*64
    packs exactly — each tile then spans R/128 sublane rows whose
    geometry is repeated in prep).
    Returns the folded carry, bit-identical to the XLA scan.
    """
    t_in, pl_in, rgb_in = carry
    N, K = plb_c.shape
    R = t_in.shape[1]
    assert K <= MAX_UNROLL_K, "widen-round K stays on the XLA scan"
    assert R == TILE_RAYS or R % LANES == 0
    bound = float(1 << tree_height)
    from voxtracer.kernels.traverse import EPS

    rpt = 1 if R == TILE_RAYS else R // LANES  # sublane rows per tile
    NR = N * rpt  # total sublane rows
    G = pl.cdiv(NR, ROWS)
    NP = G * ROWS

    def padt(a, fill):
        """Tile-level (N, K) arrays -> per-sublane-row (NP, K)."""
        if rpt > 1:
            a = jnp.repeat(a, rpt, axis=0)
        return jnp.pad(a, ((0, NP - NR),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    # per-ray mirrored-arithmetic precomputes (XLA, cheap, elementwise)
    d = jnp.asarray(d_loc, jnp.float32)
    flip = (d < 0.0).astype(jnp.float32)
    dd = jnp.maximum(jnp.abs(d), EPS)
    inv = 1.0 / dd
    cp = jnp.asarray(cam_pos, jnp.float32)
    s0 = jnp.where(d < 0.0, bound - cp, cp)

    def rays(a, fill=0.0):  # (N, R) -> (NP, 128)
        if rpt > 1:
            a = a.reshape(NR, LANES)
        else:
            a = jnp.pad(a, ((0, 0), (0, LANES - TILE_RAYS)),
                        constant_values=fill)
        return jnp.pad(a, ((0, NP - NR), (0, 0)), constant_values=fill)

    lo = jnp.asarray(glo_c, jnp.float32)
    hi = jnp.asarray(ghi_c, jnp.float32)
    rgb = jnp.asarray(rgb_c, jnp.float32)
    plb = plb_c

    args = []
    for ax in range(3):
        args.append(rays(s0[..., ax]))
    for ax in range(3):
        args.append(rays(inv[..., ax], fill=1.0))
    for ax in range(3):
        args.append(rays(flip[..., ax]))
    for ax in range(3):
        args.append(padt(lo[..., ax], 0.0))
    for ax in range(3):
        args.append(padt(hi[..., ax], 0.0))
    for ax in range(3):
        args.append(padt(rgb[..., ax], 0.0))
    args.append(padt(plb, -4))
    args.append(rays(t_in, jnp.inf))
    args.append(rays(pl_in, -1))
    for c in range(3):
        args.append(rays(rgb_in[..., c]))

    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    geo_spec = pl.BlockSpec((ROWS, K), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([ray_spec] * 9 + [geo_spec] * 10 + [ray_spec] * 5)
    out_specs = tuple([ray_spec] * 5)
    out_shape = tuple(
        jax.ShapeDtypeStruct((NP, LANES),
                             jnp.int32 if i == 1 else jnp.float32)
        for i in range(5)
    )
    t_o, p_o, r_o, g_o, b_o = pl.pallas_call(
        partial(_resolve_kernel, K, bound, float(distance)),
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if rpt > 1:
        sl = lambda a: a[:NR].reshape(N, R)
    else:
        sl = lambda a: a[:N, :TILE_RAYS]
    return (sl(t_o), sl(p_o),
            jnp.stack([sl(r_o), sl(g_o), sl(b_o)], axis=-1))
