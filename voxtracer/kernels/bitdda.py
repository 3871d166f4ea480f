"""Hierarchical bit-grid DDA — the gather-lean production traversal.

Traverses the packed occupancy pyramid of world.bitgrid with one wide
row gather per *structure entered* (region row on 128^3 entry, brick row
on 8^3 entry) instead of one node gather per step; all bit tests inside
a structure are in-register binary select trees over the carried row.
Measured motivation in PERF.md: XLA gathers cost ~10 ns per row
regardless of width, so per-ray gather counts drop from O(steps) to
O(structures crossed) (~10-30/ray) — this is what makes incoherent
bounce rays affordable.

Mirrored-space arithmetic, EPS direction clamp, x>y>z tie priority and
the t==0 skip rule all match kernels.traverse.svo_raycast, so hits are
identical up to edge-graze ties (colors are resolved separately against
the SVO node table by svo_color_at)."""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core.vecmath import hmax, hmin
from voxtracer.kernels.traverse import EPS, FAR
from voxtracer.world.bitgrid import BRICK_VOX, CELLS, REGION_VOX


def _tree_select(rows, idx, width: int):
    """rows: (B, width) u32; idx: (B,) in [0, width) -> (B,) selected word
    via log2(width) vector halvings (no gathers)."""
    cur = rows
    w = width
    while w > 1:
        half = w // 2
        take_hi = (idx & half) != 0
        cur = jnp.where(take_hi[:, None], cur[:, half:], cur[:, :half])
        w = half
    return cur[:, 0]


@partial(jax.jit, static_argnames=("size", "skip_t0"))
def bitgrid_raycast(top, regions, bricks, size: int, start, d,
                    distance=FAR, skip_t0: bool = True, active=None):
    """Cast rays through the packed occupancy pyramid.

    top: (Tw,) u32; regions: (nr^3, 128) u32; bricks: (nb^3, 16) u32
    (world.bitgrid layout). start/d: (..., 3) f32. Returns dict hit / t /
    normal (...,3) / voxel (...,3 int32, world coords).
    """
    batch_shape = d.shape[:-1]
    B = int(math.prod(batch_shape)) if batch_shape else 1
    start = jnp.broadcast_to(start, d.shape).reshape(B, 3).astype(jnp.float32)
    d_in = d.reshape(B, 3).astype(jnp.float32)
    distance = jnp.broadcast_to(
        jnp.asarray(distance, jnp.float32), batch_shape).reshape(B)

    n = size
    nr = n // REGION_VOX
    nb = n // BRICK_VOX
    bound = jnp.float32(n)
    top_w = int(top.shape[0])
    tw_pow = 1 << max(top_w - 1, 0).bit_length() if top_w > 1 else 1
    top_b = jnp.broadcast_to(
        jnp.pad(top, (0, tw_pow - top_w)), (B, tw_pow)
    )

    flip = d_in < 0.0
    d_sign = jnp.sign(d_in)
    dm = jnp.maximum(jnp.abs(d_in), EPS)
    inv = 1.0 / dm
    o = jnp.where(flip, bound - start, start)  # mirrored origin

    # world-box entry (same expressions as svo_raycast)
    enter = -o * inv
    t0 = jnp.maximum(hmax(enter), 0.0)
    t_exit = jnp.minimum(hmin((bound - o) * inv), distance)
    ax0 = jnp.where(enter[:, 0] == t0, 0,
                    jnp.where(enter[:, 1] == t0, 1,
                              jnp.where(enter[:, 2] == t0, 2, 3)))
    ax0 = jnp.where(t0 > 0.0, ax0, 3).astype(jnp.int32)

    v0 = jnp.clip(jnp.floor(o + dm * t0[:, None]).astype(jnp.int32),
                  0, n - 1)
    alive0 = t_exit >= t0
    if active is not None:
        alive0 = alive0 & jnp.broadcast_to(active, batch_shape).reshape(B)

    state = dict(
        v=v0,
        lvl=jnp.full((B,), 2, jnp.int32),  # 2=region, 1=brick, 0=voxel
        t=t0,
        axis=ax0,
        reg_row=jnp.zeros((B, 128), jnp.uint32),
        brick_row=jnp.zeros((B, 16), jnp.uint32),
        alive=alive0,
        hit=jnp.zeros((B,), jnp.bool_),
        hit_t=jnp.zeros((B,), jnp.float32),
        hit_axis=jnp.full((B,), 3, jnp.int32),
        hit_voxel=jnp.zeros((B, 3), jnp.int32),
    )

    axis3 = jnp.arange(3, dtype=jnp.int32)[None, :]

    def cond(st):
        return jnp.any(st["alive"])

    def body(st):
        v = st["v"]
        lvl = st["lvl"]
        t = st["t"]
        alive = st["alive"]

        s = jnp.where(lvl == 2, REGION_VOX,
                      jnp.where(lvl == 1, BRICK_VOX, 1))
        c = v & ~(s - 1)[:, None]
        # world-space aligned corner of the mirrored cell
        c_w = jnp.where(flip, n - c - s[:, None], c)

        # --- occupancy at the current level --------------------------------
        r_w = c_w >> 7  # region coords (world)
        ridx = (r_w[:, 0] * nr + r_w[:, 1]) * nr + r_w[:, 2]
        tword = _tree_select(top_b, (ridx >> 5).astype(jnp.int32), tw_pow)
        occ_top = ((tword >> (ridx & 31).astype(jnp.uint32)) & 1) == 1

        b_w = c_w >> 3  # brick coords (world)
        cl = b_w & (CELLS - 1)  # brick-in-region coords
        cbit = (cl[:, 2] * CELLS + cl[:, 1]) * CELLS + cl[:, 0]
        rword = _tree_select(st["reg_row"], (cbit >> 5).astype(jnp.int32), 128)
        occ_reg = ((rword >> (cbit & 31).astype(jnp.uint32)) & 1) == 1

        vl = c_w & (BRICK_VOX - 1)
        vbit = (vl[:, 2] * 8 + vl[:, 1]) * 8 + vl[:, 0]
        bword = _tree_select(st["brick_row"], (vbit >> 5).astype(jnp.int32), 16)
        occ_brick = ((bword >> (vbit & 31).astype(jnp.uint32)) & 1) == 1

        occ = jnp.where(lvl == 2, occ_top,
                        jnp.where(lvl == 1, occ_reg, occ_brick))

        # --- hit at voxel level --------------------------------------------
        is_hit = alive & occ & (lvl == 0)
        if skip_t0:
            skip = is_hit & (t == 0.0)
            is_hit = is_hit & (t != 0.0)
        else:
            skip = jnp.zeros_like(is_hit)
        hit = st["hit"] | is_hit
        hit_t = jnp.where(is_hit, t, st["hit_t"])
        hit_axis = jnp.where(is_hit, st["axis"], st["hit_axis"])
        voxel_w = jnp.where(flip, n - v - 1, v)
        hit_voxel = jnp.where(is_hit[:, None], voxel_w, st["hit_voxel"])

        # --- descend: fetch the finer row ----------------------------------
        desc = alive & occ & (lvl > 0) & ~skip
        desc2 = desc & (lvl == 2)
        desc1 = desc & (lvl == 1)
        reg_row = jnp.where(
            desc2[:, None],
            regions[jnp.clip(ridx, 0, nr * nr * nr - 1)],
            st["reg_row"],
        )
        bidx = (b_w[:, 0] * nb + b_w[:, 1]) * nb + b_w[:, 2]
        brick_row = jnp.where(
            desc1[:, None],
            bricks[jnp.clip(bidx, 0, nb * nb * nb - 1)],
            st["brick_row"],
        )
        lvl_new = jnp.where(desc, lvl - 1, lvl)

        # --- advance: step to the next cell at this level ------------------
        adv = (alive & ~occ) | skip
        planes = (c + s[:, None]).astype(jnp.float32)
        tn = (planes - o) * inv  # (B,3)
        m = hmin(tn)
        axx = tn[:, 0] == m
        axy = ~axx & (tn[:, 1] == m)
        step_axis = jnp.where(axx, 0, jnp.where(axy, 1, 2)).astype(jnp.int32)
        v_flt = jnp.clip(jnp.floor(o + dm * m[:, None]).astype(jnp.int32),
                         0, n - 1)
        on_axis = axis3 == step_axis[:, None]
        v_adv = jnp.where(on_axis, c + s[:, None], v_flt)
        out = jnp.any(v_adv >= n, axis=1) | (m > t_exit)
        # ascend to the coarsest boundary crossed
        reg_crossed = jnp.any((v_adv >> 7) != (v >> 7), axis=1)
        brick_crossed = jnp.any((v_adv >> 3) != (v >> 3), axis=1)
        lvl_adv = jnp.where(reg_crossed, 2,
                            jnp.where(brick_crossed, jnp.maximum(lvl, 1),
                                      lvl))

        upd = adv
        v_new = jnp.where(upd[:, None], v_adv, v)
        t_new = jnp.where(upd, m, t)
        axis_new = jnp.where(upd, step_axis, st["axis"])
        lvl_new = jnp.where(upd, lvl_adv, lvl_new)
        alive = alive & ~is_hit & ~(upd & out)

        return dict(
            v=v_new, lvl=lvl_new, t=t_new, axis=axis_new,
            reg_row=reg_row, brick_row=brick_row,
            alive=alive, hit=hit, hit_t=hit_t, hit_axis=hit_axis,
            hit_voxel=hit_voxel,
        )

    st = jax.lax.while_loop(cond, body, state)
    normal = jnp.where(
        st["hit_axis"][:, None] == axis3, -d_sign, 0.0
    ) * st["hit"][:, None]
    rs = lambda a: a.reshape(batch_shape + a.shape[1:])
    return dict(
        hit=rs(st["hit"]),
        t=rs(st["hit_t"]),
        normal=rs(normal),
        voxel=rs(st["hit_voxel"]),
    )


@partial(jax.jit, static_argnames=("height",))
def svo_color_at(table, root, height: int, voxel, mask):
    """Masked SVO point query: RGB albedo of integer voxels (H gathers).

    voxel: (..., 3) int32 world coords; mask: (...,) lanes to resolve.
    The bit-DDA carries no color; hits descend the node table once
    (svo.rs:84-100 semantics).
    """
    batch_shape = voxel.shape[:-1]
    B = int(math.prod(batch_shape)) if batch_shape else 1
    p = voxel.reshape(B, 3)
    m = jnp.broadcast_to(mask, batch_shape).reshape(B)
    flat = table.reshape(-1)
    node = jnp.where(m, jnp.broadcast_to(jnp.asarray(root, jnp.int32), (B,)),
                     -1)
    rem = p

    def level(i, carry):
        node, rem = carry
        lv = height - 1 - i
        cbit = jnp.int32(1) << lv
        above = (rem & cbit) != 0  # (B,3)
        idx = (above[:, 0].astype(jnp.int32)
               | (above[:, 1].astype(jnp.int32) << 1)
               | (above[:, 2].astype(jnp.int32) << 2))
        child = jnp.where(node >= 0,
                          flat[jnp.clip(node, 0, None) * 8 + idx], -1)
        rem = jnp.where(above, rem & ~cbit, rem)
        return (child, rem)

    node, _ = jax.lax.fori_loop(0, height, level, (node, rem))
    bits = table[jnp.clip(node, 0, None)][:, :3]
    rgb = jax.lax.bitcast_convert_type(bits.astype(jnp.int32), jnp.float32)
    rgb = jnp.where((node >= 0)[:, None], rgb, 0.0)
    return rgb.reshape(batch_shape + (3,))