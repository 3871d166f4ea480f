"""Vectorized ray/world intersection — SVO traversal and dense-grid DDA.

Both routines are *wavefront* style: a whole batch of rays advances in
lockstep through a ``lax.while_loop``, with per-lane alive masks instead
of thread divergence (TPUs have no SIMT). All per-level traversal stacks
are addressed with one-hot masks over a static ``height+2`` axis, so one
loop iteration is pure VPU vector math plus exactly one dynamic gather
(the node-table row fetch) — no scatters.

Semantics follow the reference traversal exactly (raytrace.wgsl:68-180 /
software.rs:158-258): octant mirroring so all direction components are
positive, per-level midplane-crossing stacks, pop-by-height with
termination when height exceeds the root, and an optional skip of hits at
t == 0 (the GPU variant's camera-inside-a-solid rule,
raytrace.wgsl:124-127). Where the reference's GPU and CPU twins disagree
(pop compare, axis tie handling), the GPU behavior is canonical here.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core.vecmath import hmax, hmin, to_bits

EPS = 1.0e-6  # raytrace.wgsl:53
FAR = 1.0e12  # "no cap" distance used by the integrator (raytrace.wgsl:343)


def _onehot_read(stk, oh):
    """Read stk[lane, h] where oh = one-hot over the level axis."""
    if stk.dtype == jnp.bool_:
        if stk.ndim == 3:
            return jnp.any(stk & oh[..., None], axis=1)
        return jnp.any(stk & oh, axis=1)
    if stk.ndim == 3:
        return jnp.sum(jnp.where(oh[..., None], stk, 0), axis=1)
    return jnp.sum(jnp.where(oh, stk, 0), axis=1)


def _onehot_write(stk, oh, mask, val):
    """stk[lane, h] = val where mask; one-hot formulation (no scatter)."""
    if stk.ndim == 3:
        sel = oh[..., None] & mask[:, None, None]
        return jnp.where(sel, val[:, None, :], stk)
    sel = oh & mask[:, None]
    return jnp.where(sel, val[:, None], stk)


@partial(jax.jit, static_argnames=("height", "skip_t0"))
def svo_raycast(table, root, height: int, start, d, distance=FAR, skip_t0: bool = True):
    """Cast rays through the flat SVO node table.

    Args:
      table: int32[N, 8] node table (EMPTY octants = -1); leaf rows carry
        float32 RGB bit patterns in columns 0..3.
      root: scalar int32 root slot (or -1 for an empty world).
      height: static tree height (world edge = 2^height), >= 1.
      start, d: (..., 3) float32 ray origins/directions (d need not be unit).
      distance: scalar or (...,) far cap — the same routine serves shadow
        rays and fog-bounded segments (raytrace.wgsl:68,101-104,142).
      skip_t0: skip hits at t == 0 (ray starts inside a solid).

    Returns dict of (...)-shaped arrays: hit (bool), t, normal (...,3),
    node (int32 leaf slot, -1 if miss), voxel (...,3 int32, un-mirrored
    integer coords of the hit voxel).
    """
    assert height >= 1
    batch_shape = d.shape[:-1]
    B = int(math.prod(batch_shape)) if batch_shape else 1
    start = jnp.broadcast_to(start, d.shape).reshape(B, 3).astype(jnp.float32)
    d_in = d.reshape(B, 3).astype(jnp.float32)
    distance = jnp.broadcast_to(jnp.asarray(distance, jnp.float32), batch_shape).reshape(B)

    H = height
    S = H + 2  # stack slots 0..H, plus one scratch slot for masked writes
    bound = jnp.float32(1 << H)
    levels = jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)

    flip = d_in < 0.0
    d_sign = jnp.sign(d_in)
    mirror = to_bits(flip)  # (B,)
    dd = jnp.maximum(jnp.abs(d_in), EPS)
    s0 = jnp.where(flip, bound - start, start)

    enter = -s0 / dd
    t0 = jnp.maximum(hmax(enter), 0.0)
    ed_x = enter[:, 0] == t0
    ed_y = ~ed_x & (enter[:, 1] == t0)
    ed_z = ~ed_x & ~ed_y & (enter[:, 2] == t0)
    enter_dir0 = jnp.stack([ed_x, ed_y, ed_z], axis=-1)

    flat_table = table.reshape(-1)  # (N*8,) int32

    # Stacks: (B, S[, 3]).
    node_stk = jnp.full((B, S), -1, jnp.int32)
    tmid_stk = jnp.zeros((B, S, 3), jnp.float32)
    sub_stk = jnp.zeros((B, S, 3), jnp.bool_)
    tend_stk = jnp.zeros((B, S), jnp.float32)
    off_stk = jnp.zeros((B, S, 3), jnp.float32)

    root_b = jnp.broadcast_to(jnp.asarray(root, jnp.int32), (B,))
    node_stk = node_stk.at[:, H].set(root_b)
    tend_root = jnp.minimum(hmin((bound - s0) / dd), distance)
    tend_stk = tend_stk.at[:, H].set(tend_root)
    tmid_root = (jnp.float32(1 << (H - 1)) - s0) / dd
    tmid_stk = tmid_stk.at[:, H].set(tmid_root)
    sub_stk = sub_stk.at[:, H].set(tmid_root < t0[:, None])

    alive = (root_b >= 0) & (tend_root >= t0)
    h0 = jnp.full((B,), H - 1, jnp.int32)

    state = dict(
        t=t0,
        enter_dir=enter_dir0,
        h=h0,
        node_stk=node_stk,
        tmid_stk=tmid_stk,
        sub_stk=sub_stk,
        tend_stk=tend_stk,
        off_stk=off_stk,
        alive=alive,
        hit=jnp.zeros((B,), jnp.bool_),
        hit_t=jnp.zeros((B,), jnp.float32),
        hit_node=jnp.full((B,), -1, jnp.int32),
        hit_normal=jnp.zeros((B, 3), jnp.float32),
        hit_voxel=jnp.zeros((B, 3), jnp.int32),
    )

    def cond(st):
        return jnp.any(st["alive"])

    def body(st):
        h = st["h"]
        t = st["t"]
        alive = st["alive"]
        oh = levels == h[:, None]  # (B, S) one-hot at current level
        ohp = levels == (h[:, None] + 1)  # parent level

        cur = _onehot_read(st["node_stk"], oh)
        descend = cur == -1

        # ---- descend: resolve the child octant of the parent cell -----
        sub_p = _onehot_read(st["sub_stk"], ohp)
        off_p = _onehot_read(st["off_stk"], ohp)
        cell = jnp.exp2(h.astype(jnp.float32))[:, None]  # 2^h
        offset = off_p + jnp.where(sub_p, cell, 0.0)
        parent = _onehot_read(st["node_stk"], ohp)
        child_idx = to_bits(sub_p) ^ mirror
        gidx = jnp.clip(parent, 0, None) * 8 + child_idx
        child = jnp.where(parent >= 0, flat_table[gidx], -1)

        child_empty = child == -1
        at_leaf = h == 0
        leaf_hit = descend & ~child_empty & at_leaf
        if skip_t0:
            leaf_skip = leaf_hit & (t == 0.0)
            leaf_hit = leaf_hit & (t != 0.0)
        else:
            leaf_skip = jnp.zeros_like(leaf_hit)
        do_push = descend & ~child_empty & ~at_leaf
        pop_d = descend & (child_empty | leaf_skip)

        # ---- advance: next midplane crossing or exit the cell ---------
        tmid = _onehot_read(st["tmid_stk"], oh)
        tend = _onehot_read(st["tend_stk"], oh)
        sub = _onehot_read(st["sub_stk"], oh)
        t_next = jnp.where(sub, tend[:, None], tmid)
        m = hmin(t_next)
        pop_a = ~descend & (m == tend)
        cross = ~descend & ~pop_a
        cx = t_next[:, 0] == m
        cy = ~cx & (t_next[:, 1] == m)
        cz = ~cx & ~cy & (t_next[:, 2] == m)
        cross_axis = jnp.stack([cx, cy, cz], axis=-1)  # (B,3)

        # ---- state updates (all masked by alive) -----------------------
        rec = leaf_hit & alive
        hit = st["hit"] | rec
        hit_t = jnp.where(rec, t, st["hit_t"])
        hit_node = jnp.where(rec, child, st["hit_node"])
        normal = -jnp.where(st["enter_dir"], d_sign, 0.0)
        hit_normal = jnp.where(rec[:, None], normal, st["hit_normal"])
        voxel_m = offset.astype(jnp.int32)
        voxel = jnp.where(
            flip, (jnp.int32(1 << H) - voxel_m - 1), voxel_m
        )
        hit_voxel = jnp.where(rec[:, None], voxel, st["hit_voxel"])

        # push: write child cell state at level h, then descend to h-1
        mid = cell * 0.5
        tmid_new = (offset + mid - s0) / dd
        tend_new = jnp.minimum(hmin((offset + 2.0 * mid - s0) / dd), distance)
        sub_new = tmid_new < t[:, None]
        w_push = do_push & alive
        node_stk = _onehot_write(st["node_stk"], oh, w_push, child)
        tmid_stk = _onehot_write(st["tmid_stk"], oh, w_push, tmid_new)
        tend_stk = _onehot_write(st["tend_stk"], oh, w_push, tend_new)
        off_stk = _onehot_write(st["off_stk"], oh, w_push, offset)
        sub_stk = _onehot_write(st["sub_stk"], oh, w_push, sub_new)

        # cross: set the crossed axis bit at level h, update t/enter_dir
        w_cross = cross & alive
        sub_stk = _onehot_write(
            sub_stk, oh, w_cross, sub | cross_axis
        )
        t_new = jnp.where(w_cross, m, t)
        enter_dir = jnp.where(w_cross[:, None], cross_axis, st["enter_dir"])

        # height bookkeeping: pops go up, push/cross go down
        pop = (pop_d | pop_a) & alive
        down = (do_push | cross) & alive
        h_new = jnp.where(pop, h + 1, jnp.where(down, h - 1, h))
        # entering a fresh level below: mark it unexplored
        ohd = levels == (h[:, None] - 1)
        node_stk = _onehot_write(node_stk, ohd, down, jnp.full((B,), -1, jnp.int32))

        alive = alive & ~rec & (h_new <= H)

        return dict(
            t=t_new,
            enter_dir=enter_dir,
            h=h_new,
            node_stk=node_stk,
            tmid_stk=tmid_stk,
            sub_stk=sub_stk,
            tend_stk=tend_stk,
            off_stk=off_stk,
            alive=alive,
            hit=hit,
            hit_t=hit_t,
            hit_node=hit_node,
            hit_normal=hit_normal,
            hit_voxel=hit_voxel,
        )

    st = jax.lax.while_loop(cond, body, state)
    rs = lambda a: a.reshape(batch_shape + a.shape[1:])
    return dict(
        hit=rs(st["hit"]),
        t=rs(st["hit_t"]),
        node=rs(st["hit_node"]),
        normal=rs(st["hit_normal"]),
        voxel=rs(st["hit_voxel"]),
    )


def leaf_rgb(table, node):
    """Decode leaf RGB albedo for hit nodes (float32 bit patterns in
    columns 0..3 of the node table); misses (node < 0) give zeros."""
    idx = jnp.clip(node, 0, None)
    bits = table[idx][..., :3].astype(jnp.int32)
    rgb = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where((node >= 0)[..., None], rgb, 0.0)


@partial(jax.jit, static_argnames=("size",))
def dense_raycast(solid, start, d, size: int, distance=FAR):
    """Amanatides–Woo DDA through a dense bool[N,N,N] occupancy grid.

    The config-1 reference path (BASELINE.json): primary rays against a
    dense grid. Returns hit/t/normal/voxel like svo_raycast.
    """
    n = size
    batch_shape = d.shape[:-1]
    B = int(math.prod(batch_shape)) if batch_shape else 1
    start = jnp.broadcast_to(start, d.shape).reshape(B, 3).astype(jnp.float32)
    d_in = d.reshape(B, 3).astype(jnp.float32)
    distance = jnp.broadcast_to(jnp.asarray(distance, jnp.float32), batch_shape).reshape(B)

    dd = jnp.where(jnp.abs(d_in) < EPS, jnp.where(d_in < 0, -EPS, EPS), d_in)
    inv = 1.0 / dd
    step = jnp.where(dd > 0, 1, -1).astype(jnp.int32)

    # Slab test against the [0, n]^3 box.
    lo = (0.0 - start) * inv
    hi = (jnp.float32(n) - start) * inv
    tmin_ax = jnp.minimum(lo, hi)
    tmax_ax = jnp.maximum(lo, hi)
    t_enter = jnp.maximum(hmax(tmin_ax), 0.0)
    t_exit = jnp.minimum(hmin(tmax_ax), distance)
    inside = t_enter <= t_exit

    p = start + dd * t_enter[:, None]
    voxel = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, n - 1)
    # entry face (for the normal of a hit in the first voxel)
    ex = (tmin_ax[:, 0] == t_enter) & (t_enter > 0)
    ey = ~ex & (tmin_ax[:, 1] == t_enter) & (t_enter > 0)
    ez = ~ex & ~ey & (tmin_ax[:, 2] == t_enter) & (t_enter > 0)
    enter_axis = jnp.stack([ex, ey, ez], axis=-1)

    next_bound = voxel + (step > 0).astype(jnp.int32)
    tmax = (next_bound.astype(jnp.float32) - start) * inv
    tdelta = jnp.abs(inv)

    flat = solid.reshape(-1)

    state = dict(
        voxel=voxel,
        tmax=tmax,
        t=t_enter,
        axis=enter_axis,
        alive=inside,
        hit=jnp.zeros((B,), jnp.bool_),
        hit_t=jnp.zeros((B,), jnp.float32),
        hit_normal=jnp.zeros((B, 3), jnp.float32),
        hit_voxel=jnp.zeros((B, 3), jnp.int32),
    )

    def cond(st):
        return jnp.any(st["alive"])

    def body(st):
        v = st["voxel"]
        gidx = (v[:, 0] * n + v[:, 1]) * n + v[:, 2]
        occupied = flat[jnp.clip(gidx, 0, n * n * n - 1)]
        rec = st["alive"] & occupied
        normal = -jnp.where(st["axis"], step.astype(jnp.float32), 0.0)
        hit = st["hit"] | rec
        hit_t = jnp.where(rec, st["t"], st["hit_t"])
        hit_normal = jnp.where(rec[:, None], normal, st["hit_normal"])
        hit_voxel = jnp.where(rec[:, None], v, st["hit_voxel"])

        # step to the next voxel along the smallest tmax axis
        m = hmin(st["tmax"])
        ax = st["tmax"] == m[:, None]
        # priority x > y > z on ties
        ax = ax & (jnp.cumsum(ax.astype(jnp.int32), axis=-1) == 1)
        v_new = v + jnp.where(ax, step, 0)
        tmax_new = st["tmax"] + jnp.where(ax, tdelta, 0.0)
        out = (
            (v_new < 0).any(axis=-1)
            | (v_new >= n).any(axis=-1)
            | (m > distance)
        )
        alive = st["alive"] & ~rec & ~out

        upd = st["alive"] & ~rec
        return dict(
            voxel=jnp.where(upd[:, None], v_new, v),
            tmax=jnp.where(upd[:, None], tmax_new, st["tmax"]),
            t=jnp.where(upd, m, st["t"]),
            axis=jnp.where(upd[:, None], ax, st["axis"]),
            alive=alive,
            hit=hit,
            hit_t=hit_t,
            hit_normal=hit_normal,
            hit_voxel=hit_voxel,
        )

    st = jax.lax.while_loop(cond, body, state)
    rs = lambda a: a.reshape(batch_shape + a.shape[1:])
    return dict(
        hit=rs(st["hit"]),
        t=rs(st["hit_t"]),
        normal=rs(st["hit_normal"]),
        voxel=rs(st["hit_voxel"]),
    )
