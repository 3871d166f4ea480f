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

from voxtracer.core.lanes import take_lanes
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


def _svo_cast_init(table, root, height: int, start, d, distance, skip_t0,
                   active):
    """Shared setup for the wavefront casts: flatten the batch, mirror,
    build the initial traversal state and the per-lane constants that the
    body needs (split out so the bucketed variant can permute them)."""
    batch_shape = d.shape[:-1]
    B = int(math.prod(batch_shape)) if batch_shape else 1
    start = jnp.broadcast_to(start, d.shape).reshape(B, 3).astype(jnp.float32)
    d_in = d.reshape(B, 3).astype(jnp.float32)
    distance = jnp.broadcast_to(
        jnp.asarray(distance, jnp.float32), batch_shape
    ).reshape(B)

    H = height
    S = H + 1  # node-stack slots 0..H
    bound = jnp.float32(1 << H)
    levels = jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)

    flip = d_in < 0.0
    d_sign = jnp.sign(d_in)
    mirror = to_bits(flip)  # (B,)
    dd = jnp.maximum(jnp.abs(d_in), EPS)
    inv_d = 1.0 / dd
    s0 = jnp.where(flip, bound - start, start)

    enter = -s0 * inv_d
    t0 = jnp.maximum(hmax(enter), 0.0)
    ed_x = enter[:, 0] == t0
    ed_y = ~ed_x & (enter[:, 1] == t0)
    ed_z = ~ed_x & ~ed_y & (enter[:, 2] == t0)
    # enter axis: 0/1/2, 3 = none (t0 == 0 inside the volume)
    axis0 = jnp.where(ed_x, 0, jnp.where(ed_y, 1, jnp.where(ed_z, 2, 3)))

    root_b = jnp.broadcast_to(jnp.asarray(root, jnp.int32), (B,))
    node_stk = jnp.where(levels == H, root_b[:, None], -1)  # (B, S) i32

    tend_root = jnp.minimum(hmin((bound - s0) * inv_d), distance)
    tmid_root = (jnp.float32(1 << (H - 1)) - s0) * inv_d
    sub_root = tmid_root < t0[:, None]  # subv[H] -> bit H-1 of the words
    words0 = sub_root.astype(jnp.int32) << (H - 1)  # (B, 3) packed bit-words

    alive = (root_b >= 0) & (tend_root >= t0)
    if active is not None:
        alive = alive & jnp.broadcast_to(active, batch_shape).reshape(B)
    h0 = jnp.full((B,), H - 1, jnp.int32)

    state = dict(
        t=t0,
        axis=axis0.astype(jnp.int32),
        h=h0,
        words=words0,
        node_stk=node_stk,
        alive=alive,
        hit=jnp.zeros((B,), jnp.bool_),
        hit_t=jnp.zeros((B,), jnp.float32),
        hit_node=jnp.full((B,), -1, jnp.int32),
        hit_axis=jnp.full((B,), 3, jnp.int32),
        hit_voxel=jnp.zeros((B, 3), jnp.int32),
    )
    consts = dict(s0=s0, inv_d=inv_d, mirror=mirror, distance=distance)
    return state, consts, d_sign, flip, batch_shape


def _svo_cast_body(st, co, flat_table, H: int, skip_t0: bool):
    """One traversal iteration (see svo_raycast for the algorithm notes).
    ``co`` holds the per-lane constants (s0/inv_d/mirror/distance) so the
    bucketed cast can carry and permute them alongside the state."""
    s0, inv_d = co["s0"], co["inv_d"]
    mirror, distance = co["mirror"], co["distance"]
    levels = jnp.arange(st["node_stk"].shape[1], dtype=jnp.int32)[None, :]
    axis_onehot = jnp.arange(3, dtype=jnp.int32)[None, :]
    B = st["t"].shape[0]

    h = st["h"]
    t = st["t"]
    alive = st["alive"]
    words = st["words"]  # (B, 3) int32
    hc = jnp.clip(h, 0, H)
    oh = levels == hc[:, None]  # (B, S) one-hot at current level

    cur = _onehot_read(st["node_stk"], oh)
    descend = cur == -1

    # shared geometry for level h, from the packed subvoxel words:
    # offset(h) = words & ~((1<<h)-1); midplane = offset + 2^(h-1);
    # cell end = offset + 2^h. (The reference caches all of these per
    # level, raytrace.wgsl:94-98; recompute is ~20 flops.)
    low_mask = (jnp.int32(1) << hc) - 1
    off_i = words & ~low_mask[:, None]
    offset = off_i.astype(jnp.float32)
    cell = jnp.exp2(h.astype(jnp.float32))[:, None]  # 2^h
    mid = cell * 0.5
    tmid = (offset + mid - s0) * inv_d
    tend = jnp.minimum(hmin((offset + cell - s0) * inv_d), distance)

    # ---- descend: resolve the child octant of the parent cell -----
    sub_p = ((words >> hc[:, None]) & 1) == 1  # subv[h+1]
    parent_oh = levels == jnp.clip(hc + 1, 0, H)[:, None]
    parent = _onehot_read(st["node_stk"], parent_oh)
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
    sub = ((words >> jnp.maximum(hc - 1, 0)[:, None]) & 1) == 1  # subv[h]
    t_next = jnp.where(sub, tend[:, None], tmid)
    m = hmin(t_next)
    pop_a = ~descend & (m == tend)
    cross = ~descend & ~pop_a
    cx = t_next[:, 0] == m
    cy = ~cx & (t_next[:, 1] == m)
    cz = ~cx & ~cy & (t_next[:, 2] == m)
    cross_axis_i = jnp.where(cx, 0, jnp.where(cy, 1, 2)).astype(jnp.int32)

    # ---- record hits -----------------------------------------------
    rec = leaf_hit & alive
    hit = st["hit"] | rec
    hit_t = jnp.where(rec, t, st["hit_t"])
    hit_node = jnp.where(rec, child, st["hit_node"])
    hit_axis = jnp.where(rec, st["axis"], st["hit_axis"])
    # leaf voxel (mirrored) = offset(0) of the leaf cell; at h == 0 the
    # words already carry the full bit pattern (bit 0 = the leaf octant).
    voxel_m = off_i
    flip = (
        (mirror[:, None] >> jnp.arange(3, dtype=jnp.int32)[None, :]) & 1
    ) == 1
    voxel = jnp.where(flip, jnp.int32(1 << H) - voxel_m - 1, voxel_m)
    hit_voxel = jnp.where(rec[:, None], voxel, st["hit_voxel"])

    # ---- push: set subv[h] bits (tmid < t) at word bit h-1 ---------
    bit = jnp.int32(1) << jnp.maximum(hc - 1, 0)[:, None]
    sub_new = tmid < t[:, None]
    w_push = (do_push & alive)[:, None]
    words = jnp.where(
        w_push, (words & ~bit) | jnp.where(sub_new, bit, 0), words
    )

    # ---- cross: set the crossed axis's subv[h] bit ------------------
    w_cross = cross & alive
    set_axis = w_cross[:, None] & (axis_onehot == cross_axis_i[:, None])
    words = jnp.where(set_axis, words | bit, words)
    t_new = jnp.where(w_cross, m, t)
    axis_new = jnp.where(w_cross, cross_axis_i, st["axis"])

    # ---- stack + height bookkeeping ---------------------------------
    pop = (pop_d | pop_a) & alive
    down = (do_push | cross) & alive
    node_stk = _onehot_write(st["node_stk"], oh, do_push & alive, child)
    ohd = levels == jnp.clip(hc - 1, 0, H)[:, None]
    node_stk = _onehot_write(node_stk, ohd, down,
                             jnp.full((B,), -1, jnp.int32))
    h_new = jnp.where(pop, h + 1, jnp.where(down, h - 1, h))
    alive = alive & ~rec & (h_new <= H)

    return dict(
        t=t_new,
        axis=axis_new,
        h=h_new,
        words=words,
        node_stk=node_stk,
        alive=alive,
        hit=hit,
        hit_t=hit_t,
        hit_node=hit_node,
        hit_axis=hit_axis,
        hit_voxel=hit_voxel,
    )


def _svo_cast_finalize(st, d_sign, batch_shape):
    axis_onehot = jnp.arange(3, dtype=jnp.int32)[None, :]
    normal = jnp.where(
        st["hit_axis"][:, None] == axis_onehot, -d_sign, 0.0
    ) * st["hit"][:, None]
    rs = lambda a: a.reshape(batch_shape + a.shape[1:])
    return dict(
        hit=rs(st["hit"]),
        t=rs(st["hit_t"]),
        node=rs(st["hit_node"]),
        normal=rs(normal),
        voxel=rs(st["hit_voxel"]),
    )


@partial(jax.jit, static_argnames=("height", "skip_t0"))
def svo_raycast(table, root, height: int, start, d, distance=FAR,
                skip_t0: bool = True, active=None):
    """Cast rays through the flat SVO node table.

    Args:
      table: int32[N, 8] node table (EMPTY octants = -1); leaf rows carry
        float32 RGB bit patterns in columns 0..3.
      root: scalar int32 root slot (or -1 for an empty world).
      height: static tree height (world edge = 2^height), >= 1.
      start, d: (..., 3) float32 ray origins/directions (d need not be unit).
      distance: scalar or (...,) far cap — the same routine serves shadow
        rays and fog-bounded segments (raytrace.wgsl:68,101-104,142).
        ADVISORY, exactly like the reference's: the pop test compares the
        crossing t against the capped cell end by equality, so a crossing
        taken when no subvoxel bit is set yet can step past ``distance``
        and record a farther hit. Callers that need a strict cap must
        compare ``t`` themselves (the reference does,
        raytrace.wgsl:344-347).
      skip_t0: skip hits at t == 0 (ray starts inside a solid).

    Returns dict of (...)-shaped arrays: hit (bool), t, normal (...,3),
    node (int32 leaf slot, -1 if miss), voxel (...,3 int32, un-mirrored
    integer coords of the hit voxel).

    Implementation notes (HBM-lean wavefront design): the only per-level
    stack is the node-id stack; everything the reference keeps per level
    (midplane t's, cell offsets, exit t's, subvoxel bits —
    raytrace.wgsl:94-98) is recomputed per iteration from three packed
    *subvoxel bit-words*: bit m of word W holds the subvoxel bit of the
    level-(m+1) cell, so the cell offset at level h is literally
    ``W & ~((1<<h)-1)`` reinterpreted as an integer coordinate. This cuts
    the while-loop carry from ~420 to ~60 bytes/ray, which is what bounds
    throughput (the loop is HBM-bound on carry traffic, SURVEY.md §7.3).
    """
    assert height >= 1
    state, consts, d_sign, _, batch_shape = _svo_cast_init(
        table, root, height, start, d, distance, skip_t0, active
    )
    flat_table = table.reshape(-1)  # (N*8,) int32

    st = jax.lax.while_loop(
        lambda st: jnp.any(st["alive"]),
        lambda st: _svo_cast_body(st, consts, flat_table, height, skip_t0),
        state,
    )
    return _svo_cast_finalize(st, d_sign, batch_shape)


_HIT_KEYS = ("hit", "hit_t", "hit_node", "hit_axis", "hit_voxel")


@partial(jax.jit, static_argnames=("height", "skip_t0", "min_bucket"))
def svo_raycast_bucketed(table, root, height: int, start, d, distance=FAR,
                         skip_t0: bool = True, active=None,
                         min_bucket: int = 4096):
    """svo_raycast with live-lane compaction between loop segments.

    A lockstep cast costs one full-width table gather per iteration until
    the *slowest* lane finishes (PERF.md), so most of its gathers are
    spent on lanes that already terminated. This variant runs the same
    body (bit-identical results — shared _svo_cast_body) in segments that
    exit once the live count fits the next statically-halved bucket
    (B -> B/2 -> B/4 -> ...), argsort-packs the survivors together with
    their per-lane constants, and scatters hit records back during the
    unwind. Total gather cost approaches the area under the live-lane
    curve. Worth it for incoherent casts (bounce/NEE rays) where lane
    finish times are heavy-tailed; primaries are better served by the
    tile-based engines.
    """
    assert height >= 1
    state, consts, d_sign, _, batch_shape = _svo_cast_init(
        table, root, height, start, d, distance, skip_t0, active
    )
    flat_table = table.reshape(-1)
    B = state["t"].shape[0]

    buckets = []
    b = B // 2
    while b >= max(min_bucket, 1):
        buckets.append(b)
        b //= 2

    def seg_cond(limit):
        def cond(c):
            alive = c[0]["alive"]
            ok = jnp.any(alive)
            if limit is not None:
                ok = ok & (jnp.sum(alive) > limit)
            return ok

        return cond

    def seg_body(c):
        st, co = c
        return _svo_cast_body(st, co, flat_table, height, skip_t0), co

    carry = (state, consts)
    unwinds = []
    for nxt in buckets:
        carry = jax.lax.while_loop(seg_cond(nxt), seg_body, carry)
        st, co = carry
        perm = jnp.argsort(~st["alive"])[:nxt]
        unwinds.append(({k: st[k] for k in _HIT_KEYS}, perm))
        # ONE packed row gather for the per-lane arrays (core/lanes.py):
        # separate takes pay the serialized per-row gather toll per ARRAY
        both = take_lanes({**st, **{"co_" + k: v for k, v in co.items()}},
                          perm)
        carry = (
            {k: both[k] for k in st},
            {k: both["co_" + k] for k in co},
        )

    carry = jax.lax.while_loop(seg_cond(None), seg_body, carry)
    st = dict(carry[0])
    for full_hits, perm in reversed(unwinds):
        for k in _HIT_KEYS:
            st[k] = full_hits[k].at[perm].set(st[k])
    return _svo_cast_finalize(st, d_sign, batch_shape)


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
