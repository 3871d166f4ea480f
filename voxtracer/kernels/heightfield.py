"""Heightfield max-mip ray casting — the terrain fast path for
incoherent (bounce / NEE) rays.

The generated world is EXACTLY a heightfield: a voxel (x, y, z) is
solid iff ``y < h[x, z]`` (worldgen.rs:61-74 classifies cells against a
column min/max pyramid; world/worldgen.py keeps the heightmap on the
space). That collapses ray casting from a 3-D octree walk to a 2-D
quadtree walk over columns: descend into an (x, z) cell only when the
ray's y-span over the cell's t-interval dips below the cell's MAX
height. One max-mip gather per iteration, and incoherent rays finish
in ~15-40 iterations instead of the octree walk's hundreds (PERF.md:
per-iteration cost is the ~10 ns/lane serialized gather, so iteration
count is the whole cost).

Exactness: every comparison and every emitted ``t`` uses the SVO
traversal's own mirrored arithmetic — ``s0 = flip ? bound - start :
start``, ``inv_d = 1/max(|d|, EPS)``, ``t = (mirrored integer plane -
s0) * inv_d`` (kernels/traverse._svo_cast_init / _svo_cast_body, after
raytrace.wgsl:68-180) — so hits are bit-identical to ``svo_raycast``
on heightfield worlds away from degenerate edge-grazes (the same
budgeted class as the other engines; tests/test_heightfield.py).
Only the X/Z axes drive the 2-D walk; Y reasoning stays per-plane, but
every emitted y-crossing t goes through the mirrored formula, which is
bit-wise the float expression the traversal evaluates for the same
plane.

Semantics matched (traverse.svo_raycast):
  * skip_t0: hits at exactly t == 0 are skipped; a ray starting inside
    solid (occupancy at t=0+ taken from the MIRRORED floor of the
    start, ties toward the cell the +directed ray is entering — the
    traversal's ``tmid < t`` subvoxel rule) hits at the very next
    unit-plane crossing if that voxel is still solid (the traversal
    pops out of the skipped t==0 leaf and re-enters solid one crossing
    later);
  * ``distance`` is STRICT here (the traversal's is advisory — it can
    overrun and report a farther hit). Callers that compare
    ``t <= cap`` (the integrator, raytrace.wgsl:344-347) get identical
    decisions either way; boolean-occlusion callers are exact because
    any advisory overrun hit is real geometry beyond the cap.
  * entry-axis priority x > y > z on exact ties, entry-face normals,
    un-mirrored integer hit voxel.

The engine applies to UNEDITED terrain worlds only (an edit breaks the
heightfield invariant); the renderer gates on that and falls back to
the SVO cast (render/driver.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core.vecmath import hmax, hmin
from voxtracer.kernels.traverse import EPS, FAR


def build_height_mips(heights):
    """Max-mip pyramid of the column heightmap, packed for the cast.

    heights: (n, n) integer array indexed [x, z], values in [0, n]
    (world/worldgen.heightmap). Returns (flat, offsets, height):
    ``flat`` is one f32 array holding every level contiguously (level
    L has (n >> L)^2 entries, each the MAX column height over its
    2^L x 2^L footprint) and ``offsets`` a static tuple of level start
    indices — one gather per walk iteration regardless of level.
    """
    import numpy as np

    h = np.asarray(heights)
    n = h.shape[0]
    assert h.shape == (n, n) and (n & (n - 1)) == 0
    levels = [h.astype(np.float32)]
    while levels[-1].shape[0] > 1:
        m = levels[-1]
        levels.append(
            np.maximum.reduce(
                [m[0::2, 0::2], m[0::2, 1::2], m[1::2, 0::2], m[1::2, 1::2]]
            )
        )
    offsets = []
    off = 0
    for m in levels:
        offsets.append(off)
        off += m.size
    flat = np.concatenate([m.reshape(-1) for m in levels])
    return jnp.asarray(flat), tuple(offsets), int(math.log2(n))


def _hf_init(flat_mips, offsets, height: int, start, d, distance,
             skip_t0: bool, active):
    """Per-lane setup in the traversal's exact mirrored arithmetic
    (traverse._svo_cast_init), plus closed-form resolution of rays
    starting inside solid (module doc: the only place t == 0 hits can
    arise, so the walk body stays one-gather-per-iteration)."""
    batch_shape = d.shape[:-1]
    B = int(math.prod(batch_shape)) if batch_shape else 1
    start = jnp.broadcast_to(start, d.shape).reshape(B, 3).astype(jnp.float32)
    d_in = d.reshape(B, 3).astype(jnp.float32)
    distance = jnp.broadcast_to(
        jnp.asarray(distance, jnp.float32), batch_shape
    ).reshape(B)

    bound = jnp.float32(1 << height)
    bound_i = jnp.int32(1 << height)
    flip = d_in < 0.0
    d_sign = jnp.sign(d_in)
    dd = jnp.maximum(jnp.abs(d_in), EPS)
    inv_d = 1.0 / dd
    s0 = jnp.where(flip, bound - start, start)

    enter = -s0 * inv_d
    t0 = jnp.maximum(hmax(enter), 0.0)
    ed_x = enter[:, 0] == t0
    ed_y = ~ed_x & (enter[:, 1] == t0)
    ed_z = ~ed_x & ~ed_y & (enter[:, 2] == t0)
    axis0 = jnp.where(ed_x, 0, jnp.where(ed_y, 1, jnp.where(ed_z, 2, 3)))

    # the ray leaves the world cube (y included) at tend — no hit at or
    # beyond it (the traversal pops past the root there)
    tend = hmin((bound - s0) * inv_d)
    alive = (jnp.minimum(tend, distance) >= t0)
    if active is not None:
        alive = alive & jnp.broadcast_to(active, batch_shape).reshape(B)

    offs = jnp.asarray(offsets, jnp.int32)

    def col_h(vx, vz, inb):
        g = offs[0] + vx * bound_i + vz
        h = flat_mips[jnp.clip(g, 0, flat_mips.shape[0] - 1)]
        return jnp.where(inb, h, 0.0)

    # ---- t == 0 occupancy: rays starting inside solid ----------------
    # Occupied voxel at t = 0+ is the MIRRORED floor of s0 (+directed
    # movement puts boundary starts in the cell being entered, matching
    # the traversal's strict ``tmid < t`` rule). Only relevant when the
    # ray starts inside the cube (t0 == 0).
    v0_m = jnp.floor(s0)
    v0 = jnp.where(flip, (bound - 1.0) - v0_m, v0_m).astype(jnp.int32)
    inb0 = jnp.all((v0 >= 0) & (v0 < bound_i), axis=1) & (t0 == 0.0)
    h0 = col_h(v0[:, 0], v0[:, 2], inb0)
    inside0 = inb0 & (v0[:, 1].astype(jnp.float32) < h0)

    # next unit-plane crossing after 0 (position at t=0 is exactly s0)
    npl = jnp.floor(s0) + 1.0
    t_ax = (npl - s0) * inv_d
    t_n = hmin(t_ax)
    nx = t_ax[:, 0] == t_n
    ny = ~nx & (t_ax[:, 1] == t_n)
    n_axis = jnp.where(nx, 0, jnp.where(ny, 1, 2)).astype(jnp.int32)
    pm = s0 + dd * t_n[:, None]
    vox_m = jnp.floor(pm)
    on_ax = n_axis[:, None] == jnp.arange(3, dtype=jnp.int32)[None, :]
    vox_m = jnp.where(on_ax, npl, vox_m)
    vox_n = jnp.where(flip, (bound - 1.0) - vox_m, vox_m).astype(jnp.int32)
    inb_n = jnp.all((vox_n >= 0) & (vox_n < bound_i), axis=1)
    h_n = col_h(vox_n[:, 0], vox_n[:, 2], inb_n)
    n_solid = inb_n & (vox_n[:, 1].astype(jnp.float32) < h_n)

    hit = jnp.zeros((B,), jnp.bool_)
    hit_t = jnp.zeros((B,), jnp.float32)
    hit_axis = jnp.full((B,), 3, jnp.int32)
    hit_voxel = jnp.zeros((B, 3), jnp.int32)
    t_start = jnp.broadcast_to(t0, (B,))
    ax_start = axis0.astype(jnp.int32)
    L_start = jnp.full((B,), height, jnp.int32)
    cx_start = jnp.zeros((B,), jnp.int32)
    cz_start = jnp.zeros((B,), jnp.int32)
    if skip_t0:
        # inside-solid start: the t==0 hit is skipped; the follow-up
        # crossing is the hit if still solid, else the walk resumes
        # from t_n IN THE ENTERED VOXEL'S COLUMN (restarting from the
        # root would mis-place a position sitting exactly on the
        # crossed plane: the descend rule's strict ``tb < t`` puts a
        # boundary point in the cell behind it)
        rec0 = alive & inside0 & n_solid & (t_n <= distance)
        hit = rec0
        hit_t = jnp.where(rec0, t_n, 0.0)
        hit_axis = jnp.where(rec0, n_axis, 3)
        hit_voxel = jnp.where(rec0[:, None], vox_n, 0)
        resume = inside0 & ~(inside0 & n_solid)
        t_start = jnp.where(resume, t_n, t_start)
        ax_start = jnp.where(resume, n_axis, ax_start)
        L_start = jnp.where(resume, 0, L_start)
        cx_start = jnp.where(resume, vox_m[:, 0].astype(jnp.int32),
                             cx_start)
        cz_start = jnp.where(resume, vox_m[:, 2].astype(jnp.int32),
                             cz_start)
        alive = alive & ~(inside0 & n_solid) \
            & ~(inside0 & (t_n > distance)) & ~(resume & ~inb_n)
    else:
        rec0 = alive & inside0
        hit = rec0
        hit_t = jnp.where(rec0, 0.0, 0.0)
        hit_axis = jnp.where(rec0, ax_start, 3)
        hit_voxel = jnp.where(rec0[:, None], v0, 0)
        alive = alive & ~inside0

    state = dict(
        t=t_start,
        axis=ax_start,
        L=L_start,
        cx=cx_start,
        cz=cz_start,
        alive=alive,
        hit=hit,
        hit_t=hit_t,
        hit_axis=hit_axis,
        hit_voxel=hit_voxel,
    )
    consts = dict(s0=s0, dd=dd, inv_d=inv_d, flip=flip,
                  distance=distance, tend=tend)
    return state, consts, d_sign, batch_shape


def _hf_body(st, co, flat_mips, offsets, H: int, skip_t0: bool = True):
    """One walk iteration: test the current quadtree cell, then hit /
    descend / advance-and-coarsen (module doc)."""
    s0, dd, inv_d = co["s0"], co["dd"], co["inv_d"]
    flip, distance, tend = co["flip"], co["distance"], co["tend"]
    t = st["t"]
    L = st["L"]
    cx, cz = st["cx"], st["cz"]
    alive = st["alive"]
    bound = jnp.float32(1 << H)
    bound_i = jnp.int32(1 << H)

    cell = jnp.exp2(L.astype(jnp.float32))  # 2^L, exact
    # mirrored cell exit crossings (x/z walk axes)
    tox = ((cx + 1).astype(jnp.float32) * cell - s0[:, 0]) * inv_d[:, 0]
    toz = ((cz + 1).astype(jnp.float32) * cell - s0[:, 2]) * inv_d[:, 2]
    t_out = jnp.minimum(tox, toz)

    # un-mirrored cell index -> one flat gather for the level's max
    dim = bound_i >> L  # cells per axis at level L
    ux = jnp.where(flip[:, 0], dim - 1 - cx, cx)
    uz = jnp.where(flip[:, 2], dim - 1 - cz, cz)
    offs = jnp.asarray(offsets, jnp.int32)
    base = offs[jnp.minimum(L, len(offsets) - 1)]
    gidx = base + ux * dim + uz
    maxh = flat_mips[jnp.clip(gidx, 0, flat_mips.shape[0] - 1)]

    # t at which the ray crosses the plane y == maxh, via the mirrored
    # formula — bit-identical to the traversal's crossing of the same
    # plane at any level.
    mplane = jnp.where(flip[:, 1], bound - maxh, maxh)
    t_m = (mplane - s0[:, 1]) * inv_d[:, 1]
    desc = flip[:, 1]
    # does the ray dip below maxh within [t, t_out)? (descending: below
    # for t' > t_m; ascending: below for t' < t_m; strict — grazing the
    # plane exactly stays in the empty voxel above, floor semantics)
    dip = jnp.where(desc, t_m < t_out, t < t_m) & (maxh > 0.0)

    at_col = L == 0

    # ---- column test (L == 0): entry into the solid span [0, h) -----
    # descending: solid from max(t, t_m); ascending: solid at t only
    t_solid = jnp.where(desc, jnp.maximum(t, t_m), t)
    in_col = jnp.where(desc, t_solid < t_out, dip)
    col_hit = at_col & dip & in_col & (t_solid < tend)
    top_face = desc & (t_m > t)  # entered through the y == h plane
    hit_t_new = t_solid
    if skip_t0:
        # legitimate inside-solid starts were resolved in init; a t==0
        # record here means the lane started exactly ON a boundary and
        # the strict descend placed it in the cell behind — not a hit
        # (the traversal's t==0 leaf skip); advance instead (the cell's
        # remaining span is zero-width, so the walk marches straight on)
        col_hit = col_hit & (hit_t_new != 0.0)
    hit_axis_new = jnp.where(top_face, 1, st["axis"])
    # strict-cap: the prospective hit (and every later one) is beyond
    # the cap — the lane is done with no record
    over = col_hit & (hit_t_new > distance)
    rec = col_hit & alive & ~over

    # hit voxel (un-mirrored): column (ux, uz); y = h-1 for top-face
    # entries, else floor of the entry position clipped into the span —
    # the same position-eval scheme the rasterizer's parity-tested
    # voxel output uses (raster.py:868-881).
    pm_y = s0[:, 1] + dd[:, 1] * hit_t_new
    y_m = jnp.floor(pm_y)
    y_e = jnp.where(flip[:, 1], bound - 1.0 - y_m, y_m)
    y_vox = jnp.where(top_face, maxh - 1.0,
                      jnp.clip(y_e, 0.0, jnp.maximum(maxh - 1.0, 0.0)))
    voxel = jnp.stack([ux, y_vox.astype(jnp.int32), uz], axis=1)

    hit = st["hit"] | rec
    hit_t = jnp.where(rec, hit_t_new, st["hit_t"])
    hit_axis = jnp.where(rec, hit_axis_new, st["hit_axis"])
    hit_voxel = jnp.where(rec[:, None], voxel, st["hit_voxel"])

    # ---- descend (dip at L > 0): split to the child containing t ----
    do_desc = dip & ~at_col
    half = cell * 0.5
    tbx = ((2 * cx + 1).astype(jnp.float32) * half - s0[:, 0]) * inv_d[:, 0]
    tbz = ((2 * cz + 1).astype(jnp.float32) * half - s0[:, 2]) * inv_d[:, 2]
    dcx = 2 * cx + (tbx < t).astype(jnp.int32)  # strict: ``tmid < t``
    dcz = 2 * cz + (tbz < t).astype(jnp.int32)

    # ---- advance (no dip, or column without entry): exit the cell,
    # then re-coarsen one level. Coarsening is only taken when the
    # advanced axis lands on an EVEN cell index: the position t then
    # sits at the parent's own boundary, so a later descend's strict
    # ``tb < t`` child pick stays ahead of it. (Coarsening past an odd
    # index would let descend re-pick the just-exited sibling — the
    # crossing t equals the midplane crossing exactly — and the walk
    # would cycle. The traversal encodes the same fact by SETTING the
    # crossed subvoxel bit, traverse.py:201-204.)
    adv = ~do_desc & ~col_hit
    ax_x = tox <= toz  # x-before-z on exact ties (hmin axis priority)
    acx = cx + (adv & ax_x).astype(jnp.int32)
    acz = cz + (adv & ~ax_x).astype(jnp.int32)
    a_axis = jnp.where(ax_x, 0, 2).astype(jnp.int32)
    even = jnp.where(ax_x, (acx & 1) == 0, (acz & 1) == 0)
    up = adv & (L < H) & even

    new_L = jnp.where(do_desc, L - 1, jnp.where(up, L + 1, L))
    new_cx = jnp.where(do_desc, dcx, jnp.where(up, acx >> 1, acx))
    new_cz = jnp.where(do_desc, dcz, jnp.where(up, acz >> 1, acz))
    new_t = jnp.where(adv, t_out, t)
    new_axis = jnp.where(adv, a_axis, st["axis"])

    dim_new = bound_i >> jnp.clip(new_L, 0, H)
    out = (new_cx >= dim_new) | (new_cz >= dim_new)
    done = rec | over | (adv & out)
    alive = alive & ~done & (new_t <= distance) & (new_t < tend)

    upd = lambda new, old: jnp.where(st["alive"], new, old)
    return dict(
        t=upd(new_t, t),
        axis=upd(new_axis, st["axis"]),
        L=upd(new_L, L),
        cx=upd(new_cx, cx),
        cz=upd(new_cz, cz),
        alive=alive,
        hit=hit,
        hit_t=hit_t,
        hit_axis=hit_axis,
        hit_voxel=hit_voxel,
    )


def _hf_finalize(st, d_sign, batch_shape):
    axis_onehot = jnp.arange(3, dtype=jnp.int32)[None, :]
    normal = jnp.where(
        st["hit_axis"][:, None] == axis_onehot, -d_sign, 0.0
    ) * st["hit"][:, None]
    rs = lambda a: a.reshape(batch_shape + a.shape[1:])
    return dict(
        hit=rs(st["hit"]),
        t=rs(st["hit_t"]),
        normal=rs(normal),
        voxel=rs(st["hit_voxel"]),
    )


_HIT_KEYS = ("hit", "hit_t", "hit_axis", "hit_voxel")


@partial(jax.jit, static_argnames=("height", "offsets", "skip_t0",
                                   "min_bucket"))
def hf_raycast(flat_mips, offsets: tuple, height: int, start, d,
               distance=FAR, skip_t0: bool = True, active=None,
               min_bucket: int = 0):
    """Cast rays against the heightfield terrain (module doc).

    flat_mips/offsets/height: build_height_mips output. start/d/
    distance/skip_t0/active: as traverse.svo_raycast (``distance`` is
    strict here — see module doc). min_bucket > 0 enables live-lane
    compaction between loop segments (the svo_raycast_bucketed scheme;
    worthwhile for big incoherent batches). Returns dict hit/t/normal/
    voxel — no ``node`` (terrain worlds have a single interned leaf;
    callers shade with the terrain color).
    """
    state, consts, d_sign, batch_shape = _hf_init(
        flat_mips, offsets, height, start, d, distance, skip_t0, active
    )
    B = state["t"].shape[0]

    buckets = []
    if min_bucket > 0:
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
        return _hf_body(st, co, flat_mips, offsets, height, skip_t0), co

    carry = (state, consts)
    unwinds = []
    for nxt in buckets:
        carry = jax.lax.while_loop(seg_cond(nxt), seg_body, carry)
        st, co = carry
        perm = jnp.argsort(~st["alive"])[:nxt]
        unwinds.append(({k: st[k] for k in _HIT_KEYS}, perm))
        take = lambda a: a[perm]
        carry = (
            {k: take(v) for k, v in st.items()},
            {k: take(v) for k, v in co.items()},
        )

    carry = jax.lax.while_loop(seg_cond(None), seg_body, carry)
    st = dict(carry[0])
    for full_hits, perm in reversed(unwinds):
        for k in _HIT_KEYS:
            st[k] = full_hits[k].at[perm].set(st[k])
    return _hf_finalize(st, d_sign, batch_shape)
