"""Tile-binned box rasterization — gather-free primary visibility.

The per-ray SVO traversal pays one serialized table gather per descent
step (~13 ns/row, PERF.md), capping any ray-walk design at ~1 Mrays/s.
This engine inverts the loop: it iterates over *geometry* (the world as
a static box soup, world/boxes.py) and resolves visibility per screen
tile with sorts and dense vector math. Pipeline (all one jit):

  1. project every box's corners (dense math), conservative pixel bbox,
     frustum cull;
  2. expand boxes to 8x8-tile (tile, box) pairs; ONE 2-key sort by
     (tile, camera-distance lower bound) + a cumulative-max rank scan
     bins the K nearest candidate boxes per tile — occlusion culling
     falls out of the K-truncation (hidden hillsides and buried cubes
     rank behind the surface and are dropped);
  3. dense resolve: a K-step lax.scan tests all 64 rays of every tile
     against one candidate box per step — pure VPU math, in-register
     z-min, no fragment arrays, no data-dependent budgets. The slab test
     uses the traversal's own mirrored arithmetic (same planes, same
     f32 ops), so hits are bit-identical to
     kernels/traverse.svo_raycast away from degenerate edge-grazes;
  4. completeness: a tile is provably done unless candidates were
     dropped nearer than its farthest resolved t. Incomplete tiles
     (deep silhouette stacks; at most ``fallback_tiles`` per frame) are
     re-resolved exactly by a compacted per-ray ``svo_raycast`` when the
     node table is supplied;
  5. boxes that are unprojectable (corners behind the camera) or cover
     more than ``near_cap`` pixels take a dense full-screen pass instead
     (a lax.scan over ``near_slots`` boxes).

Per-frame cost is O(boxes + pairs + tiles*K), independent of tree depth
and of fragment counts. Behavioral reference for hit semantics:
raytrace.wgsl:68-180 (entry-t from plane crossings, t==0 skip,
entry-face normals, distance cap — strict here, advisory there; see
traverse.svo_raycast).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core import camera as vcam
from voxtracer.kernels.traverse import (EPS, FAR, leaf_rgb,
                                        svo_raycast_bucketed)

NEAR_EPS = 1.0e-4  # camera-space z below which corners are unprojectable
TILE = 8  # screen tile edge (pixels)


def _ray_dirs_for_pixels(px, py, basis, width, height):
    """World-space unit directions through pixel centers — the exact ops
    of camera.generate_rays so slab t's match the per-ray engine."""
    ld = vcam.pixel_ndc(px, py, width, height)
    return vcam.ray_directions(basis, ld)


def _mirrored_slab(lo, hi, cam_pos, d, tree_height: int, distance):
    """Exact ray/AABB test in the traversal's mirrored arithmetic.

    lo/hi: (..., 3) box corners (float32 whole numbers); d: (..., 3).
    Returns (t, axis, hit): entry t (inf on miss), entry axis (0/1/2,
    x>y>z tie priority like raytrace.wgsl:84-91), and the hit mask with
    the t==0 inside-a-solid skip applied (raytrace.wgsl:124-127).
    """
    bound = jnp.float32(1 << tree_height)
    flip = d < 0.0
    dd = jnp.maximum(jnp.abs(d), EPS)
    inv_d = 1.0 / dd
    s0 = jnp.where(flip, bound - cam_pos, cam_pos)
    mlo = jnp.where(flip, bound - hi, lo)
    mhi = jnp.where(flip, bound - lo, hi)
    t_in_ax = (mlo - s0) * inv_d
    t_out_ax = (mhi - s0) * inv_d
    t_in = jnp.maximum(jnp.max(t_in_ax, axis=-1), 0.0)
    t_out = jnp.minimum(jnp.min(t_out_ax, axis=-1), distance)
    hit = (t_in < t_out) & (t_in > 0.0)
    ax_x = t_in_ax[..., 0] == t_in
    ax_y = ~ax_x & (t_in_ax[..., 1] == t_in)
    axis = jnp.where(ax_x, 0, jnp.where(ax_y, 1, 2)).astype(jnp.int32)
    t = jnp.where(hit, t_in, jnp.float32(jnp.inf))
    return t, axis, hit


@partial(jax.jit, static_argnames=(
    "tree_height", "width_px", "height_px", "cand_k", "fallback_tiles",
    "near_cap", "near_slots", "mid_slots", "big_slots", "_stage",
))
def raster_cast(
    box_lo,
    box_size,
    box_attr,
    cam_pos,
    cam_basis,
    tree_height: int,
    width_px: int,
    height_px: int,
    distance=FAR,
    cand_k: int = 24,
    fallback_tiles: int = 4096,
    near_cap: int = 16384,
    near_slots: int = 512,
    mid_slots: int = 1 << 17,
    big_slots: int = 1 << 14,
    _stage: int = 0,
):
    """Rasterize the box soup for one camera; per-pixel nearest hit.

    Args:
      box_lo: int32[M, 3] box low corners; box_size: int32[M, 3] per-axis
        extents (world.boxes.BoxSoup arrays; extents must be small for
        tight distance bounds — the soup caps them).
      box_attr: float32[M, 4] per-box [leaf_id_bits, r, g, b] — leaf slot
        id bitcast to f32 in column 0, albedo in 1..4 (build via
        ``pack_box_attr``).
      cam_pos/cam_basis: camera (pos (3,), basis (3,3)).
      distance: scalar far cap (strict, unlike the traversal's advisory
        cap — see traverse.svo_raycast).
      cand_k: candidate boxes kept per tile (nearest-first).
      fallback_tiles: static capacity of the incomplete-tile list
        returned for the exact per-ray fallback (``apply_fallback`` /
        ``raster_cast_exact``); exceeding it sets ``overflow``.
      near_cap/near_slots: boxes covering > near_cap pixels, spanning
        more than 4x4 tiles, or with corners behind the camera take the
        dense path; at most near_slots of them per frame (excess sets
        ``overflow``).
      mid_slots: capacity of the 16-pair mid tier (boxes spanning more
        than 2x2 but at most 4x4 tiles); excess sets ``overflow``.
      big_slots: capacity of the 64-pair big tier (spans up to 8x8
        tiles); excess sets ``overflow``.
      _stage: debug-only early return after pipeline stage 1..6 (projection,
        near selection, near scan, pair expansion, binning, resolve) —
        used to bisect the axon remote compiler's per-stage cost.

    Returns dict: hit (H,W) bool, t (H,W) f32, normal (H,W,3), node (H,W)
    i32 leaf slot (-1 miss), rgb (H,W,3), voxel (H,W,3) i32, overflow ()
    bool, n_pair/n_near/n_fallback () i32 demand counters, and
    fb_tiles/fb_valid — tiles whose result is not provably complete
    (resolve them with ``apply_fallback`` for exactness; without it they
    may show a farther surface than the true nearest).
    """
    W, H = width_px, height_px
    P = W * H
    TW = -(-W // TILE)  # tiles per row
    TH = -(-H // TILE)
    NT = TW * TH
    M = box_lo.shape[0]
    K = cand_k
    NFB = min(fallback_tiles, NT)
    near_slots = min(near_slots, M) if M else 1
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    basis = jnp.asarray(cam_basis, jnp.float32)

    lo_f = box_lo.astype(jnp.float32)
    size_f = box_size.astype(jnp.float32)  # (M, 3) per-axis extents
    hi_f = lo_f + size_f

    # ---- project the 8 corners to screen -------------------------------
    # camera space v = basis^T (corner - pos); screen lx = vx/vz,
    # ly = -vy/vz; pixel-center coords px = (lx*h + w)/2 - 0.5 (inverse of
    # camera.pixel_ndc).
    corners = jnp.stack(
        [
            jnp.where(
                jnp.asarray([(i >> a) & 1 for a in range(3)], bool),
                hi_f, lo_f,
            )
            for i in range(8)
        ],
        axis=1,
    )  # (M, 8, 3)
    v = (corners - cam_pos) @ basis  # (M, 8, 3) camera space
    vz = v[..., 2]
    behind = vz < NEAR_EPS
    all_behind = jnp.all(behind, axis=1)
    any_behind = jnp.any(behind, axis=1)

    # Frustum cull (halfspace form, valid for corners behind the camera
    # too): every pixel ray satisfies |lx| <= fx, |ly| <= fy, so a box
    # with all corners outside one side plane can't be hit by any ray.
    fx = jnp.float32((W - 1) / H + 1e-3)
    fy = jnp.float32(1.0 + 1e-3)
    vx, vy = v[..., 0], v[..., 1]
    outside = (
        jnp.all(vx > vz * fx, axis=1)
        | jnp.all(-vx > vz * fx, axis=1)
        | jnp.all(vy > vz * fy, axis=1)
        | jnp.all(-vy > vz * fy, axis=1)
    )

    vz_safe = jnp.maximum(vz, NEAR_EPS)
    lx = v[..., 0] / vz_safe
    ly = -v[..., 1] / vz_safe
    pxc = (lx * H + W) * 0.5 - 0.5  # pixel-center coordinate space
    pyc = (ly * H + H) * 0.5 - 0.5
    pad = 0.01  # fp conservativeness
    x0 = jnp.ceil(jnp.min(pxc, axis=1) - pad).astype(jnp.int32)
    x1 = jnp.floor(jnp.max(pxc, axis=1) + pad).astype(jnp.int32)
    y0 = jnp.ceil(jnp.min(pyc, axis=1) - pad).astype(jnp.int32)
    y1 = jnp.floor(jnp.max(pyc, axis=1) + pad).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, W - 1)
    x1 = jnp.clip(x1, -1, W - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    y1 = jnp.clip(y1, -1, H - 1)
    bw = x1 - x0 + 1
    bh = y1 - y0 + 1
    empty = (bw <= 0) | (bh <= 0) | all_behind | outside
    pix_count = jnp.where(empty, 0, bw * bh)

    # tile spans (needed for tier assignment before the near pass)
    tx0 = x0 // TILE
    tx1 = x1 // TILE
    ty0 = y0 // TILE
    ty1 = y1 // TILE
    tw = tx1 - tx0 + 1
    th = ty1 - ty0 + 1

    # near/dense tier: behind-camera corners, huge pixel coverage, or a
    # tile span beyond the fixed-arity emission tiers (> 8x8 tiles)
    near = (~empty) & (
        any_behind | (pix_count > near_cap) | (tw > 8) | (th > 8)
    )
    usable = (~empty) & ~near
    if _stage == 1:  # compile-time bisection aid (`_stage`: see docstring)
        return dict(pix_count=pix_count, near=near)

    # camera->box distance lower bound: for unit-direction rays t equals
    # euclidean distance, so the point-box distance bounds any ray's
    # entry t from below (drives the per-tile nearest-K ordering).
    clamped = jnp.clip(cam_pos, lo_f, hi_f)
    dmin_b = jnp.linalg.norm(clamped - cam_pos, axis=-1)

    # ---- dense pass for near/huge boxes --------------------------------
    # (sort-based selection of the near-box indices: top_k's TPU lowering
    # is far slower to compile/run than one i32 sort at these sizes)
    n_near = jnp.sum(near.astype(jnp.int32))
    midx = jnp.arange(M, dtype=jnp.int32)
    near_key = jnp.where(near, midx, jnp.int32(M))
    near_idx = jax.lax.sort(near_key)[:near_slots]
    near_valid = near_idx < M
    near_idx = jnp.clip(near_idx, 0, M - 1)
    if _stage == 2:
        return dict(near_idx=near_idx, n_near=n_near)

    pyg, pxg = vcam.pixel_grid(W, H)
    d_frame = _ray_dirs_for_pixels(pxg, pyg, basis, W, H)  # (H, W, 3)
    d_flat = d_frame.reshape(P, 3)

    def near_step(carry, k):
        bt, bpl = carry
        i = near_idx[k]
        valid = near_valid[k]
        t, axis, hit = _mirrored_slab(lo_f[i], hi_f[i], cam_pos, d_flat,
                                      tree_height, distance)
        t = jnp.where(valid & hit, t, jnp.float32(jnp.inf))
        pl = (i.astype(jnp.int32) << 2) | axis
        better = t < bt
        return (jnp.where(better, t, bt), jnp.where(better, pl, bpl)), None

    init = (jnp.full(P, jnp.inf, jnp.float32), jnp.full(P, -1, jnp.int32))
    (near_t, near_pl), _ = jax.lax.scan(
        near_step, init, jnp.arange(near_slots)
    )
    if _stage == 3:
        return dict(near_t=near_t, near_pl=near_pl)

    # ---- (tile, box) pairs: FIXED-ARITY emission --------------------------
    # Data-dependent expansion (cumsum offsets + repeat/scatter+scan) is
    # the axon remote compiler's tarpit (20+ min for this one stage), so
    # pairs are emitted with static arity instead — pure iota/select math:
    #   tier 1 (span <= 2x2 tiles; the vast majority): 4 pairs per box,
    #     the bbox's corner tiles, duplicates masked exactly;
    #   tier 2 (span <= 4x4): mid_slots boxes selected by an index sort
    #     emit 16 pairs each, off-span entries masked;
    #   tier 3 (span <= 8x8): big_slots boxes emit 64 pairs each;
    #   larger spans joined the near/dense tier above.
    tier1 = usable & (tw <= 2) & (th <= 2)
    tier2 = usable & ~tier1 & (tw <= 4) & (th <= 4)
    tier3 = usable & ~tier1 & ~tier2
    n_t2 = jnp.sum(tier2.astype(jnp.int32))
    n_t3 = jnp.sum(tier3.astype(jnp.int32))
    T2 = min(mid_slots, M) if M else 1
    T3 = min(big_slots, M) if M else 1
    key2 = jnp.where(tier2, midx, jnp.int32(M))
    idx2 = jax.lax.sort(key2)[:T2]
    valid2 = idx2 < M
    idx2 = jnp.clip(idx2, 0, M - 1)
    key3 = jnp.where(tier3, midx, jnp.int32(M))
    idx3 = jax.lax.sort(key3)[:T3]
    valid3 = idx3 < M
    idx3 = jnp.clip(idx3, 0, M - 1)

    k4 = jnp.arange(4, dtype=jnp.int32)
    dx1 = (k4 & 1)[None, :]
    dy1 = (k4 >> 1)[None, :]
    ptx1 = jnp.where(dx1 == 1, tx1[:, None], tx0[:, None])  # (M, 4)
    pty1 = jnp.where(dy1 == 1, ty1[:, None], ty0[:, None])
    pv1 = (
        tier1[:, None]
        & ((dx1 == 0) | (tx1 > tx0)[:, None])
        & ((dy1 == 0) | (ty1 > ty0)[:, None])
    )
    tile1 = jnp.where(pv1, pty1 * TW + ptx1, NT).reshape(M * 4)
    owner1 = jnp.broadcast_to(midx[:, None], (M, 4)).reshape(M * 4)
    dmin1 = jnp.where(pv1, dmin_b[:, None], jnp.inf).reshape(M * 4)

    k16 = jnp.arange(16, dtype=jnp.int32)
    ix2 = (k16 & 3)[None, :]
    iy2 = (k16 >> 2)[None, :]
    btx0, btx1 = tx0[idx2], tx1[idx2]
    bty0, bty1 = ty0[idx2], ty1[idx2]
    ptx2 = btx0[:, None] + ix2
    pty2 = bty0[:, None] + iy2
    pv2 = (
        valid2[:, None] & (ptx2 <= btx1[:, None]) & (pty2 <= bty1[:, None])
    )
    tile2 = jnp.where(pv2, pty2 * TW + ptx2, NT).reshape(T2 * 16)
    owner2 = jnp.broadcast_to(idx2[:, None], (T2, 16)).reshape(T2 * 16)
    dmin2 = jnp.where(pv2, dmin_b[idx2][:, None], jnp.inf).reshape(T2 * 16)

    k64 = jnp.arange(64, dtype=jnp.int32)
    ix3 = (k64 & 7)[None, :]
    iy3 = (k64 >> 3)[None, :]
    ctx0, ctx1 = tx0[idx3], tx1[idx3]
    cty0, cty1 = ty0[idx3], ty1[idx3]
    ptx3 = ctx0[:, None] + ix3
    pty3 = cty0[:, None] + iy3
    pv3 = (
        valid3[:, None] & (ptx3 <= ctx1[:, None]) & (pty3 <= cty1[:, None])
    )
    tile3 = jnp.where(pv3, pty3 * TW + ptx3, NT).reshape(T3 * 64)
    owner3 = jnp.broadcast_to(idx3[:, None], (T3, 64)).reshape(T3 * 64)
    dmin3 = jnp.where(pv3, dmin_b[idx3][:, None], jnp.inf).reshape(T3 * 64)

    PAIRS = M * 4 + T2 * 16 + T3 * 64
    ptile = jnp.concatenate([tile1, tile2, tile3])
    powner = jnp.concatenate([owner1, owner2, owner3])
    pdmin = jnp.concatenate([dmin1, dmin2, dmin3]).astype(jnp.float32)
    n_pair = jnp.sum((ptile < NT).astype(jnp.int32))
    kid = jnp.arange(PAIRS, dtype=jnp.int32)
    if _stage == 4:
        return dict(ptile=ptile, pdmin=pdmin, powner=powner)

    # ---- nearest-K candidates per tile -------------------------------------
    stile, sdmin, sowner = jax.lax.sort((ptile, pdmin, powner), num_keys=2)
    first = jnp.concatenate([jnp.ones(1, bool), stile[1:] != stile[:-1]])
    # running max via lax.cummax (dedicated TPU lowering) — the generic
    # lax.associative_scan builds log2(PAIRS) levels of multi-MB
    # slice/pad/concat ops, which stalls the axon remote compiler
    seg_start = jax.lax.cummax(jnp.where(first, kid, -1))
    rank = kid - seg_start
    keep = (stile < NT) & (rank < K)
    cand = jnp.full(NT * K + 1, -1, jnp.int32).at[
        jnp.where(keep, stile * K + rank, NT * K)
    ].set(sowner, mode="drop")[:NT * K].reshape(NT, K)
    # nearest dropped candidate per tile (inf = nothing dropped): if it
    # lies nearer than the tile's farthest resolved t, the tile is not
    # provably complete and takes the exact fallback.
    dropped = (stile < NT) & (rank >= K)
    drop_dmin = jnp.full(NT + 1, jnp.inf, jnp.float32).at[
        jnp.where(dropped, stile, NT)
    ].min(sdmin, mode="drop")[:NT]
    if _stage == 5:
        return dict(cand=cand, drop_dmin=drop_dmin)

    # ---- dense per-tile resolve --------------------------------------------
    # pixel dirs tiled: (NT, 64, 3); partial tiles padded with clamped
    # pixels (their results are discarded on reassembly)
    WP, HP = TW * TILE, TH * TILE
    pyp, pxp = jnp.meshgrid(
        jnp.arange(HP, dtype=jnp.int32), jnp.arange(WP, dtype=jnp.int32),
        indexing="ij",
    )
    pix_ok = (pxp < W) & (pyp < H)
    d_pad = _ray_dirs_for_pixels(
        jnp.minimum(pxp, W - 1), jnp.minimum(pyp, H - 1), basis, W, H
    )
    tile_of = lambda a: a.reshape(TH, TILE, TW, TILE, -1).transpose(
        0, 2, 1, 3, 4
    ).reshape(NT, TILE * TILE, -1)
    d_t = tile_of(d_pad)  # (NT, 64, 3)
    ok_t = tile_of(pix_ok[..., None])[..., 0]  # (NT, 64)

    cand_geom = jnp.concatenate([lo_f, size_f], axis=1)  # (M, 6)

    def cand_step(carry, ck):
        bt, bpl = carry
        g = cand_geom[jnp.clip(ck, 0, None)]  # (NT, 6)
        t, axis, hit = _mirrored_slab(
            g[:, None, 0:3], g[:, None, 0:3] + g[:, None, 3:6],
            cam_pos, d_t, tree_height, distance,
        )
        t = jnp.where((ck >= 0)[:, None] & hit, t, jnp.float32(jnp.inf))
        pl = (ck[:, None] << 2) | axis
        better = t < bt
        return (jnp.where(better, t, bt), jnp.where(better, pl, bpl)), None

    init = (
        jnp.full((NT, TILE * TILE), jnp.inf, jnp.float32),
        jnp.full((NT, TILE * TILE), -1, jnp.int32),
    )
    (tb, plb), _ = jax.lax.scan(
        cand_step, init, cand.T.reshape(K, NT)
    )
    if _stage == 6:
        return dict(tb=tb, plb=plb)

    # ---- completeness ---------------------------------------------------
    # A tile is provably resolved unless a candidate was dropped nearer
    # than its farthest resolved t; such tiles are listed for the exact
    # per-ray fallback (apply_fallback — a separate jit so this program
    # stays free of the traversal's while_loop).
    tile_max_t = jnp.max(jnp.where(ok_t, tb, -jnp.inf), axis=1)
    incomplete = jnp.isfinite(drop_dmin) & (drop_dmin < tile_max_t)
    n_fb = jnp.sum(incomplete.astype(jnp.int32))
    fb_key = jnp.where(incomplete, jnp.arange(NT, dtype=jnp.int32),
                       jnp.int32(NT))
    fb_tiles = jax.lax.sort(fb_key)[:NFB]
    fb_valid = fb_tiles < NT
    fb_tiles = jnp.clip(fb_tiles, 0, NT - 1)

    # ---- reassemble dense frame ---------------------------------------------
    def untile(a):
        return a.reshape(TH, TW, TILE, TILE).transpose(0, 2, 1, 3).reshape(
            HP, WP
        )[:H, :W].reshape(P)

    t_px = untile(tb)
    pl_px = untile(plb)
    use_near = near_t < t_px
    t_px = jnp.where(use_near, near_t, t_px)
    pl_px = jnp.where(use_near, near_pl, pl_px)
    hit_px = jnp.isfinite(t_px) & (pl_px >= 0)

    win_owner = jnp.where(hit_px, pl_px >> 2, 0)
    win_axis = jnp.where(hit_px, pl_px & 3, 3)
    shade = box_attr[win_owner]  # (P, 4) gather
    node = jnp.where(
        hit_px, jax.lax.bitcast_convert_type(shade[:, 0], jnp.int32), -1
    )
    rgb = jnp.where(hit_px[:, None], shade[:, 1:4], 0.0)
    d_sign = jnp.sign(d_flat)
    normal = jnp.where(
        (win_axis[:, None] == jnp.arange(3, dtype=jnp.int32)[None, :])
        & hit_px[:, None],
        -d_sign,
        0.0,
    )

    # hit voxel (un-mirrored integer coords) for picking/editing parity:
    # entry-axis coordinate is the hit plane; others floor the entry point
    # (in mirrored space, then un-mirror).
    wlo = box_lo[win_owner].astype(jnp.float32)
    wsz = box_size[win_owner].astype(jnp.float32)
    whi = wlo + wsz
    bound_w = jnp.float32(1 << tree_height)
    flip = d_flat < 0.0
    dd = jnp.maximum(jnp.abs(d_flat), EPS)
    s0 = jnp.where(flip, bound_w - cam_pos, cam_pos)
    mlo = jnp.where(flip, bound_w - whi, wlo)
    mhi = jnp.where(flip, bound_w - wlo, whi)
    pm = s0 + dd * t_px[:, None]
    vox_m = jnp.clip(jnp.floor(pm), mlo, mhi - 1.0)
    on_axis = win_axis[:, None] == jnp.arange(3, dtype=jnp.int32)[None, :]
    vox_m = jnp.where(on_axis, mlo, vox_m).astype(jnp.int32)
    voxel = jnp.where(
        flip, jnp.int32(1 << tree_height) - vox_m - 1, vox_m
    )
    voxel = jnp.where(hit_px[:, None], voxel, 0)

    t_out = jnp.where(hit_px, t_px, 0.0)
    overflow = (
        (n_t2 > T2) | (n_t3 > T3) | (n_near > near_slots) | (n_fb > NFB)
    )
    shp = (H, W)
    return dict(
        hit=hit_px.reshape(shp),
        t=t_out.reshape(shp),
        normal=normal.reshape(shp + (3,)),
        node=node.reshape(shp),
        rgb=rgb.reshape(shp + (3,)),
        voxel=voxel.reshape(shp + (3,)),
        overflow=overflow,
        n_pair=n_pair,
        n_near=n_near,
        n_mid=n_t2,
        n_big=n_t3,
        n_fallback=n_fb,
        fb_tiles=fb_tiles,
        fb_valid=fb_valid,
    )


@partial(jax.jit, static_argnames=("tree_height", "width_px", "height_px"))
def apply_fallback(
    res, table, root, tree_height: int, cam_pos, cam_basis,
    width_px: int, height_px: int, distance=FAR,
):
    """Exact per-ray re-resolve of the tiles raster_cast flagged as not
    provably complete, merged into its result. Its own jit so the
    traversal's while_loop never inflates the raster program's compile.
    """
    W, H = width_px, height_px
    P = W * H
    TW = -(-W // TILE)
    fb_tiles = res["fb_tiles"]
    fb_valid = res["fb_valid"]
    NFB = fb_tiles.shape[0]
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    basis = jnp.asarray(cam_basis, jnp.float32)

    fty = fb_tiles // TW
    ftx = fb_tiles - fty * TW
    lane = jnp.arange(TILE * TILE, dtype=jnp.int32)[None, :]
    fpx = ftx[:, None] * TILE + lane % TILE
    fpy = fty[:, None] * TILE + lane // TILE
    fd = _ray_dirs_for_pixels(
        jnp.minimum(fpx, W - 1), jnp.minimum(fpy, H - 1), basis, W, H
    )
    fr = svo_raycast_bucketed(
        table, root, tree_height, cam_pos, fd, distance=distance,
        active=jnp.broadcast_to(fb_valid[:, None], fpx.shape),
        min_bucket=2048,
    )
    # the traversal's cap is advisory — enforce it strictly here
    fb_hit = fr["hit"] & (fr["t"] <= distance) & fb_valid[:, None]
    fpid = jnp.where(
        fb_valid[:, None] & (fpx < W) & (fpy < H), fpy * W + fpx, P
    ).reshape(-1)

    def put(dst, src):
        flat = dst.reshape((P,) + dst.shape[2:])
        src = src.reshape((NFB * TILE * TILE,) + src.shape[2:])
        padded = jnp.concatenate(
            [flat, jnp.zeros((1,) + flat.shape[1:], flat.dtype)]
        )
        return padded.at[fpid].set(src, mode="drop")[:P].reshape(dst.shape)

    out = dict(res)
    out["hit"] = put(res["hit"], fb_hit)
    out["t"] = put(res["t"], jnp.where(fb_hit, fr["t"], 0.0))
    out["normal"] = put(res["normal"], fr["normal"] * fb_hit[..., None])
    out["node"] = put(res["node"], jnp.where(fb_hit, fr["node"], -1))
    out["rgb"] = put(res["rgb"], leaf_rgb(table, fr["node"])
                     * fb_hit[..., None])
    out["voxel"] = put(res["voxel"], fr["voxel"] * fb_hit[..., None])
    return out


def raster_cast_exact(
    box_lo, box_size, box_attr, cam_pos, cam_basis, tree_height: int,
    width_px: int, height_px: int, table=None, root=None, distance=FAR,
    **kw,
):
    """raster_cast + exact per-ray fallback on incomplete tiles (two
    device programs; pixel-parity with svo_raycast when the node table is
    supplied)."""
    res = raster_cast(
        box_lo, box_size, box_attr, cam_pos, cam_basis, tree_height,
        width_px, height_px, distance=distance, **kw,
    )
    if table is not None and root is not None:
        res = apply_fallback(
            res, table, root, tree_height, cam_pos, cam_basis,
            width_px, height_px, distance=distance,
        )
    return res


def pack_box_attr(soup):
    """float32[M, 4] shading attributes ([leaf_bits, r, g, b]) for
    raster_cast, from a world.boxes.BoxSoup."""
    import numpy as np

    leaf_bits = soup.leaf.astype(np.int32).view(np.float32)
    return np.concatenate([leaf_bits[:, None], soup.rgb], axis=1)


def raster_primary_frame(
    box_lo, box_size, box_attr, tree_height: int, cam_pos, cam_basis,
    sun, width_px: int, height_px: int, table=None, root=None, **kw,
):
    """Shaded primary-visibility frame (software.rs:260-276 shading),
    rasterizer edition — same output as shade.svo_primary_frame. Pass
    table/root to resolve incomplete tiles exactly."""
    r = raster_cast_exact(
        box_lo, box_size, box_attr, cam_pos, cam_basis, tree_height,
        width_px, height_px, table=table, root=root, **kw,
    )
    lighting = jnp.sum(sun * r["normal"], axis=-1) / 2.0 + 1.0
    return r["rgb"] * lighting[..., None] * r["hit"][..., None]
