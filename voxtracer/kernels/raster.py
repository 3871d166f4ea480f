"""Sort-based box rasterization — gather-free primary visibility.

The per-ray SVO traversal pays one serialized table gather per descent
step (~13 ns/row, PERF.md), capping any ray-walk design at ~1 Mrays/s.
This engine inverts the loop: it iterates over *geometry* (the world as
a static box soup, world/boxes.py) and resolves visibility with sorts,
scans and scatters, which run 10-20x cheaper per element than per-step
gathers on TPU. Pipeline (all one jit):

  1. project every box's corners (dense math), conservative pixel bbox;
  2. PHASE 1 — rasterize the size>1 boxes (the soup's ``n_big`` prefix:
     solid cubes, the bulk under every surface) exactly: expand to 8x8
     (tile, box) pairs, then to per-pixel fragments, exact slab test,
     sort-based z-resolve -> a dense partial z-buffer;
  3. occlusion bounds: max-pool that z-buffer per tile. Every phase-1
     hit is real opaque geometry, so a tile's pooled max bounds the
     final t of all 64 of its rays — anything provably farther is
     invisible;
  4. PHASE 2 — rasterize the unit boxes (the surface shell) the same
     way, but cull (tile, box) pairs whose camera-distance lower bound
     exceeds their tile's occlusion bound. This removes the hidden-
     hillside shell that otherwise dominates fragments (~15x overdraw
     measured at 1024^3). Truncating phase-1 only weakens the bound,
     never correctness;
  5. per fragment the slab test uses the traversal's own mirrored
     arithmetic (same planes, same f32 ops), so hits are bit-identical
     to kernels/traverse.svo_raycast away from degenerate edge-grazes;
  6. z-resolve: sort fragments by (pixel, t); winners (first of each
     pixel segment, at most one per pixel) are compacted by a second
     sort and scattered densely with two 1D scatters (a row-scatter over
     the full fragment array measured ~6x slower);
  7. boxes that are unprojectable (corners behind the camera) or cover
     more than ``near_cap`` pixels take a dense full-screen pass instead
     (a lax.scan over ``near_slots`` boxes).

Per-frame cost is O(boxes + pairs + fragments), independent of tree
depth. Behavioral reference for hit semantics: raytrace.wgsl:68-180
(entry-t from plane crossings, t==0 skip, entry-face normals, distance
cap — strict here, advisory there; see traverse.svo_raycast).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core import camera as vcam
from voxtracer.kernels.traverse import EPS, FAR

NEAR_EPS = 1.0e-4  # camera-space z below which corners are unprojectable
TILE = 8  # coarse-raster tile edge (pixels)


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
    "tree_height", "n_big", "width_px", "height_px", "frag_budget",
    "occ_frag_budget", "near_cap", "near_slots",
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
    n_big: int = 0,
    distance=FAR,
    frag_budget: int | None = None,
    occ_frag_budget: int | None = None,
    near_cap: int = 65536,
    near_slots: int = 64,
):
    """Rasterize the box soup for one camera; per-pixel nearest hit.

    Args:
      box_lo: int32[M, 3] box low corners; box_size: int32[M, 3] per-axis
        extents, ordered volume-descending (BoxSoup order): the first
        ``n_big`` entries form the phase-1 occluder set.
      box_attr: float32[M, 4] per-box [leaf_id_bits, r, g, b] — leaf slot
        id bitcast to f32 in column 0, albedo in 1..4 (build via
        ``pack_box_attr``).
      cam_pos/cam_basis: camera (pos (3,), basis (3,3)).
      distance: scalar far cap (strict, unlike the traversal's advisory
        cap — see traverse.svo_raycast).
      frag_budget / occ_frag_budget: static fragment-array lengths for
        phase 2 / phase 1 (defaults 3 and 2 x pixels); exceeding either
        sets ``overflow`` and the result may be incomplete.
      near_cap/near_slots: boxes covering > near_cap pixels (or with
        corners behind the camera) take the dense path; at most
        near_slots of them per frame (excess sets ``overflow``).

    Returns dict: hit (H,W) bool, t (H,W) f32, normal (H,W,3), node (H,W)
    i32 leaf slot (-1 miss), rgb (H,W,3), voxel (H,W,3) i32, overflow ()
    bool, n_frag/n_pair/n_near () i32 (demand vs the static budgets).
    """
    W, H = width_px, height_px
    P = W * H
    TW = -(-W // TILE)  # tiles per row
    TH = -(-H // TILE)
    NT = TW * TH
    M = box_lo.shape[0]
    assert 0 <= n_big <= M
    F2 = frag_budget if frag_budget is not None else 3 * P
    F1 = occ_frag_budget if occ_frag_budget is not None else 2 * P
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

    near = (~empty) & (any_behind | (pix_count > near_cap))
    usable = (~empty) & ~near

    # camera->box distance lower bound: for unit-direction rays t equals
    # euclidean distance, so the point-box distance bounds any ray's
    # entry t from below (used for the tile occlusion test).
    clamped = jnp.clip(cam_pos, lo_f, hi_f)
    dmin_b = jnp.linalg.norm(clamped - cam_pos, axis=-1)

    # ---- dense pass for near/huge boxes --------------------------------
    n_near = jnp.sum(near.astype(jnp.int32))
    _, near_idx = jax.lax.top_k(near.astype(jnp.int32), near_slots)
    near_valid = near[near_idx]

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

    def raster_pass(sl, F, tile_bound):
        """Rasterize boxes[sl] -> dense (t, payload) + demand counters.

        tile_bound: optional (NT+1,) per-tile occlusion bound; (tile,
        box) pairs with dmin > bound are culled before fragment
        expansion."""
        Mp = sl.stop - sl.start
        base = sl.start
        # boxes straddle ~1.5 tiles on average at sub-tile projected size
        PAIRS = max(Mp + Mp // 2 + 4 * NT, 16)
        tx0 = x0[sl] // TILE
        tx1 = x1[sl] // TILE
        ty0 = y0[sl] // TILE
        ty1 = y1[sl] // TILE
        tw = tx1 - tx0 + 1
        tile_count = jnp.where(usable[sl], tw * (ty1 - ty0 + 1), 0)
        t_off = jnp.cumsum(tile_count)
        n_pair = t_off[-1]
        powner = jnp.repeat(
            jnp.arange(Mp, dtype=jnp.int32), tile_count,
            total_repeat_length=PAIRS,
        )
        # one consolidated row per box: gathers dominate at this scale,
        # so each expansion stage does exactly ONE row gather.
        col = lambda a: a[:, None].astype(jnp.float32)
        pair_attr = jnp.concatenate(
            [
                col(t_off - tile_count), col(tx0), col(ty0), col(tw),
                col(x0[sl]), col(x1[sl]), col(y0[sl]), col(y1[sl]),
                dmin_b[sl][:, None],
                lo_f[sl], size_f[sl],
            ],
            axis=1,
        )  # (Mp, 15)
        pa = pair_attr[powner]
        kid = jnp.arange(PAIRS, dtype=jnp.int32)
        pvalid = kid < n_pair
        plocal = kid - pa[:, 0].astype(jnp.int32)
        ptw = jnp.maximum(pa[:, 3].astype(jnp.int32), 1)
        pty = pa[:, 2].astype(jnp.int32) + plocal // ptw
        ptx = pa[:, 1].astype(jnp.int32) + plocal % ptw
        ptile = jnp.where(pvalid, pty * TW + ptx, NT)
        keep = pvalid
        if tile_bound is not None:
            keep = keep & (pa[:, 8] <= tile_bound[ptile])

        # fragment rect = pixel bbox clipped to the tile
        tpx0 = ptx * TILE
        tpy0 = pty * TILE
        rx0 = jnp.maximum(pa[:, 4].astype(jnp.int32), tpx0)
        rx1 = jnp.minimum(
            jnp.minimum(pa[:, 5].astype(jnp.int32), tpx0 + TILE - 1), W - 1
        )
        ry0 = jnp.maximum(pa[:, 6].astype(jnp.int32), tpy0)
        ry1 = jnp.minimum(
            jnp.minimum(pa[:, 7].astype(jnp.int32), tpy0 + TILE - 1), H - 1
        )
        rw = rx1 - rx0 + 1
        rh = ry1 - ry0 + 1
        fcount = jnp.where(keep & (rw > 0) & (rh > 0), rw * rh, 0)
        f_off = jnp.cumsum(fcount)
        n_frag = f_off[-1]
        fowner = jnp.repeat(
            jnp.arange(PAIRS, dtype=jnp.int32), fcount,
            total_repeat_length=F,
        )
        frag_attr = jnp.concatenate(
            [
                col(f_off - fcount), col(rx0), col(ry0), col(rw),
                pa[:, 9:15],  # box lo (3) + size (3)
                col(powner + base),
            ],
            axis=1,
        )  # (PAIRS, 11)
        fa = frag_attr[fowner]  # (F, 11) — the one fragment-stage gather
        fid = jnp.arange(F, dtype=jnp.int32)
        fvalid = fid < n_frag
        flocal = fid - fa[:, 0].astype(jnp.int32)
        frw = jnp.maximum(fa[:, 3].astype(jnp.int32), 1)
        fpy = fa[:, 2].astype(jnp.int32) + flocal // frw
        fpx = fa[:, 1].astype(jnp.int32) + flocal % frw
        fbox = fa[:, 10].astype(jnp.int32)  # global box index
        d_f = _ray_dirs_for_pixels(fpx, fpy, basis, W, H)  # (F, 3)
        flo = fa[:, 4:7]
        fhi = flo + fa[:, 7:10]
        t_f, axis_f, hit_f = _mirrored_slab(flo, fhi, cam_pos, d_f,
                                            tree_height, distance)
        t_f = jnp.where(fvalid & hit_f, t_f, jnp.float32(jnp.inf))
        # invalid/budget-padding fragments sort to the sentinel pixel
        pid = jnp.where(fvalid, fpy * W + fpx, P)
        payload = (fbox << 2) | axis_f

        # z-resolve: sort by (pixel, t); winner = first of each pixel
        # segment; compact winners (<= P+1) with a second sort; two 1D
        # scatters produce the dense buffers.
        spid, st, spl = jax.lax.sort((pid, t_f, payload), num_keys=2)
        first = jnp.concatenate([jnp.ones(1, bool), spid[1:] != spid[:-1]])
        first = first & (spid < P) & jnp.isfinite(st)
        ckey = jnp.where(first, spid, P)
        ckey, ct, cpl = jax.lax.sort((ckey, st, spl), num_keys=1)
        nw = min(P + 1, F)
        ckey, ct, cpl = ckey[:nw], ct[:nw], cpl[:nw]
        dt = jnp.full(P + 1, jnp.inf, jnp.float32).at[ckey].set(
            ct, mode="drop"
        )[:P]
        dpl = jnp.full(P + 1, -1, jnp.int32).at[ckey].set(
            cpl, mode="drop"
        )[:P]
        return dt, dpl, n_frag, n_pair, n_pair > PAIRS

    inf_t = jnp.full(P, jnp.inf, jnp.float32)
    neg_pl = jnp.full(P, -1, jnp.int32)

    # ---- phase 1: size>1 occluders --------------------------------------
    if n_big > 0:
        t1, pl1, nf1, np1, pov1 = raster_pass(slice(0, n_big), F1, None)
        # per-tile occlusion bound: the pooled max of real opaque hits
        # bounds the final t of every ray in the tile (misses pool to inf
        # and disable culling for that tile).
        padded = jnp.full((TH * TILE, TW * TILE), jnp.inf, jnp.float32)
        padded = padded.at[:H, :W].set(t1.reshape(H, W))
        tile_bound = padded.reshape(TH, TILE, TW, TILE).max(axis=(1, 3))
        tile_bound = jnp.concatenate(
            [tile_bound.reshape(NT), jnp.full(1, jnp.inf, jnp.float32)]
        )
    else:
        t1, pl1, nf1, np1, pov1 = (inf_t, neg_pl, jnp.int32(0),
                                   jnp.int32(0), jnp.bool_(False))
        tile_bound = None

    # ---- phase 2: unit shell, occlusion-culled ---------------------------
    if n_big < M:
        t2, pl2, nf2, np2, pov2 = raster_pass(slice(n_big, M), F2,
                                              tile_bound)
    else:
        t2, pl2, nf2, np2, pov2 = (inf_t, neg_pl, jnp.int32(0),
                                   jnp.int32(0), jnp.bool_(False))

    # ---- merge phases + dense-near result --------------------------------
    use2 = t2 < t1
    t_px = jnp.where(use2, t2, t1)
    pl_px = jnp.where(use2, pl2, pl1)
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

    overflow = (
        (nf1 > F1) | (nf2 > F2) | pov1 | pov2 | (n_near > near_slots)
    )
    t_out = jnp.where(hit_px, t_px, 0.0)
    shp = (H, W)
    return dict(
        hit=hit_px.reshape(shp),
        t=t_out.reshape(shp),
        normal=normal.reshape(shp + (3,)),
        node=node.reshape(shp),
        rgb=rgb.reshape(shp + (3,)),
        voxel=voxel.reshape(shp + (3,)),
        overflow=overflow,
        n_frag=nf1 + nf2,
        n_pair=np1 + np2,
        n_near=n_near,
    )


def pack_box_attr(soup):
    """float32[M, 4] shading attributes ([leaf_bits, r, g, b]) for
    raster_cast, from a world.boxes.BoxSoup."""
    import numpy as np

    leaf_bits = soup.leaf.astype(np.int32).view(np.float32)
    return np.concatenate([leaf_bits[:, None], soup.rgb], axis=1)


def raster_primary_frame(
    box_lo, box_size, box_attr, tree_height: int, cam_pos, cam_basis,
    sun, width_px: int, height_px: int, **kw,
):
    """Shaded primary-visibility frame (software.rs:260-276 shading),
    rasterizer edition — same output as shade.svo_primary_frame."""
    r = raster_cast(
        box_lo, box_size, box_attr, cam_pos, cam_basis, tree_height,
        width_px, height_px, **kw,
    )
    lighting = jnp.sum(sun * r["normal"], axis=-1) / 2.0 + 1.0
    return r["rgb"] * lighting[..., None] * r["hit"][..., None]
