"""Tile-binned box rasterization — gather-free primary visibility.

The per-ray SVO traversal pays one serialized table gather per descent
step (~13 ns/row, PERF.md), capping any ray-walk design at ~1 Mrays/s.
This engine inverts the loop: it iterates over *geometry* (the world as
a static box soup, world/boxes.py) and resolves visibility per screen
tile with sorts and dense vector math. Pipeline (all one jit):

  1. project every box's corners (dense math), conservative pixel bbox,
     frustum cull;
  2. emit (tile, box) pairs with FIXED arity by tile-span-product tier:
     1x1 spans (the vast majority — all distant terrain) emit their
     single pair unconditionally; spans covering up to 2/4/8/../1024
     tiles emit that many pairs (row-major rectangle enumeration, <= 2x
     waste) from slot arrays selected by one composite index sort. ONE
     2-key sort by (tile, camera-distance lower bound)
     then groups each tile's candidates contiguously nearest-first —
     occlusion culling falls out of K-truncation (hidden hillsides and
     buried cubes rank behind the surface and are dropped);
  3. binning is pure position arithmetic on the sorted pairs: a
     searchsorted finds each tile's segment start and the K nearest
     candidates are row gathers at [start, start+K) (no multi-million-
     element scatters — see PERF.md on scatter cost);
  4. dense resolve: a chunked lax.scan tests all 64 rays of every tile
     against its candidate boxes — pure VPU math, in-register z-min, no
     fragment arrays, no data-dependent budgets. The slab test uses the
     traversal's own mirrored arithmetic (same planes, same f32 ops), so
     hits are bit-identical to kernels/traverse.svo_raycast away from
     degenerate edge-grazes. Boxes too near/degenerate to project
     (corners behind the camera, or covering > 1024 tiles) seed the
     same carry from a dense all-tiles pre-pass;
  5. completeness: a tile is provably done unless candidates were
     dropped nearer than its farthest resolved t. Incomplete tiles get a
     SECOND CHANCE in-jit: their next ``widen_k`` candidates are read
     from the same sorted segment (position gathers again) and resolved
     densely. Tiles still incomplete after that (at most
     ``fallback_tiles``) are re-resolved exactly by a compacted per-ray
     ``svo_raycast`` when the node table is supplied.

Per-frame cost is O(boxes + pairs + tiles*K), independent of tree depth
and of fragment counts. Behavioral reference for hit semantics:
raytrace.wgsl:68-180 (entry-t from plane crossings, t==0 skip,
entry-face normals, distance cap — strict here, advisory there; see
traverse.svo_raycast).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core import camera as vcam
from voxtracer.kernels.traverse import (EPS, FAR, leaf_rgb,
                                        svo_raycast_bucketed)

NEAR_EPS = 1.0e-4  # camera-space z below which corners are unprojectable
TILE = 8  # screen tile edge (pixels)
CHUNK = 8  # candidate boxes resolved per scan step
# Opt-in Pallas resolve fold (kernels/pallas/resolve.py): the main
# dense resolve's carry lives in VMEM for the whole candidate loop
# instead of round-tripping HBM per scan chunk. Bit-identical; gated
# off until the TPU A/B lands (remote Mosaic compile risk, CLAUDE.md).
_PALLAS_RESOLVE = os.environ.get("VOXT_PALLAS_RESOLVE", "0") == "1"


# Emission tier arities: tier t holds boxes whose tile-span PRODUCT
# tw*th lies in (arity[t-1], arity[t]] and emits exactly arity[t] pairs
# per slot (k -> (k % tw, k // tw) enumerates the rectangle row-major,
# so per-box emission waste is bounded by 2x — the old square-span tiers
# emitted span^2 pairs, up to 8x waste for thin boxes, and with
# worst-case capacities the pair sort carried ~5x sentinels; PAIRS is
# the frame's largest box-count term, PERF.md).
PAIR_ARITIES = (2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
_NTIERS = len(PAIR_ARITIES)


def _default_pair_slots(pair_slots, jittered: bool):
    """Worst-case per-tier box capacities, used when the caller supplies
    none. Production paths should probe ``n_tier`` once per pose and pass
    demand-sized capacities instead (``fit_pair_slots``) — the Renderer
    and bench do. Jittered rays pad every bbox by a half pixel, pushing
    sub-pixel boxes across tile boundaries into the low tiers (silently
    overflowing a tier drops boxes the completeness logic cannot see —
    overflow is reported and probing makes it impossible)."""
    if pair_slots is not None:
        return pair_slots
    if jittered:
        return (1 << 22, 1 << 21, 1 << 18, 1 << 16, 1 << 14,
                1 << 12, 1 << 11, 1 << 10, 1 << 9, 1 << 9)
    return (1 << 21, 1 << 20, 1 << 17, 1 << 15, 1 << 13,
            1 << 12, 1 << 11, 1 << 10, 1 << 9, 1 << 9)


def fit_pair_slots(n_tier, margin: float = 1.06, floor: int = 16,
                   current=None):
    """Demand-sized per-tier capacities from the ``n_tier`` counters.

    The defaults above are worst-case: at the bench config they make the
    pair sort ~5x larger than real pair demand — and the (tile, dmin)
    sort is the largest box-count-driven term of the frame (PERF.md).
    Each tier is sized to ``margin * demand`` rounded up to a multiple
    of 2^(bits-5) (i.e. within ~3%), which keeps capacity <= ~1.1x
    demand while quantizing the static-shape space; growing stickily via
    ``current`` bounds the number of distinct shapes — hence recompiles
    — a session can see. Every probe re-fits before the timed/production
    cast, so the margin only absorbs pose-to-pose drift between probes,
    not safety (slots sized from a pose's own probe cannot overflow for
    that pose). The floor matters at the HIGH tiers: arity 1024 x a
    256-slot floor alone would pad the sort by 262k pairs for a handful
    of real boxes — 16 slots x the two top tiers is ~25k.

    n_tier: the demand counters [near, t1..t10] returned by
    raster_bins/raster_cast (host ints). Returns a ``pair_slots`` tuple.
    ``current``: previous slots; the result never shrinks below them.
    Slots sized from a pose's own probe can never overflow for that
    pose: n_tier counts demand BEFORE clipping.
    """
    import numpy as np

    tiers = [int(x) for x in np.asarray(n_tier).reshape(-1)[1:]]
    assert len(tiers) == _NTIERS
    out = []
    for k, d in enumerate(tiers):
        need = max(int(d * margin) + 16, floor)
        step = 1 << max(need.bit_length() - 5, 0)
        s = -(-need // step) * step
        if current is not None:
            s = max(s, current[k])
        out.append(s)
    return tuple(out)


def fit_near_slots(n_near, margin: float = 2.0, floor: int = 8,
                   current: int = 0) -> int:
    """Demand-sized capacity for the dense all-tiles pre-pass (see
    fit_pair_slots for the sizing/sticky-growth rationale; the pre-pass
    scans ALL tiles per CHUNK of capacity, so oversizing it costs a
    dense resolve sweep per 8 slots)."""
    need = max(int(int(n_near) * margin), floor)
    return max(1 << (need - 1).bit_length(), current)


def fit_widen_tiles(n_widen, margin: float = 1.5, floor: int = 64,
                    current=None):
    """Demand-sized per-round widen tile capacities from the ``n_widen``
    counters (incomplete tiles ENTERING each round, raster_cast). Same
    contract as fit_pair_slots: margin + coarse rounding to bound the
    static-shape space, sticky growth via ``current``. Each widen round
    costs ~(tiles x k_extra) gather rows (PERF.md), so the default
    4096-tile round-1 capacity is ~2-3x real demand at the bench poses.
    """
    import numpy as np

    counts = [int(x) for x in np.asarray(n_widen).reshape(-1)]
    out = []
    for k, d in enumerate(counts):
        need = max(int(d * margin) + 8, floor)
        step = 1 << max(need.bit_length() - 3, 0)
        s = -(-need // step) * step
        if current is not None:
            s = max(s, current[k])
        out.append(s)
    return tuple(out)


def _seg_rows(arr2, starts, size: int):
    """``size`` CONSECUTIVE rows of ``arr2`` (N, 2) from each start
    index, as explicit (S, size) row gathers. Row COUNT is the gather
    cost (PERF.md ~13 ns/row) and this shape measured FASTER than both
    a vmap(dynamic_slice) sliced fetch (+33 ms on the 1080p frame) and
    an aligned-block 2*BLOCK-wide reshaped fetch (+16 ms) — on this
    backend plain explicit-index row gathers are the fast path, wide
    tricks lower worse. Indices clamp to the array end; callers mask
    fetched rows by tile id."""
    pos = jnp.minimum(
        starts[:, None] + jnp.arange(size, dtype=jnp.int32),
        arr2.shape[0] - 1,
    )
    return arr2[pos]  # (S, size, 2)


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


def _pose_bins(
    box_lo, box_size, cam_pos, basis, tree_height: int,
    width_px: int, height_px: int, cand_k: int, near_slots: int,
    pair_slots: tuple, jittered: bool, _stage: int = 0,
    box_attr=None,
):
    """The pose-only half of the rasterizer: project, tier, emit, sort,
    bin. Depends on the camera POSE but not on the per-sample ray
    directions, so progressive samplers at a fixed pose compute it once
    (kernels.raster.raster_bins) and resolve each sample against the
    cached bins — at flagship scale the bins are most of the frame.

    Returns a dict of device arrays: ``skey`` (the packed u32 sort key —
    tile in the high bits, dmin quantized into the low ``dmin_bits``),
    ``spairs`` (PAIRS, 8) sorted pair records [key, owner, packed
    geometry x3, rgb bitcast x3], ``seg_start`` (per-tile
    segment starts), ``cand_rows`` (NT, K, 8) nearest candidate
    records (positional — no id re-gather needed), ``drop_dmin``
    (per-tile nearest dropped lower bound), ``near_idx``/``near_valid``
    (dense pre-pass slots), and the ``n_pair``/``n_near``/``n_tier``
    demand counters."""
    W, H = width_px, height_px
    TW = -(-W // TILE)
    TH = -(-H // TILE)
    NT = TW * TH
    M = box_lo.shape[0]
    K = -(-cand_k // CHUNK) * CHUNK
    NS = max(min(near_slots, M), 1)  # real near capacity
    NSP = -(-NS // CHUNK) * CHUNK  # padded to whole scan chunks
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    basis = jnp.asarray(basis, jnp.float32)

    lo_f = box_lo.astype(jnp.float32)
    size_f = box_size.astype(jnp.float32)  # (M, 3) per-axis extents
    hi_f = lo_f + size_f

    # ---- project the 8 corners to screen -------------------------------
    # camera space v = basis^T (corner - pos); screen lx = vx/vz,
    # ly = -vy/vz; pixel-center coords px = (lx*h + w)/2 - 0.5 (inverse
    # of camera.pixel_ndc). Written as fused elementwise math over 1-D
    # (M,) columns, one corner at a time, for three reasons: the TPU's
    # default matmul runs bf16 passes (a 1-2 px projection error at
    # 8192-scale coordinates that silently loses edge tile columns and
    # the completeness logic cannot see it); a K=3 matmul wastes the MXU
    # even at HIGHEST (measured ~60 ms of the frame); and (M, 8, 3)
    # temps materialize 128-lane padded (PERF.md).
    # jittered rays roam +-0.5 px off pixel centers, extending edge
    # pixels' ndc reach by a full pixel footprint (1/H in each ndc axis)
    # beyond the pixel-center frustum — widen the hard cull to match
    # (the bbox pad below handles it for the tile spans, but a box culled
    # here never reaches the completeness logic)
    jit_pad = (1.0 / H) if jittered else 0.0
    fx = jnp.float32((W - 1) / H + 1e-3 + jit_pad)
    fy = jnp.float32(1.0 + 1e-3 + jit_pad)
    bT = [[basis[i, j] for j in range(3)] for i in range(3)]
    rel_lo = [lo_f[:, i] - cam_pos[i] for i in range(3)]
    rel_hi = [hi_f[:, i] - cam_pos[i] for i in range(3)]
    any_behind = all_behind = None
    out_px = out_nx = out_py = out_ny = None
    px_min = px_max = py_min = py_max = None
    for corner in range(8):
        c = [rel_hi[a] if (corner >> a) & 1 else rel_lo[a]
             for a in range(3)]
        vx = c[0] * bT[0][0] + c[1] * bT[1][0] + c[2] * bT[2][0]
        vy = c[0] * bT[0][1] + c[1] * bT[1][1] + c[2] * bT[2][1]
        vz = c[0] * bT[0][2] + c[1] * bT[1][2] + c[2] * bT[2][2]
        behind = vz < NEAR_EPS
        # frustum halfspace tests (valid behind the camera too): every
        # pixel ray satisfies |lx| <= fx, |ly| <= fy, so a box with all
        # corners outside one side plane can't be hit by any ray
        o_px = vx > vz * fx
        o_nx = -vx > vz * fx
        o_py = vy > vz * fy
        o_ny = -vy > vz * fy
        vz_safe = jnp.maximum(vz, NEAR_EPS)
        pxc = (vx / vz_safe * H + W) * 0.5 - 0.5
        pyc = (-vy / vz_safe * H + H) * 0.5 - 0.5
        if corner == 0:
            any_behind, all_behind = behind, behind
            out_px, out_nx, out_py, out_ny = o_px, o_nx, o_py, o_ny
            px_min = px_max = pxc
            py_min = py_max = pyc
        else:
            any_behind = any_behind | behind
            all_behind = all_behind & behind
            out_px, out_nx = out_px & o_px, out_nx & o_nx
            out_py, out_ny = out_py & o_py, out_ny & o_ny
            px_min = jnp.minimum(px_min, pxc)
            px_max = jnp.maximum(px_max, pxc)
            py_min = jnp.minimum(py_min, pyc)
            py_max = jnp.maximum(py_max, pyc)
    outside = out_px | out_nx | out_py | out_ny

    # fp conservativeness: f32 rounding in the projection grows with
    # world scale; jittered rays additionally roam +-0.5 px off center
    pad = 0.01 + (1 << tree_height) * 2.0e-5
    if jittered:
        pad += 0.5
    x0 = jnp.ceil(px_min - pad).astype(jnp.int32)
    x1 = jnp.floor(px_max + pad).astype(jnp.int32)
    y0 = jnp.ceil(py_min - pad).astype(jnp.int32)
    y1 = jnp.floor(py_max + pad).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, W - 1)
    x1 = jnp.clip(x1, -1, W - 1)
    y0 = jnp.clip(y0, 0, H - 1)
    y1 = jnp.clip(y1, -1, H - 1)
    bw = x1 - x0 + 1
    bh = y1 - y0 + 1
    empty = (bw <= 0) | (bh <= 0) | all_behind | outside

    # tile spans (drive the emission tiers)
    tx0 = x0 // TILE
    tx1 = x1 // TILE
    ty0 = y0 // TILE
    ty1 = y1 // TILE
    tw = tx1 - tx0 + 1
    th = ty1 - ty0 + 1

    # dense pre-pass tier: behind-camera corners or a tile-span product
    # beyond the largest emission arity (a box covering > 1024 tiles is
    # close enough to be worth testing against every tile)
    prod = tw * th
    near = (~empty) & (any_behind | (prod > PAIR_ARITIES[-1]))
    usable = (~empty) & ~near
    if _stage == 1:  # runtime bisection aid (`_stage`: see docstring)
        return dict(near=near, usable=usable)

    # camera->box distance lower bound: for unit-direction rays t equals
    # euclidean distance, so the point-box distance bounds any ray's
    # entry t from below (drives the per-tile nearest-K ordering).
    clamped = jnp.clip(cam_pos, lo_f, hi_f)
    dmin_b = jnp.linalg.norm(clamped - cam_pos, axis=-1)

    # ---- tier selection: ONE composite sort ----------------------------
    # tiers: 0 = near/dense, t = 1.._NTIERS for span products in
    # (arity[t-1], arity[t]]. 1x1-span boxes (the vast majority — all
    # distant terrain) skip selection entirely: they emit their single
    # pair unconditionally below, keeping the pair count ~M instead of
    # 2M+ (the pair sort is the flagship frame's biggest term). Sorting
    # (tier * M + index) groups each selected tier's box indices
    # contiguously and in index order; per-tier slot arrays are dynamic
    # slices at searchsorted segment starts (top_k and per-tier sorts
    # are strictly slower on TPU). tier*M fits int32 up to M ~ 178M
    # boxes (12*M < 2^31).
    sel = usable & (prod > 1)
    tier = jnp.full((M,), 1, jnp.int32)
    for thr in PAIR_ARITIES[:-1]:
        tier = tier + (prod > thr).astype(jnp.int32)
    tier = jnp.where(near, 0, jnp.where(sel, tier, _NTIERS + 1))
    midx = jnp.arange(M, dtype=jnp.int32)
    csort = jax.lax.sort(tier * M + midx)
    seg = jnp.searchsorted(
        csort, jnp.arange(1, _NTIERS + 2, dtype=jnp.int32) * M
    ).astype(jnp.int32)
    n_near = seg[0]
    n_tier = jnp.concatenate([seg[:1], jnp.diff(seg)])  # [near, t1..t10]

    def tier_slots(k: int, slots: int):
        S = max(min(slots, M), 1)
        v = jax.lax.dynamic_slice(csort, (seg[k - 1],), (S,))
        valid = (v >= k * M) & (v < (k + 1) * M)
        return jnp.where(valid, v - k * M, 0), valid

    near_v = jnp.concatenate([
        csort[:NS], jnp.full(NSP - NS, (_NTIERS + 2) * M, jnp.int32)
    ])
    near_valid = near_v < M
    near_idx = jnp.where(near_valid, near_v, 0)
    if _stage == 2:
        return dict(near_idx=near_idx, n_near=n_near, n_tier=n_tier)

    # ---- (tile, box) pairs: FIXED-ARITY emission ------------------------
    # Data-dependent expansion (cumsum offsets + repeat/scatter+scan) is
    # the axon remote compiler's tarpit (20+ min for this one stage), so
    # pairs are emitted with static arity: 1x1-span boxes contribute one
    # pair unconditionally (pure elementwise math on the M arrays — no
    # gathers; sentinels sort to the end); larger spans emit arity[t]
    # pairs from their tier's slot array — slot k maps to tile
    # (tx0 + k % tw, ty0 + k // tw), enumerating the span rectangle
    # row-major, so a box wastes at most 2x its true tile count — with
    # ALL per-box fields read by ONE packed row gather per slot (element
    # gathers per field were the whole stage's cost). The k // tw
    # division runs as floor((k + 0.5) * (1/tw)) in f32: exact for
    # k < 1024, tw <= 1024 (margin 0.5/tw ~ 4.9e-4 > the ~1.2e-4 f32
    # rounding), and far cheaper than vector integer division.
    # Every pair CARRIES its box's geometry + albedo through the sort
    # (packed 16-bit coordinate fields + bitcast rgb), so the resolve
    # and widen rounds read candidates POSITIONALLY — one row fetch per
    # candidate replaces the old id fetch + cand_geom[id] re-gather
    # (row gathers are the frame's serialized cost, ~13 ns/row
    # regardless of width, PERF.md; the double gather was ~11 ms of the
    # 1080p frame and most of the flagship widen rounds). Coordinates
    # and extents are whole numbers < 2^16 (world edge <= 2^13), so the
    # 16-bit fields decode bit-exactly.
    q0 = box_lo[:, 0] | (box_lo[:, 1] << 16)
    q1 = box_lo[:, 2] | (box_size[:, 0] << 16)
    q2 = box_size[:, 1] | (box_size[:, 2] << 16)
    if box_attr is None:
        # bins built without albedo: geometry-only callers (want_voxel
        # casts gather winner attributes per pixel at the end anyway);
        # shading-only resolves (carry_rgb) need bins built WITH attr
        rgb_bits = jnp.zeros((M, 3), jnp.int32)
    else:
        rgb_bits = jax.lax.bitcast_convert_type(
            jnp.asarray(box_attr, jnp.float32)[:, 1:4], jnp.int32)

    tier_list = []  # (tile, owner, dmin, q0, q1, q2, r, g, b) tuples

    one = usable & (prod <= 1)
    tier_list.append((
        jnp.where(one, ty0 * TW + tx0, NT),
        midx,
        jnp.where(one, dmin_b, jnp.inf),
        q0, q1, q2,
        rgb_bits[:, 0], rgb_bits[:, 1], rgb_bits[:, 2],
    ))

    packed_span = jnp.stack([
        tx0, tx1, ty0, ty1,
        jax.lax.bitcast_convert_type(dmin_b, jnp.int32),
        q0, q1, q2,
        rgb_bits[:, 0], rgb_bits[:, 1], rgb_bits[:, 2],
    ], axis=1)  # (M, 11)
    for k, (slots, arity) in enumerate(zip(pair_slots, PAIR_ARITIES), 1):
        idx, valid = tier_slots(k, slots)
        rows = packed_span[idx]  # (S, 11) one row gather per slot
        etx0, etx1, ety0, ety1 = (rows[:, i] for i in range(4))
        edmin = jax.lax.bitcast_convert_type(rows[:, 4], jnp.float32)
        egeom = tuple(rows[:, 5 + i] for i in range(6))
        tw_e = etx1 - etx0 + 1
        th_e = ety1 - ety0 + 1
        inv_tw = 1.0 / tw_e.astype(jnp.float32)
        if arity <= 8:
            # 1-D per-slot emission: an (S, arity) temp would
            # materialize 128-lane padded (32x memory) at these S
            for kk in range(arity):
                iy = jnp.floor((kk + 0.5) * inv_tw).astype(jnp.int32)
                ix = kk - iy * tw_e
                pv = valid & (iy < th_e)
                tier_list.append((
                    jnp.where(pv, (ety0 + iy) * TW + etx0 + ix, NT),
                    idx,
                    jnp.where(pv, edmin, jnp.inf),
                ) + egeom)
            continue
        kk = jnp.arange(arity, dtype=jnp.int32)
        iy = jnp.floor(
            (kk[None, :].astype(jnp.float32) + 0.5) * inv_tw[:, None]
        ).astype(jnp.int32)
        ix = kk[None, :] - iy * tw_e[:, None]
        ptx = etx0[:, None] + ix
        pty = ety0[:, None] + iy
        pv = valid[:, None] & (iy < th_e[:, None])
        S = idx.shape[0]
        tier_list.append((
            jnp.where(pv, pty * TW + ptx, NT).reshape(S * arity),
            jnp.broadcast_to(idx[:, None], (S, arity)).reshape(-1),
            jnp.where(pv, edmin[:, None], jnp.inf).reshape(-1),
        ) + tuple(
            jnp.broadcast_to(c[:, None], (S, arity)).reshape(-1)
            for c in egeom
        ))

    ptile = jnp.concatenate([t[0] for t in tier_list])
    powner = jnp.concatenate([t[1] for t in tier_list])
    pdmin = jnp.concatenate([t[2] for t in tier_list]).astype(jnp.float32)
    pgeom = [jnp.concatenate([t[3 + i] for t in tier_list])
             for i in range(6)]
    PAIRS = ptile.shape[0]
    n_pair = jnp.sum((ptile < NT).astype(jnp.int32))
    if _stage == 3:
        return dict(ptile=ptile, pdmin=pdmin, powner=powner)

    # ---- binning: sort once, then pure position arithmetic --------------
    # Pairs sorted by (tile, dmin) put each tile's candidates in one
    # contiguous nearest-first segment; segment starts come from a
    # searchsorted (binary search: log2(PAIRS) small gathers) and the
    # K nearest candidates are row gathers at [start, start+K). This
    # replaces the scatter-based binning that dominated the frame
    # (multi-million-source scatters run ~9 ns/element, PERF.md).
    #
    # The sort key is ONE packed u32 — tile in the high bits, dmin
    # quantized into the rest — so the sort is 1-key/2-operand instead
    # of 2-key/3-operand (~30% cheaper at PAIRS-scale, PERF.md sort
    # table). Quantizing dmin only loosens the within-tile order by one
    # quantum; the completeness logic stays sound because every dropped
    # bound below is the DEQUANTIZED FLOOR minus one quantum — a true
    # lower bound on any dropped candidate's dmin (same-quantum entries
    # may be reordered, never misclassified).
    # tile field (incl. sentinel NT) + one reserved zero sign bit so the
    # int32-bitcast keys compare identically to the u32 packing
    NTB = int(NT + 1).bit_length() + 1
    DB = 32 - NTB
    diag = float(3.0 ** 0.5) * float(1 << tree_height)
    quantum = jnp.float32(diag / ((1 << DB) - 2))
    qd = jnp.minimum(
        (pdmin * (1.0 / quantum)).astype(jnp.int32), (1 << DB) - 2
    )
    qd = jnp.where(jnp.isfinite(pdmin), qd, (1 << DB) - 1)
    key = jax.lax.bitcast_convert_type(
        (ptile.astype(jnp.uint32) << DB)
        | qd.astype(jnp.uint32), jnp.int32,
    )
    assert NT < (1 << (NTB - 1)), "tile id would set the sign bit"
    # ONE stable sort carries the full candidate record (owner + packed
    # geometry + rgb) alongside the key: equal keys keep emission order,
    # so the candidate sequence per tile is identical to a 2-operand
    # sort — only the resolve's read pattern changes (positional rows
    # instead of id + cand_geom[id] gathers).
    sorted_cols = jax.lax.sort(
        (key, powner) + tuple(pgeom), num_keys=1)
    skey = sorted_cols[0]
    stile = jax.lax.shift_right_logical(skey, DB)
    spairs = jnp.stack(sorted_cols, axis=1)  # (PAIRS, 8) row fetches
    tix = jnp.arange(NT, dtype=jnp.int32)
    seg_start = jnp.searchsorted(
        skey, jnp.left_shift(tix, DB)).astype(jnp.int32)
    cand_rows = _seg_rows(spairs, seg_start, K)  # (NT, K, 8)
    # nearest dropped candidate per tile (inf = nothing dropped): the
    # conservative dequantized bound of the entry at rank K.
    posk = jnp.minimum(seg_start + K, PAIRS - 1)
    deq = lambda k: jnp.maximum(
        (k & ((1 << DB) - 1)) - 1, 0).astype(jnp.float32) * quantum
    drop_dmin = jnp.where(stile[posk] == tix, deq(skey[posk]),
                          jnp.float32(jnp.inf))
    return dict(
        skey=skey, spairs=spairs, seg_start=seg_start, dmin_bits=DB,
        cand_rows=cand_rows, drop_dmin=drop_dmin, near_idx=near_idx,
        near_valid=near_valid, n_pair=n_pair, n_near=n_near,
        n_tier=n_tier,
    )


@partial(jax.jit, static_argnames=(
    "tree_height", "width_px", "height_px", "cand_k", "near_slots",
    "pair_slots", "jittered", "_stage",
))
def raster_bins(
    box_lo, box_size, cam_pos, cam_basis, tree_height: int,
    width_px: int, height_px: int, cand_k: int = 16, near_slots: int = 64,
    pair_slots: tuple | None = None,
    jittered: bool = False, _stage: int = 0, box_attr=None,
):
    """Pose-only raster state (see _pose_bins) as its own jit: compute
    once per camera pose, then pass to ``raster_cast(..., bins=...)``
    for every progressive sample at that pose. ``jittered`` must be True
    when the samples will supply sub-pixel-jittered ``ray_dirs``.
    ``box_attr`` bakes per-box albedo into the candidate records —
    REQUIRED when the bins will serve shading-only casts
    (want_voxel=False), whose resolve carries RGB positionally."""
    return _pose_bins(
        box_lo, box_size, cam_pos, cam_basis, tree_height, width_px,
        height_px, cand_k, near_slots,
        _default_pair_slots(pair_slots, jittered), jittered, _stage,
        box_attr=box_attr,
    )


@partial(jax.jit, static_argnames=(
    "tree_height", "width_px", "height_px", "cand_k", "widen_k",
    "widen_tiles", "widen2_k", "widen2_tiles", "widen3_k", "widen3_tiles",
    "fallback_tiles",
    "near_slots", "pair_slots", "want_voxel", "band_rows", "_stage",
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
    cand_k: int = 16,
    widen_k: int = 104,
    widen_tiles: int = 4096,
    widen2_k: int = 256,
    widen2_tiles: int = 512,
    widen3_k: int = 1024,
    widen3_tiles: int = 64,
    fallback_tiles: int | None = None,
    near_slots: int = 64,
    pair_slots: tuple | None = None,
    ray_dirs=None,
    bins=None,
    want_voxel: bool = True,
    band_row0=0,
    band_rows: int | None = None,
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
      cand_k: candidate boxes resolved per tile first pass (nearest-K).
      widen_k: extra candidates resolved for tiles the first pass left
        incomplete (the second-chance pass).
      widen_tiles: static capacity of the second-chance tile list.
      widen2_k/widen2_tiles: a third round for tiles still incomplete
        after the second chance (deep silhouette stacks) — much smaller
        tile budget, much deeper candidate budget.
      fallback_tiles: static capacity of the still-incomplete tile list
        returned for the exact per-ray fallback (``apply_fallback`` /
        ``raster_cast_exact``); exceeding it sets ``overflow``. Default
        (None) = every tile: the capacity can then never be exceeded, so
        no silent-drop path exists out of the box. The fallback cast's
        lane setup scales with the capacity, so throughput-sensitive
        callers should probe ``n_fallback`` once per pose and pass a
        tight (sticky-grown) capacity — the Renderer and bench do.
      near_slots: capacity of the dense all-tiles pre-pass for boxes with
        corners behind the camera or covering > 1024 tiles (excess sets
        ``overflow``).
      pair_slots: per-tier box capacities for tile-span products up to
        PAIR_ARITIES (2, 4, 8, .., 1024 tiles); 1x1 spans are unbounded
        (one pair each, emitted unconditionally). Excess in any tier
        sets ``overflow``; size from probed demand via
        ``fit_pair_slots``.
      ray_dirs: optional (H, W, 3) world-space unit directions replacing
        the pixel-center rays — for sub-pixel-jittered path-tracing
        primaries (render_sample). Each ray must stay within its pixel's
        footprint (the box bboxes are then padded by the half-pixel
        jitter range). A leading sample axis (k, H, W, 3) resolves k
        jitters of the SAME pose in one pass: the per-tile candidate
        row gathers (the resolve's serialized cost, PERF.md) are paid
        once and the slab math — vector work — scales with k; outputs
        then carry the leading k axis. Bit-identical per sample to k
        separate casts (same candidates, same fold order).
      bins: optional pose-only raster state from ``raster_bins`` (same
        box arrays, pose, and cand_k/near_slots/pair_slots; jittered
        bins when ray_dirs is used). Skips projection/emission/sorting —
        the progressive-sampler fast path.
      want_voxel: compute the integer hit-voxel and ``node`` outputs
        (picking/editing need the per-pixel winner-attribute row
        gather). Shading-only callers (PT primaries, preview, bench)
        pass False: RGB then rides the resolve carry instead of the
        ~P-row end gather (~12 ms at 1080p), and ``node`` is -1.
      _stage: debug-only early return after pipeline stage 1..8
        (projection, tier selection, pair emission, binning, near
        pre-pass, resolve, widen, untile+winner-gather) — used to bisect
        the axon remote compiler's / runtime's per-stage cost (each
        stage program is dead-code-eliminated to that stage's true
        dependencies).

      band_row0/band_rows: resolve only the horizontal pixel band
        [band_row0, band_row0 + band_rows) — the tile-sharded multi-chip
        path (dist/shard.py). Both must be TILE(8)-aligned (band_row0
        may be traced, e.g. axis_index * rows). The pose-only binning is
        full-frame (replicated compute under shard_map); only the
        resolve side scales with the band. Outputs are band-shaped
        (band_rows, W), and ``ray_dirs`` (if given) is band-shaped too.
        Bands whose tile rows extend past height_px return padding rows
        the caller must discard.

    Returns dict: hit (H,W) bool, t (H,W) f32, normal (H,W,3), node (H,W)
    i32 leaf slot (-1 miss), rgb (H,W,3), voxel (H,W,3) i32, overflow ()
    bool, n_pair/n_near/n_fallback () i32 demand counters, n_widen (3,)
    i32 per-round widen demand (fit_widen_tiles), and
    fb_tiles/fb_valid/fb_need — tiles/rays whose result is not provably
    complete (resolve them with ``apply_fallback`` for exactness;
    without it they may show a farther surface than the true nearest).
    (H is band_rows when banded.)
    """
    W, H = width_px, height_px
    TW = -(-W // TILE)  # tiles per row
    TH = -(-H // TILE)
    NT = TW * TH
    HB = H if band_rows is None else band_rows  # output pixel rows
    P = W * HB
    NT_BAND = NT if band_rows is None else TW * (band_rows // TILE)
    M = box_lo.shape[0]
    widen_plan = (
        (-(-widen_k // CHUNK) * CHUNK, min(widen_tiles, NT)),
        (-(-widen2_k // CHUNK) * CHUNK, min(widen2_tiles, NT)),
        # third round: very few tiles, very deep — deep silhouette
        # stacks; drives n_fallback to 0 for typical poses, letting the
        # per-ray fallback program skip entirely (it costs ~60 ms even
        # at tiny demand: its traversal tail rides the grazing rays)
        (-(-widen3_k // CHUNK) * CHUNK, min(widen3_tiles, NT)),
    )
    if fallback_tiles is None:
        fallback_tiles = NT
    NFB = min(fallback_tiles, NT_BAND)
    NS = max(min(near_slots, M), 1)
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    basis = jnp.asarray(cam_basis, jnp.float32)
    lo_f = box_lo.astype(jnp.float32)
    size_f = box_size.astype(jnp.float32)

    pair_slots = _default_pair_slots(pair_slots, ray_dirs is not None)
    if bins is None:
        bins = _pose_bins(
            box_lo, box_size, cam_pos, basis, tree_height, W, H,
            cand_k, near_slots, pair_slots, ray_dirs is not None, _stage,
            box_attr=box_attr,
        )
        if 1 <= _stage <= 4:
            return bins
    skey, DB = bins["skey"], bins["dmin_bits"]
    spairs, seg_start = bins["spairs"], bins["seg_start"]
    cand_rows, drop_dmin = bins["cand_rows"], bins["drop_dmin"]
    near_idx, near_valid = bins["near_idx"], bins["near_valid"]
    n_pair, n_near, n_tier = bins["n_pair"], bins["n_near"], bins["n_tier"]
    K = cand_rows.shape[1]
    PAIRS = skey.shape[0]
    # dequantized conservative lower bound for a dropped candidate's
    # dmin (matches _pose_bins' packing: one quantum of slack)
    diag = float(3.0 ** 0.5) * float(1 << tree_height)
    quantum = jnp.float32(diag / ((1 << DB) - 2))
    deq = lambda k: jnp.maximum(
        (k & ((1 << DB) - 1)) - 1, 0).astype(jnp.float32) * quantum

    # ---- band selection ------------------------------------------------
    # The bins are full-frame and pose-only; the resolve side can run on
    # a horizontal TILE-aligned band (tile sharding, dist/shard.py):
    # band tiles are one contiguous run [t0, t0 + NTA) of the row-major
    # tile ids, so every per-tile array is a dynamic slice of the
    # full-frame bins. `tix` stays GLOBAL (comparisons against the
    # sorted pair arrays' tile column); carries/shapes are band-local.
    if band_rows is None:
        NTA = NT  # tiles resolved by this call
        TB = TH
        HB = H  # output pixel rows
        t0 = jnp.int32(0)
        band_y0 = jnp.int32(0)
    else:
        assert band_rows % TILE == 0, "band_rows must be TILE-aligned"
        TB = band_rows // TILE
        NTA = TW * TB
        HB = band_rows
        band_y0 = jnp.asarray(band_row0, jnp.int32)
        t0 = (band_y0 // TILE) * TW
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, t0, NTA, 0)
        cand_rows = sl(cand_rows)
        drop_dmin = sl(drop_dmin)
        seg_start = sl(seg_start)
    tix = t0 + jnp.arange(NTA, dtype=jnp.int32)

    # padded per-tile ray directions: (NTA, 64, 3); partial tiles padded
    # with clamped pixels (their results are discarded on reassembly)
    WP, HP = TW * TILE, TB * TILE
    pyp, pxp = jnp.meshgrid(
        band_y0 + jnp.arange(HP, dtype=jnp.int32),
        jnp.arange(WP, dtype=jnp.int32),
        indexing="ij",
    )
    pix_ok = (pxp < W) & (pyp < H)
    KS = 1  # jitter samples resolved together (leading ray_dirs axis)
    if ray_dirs is None:
        d_pad = _ray_dirs_for_pixels(
            jnp.minimum(pxp, W - 1), jnp.minimum(pyp, H - 1), basis, W, H
        )[None]
    else:
        rd = jnp.asarray(ray_dirs, jnp.float32)  # (HB, W, 3) band rows
        if rd.ndim == 3:
            rd = rd[None]
        KS = rd.shape[0]
        d_pad = jnp.pad(
            rd, ((0, 0), (0, HP - rd.shape[1]), (0, WP - W), (0, 0)),
            mode="edge",
        )
    tile_of = lambda a: a.reshape(TB, TILE, TW, TILE, -1).transpose(
        0, 2, 1, 3, 4
    ).reshape(NTA, TILE * TILE, -1)
    # per-tile rays: the KS jitters stack inside the tile's ray axis
    # (r = sample * 64 + intile) — every downstream resolve stage is
    # shape-agnostic over that axis
    d_t = d_pad.reshape(KS, TB, TILE, TW, TILE, 3).transpose(
        1, 3, 0, 2, 4, 5
    ).reshape(NTA, KS * TILE * TILE, 3)
    ok_t1 = tile_of(pix_ok[..., None])[..., 0]  # (NTA, 64)
    ok_t = jnp.tile(ok_t1, (1, KS))  # (NTA, KS*64)

    # Shading-only callers (want_voxel=False: PT primaries, preview,
    # bench) carry the winner's RGB through the resolve instead of
    # gathering it per pixel at the end — the (P,) winner-attribute row
    # gather is ~2M rows at 1080p (~12 ms, PERF.md's per-row floor),
    # while the extra (NTA, 64, 3) carry is a few hundred KB of HBM
    # traffic per scan step. want_voxel=True keeps the original
    # gather-at-end program (node/voxel outputs need the full row).
    carry_rgb = not want_voxel
    # per-box packed rows for the tiny dense near pre-pass (gathers
    # near_slots rows — negligible; the main resolve and widen rounds
    # read candidates POSITIONALLY from the sorted pair records instead)
    if carry_rgb:
        cand_geom = jnp.concatenate(
            [lo_f, size_f, box_attr[:, 1:4]], axis=1)  # (M, 9)
    else:
        cand_geom = jnp.concatenate([lo_f, size_f], axis=1)  # (M, 6)

    def _decode(rows):
        """Sorted-pair records (..., 8) -> (lo, hi, rgb (..., 3) f32,
        pl (...,) i32 = owner << 2). Bit-exact: coordinates/extents are
        whole numbers < 2^16 in 16-bit fields; rgb is an f32 bitcast
        roundtrip (matches _pose_bins' packing)."""
        mask = jnp.int32(0xFFFF)
        srl = lambda a: jax.lax.shift_right_logical(a, 16)
        q0, q1, q2 = rows[..., 2], rows[..., 3], rows[..., 4]
        lo = jnp.stack(
            [q0 & mask, srl(q0), q1 & mask], axis=-1).astype(jnp.float32)
        size = jnp.stack(
            [srl(q1), q2 & mask, srl(q2)], axis=-1).astype(jnp.float32)
        rgb = jax.lax.bitcast_convert_type(rows[..., 5:8], jnp.float32)
        return lo, lo + size, rgb, rows[..., 1] << 2

    def fold_chunk(c, rgb, t, axis, ck_pl, valid3):
        """Shared best-hit fold: merge a (N, CHUNK, 64) slab-test result
        into the carry (t, pl[, rgb]). ``rgb``: (N, CHUNK, 3) candidate
        albedo (only read when carry_rgb)."""
        bt, bpl = c[0], c[1]
        t = jnp.where(valid3, t, jnp.float32(jnp.inf))
        k_best = jnp.argmin(t, axis=1)
        t_k = jnp.min(t, axis=1)
        pl = ck_pl | axis
        onehot = k_best[:, None, :] == jnp.arange(CHUNK)[None, :, None]
        pl_k = jnp.sum(jnp.where(onehot, pl, 0), axis=1)
        better = t_k < bt
        out = [jnp.where(better, t_k, bt), jnp.where(better, pl_k, bpl)]
        if carry_rgb:
            rgb_k = jnp.sum(
                jnp.where(onehot[..., None], rgb[:, :, None, :],
                          0.0), axis=1)  # (N, 64, 3)
            out.append(jnp.where(better[..., None], rgb_k, c[2]))
        return tuple(out)

    # ---- dense pre-pass: near boxes vs every tile (chunked scan) -------
    def near_chunk(carry, xs):
        idx, valid = xs  # (CHUNK,)
        g = cand_geom[idx]  # (CHUNK, Gw)
        glo = g[:, 0:3][None, :, None, :]
        ghi = glo + g[:, 3:6][None, :, None, :]
        t, axis, hit = _mirrored_slab(
            glo, ghi, cam_pos, d_t[:, None, :, :], tree_height, distance,
        )  # (NTA, CHUNK, 64)
        rgb = g[None, :, 6:9] if carry_rgb else None
        return fold_chunk(
            carry, rgb, t, axis, (idx[None, :, None] << 2),
            valid[None, :, None] & hit,
        ), None

    R = KS * TILE * TILE
    carry0 = (
        jnp.full((NTA, R), jnp.inf, jnp.float32),
        jnp.full((NTA, R), -1, jnp.int32),
    )
    if carry_rgb:
        carry0 = carry0 + (
            jnp.zeros((NTA, R, 3), jnp.float32),)
    carry, _ = jax.lax.scan(
        near_chunk, carry0,
        (near_idx.reshape(-1, CHUNK), near_valid.reshape(-1, CHUNK)),
    )
    if _stage == 5:
        return dict(near_t=carry[0], near_pl=carry[1])

    # ---- dense per-tile resolve (chunked scan, CHUNK boxes/step) --------
    def resolve_scan(carry_in, rows_mat, valid_mat, d_loc):
        """Fold rows_mat (N, Kx, 8) positional candidate records into
        the (N, 64) best-hit carry, CHUNK boxes per scan step (keeps
        per-step HBM traffic to one read of d_loc + one carry
        round-trip). valid_mat masks rows whose record belongs to
        another tile (segment over-read) — their geometry is real but
        not this tile's candidate."""

        def step(c, xs):
            rows, vld = xs  # (N, CHUNK, 8), (N, CHUNK)
            glo, ghi, rgb, plc = _decode(rows)
            t, axis, hit = _mirrored_slab(
                glo[:, :, None, :], ghi[:, :, None, :], cam_pos,
                d_loc[:, None, :, :], tree_height, distance,
            )  # (N, CHUNK, 64)
            return fold_chunk(
                c, rgb, t, axis, plc[:, :, None],
                vld[:, :, None] & hit,
            ), None

        N, Kx = valid_mat.shape
        out, _ = jax.lax.scan(
            step, carry_in,
            (rows_mat.reshape(N, Kx // CHUNK, CHUNK, 8)
             .transpose(1, 0, 2, 3),
             valid_mat.reshape(N, Kx // CHUNK, CHUNK).transpose(1, 0, 2)),
        )
        return out

    use_pl_resolve = (
        _PALLAS_RESOLVE and carry_rgb
        and (KS == 1 or KS % 2 == 0)
        and isinstance(distance, (int, float))
    )

    def fold(carry_in, rows_mat, valid_mat, d_loc):
        """Candidate fold: the XLA scan, or the VMEM-resident Pallas
        kernel in <=32-candidate chunks (same sequential order, so the
        chunking is invisible — kernels/pallas/resolve.py)."""
        if not use_pl_resolve:
            return resolve_scan(carry_in, rows_mat, valid_mat, d_loc)
        from voxtracer.kernels.pallas.resolve import (MAX_UNROLL_K,
                                                      resolve_fold)

        c = carry_in
        for j in range(0, valid_mat.shape[1], MAX_UNROLL_K):
            glo, ghi, rgb, plc = _decode(rows_mat[:, j:j + MAX_UNROLL_K])
            plm = jnp.where(valid_mat[:, j:j + MAX_UNROLL_K], plc,
                            jnp.int32(-4))
            c = resolve_fold(
                (c[0], c[1], c[2]), glo, ghi, rgb, plm,
                d_loc, cam_pos, tree_height, float(distance),
                interpret=jax.default_backend() == "cpu",
            )
        return c

    cand_valid = jax.lax.shift_right_logical(
        cand_rows[..., 0], DB) == tix[:, None]
    carry = fold(carry, cand_rows, cand_valid, d_t)
    tb, plb = carry[0], carry[1]
    rgbb = carry[2] if carry_rgb else None
    if _stage == 6:
        return dict(tb=tb, plb=plb)

    # ---- widen rounds: deepen K for tiles not provably complete ---------
    # A tile is provably resolved unless a candidate was dropped nearer
    # than its farthest resolved t. Such tiles re-enter the same dense
    # resolve with the NEXT candidates of their sorted segment — no
    # rebinning, just position gathers at [start+consumed, +k_extra).
    # Two rounds: many tiles / modest depth, then few tiles / deep.
    consumed = jnp.full(NTA, K, jnp.int32)
    drop_cur = drop_dmin
    widen_demand = []  # incomplete tiles ENTERING each round (fit_widen_tiles)
    lix = jnp.arange(NTA, dtype=jnp.int32)  # band-local tile index
    for rnd, (k_extra, NWr) in enumerate(widen_plan):
        NWr = min(NWr, NTA)
        tile_max = jnp.max(jnp.where(ok_t, tb, -jnp.inf), axis=1)
        incomplete = jnp.isfinite(drop_cur) & (drop_cur < tile_max)
        widen_demand.append(jnp.sum(incomplete.astype(jnp.int32)))
        wkey = jnp.where(incomplete, lix, jnp.int32(NTA))
        wl = jax.lax.sort(wkey)[:NWr]
        wvalid = wl < NTA
        wl_c = jnp.where(wvalid, wl, 0)
        wg = t0 + wl_c  # global tile id (pair-array comparisons)
        g2 = _seg_rows(spairs, seg_start[wl_c] + consumed[wl_c],
                       k_extra)  # (NWr, k_extra, 8)
        g2tile = jax.lax.shift_right_logical(g2[..., 0], DB)
        valid2 = wvalid[:, None] & (g2tile == wg[:, None])
        wc = (tb[wl_c], plb[wl_c]) + (
            (rgbb[wl_c],) if carry_rgb else ())
        w_out = fold(wc, g2, valid2, d_t[wl_c])
        wix = jnp.where(wvalid, wl, NTA)
        row_put = lambda dst, src: jnp.concatenate(
            [dst, jnp.zeros_like(dst[:1])]
        ).at[wix].set(src, mode="drop")[:NTA]
        tb = row_put(tb, w_out[0])
        plb = row_put(plb, w_out[1])
        if carry_rgb:
            rgbb = row_put(rgbb, w_out[2])
        widened = jnp.zeros(NTA + 1, bool).at[wix].set(
            True, mode="drop")[:NTA]
        consumed = jnp.where(widened, consumed + k_extra, consumed)
        posr = jnp.minimum(seg_start + consumed, PAIRS - 1)
        dropr = jnp.where(
            jax.lax.shift_right_logical(skey[posr], DB) == tix,
            deq(skey[posr]), jnp.float32(jnp.inf)
        )
        drop_cur = jnp.where(widened, dropr, drop_cur)
    if _stage == 7:
        return dict(tb=tb, plb=plb)

    # residual incompleteness goes to the exact per-ray fallback
    tile_max2 = jnp.max(jnp.where(ok_t, tb, -jnp.inf), axis=1)
    still = jnp.isfinite(drop_cur) & (drop_cur < tile_max2)
    n_fb = jnp.sum(still.astype(jnp.int32))
    fb_key = jnp.where(still, lix, jnp.int32(NTA))
    fb_local = jax.lax.sort(fb_key)[:NFB]
    fb_valid = fb_local < NTA
    fb_local = jnp.where(fb_valid, fb_local, 0)
    fb_tiles = t0 + fb_local  # GLOBAL tile ids (apply_fallback)
    # per-RAY incompleteness: a ray with t below the tile's nearest
    # dropped dmin (a lower bound on any dropped box's entry t) is
    # provably complete — only the rest re-cast (at grazing horizon
    # tiles that is a small fraction of the 64 rays)
    fb_need = fb_valid[:, None] & (tb[fb_local] >= drop_cur[fb_local][:, None])
    # per-tile resume depth for the fallback engines: any dropped box's
    # hit is provably >= drop_cur, so the re-cast may start its walk
    # just below it (apply_fallback_hf) instead of at the camera
    fb_tmin = jnp.where(fb_valid, drop_cur[fb_local], jnp.float32(0.0))

    # ---- reassemble dense frame (band rows when band_rows is set) -------
    PF = KS * P  # flattened pixels across the KS jitter samples

    def untile(a):
        return a.reshape(TB, TW, KS, TILE, TILE).transpose(
            2, 0, 3, 1, 4
        ).reshape(KS, HP, WP)[:, :HB, :W].reshape(PF)

    t_px = untile(tb)
    pl_px = untile(plb)
    hit_px = jnp.isfinite(t_px) & (pl_px >= 0)

    win_owner = jnp.where(hit_px, pl_px >> 2, 0)
    win_axis = jnp.where(hit_px, pl_px & 3, 3)
    if want_voxel:
        # ONE row gather per pixel for every winner attribute (row
        # gathers cost ~13 ns regardless of width, PERF.md — never
        # gather thrice)
        packed_attr = jnp.concatenate([box_attr, lo_f, size_f], axis=1)
        win = packed_attr[win_owner]  # (P, 10)
        node = jnp.where(
            hit_px, jax.lax.bitcast_convert_type(win[:, 0], jnp.int32), -1
        )
        rgb = jnp.where(hit_px[:, None], win[:, 1:4], 0.0)
    else:
        # shading-only: RGB rode the resolve carry — no per-pixel
        # gather; `node` is not computed (want_voxel callers get it)
        win = None
        node = jnp.full((PF,), -1, jnp.int32)
        rgb = jnp.where(
            hit_px[:, None],
            rgbb.reshape(TB, TW, KS, TILE, TILE, 3).transpose(
                2, 0, 3, 1, 4, 5).reshape(KS, HP, WP, 3)[
                :, :HB, :W].reshape(PF, 3),
            0.0,
        )
    if _stage == 8:
        return dict(t_px=t_px, pl_px=pl_px, rgb=rgb)
    d_flat = d_pad[:, :HB, :W].reshape(PF, 3)
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
    if want_voxel:
        wlo = win[:, 4:7]
        whi = wlo + win[:, 7:10]
        bound_w = jnp.float32(1 << tree_height)
        flip = d_flat < 0.0
        dd = jnp.maximum(jnp.abs(d_flat), EPS)
        s0 = jnp.where(flip, bound_w - cam_pos, cam_pos)
        mlo = jnp.where(flip, bound_w - whi, wlo)
        mhi = jnp.where(flip, bound_w - wlo, whi)
        pm = s0 + dd * t_px[:, None]
        vox_m = jnp.clip(jnp.floor(pm), mlo, mhi - 1.0)
        on_axis = (
            win_axis[:, None] == jnp.arange(3, dtype=jnp.int32)[None, :]
        )
        vox_m = jnp.where(on_axis, mlo, vox_m).astype(jnp.int32)
        voxel = jnp.where(
            flip, jnp.int32(1 << tree_height) - vox_m - 1, vox_m
        )
        voxel = jnp.where(hit_px[:, None], voxel, 0)
    else:
        voxel = jnp.zeros((PF, 3), jnp.int32)

    t_out = jnp.where(hit_px, t_px, 0.0)
    overflow = (
        jnp.any(n_tier > jnp.asarray((NS,) + pair_slots))
        | (n_fb > NFB)
    )
    shp = (KS, HB, W) if KS > 1 else (HB, W)
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
        n_tier=n_tier,
        n_widen=jnp.stack(widen_demand),
        n_fallback=n_fb,
        fb_tiles=fb_tiles,
        fb_valid=fb_valid,
        fb_need=fb_need,
        fb_tmin=fb_tmin,
    )


def _fb_expand(res, basis, W: int, H: int, band_y0, ray_dirs):
    """Expand raster_cast's incomplete-tile list into per-ray directions
    plus the scatter that merges re-cast results back into the frame.

    Returns ``(fd, need, put)``: ``fd`` (NFB, KS*64, 3) ray directions in
    raster_cast's per-tile layout r = sample * 64 + intile, ``need`` the
    re-cast mask (provably-complete rays of a flagged tile keep their
    raster result), and ``put(dst, src)`` scattering needed lanes into the
    band-shaped frame arrays. Shared by the SVO and heightfield fallback
    engines."""
    KS = res["hit"].shape[0] if res["hit"].ndim == 3 else 1
    HB = res["hit"].shape[-2]  # band rows (== H when full-frame)
    P = W * HB
    PF = KS * P
    TW = -(-W // TILE)
    fb_tiles = res["fb_tiles"]
    NFB = fb_tiles.shape[0]

    fty = fb_tiles // TW
    ftx = fb_tiles - fty * TW
    lane = jnp.arange(TILE * TILE, dtype=jnp.int32)[None, :]
    fpx = ftx[:, None] * TILE + lane % TILE
    fpy = fty[:, None] * TILE + lane // TILE  # GLOBAL pixel rows
    if ray_dirs is None:
        fd = _ray_dirs_for_pixels(
            jnp.minimum(fpx, W - 1), jnp.minimum(fpy, H - 1), basis, W, H
        )[:, None, :, :]  # (NFB, 1, 64, 3)
    else:
        rd = jnp.asarray(ray_dirs, jnp.float32)
        if rd.ndim == 3:
            rd = rd[None]
        fd = rd[
            :, jnp.clip(fpy - band_y0, 0, HB - 1), jnp.minimum(fpx, W - 1)
        ].transpose(1, 0, 2, 3)  # (NFB, KS, 64, 3)
    fd = fd.reshape(fd.shape[0], -1, 3)  # (NFB, KS*64, 3)
    need = res["fb_need"]
    fpy_l = fpy - band_y0  # band-local rows
    pid_tile = jnp.where(
        (fpx < W) & (fpy < H) & (fpy_l >= 0) & (fpy_l < HB),
        fpy_l * W + fpx, jnp.int32(-1),
    )  # (NFB, 64) pixel id within one sample's frame
    kk = jnp.arange(KS, dtype=jnp.int32)[None, :, None]
    need3 = need.reshape(need.shape[0], KS, TILE * TILE)
    fpid = jnp.where(
        need3 & (pid_tile[:, None, :] >= 0),
        kk * P + pid_tile[:, None, :], PF,
    ).reshape(-1)  # (NFB*KS*64,) into the KS-stacked flat frame

    def put(dst, src):
        trailing = dst.shape[3:] if KS > 1 else dst.shape[2:]
        flat = dst.reshape((PF,) + trailing)
        src = src.reshape((NFB * KS * TILE * TILE,) + src.shape[2:])
        padded = jnp.concatenate(
            [flat, jnp.zeros((1,) + flat.shape[1:], flat.dtype)]
        )
        return padded.at[fpid].set(src, mode="drop")[:PF].reshape(dst.shape)

    return fd, need, put


@partial(jax.jit, static_argnames=("tree_height", "width_px", "height_px"))
def apply_fallback(
    res, table, root, tree_height: int, cam_pos, cam_basis,
    width_px: int, height_px: int, distance=FAR, ray_dirs=None,
    band_row0=0,
):
    """Exact per-ray re-resolve of the tiles raster_cast flagged as not
    provably complete, merged into its result. Its own jit so the
    traversal's while_loop never inflates the raster program's compile.
    For banded results pass the same ``band_row0`` (fb_tiles are global
    tile ids; ``res``/``ray_dirs`` are band-shaped).
    """
    W, H = width_px, height_px
    band_y0 = jnp.asarray(band_row0, jnp.int32)
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    basis = jnp.asarray(cam_basis, jnp.float32)
    fd, need, put = _fb_expand(res, basis, W, H, band_y0, ray_dirs)
    fr = svo_raycast_bucketed(
        table, root, tree_height, cam_pos, fd, distance=distance,
        active=need, min_bucket=2048,
    )
    # the traversal's cap is advisory — enforce it strictly here
    fb_hit = fr["hit"] & (fr["t"] <= distance) & need

    out = dict(res)
    out["hit"] = put(res["hit"], fb_hit)
    out["t"] = put(res["t"], jnp.where(fb_hit, fr["t"], 0.0))
    out["normal"] = put(res["normal"], fr["normal"] * fb_hit[..., None])
    out["node"] = put(res["node"], jnp.where(fb_hit, fr["node"], -1))
    out["rgb"] = put(res["rgb"], leaf_rgb(table, fr["node"])
                     * fb_hit[..., None])
    out["voxel"] = put(res["voxel"], fr["voxel"] * fb_hit[..., None])
    return out


@partial(jax.jit, static_argnames=("tree_height", "width_px", "height_px",
                                   "hf_offsets"))
def apply_fallback_hf(
    res, hf_mips, hf_offsets: tuple, tree_height: int, cam_pos, cam_basis,
    width_px: int, height_px: int, terrain_rgb, terrain_node=-1,
    distance=FAR, ray_dirs=None, band_row0=0,
):
    """``apply_fallback`` riding the heightfield max-mip engine instead
    of the SVO traversal — exact on UNEDITED terrain worlds, where
    hf_raycast matches svo_raycast lane-for-lane (tests/test_heightfield)
    and every hit shades with the single interned terrain leaf color.

    The per-ray SVO fallback dominates the flagship exact frame (~14k
    grazing horizon tiles -> ~900k lanes at the bucketed traversal's
    ~1 us/lane; the hf walk casts the same lanes ~4x cheaper and carries
    ~10x less state, which also removes the RESOURCE_EXHAUSTED the SVO
    program hit on top of the resident flagship buffers). ``terrain_node``
    is the leaf id reported for hf hits (shading-only callers leave the
    -1 default; parity callers pass the world's interned terrain leaf).
    """
    from voxtracer.kernels.heightfield import hf_raycast

    W, H = width_px, height_px
    band_y0 = jnp.asarray(band_row0, jnp.int32)
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    basis = jnp.asarray(cam_basis, jnp.float32)
    fd, need, put = _fb_expand(res, basis, W, H, band_y0, ray_dirs)
    # resume each tile's re-cast just below its nearest dropped dmin:
    # a needy ray's true winner is provably >= drop_cur (raster_cast
    # fb_tmin), so the [camera, drop_cur) prefix of the walk — most of
    # the frame depth for grazing horizon tiles — is skipped. The 2.0
    # slack keeps the start strictly in air so hit axes at the exact
    # bound stay well-defined (_hf_init contract).
    t_min = jnp.maximum(res["fb_tmin"][:, None] - 2.0, 0.0)
    fr = hf_raycast(hf_mips, hf_offsets, tree_height, cam_pos, fd,
                    distance=distance, active=need, min_bucket=2048,
                    t_min=t_min)
    fb_hit = fr["hit"] & (fr["t"] <= distance) & need
    trgb = jnp.broadcast_to(
        jnp.asarray(terrain_rgb, jnp.float32), fr["normal"].shape)
    node = jnp.where(fb_hit, jnp.asarray(terrain_node, jnp.int32), -1)

    out = dict(res)
    out["hit"] = put(res["hit"], fb_hit)
    out["t"] = put(res["t"], jnp.where(fb_hit, fr["t"], 0.0))
    out["normal"] = put(res["normal"], fr["normal"] * fb_hit[..., None])
    out["node"] = put(res["node"], node)
    out["rgb"] = put(res["rgb"], trgb * fb_hit[..., None])
    out["voxel"] = put(res["voxel"], fr["voxel"] * fb_hit[..., None])
    return out


def raster_cast_exact(
    box_lo, box_size, box_attr, cam_pos, cam_basis, tree_height: int,
    width_px: int, height_px: int, table=None, root=None, distance=FAR,
    ray_dirs=None, bins=None, hf_mips=None, hf_offsets=None,
    terrain_rgb=None, terrain_node=-1, **kw,
):
    """raster_cast + exact per-ray fallback on incomplete tiles (two
    device programs; pixel-parity with svo_raycast when the node table is
    supplied). When ``hf_mips``/``hf_offsets``/``terrain_rgb`` are given
    (an UNEDITED terrain world) the fallback rides the ~4x cheaper
    heightfield engine instead of the SVO traversal
    (tests/test_raster.py::test_apply_fallback_hf_parity)."""
    res = raster_cast(
        box_lo, box_size, box_attr, cam_pos, cam_basis, tree_height,
        width_px, height_px, distance=distance, ray_dirs=ray_dirs,
        bins=bins, **kw,
    )
    use_hf = hf_mips is not None and terrain_rgb is not None
    if use_hf or (table is not None and root is not None):
        nfb = res["n_fallback"]
        # outside a trace, skip the fallback program when no tile needs
        # it (the no-op program still costs a traversal dispatch). NOTE:
        # the int() forces a device sync, trading cross-frame dispatch
        # pipelining for the skip — steady-state throughput loops should
        # probe n_fallback once and then call raster_cast directly when
        # their scene never needs the fallback (see bench.py).
        if isinstance(nfb, jax.core.Tracer) or int(nfb) > 0:
            if use_hf:
                res = apply_fallback_hf(
                    res, hf_mips, tuple(hf_offsets), tree_height, cam_pos,
                    cam_basis, width_px, height_px, terrain_rgb,
                    terrain_node=terrain_node, distance=distance,
                    ray_dirs=ray_dirs, band_row0=kw.get("band_row0", 0),
                )
            else:
                res = apply_fallback(
                    res, table, root, tree_height, cam_pos, cam_basis,
                    width_px, height_px, distance=distance,
                    ray_dirs=ray_dirs, band_row0=kw.get("band_row0", 0),
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
