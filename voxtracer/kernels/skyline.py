"""Per-pose horizon certificates: retire sky rays without walking.

The flagship full-frame heightfield cast spends ~45% of its time on SKY
lanes (a perfect per-pixel t_min floors the 8192^3 1080p frame at 594 of
1031 ms, and 21% of its pixels never hit; PERF.md round 3): a
near-horizon sky ray grazes the terrain's coarse mip maxima for
thousands of voxels before anything lets it ascend, and nothing ever
retires it early. The cone march (kernels/conemarch.py) cannot fix
this — its dilated cell maxima block the same corridor (measured: sky
tiles certify to a mean t of 399 of a 14k-voxel diagonal).

This module exploits the one fact the per-step structures cannot see:
for rays from a SHARED origin over a heightfield, "hits nothing" is a
closed-form test. A ray at azimuth ``a`` with elevation slope
``tan = d_y / |d_xz|`` clears the column at horizontal distance ``d``
and height ``h`` iff ``o_y + d * tan > h`` at every point of the
column's footprint, i.e. iff ``tan`` exceeds the column's slope
``(h - o_y) / d`` (endpoint-monotone in ``d``). So

    ``tan > max over columns in azimuth(a) of slope  ==>  the ray
    misses every terrain column`` — the classic skyline/horizon test,

and the max-slope-per-azimuth table is a per-POSE, per-WORLD structure
a few thousand entries wide. The reference has no analogue (its GPU
walks every sky ray to the world box; raytrace.wgsl:68-180); on TPU
the table turns ~15-20% of the frame's lanes into instant misses for
a host-side tile mask (zero device cost, ~45 ms/pose on one core).

MEASURED OUTCOME (TPU, flagship 8192^3 1080p, PERF.md round 3): frame
time is NEUTRAL (1035 -> 1055 ms alone, 907 -> 899 ms composed with
the cone prefix, 15.4% of tiles certified) — the bucketed tiled walk
already retires dead lanes nearly for free, and the frame's cost is
the alive grazing-ground tail the certificate cannot touch. The
subsystem stays available (sound, tested, cheap) for callers whose
walks are lane-count-bound rather than tail-bound.

Conservatism (any under-certification only costs speed):

* column tops: a column of height ``h`` occupies voxels ``vy < h``, so
  its solid top is ``ceil(h)`` (fractional h fills the voxel it ends
  in); ``build_sky_mips`` ceils the base level before the max pyramid.
  ``NUM_MARGIN`` (0.5 voxel) is added on top of every cell max — far
  more than the walk's f32 trajectory wobble (|y| <= 3e4 with ~1e-7
  relative ops => ~0.01 voxel).
* cell bounds: a level-L cell scores ``(h_top - o_y) / d_min`` when
  ``h_top >= o_y`` (nearest footprint point maximizes the slope) and
  ``(h_top - o_y) / d_max`` otherwise (farthest point maximizes a
  negative slope); both dominate every column in the cell for the
  binding endpoint of the pass-over test (module doc above).
* azimuth: a cell's bound is max-scattered into every azimuth bin its
  xz box subtends (corner azimuths — support lines from the origin to
  a convex box touch corners), padded one bin each side; a cell whose
  box contains the origin raises ALL bins. The per-azimuth scatter is
  center-bin + per-width-class wraparound max-dilation (log-doubling
  shifts), so a class's dilation always covers its widest member.
* ladder: level L serves cells with ``d_min in [ratio * 2^L, ...)``
  and a parent nearer than ``ratio * 2^(L+1)`` — every column's
  cell chain has a maximal such level (d_min shrinks as L grows, the
  threshold grows), so coverage is gapless; duplicates are harmless
  maxima. The ratio bounds every used cell's angular width to
  ~sqrt(2)/ratio radians, which bounds the scatter dilation and the
  bound's tightness (the slope inflation from d_min vs the true
  column distance is <= ~1/ratio).

The tile test (``tile_sky``) certifies whole 8x8-pixel bundles on the
HOST in f64 — corner direction boxes exactly bound every interior and
sub-pixel-jittered f32 device ray (affine in ndc; matmuls are pinned
to HIGHEST precision) up to 1 ulp, buried by ``REL_MARGIN`` on the
tan test and the one-bin azimuth pad. hf_frame_cast folds the mask
into the walk's ``t_min`` resume past the world exit, which kills the
lane before its first gather; output is BIT-IDENTICAL to the
uncertified frame because a certified lane's walk result is already
miss/t=0 (tests/test_skyline.py: frame equality + a brute-force
soundness fuzz attacking the certificate on adversarial terrain).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import numpy as np

NUM_MARGIN = 0.5    # voxels added over every cell max (walk f32 wobble)
REL_MARGIN = 1e-5   # relative tan slack (f32 direction/test rounding)
ABS_MARGIN = 1e-6   # absolute tan slack
ENV_SLACK = 2.0     # voxels shaved off per-ray envelope resumes (f32)


def build_sky_mips(heights):
    """Max pyramid over CEILED column heights, coarse enough for the
    skyline ladder. Returns a tuple of (n/2^L, n/2^L) f32 arrays,
    level 0 first (= ceil(heights)). Built once per world (host numpy;
    ~0.4 s at 8192^2) and reused by every per-pose build_skyline."""
    h = np.ceil(np.asarray(heights, np.float32))
    n = h.shape[0]
    assert h.shape == (n, n) and (n & (n - 1)) == 0
    levels = [h]
    while levels[-1].shape[0] > 1:
        m = levels[-1].shape[0] // 2
        levels.append(
            levels[-1].reshape(m, 2, m, 2).max(axis=(1, 3)))
    return tuple(levels)


def _cell_az_spread(ox, oz, x0, x1, z0, z1):
    """Center azimuth and half-spread (radians) of the xz boxes
    [x0,x1]x[z0,z1] seen from (ox, oz); boxes containing the origin
    get half-spread pi (callers treat >= pi as all-bins)."""
    cx = 0.5 * (x0 + x1) - ox
    cz = 0.5 * (z0 + z1) - oz
    ac = np.arctan2(cz, cx)
    hw = np.zeros_like(ac)
    for gx, gz in ((x0, z0), (x0, z1), (x1, z0), (x1, z1)):
        d = np.arctan2(gz - oz, gx - ox) - ac
        d = (d + np.pi) % (2.0 * np.pi) - np.pi
        hw = np.maximum(hw, np.abs(d))
    inside = (x0 <= ox) & (ox <= x1) & (z0 <= oz) & (oz <= z1)
    return ac, np.where(inside, np.pi, hw)


def _dilate_max(b, w):
    """Wraparound sliding max of half-width w over the last axis, by
    log-doubling shifts (max is idempotent: overlap is harmless)."""
    out = b
    s = 1
    done = 0
    while done < w:
        step = min(s, w - done)
        out = np.maximum(out,
                         np.maximum(np.roll(out, step, -1),
                                    np.roll(out, -step, -1)))
        done += step
        s = min(2 * s, w - done) if w - done > 0 else s
    return out


def build_skyline(sky_mips, origin, bins: int = 4096, ratio: int = 16,
                  dil: int = 16):
    """Conservative per-azimuth max terrain slope from ``origin``.

    sky_mips: build_sky_mips output. Returns a dict:
      ``B``     (bins,) f32 — upper bound on (h_top - o_y)/d over every
                terrain column whose azimuth falls in the bin (each
                cell padded one bin); a ray with tan strictly above
                ``B[bin(az)]`` (plus REL/ABS_MARGIN) misses all terrain.
      ``B_dil`` (bins,) f32 — ``B`` max-dilated by ``dil`` bins for
                interval consumers (tile_sky gathers one center bin
                for any interval of half-width <= dil).
      ``B_max`` f32 scalar — global max (fallback for wide intervals).
    Host f64 math throughout; ~10 ms per pose at flagship scale."""
    o = np.asarray(origin, np.float64)
    ox, oy, oz = float(o[0]), float(o[1]), float(o[2])
    n = sky_mips[0].shape[0]
    top = len(sky_mips) - 1
    bin_w = 2.0 * np.pi / bins
    # per-width-class center-bin scatter targets (class c covers cells
    # with ceil(half-spread in bins) + 1 <= 2^c); widest class = all bins
    n_cls = max(1, int(math.ceil(math.log2(max(bins, 2)))))
    cls_b = np.full((n_cls, bins), -np.inf)
    b_all = -np.inf  # bounds that cover every bin

    for L in range(top + 1):
        c = float(1 << L)
        a_lo = ratio * c if L > 0 else 0.0
        a_hi = ratio * c * 2.0
        dim = n >> L
        # window: cells whose PARENT could be nearer than a_hi; the top
        # level has no parent gate, so it must never clip (soundness
        # for origins far outside the grid)
        ext = int(math.ceil(a_hi / c)) + 4
        if L == top:
            ext = max(ext, dim + abs(int(ox / c)) + abs(int(oz / c)))
        ci0 = max(int(ox / c) - ext, 0)
        ci1 = min(int(ox / c) + ext + 1, dim)
        cj0 = max(int(oz / c) - ext, 0)
        cj1 = min(int(oz / c) + ext + 1, dim)
        if ci0 >= ci1 or cj0 >= cj1:
            continue
        ii = np.arange(ci0, ci1, dtype=np.float64)
        jj = np.arange(cj0, cj1, dtype=np.float64)
        x0 = (ii * c)[:, None] + np.zeros((1, jj.size))
        z0 = (jj * c)[None, :] + np.zeros((ii.size, 1))
        x1, z1 = x0 + c, z0 + c

        def box_d(bx0, bx1, bz0, bz1):
            dx = np.maximum(np.maximum(bx0 - ox, ox - bx1), 0.0)
            dz = np.maximum(np.maximum(bz0 - oz, oz - bz1), 0.0)
            dmin = np.hypot(dx, dz)
            fx = np.maximum(np.abs(bx0 - ox), np.abs(bx1 - ox))
            fz = np.maximum(np.abs(bz0 - oz), np.abs(bz1 - oz))
            return dmin, np.hypot(fx, fz)

        d_min, d_max = box_d(x0, x1, z0, z1)
        # ladder membership: this level serves the annulus, the parent
        # is too near for the next (gapless by chain maximality)
        if L < top:
            pc = 2.0 * c
            px0 = np.floor(x0 / pc) * pc
            pz0 = np.floor(z0 / pc) * pc
            pd_min, _ = box_d(px0, px0 + pc, pz0, pz0 + pc)
            sel = (d_min >= a_lo) & (pd_min < a_hi)
        else:
            sel = d_min >= a_lo
        if not np.any(sel):
            continue

        hm = sky_mips[L][ci0:ci1, cj0:cj1].astype(np.float64)
        num = hm + NUM_MARGIN - oy
        # positive numerators divide by the TRUE d_min: a touching or
        # origin-containing cell above the origin must block its bins
        # outright (num/0 -> +inf; inf never certifies — the tan test
        # is strict). Negative numerators divide by d_max (>= diag/2).
        with np.errstate(divide="ignore", invalid="ignore"):
            bound = np.where(
                num >= 0.0,
                num / d_min,
                num / np.maximum(d_max, 1e-12),
            )
        bound = np.where(np.isnan(bound), np.inf, bound)
        ac, hw = _cell_az_spread(ox, oz, x0, x1, z0, z1)
        bound, ac, hw = bound[sel], ac[sel], hw[sel]

        wide = hw >= np.pi * (1.0 - 1e-12)
        if np.any(wide):
            b_all = max(b_all, float(bound[wide].max()))
        rest = ~wide
        if np.any(rest):
            wb = np.ceil(hw[rest] / bin_w).astype(np.int64) + 1
            cls = np.ceil(np.log2(np.maximum(wb, 1))).astype(np.int64)
            cls = np.minimum(cls, n_cls - 1)
            cb = np.floor((ac[rest] % (2.0 * np.pi)) / bin_w)
            cb = cb.astype(np.int64) % bins
            np.maximum.at(cls_b, (cls, cb), bound[rest])

    B = np.full((bins,), b_all)
    for cidx in range(n_cls):
        if np.all(np.isneginf(cls_b[cidx])):
            continue
        B = np.maximum(B, _dilate_max(cls_b[cidx], min(1 << cidx,
                                                       bins // 2)))
    # bins no cell subtends (off-grid azimuths) certify every ray; +inf
    # bins (terrain touching/above the origin) certify none
    B = np.where(np.isneginf(B), np.float64(-3e38), B)
    return dict(
        B=B.astype(np.float32),
        B_dil=_dilate_max(B, dil).astype(np.float32),
        B_max=np.float32(B.max()),
        bins=bins,
        dil=dil,
    )


def _dir_boxes(cam_basis, width_px: int, height_px: int, tile: int):
    """Per-tile component boxes (lo, hi) of the UNNORMALIZED jitter-
    padded directions, host f64 (the f32 device dirs are 1-ulp
    roundings of points inside these boxes; REL_MARGIN covers it)."""
    W, H = width_px, height_px
    tx = -(-W // tile)
    ty = -(-H // tile)
    x0 = (np.arange(tx) * tile).astype(np.float64)
    x1 = np.minimum(x0 + tile - 1, W - 1)
    y0 = (np.arange(ty) * tile).astype(np.float64)
    y1 = np.minimum(y0 + tile - 1, H - 1)
    pad = 0.5 + 1e-4
    lx0 = (2.0 * (x0 - pad + 0.5) - W) / H
    lx1 = (2.0 * (x1 + pad + 0.5) - W) / H
    ly0 = (2.0 * (y0 - pad + 0.5) - H) / H
    ly1 = (2.0 * (y1 + pad + 0.5) - H) / H
    cx = np.stack([np.broadcast_to(a[None, :], (ty, tx))
                   for a in (lx0, lx1, lx0, lx1)], -1)
    cy = np.stack([np.broadcast_to(a[:, None], (ty, tx))
                   for a in (ly0, ly0, ly1, ly1)], -1)
    d_cam = np.stack([cx, -cy, np.ones_like(cx)], -1)
    basis = np.asarray(cam_basis, np.float64)
    dirs = d_cam.reshape(-1, 4, 3) @ basis.T
    return dirs.min(axis=1), dirs.max(axis=1)


def tile_sky(sky, cam_basis, width_px: int, height_px: int,
             tile: int = 8):
    """(T,) bool host mask: tiles whose EVERY ray (any sub-pixel
    jitter) provably misses all terrain. Row-major 8x8 tile order
    matching conemarch.frame_tile_bundles / the frame casts."""
    lo, hi = _dir_boxes(cam_basis, width_px, height_px, tile)
    # bundle tan lower bound: min dy over the box, against the worst
    # |dxz| for the numerator's sign
    dy_lo = lo[:, 1]
    xz_hi = np.hypot(np.maximum(np.abs(lo[:, 0]), np.abs(hi[:, 0])),
                     np.maximum(np.abs(lo[:, 2]), np.abs(hi[:, 2])))
    nx = np.maximum(np.maximum(lo[:, 0], -hi[:, 0]), 0.0)
    nz = np.maximum(np.maximum(lo[:, 2], -hi[:, 2]), 0.0)
    xz_lo = np.hypot(nx, nz)
    with np.errstate(divide="ignore", invalid="ignore"):
        tan_min = np.where(
            dy_lo >= 0.0,
            dy_lo / np.maximum(xz_hi, 1e-300),
            dy_lo / np.maximum(xz_lo, 1e-300),
        )
    tan_adj = tan_min - (REL_MARGIN * np.abs(tan_min) + ABS_MARGIN)

    bins = int(sky["bins"])
    bin_w = 2.0 * np.pi / bins
    ac, hw = _cell_az_spread(
        0.0, 0.0, lo[:, 0], hi[:, 0], lo[:, 2], hi[:, 2])
    wb = np.ceil(hw / bin_w).astype(np.int64) + 2
    cb = (np.floor((ac % (2.0 * np.pi)) / bin_w).astype(np.int64)
          % bins)
    B = np.where((hw < np.pi) & (wb <= int(sky["dil"])),
                 sky["B_dil"][cb].astype(np.float64),
                 np.float64(sky["B_max"]))
    return tan_adj > B


def build_skyline_env(sky_mips, origin, bins: int = 4096,
                      ratio: int = 16, K: int = 64, d0: float = 4.0):
    """Per-azimuth, per-DISTANCE horizon envelope — the per-RAY
    generalization of ``build_skyline`` (round 4).

    The max-slope table certifies only all-terrain misses; the frame's
    measured cost is the near-horizon band — rays (sky AND ground)
    whose slope sits just above the terrain ahead of them, which graze
    coarse mip maxima for thousands of voxels (PERF.md round 3: a
    perfect per-pixel t_min floors the flagship frame at 594 of
    1031 ms; killing fully-sky TILES was neutral because the expensive
    lanes live in mixed horizon tiles). This structure gives every ray
    its own certified resume: ``E[az, k]`` bounds the max slope
    ``(h_top + NUM_MARGIN - o_y) / d`` over every terrain column whose
    azimuth is in bin ``az`` (padded as build_skyline) AND whose
    horizontal distance is <= ``d_k`` of a log ladder
    ``d_k = d0 * g^k`` (g set so d_{K-1} = 4n covers any in-grid
    distance). ``E`` is monotone in k (cummax), so a ray with adjusted
    slope ``tan`` is provably in air for horizontal distance
    ``d_{k*-1}`` where ``k* = #{k : E[az,k] < tan}`` — and ``k* == K``
    is the all-terrain miss (the old skyline test as the last rung).

    Soundness inherits build_skyline's cell bounds (d_min for positive
    numerators covers every point of the cell at ANY distance, azimuth
    scatter pads >= 1 bin each side, NUM_MARGIN over cell tops);
    the rung index uses an exact f64 searchsorted (smallest k with
    d_k >= cell d_min), so every cell reachable within d_k is folded
    into E[.., k]. Device consumers reconstruct d_{k*-1} with f32
    exp2 (relative error ~1e-7, buried by ENV_SLACK).

    Returns dict(E (bins, K) f32, d0, g, bins, K). Host f64; same
    per-pose cost class as build_skyline (one cell sweep).
    """
    o = np.asarray(origin, np.float64)
    ox, oy, oz = float(o[0]), float(o[1]), float(o[2])
    n = sky_mips[0].shape[0]
    top = len(sky_mips) - 1
    bin_w = 2.0 * np.pi / bins
    ladder = d0 * ((4.0 * n / d0) ** (np.arange(K) / (K - 1.0)))
    n_cls = max(1, int(math.ceil(math.log2(max(bins, 2)))))
    cls_b = np.full((n_cls, K, bins), -np.inf)
    all_k = np.full((K,), -np.inf)  # bounds covering every bin

    for L in range(top + 1):
        c = float(1 << L)
        a_lo = ratio * c if L > 0 else 0.0
        a_hi = ratio * c * 2.0
        dim = n >> L
        ext = int(math.ceil(a_hi / c)) + 4
        if L == top:
            ext = max(ext, dim + abs(int(ox / c)) + abs(int(oz / c)))
        ci0 = max(int(ox / c) - ext, 0)
        ci1 = min(int(ox / c) + ext + 1, dim)
        cj0 = max(int(oz / c) - ext, 0)
        cj1 = min(int(oz / c) + ext + 1, dim)
        if ci0 >= ci1 or cj0 >= cj1:
            continue
        ii = np.arange(ci0, ci1, dtype=np.float64)
        jj = np.arange(cj0, cj1, dtype=np.float64)
        x0 = (ii * c)[:, None] + np.zeros((1, jj.size))
        z0 = (jj * c)[None, :] + np.zeros((ii.size, 1))
        x1, z1 = x0 + c, z0 + c

        def box_d(bx0, bx1, bz0, bz1):
            dx = np.maximum(np.maximum(bx0 - ox, ox - bx1), 0.0)
            dz = np.maximum(np.maximum(bz0 - oz, oz - bz1), 0.0)
            dmin = np.hypot(dx, dz)
            fx = np.maximum(np.abs(bx0 - ox), np.abs(bx1 - ox))
            fz = np.maximum(np.abs(bz0 - oz), np.abs(bz1 - oz))
            return dmin, np.hypot(fx, fz)

        d_min, d_max = box_d(x0, x1, z0, z1)
        if L < top:
            pc = 2.0 * c
            px0 = np.floor(x0 / pc) * pc
            pz0 = np.floor(z0 / pc) * pc
            pd_min, _ = box_d(px0, px0 + pc, pz0, pz0 + pc)
            sel = (d_min >= a_lo) & (pd_min < a_hi)
        else:
            sel = d_min >= a_lo
        if not np.any(sel):
            continue

        hm = sky_mips[L][ci0:ci1, cj0:cj1].astype(np.float64)
        num = hm + NUM_MARGIN - oy
        with np.errstate(divide="ignore", invalid="ignore"):
            bound = np.where(
                num >= 0.0,
                num / d_min,
                num / np.maximum(d_max, 1e-12),
            )
        bound = np.where(np.isnan(bound), np.inf, bound)
        ac, hw = _cell_az_spread(ox, oz, x0, x1, z0, z1)
        bound, ac, hw = bound[sel], ac[sel], hw[sel]
        # smallest rung whose ladder distance reaches the cell (exact
        # f64 compare — no log rounding); beyond-ladder cells clip to
        # the last rung, which only over-includes (conservative)
        rung = np.minimum(
            np.searchsorted(ladder, d_min[sel], side="left"), K - 1)

        wide = hw >= np.pi * (1.0 - 1e-12)
        if np.any(wide):
            np.maximum.at(all_k, rung[wide], bound[wide])
        rest = ~wide
        if np.any(rest):
            wb = np.ceil(hw[rest] / bin_w).astype(np.int64) + 1
            cls = np.ceil(np.log2(np.maximum(wb, 1))).astype(np.int64)
            cls = np.minimum(cls, n_cls - 1)
            cb = np.floor((ac[rest] % (2.0 * np.pi)) / bin_w)
            cb = cb.astype(np.int64) % bins
            np.maximum.at(cls_b, (cls, rung[rest], cb), bound[rest])

    E = np.broadcast_to(all_k[:, None], (K, bins)).copy()
    for cidx in range(n_cls):
        if np.all(np.isneginf(cls_b[cidx])):
            continue
        E = np.maximum(E, _dilate_max(cls_b[cidx],
                                      min(1 << cidx, bins // 2)))
    E = np.maximum.accumulate(E, axis=0)  # monotone in distance
    E = np.where(np.isneginf(E), np.float64(-3e38), E)
    g = (4.0 * n / d0) ** (1.0 / (K - 1.0))
    return dict(E=np.ascontiguousarray(E.T.astype(np.float32)),
                d0=float(d0), g=float(g), bins=bins, K=K)


def skyline_env_tmin_traced(E, d, d0, g, far: float = 3e38):
    """Traceable body of ``skyline_env_tmin`` for callers already
    inside jit (the fused PT batch's primary resume,
    kernels/integrator.py): ``d0``/``g`` may be traced f32 scalars; K
    comes from ``E.shape[1]``."""
    import jax.numpy as jnp

    dd = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    bins, K = E.shape
    az = jnp.arctan2(dd[:, 2], dd[:, 0])
    two_pi = jnp.float32(2.0 * np.pi)
    cb = jnp.floor((az % two_pi) / (two_pi / bins)).astype(jnp.int32)
    cb = jnp.clip(cb, 0, bins - 1)
    row = E[cb]  # (B, K) — one row gather per lane, width nearly free
    xz = jnp.hypot(dd[:, 0], dd[:, 2])
    tan = jnp.where(xz > 0.0, dd[:, 1] / jnp.maximum(xz, 1e-30),
                    jnp.where(dd[:, 1] >= 0.0, jnp.float32(3e38),
                              jnp.float32(-3e38)))
    tan_adj = jnp.where(
        jnp.abs(tan) >= 3e38, tan,
        tan - (jnp.float32(REL_MARGIN) * jnp.abs(tan)
               + jnp.float32(ABS_MARGIN)))
    ks = jnp.sum((row < tan_adj[:, None]).astype(jnp.int32), axis=1)
    dk = jnp.exp2(jnp.log2(jnp.asarray(d0, jnp.float32))
                  + (ks - 1).astype(jnp.float32)
                  * jnp.log2(jnp.asarray(g, jnp.float32)))
    t = jnp.maximum(dk - jnp.float32(ENV_SLACK), 0.0) \
        / jnp.maximum(xz, jnp.float32(1e-30))
    return jnp.where(ks == 0, jnp.float32(0.0),
                     jnp.where(ks == K, jnp.float32(far), t))


@partial(jax.jit, static_argnames=("d0", "g", "K", "far"))
def skyline_env_tmin(E, d, d0: float, g: float, K: int,
                     far: float = 3e38):
    """Per-ray certified-air ``t_min`` from a ``build_skyline_env``
    table, in the parameterization of ``d`` itself (module doc on
    ``hf_raycast``'s t_min contract: scale-free — tan and the
    horizontal-distance -> t conversion both use the caller's own
    direction components, so unnormalized camera dirs work
    unchanged).

    E: (bins, K) f32; d: (B, 3) f32 directions FROM THE ENVELOPE'S
    ORIGIN. Returns (B,) f32 t_min: 0 where nothing certifies, ``far``
    where the ray provably misses all terrain (the walk retires the
    lane before its first gather), else ``(d_{k*-1} - ENV_SLACK) /
    |d_xz|`` with the margins of ``rays_sky``. ONE (B, K) row gather
    per lane — the envelope turns the near-horizon grazing tail
    (PERF.md round 3) into in-register compares. Measured on the
    flagship exact 1080p frame (round 4): 969 -> 817 ms held-pose /
    869 ms with the 0.09 s/pose host build in-loop — and it SUBSUMES
    the cone prefix (cone+env measured slower than env alone), so the
    production flagship path passes only ``sky_env``."""
    assert K == E.shape[1]
    return skyline_env_tmin_traced(E, d, float(d0), float(g), far=far)


# ---- device-side envelope build (round 5) -----------------------------
#
# The host build_skyline_env costs ~0.18 s/pose + a 2 MB upload, which
# makes the envelope fly-NEUTRAL (PERF.md round-4 env sweep: held 713 ms
# but fly 866 with the build charged in-loop) — the reference pays
# nothing per pose (its per-frame upload is one uniform buffer,
# fragment.rs:365-385). The same sweep is a few ms of pure vector math
# + one ~40k-element scatter-max on device, over mip levels that are
# ALREADY device-resident (the hf tiled pack's level-0 rows hold the
# exact column heights). This section is the jnp twin: same ladder, same
# cell bounds, same conservatism — in f32 with margins that bury the
# precision drop (analysis at each step below). Soundness is what
# matters (certified air must be air); the device table need not equal
# the host table bit-for-bit, and the resumed frame is bit-identical to
# the un-resumed frame for ANY sound table (hf_raycast's t_min
# contract; tests/test_skyline_env.py fuzzes this build directly).

def _strided_max2(a):
    """2x2 max reduce keeping 2-D shapes throughout: a reshape to
    (m, 2, m, 2) materializes 128-lane padded on TPU (64x memory at
    8192^2 — an instant OOM; PERF.md's (M, small) rule)."""
    import jax.numpy as jnp

    return jnp.maximum(
        jnp.maximum(a[0::2, 0::2], a[0::2, 1::2]),
        jnp.maximum(a[1::2, 0::2], a[1::2, 1::2]),
    )


def sky_levels_from_hf(flat_mips, offsets: tuple, height: int):
    """Device pyramid pack for the on-device envelope build, derived
    from the ALREADY-RESIDENT heightfield tile pack — zero new
    host->device traffic and no full-grid materialization (the (n, n)
    grid assembly from tile rows pads 16-64x on TPU; instead the
    level-``tl`` grid is one row-wise max over the resident rows, and
    the build gathers small LOCAL tile windows for the finer levels).

    A column of fractional height h fills the voxel it ends in, so its
    certified top is ceil(h) (build_sky_mips does the same; identity
    for worldgen's integer heights). ceil is monotone, so
    ceil(max) == max(ceil) and the coarse levels equal the host
    pyramid's.

    Returns an opaque pack dict consumed by build_skyline_env_device.
    """
    coarse = _coarse_levels(flat_mips, tuple(offsets), height)
    return dict(flat=flat_mips, offsets=tuple(offsets), height=height,
                coarse=coarse)


@partial(jax.jit, static_argnames=("offsets", "height"))
def _coarse_levels(flat_mips, offsets: tuple, height: int):
    """One jitted program for the coarse pyramid (eager per-level ops
    cost ~4 s/level in dispatches over the axon tunnel at flagship)."""
    import jax.numpy as jnp

    tl = offsets[0]
    n = 1 << height
    dp = max(n >> tl, 1)
    # level-tl grid: one (dp*dp,) row-max over the resident rows
    r0max = jnp.max(flat_mips[offsets[1]:offsets[1] + dp * dp], axis=1)
    ltl = jnp.ceil(r0max).reshape(dp, dp)
    coarse = [ltl]  # coarse[i] = level tl + i
    while coarse[-1].shape[0] > 1:
        coarse.append(_strided_max2(coarse[-1]))
    return tuple(coarse)


def _dilate_max_jnp(b, w: int):
    """jnp twin of _dilate_max (wraparound sliding max over the last
    axis by log-doubling rolls; identical shift schedule)."""
    import jax.numpy as jnp

    out = b
    s = 1
    done = 0
    while done < w:
        step = min(s, w - done)
        out = jnp.maximum(out,
                          jnp.maximum(jnp.roll(out, step, -1),
                                      jnp.roll(out, -step, -1)))
        done += step
        s = min(2 * s, w - done) if w - done > 0 else s
    return out


def patch_sky_levels(pack, new_flat, cols):
    """Incrementally update a sky pack after heightfield-exact edits:
    ``new_flat`` is the POST-edit hf tile pack (patch_height_mips
    output) and ``cols`` the edited (x, z) columns. Recomputes only the
    affected coarse-pyramid cells (one tiny jitted program — the full
    pack rebuild reads the whole 256 MB level-0 and costs ~2 s at
    flagship, which dominated the exact-edit preview latency; round 5).
    Returns the new pack. Falls back to a full rebuild for large
    batches."""
    cols = list(cols)
    NC = 16
    if len(cols) > NC:
        return sky_levels_from_hf(new_flat, pack["offsets"],
                                  pack["height"])
    import jax.numpy as jnp

    arr = np.zeros((NC, 2), np.int32)
    for i, (x, z) in enumerate(cols):
        arr[i] = (int(x), int(z))
    valid = np.zeros((NC,), bool)
    valid[:len(cols)] = True
    coarse = _patch_coarse(new_flat, pack["coarse"], jnp.asarray(arr),
                           jnp.asarray(valid), pack["offsets"],
                           pack["height"])
    return dict(pack, flat=new_flat, coarse=coarse)


@partial(jax.jit, static_argnames=("offsets", "height"))
def _patch_coarse(flat, coarse, cols, valid, offsets: tuple,
                  height: int):
    """Jitted body of patch_sky_levels. Duplicate cells among the
    columns scatter the SAME recomputed value (each level's cell value
    is a pure function of the already-updated level below), so
    duplicate-index .set order is immaterial."""
    import jax.numpy as jnp

    tl = offsets[0]
    n = 1 << height
    dp = max(n >> tl, 1)
    cx = jnp.clip(cols[:, 0] >> tl, 0, dp - 1)
    cz = jnp.clip(cols[:, 1] >> tl, 0, dp - 1)
    ridx = offsets[1] + cx * dp + cz
    v = jnp.ceil(jnp.max(flat[ridx], axis=1))  # level-tl cell maxima
    c0 = coarse[0]
    old0 = c0[cx, cz]
    c0 = c0.at[cx, cz].set(jnp.where(valid, v, old0))
    out = [c0]
    prev = c0
    for i in range(1, len(coarse)):
        cx, cz = cx >> 1, cz >> 1
        m = jnp.maximum(
            jnp.maximum(prev[2 * cx, 2 * cz], prev[2 * cx, 2 * cz + 1]),
            jnp.maximum(prev[2 * cx + 1, 2 * cz],
                        prev[2 * cx + 1, 2 * cz + 1]),
        )
        ci = coarse[i]
        ci = ci.at[cx, cz].set(jnp.where(valid, m, ci[cx, cz]))
        out.append(ci)
        prev = ci
    return tuple(out)


@partial(jax.jit, static_argnames=("offsets", "bins", "ratio", "K",
                                   "d0", "height", "cls_step"))
def _env_device(flat, coarse, origin, offsets: tuple, bins: int,
                ratio: int, K: int, d0: float, height: int,
                cls_step: float = 1.0):
    """Jitted body of build_skyline_env_device.

    Fine levels (0..tl-1) come from a LOCAL tile window gathered
    around the origin (every ladder-selected fine cell lies within
    ~a_hi of the origin, so a static (WG, WG)-tile window covers them
    without materializing the (n, n) grid); coarse levels (tl..top)
    read the precomputed pyramid directly. All f32; each rounding
    direction is covered by a margin: NUM_MARGIN (0.5 voxel) buries
    numerator rounding, the consumer's REL_MARGIN (1e-5) buries the
    ~1e-7 hypot/d_min rounding, the one-bin azimuth pad buries arctan2
    rounding, and the rung index rounds DOWN (eps guard) so a boundary
    cell lands one rung early (conservative) instead of one late
    (unsound)."""
    import jax.numpy as jnp

    o = jnp.asarray(origin, jnp.float32)
    ox, oy, oz = o[0], o[1], o[2]
    tl = offsets[0]
    TS = 1 << tl
    n = 1 << height
    dp = max(n >> tl, 1)
    top = height
    bin_w = jnp.float32(2.0 * np.pi / bins)
    log2_g = jnp.float32(math.log2((4.0 * n / d0) ** (1.0 / (K - 1.0))))
    log2_d0 = jnp.float32(math.log2(d0))
    # azimuth width classes: class c dilates by ceil(2^(c * cls_step))
    # bins, covering cells with wb <= that. cls_step < 1 (e.g. 0.5 =
    # sqrt2 steps) narrows the over-dilation from <= 2x to
    # <= 2^cls_step x — each cell's bound then pollutes fewer
    # neighboring azimuth bins, tightening every ray's certified
    # prefix (measured on the flagship frame, PERF.md round 5) at the
    # cost of proportionally more scatter planes.
    n_cls = max(1, int(math.ceil(math.log2(max(bins, 2)) / cls_step)))
    cls_w = [min(int(math.ceil(2.0 ** (c * cls_step))), bins // 2)
             for c in range(n_cls)]
    inv_step = jnp.float32(1.0 / cls_step)
    cls_b = jnp.full((n_cls * K * bins,), -jnp.inf, jnp.float32)
    all_k = jnp.full((K,), -jnp.inf, jnp.float32)

    ext = 2 * ratio + 4  # == ceil(a_hi / c) + 4 at every level
    WSZ = 2 * ext + 1

    def fold(cls_b, all_k, hm, ii, jj, c: float, is_top: bool):
        """Fold one level's cells into the accumulators. hm: (P,) cell
        maxima; ii/jj: (P,) integer cell coords (units of c)."""
        x0 = ii.astype(jnp.float32) * c
        z0 = jj.astype(jnp.float32) * c
        x1, z1 = x0 + c, z0 + c

        def box_d(bx0, bx1, bz0, bz1):
            dx = jnp.maximum(jnp.maximum(bx0 - ox, ox - bx1), 0.0)
            dz = jnp.maximum(jnp.maximum(bz0 - oz, oz - bz1), 0.0)
            dmin = jnp.hypot(dx, dz)
            fx = jnp.maximum(jnp.abs(bx0 - ox), jnp.abs(bx1 - ox))
            fz = jnp.maximum(jnp.abs(bz0 - oz), jnp.abs(bz1 - oz))
            return dmin, jnp.hypot(fx, fz)

        d_min, d_max = box_d(x0, x1, z0, z1)
        a_lo = ratio * c if c > 1.0 else 0.0
        a_hi = ratio * c * 2.0
        if is_top:
            sel = d_min >= a_lo
        else:
            pc = 2.0 * c
            px0 = jnp.floor(x0 / pc) * pc
            pz0 = jnp.floor(z0 / pc) * pc
            pd_min, _ = box_d(px0, px0 + pc, pz0, pz0 + pc)
            sel = (d_min >= a_lo) & (pd_min < a_hi)

        num = hm + jnp.float32(NUM_MARGIN) - oy
        bound = jnp.where(num >= 0.0,
                          num / d_min,  # inf at d_min == 0: certifies none
                          num / jnp.maximum(d_max, jnp.float32(1e-12)))
        bound = jnp.where(jnp.isnan(bound), jnp.inf, bound)
        bound = jnp.where(sel, bound, -jnp.inf)

        # azimuth center + half-spread from the 4 corners (host twin)
        cx = 0.5 * (x0 + x1) - ox
        cz = 0.5 * (z0 + z1) - oz
        ac = jnp.arctan2(cz, cx)
        hw = jnp.zeros_like(ac)
        for gx, gz in ((x0, z0), (x0, z1), (x1, z0), (x1, z1)):
            dlt = jnp.arctan2(gz - oz, gx - ox) - ac
            dlt = (dlt + np.pi) % (2.0 * np.pi) - np.pi
            hw = jnp.maximum(hw, jnp.abs(dlt))
        inside = (x0 <= ox) & (ox <= x1) & (z0 <= oz) & (oz <= z1)
        hw = jnp.where(inside, jnp.float32(np.pi), hw)

        rk = jnp.ceil((jnp.log2(jnp.maximum(d_min, jnp.float32(1e-6)))
                       - log2_d0) / log2_g - jnp.float32(1e-3))
        rung = jnp.clip(rk, 0, K - 1).astype(jnp.int32)

        wide = hw >= jnp.float32(np.pi * (1.0 - 1e-6))
        wb = jnp.ceil(hw / bin_w) + 1.0
        # +1e-4 guards f32 log rounding DOWN a class (whose narrower
        # dilation would under-cover the cell — unsound); one class up
        # merely over-dilates. Top class dilates bins//2, which covers
        # the whole circle, so the clip is always sound.
        cls = jnp.ceil(jnp.log2(jnp.maximum(wb, 1.0)) * inv_step
                       + jnp.float32(1e-4)).astype(jnp.int32)
        cls = jnp.clip(cls, 0, n_cls - 1)
        cb = jnp.floor((ac % jnp.float32(2.0 * np.pi)) / bin_w)
        cb = jnp.clip(cb.astype(jnp.int32), 0, bins - 1)

        all_k = all_k.at[rung].max(jnp.where(wide, bound, -jnp.inf),
                                   mode="drop")
        flat_idx = (cls * K + rung) * bins + cb
        cls_b = cls_b.at[flat_idx].max(
            jnp.where(wide, -jnp.inf, bound), mode="drop")
        return cls_b, all_k

    # ---- fine levels 0..tl-1: local tile window around the origin ----
    # coverage: a ladder-selected cell at fine level Lf has
    # pd_min < a_hi(Lf) = 2 * ratio * 2^Lf, so it lies within
    # 2 * ratio * 2^Lf + 2^(Lf+1) <= (ratio + 1) * 2^tl voxels of the
    # origin; the window spans >= (ratio + 2) * 2^tl voxels each side
    # of the origin's tile (or the whole grid when it's small), so it
    # covers every selected fine cell — clamped at grid edges, where
    # the shifted window still covers the in-grid side (same argument
    # as the coarse dynamic_slice windows).
    span_half = (ratio + 2) * (1 << tl)
    WG = min(2 * (-(-span_half // TS)) + 2, dp)
    if dp > WG:
        tx0 = jnp.clip(jnp.floor(ox / TS).astype(jnp.int32) - WG // 2,
                       0, dp - WG)
        tz0 = jnp.clip(jnp.floor(oz / TS).astype(jnp.int32) - WG // 2,
                       0, dp - WG)
    else:
        tx0 = jnp.int32(0)
        tz0 = jnp.int32(0)
    ridx = (offsets[1] + (tx0 + jnp.arange(WG, dtype=jnp.int32))[:, None]
            * dp + (tz0 + jnp.arange(WG, dtype=jnp.int32))[None, :])
    rows = flat[ridx.reshape(-1)]  # (WG*WG, TS*TS) row gather
    grid = jnp.ceil(rows).reshape(WG, WG, TS, TS).transpose(
        0, 2, 1, 3).reshape(WG * TS, WG * TS)
    lv = grid
    for Lf in range(0, min(tl, top)):
        dimL = (WG * TS) >> Lf
        ci = ((tx0 * TS) >> Lf) + jnp.arange(dimL, dtype=jnp.int32)
        cj = ((tz0 * TS) >> Lf) + jnp.arange(dimL, dtype=jnp.int32)
        iig, jjg = jnp.meshgrid(ci, cj, indexing="ij")
        cls_b, all_k = fold(cls_b, all_k, lv.reshape(-1),
                            iig.reshape(-1), jjg.reshape(-1),
                            float(1 << Lf), is_top=False)
        if Lf + 1 < tl:
            lv = _strided_max2(lv)

    # ---- coarse levels tl..top: the precomputed pyramid --------------
    for idx in range(len(coarse)):
        L = tl + idx
        c = float(1 << L)
        dim = max(dp >> idx, 1)
        hmL = coarse[idx]
        if dim > WSZ:
            ci0 = jnp.clip(jnp.floor(ox / c).astype(jnp.int32) - ext,
                           0, dim - WSZ)
            cj0 = jnp.clip(jnp.floor(oz / c).astype(jnp.int32) - ext,
                           0, dim - WSZ)
            hm = jax.lax.dynamic_slice(hmL, (ci0, cj0), (WSZ, WSZ))
            ci = ci0 + jnp.arange(WSZ, dtype=jnp.int32)
            cj = cj0 + jnp.arange(WSZ, dtype=jnp.int32)
        else:
            hm = hmL
            ci = jnp.arange(dim, dtype=jnp.int32)
            cj = jnp.arange(dim, dtype=jnp.int32)
        iig, jjg = jnp.meshgrid(ci, cj, indexing="ij")
        cls_b, all_k = fold(cls_b, all_k, hm.reshape(-1),
                            iig.reshape(-1), jjg.reshape(-1), c,
                            is_top=(L == top))

    # fold: per-class wraparound dilation, then all-bins floor, cummax
    E = jnp.broadcast_to(all_k[:, None], (K, bins))
    cb3 = cls_b.reshape(n_cls, K, bins)
    for cidx in range(n_cls):
        E = jnp.maximum(E, _dilate_max_jnp(cb3[cidx], cls_w[cidx]))
    E = jax.lax.associative_scan(jnp.maximum, E, axis=0)
    E = jnp.where(jnp.isneginf(E), jnp.float32(-3e38), E)
    return E.T  # (bins, K), matching the host layout


def build_skyline_env_device(pack, origin, bins: int = 4096,
                             ratio: int = 16, K: int = 64,
                             d0: float = 4.0, cls_step: float = 1.0):
    """``build_skyline_env`` computed ON DEVICE from the resident
    pyramid pack (``sky_levels_from_hf``), returning the same
    dict(E, d0, g, bins, K) with ``E`` a device array. ~ms per pose vs
    the host build's ~0.18 s + upload — the lever that makes the
    envelope pay on FLY-THROUGH poses, not just held ones (VERDICT r4
    task #2b). Sound by the same cell-bound argument as the host build
    (see _env_device's margin analysis); soundness is fuzz-tested
    directly in tests/test_skyline_env.py."""
    import jax.numpy as jnp

    height = pack["height"]
    n = 1 << height
    assert pack["offsets"][0] <= height, "world smaller than one tile"
    E = _env_device(pack["flat"], pack["coarse"],
                    jnp.asarray(np.asarray(origin, np.float32)),
                    pack["offsets"], bins, ratio, K, float(d0), height,
                    cls_step=float(cls_step))
    g = (4.0 * n / d0) ** (1.0 / (K - 1.0))
    return dict(E=E, d0=float(d0), g=float(g), bins=bins, K=K)


def rays_sky(sky, dirs):
    """(B,) bool host mask for individual NORMALIZED (or any-scale)
    directions from the skyline's origin: ray provably misses all
    terrain. Exact-azimuth variant of tile_sky (tests; per-ray
    consumers pay one B gather per lane on device instead)."""
    d = np.asarray(dirs, np.float64).reshape(-1, 3)
    bins = int(sky["bins"])
    az = np.arctan2(d[:, 2], d[:, 0]) % (2.0 * np.pi)
    cb = np.floor(az / (2.0 * np.pi / bins)).astype(np.int64) % bins
    xz = np.hypot(d[:, 0], d[:, 2])
    with np.errstate(divide="ignore", invalid="ignore"):
        tan = np.where(xz > 0.0, d[:, 1] / np.maximum(xz, 1e-300),
                       np.where(d[:, 1] >= 0, np.inf, -np.inf))
        tan_adj = np.where(
            np.isinf(tan), tan,
            tan - (REL_MARGIN * np.abs(tan) + ABS_MARGIN))
    return tan_adj > sky["B"][cb].astype(np.float64)
