"""Conservative heightfield horizon culling for flagship active sets.

At the reference's production scale (8192^3 terrain, 53M-box soup) the
frustum cull barely helps at horizon poses (~92% of the soup survives —
PERF.md): almost all of it is terrain HIDDEN behind nearer hills. For a
heightfield world occlusion is provable: a box is invisible if every
camera ray toward it passes below terrain somewhere in front of it.

This module builds polar horizon tables around the camera and tests
boxes against them, erring exclusively toward keeping.

Soundness chain (every step weakens occluders or strengthens boxes):

* pooled heights (``min_pool_heights``): the 3x3-neighborhood min of
  POOL-block minima, so one sample UNDERestimates terrain anywhere
  within +-POOL of the sample point — covering both the angular spread
  of a bin's rays and the radial gap between samples;
* slope lower bound per sample: (h - (cam_y + slack)) / (r + slack) for
  occluders at or above camera, dividing by (r - slack) below — valid
  for ANY camera within ``slack`` of the build pose (ActiveSoup's
  translation budget);
* box slope upper bound: (top - (cam_y - slack)) / (r0 - slack) above
  camera, / (r_far + slack) below;
* theta windows: per radial sample, the horizon is min-pooled over
  power-of-two theta windows at half-window offsets; each box picks the
  SMALLEST ladder window its (exact-arcsin, slack-widened) angular
  range fits inside, and a window min over a SUPERSET of the range only
  under-reports the horizon;
* lateral coverage: an occluder sample at radius r' blocks every ray of
  the box's (slack-widened) range only when the range's lateral reach
  at r' plus the pooled +-POOL neighborhood covers the rays' paths —
  algebra (slack s, box half-diagonal hd <= s): satisfied for
  r' >= r0 * (s - POOL) / (2 s). The radial test therefore takes the
  MAXIMUM of the per-sample horizon over [r0/4, r0 - slack] only
  (exact range-max via two overlapping power-of-two windows), never
  accumulating near-camera samples that might not cover the range;
* hidden requires min_theta(range) max_r(range) slope > box slope: per
  ray theta*, the witness radius r' has slope(theta*, r') >= the
  theta-window min > s_box >= that ray's slope — every ray is blocked
  strictly in front of the box.

Boxes nearer than R_MIN or with an empty radial range are kept
unconditionally. The active-soup raster frame stays pixel-exact
(tests/test_occlusion.py). The reference has no counterpart (it ray
traces the full SVO per pixel); this replaces per-ray early termination
at flagship scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

POOL = 32  # default heightmap min-pool factor and radial step (voxels)
NTH = 4096  # angular bins
_J = 9  # radial range-max levels (2^8 = 256 >= any [a, b] length)

# All radial quantities scale with the pool: the never-cull floor sits
# at 32 pools, so pool=32 reproduces the original flagship reach
# (R_MIN 1024) while pool=4 gives a 1024^3 world the same RELATIVE
# culling reach (R_MIN 128). The soundness chain is pool-uniform:
# every step bounds error by +-pool laterally/radially.
WINDOW_LADDER = (16, 32, 64, 128, 256, 512)


def r_min(pool: int = POOL) -> float:
    """Never occlusion-cull boxes nearer than this (32 pools)."""
    return 32.0 * pool


def window_levels(slack: float, pool: int = POOL):
    """Theta-window sizes (bins) the tables carry. Each box picks the
    SMALLEST window whose HALF covers its own angular range
    2*ceil(1.01 (hd + slack) / (r0 - slack) / dtheta) + 1 bins
    (hidden_mask) — per-box selection instead of per-distance-class
    keeps windows tight for small/far boxes, and window width is the
    cull's conservatism knob: a wide window mixes bearings whose rays
    cross an oblique occluder at different radii, so its per-radius
    theta-min rarely aligns. (That is also why the occlusion reuse
    budget, ActiveSoup.occl_slack, is kept small: slack widens every
    range.) Boxes needing more than the widest half are kept."""
    return WINDOW_LADDER


def min_pool_heights(heights: np.ndarray, pool: int = POOL) -> np.ndarray:
    """(n, n) heights -> (n/pool, n/pool) conservative pooled heights:
    the 3x3-neighborhood min of the pool-block min (module doc)."""
    n = heights.shape[0]
    assert heights.shape == (n, n) and n % pool == 0
    k = n // pool
    hp = heights.reshape(k, pool, k, pool).min(axis=(1, 3))
    pad = np.pad(hp, 1, mode="edge")
    out = hp.copy()
    for di in (0, 1, 2):
        for dj in (0, 1, 2):
            out = np.minimum(out, pad[di:di + k, dj:dj + k])
    return out.astype(np.float32)


@partial(jax.jit, static_argnames=("nd", "slack", "pool"))
def build_horizon(hmin2, cam_pos, slack: float, nd: int,
                  pool: int = POOL):
    """Polar horizon tables around cam_pos (module doc).

    hmin2: (k, k) pooled heights (min_pool_heights), world edge k*pool.
    Returns {w: (rows, nd, _J) f32} radial range-max tables over
    theta-window-minned slope samples, one per window_levels(slack)
    entry. ``slack`` is static (it sizes the window set).
    """
    k = hmin2.shape[0]
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    th = (jnp.arange(NTH, dtype=jnp.float32) + 0.5) * (2 * np.pi / NTH)
    r = (jnp.arange(nd, dtype=jnp.float32) + 1.0) * pool  # (nd,)
    qx = cam_pos[0] + jnp.cos(th)[:, None] * r[None, :]
    qz = cam_pos[2] + jnp.sin(th)[:, None] * r[None, :]
    ix = jnp.floor(qx / pool).astype(jnp.int32)
    iz = jnp.floor(qz / pool).astype(jnp.int32)
    inside = (ix >= 0) & (ix < k) & (iz >= 0) & (iz < k)
    flat = hmin2.reshape(-1)
    h = jnp.where(
        inside,
        flat[jnp.clip(ix, 0, k - 1) * k + jnp.clip(iz, 0, k - 1)],
        jnp.float32(-1e9),  # outside the world: nothing occludes
    )
    # slope LOWER bound for any slack-translated camera: highest camera,
    # and the pessimal distance for the numerator's sign
    num = h - (cam_pos[1] + slack)
    slope = num / jnp.where(num >= 0, r[None, :] + slack,
                            jnp.maximum(r[None, :] - slack, 1.0))

    out = {}
    for w in window_levels(slack, pool):
        half = w // 2
        rows = NTH // half
        pooled = slope.reshape(rows, half, nd).min(axis=1)
        # window i covers theta bins [i*half, i*half + w), circular
        b = jnp.minimum(pooled, jnp.roll(pooled, -1, axis=0))
        # radial range-max doubling table: R[.., i, j] = max over
        # samples [i - 2^j + 1, i]
        levels = [b]
        cur = b
        for j in range(1, _J):
            shift = min(1 << (j - 1), nd)
            prev = jnp.concatenate(
                [jnp.full((rows, shift), -jnp.inf, b.dtype),
                 cur[:, :nd - shift]], axis=1,
            )
            cur = jnp.maximum(cur, prev)
            levels.append(cur)
        out[w] = jnp.stack(levels, axis=-1)  # (rows, nd, _J)
    return out


def hidden_mask(tables, box_c, box_half, cam_pos, slack, nd: int,
                pool: int = POOL):
    """True for boxes PROVABLY hidden behind terrain (module doc).

    tables: build_horizon output (same cam_pos/slack/pool). box_c /
    box_half: (M, 3) f32 centers and half-extents. Traced helper —
    call inside the cull jit. Sound for ANY box size: the lateral
    coverage bound only loosens as hd grows (the bearing window's arc
    at the witness radius scales with hd + slack), and oversized
    angular ranges are kept by the window-fit guard; the large-box
    fuzz in tests/test_occlusion.py pins this.
    """
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    slack = float(slack)
    dx = box_c[:, 0] - cam_pos[0]
    dz = box_c[:, 2] - cam_pos[2]
    rxz = jnp.sqrt(dx * dx + dz * dz)
    half_diag = jnp.sqrt(box_half[:, 0] ** 2 + box_half[:, 2] ** 2)
    r0 = rxz - half_diag  # nearest horizontal distance
    r_far = rxz + half_diag
    top = box_c[:, 1] + box_half[:, 1]
    # box slope UPPER bound over the slack ball (lowest camera; pessimal
    # distance by numerator sign)
    num = top - (cam_pos[1] - slack)
    s_box = num / jnp.where(num >= 0, jnp.maximum(r0 - slack, 1.0),
                            r_far + slack)

    theta = jnp.arctan2(dz, dx)
    tbin = jnp.floor(theta * (NTH / (2 * np.pi))).astype(jnp.int32) % NTH

    # radial sample range [a, b]: strictly nearer than the box for any
    # slack camera (b), and laterally covering (a >= ~r0/4, module doc)
    b_idx = jnp.floor((r0 - slack) / pool).astype(jnp.int32) - 1
    a_idx = jnp.maximum(
        jnp.floor(r0 * jnp.maximum(slack - pool, 0.0)
                  / (2.0 * jnp.maximum(slack, 1.0) * pool)).astype(
            jnp.int32),
        0,
    )
    ok = (b_idx >= a_idx) & (b_idx < nd) & (r0 >= r_min(pool))
    a_c = jnp.clip(a_idx, 0, nd - 1)
    b_c = jnp.clip(b_idx, 0, nd - 1)
    # doubling level jq = floor(log2(len)): the two 2^jq windows at the
    # range's ends cover [a, b] exactly (2*2^jq >= len)
    ln = b_c - a_c + 1
    jq = jnp.sum(
        jnp.stack([(ln >= (1 << t)).astype(jnp.int32)
                   for t in range(1, _J)]), axis=0,
    )

    # Bearing half-range of any box point seen from any slack camera:
    # asin((hd + slack)/(r0 - slack)), computed EXACTLY (arcsin; the
    # 1.001 covers float rounding) — per-box window selection reaches
    # ranges where a linearization would under-cover.
    ladder = window_levels(slack, pool)
    assert tuple(ladder) == (16, 32, 64, 128, 256, 512)
    range_x = jnp.minimum(
        (half_diag + slack) / jnp.maximum(r0 - slack, 1.0), 0.999)
    rb = jnp.ceil(1.001 * jnp.arcsin(range_x)
                  * (NTH / (2 * np.pi))).astype(jnp.int32)
    lo_bin = (tbin - rb) % NTH
    range_bins = 2 * rb + 1

    # smallest ladder window whose HALF covers the range (the low theta
    # edge picks the containing window: windows sit at half-window
    # offsets, so [lo_bin, lo_bin + half) always fits one). half(lvl) =
    # 8 << lvl, so the level index turns into plain shifts below; boxes
    # too wide for the widest half are kept.
    halves = [w // 2 for w in ladder]
    lvl = sum((range_bins > h).astype(jnp.int32) for h in halves)
    fits = lvl < len(ladder)
    lvl_c = jnp.minimum(lvl, len(ladder) - 1)
    wi = jax.lax.shift_right_logical(lo_bin, 3 + lvl_c)
    sizes = [(NTH // h) * nd * _J for h in halves]
    base = sum(jnp.where(lvl_c > t, jnp.int32(sizes[t]), 0)
               for t in range(len(ladder)))
    base = base + wi * (nd * _J)
    allflat = jnp.concatenate([tables[w].reshape(-1) for w in ladder])
    hi = allflat[base + b_c * _J + jq]
    lo_end = jnp.minimum(a_c + (1 << jq) - 1, nd - 1)
    lo_v = allflat[base + lo_end * _J + jq]
    hmax = jnp.maximum(hi, lo_v)
    return fits & ok & (hmax > s_box + 1e-4)
