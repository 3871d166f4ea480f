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
  power-of-two theta windows at half-window offsets; a box's angular
  range (box extent + slack shift) fits inside one window of its
  distance class, and a window min over a SUPERSET of the range only
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

POOL = 32  # heightmap min-pool factor and radial step (voxels)
NTH = 4096  # angular bins
R_MIN = 1024.0  # never occlusion-cull boxes nearer than this
_HD_MAX = 11.4  # max box horizontal half-diagonal the levels assume
_J = 9  # radial range-max levels (2^8 = 256 >= any [a, b] length)


def window_levels(slack: float):
    """(distance-class lower bound, theta-window bins) per class: the
    window's HALF must cover the box's angular range
    2*ceil(1.01 (hd + slack) / (r0 - slack) / dtheta) + 1 bins. Windows
    are the cull's conservatism knob: a wide window (large slack) mixes
    bearings whose rays cross an oblique occluder at different radii,
    so its per-radius theta-min rarely aligns — which is why the
    occlusion reuse budget (ActiveSoup.occl_slack) is kept small."""
    import math

    out = []
    for lo in (8192.0, 4096.0, 2048.0, 1024.0):
        need = 2 * math.ceil(
            1.01 * (_HD_MAX + slack) * NTH
            / (2 * math.pi * max(lo - slack, 1.0))) + 1
        w = 16
        while w // 2 < need and w < NTH:
            w *= 2
        out.append((lo, w))
    return tuple(out)


def min_pool_heights(heights: np.ndarray) -> np.ndarray:
    """(n, n) heights -> (n/POOL, n/POOL) conservative pooled heights:
    the 3x3-neighborhood min of the POOL-block min (module doc)."""
    n = heights.shape[0]
    assert heights.shape == (n, n) and n % POOL == 0
    k = n // POOL
    hp = heights.reshape(k, POOL, k, POOL).min(axis=(1, 3))
    pad = np.pad(hp, 1, mode="edge")
    out = hp.copy()
    for di in (0, 1, 2):
        for dj in (0, 1, 2):
            out = np.minimum(out, pad[di:di + k, dj:dj + k])
    return out.astype(np.float32)


@partial(jax.jit, static_argnames=("nd", "slack"))
def build_horizon(hmin2, cam_pos, slack: float, nd: int):
    """Polar horizon tables around cam_pos (module doc).

    hmin2: (k, k) pooled heights (min_pool_heights), world edge k*POOL.
    Returns {w: (rows, nd, _J) f32} radial range-max tables over
    theta-window-minned slope samples, one per window_levels(slack)
    entry. ``slack`` is static (it sizes the window set).
    """
    k = hmin2.shape[0]
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    th = (jnp.arange(NTH, dtype=jnp.float32) + 0.5) * (2 * np.pi / NTH)
    r = (jnp.arange(nd, dtype=jnp.float32) + 1.0) * POOL  # (nd,)
    qx = cam_pos[0] + jnp.cos(th)[:, None] * r[None, :]
    qz = cam_pos[2] + jnp.sin(th)[:, None] * r[None, :]
    ix = jnp.floor(qx / POOL).astype(jnp.int32)
    iz = jnp.floor(qz / POOL).astype(jnp.int32)
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
    for _, w in window_levels(slack):
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


def hidden_mask(tables, box_c, box_half, cam_pos, slack, nd: int):
    """True for boxes PROVABLY hidden behind terrain (module doc).

    tables: build_horizon output (same cam_pos/slack). box_c/box_half:
    (M, 3) f32 centers and half-extents. Traced helper — call inside
    the cull jit. Requires box horizontal half-diagonals <= slack.
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
    b_idx = jnp.floor((r0 - slack) / POOL).astype(jnp.int32) - 1
    a_idx = jnp.maximum(
        jnp.floor(r0 * jnp.maximum(slack - POOL, 0.0)
                  / (2.0 * jnp.maximum(slack, 1.0) * POOL)).astype(
            jnp.int32),
        0,
    )
    ok = (b_idx >= a_idx) & (b_idx < nd) & (r0 >= R_MIN)
    a_c = jnp.clip(a_idx, 0, nd - 1)
    b_c = jnp.clip(b_idx, 0, nd - 1)
    # doubling level jq = floor(log2(len)): the two 2^jq windows at the
    # range's ends cover [a, b] exactly (2*2^jq >= len)
    ln = b_c - a_c + 1
    jq = jnp.sum(
        jnp.stack([(ln >= (1 << t)).astype(jnp.int32)
                   for t in range(1, _J)]), axis=0,
    )

    hidden = jnp.zeros(box_c.shape[0], bool)
    prev_lo = None
    for lo, w in window_levels(slack):
        half = w // 2
        rows = NTH // half
        # the box range's low theta edge picks the containing window.
        # Bearing deviation of any box point from any slack camera is
        # <= asin((hd + slack)/(r0 - slack)); the /(r0 - slack) and the
        # 1.01 factor absorb the asin-vs-linear gap (< 0.1% at the
        # x <= 0.08 these classes allow).
        range_hw = 1.01 * (half_diag + slack) / jnp.maximum(
            r0 - slack, 1.0)
        lo_bin = tbin - jnp.ceil(
            range_hw * (NTH / (2 * np.pi))).astype(jnp.int32)
        range_bins = 2 * jnp.ceil(
            range_hw * (NTH / (2 * np.pi))).astype(jnp.int32) + 1
        wi = ((lo_bin % NTH) // half) % rows
        tab = tables[w]  # (rows, nd, _J)
        flat = tab.reshape(-1)
        base = wi * (nd * _J)
        hi = flat[base + b_c * _J + jq]
        lo_end = jnp.minimum(a_c + (1 << jq) - 1, nd - 1)
        lo_v = flat[base + lo_end * _J + jq]
        hmax = jnp.maximum(hi, lo_v)
        if prev_lo is None:
            in_class = r0 >= lo
        else:
            in_class = (r0 >= lo) & (r0 < prev_lo)
        # the window must actually contain the range (guards callers
        # using a larger slack than WINDOW_LEVELS was sized for)
        in_class = in_class & (range_bins <= half)
        hidden = hidden | (in_class & ok & (hmax > s_box + 1e-4))
        prev_lo = lo
    return hidden
