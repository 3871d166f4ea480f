"""Conservative cone-march prefix for coherent primary bundles.

The full-frame heightfield cast (heightfield.hf_frame_cast) walks every
pixel's ray independently; at flagship scale the walk is gather-bound
and most of each lane's iterations re-prove air the 63 other rays of
its 8x8 pixel tile already proved (measured: a PERFECT per-pixel
t_min-resume floors the 8192^3 1080p frame at 594 of 1031 ms, and sky
lanes — 21% of the frame — cost ~45% of it because nothing ever
retires them early; PERF.md round 3).

This module certifies, per pixel TILE, a parameter T such that EVERY
ray of the tile is strictly in air on [0, T] of its own
parameterization. Per-pixel casts then resume at t_min = T via
hf_raycast's t_min contract (kernels/heightfield.py): ground lanes
skip the long coherent prefix, and fully-sky tiles certify past the
world so their pixels barely walk at all.

Soundness argument (the only property that matters — any
under-certification merely costs speed):

* bundle parameterization: the march runs in UNNORMALIZED camera-dir
  space, where a pixel's direction is affine in its ndc coords
  ``[lx, -ly, 1] @ basis.T`` — so the component-wise box of a tile's
  four (jitter-padded) corner directions bounds every interior pixel
  and sub-pixel jitter direction exactly (camera.pixel_ndc /
  ray_directions; rotation is linear, the ndc patch is a rectangle).
  The cast dirs are the NORMALIZED versions: a point ``o + t*d_n``
  with ``t <= S * |d_un|`` equals ``o + s*d_un`` with ``s <= S``, and
  ``|d_un| = sqrt(1 + lx^2 + ly^2) >= nmin(tile)``, so a certificate
  for unnormalized parameter S yields per-ray t_min = S * nmin.
* bundle geometry: all rays share the camera origin ``o``; a tile's
  unnormalized directions lie in the box ``dc +- sig`` (half-width of
  the corner box, inflated by f32-epsilon slop). At parameter s a
  bundle ray's position differs from the central ray's by at most
  ``s * sig`` per component.
* march invariant: the walk advances the CENTRAL ray through cells of
  a 3x3-DILATED max pyramid (``build_cone_mips``): level-L cell
  (cx, cz) stores the max terrain height over that cell and its 8
  level-L neighbors, so one fetch bounds the height over cell +- 2^L.
* step certificate: over a step [s, s_exit] the central xz stays
  inside the current cell (s_exit is the cell's exit crossing), so
  bundle xz stays within cell +- s_exit * sig_xz; the step requires
  ``s_exit * max(sig_x, sig_z) <= 2^L`` (else it stops), so the
  dilated fetch covers every bundle position over the step. Bundle y
  over the step is at least ``o_y + min over endpoints of
  s' * (dc_y - sig_y)`` (linear in s'). If that clears the dilated
  max, every bundle ray is in air across the whole step.
* level policy is monotone per step (certified -> advance and coarsen
  one level; uncertified -> descend one level; at the spread floor or
  ``min_level`` -> stop), so the loop cannot ping-pong; the iteration
  budget truncates T early, which is conservative.
* output slack: T is returned minus ``SLACK`` (2.0 voxels, the margin
  raster.apply_fallback_hf uses for its resume) so f32 rounding in
  pos/crossing arithmetic — bounded far below a voxel per step —
  can never push T past a true surface crossing, and the resumed
  lane re-enters the walk strictly in air as _hf_init requires.

The reference has no analogue (its per-pixel GPU traversal never
amortizes across rays; raytrace.wgsl:68-180); this is a TPU-first
design: the march is ~32k lanes x 1 gather/iteration, amortizing the
serialized-gather ceiling across 64-pixel bundles.

Exactness: prefixed casts are BIT-IDENTICAL to unprefixed ones
(hf_raycast's t_min resume re-enters the walk's own arithmetic;
tests/test_conemarch.py asserts frame equality, and a brute-force
sampling fuzz attacks the certificate itself).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

SLACK = 2.0  # voxels shaved off the certified prefix (f32 wobble)


def build_cone_mips(heights, min_level: int = 3):
    """3x3-dilated max pyramid over the heightmap, one flat f32 array.

    Level L (cell = 2^L voxels) stores, per cell, the max height over
    the cell and its 8 level-L neighbors. Levels below ``min_level``
    are omitted (the march's spread floor makes sub-8-voxel cells
    useless for 8-pixel bundles, and level 0 at 8192^2 would dominate
    the memory; levels 3..13 at 8192 total ~1.4M f32 = 5.6 MB).
    np.roll wraps at the grid edge; a wrapped max can only RAISE the
    stored bound, which stays sound. Returns (flat f32, offsets tuple
    indexed by L - min_level, min_level).
    """
    h = np.asarray(heights, np.float32)
    n = h.shape[0]
    assert h.shape == (n, n) and (n & (n - 1)) == 0
    top = int(math.log2(n))
    levels = []
    cur = h
    for L in range(top + 1):
        if L >= min_level:
            d = np.maximum(cur, np.roll(cur, 1, 0))
            d = np.maximum(d, np.roll(cur, -1, 0))
            d = np.maximum(d, np.roll(d, 1, 1))
            d = np.maximum(d, np.roll(d, -1, 1))
            levels.append(d.astype(np.float32))
        if cur.shape[0] > 1:
            m = cur.shape[0] // 2
            cur = cur.reshape(m, 2, m, 2).max(axis=(1, 3))
    offsets = []
    off = 0
    for lv in levels:
        offsets.append(off)
        off += lv.size
    flat = np.concatenate([lv.ravel() for lv in levels])
    return jnp.asarray(flat), tuple(offsets), min_level


@partial(jax.jit, static_argnames=("cone_offsets", "min_level", "height",
                                   "max_iters"))
def cone_prefix(cone_flat, cone_offsets: tuple, min_level: int,
                height: int, origin, dc, sig, max_iters: int = 192):
    """Per-bundle certified-air prefix S in unnormalized-dir parameter
    (module doc). origin (3,); dc/sig (B, 3) bundle central directions
    and component half-spreads. Returns (B,) f32 S >= 0 with the SLACK
    already shaved: every bundle ray (direction within dc +- sig) is
    strictly in air on [0, S] of the SHARED parameterization."""
    o = jnp.asarray(origin, jnp.float32)
    dc = jnp.asarray(dc, jnp.float32)
    sig = jnp.asarray(sig, jnp.float32)
    B = dc.shape[0]
    bound = jnp.float32(1 << height)
    top = height
    offs = jnp.asarray(cone_offsets, jnp.int32)
    n_lv = len(cone_offsets)

    sig_xz = jnp.maximum(sig[:, 0], sig[:, 2])
    ylo_rate = dc[:, 1] - sig[:, 1]

    # past any possible in-world parameter: |dc| >= the forward unit
    # (unnormalized dirs have camera-z exactly 1), so s = 4*bound lies
    # outside the [0, bound]^3 grid for every bundle ray; certifying
    # beyond a ray's own exit is vacuous (outside the grid is air).
    s_end = 4.0 * bound

    def inv(x):
        ax = jnp.maximum(jnp.abs(x), jnp.float32(1e-12))
        return jnp.where(x < 0, -1.0 / ax, 1.0 / ax)

    inv_x, inv_z = inv(dc[:, 0]), inv(dc[:, 2])

    def body(c):
        s, L, alive, _ = c
        cell = jnp.exp2(L.astype(jnp.float32))
        px = o[0] + s * dc[:, 0]
        pz = o[2] + s * dc[:, 2]
        cx = jnp.floor(px / cell)
        cz = jnp.floor(pz / cell)
        # next crossing of this cell's planes along the central ray
        sx = ((cx + (dc[:, 0] >= 0)) * cell - o[0]) * inv_x
        sz = ((cz + (dc[:, 2] >= 0)) * cell - o[2]) * inv_z
        s_exit = jnp.minimum(jnp.minimum(sx, sz), s_end)
        s_exit = jnp.maximum(s_exit, s)  # f32 floor: never march back

        # coverage: bundle xz spread at s_exit must fit the dilation;
        # the relative+absolute margin buries f32 rounding in s_exit
        # and the product (PER-STEP soundness: the output SLACK cannot
        # repair a mid-march certificate, only re-entry strictness)
        fits = s_exit * sig_xz * 1.00001 + 0.0625 <= cell

        dim = jnp.int32(1) << (top - L)
        dimf = dim.astype(jnp.float32)
        li = jnp.clip(L - min_level, 0, n_lv - 1)
        ci = jnp.clip(cx.astype(jnp.int32), 0, dim - 1)
        cj = jnp.clip(cz.astype(jnp.int32), 0, dim - 1)
        maxh = cone_flat[offs[li] + ci * dim + cj]
        # a central cell within one cell of the grid uses the CLIPPED
        # fetch: the edge cell's dilated value covers the bundle's
        # possible in-grid positions (reach is +-1 cell under `fits`).
        # Farther outside, the bundle cannot touch the grid at all
        # over this step — air by construction.
        outside = ((cx < -1.0) | (cx > dimf) | (cz < -1.0) | (cz > dimf))
        # bundle min y over [s, s_exit] (linear in s'); the 0.25-voxel
        # margin dominates the f32 product error (~6e-3 at s ~ 3e4)
        # so every STEP's certificate is individually sound
        y_min = o[1] + jnp.minimum(s * ylo_rate, s_exit * ylo_rate)
        clear = y_min > maxh + jnp.float32(0.25)

        ok = fits & (clear | outside)
        # monotone policy: certified -> advance + coarsen (keeps steps
        # big); uncertified but descendable -> refine; else stop. The
        # descend guard (child cell still covers the CURRENT spread)
        # prevents any coarsen/descend ping-pong: L only decreases
        # without an advance, only increases with one.
        can_desc = (~ok) & fits & (L > min_level) \
            & (s * sig_xz <= cell * 0.5)
        s_n = jnp.where(ok, s_exit, s)
        L_n = jnp.where(ok, jnp.minimum(L + 1, top - 1),
                        jnp.where(can_desc, L - 1, L))
        done = (~ok & ~can_desc) | (s_n >= s_end)
        return (jnp.where(alive, s_n, s),
                jnp.where(alive, L_n, L),
                alive & ~done,
                c[3] + 1)

    def cond(c):
        return jnp.any(c[2]) & (c[3] < max_iters)

    state = (jnp.zeros((B,), jnp.float32),
             jnp.full((B,), top - 1, jnp.int32),
             jnp.ones((B,), bool),
             jnp.int32(0))
    # the iteration budget truncates stragglers conservatively (their
    # S stays at the last certified step)
    s_fin = jax.lax.while_loop(cond, body, state)[0]
    return jnp.maximum(s_fin - jnp.float32(SLACK), 0.0)


def frame_tile_bundles(cam_basis, width_px: int, height_px: int,
                       tile: int = 8, jitter_pad: bool = True):
    """Per-pixel-tile direction bundles for a camera frame.

    Returns (dc, sig, nmin): (T, 3) central UNNORMALIZED directions,
    (T, 3) component half-spreads, and (T,) the tile's minimum
    unnormalized-direction norm — ``t_min = S * nmin`` converts
    cone_prefix's S into the normalized-ray parameter the casts use.
    Tiles are the raster/integrator 8x8 pixel tiles in row-major tile
    order. Corners are the tile's outer pixel centers +- half a pixel
    when ``jitter_pad`` (bounding every interior pixel and jitter draw;
    pixel_ndc is affine in px/py)."""
    from voxtracer.core import camera as vcam

    W, H = width_px, height_px
    tx = -(-W // tile)
    ty = -(-H // tile)
    x0 = (np.arange(tx) * tile).astype(np.float32)
    x1 = np.minimum(x0 + tile - 1, W - 1).astype(np.float32)
    y0 = (np.arange(ty) * tile).astype(np.float32)
    y1 = np.minimum(y0 + tile - 1, H - 1).astype(np.float32)
    pad = 0.5 if jitter_pad else 0.0
    # ndc of the four padded corners, (ty, tx, 4)
    w = np.float32(W)
    h = np.float32(H)
    lx0 = (2.0 * (x0 - pad + 0.5) - w) / h
    lx1 = (2.0 * (x1 + pad + 0.5) - w) / h
    ly0 = (2.0 * (y0 - pad + 0.5) - h) / h
    ly1 = (2.0 * (y1 + pad + 0.5) - h) / h
    # corner grids: (ty, tx, 4) with corner order (x0y0, x1y0, x0y1, x1y1)
    cx = np.stack([np.broadcast_to(a[None, :], (ty, tx))
                   for a in (lx0, lx1, lx0, lx1)], -1)
    cy = np.stack([np.broadcast_to(a[:, None], (ty, tx))
                   for a in (ly0, ly0, ly1, ly1)], -1)
    d_cam = np.stack([cx, -cy, np.ones_like(cx)], -1)  # (ty, tx, 4, 3)
    basis = np.asarray(cam_basis, np.float32)
    dirs = jnp.matmul(jnp.asarray(d_cam.reshape(-1, 4, 3)),
                      jnp.asarray(basis.T),
                      precision=jax.lax.Precision.HIGHEST)
    lo = dirs.min(axis=1)
    hi = dirs.max(axis=1)
    dc = 0.5 * (lo + hi)
    # f32 slop: interior dirs are exact affine combinations; the 2e-6
    # relative + tiny absolute inflation buries rotation rounding
    sig = (hi - lo) * 0.5 * 1.000004 + jnp.float32(1e-6)
    # per-tile min |d_un|: |d|^2 = 1 + lx^2 + ly^2, minimized at the
    # ndc point of the tile box closest to the axis
    mx = np.where((lx0 <= 0) & (0 <= lx1), 0.0,
                  np.minimum(np.abs(lx0), np.abs(lx1)))
    my = np.where((ly0 <= 0) & (0 <= ly1), 0.0,
                  np.minimum(np.abs(ly0), np.abs(ly1)))
    nmin = np.sqrt(1.0 + (mx[None, :] ** 2) + (my[:, None] ** 2))
    return dc, sig, jnp.asarray(nmin.reshape(-1).astype(np.float32))
