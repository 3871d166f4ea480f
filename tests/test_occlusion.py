"""Heightfield horizon culling (world/occlusion.py): soundness against
brute-force line-of-sight, and pixel-exact ActiveSoup integration."""

import numpy as np
import pytest

import jax.numpy as jnp

from voxtracer.world import occlusion as occ

SLACK = 16.0  # the occlusion reuse budget (ActiveSoup.occl_slack)


def _ridge_heights(n=2048):
    """Flat bumpy terrain with a tall ridge: lots of provably-hidden
    ground behind it at culling distances (>= R_MIN)."""
    x = np.arange(n)
    z = np.arange(n)
    zz, xx = np.meshgrid(z, x, indexing="xy")  # heights[x, z]
    h = 8 + (3 * np.sin(xx * 0.05) * np.cos(zz * 0.07)).astype(np.int64)
    h = np.clip(h, 1, None)
    h[800:960, :] = 400  # the ridge (x in [800, 960)): must be
    # >= ~4*POOL wide to survive the conservative 3x3 pooled min
    # (thin walls are never PROVABLE occluders)
    return h.astype(np.int64)


def _los_clear(heights, p0, p1, step=4.0):
    """True if the segment p0 -> p1 clears the true heightfield."""
    n = heights.shape[0]
    d = np.asarray(p1, np.float64) - np.asarray(p0, np.float64)
    dist = np.linalg.norm(d[[0, 2]])
    steps = max(int(dist / step), 2)
    for i in range(1, steps):
        t = i / steps
        q = np.asarray(p0) + d * t
        ix, iz = int(q[0]), int(q[2])
        if not (0 <= ix < n and 0 <= iz < n):
            continue
        if q[1] <= heights[ix, iz]:
            return False
    return True


def test_hidden_mask_sound_and_effective():
    """Every box hidden_mask culls must be occluded from EVERY camera in
    the slack ball toward EVERY box corner (brute-force LOS march); and
    plenty of far ground behind the ridge must actually be culled."""
    heights = _ridge_heights()
    hmin2 = jnp.asarray(occ.min_pool_heights(heights))
    nd = int(np.ceil(2048 * 1.5 / occ.POOL)) + 1
    cam = np.array([100.0, 30.0, 1024.0], np.float32)
    tables = occ.build_horizon(hmin2, cam, SLACK, nd)

    rng = np.random.default_rng(3)
    M = 400
    bx = rng.uniform(0, 2048, M)
    bz = rng.uniform(0, 2048, M)
    ih = heights[bx.astype(int), bz.astype(int)]
    by = rng.uniform(0, 1, M) * ih  # inside the terrain column
    c = np.stack([bx, by, bz], 1).astype(np.float32)
    half = np.full((M, 3), 4.0, np.float32)
    hidden = np.asarray(
        occ.hidden_mask(tables, jnp.asarray(c), jnp.asarray(half),
                        cam, SLACK, nd))

    # effectiveness: ground behind the ridge and far away gets culled
    behind = (c[:, 0] > 1200) & (c[:, 1] < 100)
    far = (np.linalg.norm((c - cam)[:, [0, 2]], axis=1)
           >= occ.r_min(occ.POOL) + 64)
    assert hidden[behind & far].mean() > 0.6, (
        f"only {hidden[behind & far].mean():.2f} of far-behind-ridge "
        "boxes culled")

    # soundness: a culled box must be occluded from every slack camera
    offs = [np.zeros(3)]
    for ax in range(3):
        for s in (-1, 1):
            o = np.zeros(3)
            o[ax] = s * SLACK * 0.999
            offs.append(o)
    diag = SLACK * 0.999 / np.sqrt(3.0)
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                offs.append(np.array([sx, sy, sz]) * diag)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
         for sz in (-1, 1)], np.float64)
    for i in np.nonzero(hidden)[0]:
        for o in offs:
            c0 = cam + o
            for cr in corners:
                p1 = c[i] + cr * half[i]
                assert not _los_clear(heights, c0, p1), (
                    f"box {c[i]} culled but visible from {c0}")


def _soundness_fuzz(heights, pool, slack, cam, half_lo, half_hi, seed):
    """Shared brute-force soundness check: every culled box must be
    occluded from every slack camera toward every box corner."""
    hmin2 = jnp.asarray(occ.min_pool_heights(heights, pool))
    n = heights.shape[0]
    nd = int(np.ceil(n * 1.5 / pool)) + 1
    tables = occ.build_horizon(hmin2, cam, slack, nd, pool)

    rng = np.random.default_rng(seed)
    M = 300
    bx = rng.uniform(0, n, M)
    bz = rng.uniform(0, n, M)
    ih = heights[bx.astype(int), bz.astype(int)]
    by = rng.uniform(0, 1, M) * ih
    c = np.stack([bx, by, bz], 1).astype(np.float32)
    half = rng.uniform(half_lo, half_hi, (M, 3)).astype(np.float32)
    hidden = np.asarray(
        occ.hidden_mask(tables, jnp.asarray(c), jnp.asarray(half),
                        cam, slack, nd, pool))

    offs = [np.zeros(3)]
    diag = slack * 0.999 / np.sqrt(3.0)
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                offs.append(np.array([sx, sy, sz]) * diag)
    for ax in range(3):
        for s in (-1, 1):
            o = np.zeros(3)
            o[ax] = s * slack * 0.999
            offs.append(o)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
         for sz in (-1, 1)], np.float64)
    for i in np.nonzero(hidden)[0]:
        for o in offs:
            c0 = cam + o
            for cr in corners:
                p1 = c[i] + cr * half[i]
                assert not _los_clear(heights, c0, p1, step=2.0), (
                    f"box {c[i]} half {half[i]} culled but visible "
                    f"from {c0}")
    return hidden


def test_hidden_mask_sound_large_boxes():
    """Boxes with horizontal half-diagonals well beyond the slack must
    still only be culled soundly (the window-fit guard keeps oversized
    angular ranges; the lateral bound holds for any hd)."""
    heights = _ridge_heights()
    cam = np.array([100.0, 30.0, 1024.0], np.float32)
    hidden = _soundness_fuzz(heights, occ.POOL, SLACK, cam,
                             half_lo=8.0, half_hi=80.0, seed=5)
    assert hidden.any(), "no large box culled — fuzz is vacuous"


def test_hidden_mask_sound_fine_pool():
    """pool=4 (the 1024^3 tuning): same soundness bar, and the cull
    must be effective at sub-flagship distances (R_MIN scales down)."""
    heights = _ridge_heights(1024)
    # shrink the ridge proportionally: x in [400, 480), height 200
    heights[:] = np.clip(
        8 + (3 * np.sin(np.arange(1024)[:, None] * 0.05)
             * np.cos(np.arange(1024)[None, :] * 0.07)).astype(np.int64),
        1, None)
    heights[400:480, :] = 200
    cam = np.array([50.0, 25.0, 512.0], np.float32)
    hidden = _soundness_fuzz(heights, 4, SLACK, cam,
                             half_lo=1.0, half_hi=8.0, seed=7)
    c_far_behind = hidden.any()
    assert c_far_behind, "no box culled at pool=4 — cull ineffective"


def test_active_soup_occlusion_pixel_exact():
    """ActiveSoup with the horizon cull renders the identical frame to
    the full soup — at the build pose AND at a translated pose inside
    the reuse volume (no re-cull)."""
    from voxtracer.core import camera as vcam
    from voxtracer.kernels.raster import (pack_box_attr,
                                          raster_cast_exact)
    from voxtracer.world.active import ActiveSoup
    from voxtracer.world.boxes import extract_boxes_terrain
    from voxtracer.world import native

    heights = _ridge_heights()
    if not native.available():
        pytest.skip("native terrain builder unavailable")
    space = native.NativeSvoSpace()
    space.build_terrain(heights.astype(np.uint32), rgb=(0.5, 0.5, 0.5))
    dev = space.serialize()
    from voxtracer.world.boxes import terrain_leaf_id

    leaf = terrain_leaf_id(dev)
    rgbv = np.ascontiguousarray(dev.table[leaf, :3]).view(np.float32)
    soup = extract_boxes_terrain(heights, leaf, rgbv)
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    full = (jnp.asarray(soup.lo), jnp.asarray(soup.size),
            jnp.asarray(pack_box_attr(soup)))

    W, H = 64, 40
    act = ActiveSoup(soup, W, H, heights=heights)
    assert act._hmin2 is not None

    cam0 = vcam.Camera(pos=(100.0, 60.0, 1024.0), yaw=0.0, pitch=0.0)
    # find the yaw that looks toward +x (at the ridge and beyond)
    best = max(
        (float((np.asarray(vcam.camera_basis(y, 0.0)) @
                np.array([0.0, 0.0, 1.0]))[0]), y)
        for y in np.linspace(-np.pi, np.pi, 64)
    )[1]
    budget = act._trans_budget() * 0.9
    poses = [
        vcam.Camera(pos=(100.0, 60.0, 1024.0), yaw=best, pitch=0.0),
        # translated within the (occlusion-tightened) reuse volume:
        # same active rows, no re-cull (the advisor-trap scenario for
        # the frustum margin)
        vcam.Camera(pos=(100.0 + budget, 60.0, 1024.0), yaw=best,
                    pitch=0.0),
    ]
    rows = act.active(np.asarray(poses[0].pos, np.float32),
                      poses[0].basis())
    n_active = int(np.asarray((rows[1][:, 0] > 0).sum()))
    assert n_active < len(soup) * 0.7, (
        f"occlusion cull ineffective: {n_active}/{len(soup)}")
    for cam in poses:
        op = np.asarray(cam.pos, np.float32)
        rows2 = act.active(op, cam.basis())
        assert rows2 is rows, "re-culled inside the validity volume"
        got = raster_cast_exact(*rows2, op, cam.basis(), dev.height,
                                W, H, table=table, root=root)
        want = raster_cast_exact(*full, op, cam.basis(), dev.height,
                                 W, H, table=table, root=root)
        for k in ("hit", "t", "normal", "rgb", "voxel"):
            assert np.array_equal(np.asarray(got[k]),
                                  np.asarray(want[k])), (cam.pos, k)
