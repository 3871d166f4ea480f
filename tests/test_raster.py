"""Rasterizer vs per-ray traversal: full-frame parity.

Same bar as the beam engine (tests/test_beam.py): hit/normal/voxel/rgb
exact, t within float tolerance (the fragment path recomputes ray
directions with the same formulas but different XLA fusion, so t can
differ by ~1 ulp; winners only flip at degenerate edge-grazes, which get
a budget on degenerate cameras).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core import camera as vcam
from voxtracer.kernels.raster import (pack_box_attr, raster_cast,
                                      raster_cast_exact)
from voxtracer.kernels.traverse import leaf_rgb, svo_raycast
from voxtracer.world.boxes import extract_boxes
from voxtracer.world.svo import from_dense


def _soup_args(space):
    dev = space.serialize()
    soup = extract_boxes(dev)
    return dev, (
        jnp.asarray(soup.lo),
        jnp.asarray(soup.size),
        jnp.asarray(pack_box_attr(soup)),
    )


def _check(space, campos, yaw, pitch, W=64, H=40, graze_budget=0, **kw):
    dev, args = _soup_args(space)
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    cam = vcam.Camera(pos=campos, yaw=yaw, pitch=pitch)
    _, d = vcam.generate_rays(cam, W, H)
    op = np.asarray(campos, np.float32)
    kw.setdefault("near_slots", 64)
    rb = raster_cast_exact(*args, op, cam.basis(), dev.height, W, H,
                           table=table, root=root, **kw)
    assert not bool(rb["overflow"]), (
        f"overflow: n_pair={int(rb['n_pair'])} n_near={int(rb['n_near'])} "
        f"n_fallback={int(rb['n_fallback'])}"
    )
    rr = svo_raycast(table, root, dev.height, jnp.asarray(op), d)
    hb, hr = np.asarray(rb["hit"]), np.asarray(rr["hit"])
    both = hb & hr
    same_t = np.isclose(np.asarray(rb["t"]), np.asarray(rr["t"]),
                        rtol=1e-4, atol=1e-3)
    same_n = (np.asarray(rb["normal"]) == np.asarray(rr["normal"])).all(-1)
    same_v = (np.asarray(rb["voxel"]) == np.asarray(rr["voxel"])).all(-1)
    agree = (hb == hr) & (~both | (same_t & same_n & same_v))
    n_bad = int((~agree).sum())
    assert n_bad <= graze_budget, f"{n_bad} differing pixels"
    good = both & agree
    assert np.allclose(np.asarray(rb["rgb"])[good],
                       np.asarray(leaf_rgb(table, rr["node"]))[good])


@pytest.fixture(scope="module")
def clutter():
    rng = np.random.default_rng(5)
    n = 32
    solid = rng.random((n, n, n)) < 0.2
    rgb = rng.random((n, n, n, 3)).astype(np.float32)
    rgb[~solid] = 0
    return from_dense(solid, rgb)


@pytest.fixture(scope="module")
def terrain():
    from voxtracer.world import worldgen

    return worldgen.generate(log2_size=6, verbose=False, backend="python")


def test_raster_clutter_generic(clutter):
    _check(clutter, (16.21, 17.13, -9.37), 0.11, 0.23)


def test_raster_clutter_inside(clutter):
    # camera inside the cloud: near/dense path handles straddling boxes
    _check(clutter, (15.8, 16.2, 16.4), 2.3, -0.4)


def test_raster_clutter_degenerate(clutter):
    # integer camera, axis-aligned view: rays pass through exact lattice
    # corners, where the slab's strict t_in < t_out misses what the
    # traversal's crossing order grazes — bounded divergence
    _check(clutter, (16.0, 16.0, -10.0), 0.0, 0.0, graze_budget=80)


def test_raster_terrain_reference_pose(terrain):
    s = 64 / 8192
    _check(
        terrain,
        (800.2352 * s, 1511.8693 * s, 654.40125 * s),
        -5.3800497, 0.21999985, W=96, H=56,
    )


def test_raster_terrain_looking_down(terrain):
    _check(terrain, (32.3, 70.7, 31.9), 0.37, 1.2, W=64, H=40)


def test_raster_behind_and_outside_culls(terrain):
    # camera above looking straight up: sky everywhere, nothing hit
    dev, args = _soup_args(terrain)
    cam = vcam.Camera(pos=(32.0, 80.0, 32.0), yaw=0.0, pitch=-1.5707)
    rb = raster_cast(*args, np.asarray(cam.pos, np.float32), cam.basis(),
                     dev.height, 32, 24)
    assert not bool(np.asarray(rb["hit"]).any())
    assert not bool(rb["overflow"])


def test_raster_distance_cap(clutter):
    """The rasterizer's distance cap is strict; the traversal's is
    advisory (it can leak hits past the cap exactly like the reference
    raycast — see traverse.svo_raycast). Within the cap both must agree;
    every traversal hit the rasterizer lacks must be a leaked one."""
    dev, args = _soup_args(clutter)
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    cam = vcam.Camera(pos=(16.21, 17.13, -9.37), yaw=0.11, pitch=0.23)
    _, d = vcam.generate_rays(cam, 64, 40)
    op = np.asarray(cam.pos, np.float32)
    cap = 12.0
    rb = raster_cast_exact(*args, op, cam.basis(), dev.height, 64, 40,
                           distance=cap, table=table, root=root)
    rr = svo_raycast(table, root, dev.height, jnp.asarray(op), d,
                     distance=cap)
    hb, hr = np.asarray(rb["hit"]), np.asarray(rr["hit"])
    rt = np.asarray(rr["t"])
    in_cap = hr & (rt <= cap)
    assert (hb == in_cap).all()
    assert (rt[hr & ~hb] > cap).all()  # traversal extras leaked past cap
    both = hb & in_cap
    assert np.allclose(np.asarray(rb["t"])[both], rt[both],
                       rtol=1e-4, atol=1e-3)


def test_terrain_soup_first_hit():
    """extract_boxes_terrain emits exactly the exposed voxel set of a
    heightfield, which must be first-hit-equivalent to the SVO traversal
    for rays starting in non-solid space (the flagship-scale soup path)."""
    from voxtracer.world.boxes import extract_boxes_terrain, terrain_leaf_id
    from voxtracer.world.native import NativeSvoSpace, available

    if not available():
        pytest.skip("no native library")
    n = 32
    rng = np.random.default_rng(5)
    # rough terrain incl. empty columns, full columns, and cliffs
    heights = rng.integers(0, n + 1, (n, n)).astype(np.uint32)
    heights[0:4, :] = 0
    heights[:, 10:12] = n
    space = NativeSvoSpace()
    space.build_terrain(heights, rgb=(0.3, 0.55, 0.25))
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)

    leaf = terrain_leaf_id(dev)
    rgb = dev.table[leaf, :3].view(np.float32)
    soup = extract_boxes_terrain(np.asarray(heights), leaf, rgb)
    assert (soup.size <= 16).all() and (soup.size >= 1).all()

    # random rays from outside solid matter (above the terrain or beyond
    # the world), in all directions
    B = 4096
    start = np.stack([
        rng.random(B) * n * 2 - n * 0.5,
        rng.random(B) * n + n,  # always above the world top
        rng.random(B) * n * 2 - n * 0.5,
    ], axis=1).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    ref = svo_raycast(table, root, dev.height, jnp.asarray(start),
                      jnp.asarray(d))

    # resolve the soup per-ray with the rasterizer's exact slab test:
    # brute-force nearest box (no binning) — tests the SOUP, not the tiler
    from voxtracer.kernels.raster import _mirrored_slab

    lo = jnp.asarray(soup.lo, jnp.float32)
    hi = jnp.asarray(soup.lo + soup.size, jnp.float32)

    jstart = jnp.asarray(start)
    jd = jnp.asarray(d)

    def nearest(i):
        t, axis, hit = _mirrored_slab(
            lo, hi, jstart[i][None, :], jd[i][None, :],
            dev.height, jnp.float32(1e12),
        )
        return jnp.min(t), jnp.any(hit)

    import jax

    tmin, hit = jax.lax.map(nearest, jnp.arange(B), batch_size=256)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref["hit"]))
    ok = np.asarray(ref["hit"])
    np.testing.assert_allclose(
        np.asarray(tmin)[ok], np.asarray(ref["t"])[ok], rtol=1e-5, atol=1e-4
    )


def test_projection_uses_exact_matmul():
    """No default-precision matmul may touch world-scale coordinates:
    the TPU's default matmul runs bf16 passes (~2^-14 relative), which
    at 8192-scale coordinates mis-projects boxes by 1-2 px — they
    silently lose their edge tile column and the completeness logic
    cannot flag it (found at flagship scale; CPU tests cannot reproduce
    it, so pin the jaxpr instead). raster_cast's projection is written
    as elementwise math (exact f32) — assert no dot_general sneaks in;
    ray_directions keeps its matmul at HIGHEST."""
    import jax

    lo = jnp.zeros((4, 3), jnp.int32)
    size = jnp.ones((4, 3), jnp.int32)
    attr = jnp.zeros((4, 4), jnp.float32)
    cam = vcam.Camera(pos=(1.0, 2.0, -3.0), yaw=0.1, pitch=0.2)
    basis = np.asarray(cam.basis(), np.float32)
    jaxpr = jax.make_jaxpr(
        lambda: raster_cast(lo, size, attr,
                            np.asarray(cam.pos, np.float32), basis,
                            3, 16, 16)
    )()
    s = str(jaxpr)
    assert "dot_general" not in s or "Precision.HIGHEST" in s

    jaxpr2 = jax.make_jaxpr(
        lambda: vcam.ray_directions(cam.basis(),
                                    jnp.zeros((2, 2), jnp.float32))
    )()
    assert "Precision.HIGHEST" in str(jaxpr2)


def test_bins_path_matches_inline(terrain):
    """raster_cast(bins=raster_bins(...)) must equal the inline path
    exactly — the progressive-sampler fast path recomputes nothing."""
    from voxtracer.kernels.raster import raster_bins

    dev, args = _soup_args(terrain)
    s = 64 / 8192
    cam = vcam.Camera(pos=(800.2352 * s, 1511.8693 * s, 654.40125 * s),
                      yaw=-5.3800497, pitch=0.21999985)
    op = np.asarray(cam.pos, np.float32)
    basis = np.asarray(cam.basis(), np.float32)
    W, H = 96, 56

    a = raster_cast(*args, op, basis, dev.height, W, H)
    bins = raster_bins(args[0], args[1], op, basis, dev.height, W, H)
    b = raster_cast(*args, op, basis, dev.height, W, H, bins=bins)
    for k in ("hit", "t", "normal", "node", "rgb", "voxel", "n_fallback"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)

    # jittered: bins built with jittered=True, rays with sub-pixel jitter
    rng = np.random.default_rng(3)
    _, d = vcam.generate_rays(cam, W, H,
                              jitter=jnp.asarray(rng.random((H, W, 2),
                                                            np.float32)))
    aj = raster_cast(*args, op, basis, dev.height, W, H, ray_dirs=d)
    bins_j = raster_bins(args[0], args[1], op, basis, dev.height, W, H,
                         jittered=True)
    bj = raster_cast(*args, op, basis, dev.height, W, H, ray_dirs=d,
                     bins=bins_j)
    for k in ("hit", "t", "normal", "node", "rgb"):
        np.testing.assert_array_equal(np.asarray(aj[k]), np.asarray(bj[k]),
                                      err_msg=k)


def test_want_voxel_false_shading_parity(clutter):
    """The shading-only path (want_voxel=False, RGB carried through the
    resolve instead of the per-pixel winner gather) must match the
    want_voxel=True frame on hit/t/normal/rgb, and its banded variant
    must match the band of the full frame."""
    dev, args = _soup_args(clutter)
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    cam = vcam.Camera(pos=(40.0, 36.0, 44.0), yaw=np.pi + 0.5, pitch=-0.6)
    W, H = 64, 40
    op = np.asarray(cam.pos, np.float32)
    full = raster_cast_exact(*args, op, cam.basis(), dev.height, W, H,
                             table=table, root=root)
    lean = raster_cast_exact(*args, op, cam.basis(), dev.height, W, H,
                             table=table, root=root, want_voxel=False)
    for k in ("hit", "t", "normal", "rgb"):
        assert np.array_equal(np.asarray(full[k]), np.asarray(lean[k])), k

    band = raster_cast_exact(*args, op, cam.basis(), dev.height, W, H,
                             table=table, root=root, want_voxel=False,
                             band_row0=16, band_rows=16)
    for k in ("hit", "t", "normal", "rgb"):
        assert np.array_equal(np.asarray(full[k])[16:32],
                              np.asarray(band[k])), k


def test_k_batched_jitter_resolve(terrain):
    """A leading (k,) sample axis on ray_dirs resolves k jitters of one
    pose in a single pass; every per-sample output must equal the k
    separate casts bit-for-bit (same candidates, same fold order) —
    including through the per-ray fallback when tiles stay incomplete."""
    from voxtracer.kernels.raster import raster_cast_exact

    dev, args = _soup_args(terrain)
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    s = 64 / 8192
    cam = vcam.Camera(pos=(800.2352 * s, 1511.8693 * s, 654.40125 * s),
                      yaw=-5.3800497, pitch=0.21999985)
    op = np.asarray(cam.pos, np.float32)
    basis = np.asarray(cam.basis(), np.float32)
    W, H = 96, 56
    K = 3
    rng = np.random.default_rng(11)
    ds = jnp.stack([
        vcam.generate_rays(cam, W, H,
                           jitter=jnp.asarray(rng.random((H, W, 2),
                                                         np.float32)))[1]
        for _ in range(K)
    ])

    for kw in (dict(),
               # starve cand_k/widen budgets so the fallback engages
               dict(cand_k=8, widen_k=8, widen2_k=8, widen3_k=8)):
        batched = raster_cast_exact(
            *args, op, basis, dev.height, W, H, table=table, root=root,
            ray_dirs=ds, want_voxel=True, **kw,
        )
        assert batched["hit"].shape == (K, H, W)
        for i in range(K):
            single = raster_cast_exact(
                *args, op, basis, dev.height, W, H, table=table,
                root=root, ray_dirs=ds[i], want_voxel=True, **kw,
            )
            for f in ("hit", "t", "normal", "node", "rgb", "voxel"):
                np.testing.assert_array_equal(
                    np.asarray(batched[f])[i], np.asarray(single[f]),
                    err_msg=f"{f} (sample {i}, kw={kw})")

    # shading-only path (the PT batch's configuration)
    b2 = raster_cast_exact(*args, op, basis, dev.height, W, H,
                           table=table, root=root, ray_dirs=ds,
                           want_voxel=False)
    s0 = raster_cast_exact(*args, op, basis, dev.height, W, H,
                           table=table, root=root, ray_dirs=ds[1],
                           want_voxel=False)
    for f in ("hit", "t", "normal", "rgb"):
        np.testing.assert_array_equal(np.asarray(b2[f])[1],
                                      np.asarray(s0[f]), err_msg=f)


def test_fit_helpers_contract():
    """The demand-sizing helpers' contract: capacity covers margin *
    demand, never shrinks (sticky growth), respects floors, and the
    quantization stays within ~10% of the marginal need — these bound
    both silent-overflow risk and recompile churn (PERF.md)."""
    from voxtracer.kernels.raster import (_NTIERS, fit_near_slots,
                                          fit_pair_slots,
                                          fit_widen_tiles)

    n_tier = np.array([3] + [0, 5, 100, 3_000, 80_000, 1_000_000,
                             17, 2, 0, 1][:_NTIERS])
    ps = fit_pair_slots(n_tier)
    for cap, d in zip(ps, n_tier[1:]):
        assert cap >= int(d * 1.06), (cap, d)
        assert cap >= 16  # floor
        if d * 1.06 > 64:
            assert cap <= int(d * 1.06 * 1.11) + 32, (cap, d)
    # sticky growth: lower demand never shrinks caps
    ps2 = fit_pair_slots(np.array([0] * (1 + _NTIERS)), current=ps)
    assert ps2 == ps
    bigger = n_tier.copy()
    bigger[3] *= 8
    ps3 = fit_pair_slots(bigger, current=ps)
    assert all(a >= b for a, b in zip(ps3, ps))
    assert ps3[2] >= bigger[3]

    assert fit_near_slots(0) == 8
    assert fit_near_slots(100) >= 200
    assert fit_near_slots(0, current=64) == 64

    ws = fit_widen_tiles(np.array([900, 40, 3]))
    assert all(w >= d * 1.5 for w, d in zip(ws, (900, 40, 3)))
    ws2 = fit_widen_tiles(np.array([0, 0, 0]), current=ws)
    assert tuple(ws2) == tuple(ws)


def test_apply_fallback_hf_parity(terrain):
    """The heightfield fallback engine (apply_fallback_hf) must equal
    the SVO fallback on an unedited terrain world — this is the flagship
    exact-frame path, where ~14k grazing horizon tiles make the per-ray
    SVO fallback the dominant frame cost (PERF.md). Budgets are starved
    so the fallback engages over real incomplete tiles."""
    from voxtracer.kernels.heightfield import build_height_mips
    from voxtracer.kernels.raster import apply_fallback, apply_fallback_hf
    from voxtracer.world.boxes import terrain_leaf_id

    dev, args = _soup_args(terrain)
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    s = 64 / 8192
    cam = vcam.Camera(pos=(800.2352 * s, 1511.8693 * s, 654.40125 * s),
                      yaw=-5.3800497, pitch=0.21999985)
    op = np.asarray(cam.pos, np.float32)
    basis = np.asarray(cam.basis(), np.float32)
    W, H = 96, 56
    res = raster_cast(*args, op, basis, dev.height, W, H, near_slots=64,
                      cand_k=8, widen_k=8, widen2_k=8, widen3_k=8)
    assert int(res["n_fallback"]) > 0  # starved budgets engage it

    a = apply_fallback(res, table, root, dev.height, op, basis, W, H)
    flat, offs, hh = build_height_mips(terrain.heights)
    assert hh == dev.height
    b = apply_fallback_hf(
        res, flat, offs, dev.height, op, basis, W, H,
        terrain_rgb=jnp.asarray(terrain.terrain_rgb, jnp.float32),
        terrain_node=terrain_leaf_id(dev),
    )
    for f in ("hit", "t", "normal", "node", "rgb", "voxel"):
        np.testing.assert_array_equal(np.asarray(a[f]), np.asarray(b[f]),
                                      err_msg=f)
