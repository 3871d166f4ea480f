"""Parity of the heightfield max-mip cast (kernels/heightfield.py)
against the canonical SVO traversal on terrain worlds.

The generated world is exactly a heightfield (world/worldgen.py), so
``hf_raycast`` must reproduce ``svo_raycast`` bit-for-bit away from
degenerate edge-grazes (project conventions: traversal semantics are
canonical; random rays are generic so the budget here is tiny).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.kernels.heightfield import build_height_mips, hf_raycast
from voxtracer.kernels.traverse import svo_raycast
from voxtracer.world import worldgen

LOG2 = 6  # 64^3 world: cheap on the 1-core CPU host, still 7 levels


@pytest.fixture(scope="module")
def world():
    space = worldgen.generate(log2_size=LOG2, verbose=False)
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    mips = build_height_mips(space.heights)
    return table, root, dev.height, mips, np.asarray(space.heights)


def _svo(world, start, d, **kw):
    table, root, h = world[:3]
    return svo_raycast(table, root, h, start, d, **kw)


def _hf(world, start, d, **kw):
    h, (flat, offs, hh) = world[2], world[3]
    assert hh == h
    return hf_raycast(flat, offs, h, start, d, **kw)


def _assert_match(a, b, budget=0):
    """a: svo result, b: hf result; bit-exact up to `budget` lanes."""
    mism = np.asarray(a["hit"]) != np.asarray(b["hit"])
    both = np.asarray(a["hit"]) & np.asarray(b["hit"])
    mism |= both & (np.asarray(a["t"]) != np.asarray(b["t"]))
    mism |= both & np.any(
        np.asarray(a["normal"]) != np.asarray(b["normal"]), axis=-1
    )
    mism |= both & np.any(
        np.asarray(a["voxel"]) != np.asarray(b["voxel"]), axis=-1
    )
    n = int(mism.sum())
    assert n <= budget, (
        f"{n} mismatched lanes (budget {budget}); "
        f"first={np.argwhere(mism)[:5].ravel()}"
    )


def _rand_dirs(rng, n):
    v = rng.standard_normal((n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v


def test_airborne_rays(world):
    rng = np.random.default_rng(7)
    n = 1 << LOG2
    B = 4096
    start = rng.uniform(0, n, (B, 3)).astype(np.float32)
    start[:, 1] = rng.uniform(0, n, B)  # many below terrain too
    d = _rand_dirs(rng, B)
    a = _svo(world, jnp.asarray(start), jnp.asarray(d))
    b = _hf(world, jnp.asarray(start), jnp.asarray(d))
    assert int(np.asarray(a["hit"]).sum()) > B // 4  # sanity: real hits
    _assert_match(a, b, budget=2)


def test_outside_world_rays(world):
    rng = np.random.default_rng(11)
    n = 1 << LOG2
    B = 2048
    start = rng.uniform(-n, 2 * n, (B, 3)).astype(np.float32)
    target = rng.uniform(0, n, (B, 3)).astype(np.float32)
    d = target - start
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    a = _svo(world, jnp.asarray(start), jnp.asarray(d))
    b = _hf(world, jnp.asarray(start), jnp.asarray(d))
    assert int(np.asarray(a["hit"]).sum()) > B // 4
    _assert_match(a, b, budget=2)


def test_surface_bounce_rays(world):
    """Rays re-cast from actual hit points (the integrator's bounce
    geometry: origins exactly on voxel faces)."""
    rng = np.random.default_rng(13)
    n = 1 << LOG2
    B = 4096
    start = rng.uniform(0, n, (B, 3)).astype(np.float32)
    start[:, 1] = rng.uniform(1, n, B)
    d = _rand_dirs(rng, B)
    first = _svo(world, jnp.asarray(start), jnp.asarray(d))
    hit = np.asarray(first["hit"])
    pos = np.asarray(start + np.asarray(first["t"])[:, None] * d)[hit]
    nrm = np.asarray(first["normal"])[hit]
    # cosine-ish hemisphere around the normal
    d2 = _rand_dirs(rng, len(pos))
    flipmask = np.sum(d2 * nrm, axis=-1) < 0
    d2[flipmask] -= 2 * np.sum(
        d2[flipmask] * nrm[flipmask], axis=-1, keepdims=True
    ) * nrm[flipmask]
    a = _svo(world, jnp.asarray(pos), jnp.asarray(d2))
    b = _hf(world, jnp.asarray(pos), jnp.asarray(d2))
    _assert_match(a, b, budget=4)


def test_inside_solid_rays(world):
    """skip_t0 semantics: rays starting strictly inside terrain hit at
    the next unit-plane crossing (or walk out exactly like the SVO)."""
    h, (flat, offs, _) = world[2], world[3]
    rng = np.random.default_rng(17)
    n = 1 << LOG2
    # un-tile the level-0 rows (build_height_mips packs TSxTS blocks;
    # offs[0] carries the tile log)
    ts = 1 << offs[0]
    dp = n // ts
    heights = (np.asarray(flat[: dp * dp]).reshape(dp, dp, ts, ts)
               .transpose(0, 2, 1, 3).reshape(n, n))
    sx, sz = np.nonzero(heights >= 2)
    pick = rng.integers(0, len(sx), 2048)
    x, z = sx[pick], sz[pick]
    y = (heights[x, z] * rng.uniform(0.1, 0.9, len(pick))).astype(np.float32)
    start = np.stack(
        [x + rng.uniform(0.2, 0.8, len(pick)), y,
         z + rng.uniform(0.2, 0.8, len(pick))], axis=-1,
    ).astype(np.float32)
    d = _rand_dirs(rng, len(pick))
    a = _svo(world, jnp.asarray(start), jnp.asarray(d))
    b = _hf(world, jnp.asarray(start), jnp.asarray(d))
    _assert_match(a, b, budget=2)


def test_capped_cast_strict(world):
    """The hf cap is strict: hit iff the uncapped first hit is within
    the cap, with identical t/voxel (the advisory-vs-strict difference
    never changes integrator decisions — heightfield.py module doc)."""
    rng = np.random.default_rng(19)
    n = 1 << LOG2
    B = 2048
    start = rng.uniform(0, n, (B, 3)).astype(np.float32)
    d = _rand_dirs(rng, B)
    cap = 8.0
    un = _svo(world, jnp.asarray(start), jnp.asarray(d))
    b = _hf(world, jnp.asarray(start), jnp.asarray(d), distance=cap)
    want = np.asarray(un["hit"]) & (np.asarray(un["t"]) <= cap)
    got = np.asarray(b["hit"])
    mism = want != got
    both = want & got
    mism |= both & (np.asarray(un["t"]) != np.asarray(b["t"]))
    assert int(mism.sum()) <= 2


def test_bucketed_identical(world):
    rng = np.random.default_rng(23)
    n = 1 << LOG2
    B = 8192
    start = rng.uniform(0, n, (B, 3)).astype(np.float32)
    d = _rand_dirs(rng, B)
    a = _hf(world, jnp.asarray(start), jnp.asarray(d))
    b = _hf(world, jnp.asarray(start), jnp.asarray(d), min_bucket=512)
    for k in ("hit", "t", "normal", "voxel"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_active_mask(world):
    rng = np.random.default_rng(29)
    n = 1 << LOG2
    B = 1024
    start = rng.uniform(0, n, (B, 3)).astype(np.float32)
    d = _rand_dirs(rng, B)
    act = rng.random(B) < 0.5
    a = _hf(world, jnp.asarray(start), jnp.asarray(d))
    b = _hf(world, jnp.asarray(start), jnp.asarray(d),
            active=jnp.asarray(act))
    np.testing.assert_array_equal(
        np.asarray(b["hit"]), np.asarray(a["hit"]) & act
    )
    np.testing.assert_array_equal(
        np.asarray(b["t"])[act], np.asarray(a["t"])[act]
    )
    assert not np.asarray(b["hit"])[~act].any()


def test_degenerate_heightfields():
    """All-empty and all-solid columns."""
    n = 16
    rng = np.random.default_rng(31)
    B = 512
    start = rng.uniform(-n, 2 * n, (B, 3)).astype(np.float32)
    target = rng.uniform(0, n, (B, 3)).astype(np.float32)
    d = target - start
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    flat, offs, h = build_height_mips(np.zeros((n, n), np.uint32))
    r = hf_raycast(flat, offs, h, jnp.asarray(start), jnp.asarray(d))
    assert not np.asarray(r["hit"]).any()

    flat, offs, h = build_height_mips(np.full((n, n), n, np.uint32))
    r = hf_raycast(flat, offs, h, jnp.asarray(start), jnp.asarray(d))
    # every ray aimed at a point inside the solid cube must hit
    assert np.asarray(r["hit"]).all()


def test_trace_paths_hf_engine_bit_identical(world):
    """The integrator with the heightfield engine produces bit-identical
    radiance and RNG states to the SVO engine on terrain worlds (same
    casts' t/normal bit-for-bit, same terrain color bits)."""
    import jax
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.kernels.integrator import trace_paths

    table, root, h, (flat, offs, _) = world[:4]
    rng = np.random.default_rng(41)
    n = 1 << LOG2
    B = 2048
    start = rng.uniform(0, n, (B, 3)).astype(np.float32)
    start[:, 1] = rng.uniform(2, n, B)
    d = _rand_dirs(rng, B)
    wl = rng.random(B).astype(np.float32)
    state = rng.integers(0, 2**32, (B, 3), dtype=np.uint32)
    sun = np.asarray([0.8, 10.2743, 3.7], np.float32)
    sun /= np.linalg.norm(sun)
    lut = jnp.asarray(build_wl_to_rgb_lut())

    st_a, rad_a = trace_paths(
        table, root, h, lut, jnp.asarray(start), jnp.asarray(d),
        jnp.asarray(wl), jnp.asarray(sun), jnp.asarray(state),
        max_bounces=6, fog_steps=16,
    )
    # fuse_nee=False: engine parity is what's tested here; the fused
    # loop's returned state intentionally leads by one planet draw
    # (integrator.py bounce_fused doc) while its RADIANCE matches
    # bit-for-bit (test_integrator.py::test_fused_nee_loop_bit_identical)
    st_b, rad_b = trace_paths(
        table, root, h, lut, jnp.asarray(start), jnp.asarray(d),
        jnp.asarray(wl), jnp.asarray(sun), jnp.asarray(state),
        max_bounces=6, fog_steps=16, hf_mips=flat, hf_offsets=offs,
        terrain_rgb=jnp.asarray([0.5, 0.5, 0.5], jnp.float32),
        fuse_nee=False,
    )
    diff = np.any(np.asarray(rad_a) != np.asarray(rad_b), axis=-1)
    assert int(diff.sum()) <= 2, f"{int(diff.sum())} lanes differ"
    sdiff = np.any(np.asarray(st_a) != np.asarray(st_b), axis=-1)
    assert int(sdiff.sum()) <= 2


def test_tile_size_invariant(world):
    """The pack's tile size is a pure performance choice: TS=2/4/8
    packs (and different tile_steps) yield bit-identical casts — every
    emitted t is an integer-valued f32 times a power of two, the same
    float at every granularity (heightfield.py module doc)."""
    table, root, h = world[:3]
    space = worldgen.generate(log2_size=LOG2, verbose=False)
    rng = np.random.default_rng(29)
    n = 1 << LOG2
    B = 4096
    start = rng.uniform(-0.25 * n, 1.25 * n, (B, 3)).astype(np.float32)
    d = _rand_dirs(rng, B)
    outs = []
    for tl, steps, idesc in ((1, 3, 0), (2, 3, 0), (3, 2, 0), (3, 5, 0),
                             (3, 3, 2)):  # init_desc: deeper gather-free
        # init descent is a pruning-schedule choice too (round 4)
        flat, offs, hh = build_height_mips(space.heights, tile_log=tl)
        assert offs[0] == tl and hh == h
        outs.append(hf_raycast(flat, offs, hh, jnp.asarray(start),
                               jnp.asarray(d), tile_steps=steps,
                               init_desc=idesc))
    a = outs[0]
    for b in outs[1:]:
        for k in ("hit", "t", "normal", "voxel"):
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))


def test_edited_world_hybrid_cast():
    """hf_raycast_edited (pre-edit walk + SVO re-cast of lanes that can
    see the edit bounds) must match a pure svo_raycast on the EDITED
    world lane-for-lane; the re-cast set must stay small (that's the
    point) and nonzero (else the test is vacuous)."""
    from voxtracer.kernels.heightfield import hf_raycast_edited

    space = worldgen.generate(log2_size=LOG2, verbose=False)
    mips = build_height_mips(space.heights)  # PRE-edit pack
    h0 = np.asarray(space.heights)
    # dig a hole and place a white block near the terrain surface
    cx, cz = np.unravel_index(np.argmax(h0[8:56, 8:56]), (48, 48))
    cx, cz = int(cx) + 8, int(cz) + 8
    top = int(h0[cx, cz])
    assert top >= 2
    edits = []
    for dx in range(2):
        for dz in range(2):
            space.set((cx + dx, top - 1, cz + dz), None)  # dig
            edits.append((cx + dx, top - 1, cz + dz))
    # place a white block just above the dig site (edits cluster in a
    # real editing session; the driver tracks ONE bounds box)
    space.set((cx, top + 2, cz), (1.0, 1.0, 1.0))
    edits.append((cx, top + 2, cz))
    assert space.edited
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    lo = np.min(np.asarray(edits), axis=0).astype(np.float32) - 1.0
    hi = np.max(np.asarray(edits), axis=0).astype(np.float32) + 2.0
    bounds = jnp.asarray(np.stack([lo, hi]))

    rng = np.random.default_rng(17)
    B = 4096
    start = np.stack([
        rng.uniform(8, 56, B), rng.uniform(10, 60, B), rng.uniform(8, 56, B)
    ], -1).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # aim a slice of rays straight at the edits so the re-cast set is
    # exercised for sure
    tgt = np.array([cx + 0.5, top + 0.5, cz + 0.5], np.float32)
    d[:256] = tgt[None] - start[:256]
    d[:256] /= np.linalg.norm(d[:256], axis=-1, keepdims=True)

    flat, offs, hh = mips
    hyb = hf_raycast_edited(flat, offs, hh, table, root, bounds,
                            jnp.asarray(start), jnp.asarray(d))
    ref = svo_raycast(table, root, hh, jnp.asarray(start), jnp.asarray(d))

    n_aff = int(np.asarray(hyb["from_svo"]).sum())
    assert 0 < n_aff < B // 4, f"re-cast set {n_aff} of {B}"

    mism = np.asarray(hyb["hit"]) != np.asarray(ref["hit"])
    both = np.asarray(hyb["hit"]) & np.asarray(ref["hit"])
    mism |= both & (np.asarray(hyb["t"]) != np.asarray(ref["t"]))
    mism |= both & np.any(
        np.asarray(hyb["normal"]) != np.asarray(ref["normal"]), -1)
    mism |= both & np.any(
        np.asarray(hyb["voxel"]) != np.asarray(ref["voxel"]), -1)
    assert int(mism.sum()) <= 2, (
        f"{int(mism.sum())} lanes diverge from the edited-world SVO cast"
    )
    # re-cast lanes must expose the SVO leaf (placed blocks shade by it)
    aff_hit = np.asarray(hyb["from_svo"]) & np.asarray(hyb["hit"])
    assert np.all(np.asarray(hyb["node"])[aff_hit] >= 0)


def test_edited_world_pt_radiance():
    """render_sample with the hybrid heightfield cast (hf + edit
    bounds) must reproduce the pure-SVO render of the EDITED world —
    the editing session keeps the fast engine without changing a pixel
    (graze budget as ever)."""
    from voxtracer.core import camera as vcam
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.kernels.integrator import render_sample

    space = worldgen.generate(log2_size=LOG2, verbose=False)
    mips = build_height_mips(space.heights)
    h0 = np.asarray(space.heights)
    cx, cz = np.unravel_index(np.argmax(h0[8:56, 8:56]), (48, 48))
    cx, cz = int(cx) + 8, int(cz) + 8
    top = int(h0[cx, cz])
    space.set((cx, top - 1, cz), None)
    space.set((cx, top + 1, cz), (1.0, 1.0, 1.0))  # emissive placed block
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    bounds = jnp.asarray(
        np.stack([np.array([cx - 1, top - 2, cz - 1], np.float32),
                  np.array([cx + 2, top + 3, cz + 2], np.float32)]))
    lut = jnp.asarray(build_wl_to_rgb_lut(256))
    cam = vcam.Camera(pos=(cx - 14.0, top + 9.0, cz - 10.0),
                      yaw=0.65, pitch=-0.45)
    sun = np.array([0.5, 0.8, 0.33], np.float32)
    sun /= np.linalg.norm(sun)
    seed = jnp.asarray(np.array([3, 77, 19], np.uint32))
    flat, offs, hh = mips
    kw = dict(max_bounces=4, fog_steps=8)
    a = render_sample(table, root, hh, lut,
                      np.asarray(cam.pos, np.float32), cam.basis(),
                      jnp.asarray(sun), seed, 64, 48, **kw)
    b = render_sample(table, root, hh, lut,
                      np.asarray(cam.pos, np.float32), cam.basis(),
                      jnp.asarray(sun), seed, 64, 48,
                      hf_mips=flat, hf_offsets=offs,
                      terrain_rgb=jnp.asarray(space.terrain_rgb,
                                              jnp.float32),
                      hf_edit_bounds=bounds, **kw)
    a = np.asarray(a)
    b = np.asarray(b)
    bad = np.any(a != b, axis=-1)
    assert int(bad.sum()) <= 4, f"{int(bad.sum())} pixels diverge"
    assert b.sum() > 0


def test_t_min_resume_exact(world):
    """hf_raycast(t_min=x) must equal the full walk whenever x is
    strictly below the first surface crossing (the _hf_init contract —
    the raster fallback passes drop_cur minus a 2-voxel slack,
    kernels/raster.apply_fallback_hf). Resumed at a random in-air
    fraction of each lane's own full-walk hit t (and anywhere along the
    first world-diagonal for misses), every hit/t/normal/voxel must be
    bit-identical."""
    rng = np.random.default_rng(29)
    n = 1 << LOG2
    B = 4096
    start = rng.uniform(-n, 2 * n, (B, 3)).astype(np.float32)
    target = rng.uniform(0, n, (B, 3)).astype(np.float32)
    d = target - start
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    full = _hf(world, jnp.asarray(start), jnp.asarray(d))
    hit = np.asarray(full["hit"])
    t_full = np.asarray(full["t"])
    assert int(hit.sum()) > B // 4
    frac = rng.uniform(0.0, 1.0, B).astype(np.float32)
    # the contract requires air on [entry, t_min]: origins inside solid
    # (below their column height) are in solid at EVERY t_min > 0 —
    # resume those at 0 (the raster fallback can never produce them:
    # its rays come from the camera, and a camera inside solid has no
    # incomplete tiles beyond its t=0 hit)
    heights = world[4].astype(np.float32)  # exact column heights [x, z]
    xz = np.floor(start).astype(np.int64)
    inb = np.all((xz >= 0) & (xz < n), axis=1)
    colh = np.where(inb, heights[np.clip(xz[:, 0], 0, n - 1),
                                 np.clip(xz[:, 2], 0, n - 1)], 0.0)
    air0 = ~inb | (start[:, 1] >= colh)
    # misses resume anywhere in the first half of the world diagonal;
    # their result must stay a miss
    t_min = np.where(hit, frac * t_full, frac * n).astype(np.float32)
    t_min = np.where(air0, t_min, 0.0).astype(np.float32)
    res = _hf(world, jnp.asarray(start), jnp.asarray(d),
              t_min=jnp.asarray(t_min))
    _assert_match(full, res, budget=0)


def test_frame_cast_parity(world):
    """hf_frame_cast (the flagship exact-frame engine) is pixel-exact
    vs the canonical traversal over a generic camera frame, and fills
    the raster_cast_exact result contract: node/rgb from the terrain
    leaf on hits, zeroed misses."""
    from voxtracer.core import camera as vcam
    from voxtracer.kernels.heightfield import hf_frame_cast

    table, root, h, (flat, offs, _), heights = world
    W, H = 48, 32
    n = 1 << LOG2
    cam = vcam.Camera(
        pos=(0.62 * n, float(heights.max()) + 5.0, 0.35 * n),
        yaw=2.2, pitch=-0.3,
    )
    op = np.asarray(cam.pos, np.float32)
    fr = hf_frame_cast(flat, offs, h, op, cam.basis(), W, H,
                       terrain_rgb=(0.3, 0.62, 0.24), terrain_node=77)
    _, d = vcam.generate_rays(cam, W, H)
    rr = svo_raycast(table, root, h, jnp.asarray(op), d)
    _assert_match(rr, fr, budget=0)
    hit = np.asarray(fr["hit"])
    assert hit.any() and not hit.all()
    node = np.asarray(fr["node"])
    assert (node[hit] == 77).all() and (node[~hit] == -1).all()
    rgb = np.asarray(fr["rgb"])
    assert np.allclose(rgb[hit], (0.3, 0.62, 0.24))
    assert (rgb[~hit] == 0).all() and (np.asarray(fr["t"])[~hit] == 0).all()
    # explicit ray_dirs (the jittered-PT entry point) are honored
    fr2 = hf_frame_cast(flat, offs, h, op, cam.basis(), W, H,
                        terrain_rgb=(0.3, 0.62, 0.24), ray_dirs=d)
    assert (np.asarray(fr2["t"]) == np.asarray(fr["t"])).all()


def test_renderer_hf_only_mode(world):
    """Flagship-scale policy (HF_FRAME_SIZE shrunk to this world): the
    Renderer builds NO soup, serves exact hf previews, accumulates PT
    samples, and keeps working through a tracked point edit."""
    from voxtracer.core import camera as vcam
    from voxtracer.render.driver import Renderer
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=LOG2, verbose=False)
    heights = np.asarray(space.heights)
    r = Renderer(space.serialize(), 32, 24, max_bounces=2, fog_steps=4,
                 seed=3)
    r.HF_FRAME_SIZE = 1 << LOG2  # this world qualifies as flagship-scale
    n = 1 << LOG2
    cam = vcam.Camera(
        pos=(0.62 * n, float(heights.max()) + 5.0, 0.35 * n),
        yaw=2.2, pitch=-0.3,
    )
    sun = np.asarray([0.8, 10.2743, 3.7])
    assert r._hf_only() and r._get_soup(cam) is None and r._soup is None
    img = r.preview_frame(cam, sun)
    assert img is not None

    # preview parity: shaded svo primaries over the same rays
    table, root, h = world[:3]
    _, d = vcam.generate_rays(cam, 32, 24)
    rr = svo_raycast(table, root, h, jnp.asarray(np.asarray(
        cam.pos, np.float32)), d)
    su = jnp.asarray((sun / np.linalg.norm(sun)).astype(np.float32))
    lighting = jnp.sum(su * rr["normal"], axis=-1) / 2.0 + 1.0
    from voxtracer.kernels.traverse import leaf_rgb

    ref = (leaf_rgb(table, rr["node"]) * lighting[..., None]
           * rr["hit"][..., None])
    assert np.allclose(np.asarray(img), np.asarray(ref), atol=1e-6)

    r.sample(cam, sun)
    assert r.acc.samples == 1 and float(np.abs(r.acc.mean()).sum()) > 0

    # a tracked point edit keeps hf-only mode (hybrid edited cast)
    hx, hz = 20, 14
    top = int(heights[hx, hz])
    space.set((hx, top, hz), (0.9, 0.1, 0.1))
    r.apply_edits(space, edits=[(hx, top, hz)])
    assert r._hf_only() and r._get_soup(cam) is None
    img2 = r.preview_frame(cam, sun)
    assert img2 is not None
    r.sample(cam, sun)  # the edit invalidated the accumulator
    assert r.acc.samples == 1
