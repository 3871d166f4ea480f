"""Incremental edit path: serialize_delta / Renderer.apply_edits.

Contract (world/svo.py serialize_delta): after a baseline full serialize,
applying the drained delta rows to the baseline table must reproduce a
fresh full serialize exactly — including freed slots (all-EMPTY rows),
capacity growth, solid_leaf values, and the new root. The reference
re-uploads the whole table per edit (fragment.rs:274-313); this is the
O(changed nodes) replacement promised in SURVEY §7.2-6.
"""

import numpy as np
import pytest

from voxtracer.world import native
from voxtracer.world.svo import EMPTY, SvoSpace, from_dense


def _tiny_world(n=8):
    rng = np.random.default_rng(7)
    solid = rng.random((n, n, n)) < 0.3
    rgb = rng.random((n, n, n, 3)).astype(np.float32)
    return solid, rgb


def _apply_delta(base_table, base_solid, delta):
    rows, vals, solid, root, height, cap = delta
    table = base_table.copy()
    sld = base_solid.copy()
    if cap > len(table):
        table = np.concatenate(
            [table, np.full((cap - len(table), 8), EMPTY, np.uint32)]
        )
        sld = np.concatenate([sld, np.full(cap - len(sld), -1, np.int32)])
    table[rows] = vals
    sld[rows] = solid
    return table, sld, root


def _edit_script(space, n):
    # deletes, placements with new colors (forces new slots), overwrite,
    # no-op, and a clear of a previously-placed voxel
    space.set((0, 0, 0), None)
    space.set((1, 2, 3), (0.125, 0.25, 0.5))
    space.set((n - 1, n - 1, n - 1), (1.0, 1.0, 1.0))
    space.set((1, 2, 3), (0.9, 0.1, 0.1))
    space.set((4, 4, 4), None)
    space.set((4, 4, 4), None)  # no-op on empty
    space.set((n - 1, n - 1, n - 1), None)


def test_python_delta_matches_full_serialize():
    n = 8
    space = from_dense(*_tiny_world(n))
    base = space.serialize()
    d0 = space.serialize_delta()  # no edits since sync -> empty delta
    assert d0 is not None and len(d0[0]) == 0

    _edit_script(space, n)
    delta = space.serialize_delta()
    assert delta is not None and len(delta[0]) > 0

    table, solid, root = _apply_delta(base.table, base.solid_leaf, delta)
    full = space.serialize()
    assert table.shape == full.table.shape
    np.testing.assert_array_equal(table, full.table)
    np.testing.assert_array_equal(solid, full.solid_leaf)
    assert root == full.root

    # draining resets the dirty set
    d2 = space.serialize_delta()
    assert len(d2[0]) == 0


def test_delta_before_baseline_is_none():
    space = from_dense(*_tiny_world(4))
    assert space.serialize_delta() is None


def test_delta_capacity_growth():
    space = SvoSpace()
    solid = np.zeros((4, 4, 4), bool)
    solid[0, 0, 0] = True
    rgb = np.full((4, 4, 4, 3), 0.5, np.float32)
    space = from_dense(solid, rgb)
    base = space.serialize()
    # many distinct colors -> new leaf slots beyond the baseline capacity
    for i in range(12):
        space.set((i % 4, (i // 4) % 4, 3), (0.01 * i, 0.5, 0.5))
    delta = space.serialize_delta()
    table, sld, root = _apply_delta(base.table, base.solid_leaf, delta)
    full = space.serialize()
    np.testing.assert_array_equal(table, full.table)
    np.testing.assert_array_equal(sld, full.solid_leaf)
    assert root == full.root
    assert len(table) > len(base.table)


@pytest.mark.skipif(not native.available(), reason="no native library")
def test_native_delta_matches_full_serialize():
    n = 8
    heights = np.random.default_rng(3).integers(0, n, (n, n)).astype(np.uint32)
    space = native.NativeSvoSpace()
    space.build_terrain(heights, rgb=(0.3, 0.6, 0.2))
    assert space.serialize_delta() is None  # no baseline yet
    base = space.serialize()
    _edit_script(space, n)
    delta = space.serialize_delta()
    assert delta is not None and len(delta[0]) > 0
    table, solid, root = _apply_delta(base.table, base.solid_leaf, delta)
    full = space.serialize()
    np.testing.assert_array_equal(table, full.table)
    np.testing.assert_array_equal(solid, full.solid_leaf)
    assert root == full.root
    assert len(space.serialize_delta()[0]) == 0


def test_renderer_apply_edits_matches_rebuild():
    from voxtracer.render.driver import Renderer

    n = 8
    space = from_dense(*_tiny_world(n))
    r = Renderer(space.serialize(), 16, 12, max_bounces=2, fog_steps=4,
                 seed=11)
    _edit_script(space, n)
    r.apply_edits(space)
    full = space.serialize()
    np.testing.assert_array_equal(
        np.asarray(r.table), full.table.view(np.int32)
    )
    np.testing.assert_array_equal(np.asarray(r.solid_leaf), full.solid_leaf)
    assert int(r.root) == (full.root if full.root != EMPTY else -1)

    # rendered output equals a from-scratch renderer with the same seed
    # and engines: the soup was never materialized before the edit, so
    # apply_edits keeps rasterized primaries and the lazy extraction
    # reads the already-edited world — identical to a fresh build.
    r2 = Renderer(full, 16, 12, max_bounces=2, fog_steps=4, seed=11)
    from voxtracer.core import camera as vcam

    cam = vcam.Camera(pos=(4.0, 6.0, -3.0), yaw=0.1, pitch=-0.4)
    sun = np.array([0.3, 0.8, 0.5])
    r.sample(cam, sun)
    r2.sample(cam, sun)
    np.testing.assert_allclose(
        np.asarray(r.acc.mean()), np.asarray(r2.acc.mean()), rtol=0, atol=0
    )


def test_soup_patch_matches_rebuild():
    """SoupPatcher point edits are first-hit-equivalent to a full soup
    rebuild: delete a surface voxel (exposes culled neighbors), place a
    block in air, overwrite a color, delete inside a merged box (splits
    it) — after each, raster frames from the patched soup equal frames
    from extract_boxes on the edited world (hit/t/normal/rgb)."""
    import jax.numpy as jnp

    from voxtracer.core import camera as vcam
    from voxtracer.kernels.raster import pack_box_attr, raster_cast_exact
    from voxtracer.world.boxes import SoupPatcher, extract_boxes

    n = 16
    rng = np.random.default_rng(11)
    solid = np.zeros((n, n, n), bool)
    solid[:, :3, :] = True  # slab -> merged strips + enclosure culls
    solid[4:8, 3:6, 4:8] = True  # a mound
    rgb = np.broadcast_to(
        np.asarray([0.5, 0.4, 0.3], np.float32), (n, n, n, 3)).copy()
    rgb[4:8, 3:6, 4:8] = [0.2, 0.6, 0.2]
    space = from_dense(solid, rgb)
    dev = space.serialize()
    patcher = SoupPatcher(extract_boxes(dev), overlay=512)

    cam = vcam.Camera(pos=(n * 1.4, n * 1.1, n * 1.5),
                      yaw=np.pi + 0.7, pitch=-0.55)
    W, H = 48, 40

    def frame(soup_dev, d):
        dd = d.serialize()
        table = jnp.asarray(dd.table.view(np.int32))
        root = np.int32(dd.root if dd.root != 0xFFFFFFFF else -1)
        r = raster_cast_exact(
            soup_dev[0], soup_dev[1], soup_dev[2],
            np.asarray(cam.pos, np.float32), cam.basis(), dd.height,
            W, H, table=table, root=root,
        )
        return {k: np.asarray(r[k]) for k in ("hit", "t", "normal", "rgb")}

    edits = [
        ((5, 5, 5), None),              # delete mound surface voxel
        ((5, 8, 5), (1.0, 1.0, 1.0)),   # place emissive block in air
        ((4, 5, 4), (0.9, 0.1, 0.1)),   # overwrite color
        ((8, 2, 8), None),              # delete inside the merged slab
        ((5, 4, 5), None),              # delete under the first delete
    ]
    for p, val in edits:
        space.set(p, val)
        assert patcher.apply([p], space), "overlay overflow"
        got = frame(patcher.device_soup, space)

        fresh_soup = extract_boxes(space.serialize())
        fresh = (jnp.asarray(fresh_soup.lo), jnp.asarray(fresh_soup.size),
                 jnp.asarray(pack_box_attr(fresh_soup)))
        want = frame(fresh, space)
        for k in ("hit", "t", "normal", "rgb"):
            assert np.array_equal(got[k], want[k]), (p, val, k)


def test_renderer_edit_session_keeps_hf_engine(monkeypatch):
    """A terrain Renderer keeps the heightfield bounce/NEE engine and
    the rasterized primaries through a point-edit session (apply_edits
    with edit coords): radiance must equal a from-scratch Renderer of
    the edited world running the plain engines."""
    # opt sun maps IN so the edited-world gate below is what's tested
    # (they default off: measured net-negative on TPU, PERF.md)
    monkeypatch.setenv("VOXT_SUNMAPS", "1")
    from voxtracer.core import camera as vcam
    from voxtracer.render.driver import Renderer
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=6, verbose=False)
    h0 = np.asarray(space.heights)
    r = Renderer(space.serialize(), 32, 24, max_bounces=3, fog_steps=8,
                 seed=5)
    cx, cz = np.unravel_index(np.argmax(h0[8:56, 8:56]), (48, 48))
    cx, cz = int(cx) + 8, int(cz) + 8
    top = int(h0[cx, cz])
    edits = [(cx, top - 1, cz), (cx, top + 1, cz)]
    space.set(edits[0], None)
    space.set(edits[1], (1.0, 1.0, 1.0))
    r.apply_edits(space, edits=edits)
    # the session keeps both fast engines
    assert r.use_soup
    assert r._get_hf()[0] is not None
    assert r._hf_bounds() is not None
    # and the sun maps are gated (they prove pre-edit visibility)
    assert r._get_sun_maps(np.array([0.5, 0.8, 0.33], np.float32)) is None

    r2 = Renderer(space.serialize(), 32, 24, max_bounces=3, fog_steps=8,
                  seed=5)
    assert r2._get_hf()[0] is None  # edited + no tracked bounds

    cam = vcam.Camera(pos=(cx - 14.0, top + 9.0, cz - 10.0),
                      yaw=0.65, pitch=-0.45)
    sun = np.array([0.5, 0.8, 0.33])
    r.sample(cam, sun)
    r2.sample(cam, sun)
    a = np.asarray(r.acc.mean())
    b = np.asarray(r2.acc.mean())
    bad = np.any(a != b, axis=-1)
    assert int(bad.sum()) <= 4, f"{int(bad.sum())} pixels diverge"


def test_edit_bounds_cutoff_disables_hf():
    """The quarter-world cutoff survives the round-4 bounds LIST: only
    when non-heightfield edits form more distant clusters than
    EDIT_BOXES — so merging is forced to grow some box past a quarter
    of the world edge — does the Renderer drop the heightfield engine.
    Two distant clusters (the old cutoff trigger) now stay tracked as
    two small boxes with the engine ON (tests/test_hf_edit.py covers
    the exact-hf and spread-out cases)."""
    from voxtracer.render.driver import Renderer
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=6, verbose=False)
    h0 = np.asarray(space.heights)
    r = Renderer(space.serialize(), 16, 12, max_bounces=2, fog_steps=4)
    assert r._get_hf()[0] is not None
    # floating colored blocks (never heightfield-shaped) at opposite
    # corners: a LIST of two small boxes, engine stays on
    e1 = (5, min(int(h0[5, 5]) + 2, 62), 5)
    e2 = (60, min(int(h0[60, 60]) + 2, 62), 60)
    space.set(e1, (0.9, 0.2, 0.1))
    r.apply_edits(space, edits=[e1])
    assert r._get_hf()[0] is not None and r._hf_bounds() is not None
    space.set(e2, (0.9, 0.2, 0.1))
    r.apply_edits(space, edits=[e2])
    assert r._get_hf()[0] is not None and r._hf_bounds() is not None
    assert len(r._edit_bounds) == 2
    # one batch spanning most of the world edge still trips the cutoff
    wide = [(2, min(int(h0[2, 2]) + 2, 62), 2),
            (61, min(int(h0[61, 61]) + 2, 62), 61)]
    for p in wide:
        space.set(p, (0.9, 0.2, 0.1))
    r.apply_edits(space, edits=wide)
    assert r._hf_bounds() is None
    assert r._get_hf()[0] is None  # engine off, plain SVO bounces
