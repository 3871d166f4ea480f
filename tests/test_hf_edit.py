"""Round-4 editing-cliff fixes (VERDICT r3 missing #2):

* top-voxel place/delete edits keep the world heightfield-EXACT — the
  Renderer re-derives the heightmap and patches the device mips in
  place (render/driver._apply_hf_edits, kernels/heightfield.
  patch_height_mips), staying in pure hf mode with no bounds box;
* other point edits track a LIST of bounds boxes (merged to a cap), so
  a spread-out session's hybrid re-cast fraction follows the edits'
  true solid angle instead of one world-spanning union box;
* the quarter-world cutoff still exists but now needs 25+ mutually
  distant clusters.

Reference behavior being matched: the editor keeps full interactive
speed after any edit (main.rs:267-290 routes edits through a full
re-upload, fragment.rs:274-313)."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core import camera as vcam
from voxtracer.render.driver import Renderer
from voxtracer.world import worldgen


@pytest.fixture(scope="module")
def space6():
    return worldgen.generate(log2_size=6, verbose=False)


def test_patch_height_mips_bitwise():
    from voxtracer.kernels.heightfield import (build_height_mips,
                                               patch_height_mips)

    rng = np.random.default_rng(3)
    for n, k in ((64, 5), (128, 9)):
        h = rng.integers(0, n, (n, n)).astype(np.int64)
        flat, offs, height = build_height_mips(h)
        cols = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                for _ in range(k)]
        h2 = h.copy()
        for (x, z) in cols:
            h2[x, z] = int(rng.integers(0, n + 1))
        patched = patch_height_mips(flat, offs, height, h2, cols)
        fresh, offs2, height2 = build_height_mips(h2)
        assert offs == offs2 and height == height2
        assert np.array_equal(np.asarray(patched), np.asarray(fresh))


def _fresh_equal(r, space, cam, sun, budget=0):
    """r's next sample must equal a from-scratch Renderer of the edited
    world bit-for-bit (same seed) up to `budget` edge-graze pixels."""
    r2 = Renderer(space.serialize(), r.width, r.height,
                  max_bounces=r.max_bounces, fog_steps=r.fog_steps,
                  seed=5)
    r.host_rng.seed(77)
    r2.host_rng.seed(77)
    r.acc.invalidate()
    r.sample(cam, sun)
    r2.sample(cam, sun)
    a, b = np.asarray(r.acc.mean()), np.asarray(r2.acc.mean())
    bad = int(np.any(a != b, axis=-1).sum())
    assert bad <= budget, f"{bad} pixels diverge"


def test_top_voxel_edits_keep_pure_hf(space6):
    space = space6
    h0 = np.asarray(space.heights)
    r = Renderer(space.serialize(), 32, 24, max_bounces=3, fog_steps=8,
                 seed=5)
    assert r._get_hf()[0] is not None
    cx, cz = np.unravel_index(np.argmax(h0[8:56, 8:56]), (48, 48))
    cx, cz = int(cx) + 8, int(cz) + 8
    top = int(h0[cx, cz])
    assert top >= 2
    trgb = space.terrain_rgb

    # delete the top voxel: heightfield-shaped
    e = (cx, top - 1, cz)
    space.set(e, None)
    r.apply_edits(space, edits=[e])
    assert getattr(space, "heights_exact", False)
    assert r._hf_bounds() is None          # pure walk, no hybrid
    assert r._get_hf()[0] is not None
    assert int(space.heights[cx, cz]) == top - 1

    # stack two more deletes in ONE batch, reverse order
    e2 = [(cx, top - 3, cz), (cx, top - 2, cz)]
    for p in e2:
        space.set(p, None)
    r.apply_edits(space, edits=e2)
    assert getattr(space, "heights_exact", False)
    assert int(space.heights[cx, cz]) == top - 3
    assert r._hf_bounds() is None

    # place terrain-colored voxels back on top (two high)
    e3 = [(cx, top - 3, cz), (cx, top - 2, cz)]
    for p in e3:
        space.set(p, trgb)
    r.apply_edits(space, edits=e3)
    assert getattr(space, "heights_exact", False)
    assert int(space.heights[cx, cz]) == top - 1
    assert r._hf_bounds() is None

    cam = vcam.Camera(pos=(cx - 14.0, top + 9.0, cz - 10.0),
                      yaw=0.65, pitch=-0.45)
    sun = np.array([0.5, 0.8, 0.33])
    _fresh_equal(r, space, cam, sun)  # pure hf vs pure hf: exact


def test_non_hf_edit_falls_to_bounds(space6):
    space = worldgen.generate(log2_size=6, verbose=False)
    h0 = np.asarray(space.heights)
    r = Renderer(space.serialize(), 32, 24, max_bounces=3, fog_steps=8,
                 seed=5)
    cx, cz = np.unravel_index(np.argmax(h0[8:56, 8:56]), (48, 48))
    cx, cz = int(cx) + 8, int(cz) + 8
    top = int(h0[cx, cz])

    # floating colored block: NOT heightfield-shaped
    e = (cx, top + 3, cz)
    space.set(e, (0.9, 0.1, 0.2))
    r.apply_edits(space, edits=[e])
    assert not getattr(space, "heights_exact", True)
    assert r._hf_bounds() is not None
    assert r._get_hf()[0] is not None      # hybrid keeps the engine

    # ... and once stale, a later top-voxel delete must NOT re-enter
    # the exact path (heights are stale for the floating block)
    e2 = (cx, top - 1, cz)
    space.set(e2, None)
    r.apply_edits(space, edits=[e2])
    assert not getattr(space, "heights_exact", True)
    assert r._hf_bounds() is not None

    cam = vcam.Camera(pos=(cx - 14.0, top + 9.0, cz - 10.0),
                      yaw=0.65, pitch=-0.45)
    sun = np.array([0.5, 0.8, 0.33])
    _fresh_equal(r, space, cam, sun, budget=4)  # hybrid-vs-pure grazes


def test_hole_and_gap_edits_rejected(space6):
    space = worldgen.generate(log2_size=6, verbose=False)
    h0 = np.asarray(space.heights)
    r = Renderer(space.serialize(), 16, 12, max_bounces=2, fog_steps=4)
    cx, cz = np.unravel_index(np.argmax(h0), h0.shape)
    cx, cz = int(cx), int(cz)
    top = int(h0[cx, cz])
    assert top >= 3
    # delete BELOW the top: a hole — not heightfield-shaped
    e = (cx, top - 3, cz)
    space.set(e, None)
    r.apply_edits(space, edits=[e])
    assert not getattr(space, "heights_exact", True)
    assert r._hf_bounds() is not None


def test_spread_out_session_keeps_hf(space6):
    """30 mutually distant colored blocks (one batch each): the box
    LIST caps at EDIT_BOXES without tripping the quarter-world cutoff,
    the engine stays on, and radiance equals a fresh renderer."""
    space = worldgen.generate(log2_size=6, verbose=False)
    h0 = np.asarray(space.heights)
    r = Renderer(space.serialize(), 32, 24, max_bounces=3, fog_steps=8,
                 seed=5)
    rng = np.random.default_rng(11)
    for i in range(30):
        x = int(rng.integers(2, 62))
        z = int(rng.integers(2, 62))
        y = min(int(h0[x, z]) + 2, 62)
        p = (x, y, z)
        space.set(p, (0.2, 0.4, 0.8))
        r.apply_edits(space, edits=[p])
    assert r._get_hf()[0] is not None, "cliff: engine dropped"
    assert r._hf_bounds() is not None
    assert len(r._edit_bounds) <= r.EDIT_BOXES
    cam = vcam.Camera(pos=(20.0, float(h0.max()) + 8.0, 14.0),
                      yaw=0.8, pitch=-0.35)
    sun = np.array([0.5, 0.8, 0.33])
    _fresh_equal(r, space, cam, sun, budget=8)  # hybrid-vs-pure grazes


def test_hf_only_edit_patches_sky_pack(monkeypatch):
    """Flagship-mode (hf-only) editing keeps the sky-env machinery live:
    an hf-exact edit PATCHES the device sky pack (round 5 —
    skyline.patch_sky_levels; a full rebuild per edit cost ~2 s at
    flagship) and the next preview equals a from-scratch Renderer of
    the edited world bit-for-bit."""
    space = worldgen.generate(log2_size=6, verbose=False)
    monkeypatch.setattr(Renderer, "HF_FRAME_SIZE", 32)
    r = Renderer(space.serialize(), 48, 32, max_bounces=3, fog_steps=8,
                 seed=5)
    h0 = np.asarray(space.heights)
    cx, cz = np.unravel_index(np.argmax(h0[8:56, 8:56]), (48, 48))
    cx, cz = int(cx) + 8, int(cz) + 8
    top = int(h0[cx, cz])
    cam = vcam.Camera(pos=(cx - 14.0, top + 9.0, cz - 10.0),
                      yaw=0.65, pitch=-0.45)
    sun = np.array([0.5, 0.8, 0.33])
    img0 = r.preview_frame(cam, sun)
    assert img0 is not None and r._sky_env is not None
    assert r._sky_mips is not None

    e = (cx, top - 1, cz)
    space.set(e, None)
    r.apply_edits(space, edits=[e])
    assert getattr(space, "heights_exact", False)
    assert r._sky_mips is not None, "pack should be patched, not dropped"
    assert r._sky_env is None  # per-pose table must rebuild
    img1 = np.asarray(r.preview_frame(cam, sun))

    r2 = Renderer(space.serialize(), 48, 32, max_bounces=3, fog_steps=8,
                  seed=5)
    img2 = np.asarray(r2.preview_frame(cam, sun))
    assert (img1 == img2).all()


def test_hf_only_overhang_preview_env_resumed(monkeypatch):
    """Bounds-tracked (overhang) editing keeps the horizon envelope on
    the hybrid preview's pre-edit walk half (round 5): the envelope
    certifies air in exactly the pre-edit heightfield that walk casts
    against, so the resumed preview is bit-identical to the unresumed
    one."""
    space = worldgen.generate(log2_size=6, verbose=False)
    monkeypatch.setattr(Renderer, "HF_FRAME_SIZE", 32)
    r = Renderer(space.serialize(), 48, 32, max_bounces=3, fog_steps=8,
                 seed=5)
    h0 = np.asarray(space.heights)
    cx, cz = np.unravel_index(np.argmax(h0[8:56, 8:56]), (48, 48))
    cx, cz = int(cx) + 8, int(cz) + 8
    top = int(h0[cx, cz])
    cam = vcam.Camera(pos=(cx - 14.0, top + 9.0, cz - 10.0),
                      yaw=0.65, pitch=-0.45)
    sun = np.array([0.5, 0.8, 0.33])

    e = (cx, top + 3, cz)  # floating white block: bounds path
    space.set(e, (1.0, 1.0, 1.0))
    r.apply_edits(space, edits=[e])
    assert r._hf_bounds() is not None
    assert r._get_sky_env(cam) is not None, "env dropped on bounds edit"
    img_env = np.asarray(r.preview_frame(cam, sun))

    r2 = Renderer(space.serialize(), 48, 32, max_bounces=3, fog_steps=8,
                  seed=5)
    r2._edit_bounds = r._edit_bounds
    r2._dev = r._dev
    monkeypatch.setattr(
        type(r2), "_get_sky_env", lambda self, cam: None)
    img_plain = np.asarray(r2.preview_frame(cam, sun))
    assert (img_env == img_plain).all()
    # the placed emissive block must actually be visible somewhere
    assert img_env.max() > 0
