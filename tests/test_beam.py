"""Beam traversal vs per-ray traversal: exact parity on full frames,
including overflow fallback, inside-solid starts, and axis-aligned views."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core import camera as vcam
from voxtracer.kernels.beam import beam_primary_frame_cast, build_aug_table
from voxtracer.kernels.traverse import leaf_rgb, svo_raycast
from voxtracer.world.svo import from_dense


def _check(space, campos, yaw, pitch, K=64, W=64, H=40, graze_budget=0):
    """Beam result must equal per-ray traversal. ``graze_budget`` allows a
    bounded number of differing pixels for *degenerate* cameras (integer
    positions / axis-aligned views), where rays clip cell edges with
    ~1e-7-voxel chords and the two formulations legitimately tie-break
    differently (the reference's GPU/CPU pair diverges there too)."""
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    aug = jnp.asarray(build_aug_table(dev.table, dev.solid_leaf))
    cam = vcam.Camera(pos=campos, yaw=yaw, pitch=pitch)
    _, d = vcam.generate_rays(cam, W, H)
    op = np.asarray(campos, np.float32)
    rb = beam_primary_frame_cast(table, aug, root, dev.height, op, d, tile=8,
                                 K=K, bands=H // 8 if H % 8 == 0 else 1)
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


def test_beam_clutter_front_degenerate(clutter):
    # integer camera, axis-aligned view: bounded edge-graze divergence
    _check(clutter, (16.0, 16.0, -10.0), 0.0, 0.0, graze_budget=40)


def test_beam_clutter_front_generic(clutter):
    # generic (irrational) camera: exact parity required
    _check(clutter, (16.1234567, 16.0721311, -10.0412399), 0.0137, 0.0213)


def test_beam_clutter_oblique(clutter):
    _check(clutter, (-5.0, 40.0, -5.0), 0.7, 0.5)


def test_beam_inside_geometry(clutter):
    _check(clutter, (16.5, 16.5, 16.5), 0.3, -0.2)


def test_beam_overflow_fallback(clutter):
    # tiny K forces pauses/resumes on nearly every tile
    _check(clutter, (16.1234567, 16.0721311, -10.0412399), 0.0137, 0.0213, K=8)


def test_beam_solid_world_inside():
    n = 16
    solid = np.ones((n, n, n), bool)
    rgb = np.full((n, n, n, 3), 0.5, np.float32)
    _check(from_dense(solid, rgb), (8.31721, 8.30533, 8.29917), 0.1, 0.1)


def test_beam_axis_aligned_down():
    n = 32
    solid = np.zeros((n, n, n), bool)
    solid[:, :3, :] = True
    rgb = np.zeros((n, n, n, 3), np.float32)
    rgb[solid] = 0.5
    _check(from_dense(solid, rgb), (16.0717, 30.0213, 16.0531), 0.0,
           np.pi / 2 - 1e-4)


def test_beam_terrain_frame():
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    s = 64 / 8192
    _check(space,
           tuple(np.asarray(vcam.DEFAULT_POSE.pos) * s),
           vcam.DEFAULT_POSE.yaw, vcam.DEFAULT_POSE.pitch, W=96, H=56)


def test_solid_leaf_annotation():
    n = 16
    solid = np.ones((n, n, n), bool)
    rgb = np.full((n, n, n, 3), 0.5, np.float32)
    dev = from_dense(solid, rgb).serialize()
    # fully solid world: every live node's subtree is solid
    assert dev.solid_leaf[dev.root] >= 0
    # two-color world: the root must NOT be solid-uniform
    rgb2 = rgb.copy()
    rgb2[0, 0, 0] = (1.0, 0.0, 0.0)
    dev2 = from_dense(solid, rgb2).serialize()
    assert dev2.solid_leaf[dev2.root] == -1


def test_beam_shadow_frame_matches_shade(clutter):
    """Config-2 parity: beam-amortized shadows equal the per-ray path."""
    import jax.numpy as jnp
    from voxtracer.kernels import shade
    from voxtracer.kernels.beam import beam_shadow_frame

    dev = clutter.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    aug = jnp.asarray(build_aug_table(dev.table, dev.solid_leaf))
    cam = vcam.Camera(pos=(16.1234567, 40.0721311, -10.0412399),
                      yaw=0.0137, pitch=0.4213)
    _, d = vcam.generate_rays(cam, 64, 40)
    sun = jnp.asarray([0.3, 0.9, 0.2], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    op = np.asarray(cam.pos, np.float32)
    a = beam_shadow_frame(table, aug, root, dev.height, op, d, sun)
    b = shade.svo_shadow_frame(table, root, dev.height, jnp.asarray(op), d,
                               sun)
    aa, bb = np.asarray(a), np.asarray(b)
    frac = (~np.isclose(aa, bb, atol=1e-4)).mean()
    assert frac < 1e-3, f"{frac:.2%} differ"
