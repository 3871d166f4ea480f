"""Checkpoint/resume: a resumed render must continue bit-identically."""

import numpy as np
import pytest

from voxtracer.core import camera as vcam
from voxtracer.render import checkpoint
from voxtracer.render.driver import Renderer
from voxtracer.world.svo import from_dense


@pytest.fixture(scope="module")
def world():
    n = 16
    solid = np.zeros((n, n, n), bool)
    solid[:, :2, :] = True
    rgb = np.zeros((n, n, n, 3), np.float32)
    rgb[solid] = 0.5
    return from_dense(solid, rgb)


def test_resume_bit_identical(world, tmp_path):
    cam = vcam.Camera(pos=(8.0, 6.0, 8.0), yaw=0.3, pitch=0.4)
    sun = np.array([0.3, 1.0, 0.2])
    kw = dict(max_bounces=2, fog_steps=8, seed=42)

    # reference run: 4 samples straight through
    r_ref = Renderer(world.serialize(), 24, 16, **kw)
    for _ in range(4):
        r_ref.sample(cam, sun)

    # checkpointed run: 2 samples, save, load, 2 more
    r1 = Renderer(world.serialize(), 24, 16, **kw)
    for _ in range(2):
        r1.sample(cam, sun)
    ckpt = tmp_path / "state.npz"
    checkpoint.save_render_state(ckpt, r1, cam, sun)
    r2, cam2, sun2 = checkpoint.load_render_state(ckpt)
    assert r2.acc.samples == 2
    for _ in range(2):
        r2.sample(cam2, sun2)

    assert r_ref.acc.samples == r2.acc.samples == 4
    assert np.array_equal(np.asarray(r_ref.acc.buffer),
                          np.asarray(r2.acc.buffer))


def test_world_roundtrip(world, tmp_path):
    p = tmp_path / "world.npz"
    checkpoint.save_world(p, world)
    dev = checkpoint.load_world_device(p)
    orig = world.serialize()
    assert np.array_equal(dev.table, orig.table)
    assert dev.root == orig.root and dev.height == orig.height
    # solid_leaf must survive the round trip (beam engine aug source)
    assert dev.solid_leaf is not None
    assert np.array_equal(dev.solid_leaf, orig.solid_leaf)


def test_resume_keeps_solid_leaf(world, tmp_path):
    """A resumed renderer must retain solid_leaf so the beam engine stays
    available after resume (round-1 regression: DeviceSvo was rebuilt
    without it)."""
    cam = vcam.Camera(pos=(8.0, 6.0, 8.0), yaw=0.3, pitch=0.4)
    sun = np.array([0.3, 1.0, 0.2])
    r1 = Renderer(world.serialize(), 24, 16, max_bounces=2, fog_steps=8,
                  seed=7)
    r1.sample(cam, sun)
    p = tmp_path / "state.npz"
    checkpoint.save_render_state(p, r1, cam, sun)
    r2, _, _ = checkpoint.load_render_state(p)
    assert r2.solid_leaf is not None
    assert np.array_equal(np.asarray(r2.solid_leaf),
                          np.asarray(r1.solid_leaf))
