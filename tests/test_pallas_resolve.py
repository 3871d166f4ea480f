"""Bit-parity of the Pallas resolve fold (kernels/pallas/resolve.py,
interpret mode on CPU) against the XLA resolve scan inside
raster_cast — same candidates, same fold order, so every output field
must match exactly."""

import importlib
import os

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core import camera as vcam
from voxtracer.kernels.raster import pack_box_attr, raster_cast
from voxtracer.world import worldgen
from voxtracer.world.boxes import extract_boxes


@pytest.fixture(scope="module")
def world():
    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    dev = space.serialize()
    soup = extract_boxes(dev)
    return dev, (jnp.asarray(soup.lo), jnp.asarray(soup.size),
                 jnp.asarray(pack_box_attr(soup)))


def _flagged(on: bool):
    import voxtracer.kernels.raster as rmod

    rmod._PALLAS_RESOLVE = on
    return rmod


def test_resolve_fold_matches_xla_scan(world):
    dev, args = world
    s = 64 / 8192
    cam = vcam.Camera(pos=(800.2352 * s, 1511.8693 * s, 654.40125 * s),
                      yaw=-5.3800497, pitch=0.21999985)
    op = np.asarray(cam.pos, np.float32)
    basis = np.asarray(cam.basis(), np.float32)
    W, H = 96, 56
    rmod = _flagged(False)
    try:
        a = raster_cast(*args, op, basis, dev.height, W, H,
                        want_voxel=False)
        _flagged(True)
        b = raster_cast(*args, op, basis, dev.height, W, H,
                        want_voxel=False)
    finally:
        _flagged(os.environ.get("VOXT_PALLAS_RESOLVE", "0") == "1")
    for f in ("hit", "t", "normal", "rgb", "n_fallback"):
        np.testing.assert_array_equal(np.asarray(a[f]), np.asarray(b[f]),
                                      err_msg=f)


def test_resolve_fold_jittered_and_inside(world):
    """Jittered rays (PT primaries) and an inside-the-terrain camera
    (near/straddling boxes) through the Pallas fold, still bit-equal."""
    dev, args = world
    cam = vcam.Camera(pos=(30.0, 14.0, 30.0), yaw=1.1, pitch=0.2)
    op = np.asarray(cam.pos, np.float32)
    basis = np.asarray(cam.basis(), np.float32)
    W, H = 64, 48
    rng = np.random.default_rng(3)
    _, d = vcam.generate_rays(cam, W, H,
                              jitter=jnp.asarray(rng.random((H, W, 2),
                                                            np.float32)))
    rmod = _flagged(False)
    try:
        a = raster_cast(*args, op, basis, dev.height, W, H,
                        ray_dirs=d, want_voxel=False)
        _flagged(True)
        b = raster_cast(*args, op, basis, dev.height, W, H,
                        ray_dirs=d, want_voxel=False)
    finally:
        _flagged(os.environ.get("VOXT_PALLAS_RESOLVE", "0") == "1")
    for f in ("hit", "t", "normal", "rgb"):
        np.testing.assert_array_equal(np.asarray(a[f]), np.asarray(b[f]),
                                      err_msg=f)


def test_resolve_fold_k_batched(world):
    """The k-batched jitter resolve (R = KS*64 rays per tile, exact
    128-lane packing) through the Pallas fold, bit-equal to the XLA
    scan per sample."""
    dev, args = world
    cam = vcam.Camera(pos=(30.0, 34.0, 12.0), yaw=0.9, pitch=-0.3)
    op = np.asarray(cam.pos, np.float32)
    basis = np.asarray(cam.basis(), np.float32)
    W, H = 64, 48
    K = 4
    rng = np.random.default_rng(9)
    ds = jnp.stack([
        vcam.generate_rays(cam, W, H,
                           jitter=jnp.asarray(rng.random((H, W, 2),
                                                         np.float32)))[1]
        for _ in range(K)
    ])
    rmod = _flagged(False)
    try:
        a = raster_cast(*args, op, basis, dev.height, W, H,
                        ray_dirs=ds, want_voxel=False)
        _flagged(True)
        b = raster_cast(*args, op, basis, dev.height, W, H,
                        ray_dirs=ds, want_voxel=False)
    finally:
        _flagged(os.environ.get("VOXT_PALLAS_RESOLVE", "0") == "1")
    for f in ("hit", "t", "normal", "rgb"):
        np.testing.assert_array_equal(np.asarray(a[f]), np.asarray(b[f]),
                                      err_msg=f)


def test_resolve_fold_widen_rounds(world):
    """Starved first-pass budgets force the widen rounds (K up to 32+
    chunked) through the Pallas fold — still bit-equal to the XLA path,
    including the fallback bookkeeping the rounds feed."""
    dev, args = world
    s = 64 / 8192
    cam = vcam.Camera(pos=(800.2352 * s, 1511.8693 * s, 654.40125 * s),
                      yaw=-5.3800497, pitch=0.21999985)
    op = np.asarray(cam.pos, np.float32)
    basis = np.asarray(cam.basis(), np.float32)
    W, H = 96, 56
    kw = dict(cand_k=8, widen_k=40, widen2_k=72, widen3_k=8,
              want_voxel=False)
    rmod = _flagged(False)
    try:
        a = raster_cast(*args, op, basis, dev.height, W, H, **kw)
        _flagged(True)
        b = raster_cast(*args, op, basis, dev.height, W, H, **kw)
    finally:
        _flagged(os.environ.get("VOXT_PALLAS_RESOLVE", "0") == "1")
    assert int(np.asarray(a["n_widen"])[0]) > 0, "widen rounds unexercised"
    for f in ("hit", "t", "normal", "rgb", "n_fallback", "fb_need"):
        np.testing.assert_array_equal(np.asarray(a[f]), np.asarray(b[f]),
                                      err_msg=f)
