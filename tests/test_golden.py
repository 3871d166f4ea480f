"""Golden-image regression tests.

Deterministic renders (primary/shadow shading, and a fixed-seed
path-traced sample) of a fixed procedural world are compared against
committed golden arrays. Regenerate after *intentional* changes with:

    REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""

import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core import camera as vcam
from voxtracer.core.spectra import build_wl_to_rgb_lut
from voxtracer.kernels import shade
from voxtracer.kernels.integrator import render_sample
from voxtracer.world import worldgen

GOLDEN_DIR = Path(__file__).parent / "golden"
REGEN = os.environ.get("REGEN_GOLDEN") == "1"
W, H = 96, 56


@pytest.fixture(scope="module")
def scene():
    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    s = 64 / 8192
    cam = vcam.Camera(
        pos=tuple(np.asarray(vcam.DEFAULT_POSE.pos) * s),
        yaw=vcam.DEFAULT_POSE.yaw,
        pitch=vcam.DEFAULT_POSE.pitch,
    )
    sun = np.asarray([0.8, 10.2743, 3.7])
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    _, d = vcam.generate_rays(cam, W, H)
    return dev, table, root, cam, jnp.asarray(sun), d


def _compare(name, img, atol=2e-5):
    img = np.asarray(img)
    path = GOLDEN_DIR / f"{name}.npy"
    if REGEN or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.save(path, img)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    want = np.load(path)
    assert img.shape == want.shape
    mismatch = np.abs(img - want) > atol
    frac = mismatch.mean()
    assert frac < 1e-4, f"{name}: {frac:.2%} of values differ (max "\
        f"{np.abs(img - want).max():.3e})"


def test_golden_primary(scene):
    dev, table, root, cam, sun, d = scene
    img = shade.svo_primary_frame(table, root, dev.height,
                                  jnp.asarray(np.asarray(cam.pos, np.float32)),
                                  d, sun)
    _compare("primary_64w", img)


def test_golden_shadow(scene):
    dev, table, root, cam, sun, d = scene
    img = shade.svo_shadow_frame(table, root, dev.height,
                                 jnp.asarray(np.asarray(cam.pos, np.float32)),
                                 d, sun)
    _compare("shadow_64w", img)


def test_golden_path_sample(scene):
    """One fixed-seed path-traced sample; stochastic but deterministic
    given the seed, so still a valid regression anchor."""
    dev, table, root, cam, sun, d = scene
    lut = jnp.asarray(build_wl_to_rgb_lut(256))
    seed = jnp.asarray(np.array([101, 202, 303], np.uint32))
    img = render_sample(table, root, dev.height, lut,
                        np.asarray(cam.pos, np.float32), cam.basis(), sun,
                        seed, W, H, max_bounces=4, fog_steps=16)
    _compare("path_sample_64w", img, atol=1e-3)
