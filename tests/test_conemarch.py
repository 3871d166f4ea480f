"""Cone-march prefix (kernels/conemarch.py): certificate soundness and
bit-identical prefixed frames.

The certificate claims every bundle ray is strictly in air on [0, S]
of the shared unnormalized parameterization — attacked here by brute
force (dense direction sampling inside the bundle box, cast against
the canonical traversal), plus adversarial heightfields (spikes,
walls) the dilation must absorb. Frame-level: hf_frame_cast(cone=...)
must equal the unprefixed cast BIT-FOR-BIT (the t_min resume re-enters
the walk's own arithmetic, tests/test_heightfield.py
test_t_min_resume_exact)."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core import camera as vcam
from voxtracer.kernels.conemarch import (build_cone_mips, cone_prefix,
                                         frame_tile_bundles)
from voxtracer.kernels.heightfield import (build_height_mips,
                                           hf_frame_cast, hf_raycast)
from voxtracer.world import worldgen

LOG2 = 6


@pytest.fixture(scope="module")
def world():
    space = worldgen.generate(log2_size=LOG2, verbose=False)
    heights = np.asarray(space.heights)
    mips = build_height_mips(heights)
    cone = build_cone_mips(heights)
    return heights, mips, cone


def _rand_bundles(rng, n, spread):
    dc = rng.standard_normal((n, 3)).astype(np.float32)
    dc /= np.linalg.norm(dc, axis=-1, keepdims=True)
    sig = rng.uniform(0.0, spread, (n, 3)).astype(np.float32)
    return jnp.asarray(dc), jnp.asarray(sig)


def _check_sound(heights, cone, origin, dc, sig, samples=24, seed=0):
    """Every sampled in-box direction must stay in air on [0, S]."""
    flat, offs, h = build_height_mips(heights)
    S = np.asarray(cone_prefix(cone[0], cone[1], cone[2], h,
                               jnp.asarray(origin, jnp.float32), dc, sig))
    rng = np.random.default_rng(seed)
    B = dc.shape[0]
    dcn = np.asarray(dc)
    sign = np.asarray(sig)
    # corners + random interior points of each bundle's direction box
    u = rng.uniform(-1.0, 1.0, (samples, B, 3)).astype(np.float32)
    u[:8] = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        np.float32)[:, None, :]
    ds = dcn[None] + u * sign[None]
    r = hf_raycast(flat, offs, h, jnp.asarray(origin, jnp.float32),
                   jnp.asarray(ds.reshape(-1, 3)))
    hit = np.asarray(r["hit"]).reshape(samples, B)
    t = np.asarray(r["t"]).reshape(samples, B)
    bad = hit & (t <= S[None, :]) & (S[None, :] > 0)
    assert not bad.any(), (
        f"certificate violated for {int(bad.sum())} sampled rays; "
        f"worst S={S[bad.any(0)][:4]} t={t[bad][:4]}"
    )
    return S


def test_sound_random_bundles(world):
    heights, _, cone = world
    rng = np.random.default_rng(11)
    n = 1 << LOG2
    dc, sig = _rand_bundles(rng, 512, 0.02)
    # above-terrain cameras must certify SOMETHING; the low camera
    # (below neighboring peaks) legitimately certifies nothing — from
    # s=0 any bundle ray could hit a dilated-neighborhood column, so
    # S=0 everywhere is the CORRECT conservative answer there and the
    # origin stays as a soundness-only probe.
    for origin, expect_progress in (
            ((0.6 * n, heights.max() + 9.0, 0.3 * n), True),
            ((0.21 * n, heights.max() * 0.7, 0.83 * n), False),
            ((-0.4 * n, heights.max() + 30.0, 1.5 * n), True)):
        S = _check_sound(heights, cone, origin, dc, sig, seed=3)
        if expect_progress:
            assert (S > 0).any()


def test_sound_adversarial_heightfields():
    """Spike/wall/checker fields: the dilation and per-step margins
    must absorb single-column hazards and axis-aligned cliffs."""
    rng = np.random.default_rng(5)
    n = 64
    fields = []
    spike = np.zeros((n, n), np.int32)
    spike[17, 23] = n - 1
    spike[48, 9] = n // 2
    fields.append(spike)
    wall = np.zeros((n, n), np.int32)
    wall[:, 31] = n - 2
    fields.append(wall)
    checker = ((np.indices((n, n)).sum(0) % 2) * (n // 2)).astype(np.int32)
    fields.append(checker)
    stairs = np.clip(np.arange(n)[:, None] // 2, 0, n - 1
                     ).astype(np.int32) * np.ones((1, n), np.int32)
    fields.append(stairs)
    dc, sig = _rand_bundles(rng, 256, 0.05)
    for hf in fields:
        cone = build_cone_mips(hf)
        for origin in ((0.4 * n, n + 3.0, 0.52 * n),
                       (0.9 * n, n * 0.6, 0.1 * n)):
            _check_sound(hf, cone, origin, dc, sig, seed=7)


def test_prefixed_frame_bit_identical(world):
    heights, (flat, offs, h), cone = world
    n = 1 << LOG2
    W, H = 48, 32
    trgb = (0.3, 0.62, 0.24)
    for pose in (vcam.Camera(pos=(0.62 * n, float(heights.max()) + 5.0,
                                  0.35 * n), yaw=2.2, pitch=-0.3),
                 vcam.Camera(pos=(0.5 * n, float(heights.max()) * 0.8,
                                  0.5 * n), yaw=-0.7, pitch=0.05)):
        op = np.asarray(pose.pos, np.float32)
        a = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb)
        b = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb,
                          cone=cone)
        for k in a:
            assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k

    # jittered dirs (the PT-primaries entry): the half-pixel pad in the
    # bundles must cover every jitter draw
    pose = vcam.Camera(pos=(0.62 * n, float(heights.max()) + 5.0,
                            0.35 * n), yaw=2.2, pitch=-0.3)
    rng = np.random.default_rng(2)
    jit = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
    py, px = vcam.pixel_grid(W, H)
    ld = vcam.pixel_ndc(px, py, W, H)
    d = vcam.ray_directions(pose.basis(), ld, jitter=jit, height=H)
    op = np.asarray(pose.pos, np.float32)
    a = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb,
                      ray_dirs=d)
    b = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb,
                      ray_dirs=d, cone=cone)
    for k in a:
        assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k


def test_bundle_boxes_bound_pixel_dirs(world):
    """frame_tile_bundles' boxes must contain every pixel's and every
    jittered ray's UNNORMALIZED direction, and nmin must lower-bound
    the unnormalized norms (the S -> t_min conversion)."""
    W, H = 52, 36
    cam = vcam.Camera(pos=(3.0, 9.0, 4.0), yaw=0.9, pitch=-0.4)
    basis = np.asarray(cam.basis(), np.float32)
    dc, sig, nmin = (np.asarray(x) for x in
                     frame_tile_bundles(basis, W, H, tile=8))
    rng = np.random.default_rng(8)
    ty, tx = -(-H // 8), -(-W // 8)
    for _ in range(400):
        x = rng.integers(0, W)
        y = rng.integers(0, H)
        jx, jy = rng.uniform(-0.5, 0.5, 2)
        lx = (2.0 * (x + 0.5 + jx) - W) / H
        ly = (2.0 * (y + 0.5 + jy) - H) / H
        du = np.array([lx, -ly, 1.0], np.float32) @ basis.T
        t = (y // 8) * tx + (x // 8)
        assert (np.abs(du - dc[t]) <= sig[t] + 1e-6).all(), (x, y)
        assert np.linalg.norm(du) >= nmin[t] - 1e-6
