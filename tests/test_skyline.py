"""Skyline horizon certificates (kernels/skyline.py): soundness and
bit-identical frames.

The certificate claims a certified ray/tile provably misses EVERY
terrain column — attacked by brute force (cast certified rays with the
heightfield walk and demand universal miss) on worldgen terrain and
adversarial fields (spikes, walls, origin-adjacent cliffs, origins
inside solid and outside the grid). Frame-level: hf_frame_cast(sky=...)
must equal the plain cast BIT-FOR-BIT, alone and composed with the
cone-march prefix."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core import camera as vcam
from voxtracer.kernels.heightfield import (build_height_mips,
                                           hf_frame_cast, hf_raycast)
from voxtracer.kernels.skyline import (build_sky_mips, build_skyline,
                                       rays_sky, tile_sky)
from voxtracer.world import worldgen

LOG2 = 6


@pytest.fixture(scope="module")
def world():
    space = worldgen.generate(log2_size=LOG2, verbose=False)
    heights = np.asarray(space.heights)
    return heights, build_height_mips(heights), build_sky_mips(heights)


def _rand_dirs(rng, n):
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # over-sample the horizon band (the certificate's hard region)
    d[: n // 2, 1] = rng.uniform(-0.15, 0.3, n // 2)
    d[: n // 2] /= np.linalg.norm(d[: n // 2], axis=-1, keepdims=True)
    return d.astype(np.float32)


def _assert_sound(heights, mips, sky_mips, origin, dirs):
    """No certified ray may hit; returns the certified fraction."""
    flat, offs, h = mips
    sky = build_skyline(sky_mips, origin)
    cert = rays_sky(sky, dirs)
    r = hf_raycast(flat, offs, h, jnp.asarray(origin, jnp.float32),
                   jnp.asarray(dirs))
    hit = np.asarray(r["hit"])
    bad = cert & hit
    assert not bad.any(), (
        f"{int(bad.sum())} certified rays hit; origin={origin}, "
        f"first dir={dirs[bad][0] if bad.any() else None}"
    )
    return float(cert.mean())


def test_sound_and_useful_on_terrain(world):
    heights, mips, sky_mips = world
    rng = np.random.default_rng(17)
    n = 1 << LOG2
    dirs = _rand_dirs(rng, 4096)
    hi = float(heights.max())
    frac_high = _assert_sound(heights, mips, sky_mips,
                              (0.6 * n, hi + 9.0, 0.3 * n), dirs)
    # camera above every peak: everything pointing up-ish must certify
    assert frac_high > 0.3
    # mid-height camera: soundness plus SOME certification (up rays)
    frac_mid = _assert_sound(heights, mips, sky_mips,
                             (0.22 * n, hi * 0.7, 0.81 * n), dirs)
    assert frac_mid > 0.05
    # outside-grid origins (above and far to the side)
    _assert_sound(heights, mips, sky_mips, (-0.4 * n, hi + 20.0, 1.5 * n),
                  dirs)
    _assert_sound(heights, mips, sky_mips, (3.0 * n, hi * 0.5, -2.0 * n),
                  dirs)


def test_sound_adversarial_fields():
    rng = np.random.default_rng(4)
    n = 64
    spike = np.zeros((n, n), np.float32)
    spike[17, 23] = n - 1
    spike[48, 9] = n / 2 + 0.49  # fractional: top is ceil(h)
    wall = np.zeros((n, n), np.float32)
    wall[:, 31] = n - 2
    checker = ((np.indices((n, n)).sum(0) % 2) * (n // 2)
               ).astype(np.float32)
    dirs = _rand_dirs(rng, 2048)
    for hf in (spike, wall, checker):
        mips = build_height_mips(hf)
        sky_mips = build_sky_mips(hf)
        for origin in (
                (0.4 * n, n + 3.0, 0.52 * n),     # above all
                (0.9 * n, n * 0.6, 0.1 * n),      # mid height
                (23.5, float(np.ceil(spike[17, 23])) + 0.2, 17.5),
                (31.6, 1.5, 30.2),                # beside the wall
                (17.5, 3.0, 23.5),                # inside spike column
        ):
            _assert_sound(hf, mips, sky_mips, origin, dirs)


def test_vertical_rays():
    """Straight-up rays certify iff nothing stands at/above the origin
    in their own column's bins; straight-down never certifies over
    terrain."""
    n = 64
    hf = np.full((n, n), 5.0, np.float32)
    sky_mips = build_sky_mips(hf)
    up = np.array([[0.0, 1.0, 0.0]], np.float32)
    down = -up
    sky_air = build_skyline(sky_mips, (20.5, 30.0, 20.5))
    assert rays_sky(sky_air, up)[0]
    assert not rays_sky(sky_air, down)[0]
    # origin below its own column top: up must NOT certify
    sky_in = build_skyline(sky_mips, (20.5, 2.0, 20.5))
    assert not rays_sky(sky_in, up)[0]


def test_tile_sky_sound_per_pixel(world):
    """Every pixel of a certified tile — with jitter — must miss."""
    heights, (flat, offs, h), sky_mips = world
    n = 1 << LOG2
    W, H = 64, 48
    rng = np.random.default_rng(9)
    for pose in (vcam.Camera(pos=(0.6 * n, float(heights.max()) + 6.0,
                                  0.4 * n), yaw=1.1, pitch=0.15),
                 vcam.Camera(pos=(0.3 * n, float(heights.max()) * 0.9,
                                  0.7 * n), yaw=-2.0, pitch=-0.05)):
        op = np.asarray(pose.pos, np.float32)
        sky = build_skyline(sky_mips, op)
        mask = tile_sky(sky, np.asarray(pose.basis(), np.float32), W, H)
        assert mask.shape == (-(-H // 8) * -(-W // 8),)
        jit = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
        py, px = vcam.pixel_grid(W, H)
        ld = vcam.pixel_ndc(px, py, W, H)
        d = vcam.ray_directions(pose.basis(), ld, jitter=jit, height=H)
        r = hf_raycast(flat, offs, h, jnp.asarray(op),
                       jnp.asarray(d).reshape(-1, 3))
        hit = np.asarray(r["hit"]).reshape(H, W)
        tx = -(-W // 8)
        tm = np.repeat(np.repeat(mask.reshape(-1, tx), 8, 0), 8, 1)
        bad = hit & tm[:H, :W]
        assert not bad.any(), f"{int(bad.sum())} hits in certified tiles"
        # the high pose looks up-ish: some tiles must certify
        if pose.pitch > 0:
            assert mask.any()


def test_sky_frame_bit_identical(world):
    heights, (flat, offs, h), sky_mips = world
    from voxtracer.kernels.conemarch import build_cone_mips

    cone = build_cone_mips(heights)
    n = 1 << LOG2
    W, H = 48, 32
    trgb = (0.3, 0.62, 0.24)
    rng = np.random.default_rng(3)
    for pose in (vcam.Camera(pos=(0.62 * n, float(heights.max()) + 5.0,
                                  0.35 * n), yaw=2.2, pitch=0.2),
                 vcam.Camera(pos=(0.5 * n, float(heights.max()) * 0.8,
                                  0.5 * n), yaw=-0.7, pitch=0.05)):
        op = np.asarray(pose.pos, np.float32)
        sky = build_skyline(sky_mips, op)
        a = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb)
        for kw in (dict(sky=sky), dict(sky=sky, cone=cone)):
            b = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H,
                              trgb, **kw)
            for k in a:
                assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k
        # jittered dirs (PT primaries)
        jit = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
        py, px = vcam.pixel_grid(W, H)
        ld = vcam.pixel_ndc(px, py, W, H)
        d = vcam.ray_directions(pose.basis(), ld, jitter=jit, height=H)
        a = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb,
                          ray_dirs=d)
        b = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb,
                          ray_dirs=d, sky=sky, cone=cone)
        for k in a:
            assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k
