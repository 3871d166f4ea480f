"""Per-ray horizon envelope (skyline.build_skyline_env /
skyline_env_tmin): soundness and bit-identical frames.

The envelope claims, per ray, certified AIR up to the ladder distance
where its azimuth bin's monotone slope envelope reaches the ray's own
slope (and a provable all-terrain miss at the last rung). Attacked the
same way as the tile certificates (tests/test_skyline.py): the
t_min-resumed heightfield walk must equal the un-resumed walk
BIT-FOR-BIT on worldgen terrain and adversarial fields, and certified
all-miss rays must actually miss."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core import camera as vcam
from voxtracer.kernels.heightfield import (build_height_mips,
                                           hf_frame_cast, hf_raycast)
from voxtracer.kernels.skyline import (build_sky_mips, build_skyline_env,
                                       build_skyline_env_device,
                                       sky_levels_from_hf,
                                       skyline_env_tmin)
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
    # over-sample the horizon band (the envelope's whole point)
    d[: n // 2, 1] = rng.uniform(-0.15, 0.3, n // 2)
    d[: n // 2] /= np.linalg.norm(d[: n // 2], axis=-1, keepdims=True)
    return d.astype(np.float32)


def _env_args(env):
    return (jnp.asarray(env["E"]), env["d0"], env["g"], env["K"])


def _assert_sound(mips, sky_mips, origin, dirs, device_build=False):
    """The resumed walk must equal the plain walk bit-for-bit; returns
    the mean certified prefix fraction (diagnostic)."""
    flat, offs, h = mips
    if device_build:
        levels = sky_levels_from_hf(flat, offs, h)
        env = build_skyline_env_device(levels, origin)
    else:
        env = build_skyline_env(sky_mips, origin)
    E, d0, g, K = _env_args(env)
    tm = skyline_env_tmin(E, jnp.asarray(dirs), d0, g, K)
    o = jnp.asarray(origin, jnp.float32)
    a = hf_raycast(flat, offs, h, o, jnp.asarray(dirs))
    b = hf_raycast(flat, offs, h, o, jnp.asarray(dirs), t_min=tm)
    for k in a:
        assert (np.asarray(a[k]) == np.asarray(b[k])).all(), (
            f"{k} mismatch at origin={origin}"
        )
    # rung-K certificates (resume past world) must be real misses
    far = np.asarray(tm) >= 1e37
    hit = np.asarray(a["hit"])
    assert not (far & hit).any()
    return float((np.asarray(tm) > 0).mean())


def test_sound_and_useful_on_terrain(world):
    heights, mips, sky_mips = world
    rng = np.random.default_rng(21)
    n = 1 << LOG2
    dirs = _rand_dirs(rng, 4096)
    hi = float(heights.max())
    frac_high = _assert_sound(mips, sky_mips,
                              (0.6 * n, hi + 9.0, 0.3 * n), dirs)
    assert frac_high > 0.3  # above every peak: up-ish rays certify
    frac_mid = _assert_sound(mips, sky_mips,
                             (0.22 * n, hi * 0.7, 0.81 * n), dirs)
    assert frac_mid > 0.05
    _assert_sound(mips, sky_mips, (-0.4 * n, hi + 20.0, 1.5 * n), dirs)
    _assert_sound(mips, sky_mips, (3.0 * n, hi * 0.5, -2.0 * n), dirs)


def test_sound_adversarial_fields():
    rng = np.random.default_rng(8)
    n = 64
    spike = np.zeros((n, n), np.float32)
    spike[17, 23] = n - 1
    spike[48, 9] = n / 2 + 0.49
    wall = np.zeros((n, n), np.float32)
    wall[:, 31] = n - 2
    checker = ((np.indices((n, n)).sum(0) % 2) * (n // 2)
               ).astype(np.float32)
    dirs = _rand_dirs(rng, 2048)
    for hf in (spike, wall, checker):
        mips = build_height_mips(hf)
        sky_mips = build_sky_mips(hf)
        for origin in (
                (0.4 * n, n + 3.0, 0.52 * n),
                (0.9 * n, n * 0.6, 0.1 * n),
                (23.5, float(np.ceil(spike[17, 23])) + 0.2, 17.5),
                (31.6, 1.5, 30.2),
                (17.5, 3.0, 23.5),
        ):
            _assert_sound(mips, sky_mips, origin, dirs)


def test_vertical_and_degenerate_dirs():
    n = 64
    hf = np.full((n, n), 5.0, np.float32)
    sky_mips = build_sky_mips(hf)
    env = build_skyline_env(sky_mips, (20.5, 30.0, 20.5))
    E, d0, g, K = _env_args(env)
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    tm = np.asarray(skyline_env_tmin(E, d, d0, g, K))
    assert tm[0] >= 1e37    # straight up over flat ground: all-miss
    assert tm[1] == 0.0     # straight down: nothing certifies
    # origin below its own column top: up must NOT fully certify
    env_in = build_skyline_env(sky_mips, (20.5, 2.0, 20.5))
    E2, d0, g, K = _env_args(env_in)
    tm2 = np.asarray(skyline_env_tmin(
        E2, d[:1], d0, g, K))
    assert tm2[0] < 1e37


def test_device_build_sound_on_terrain(world):
    """The jnp on-device envelope build (round 5 — kills the per-pose
    host build so the envelope pays on fly-through poses) must satisfy
    the SAME soundness contract as the host build: t_min-resumed walks
    bit-equal plain walks, all-miss certificates are real misses."""
    heights, mips, sky_mips = world
    rng = np.random.default_rng(77)
    n = 1 << LOG2
    dirs = _rand_dirs(rng, 4096)
    hi = float(heights.max())
    frac = _assert_sound(mips, sky_mips, (0.6 * n, hi + 9.0, 0.3 * n),
                         dirs, device_build=True)
    assert frac > 0.3  # must also be USEFUL, not trivially zero
    _assert_sound(mips, sky_mips, (0.22 * n, hi * 0.7, 0.81 * n), dirs,
                  device_build=True)
    _assert_sound(mips, sky_mips, (-0.4 * n, hi + 20.0, 1.5 * n), dirs,
                  device_build=True)
    _assert_sound(mips, sky_mips, (3.0 * n, hi * 0.5, -2.0 * n), dirs,
                  device_build=True)


def test_device_build_sound_adversarial():
    """Adversarial fields incl. FRACTIONAL heights (the device build
    must re-ceil level 0: hf rows carry exact heights, and a fractional
    column's solid top is ceil(h))."""
    rng = np.random.default_rng(9)
    n = 64
    spike = np.zeros((n, n), np.float32)
    spike[17, 23] = n - 1
    spike[48, 9] = n / 2 + 0.49
    wall = np.zeros((n, n), np.float32)
    wall[:, 31] = n - 2
    dirs = _rand_dirs(rng, 2048)
    for hf in (spike, wall):
        mips = build_height_mips(hf)
        sky_mips = build_sky_mips(hf)
        for origin in (
                (0.4 * n, n + 3.0, 0.52 * n),
                (0.9 * n, n * 0.6, 0.1 * n),
                (23.5, float(np.ceil(spike[17, 23])) + 0.2, 17.5),
                (9.6, n / 2 + 0.6, 48.2),  # just above the .49 spike
                (17.5, 3.0, 23.5),
        ):
            _assert_sound(mips, sky_mips, origin, dirs,
                          device_build=True)


def test_device_build_close_to_host(world):
    """Diagnostic tightness pin: the device table may differ from the
    host table (f32 vs f64 sweep) but must stay a near-superset — the
    device envelope at each (bin, rung) is allowed above the host value
    (extra conservatism) only by a sliver, and below it only by f32
    rounding slack. Catches gross regressions (e.g. a mis-windowed
    level) that soundness fuzzing alone might miss."""
    heights, mips, sky_mips = world
    flat, offs, h = mips
    n = 1 << LOG2
    origin = (0.37 * n, float(heights.max()) * 0.8, 0.61 * n)
    host = build_skyline_env(sky_mips, origin)
    dev = build_skyline_env_device(sky_levels_from_hf(flat, offs, h),
                                   origin)
    assert host["g"] == pytest.approx(dev["g"], rel=1e-12)
    Eh = np.asarray(host["E"], np.float64)
    Ed = np.asarray(dev["E"], np.float64)
    fin = (Eh > -1e38) & (Ed > -1e38) & np.isfinite(Eh) & np.isfinite(Ed)
    assert ((Eh > -1e38) == (Ed > -1e38)).mean() > 0.999
    scale = np.maximum(np.abs(Eh[fin]), 1e-3)
    rel = np.abs(Ed[fin] - Eh[fin]) / scale
    # ~3% of entries sit above the host table: the device build's
    # rounding guards (rung eps, width-class eps) each bump boundary
    # cells one step MORE conservative, and the bumped cell's bound
    # then dominates extra bins/rungs. That is by design; what must
    # hold is (a) the tables mostly agree and (b) the device table
    # NEVER falls below the host's by more than f32 rounding —
    # below-host entries would certify air the host build would not.
    assert (rel < 1e-3).mean() > 0.9
    assert (Ed[fin] >= Eh[fin] - 1e-3 * scale).all()


def test_patch_sky_levels_matches_rebuild(world):
    """Incremental sky-pack patch after hf-exact edits == full rebuild,
    bit-for-bit (same max chains over the same patched rows)."""
    from voxtracer.kernels.heightfield import patch_height_mips
    from voxtracer.kernels.skyline import (patch_sky_levels,
                                           sky_levels_from_hf)

    heights, (flat, offs, h), _ = world
    pack = sky_levels_from_hf(flat, offs, h)
    h2 = np.array(heights).astype(np.int64)
    cols = [(5, 9), (41, 33), (41, 34), (63, 0)]
    for i, (x, z) in enumerate(cols):
        h2[x, z] = max(int(h2[x, z]) + (3 if i % 2 == 0 else -1), 0)
    flat2 = patch_height_mips(flat, offs, h, h2, cols)
    p2 = patch_sky_levels(pack, flat2, cols)
    full = sky_levels_from_hf(flat2, offs, h)
    assert len(p2["coarse"]) == len(full["coarse"])
    for a, b in zip(p2["coarse"], full["coarse"]):
        assert (np.asarray(a) == np.asarray(b)).all()
    # >16 columns falls back to the full rebuild path
    many = [(i, i) for i in range(20)]
    flat3 = patch_height_mips(flat2, offs, h, h2, many)
    p3 = patch_sky_levels(p2, flat3, many)
    full3 = sky_levels_from_hf(flat3, offs, h)
    for a, b in zip(p3["coarse"], full3["coarse"]):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_env_frame_bit_identical(world):
    heights, (flat, offs, h), sky_mips = world
    from voxtracer.kernels.conemarch import build_cone_mips

    cone = build_cone_mips(heights)
    n = 1 << LOG2
    W, H = 48, 32
    trgb = (0.3, 0.62, 0.24)
    rng = np.random.default_rng(5)
    for pose in (vcam.Camera(pos=(0.62 * n, float(heights.max()) + 5.0,
                                  0.35 * n), yaw=2.2, pitch=0.2),
                 vcam.Camera(pos=(0.5 * n, float(heights.max()) * 0.8,
                                  0.5 * n), yaw=-0.7, pitch=0.05)):
        op = np.asarray(pose.pos, np.float32)
        env = _env_args(build_skyline_env(sky_mips, op))
        a = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb)
        for kw in (dict(sky_env=env), dict(sky_env=env, cone=cone)):
            b = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H,
                              trgb, **kw)
            for k in a:
                assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k
        # jittered dirs (PT primaries): the per-ray test sees the
        # actual jittered direction, so it stays exact by construction
        jit = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
        py, px = vcam.pixel_grid(W, H)
        ld = vcam.pixel_ndc(px, py, W, H)
        d = vcam.ray_directions(pose.basis(), ld, jitter=jit, height=H)
        a = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb,
                          ray_dirs=d)
        b = hf_frame_cast(flat, offs, h, op, pose.basis(), W, H, trgb,
                          ray_dirs=d, sky_env=env, cone=cone)
        for k in a:
            assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k
