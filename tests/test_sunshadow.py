"""Soundness of the conservative sun-visibility maps
(kernels/sunshadow.py) against the exact heightfield cast.

The module's contract: origins it claims lit produce NO hf_raycast hit
for ANY direction in the sun cone. The fuzz casts adversarial cone
members (the exact-boundary ring plus random interior) from
adversarial origins (top faces, side faces, fog points, f32-perturbed
and voxel-corner positions) and demands ZERO violations — the
integrator relies on bit-identical occlusion booleans, not
approximate ones.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.core.sampling import SUN_ANGULAR_RADIUS
from voxtracer.kernels import sunshadow
from voxtracer.kernels.heightfield import build_height_mips, hf_raycast

N = 64
LOG2 = 6


def _heightmaps(rng):
    """Adversarial terrain profiles (integer heights, 1..top)."""
    # rough iid terrain: every column a local surprise
    rough = rng.integers(1, 40, size=(N, N))
    # sparse tall spikes over a low floor: long-range occlusion
    spikes = np.full((N, N), 2, np.int64)
    ii = rng.integers(0, N, size=40)
    jj = rng.integers(0, N, size=40)
    spikes[ii, jj] = rng.integers(30, 60, size=40)
    # smooth ridge: correlated relief (sums of shifted sines)
    x = np.arange(N)
    ridge = (
        10.0 * np.sin(x[:, None] * 0.19)
        + 7.0 * np.sin(x[None, :] * 0.11 + 1.3)
        + 4.0 * np.sin((x[:, None] + 2 * x[None, :]) * 0.05)
    )
    ridge = np.maximum(1, (ridge - ridge.min() + 1).astype(np.int64))
    return {"rough": rough, "spikes": spikes, "ridge": ridge}


def _suns():
    """Elevations from just-above-gate to near-vertical, varied
    bearings (axis-aligned, diagonal, odd angles, all sign quadrants)."""
    out = []
    for elev, bear in [
        (0.06, 0.0),
        (0.15, 2.37),
        (0.30, 0.65),
        (0.55, math.pi / 4),
        (0.80, math.pi / 2),
        (1.10, 3.80),
        (1.30, 5.50),
    ]:
        c, s = math.cos(elev), math.sin(elev)
        out.append(
            np.array([c * math.cos(bear), s, c * math.sin(bear)], np.float64)
        )
    return out


def _cone_dirs(sun, rng, n_ring=16, n_rand=24):
    """Exact-boundary ring + random interior cone members (f64 built,
    f32 cast — same wobble class as sampling.sample_sun)."""
    sun = sun / np.linalg.norm(sun)
    a = np.array([0.0, 0.0, 1.0]) if abs(sun[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    e1 = np.cross(sun, a)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(sun, e1)
    cone = SUN_ANGULAR_RADIUS
    phis = np.linspace(0.0, 2 * math.pi, n_ring, endpoint=False)
    ring = (
        math.cos(cone) * sun[None, :]
        + math.sin(cone)
        * (np.cos(phis)[:, None] * e1[None, :] + np.sin(phis)[:, None] * e2[None, :])
    )
    th = np.sqrt(rng.random(n_rand)) * cone
    ph = rng.random(n_rand) * 2 * math.pi
    rnd = (
        np.cos(th)[:, None] * sun[None, :]
        + (np.sin(th) * np.cos(ph))[:, None] * e1[None, :]
        + (np.sin(th) * np.sin(ph))[:, None] * e2[None, :]
    )
    return np.concatenate([sun[None, :], ring, rnd], 0).astype(np.float32)


def _origins(h, rng, m=900):
    """Adversarial origins: top faces (exact and f32-nudged), side
    faces, fog points, voxel-corner grazes."""
    n = h.shape[0]
    ii = rng.integers(0, n, size=m)
    jj = rng.integers(0, n, size=m)
    hh = h[ii, jj].astype(np.float64)
    fx = rng.random(m)
    fz = rng.random(m)
    kind = rng.integers(0, 6, size=m)
    x = ii + fx
    z = jj + fz
    y = hh.copy()  # kind 0: exactly on the top face
    y = np.where(kind == 1, np.nextafter(hh.astype(np.float32), -np.inf), y)
    y = np.where(kind == 2, np.nextafter(hh.astype(np.float32), np.inf), y)
    y = np.where(kind == 3, hh - rng.random(m) * 3.0, y)  # side/inside
    y = np.where(kind == 4, hh + rng.random(m) * 6.0, y)  # fog/air
    # kind 5: voxel-corner graze — integer x/z boundary, y a hair under
    # an integer plane (the own-column crossing edge case)
    x = np.where(kind == 5, ii.astype(np.float64), x)
    y = np.where(
        kind == 5,
        np.nextafter(np.minimum(hh, np.ceil(hh - 0.5)).astype(np.float32), -np.inf),
        y,
    )
    pos = np.stack([x, y, z], -1).astype(np.float32)
    return pos


@pytest.mark.parametrize("terrain", ["rough", "spikes", "ridge"])
def test_claimed_lit_never_hits(terrain):
    rng = np.random.default_rng(hash(terrain) & 0xFFFF)
    h = _heightmaps(rng)[terrain]
    flat, offs, hh = build_height_mips(h)
    checked = 0
    for sun in _suns():
        maps = sunshadow.build(h, sun)
        if maps is None:
            continue
        dmaps = dict(maps, t_near=jnp.asarray(maps["t_near"]),
                     t_far=jnp.asarray(maps["t_far"]))
        pos = _origins(h, rng)
        lit = np.asarray(sunshadow.sun_clear(dmaps, jnp.asarray(pos)))
        if not lit.any():
            continue
        p = pos[lit]
        dirs = _cone_dirs(sun, rng)
        k = dirs.shape[0]
        pp = np.repeat(p, k, axis=0)
        dd = np.tile(dirs, (p.shape[0], 1))
        res = hf_raycast(flat, offs, LOG2, jnp.asarray(pp), jnp.asarray(dd))
        hits = np.asarray(res["hit"])
        assert not hits.any(), (
            f"sun {sun}: {int(hits.sum())} cone casts hit from "
            f"claimed-lit origins; first origin "
            f"{pp[np.argmax(hits)]}, dir {dd[np.argmax(hits)]}"
        )
        checked += int(lit.sum())
    assert checked > 200, f"fuzz vacuous: only {checked} lit origins checked"


def test_effectiveness_on_terrain():
    """Guard against a sound-but-vacuous map: on real worldgen terrain
    with a mid-day sun, a solid fraction of top-face origins must be
    provably lit (these are the lanes whose walk the integrator
    skips)."""
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=LOG2, verbose=False)
    h = space.heights
    sun = np.array([0.5, 0.8, 0.33])
    maps = sunshadow.build(h, sun)
    assert maps is not None
    dmaps = dict(maps, t_near=jnp.asarray(maps["t_near"]),
                 t_far=jnp.asarray(maps["t_far"]))
    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    pos = np.stack(
        [ii.ravel() + 0.5, h[ii, jj].ravel().astype(np.float64), jj.ravel() + 0.5],
        -1,
    ).astype(np.float32)
    lit = np.asarray(sunshadow.sun_clear(dmaps, jnp.asarray(pos)))
    frac = lit.mean()
    # measured 9.2% here (64^3 worldgen, elev ~0.93) and ~12% on the
    # 1024^3 bench world vs a ~28% exact-visibility ceiling — the gap
    # is the conservative per-(sub)column information limit. The floor
    # guards regressions, not aspirations.
    assert frac > 0.05, f"only {frac:.1%} of surface provably lit"


def test_gates():
    h = np.full((N, N), 5, np.int64)
    # below the elevation gate
    assert sunshadow.build(h, [0.9, 0.005, 0.1]) is None
    # near-vertical sun (horizontal component under the gate)
    assert sunshadow.build(h, [0.01, 1.0, 0.01]) is None
    # a healthy sun builds
    assert sunshadow.build(h, [0.5, 0.7, 0.3]) is not None


def test_integrator_radiance_bit_identical():
    """The whole point: render_sample radiance with sun_maps wired must
    equal the plain heightfield render bit-for-bit (the maps only skip
    walks whose outcome they prove)."""
    import jax.numpy as jnp
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.kernels.integrator import render_sample
    from voxtracer.core import camera as vcam
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=LOG2, verbose=False)
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    flat, offs, hh = build_height_mips(space.heights)
    lut = jnp.asarray(build_wl_to_rgb_lut(256))
    cam = vcam.Camera(pos=np.array([20.0, 50.0, 12.0]), yaw=0.7, pitch=-0.5)
    sun = np.array([0.5, 0.8, 0.33], np.float64)
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    maps = sunshadow.build(space.heights, sun)
    assert maps is not None
    dmaps = dict(maps, t_near=jnp.asarray(maps["t_near"]),
                 t_far=jnp.asarray(maps["t_far"]))
    rgb = np.asarray(space.terrain_rgb, np.float32)
    kw = dict(max_bounces=6, fog_steps=8, hf_mips=flat, hf_offsets=offs,
              terrain_rgb=jnp.asarray(rgb))
    seed = jnp.asarray(np.array([7, 1234, 99], np.uint32))
    a = render_sample(table, root, hh, lut, cam.pos.astype(np.float32),
                      cam.basis(), jnp.asarray(sun), seed, 64, 48, **kw)
    b = render_sample(table, root, hh, lut, cam.pos.astype(np.float32),
                      cam.basis(), jnp.asarray(sun), seed, 64, 48,
                      sun_maps=dmaps, **kw)
    a = np.asarray(a)
    b = np.asarray(b)
    assert np.array_equal(a, b), (
        f"{(a != b).any(-1).sum()} pixels differ with sun_maps"
    )
    assert a.sum() > 0.0
