"""Bit-grid DDA: parity with the SVO traversal, packing invariants,
incremental edits, and path-tracer integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.kernels.bitdda import bitgrid_raycast, svo_color_at
from voxtracer.kernels.traverse import leaf_rgb, svo_raycast
from voxtracer.world import bitgrid as bg
from voxtracer.world.svo import from_dense


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    n = 64
    solid = rng.random((n, n, n)) < 0.1
    rgb = rng.random((n, n, n, 3)).astype(np.float32)
    rgb[~solid] = 0
    space = from_dense(solid, rgb)
    dev = space.serialize()
    grid = bg.from_dense(solid)
    return solid, rgb, dev, grid


def _tables(dev, grid):
    return (
        jnp.asarray(dev.table.view(np.int32)),
        np.int32(dev.root),
        (jnp.asarray(grid.top), jnp.asarray(grid.regions),
         jnp.asarray(grid.bricks)),
    )


def test_bitgrid_matches_svo(world, rng):
    solid, rgb, dev, grid = world
    table, root, bw = _tables(dev, grid)
    B = 4096
    start = rng.random((B, 3)).astype(np.float32) * 160 - 45
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb = bitgrid_raycast(*bw, grid.size, jnp.asarray(start), jnp.asarray(d),
                         skip_t0=False)
    rs = svo_raycast(table, root, dev.height, jnp.asarray(start),
                     jnp.asarray(d), skip_t0=False)
    assert np.array_equal(np.asarray(rb["hit"]), np.asarray(rs["hit"]))
    both = np.asarray(rb["hit"])
    assert np.allclose(np.asarray(rb["t"])[both], np.asarray(rs["t"])[both],
                       rtol=1e-5, atol=2e-4)
    assert np.array_equal(np.asarray(rb["voxel"])[both],
                          np.asarray(rs["voxel"])[both])
    assert np.array_equal(np.asarray(rb["normal"])[both],
                          np.asarray(rs["normal"])[both])
    col = np.asarray(svo_color_at(table, root, dev.height, rb["voxel"],
                                  rb["hit"]))[both]
    assert np.allclose(col, np.asarray(leaf_rgb(table, rs["node"]))[both])


def test_bitgrid_distance_cap(world):
    solid, rgb, dev, grid = world
    _, _, bw = _tables(dev, grid)
    p = np.argwhere(solid)[0]
    start = jnp.asarray([[p[0] + 0.5, p[1] + 0.5, -10.0]] * 2, jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2, jnp.float32)
    far = float(p[2]) + 10.0
    r = bitgrid_raycast(*bw, grid.size, start, d,
                        distance=jnp.asarray([1.0, far]), skip_t0=False)
    hits = np.asarray(r["hit"])
    assert not hits[0] and hits[1]


def test_bitgrid_inside_solid_skip(world):
    solid2 = np.ones((8, 8, 8), bool)
    g = bg.from_dense(solid2)
    bw = (jnp.asarray(g.top), jnp.asarray(g.regions), jnp.asarray(g.bricks))
    r = bitgrid_raycast(*bw, g.size, jnp.asarray([[3.3, 3.3, 3.3]]),
                        jnp.asarray([[1.0, 0.0, 0.0]]), skip_t0=True)
    assert bool(r["hit"][0])
    assert abs(float(r["t"][0]) - 0.7) < 1e-5
    assert np.array_equal(np.asarray(r["voxel"])[0], [4, 3, 3])


def test_set_voxel_updates_pyramid(world):
    g = bg.from_dense(np.zeros((16, 16, 16), bool))
    bw = lambda: (jnp.asarray(g.top.copy()), jnp.asarray(g.regions.copy()),
                  jnp.asarray(g.bricks.copy()))
    start = jnp.asarray([[3.5, 3.5, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    r = bitgrid_raycast(*bw(), g.size, start, d)
    assert not bool(r["hit"][0])
    bg.set_voxel(g, (3, 3, 6), True)
    r = bitgrid_raycast(*bw(), g.size, start, d)
    assert bool(r["hit"][0])
    assert np.array_equal(np.asarray(r["voxel"])[0], [3, 3, 6])
    bg.set_voxel(g, (3, 3, 6), False)
    r = bitgrid_raycast(*bw(), g.size, start, d)
    assert not bool(r["hit"][0])
    assert not g.top.any()


def test_from_heightmap_matches_dense():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 32, (32, 32))
    a = bg.from_heightmap(h)
    solid = np.arange(32)[None, :, None] < h[:, None, :]
    b = bg.from_dense(solid)
    assert np.array_equal(a.bricks, b.bricks)
    assert np.array_equal(a.regions, b.regions)
    assert np.array_equal(a.top, b.top)


def test_path_tracer_with_bitworld_statistics(rng):
    """PT over the bit-grid must agree with the SVO path per-pixel at a
    matched world size (identical mirrored arithmetic)."""
    from voxtracer.core import camera as vcam
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.kernels.integrator import render_sample
    from voxtracer.world import worldgen
    from voxtracer.world.dense import from_heightmap as dense_from_h

    h = worldgen.heightmap(7)  # 128^3: bitgrid pad == SVO bound
    dw = dense_from_h(np.asarray(h), 128)
    space = from_dense(dw.solid, dw.rgb)
    dev = space.serialize()
    grid = bg.from_heightmap(np.asarray(h))
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    bw = (jnp.asarray(grid.top), jnp.asarray(grid.regions),
          jnp.asarray(grid.bricks))
    lut = jnp.asarray(build_wl_to_rgb_lut(256))
    cam = vcam.Camera(pos=(12.5123, 35.0711, 10.2417), yaw=-5.38, pitch=0.32)
    sun = np.asarray([0.8, 10.2743, 3.7])
    sun = jnp.asarray((sun / np.linalg.norm(sun)).astype(np.float32))
    seed = jnp.asarray(np.array([9, 8, 7], np.uint32))
    kw = dict(max_bounces=3, fog_steps=8)
    a = render_sample(table, root, dev.height, lut,
                      np.asarray(cam.pos, np.float32), cam.basis(), sun,
                      seed, 64, 40, **kw)
    b = render_sample(table, root, dev.height, lut,
                      np.asarray(cam.pos, np.float32), cam.basis(), sun,
                      seed, 64, 40, bitworld=bw, bit_size=grid.size, **kw)
    aa, bb = np.asarray(a), np.asarray(b)
    differ = ~np.isclose(aa, bb, rtol=1e-4, atol=1e-3)
    assert differ.mean() < 0.01, f"{differ.mean():.2%} differ"
