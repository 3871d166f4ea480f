"""pcg3d RNG: bit-exactness against an independent numpy implementation,
distribution sanity, and per-pixel seeding (raytrace.wgsl:182-200,417)."""

import numpy as np
import jax.numpy as jnp

from voxtracer.core import rng as vrng


def pcg3d_numpy(v):
    """Independent scalar reference of the PCG3D hash (uint64 masked)."""
    M = np.uint64(0xFFFFFFFF)
    v = [np.uint64(x) for x in v]
    v = [(x * np.uint64(1664525) + np.uint64(1013904223)) & M for x in v]
    v[0] = (v[0] + v[1] * v[2]) & M
    v[1] = (v[1] + v[0] * v[2]) & M
    v[2] = (v[2] + v[1] * v[0]) & M
    v = [x ^ (x >> np.uint64(16)) for x in v]
    v[0] = (v[0] + v[1] * v[2]) & M
    v[1] = (v[1] + v[0] * v[2]) & M
    v[2] = (v[2] + v[1] * v[0]) & M
    return [int(x) for x in v]


def test_pcg3d_bit_exact(rng):
    states = rng.integers(0, 2**32, size=(64, 3), dtype=np.uint32)
    out = np.asarray(vrng.pcg3d(jnp.asarray(states)))
    for s, o in zip(states, out):
        assert pcg3d_numpy(s) == [int(x) for x in o]


def test_random3_range_and_determinism(rng):
    state = jnp.asarray(rng.integers(0, 2**32, size=(1000, 3), dtype=np.uint32))
    s1, r1 = vrng.random3(state)
    s2, r2 = vrng.random3(state)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    r = np.asarray(r1)
    assert (r >= 0).all() and (r < 1).all()
    # roughly uniform
    assert abs(r.mean() - 0.5) < 0.02


def test_chain_decorrelates(rng):
    state = jnp.asarray(rng.integers(0, 2**32, size=(2000, 3), dtype=np.uint32))
    state, a = vrng.random3(state)
    state, b = vrng.random3(state)
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.05


def test_seed_pixels_distinct():
    frame = np.array([1, 2, 3], np.uint32)
    px = jnp.arange(64, dtype=jnp.int32).reshape(8, 8)
    py = jnp.arange(64, dtype=jnp.int32).reshape(8, 8).T
    seeds = np.asarray(vrng.seed_pixels(frame, px, py))
    flat = seeds.reshape(-1, 3)
    assert len(np.unique(flat, axis=0)) == 64
    # z channel: bitcast(0.0) == 0, so it passes the frame seed through
    assert (flat[:, 2] == 3).all()
