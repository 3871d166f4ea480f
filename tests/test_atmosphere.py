"""Atmosphere/fog: geometry determinism and statistical parity between
the coarse production march and the reference-fidelity 1000-step march
(SURVEY.md §7.3 — mean-transmittance parity, not per-sample parity)."""

import numpy as np
import jax.numpy as jnp

from voxtracer.core import rng as vrng
from voxtracer.kernels import atmosphere as atm


def _states(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 3), dtype=np.uint32))


def test_planet_surface_hit():
    # straight down from 1km above the pole: must hit ground at ~1km
    start = jnp.asarray([[0.0, 1000.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    state = jnp.asarray([[1, 2, 3]], jnp.uint32)
    _, r = atm.raycast_planet(state, start, d, jnp.asarray([0.0]), n_steps=8)
    assert bool(r["hit"][0])
    assert abs(float(r["t"][0]) - 1000.0) < 1.0
    assert np.allclose(np.asarray(r["rgba"][0]), [0.25, 0.25, 0.25, 0.0])
    assert np.allclose(np.asarray(r["normal"][0]), [0, 1, 0], atol=1e-4)


def test_up_ray_no_surface_zero_density():
    start = jnp.asarray([[0.0, 100.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    state = jnp.asarray([[1, 2, 3]], jnp.uint32)
    _, r = atm.raycast_planet(state, start, d, jnp.asarray([0.0]), n_steps=8)
    assert not bool(r["hit"][0])


def test_scatter_probability_matches_transmittance(rng):
    """Monte-Carlo scatter rate ~= 1 - analytic escape probability."""
    n = 4096
    start = jnp.zeros((n, 3)) + jnp.asarray([0.0, 100.0, 0.0])
    d = jnp.broadcast_to(
        jnp.asarray([0.0, 0.2, 0.9797958971], jnp.float32), (n, 3)
    )
    dens = jnp.full((n,), 3.0e-5, jnp.float32)  # mid-spectrum-ish density
    state = _states(rng, n)
    _, r = atm.raycast_planet(state, start, d, dens, n_steps=64)
    scatter_rate = float(jnp.mean(r["hit"].astype(jnp.float32)))
    escape = float(atm.transmittance_to_escape(start[:1], d[:1], dens[:1],
                                               n_steps=2048)[0])
    assert abs(scatter_rate - (1.0 - escape)) < 0.03, (scatter_rate, escape)


def test_coarse_march_matches_reference_march(rng):
    """64-segment production march vs the reference's 1000 segments:
    scatter rates agree within Monte-Carlo noise."""
    n = 2048
    start = jnp.zeros((n, 3)) + jnp.asarray([0.0, 500.0, 0.0])
    d = jnp.broadcast_to(jnp.asarray([0.6, 0.1, 0.7937253933], jnp.float32), (n, 3))
    dens = jnp.full((n,), 5.0e-5, jnp.float32)
    s1 = _states(rng, n)
    s2 = _states(np.random.default_rng(999), n)
    _, r64 = atm.raycast_planet(s1, start, d, dens, n_steps=64)
    _, r1000 = atm.raycast_planet(s2, start, d, dens, n_steps=1000)
    rate64 = float(jnp.mean(r64["hit"].astype(jnp.float32)))
    rate1000 = float(jnp.mean(r1000["hit"].astype(jnp.float32)))
    assert abs(rate64 - rate1000) < 0.04, (rate64, rate1000)


def test_fog_scatter_distance_within_shell(rng):
    n = 1024
    start = jnp.zeros((n, 3)) + jnp.asarray([0.0, 100.0, 0.0])
    d = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n, 3))
    dens = jnp.full((n,), 2.0e-4, jnp.float32)  # thick fog: most scatter
    state = _states(rng, n)
    _, r = atm.raycast_planet(state, start, d, dens, n_steps=64)
    hits = np.asarray(r["hit"])
    assert hits.mean() > 0.5
    ts = np.asarray(r["t"])[hits]
    # scatter events lie inside the shell (max upward extent ~10 halflives)
    assert (ts > 0).all()
    assert (ts < 10.5 * atm.FOG_HALFLIFE).all()
    # fog scatter colors are (1,1,1,0)
    rgba = np.asarray(r["rgba"])[hits]
    assert np.allclose(rgba, [1, 1, 1, 0])


def test_rng_consumption_fixed(rng):
    """The cast consumes the same number of draws whether or not it
    scatters (cross-backend parity discipline)."""
    state = _states(rng, 4)
    start = jnp.zeros((4, 3)) + jnp.asarray([0.0, 100.0, 0.0])
    d = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (4, 3))
    s_zero, _ = atm.raycast_planet(state, start, d, jnp.zeros((4,)), n_steps=16)
    s_thick, _ = atm.raycast_planet(
        state, start, d, jnp.full((4,), 1e-3, jnp.float32), n_steps=16
    )
    assert np.array_equal(np.asarray(s_zero), np.asarray(s_thick))
