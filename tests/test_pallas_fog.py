"""Pallas fog-march kernel vs the jnp oracle path (interpret mode on CPU).

Hit classification must match exactly; scatter t's agree to a small
relative tolerance (FMA-contraction drift through the exp accumulation
shifts the within-segment scatter point slightly — the distribution is
identical; see kernels/pallas/fog.py)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )


def test_pallas_matches_jnp(rng):
    from voxtracer.kernels import atmosphere as atm

    B = 2048
    state = jnp.asarray(rng.integers(0, 2**32, (B, 3), dtype=np.uint32))
    start = jnp.asarray(rng.random((B, 3), np.float32) * 1000)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    dens = jnp.full((B,), 5e-5, jnp.float32)

    s1, r1 = atm.raycast_planet(state, start, d, dens, n_steps=32, backend="jnp")
    s2, r2 = atm.raycast_planet(state, start, d, dens, n_steps=32,
                                backend="pallas")
    assert np.array_equal(np.asarray(s1), np.asarray(s2))  # same RNG draws
    assert np.array_equal(np.asarray(r1["hit"]), np.asarray(r2["hit"]))
    assert np.allclose(np.asarray(r1["rgba"]), np.asarray(r2["rgba"]))
    t1, t2 = np.asarray(r1["t"]), np.asarray(r2["t"])
    # scatter points may drift by at most ~one march segment (the free-path
    # consumption accumulates last-ulp exp/FMA differences); the shell span
    # here is <~ 1.3e6 m and n_steps=32.
    seg = 1.35e6 / 32
    assert np.abs(t1 - t2).max() < 1.5 * seg
    hits = np.asarray(r1["hit"])
    close = np.abs(t1 - t2)[hits] / np.maximum(t1[hits], 1.0)
    assert np.quantile(close, 0.95) < 0.01
    assert np.allclose(np.asarray(r1["normal"]), np.asarray(r2["normal"]),
                       atol=1e-4)


def test_pallas_padding(rng):
    """Batch sizes that don't divide the tile must round-trip correctly."""
    from voxtracer.kernels.pallas.fog import fog_march

    for B in (1, 100, 1000):
        start = jnp.asarray(rng.random((B, 3), np.float32) * 100)
        d = np.zeros((B, 3), np.float32)
        d[:, 1] = 1.0
        code, t = fog_march(jnp.asarray(start), jnp.asarray(d),
                            jnp.zeros((B,)), jnp.ones((B,)), n_steps=8)
        assert code.shape == (B,) and t.shape == (B,)
        assert (np.asarray(code) == 0).all()  # zero density, upward: miss
