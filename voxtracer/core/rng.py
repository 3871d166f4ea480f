"""Counter-free PCG3D random number generation in pure jnp uint32 ops.

The renderer threads an explicit ``(..., 3) uint32`` state through every
stochastic stage so that the jnp oracle and the Pallas kernels produce
*bit-identical* random sequences — this is what makes seeded path traces
reproducible across backends and lets parity tests compare stochastic
renders exactly (SURVEY.md §7.3 "Pixel parity definition").

Behavioral reference: the pcg3d hash and the [0,1) float mapping of the
reference renderer (raytrace.wgsl:182-200); per-pixel seeding mixes a
per-frame seed with the pixel's fragment coordinates
(raytrace.wgsl:417).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# numpy scalars, NOT jnp: creating a device array at import time would
# initialize the XLA backend before jax.distributed.initialize can run
# (dist/multihost.py) and pins a constant to the default device
_MUL = np.uint32(1664525)
_ADD = np.uint32(1013904223)


def pcg3d(state):
    """One PCG3D step. state: (..., 3) uint32 -> (..., 3) uint32.

    Hash structure (multiply-add, cross-feedback, xorshift-16,
    cross-feedback) follows the published PCG3D hash (Jarzynski & Olano,
    JCGT 2020), as used by the reference (raytrace.wgsl:183-196).
    """
    state = state.astype(jnp.uint32)
    v = state * _MUL + _ADD
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = x + y * z
    y = y + x * z
    z = z + y * x
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + x * z
    z = z + y * x
    return jnp.stack([x, y, z], axis=-1)


def random3(state):
    """Advance the RNG and return (new_state, (...,3) float32 in [0,1)).

    Top 16 bits / 65536 — 16-bit resolution, exactly the reference's
    ``random()`` mapping (raytrace.wgsl:198-200).
    """
    v = pcg3d(state)
    return v, (v >> 16).astype(jnp.float32) / 65536.0


def seed_pixels(frame_seed, px, py):
    """Per-pixel RNG state: frame seed XOR bitcast pixel-center coords.

    ``frame_seed`` is a (3,) uint32 drawn fresh per accumulation step on the
    host; ``px``/``py`` are integer pixel indices. The pixel-center float
    coordinates (x+0.5, y+0.5, 0.0) are bitcast to uint32 and XORed in,
    mirroring the fragment-coordinate seeding of the reference
    (raytrace.wgsl:417, fragment.rs:380-382).
    """
    fx = (px.astype(jnp.float32) + 0.5).view(jnp.uint32)
    fy = (py.astype(jnp.float32) + 0.5).view(jnp.uint32)
    fz = jnp.zeros_like(fx)  # fragment z is 0.0; bitcast(0.0f) == 0
    pix = jnp.stack([fx, fy, fz], axis=-1)
    return jnp.asarray(frame_seed, jnp.uint32) ^ pix


def host_frame_seed(py_rng):
    """Draw a (3,) uint32 frame seed from a host ``random.Random``."""
    import numpy as np

    return np.array([py_rng.getrandbits(32) for _ in range(3)], dtype=np.uint32)
