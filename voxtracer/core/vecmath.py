"""Small vector-math helpers over trailing-axis-3 arrays.

All renderer code represents 3-vectors as arrays of shape ``(..., 3)`` in
float32, so a whole frame of rays is one array and every operation is a
batched VPU op under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1.0e-6  # direction clamp epsilon (reference: raytrace.wgsl:53)


def dot(a, b):
    """Batched dot product over the trailing axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def vdot(a, b):
    """Batched dot product, keepdims=True (broadcastable against vectors)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a):
    return a / jnp.linalg.norm(a, axis=-1, keepdims=True)


def hmax(a):
    """Horizontal max over the trailing axis (reference: raytrace.wgsl:56-58)."""
    return jnp.max(a, axis=-1)


def hmin(a):
    """Horizontal min over the trailing axis (reference: raytrace.wgsl:60-62)."""
    return jnp.min(a, axis=-1)


def to_bits(v):
    """Pack a (...,3) boolean octant mask into an integer.

    bit0 = x, bit1 = y, bit2 = z — the octant child-index convention used
    everywhere in this framework (matches the behavior described by the
    reference: raytrace.wgsl:64-66, svo.rs:89-91).
    """
    v = v.astype(jnp.int32)
    return v[..., 0] | (v[..., 1] << 1) | (v[..., 2] << 2)


def vec3(x, y, z, dtype=jnp.float32):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)], axis=-1
    )
