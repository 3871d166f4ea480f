"""Monte-Carlo direction sampling, vectorized over rays.

Every sampler threads the explicit pcg3d RNG state (core.rng) and matches
the sampling strategy of the reference integrator:

* ``random_disk`` — concentric-ish unit-disk sample in the tangent plane
  of ``n``, with a *random* tangent frame built from ``cross(random(), n)``
  (raytrace.wgsl:202-211). Consumes two random vec3s.
* ``cos_hemisphere`` — cosine-weighted hemisphere via disk projection
  (raytrace.wgsl:213-216).
* ``uniform_hemisphere`` — uniform hemisphere (raytrace.wgsl:222-231),
  kept for completeness (unused by the default integrator, as in the
  reference).
* ``sample_sun`` — uniform direction in the sun cone of angular radius
  0.535° (raytrace.wgsl:237-250).

RNG-consumption discipline: samplers always consume the same number of
draws regardless of lane masks, so vectorized (jnp) and tiled (Pallas)
backends stay bit-identical. This differs from the reference's divergent
per-thread consumption but is stochastically equivalent.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from voxtracer.core import rng as vrng
from voxtracer.core.vecmath import cross, normalize

PI = math.pi
SUN_ANGULAR_RADIUS = 0.535 * PI / 180.0  # raytrace.wgsl:237
COS_SUN_RADIUS = math.cos(SUN_ANGULAR_RADIUS)
SUN_WEIGHT = 1.0 - COS_SUN_RADIUS  # solid angle / 2pi (raytrace.wgsl:252)
SUN_COLOR = 10000.0  # raytrace.wgsl:239


def random_disk(state, n):
    """Uniform unit-disk sample in the tangent plane of n. (state, (...,3))."""
    state, rand = vrng.random3(state)
    r = jnp.sqrt(rand[..., 0])
    angle = rand[..., 1] * 2.0 * PI
    px = r * jnp.cos(angle)
    py = r * jnp.sin(angle)
    state, rand2 = vrng.random3(state)
    bitangent = normalize(cross(rand2, n))
    tangent = cross(bitangent, n)
    return state, tangent * px[..., None] + bitangent * py[..., None]


def cos_hemisphere(state, n):
    """Cosine-weighted hemisphere direction around n."""
    state, disk = random_disk(state, n)
    d2 = jnp.sum(disk * disk, axis=-1, keepdims=True)
    return state, disk + n * jnp.sqrt(jnp.maximum(1.0 - d2, 0.0))


def cos_hemisphere_pdf(n, d):
    return jnp.maximum(jnp.sum(n * d, axis=-1), 0.0)


def uniform_hemisphere(state, n):
    state, rand = vrng.random3(state)
    z = rand[..., 0]
    angle = rand[..., 1] * 2.0 * PI
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    px = jnp.cos(angle) * s
    py = jnp.sin(angle) * s
    state, rand2 = vrng.random3(state)
    bitangent = normalize(cross(rand2, n))
    tangent = cross(bitangent, n)
    return state, (
        tangent * px[..., None] + bitangent * py[..., None] + n * z[..., None]
    )


def sample_sun(state, sun):
    """Uniform direction within the sun cone around unit vector ``sun``."""
    state, rand = vrng.random3(state)
    z = rand[..., 0] * (1.0 - COS_SUN_RADIUS) + COS_SUN_RADIUS
    angle = rand[..., 1] * 2.0 * PI
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    px = jnp.cos(angle) * s
    py = jnp.sin(angle) * s
    state, rand2 = vrng.random3(state)
    bitangent = normalize(cross(rand2, sun))
    tangent = cross(bitangent, sun)
    return state, (
        tangent * px[..., None] + bitangent * py[..., None] + sun * z[..., None]
    )


def sun_pdf(d, sun):
    """PDF of sample_sun (raytrace.wgsl:254-260)."""
    inside = jnp.sum(d * sun, axis=-1) > COS_SUN_RADIUS
    return jnp.where(inside, 1.0 / (1.0 - COS_SUN_RADIUS), 0.0)


def brdf(outgoing, incoming, normal):
    """Lambertian BRDF, constant 1/pi (raytrace.wgsl:233-235)."""
    del outgoing, incoming, normal
    return 1.0 / PI
