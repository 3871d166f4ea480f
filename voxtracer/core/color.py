"""Color transfer functions.

The reference displays through an sRGB swapchain and applies the explicit
sRGB transfer when combining movie frames (main.rs:352-361); we reproduce
that transfer exactly here for the tonemap/film stages.
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb_encode(v):
    """Linear -> sRGB (exact piecewise transfer, main.rs:352-361)."""
    v = jnp.asarray(v)
    lo = v * 12.92
    hi = jnp.power(jnp.maximum(v, 1e-12), 1.0 / 2.4) * 1.055 - 0.055
    return jnp.where(v < 0.0031308, lo, hi)


def srgb_decode(v):
    """sRGB -> linear (inverse of srgb_encode)."""
    v = jnp.asarray(v)
    lo = v / 12.92
    hi = jnp.power((v + 0.055) / 1.055, 2.4)
    return jnp.where(v < 0.04045, lo, hi)


def tonemap_to_u8(linear_rgb):
    """Linear radiance -> 8-bit sRGB, clipped (film output path)."""
    enc = srgb_encode(jnp.clip(linear_rgb, 0.0, 1.0))
    return jnp.clip(enc * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
