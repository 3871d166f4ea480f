"""Spectral LUT: bound the fitted ramp model against the reference asset.

The reference's color character comes entirely from src/wl-to-color.png
sampled sRGB-decode-before-filter (fragment.rs:78-147). Our LUT is a
compact knot model fitted to that ramp; this test re-decodes the asset
(reading reference *data* for validation, not copying code) and enforces
the divergence bound at every texel.
"""

from pathlib import Path

import numpy as np
import pytest

from voxtracer.core.spectra import (
    WL_MAX_NM,
    WL_MIN_NM,
    build_wl_to_rgb_lut,
    build_wl_to_rgb_lut_cie,
    sample_lut,
)

_ASSET = Path("/root/reference/src/wl-to-color.png")

# The knot fit guarantees <= 0.0101 in sRGB texel space; in linear space
# the sRGB decode's slope is <= 2.4/1.055 * 1.055^(-2.4) ... bounded by
# ~2.48 near v=1, so 0.026 is a safe linear-space ceiling.
SRGB_TOL = 0.0105
LINEAR_TOL = 0.026


def _decode_asset():
    from PIL import Image

    img = np.asarray(Image.open(_ASSET))
    assert img.shape == (1, 2153, 4)
    srgb = img[0, :, :3].astype(np.float64) / 255.0
    linear = np.where(
        srgb <= 0.04045, srgb / 12.92, ((srgb + 0.055) / 1.055) ** 2.4
    )
    return srgb, linear


@pytest.mark.skipif(not _ASSET.exists(), reason="reference asset absent")
def test_lut_matches_reference_ramp_everywhere():
    srgb_ref, linear_ref = _decode_asset()
    n = len(linear_ref)
    lut = build_wl_to_rgb_lut(n).astype(np.float64)  # same texel centers
    err_lin = np.abs(lut - linear_ref)
    assert err_lin.max() <= LINEAR_TOL, (
        f"linear-space ramp divergence {err_lin.max():.4f} at texel "
        f"{np.unravel_index(np.argmax(err_lin), err_lin.shape)}"
    )
    # and in sRGB space (the asset's native quantization domain)
    srgb_ours = np.where(
        lut <= 0.0031308, lut * 12.92, 1.055 * lut ** (1 / 2.4) - 0.055
    )
    err = np.abs(srgb_ours - srgb_ref)
    assert err.max() <= SRGB_TOL, f"sRGB ramp divergence {err.max():.4f}"


@pytest.mark.skipif(not _ASSET.exists(), reason="reference asset absent")
def test_lut_default_size_matches_filtered_asset():
    """At the default (smaller) LUT size, linear filtering of our table
    must agree with linear filtering of the decoded asset (both are
    piecewise-linear reconstructions of the same ramp)."""
    import jax.numpy as jnp

    _, linear_ref = _decode_asset()
    lut = jnp.asarray(build_wl_to_rgb_lut())
    u = np.linspace(0.0, 1.0, 1024, endpoint=False) + 0.5 / 1024
    ours = np.asarray(sample_lut(lut, jnp.asarray(u, jnp.float32)))
    ref = np.asarray(
        sample_lut(jnp.asarray(linear_ref, jnp.float32),
                   jnp.asarray(u, jnp.float32))
    )
    assert np.abs(ours - ref).max() <= LINEAR_TOL + 0.01


def test_lut_basic_character():
    """Asset-free invariants of the ramp (hold for the knot model alone):
    blue at the short end, green mid, red tail — the reference ramp's
    coarse structure (SURVEY.md §2.8)."""
    lut = build_wl_to_rgb_lut(512)
    wl = WL_MIN_NM + (np.arange(512) + 0.5) / 512 * (WL_MAX_NM - WL_MIN_NM)
    blue = lut[(wl > 438) & (wl < 459)]
    assert (blue[:, 2] > 0.9).all() and (blue[:, 0] < 0.05).all()
    green = lut[(wl > 555) & (wl < 630)]
    assert (green[:, 1] > 0.9).all()
    red = lut[(wl > 640) & (wl < 760)]
    assert (red[:, 0] > 0.9).all() and (red[:, 2] < 1e-3).all()
    cie = build_wl_to_rgb_lut_cie(512)
    assert cie.shape == (512, 3) and cie.max() == 1.0
