"""Spectral pipeline: wavelength -> linear-sRGB LUT and path-tracer weights.

The reference ships a 2153x1 sRGB-encoded PNG ramp (src/wl-to-color.png)
sampled with a linear-filtering, sRGB-decoding sampler
(fragment.rs:78-147, raytrace.wgsl:334). That ramp is NOT a colorimetric
(CIE) spectral locus — it is a stylized rainbow whose green channel peaks
near 600 nm and whose red saturates through 630-765 nm; the renderer's
entire color character comes from it. We do not copy the asset; the
default LUT here is a compact piecewise-linear knot model (9+8+9 knots,
sRGB space) FITTED to the decoded ramp, max |err| <= 0.0101 in sRGB
texel values (~2.6 quantization steps of the 8-bit asset) —
tests/test_spectra.py re-decodes the asset and enforces that bound.
A colorimetric alternative built from the CIE 1931 color matching
functions (Wyman, Sloan & Shirley's multi-lobe Gaussian fits, JCGT 2013)
remains available as ``build_wl_to_rgb_lut_cie``.

Sampling semantics (normalized-coordinate linear filtering over the
table, on already-linear values — i.e. decode-before-filter) match the
reference's hardware sampler.

The per-path spectral throughput weight (Planck-ish spectrum x tint) and
the Rayleigh-like fog density follow raytrace.wgsl:330-336 exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LUT_SIZE = 2048
WL_MIN_NM = 400.0
WL_MAX_NM = 800.0

# Piecewise-linear knot model of the reference wavelength ramp, per
# channel, as (wavelength_nm, sRGB value) pairs. Knots were placed by
# adaptive max-error insertion against the sRGB-decoded asset
# (fragment.rs:78-106); linear interpolation between them reproduces
# every texel within 0.0101.
_RAMP_KNOTS_SRGB = dict(
    r=[(400.1, 0.0000), (564.9, 0.0000), (567.9, 0.0353), (580.7, 0.2510),
       (596.1, 0.4824), (632.5, 0.9922), (765.0, 0.9922), (780.2, 0.6627),
       (799.9, 0.2000)],
    g=[(400.1, 0.0000), (461.8, 0.0118), (497.6, 0.4471), (548.0, 1.0000),
       (636.6, 1.0000), (708.9, 0.4431), (759.4, 0.0118), (799.9, 0.0000)],
    b=[(400.1, 0.4157), (410.5, 0.5255), (437.3, 1.0000), (459.7, 1.0000),
       (507.7, 0.4745), (528.1, 0.2353), (544.8, 0.0196), (548.0, 0.0000),
       (799.9, 0.0000)],
)


def _gauss(x, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    t = (x - mu) / s
    return np.exp(-0.5 * t * t)


def cie_xyz(wavelength_nm):
    """CIE 1931 2° observer CMFs, analytic multi-lobe Gaussian fit."""
    w = np.asarray(wavelength_nm, np.float64)
    x = (
        1.056 * _gauss(w, 599.8, 37.9, 31.0)
        + 0.362 * _gauss(w, 442.0, 16.0, 26.7)
        - 0.065 * _gauss(w, 501.1, 20.4, 26.2)
    )
    y = 0.821 * _gauss(w, 568.8, 46.9, 40.5) + 0.286 * _gauss(w, 530.9, 16.3, 31.1)
    z = 1.217 * _gauss(w, 437.0, 11.8, 36.0) + 0.681 * _gauss(w, 459.0, 26.0, 13.8)
    return np.stack([x, y, z], axis=-1)


_XYZ_TO_SRGB = np.array(
    [
        [3.2406, -1.5372, -0.4986],
        [-0.9689, 1.8758, 0.0415],
        [0.0557, -0.2040, 1.0570],
    ]
)


def _srgb_decode_np(v):
    v = np.asarray(v, np.float64)
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)


def build_wl_to_rgb_lut(size: int = LUT_SIZE) -> np.ndarray:
    """(size, 3) float32 linear-sRGB LUT over [WL_MIN_NM, WL_MAX_NM).

    Entry i corresponds to the wavelength at normalized coordinate
    (i + 0.5)/size (texel centers). Texel values come from the fitted
    knot model of the reference ramp, evaluated in sRGB space and then
    sRGB-decoded — the same decode-before-filter order as the reference's
    sampler (fragment.rs:94-106), so linear filtering downstream operates
    on linear values.
    """
    u = (np.arange(size) + 0.5) / size
    wl = WL_MIN_NM + u * (WL_MAX_NM - WL_MIN_NM)
    srgb = np.stack(
        [
            np.interp(wl, [k[0] for k in _RAMP_KNOTS_SRGB[c]],
                      [k[1] for k in _RAMP_KNOTS_SRGB[c]])
            for c in ("r", "g", "b")
        ],
        axis=-1,
    )
    return _srgb_decode_np(srgb).astype(np.float32)


def build_wl_to_rgb_lut_cie(size: int = LUT_SIZE) -> np.ndarray:
    """Colorimetric alternative LUT from the CIE 1931 CMFs (not the
    reference's look — kept for physically-based rendering uses).

    Negatives clipped, globally scaled so the maximum channel is 1.
    """
    u = (np.arange(size) + 0.5) / size
    wl = WL_MIN_NM + u * (WL_MAX_NM - WL_MIN_NM)
    xyz = cie_xyz(wl)
    rgb = xyz @ _XYZ_TO_SRGB.T
    rgb = np.clip(rgb, 0.0, None)
    rgb = rgb / rgb.max()
    return rgb.astype(np.float32)


def sample_lut(lut, u):
    """Linear-filtered LUT sample at normalized coordinate u in [0,1).

    Reproduces GPU normalized-coordinate linear filtering with
    clamp-to-edge: texel i is centered at (i+0.5)/N.
    """
    n = lut.shape[0]
    pos = u * n - 0.5
    i0 = jnp.clip(jnp.floor(pos), 0, n - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    frac = jnp.clip(pos - i0.astype(jnp.float32), 0.0, 1.0)[..., None]
    return lut[i0] * (1.0 - frac) + lut[i1] * frac


def spectral_throughput(lut, wavelength):
    """Initial path throughput for normalized wavelength in [0,1).

    LUT color x Planck-ish spectrum 1/((w+1)^3 (e^{0.1/(w+1)} - 1)) x a
    fixed (1.0, 0.8, 1.0) tint (raytrace.wgsl:332-336).
    """
    w = wavelength
    wlp1_cubed = (w + 1.0) ** 3
    planck = 1.0 / (wlp1_cubed * (jnp.exp(0.1 / (w + 1.0)) - 1.0))
    tint = jnp.asarray([1.0, 0.8, 1.0], jnp.float32)
    return sample_lut(lut, w) * planck[..., None] * tint


def fog_density(wavelength):
    """Rayleigh-like sea-level fog density for normalized wavelength.

    lambda = w*400nm + 400nm; density = 8.3468e-5 / (7.512e25 * lambda^4)
    (raytrace.wgsl:330-331).
    """
    wl = wavelength * 400.0e-9 + 400.0e-9
    return 8.346829234302236e-05 / (7.512000000000001e25 * wl * wl * wl * wl)
