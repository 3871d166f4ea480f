"""Terrain-character validation (VERDICT r2 missing #2 / next #9).

The reference's look comes from OpenSimplex+Fbm terrain
(/root/reference/src/worldgen.rs:14-24): ``base = scale_noise/2048 + 1``,
``scale = base^3``, ``height = floor((fbm/512 + 1 + base) * 256 * scale
+ 64)``. world/noise.py is NOT bit-compatible with the Rust noise crate
(SURVEY.md §7.2-6 targets distribution parity), so these tests pin the
STATISTICAL shape that formula implies — the axes that determine the
rendered character:

* spectral slope: Fbm with gain 0.5 / lacunarity 2 has amplitude ~ 1/f,
  i.e. radially-averaged power ~ f^-2, over its octave band. A slope far
  shallower (white noise) or steeper (single low-frequency bump) would
  look nothing like the reference hills.
* hypsometric skew: the cubic ``scale`` factor makes high terrain rare —
  most columns sit low, with sparse peaks (the reference's plains +
  mountain silhouettes).
* fine-scale smoothness: the finest fbm octave has wavelength ~8 columns
  at flagship scale, so adjacent columns are strongly correlated —
  terrain is hills, not per-column static.

Bounds are intentionally loose (different noise lattice, same class);
regressions they catch are of the "someone broke an octave/seed/scale
constant" kind.
"""

import numpy as np
import pytest

from voxtracer.world.worldgen import heightmap


@pytest.fixture(scope="module")
def hmap():
    # flagship-coordinate statistics at an affordable size: 1024^2 covers
    # 1/8 of the reference extent per axis (coords are world_scale'd), so
    # every octave of the /512 fbm band is present in the spectrum
    return heightmap(10).astype(np.float64)


def test_spectrum_slope_is_fbm_like(hmap):
    h = hmap - hmap.mean()
    n = h.shape[0]
    spec = np.abs(np.fft.rfft2(h)) ** 2
    kx = np.fft.fftfreq(n)[:, None]
    kz = np.fft.rfftfreq(n)[None, :]
    k = np.hypot(np.broadcast_to(kx, spec.shape),
                 np.broadcast_to(kz, spec.shape))
    # octave band of the /512 fbm at world_scale 8: wavelengths ~64 -> ~2
    # columns => |k| in [1/64, 1/4] cycles/column
    lo, hi = 1.0 / 64, 1.0 / 4
    nbins = 12
    edges = np.geomspace(lo, hi, nbins + 1)
    power = np.array([
        spec[(k >= a) & (k < b)].mean() for a, b in zip(edges, edges[1:])
    ])
    centers = np.sqrt(edges[:-1] * edges[1:])
    fit = np.polyfit(np.log(centers), np.log(power), 1)
    slope = fit[0]
    # fbm gain 0.5 gives amplitude ~ 1/f; the cubic `scale` factor and
    # the finest-octave lattice rolloff steepen the height spectrum to
    # ~f^-3.4 (measured -3.44 at 1024^2) — pin the class, not the digit
    assert -4.2 < slope < -2.2, f"spectral slope {slope:.2f} not fbm-like"
    # broadband: the per-bin energies follow the power law smoothly (a
    # single-frequency spike or white-noise floor leaves big residuals)
    resid = np.log(power) - np.polyval(fit, np.log(centers))
    assert np.abs(resid).max() < 1.5, f"spectrum not a smooth power law"


def test_hypsometric_skew(hmap):
    n = hmap.shape[0]
    # cubic scale: high ground is rare, low ground common
    assert np.median(hmap) < 0.25 * n
    assert (hmap > 0.5 * n).mean() < 0.2
    # but mountains DO exist (scale^3 reaches multi-km peaks)
    assert hmap.max() > 0.3 * n
    # positive skew (long right tail)
    skew = ((hmap - hmap.mean()) ** 3).mean() / hmap.std() ** 3
    assert skew > 0.5, f"hypsometric skew {skew:.2f} not right-tailed"


def test_fine_scale_smoothness(hmap):
    # adjacent-column correlation: hills, not static
    a = hmap - hmap.mean()
    r1 = (a[:-1] * a[1:]).mean() / (a * a).mean()
    assert r1 > 0.9, f"lag-1 autocorrelation {r1:.3f}: terrain too rough"
    # and not degenerate-flat either
    assert hmap.std() > 10.0
