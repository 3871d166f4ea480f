"""Native (C++) box-soup extractor vs the Python reference pipeline.

Both run on the same serialized table, so box sets must match exactly
(same decomposition: solid-cube emit, max_size split, enclosure cull,
x-strip merge) — compared as sorted row sets since emit order differs.
"""

import dataclasses

import numpy as np
import pytest

from voxtracer.world import native
from voxtracer.world.boxes import extract_boxes

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native library"
)


def _rows(soup):
    rows = np.concatenate(
        [soup.lo, soup.size, soup.leaf[:, None]], axis=1
    )
    return rows[np.lexsort(rows.T[::-1])]


def _native_terrain(n, seed=0, edits=0):
    heights = np.random.default_rng(seed).integers(0, n + 1, (n, n))
    space = native.NativeSvoSpace()
    space.build_terrain(heights.astype(np.uint32), rgb=(0.3, 0.55, 0.25))
    rng = np.random.default_rng(seed + 1)
    for _ in range(edits):
        p = tuple(rng.integers(0, n, 3))
        if rng.random() < 0.4:
            space.set(p, None)
        else:
            space.set(p, tuple(np.round(rng.random(3), 2)))
    return space


@pytest.mark.parametrize("n,edits", [(16, 0), (32, 40), (64, 0)])
def test_native_extractor_matches_python(n, edits):
    space = _native_terrain(n, seed=n, edits=edits)
    dev = space.serialize()
    soup_nat = extract_boxes(dev)  # backref -> native path
    assert dev.space is space
    dev_py = dataclasses.replace(dev, space=None)
    soup_py = extract_boxes(dev_py)  # pure-python pipeline
    assert len(soup_nat) == len(soup_py)
    np.testing.assert_array_equal(_rows(soup_nat), _rows(soup_py))
    np.testing.assert_allclose(
        soup_nat.rgb[np.lexsort(soup_nat.lo.T)],
        soup_py.rgb[np.lexsort(soup_py.lo.T)],
    )


def test_native_extractor_no_cull_and_strip_cap():
    space = _native_terrain(32, seed=9)
    dev = space.serialize()
    for kw in (dict(cull_enclosed=False), dict(max_strip=4),
               dict(max_size=4)):
        s_nat = extract_boxes(dev, **kw)
        s_py = extract_boxes(dataclasses.replace(dev, space=None), **kw)
        np.testing.assert_array_equal(_rows(s_nat), _rows(s_py))


def test_empty_world():
    space = native.NativeSvoSpace()
    dev = space.serialize()
    assert len(extract_boxes(dev)) == 0
