"""Dense voxel grids — the BASELINE config-1 world representation.

A dense cubic grid is the natural v0 world on TPU: occupancy is a
``bool[N,N,N]`` (bit-packable to VMEM scale at N=256) and colors live in a
separate ``float32[N,N,N,3]`` HBM array gathered only at hit points.
Grids index as ``grid[x, y, z]``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass
class DenseWorld:
    solid: np.ndarray  # bool[N,N,N]
    rgb: np.ndarray  # float32[N,N,N,3]

    @property
    def size(self) -> int:
        return int(self.solid.shape[0])

    def to_device(self):
        return DenseWorld(jnp.asarray(self.solid), jnp.asarray(self.rgb))


def from_heightmap(heights: np.ndarray, size: int, rgb=(0.5, 0.5, 0.5)) -> DenseWorld:
    """Terrain columns: voxel (x,y,z) is solid iff y < heights[x,z]."""
    n = size
    heights = np.asarray(heights)
    assert heights.shape == (n, n)
    y = np.arange(n)[None, :, None]
    solid = y < heights[:, None, :]
    colors = np.zeros((n, n, n, 3), np.float32)
    colors[solid] = np.asarray(rgb, np.float32)
    return DenseWorld(solid=solid, rgb=colors)


def from_svo_space(space) -> DenseWorld:
    """Rasterize an SvoSpace to a dense grid (test-scale worlds only)."""
    n = 1 << space.height()
    solid = np.zeros((n, n, n), bool)
    rgb = np.zeros((n, n, n, 3), np.float32)
    for x in range(n):
        for y in range(n):
            for z in range(n):
                c = space.get((x, y, z))
                if c is not None:
                    solid[x, y, z] = True
                    rgb[x, y, z] = c
    return DenseWorld(solid=solid, rgb=rgb)
