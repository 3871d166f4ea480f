"""Device-mesh helpers for multi-chip rendering.

The reference is strictly single-device (SURVEY.md §2.9); multi-chip
scaling is new capability designed for TPU pods: a 1-D ICI mesh over
which we shard either *samples* (each chip traces the full frame with
its own seeds; accumulators merge with one psum over ICI) or *tiles*
(each chip owns a horizontal band of the frame; no communication at all
until frame gather). The world's node table is read-only and replicated
into every chip's HBM.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
