"""Progressive sample accumulation with reset-on-change.

The reference accumulates 1 sample/pixel/frame into an f32 texture via
additive blending and resets whenever the camera pose, sun, world, or
viewport changes (fragment.rs:322-415). Here the accumulator is an
HBM-resident device array owned by a small host object; `add` is a
donated-buffer addition (no host round trip), and the mean only crosses
to the host at display/save points — mirroring the reference's two
transfer points (SURVEY.md §2.9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _add(acc, sample):
    return acc + sample


class Accumulator:
    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height
        self.buffer = jnp.zeros((height, width, 3), jnp.float32)
        self.samples = 0
        self._key = None

    def _state_key(self, cam_pos, yaw, pitch, sun, extra=None):
        return (
            tuple(np.round(np.asarray(cam_pos, np.float64), 9)),
            round(float(yaw), 9),
            round(float(pitch), 9),
            tuple(np.round(np.asarray(sun, np.float64), 9)),
            extra,
        )

    def begin_sample(self, cam_pos, yaw, pitch, sun, extra=None) -> bool:
        """Reset if the render state changed (fragment.rs:331-354).
        Returns True when a reset happened."""
        key = self._state_key(cam_pos, yaw, pitch, sun, extra)
        if key != self._key:
            self._key = key
            self.buffer = jnp.zeros((self.height, self.width, 3), jnp.float32)
            self.samples = 0
            return True
        return False

    def invalidate(self):
        """Force a reset on the next begin_sample (world edits — the
        reference poisons its pose cache, fragment.rs:312)."""
        self._key = None

    def add(self, sample):
        self.buffer = _add(self.buffer, sample)
        self.samples += 1

    def mean(self) -> np.ndarray:
        """Host copy of the averaged radiance (device->host transfer)."""
        n = max(self.samples, 1)
        return np.asarray(self.buffer) / n
