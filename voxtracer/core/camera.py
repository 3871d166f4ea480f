"""Camera model: yaw/pitch fly camera and per-pixel ray generation.

Conventions (matching the behavior of the reference renderer):

* The camera basis is ``R = Ry(yaw) @ Rx(pitch)`` — a Y-then-X Euler
  rotation applied to column vectors, so the camera-space forward axis is
  +Z and the world-space forward direction is
  ``(sin(yaw)·cos(pitch), -sin(pitch), cos(yaw)·cos(pitch))``
  (reference: glam ``Mat3::from_euler(YXZ, yaw, pitch, 0)``,
  software.rs:87, fragment.rs camera uniform).
* Pixel (x, y) maps to camera-space direction
  ``normalize((2(x+.5) - w)/h, -(2(y+.5) - h)/h, 1)`` — focal length 1
  against the half-height, i.e. ~53.13° vertical FOV
  (reference: raytrace.wgsl:419-425, software.rs:96-105).
* Sub-pixel jitter is uniform over the pixel footprint ``2/h``
  (reference: raytrace.wgsl:420-424 via dpdx/dpdy).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Camera:
    """Host-side camera pose (plain floats; converted to arrays on use)."""

    pos: tuple  # world-space position (x, y, z)
    yaw: float
    pitch: float

    def basis(self):
        return camera_basis(self.yaw, self.pitch)


def camera_basis(yaw, pitch):
    """3x3 rotation: columns are the camera right/up/forward axes."""
    yaw = jnp.asarray(yaw, jnp.float32)
    pitch = jnp.asarray(pitch, jnp.float32)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    ry = jnp.stack(
        [
            jnp.stack([cy, jnp.zeros_like(cy), sy]),
            jnp.stack([jnp.zeros_like(cy), jnp.ones_like(cy), jnp.zeros_like(cy)]),
            jnp.stack([-sy, jnp.zeros_like(cy), cy]),
        ]
    )
    rx = jnp.stack(
        [
            jnp.stack([jnp.ones_like(cp), jnp.zeros_like(cp), jnp.zeros_like(cp)]),
            jnp.stack([jnp.zeros_like(cp), cp, -sp]),
            jnp.stack([jnp.zeros_like(cp), sp, cp]),
        ]
    )
    return ry @ rx


def pixel_grid(width, height):
    """Integer pixel index grids (py, px), each of shape (height, width)."""
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    return py, px


def pixel_ndc(px, py, width, height):
    """Screen coordinates ld = 2*(pixel_center - vp/2)/vp.y, shape (...,2)."""
    w = jnp.float32(width)
    h = jnp.float32(height)
    lx = (2.0 * (px.astype(jnp.float32) + 0.5) - w) / h
    ly = (2.0 * (py.astype(jnp.float32) + 0.5) - h) / h
    return jnp.stack([lx, ly], axis=-1)


def ray_directions(basis, ld, jitter=None, height=None):
    """World-space unit ray directions for screen coords ``ld`` (...,2).

    ``jitter`` (optional): uniform [0,1) (...,2) sub-pixel offsets; the
    pixel footprint is 2/height on both axes, so the jittered coordinate is
    ``ld + (jitter - 0.5) * 2/height``.
    """
    if jitter is not None:
        px_size = 2.0 / jnp.float32(height)
        ld = ld + (jitter - 0.5) * px_size
    d_cam = jnp.stack([ld[..., 0], -ld[..., 1], jnp.ones_like(ld[..., 0])], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    # HIGHEST: the TPU's default bf16-pass matmul would perturb ray
    # directions by ~6e-5, i.e. up to half a voxel of hit position at
    # flagship distances (reference semantics are plain f32 math)
    return jnp.matmul(d_cam, basis.T, precision=jax.lax.Precision.HIGHEST)


def generate_rays(cam: Camera, width: int, height: int, jitter=None):
    """Convenience: full-frame ray origins and directions.

    Returns (origins (H,W,3), directions (H,W,3)).
    """
    py, px = pixel_grid(width, height)
    ld = pixel_ndc(px, py, width, height)
    dirs = ray_directions(cam.basis(), ld, jitter=jitter, height=height)
    origins = jnp.broadcast_to(
        jnp.asarray(np.asarray(cam.pos, np.float32)), dirs.shape
    )
    return origins, dirs


# Default interactive pose of the reference app (main.rs:378-381), used by
# the CLI and benchmarks so images are comparable.
DEFAULT_POSE = Camera(
    pos=(800.2352, 1511.8693, 654.40125), yaw=-5.3800497, pitch=0.21999985
)
DEFAULT_SUN = (0.8, 10.2743, 3.7)  # normalized on use (main.rs:381)
