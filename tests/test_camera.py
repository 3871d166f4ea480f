"""Camera basis and ray-generation conventions (raytrace.wgsl:419-425,
software.rs:87-105)."""

import numpy as np
import jax.numpy as jnp

from voxtracer.core import camera as cam


def test_basis_identity():
    b = np.asarray(cam.camera_basis(0.0, 0.0))
    assert np.allclose(b, np.eye(3), atol=1e-6)


def test_basis_forward_convention():
    yaw, pitch = 0.7, 0.3
    b = np.asarray(cam.camera_basis(yaw, pitch))
    fwd = b @ np.array([0, 0, 1.0])
    expect = np.array(
        [np.sin(yaw) * np.cos(pitch), -np.sin(pitch), np.cos(yaw) * np.cos(pitch)]
    )
    assert np.allclose(fwd, expect, atol=1e-6)
    # rotation matrix: orthonormal
    assert np.allclose(b @ b.T, np.eye(3), atol=1e-6)


def test_center_pixel_is_forward():
    w, h = 853, 480
    c = cam.Camera(pos=(0, 0, 0), yaw=0.4, pitch=-0.2)
    _, dirs = cam.generate_rays(c, w, h)
    dirs = np.asarray(dirs)
    b = np.asarray(c.basis())
    fwd = b @ np.array([0, 0, 1.0])
    # w odd/even: the two center pixels straddle the axis; check small angle
    center = dirs[h // 2, w // 2]
    assert np.dot(center, fwd) > 0.9999


def test_fov_is_2atan_1():
    """Focal length 1 against half-height: vertical half-FOV = atan(1/1)
    at the screen edge y = +-1."""
    w, h = 200, 100
    c = cam.Camera(pos=(0, 0, 0), yaw=0.0, pitch=0.0)
    _, dirs = cam.generate_rays(c, w, h)
    dirs = np.asarray(dirs)
    top = dirs[0, w // 2]
    # ld.y at row 0 = (2*0.5 - h)/h = -0.99 -> d_cam.y = +0.99
    expect_y = 0.99 / np.sqrt(1 + 0.99**2 + dirs[0, w // 2][0] ** 2 * 0)
    assert abs(top[1] - expect_y) < 1e-2
    assert np.allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)


def test_jitter_stays_in_pixel():
    w, h = 64, 64
    c = cam.Camera(pos=(0, 0, 0), yaw=0.0, pitch=0.0)
    _, d0 = cam.generate_rays(c, w, h)
    jitter = jnp.full((h, w, 2), 0.999)
    _, d1 = cam.generate_rays(c, w, h, jitter=jitter)
    # max angular deviation is about one pixel: 2/h radians-ish
    cosang = np.sum(np.asarray(d0) * np.asarray(d1), axis=-1)
    assert (cosang > np.cos(2 * (2.0 / h))).all()
    assert (cosang < 1.0).all()
