"""Pinhole camera model with radial-tangential distortion.

Mirrors the intrinsics contract of the reference's YAML configs
(Examples/Monocular/TUM3.yaml: fx fy cx cy k1 k2 p1 p2 k3) and the
cv::undistort / UndistortKeyPoints paths (src/Tracking.cc:349-385,
src/Frame.cc). All ops are batched jnp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Static camera intrinsics. Kept as a NamedTuple of Python floats so it
    hashes as a jit-static argument and never triggers retraces."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    fps: float = 30.0

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


# TUM freiburg3 intrinsics (Examples/Monocular/TUM3.yaml:4-16 — zero distortion).
TUM3 = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480, fps=30.0)
# TUM freiburg1/freiburg2 (Examples/Monocular/TUM1.yaml, TUM2.yaml).
TUM1 = Camera(517.306408, 516.469215, 318.643040, 255.313989,
              0.262383, -0.953104, -0.005358, 0.002628, 1.163314, 640, 480, 30.0)
TUM2 = Camera(520.908620, 521.007327, 325.141442, 249.701764,
              0.231222, -0.784899, -0.003257, -0.000105, 0.917205, 640, 480, 30.0)
# KITTI odometry grayscale/color rectified intrinsics
# (Examples/Monocular/KITTI00-02.yaml, KITTI03.yaml, KITTI04-12.yaml).
KITTI00_02 = Camera(718.856, 718.856, 607.1928, 185.2157,
                    width=1241, height=376, fps=10.0)
KITTI03 = Camera(721.5377, 721.5377, 609.5593, 172.854,
                 width=1242, height=375, fps=10.0)
KITTI04_12 = Camera(707.0912, 707.0912, 601.8873, 183.1104,
                    width=1226, height=370, fps=10.0)
# EuRoC MAV cam0 (Examples/Monocular/EuRoC.yaml).
EUROC = Camera(458.654, 457.296, 367.215, 248.375,
               -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0,
               752, 480, 20.0)


def project(cam: Camera, xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixel coords (..., 2). No distortion
    (the reference matches/optimizes in undistorted pixel space)."""
    z = xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xc[..., 0] * inv_z + cam.cx
    v = cam.fy * xc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def backproject(cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def distort_normalized(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def undistort_points(cam: Camera, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Iteratively invert the distortion (cv::undistortPoints semantics;
    reference applies it to all keypoints, src/Frame.cc UndistortKeyPoints).

    Fixed iteration count keeps it jit-friendly; 8 Newton-free fixed-point
    steps match OpenCV's default behavior to sub-0.01px for TUM lenses.
    """
    if not cam.has_distortion:
        return uv
    xd = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1)
    xn = xd
    for _ in range(iters):
        d = distort_normalized(cam, xn) - xn  # pure-distortion delta
        xn = xd - d
    return jnp.stack([xn[..., 0] * cam.fx + cam.cx, xn[..., 1] * cam.fy + cam.cy], axis=-1)


def in_image(cam: Camera, uv: jnp.ndarray, border: float = 0.0) -> jnp.ndarray:
    """Visibility mask for pixel coords (matches Frame::isInFrustum bounds)."""
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] < cam.width - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] < cam.height - border)
    )
