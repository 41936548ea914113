"""SO(3) operations: rotation matrices, quaternions, exp/log maps.

TPU-native replacement for the Eigen/g2o rotation plumbing the reference
routes through `src/Converter.cc` (cv::Mat <-> Eigen <-> g2o SE3Quat).
Everything is batched, differentiable, float32-safe jnp code.

Conventions:
  - quaternions are (w, x, y, z), normalized, scalar-first.
  - rotation matrices act on column vectors: x_cam = R @ x_world + t.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a (..., 3) vector -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential map: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Uses the Rodrigues formula with Taylor fallbacks near theta=0 so it is
    safe to differentiate and jit with float32.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with series fallback near zero.
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS))
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def log(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) logarithm: (..., 3, 3) -> (..., 3) axis-angle.

    Stable for angles near 0 and pi (the pi branch extracts the axis from
    the diagonal of R + I).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # clip strictly inside (-1, 1): d/dx arccos blows up at the endpoints and
    # jnp.where does NOT stop NaN gradients from the unselected branch, which
    # poisons any autodiff through log at identity (pose-graph Jacobians)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    # Generic branch: theta / (2 sin theta) * vee(R - R^T)
    sin_t = jnp.sin(theta)
    w_generic = vee(R - jnp.swapaxes(R, -1, -2))
    scale = jnp.where(theta < 1e-3, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t + _EPS))
    w_small = scale[..., None] * w_generic
    # Near-pi branch: axis from largest diagonal of (R + I) / 2.
    Rp = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([Rp[..., 0, 0], Rp[..., 1, 1], Rp[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    cols = jnp.take_along_axis(Rp, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = cols / (jnp.linalg.norm(cols, axis=-1, keepdims=True) + _EPS)
    # Fix sign so that it agrees with vee direction.
    sign = jnp.where(jnp.sum(axis * w_generic, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign[..., None]
    near_pi = theta > (jnp.pi - 1e-3)
    return jnp.where(near_pi[..., None], w_pi, w_small)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 4) wxyz quaternion (w >= 0).

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select the numerically best one by the largest pivot.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    s0 = 0.25 / jnp.maximum(qw0, _EPS)
    c0 = jnp.stack([qw0, (m21 - m12) * s0, (m02 - m20) * s0, (m10 - m01) * s0], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    s1 = 0.25 / jnp.maximum(qx1, _EPS)
    c1 = jnp.stack([(m21 - m12) * s1, qx1, (m01 + m10) * s1, (m02 + m20) * s1], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    s2 = 0.25 / jnp.maximum(qy2, _EPS)
    c2 = jnp.stack([(m02 - m20) * s2, (m01 + m10) * s2, qy2, (m12 + m21) * s2], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    s3 = 0.25 / jnp.maximum(qz3, _EPS)
    c3 = jnp.stack([(m10 - m01) * s3, (m02 + m20) * s3, (m12 + m21) * s3, qz3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def rot_y(yaw: jnp.ndarray) -> jnp.ndarray:
    """Rotation about the world Y axis (used by cuboid yaw, like the
    reference's `rotY` cuboid parameter, include/Object.h:119)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )
