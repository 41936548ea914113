"""SE(3) rigid transforms as (R, t) pairs packed in (..., 3, 4) arrays.

Replaces the reference's cv::Mat 4x4 `Tcw` plumbing (e.g. Frame::SetPose,
src/Frame.cc) with batched jnp ops. A pose is camera-from-world unless
stated otherwise, matching ORB-SLAM2's Tcw convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from eao_slam_tpu.geometry import so3


def make(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pack (..., 3, 3) rotation and (..., 3) translation -> (..., 3, 4)."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype=dtype)], axis=-1)


def rot(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def trans(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def apply(T: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Transform points: (..., 3, 4) @ (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", rot(T), x) + trans(T)


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A then-applied-after B: result(x) = A(B(x))."""
    R = rot(A) @ rot(B)
    t = jnp.einsum("...ij,...j->...i", rot(A), trans(B)) + trans(A)
    return make(R, t)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    Rt = jnp.swapaxes(rot(T), -1, -2)
    return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, trans(T)))


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential of a (..., 6) twist (rho, omega) -> (..., 3, 4).

    Twist layout matches g2o's SE3Quat::exp used by the reference optimizer
    (translation first, rotation last), so LM updates are interchangeable.
    """
    rho, omega = xi[..., :3], xi[..., 3:]
    R = so3.exp(omega)
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-16)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + 1e-16))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / (theta2 + 1e-16))
    W = so3.hat(omega)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = I + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm -> (..., 6) twist (rho, omega)."""
    omega = so3.log(rot(T))
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-16)
    small = theta2 < 1e-8
    W = so3.hat(omega)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + 1e-16))
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B + 1e-16)) / (theta2 + 1e-16),
    )
    Vinv = I - 0.5 * W + coef[..., None, None] * (W @ W)
    rho = jnp.einsum("...ij,...j->...i", Vinv, trans(T))
    return jnp.concatenate([rho, omega], axis=-1)


def orthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block onto SO(3).

    float32 exp/compose chains inside LM loops accumulate non-orthonormal
    drift; worse, an optimizer that is allowed to keep a shrunken R gains a
    spurious zoom DOF that *reduces* reprojection cost, so solvers must
    re-project after every pose update.

    Uses two Newton iterations of the polar decomposition,
    R <- R (3I - R^T R) / 2 — quadratically convergent and exact to float32
    precision for the near-orthonormal inputs every solver produces. The
    SVD this replaces is an iterative Jacobi kernel on TPU (~100 us per LM
    step); the Newton form is two tiny fused matmuls.
    """
    R = rot(T)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    for _ in range(2):
        R = 0.5 * R @ (3.0 * I3 - jnp.swapaxes(R, -1, -2) @ R)
    return make(R, trans(T))


def orthonormalize_svd(T: jnp.ndarray) -> jnp.ndarray:
    """SVD projection onto SO(3) (closest rotation, sign-corrected). For
    inputs that may be FAR from orthonormal (e.g. averaged rotations) where
    the Newton polar iteration is not guaranteed to converge."""
    R = rot(T)
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    Rn = U @ (D[..., :, None] * Vt)
    return make(Rn, trans(T))


def to_quat_trans(T: jnp.ndarray):
    """-> ((..., 4) wxyz quaternion, (..., 3) translation). TUM export order."""
    return so3.mat_to_quat(rot(T)), trans(T)


def from_quat_trans(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return make(so3.quat_to_mat(q), t)
