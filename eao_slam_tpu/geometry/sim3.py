"""Sim(3) similarity transforms (R, t, s) for monocular loop closing.

The reference represents these as g2o::Sim3 (Thirdparty/g2o/g2o/types/sim3)
and optimizes 7-DoF essential graphs for monocular scale drift
(src/Optimizer.cc:798-1061). Here a Sim3 is a pytree-friendly (..., 8)
array: [q(wxyz), t(xyz), log_s] — log-scale so that tangent updates are
additive and the exp/log maps stay simple.
"""

from __future__ import annotations

import jax.numpy as jnp

from eao_slam_tpu.geometry import so3


def make(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    q = so3.mat_to_quat(R)
    return jnp.concatenate([q, t, jnp.log(s)[..., None]], axis=-1)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1, 0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def rot(S: jnp.ndarray) -> jnp.ndarray:
    return so3.quat_to_mat(S[..., :4])


def trans(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 4:7]


def scale(S: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(S[..., 7])


def apply(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """x' = s * R @ x + t."""
    return scale(S)[..., None] * jnp.einsum("...ij,...j->...i", rot(S), x) + trans(S)


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(A*B)(x) = A(B(x))."""
    q = so3.quat_mul(A[..., :4], B[..., :4])
    sA = scale(A)
    t = sA[..., None] * jnp.einsum("...ij,...j->...i", rot(A), trans(B)) + trans(A)
    return jnp.concatenate([q, t, (A[..., 7] + B[..., 7])[..., None]], axis=-1)


def inverse(S: jnp.ndarray) -> jnp.ndarray:
    Rt = jnp.swapaxes(rot(S), -1, -2)
    s_inv = jnp.exp(-S[..., 7])
    t = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, trans(S))
    q = so3.mat_to_quat(Rt)
    return jnp.concatenate([q, t, -S[..., 7:8]], axis=-1)


def from_se3(T: jnp.ndarray, s: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    s = jnp.asarray(s, dtype=T.dtype)
    s = jnp.broadcast_to(s, T.shape[:-2])
    return make(T[..., :3, :3], T[..., :3, 3], s)


def to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Drop scale into translation (the reference's [R, t/s] correction,
    src/LoopClosing.cc:CorrectLoop) -> (..., 3, 4)."""
    R = rot(S)
    t = trans(S) / scale(S)[..., None]
    return jnp.concatenate([R, t[..., None]], axis=-1)


def exp(v: jnp.ndarray) -> jnp.ndarray:
    """Tangent (..., 7) = (rho, omega, sigma) -> Sim3. First-order V (the
    pose-graph LM only needs a retraction, not the exact Sim3 Jacobian)."""
    rho, omega, sigma = v[..., :3], v[..., 3:6], v[..., 6]
    R = so3.exp(omega)
    q = so3.mat_to_quat(R)
    return jnp.concatenate([q, rho, sigma[..., None]], axis=-1)


def retract(S: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction: exp(v) * S."""
    return compose(exp(v), S)


def log(S: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `exp` above (first-order translation part)."""
    omega = so3.log(rot(S))
    return jnp.concatenate([trans(S), omega, S[..., 7:8]], axis=-1)
