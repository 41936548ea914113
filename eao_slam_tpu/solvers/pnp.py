"""EPnP + RANSAC: absolute pose from 2D-3D matches for relocalization.

TPU-native replacement for PnPsolver (src/PnPsolver.cc — EPnP with 4
control points + Gauss-Newton inside a RANSAC loop, used by
Tracking::Relocalization, src/Tracking.cc:2184-2343). All hypotheses run
as one fixed batch: each draws `sample_size` correspondences, solves the
EPnP case-1 system (null vector of M^T M scaled to preserve control-point
distances), recovers (R, t) by rigid Horn alignment, and scores inliers by
reprojection chi2. The winner is polished by the robust pose LM
(solvers/pose_lm.py) on its consensus set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera, project
from eao_slam_tpu.solvers.pose_lm import optimize_pose

CHI2_PNP = 5.991


def _control_points(X: jnp.ndarray, w: jnp.ndarray):
    """EPnP control points: centroid + principal axes. X: [n, 3], w: [n]."""
    wn = w / jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.einsum("n,ni->i", wn, X)
    Xc = X - c0
    cov = jnp.einsum("n,ni,nj->ij", wn, Xc, Xc)
    eigval, eigvec = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-9))
    C = jnp.concatenate([c0[None], c0[None] + scale[:, None] * eigvec.T], axis=0)
    return C  # [4, 3]


def _barycentric(X: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """alphas st X = sum_j a_j C_j, sum a = 1. X: [n, 3] -> [n, 4]."""
    M = jnp.concatenate([C.T, jnp.ones((1, 4))], axis=0)           # [4, 4]
    Xh = jnp.concatenate([X, jnp.ones((X.shape[0], 1))], axis=1)   # [n, 4]
    return (jnp.linalg.inv(M) @ Xh.T).T


def _rigid_horn(x: jnp.ndarray, y: jnp.ndarray):
    """Rigid y ≈ R x + t (no scale). x, y: [n, 3]."""
    mx, my = x.mean(0), y.mean(0)
    cov = (y - my).T @ (x - mx)
    U, _, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0])).at[2, 2].set(det)
    R = U @ D @ Vt
    t = my - R @ mx
    return R, t


def _epnp_once(cam: Camera, X: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """EPnP case-1 pose from a minimal sample. X: [n, 3], uv: [n, 2] -> [3, 4]."""
    n = X.shape[0]
    C = _control_points(X, jnp.ones((n,)))
    A = _barycentric(X, C)                                          # [n, 4]

    u = (uv[:, 0] - cam.cx) / cam.fx
    v = (uv[:, 1] - cam.cy) / cam.fy
    # rows: sum_j a_j (x_j - u z_j) = 0 ; sum_j a_j (y_j - v z_j) = 0
    # unknown layout: 12-vector of control-point camera coords (x,y,z)x4
    zeros = jnp.zeros_like(A)
    row_u = jnp.stack([A, zeros, -A * u[:, None]], axis=-1).reshape(n, 12)
    row_v = jnp.stack([zeros, A, -A * v[:, None]], axis=-1).reshape(n, 12)
    M = jnp.concatenate([row_u, row_v], axis=0)                     # [2n, 12]

    MtM = M.T @ M
    _, V = jnp.linalg.eigh(MtM)
    x = V[:, 0].reshape(4, 3)       # control points in camera frame, up to beta

    # case-1 beta: preserve inter-control-point distances
    dC = jnp.linalg.norm(C[:, None] - C[None, :], axis=-1)
    dx = jnp.linalg.norm(x[:, None] - x[None, :], axis=-1)
    beta = jnp.sum(dx * dC) / jnp.maximum(jnp.sum(dx * dx), 1e-12)
    Cc = beta * x
    # cheirality: points must end up in front of the camera
    pc = A @ Cc
    flip = jnp.where(jnp.sum(pc[:, 2]) < 0, -1.0, 1.0)
    Cc = Cc * flip

    R, t = _rigid_horn(C, Cc)
    return se3.make(R, t)


class PnPResult(NamedTuple):
    T: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    success: jnp.ndarray


@partial(jax.jit, static_argnames=("cam", "n_hyp", "sample_size", "min_inliers"))
def pnp_ransac(
    cam: Camera,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 192,
    sample_size: int = 8,
    min_inliers: int = 12,
) -> PnPResult:
    """Batched-hypothesis EPnP RANSAC + robust LM polish."""
    N = Xw.shape[0]
    p = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1)
    idx = jax.random.choice(key, N, shape=(n_hyp, sample_size), p=p)

    Ts = jax.vmap(lambda i: _epnp_once(cam, Xw[i], uv[i]))(idx)     # [B, 3, 4]

    def count(T):
        xc = se3.apply(T, Xw)
        r = project(cam, xc) - uv
        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        return valid & (xc[..., 2] > 0.05) & (chi2 < CHI2_PNP)

    inl = jax.vmap(count)(Ts)
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    T0 = Ts[best]
    consensus = inl[best]

    res = optimize_pose(cam, T0, Xw, uv, inv_sigma2, consensus)
    ok = res.n_inliers >= min_inliers
    return PnPResult(T=res.T, inliers=res.inliers, n_inliers=res.n_inliers,
                     success=ok)
