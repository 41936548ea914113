"""Batched two-view triangulation and depth checks.

TPU-native replacement for the per-match SVD triangulation in the
reference's Initializer::Triangulate (src/Initializer.cc) and
LocalMapping::CreateNewMapPoints (src/LocalMapping.cc:327-342). Instead of
one 4x4 SVD per match in a loop, we solve the whole batch at once: the DLT
normal equations are 4x4 symmetric, so the smallest singular vector is
recovered via an eigendecomposition of A^T A — batched, no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera


def _dlt_rows(P: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows per view: (..., 3, 4) projection, (..., 2) normalized
    image coords -> (..., 2, 4)."""
    r0 = xn[..., 0:1] * P[..., 2, :] - P[..., 0, :]
    r1 = xn[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    return jnp.stack([r0, r1], axis=-2)


def triangulate(
    T1: jnp.ndarray,
    T2: jnp.ndarray,
    xn1: jnp.ndarray,
    xn2: jnp.ndarray,
) -> jnp.ndarray:
    """Triangulate batched correspondences in *normalized* camera coords.

    T1, T2: (..., 3, 4) camera-from-world poses; xn1, xn2: (..., 2).
    Returns world points (..., 3).
    """
    A = jnp.concatenate([_dlt_rows(T1, xn1), _dlt_rows(T2, xn2)], axis=-2)  # (..., 4, 4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    # Smallest eigenvector of the symmetric 4x4 — batched eigh is cheap and
    # XLA-friendly (fixed 4x4 blocks).
    _, V = jnp.linalg.eigh(AtA)
    X = V[..., :, 0]
    w = X[..., 3]
    return X[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)[..., None]


def pixels_to_normalized(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )


def check_triangulation(
    cam: Camera,
    T1: jnp.ndarray,
    T2: jnp.ndarray,
    Xw: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    sigma2: jnp.ndarray,
    max_reproj_chi2: float = 5.991,
    min_parallax_cos: float = 0.9998,
) -> jnp.ndarray:
    """Validity mask for triangulated points, replicating the gates in
    Initializer::CheckRT / LocalMapping::CreateNewMapPoints: finite, positive
    depth in both views, reprojection chi2 under threshold, enough parallax.
    """
    from eao_slam_tpu.geometry.camera import project

    xc1 = se3.apply(T1, Xw)
    xc2 = se3.apply(T2, Xw)
    ok = (xc1[..., 2] > 1e-6) & (xc2[..., 2] > 1e-6)
    ok &= jnp.all(jnp.isfinite(Xw), axis=-1)

    e1 = project(cam, xc1) - uv1
    e2 = project(cam, xc2) - uv2
    ok &= jnp.sum(e1 * e1, axis=-1) / sigma2 < max_reproj_chi2
    ok &= jnp.sum(e2 * e2, axis=-1) / sigma2 < max_reproj_chi2

    c1 = Xw - se3.trans(se3.inverse(T1))
    c2 = Xw - se3.trans(se3.inverse(T2))
    cos_par = jnp.sum(c1 * c2, axis=-1) / (
        jnp.linalg.norm(c1, axis=-1) * jnp.linalg.norm(c2, axis=-1) + 1e-12
    )
    ok &= cos_par < min_parallax_cos
    return ok
