"""Sim(3) estimation between two keyframes: Horn + RANSAC + LM refinement.

TPU-native replacement for Sim3Solver (src/Sim3Solver.cc — Horn's
closed-form absolute orientation inside a RANSAC loop with mutual
reprojection checks) and Optimizer::OptimizeSim3 (src/Optimizer.cc:
1063-1260 — g2o LM over one Sim3 vertex with bidirectional reprojection
edges). RANSAC runs as a fixed batch of hypotheses; the LM refinement is a
fori_loop with autodiff-free analytic residuals.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import sim3, so3
from eao_slam_tpu.geometry.camera import Camera, project

CHI2_SIM3 = 9.210   # 2-dof 99% (the reference's th2 per-octave gate)


def horn_sim3(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted closed-form similarity y ≈ s R x + t (Horn 1987, the same
    construction Sim3Solver::ComputeSim3 uses). x, y: [..., N, 3]; w: [..., N].
    Returns Sim3 (..., 8)."""
    wn = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    mx = jnp.einsum("...n,...ni->...i", wn, x)
    my = jnp.einsum("...n,...ni->...i", wn, y)
    xc = x - mx[..., None, :]
    yc = y - my[..., None, :]
    cov = jnp.einsum("...n,...ni,...nj->...ij", wn, yc, xc)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    R = U @ (S[..., :, None] * Vt)
    var_x = jnp.einsum("...n,...ni,...ni->...", wn, xc, xc)
    s = jnp.einsum("...i,...i->...", D, S) / jnp.maximum(var_x, 1e-12)
    t = my - s[..., None] * jnp.einsum("...ij,...j->...i", R, mx)
    return sim3.make(R, t, jnp.maximum(s, 1e-6))


class Sim3Result(NamedTuple):
    S12: jnp.ndarray       # [8] Sim3 mapping camera-2 coords -> camera-1 coords
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray
    success: jnp.ndarray


@partial(jax.jit, static_argnames=("cam", "n_hyp", "min_inliers"))
def solve_sim3_ransac(
    cam: Camera,
    xc1: jnp.ndarray,
    xc2: jnp.ndarray,
    valid: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 128,
    min_inliers: int = 20,
) -> Sim3Result:
    """Batched-hypothesis RANSAC over matched camera-frame points.

    xc1/xc2: [N, 3] the same map points in the two keyframes' camera frames
    (the reference feeds camera-frame coordinates, src/Sim3Solver.cc:60-80);
    valid: [N] match mask; sigma2_*: per-match octave variances for the
    mutual reprojection gate.
    """
    N = xc1.shape[0]
    p = valid.astype(jnp.float32) / jnp.maximum(jnp.sum(valid), 1)
    idx = jax.random.choice(key, N, shape=(n_hyp, 3), p=p)
    S = horn_sim3(xc2[idx], xc1[idx], jnp.ones((n_hyp, 3)))     # [B, 8]

    def count_inliers(Sb):
        return _mutual_inliers(cam, Sb, xc1, xc2, valid, sigma2_1, sigma2_2)

    inl = jax.vmap(count_inliers)(S)                            # [B, N]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    S_best = S[best]
    inliers = inl[best]

    # polish on inliers (weighted Horn, one round like the reference's
    # refine-with-all-inliers)
    S_ref = horn_sim3(xc2, xc1, inliers.astype(jnp.float32))
    inl_ref = _mutual_inliers(cam, S_ref, xc1, xc2, valid, sigma2_1, sigma2_2)
    better = jnp.sum(inl_ref) >= jnp.sum(inliers)
    S_best = jnp.where(better, S_ref, S_best)
    inliers = jnp.where(better, inl_ref, inliers)

    n = jnp.sum(inliers)
    return Sim3Result(
        S12=S_best, inliers=inliers, n_inliers=n, success=n >= min_inliers
    )


def _mutual_inliers(cam, S12, xc1, xc2, valid, sigma2_1, sigma2_2):
    """Mutual reprojection gate (Sim3Solver::CheckInliers)."""
    proj1 = project(cam, sim3.apply(S12, xc2))   # points-2 into image 1
    proj2 = project(cam, sim3.apply(sim3.inverse(S12), xc1))
    uv1 = project(cam, xc1)
    uv2 = project(cam, xc2)
    e1 = jnp.sum((proj1 - uv1) ** 2, -1)
    e2 = jnp.sum((proj2 - uv2) ** 2, -1)
    return valid & (e1 < CHI2_SIM3 * sigma2_1) & (e2 < CHI2_SIM3 * sigma2_2)


@partial(jax.jit, static_argnames=("cam", "iters"))
def optimize_sim3(
    cam: Camera,
    S12: jnp.ndarray,
    xc1: jnp.ndarray,
    xc2: jnp.ndarray,
    valid: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    iters: int = 10,
    huber2: float = 10.0,
) -> Sim3Result:
    """LM over the 7-dof Sim3 with bidirectional reprojection residuals
    (OptimizeSim3, src/Optimizer.cc:1063-1260; huber delta^2 = 10)."""
    delta = jnp.sqrt(huber2)

    def residuals(S):
        r1 = project(cam, sim3.apply(S, xc2)) - project(cam, xc1)
        r2 = project(cam, sim3.apply(sim3.inverse(S), xc1)) - project(cam, xc2)
        return r1, r2

    def cost_of(S):
        r1, r2 = residuals(S)
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
        m = valid.astype(jnp.float32)

        def hub(c):
            chi = jnp.sqrt(jnp.maximum(c, 1e-12))
            return jnp.where(chi <= delta, c, 2 * delta * chi - delta * delta)

        return jnp.sum(m * (hub(c1) + hub(c2)))

    def step(_, carry):
        S, lam = carry

        # IRLS weights frozen at the current estimate — differentiating
        # through the Huber weight cancels most of the gradient signal
        r1c, r2c = residuals(S)
        m = valid.astype(jnp.float32)[:, None]

        def w_of(c, inv_s2):
            chi2 = jnp.sum(c * c, -1) * inv_s2
            chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            return jnp.sqrt(jnp.where(chi <= delta, 1.0, delta / chi) * inv_s2)

        w1 = w_of(r1c, inv_sigma2_1)[:, None]
        w2 = w_of(r2c, inv_sigma2_2)[:, None]

        def res_vec(xi):
            Sx = sim3.retract(S, xi)
            r1, r2 = residuals(Sx)
            return jnp.concatenate([(r1 * w1 * m).ravel(), (r2 * w2 * m).ravel()])

        xi0 = jnp.zeros((7,))
        J = jax.jacfwd(res_vec)(xi0)        # [2*2N, 7]
        r = res_vec(xi0)
        H = J.T @ J
        b = J.T @ r
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7)
        dx = -jnp.linalg.solve(Hd, b)
        dx = dx * jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.linalg.norm(dx), 1e-12))
        S_new = sim3.retract(S, dx)
        accept = cost_of(S_new) < cost_of(S)
        S = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), S_new, S)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-6, 1e3)
        return S, lam

    S, _ = jax.lax.fori_loop(0, iters, step, (S12, jnp.float32(1e-3)))

    r1, r2 = residuals(S)
    c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
    c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
    inliers = valid & (c1 < huber2) & (c2 < huber2)
    n = jnp.sum(inliers)
    return Sim3Result(S12=S, inliers=inliers, n_inliers=n, success=n >= 10)


def optimize_sim3_schedule(cam, S12, xc1, xc2, valid, inv_s2_1, inv_s2_2):
    """The reference's OptimizeSim3 schedule: 5 iterations, drop chi2>10
    correspondences, then 10 more on the survivors (src/Optimizer.cc:
    1201-1235)."""
    r1 = optimize_sim3(cam, S12, xc1, xc2, valid, inv_s2_1, inv_s2_2, iters=5)
    r2 = optimize_sim3(
        cam, r1.S12, xc1, xc2, valid & r1.inliers, inv_s2_1, inv_s2_2, iters=10
    )
    return r2
