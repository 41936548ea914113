"""Motion-only pose optimization: robust Levenberg-Marquardt on SE(3).

TPU-native replacement for Optimizer::PoseOptimization
(src/Optimizer.cc:243-457): the reference builds a g2o graph with one SE3
vertex and N mono reprojection edges, runs 4 rounds x 10 LM iterations,
re-classifying outliers at chi2 = 5.991 between rounds. Here the same
schedule runs as nested lax.fori_loops over fixed-shape arrays — residuals,
analytic Jacobians, the 6x6 normal system and the Huber IRLS weights are all
batched; there is no graph, only masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera

CHI2_MONO = 5.991
HUBER_DELTA = 2.4476  # sqrt(5.991), the reference's deltaMono


def reproj_residual_jac(cam: Camera, T: jnp.ndarray, Xw: jnp.ndarray, uv: jnp.ndarray):
    """Residuals and analytic Jacobians of the mono reprojection error.

    T: [3, 4] camera-from-world; Xw: [N, 3]; uv: [N, 2].
    Returns (r [N, 2], J [N, 2, 6], depth_ok [N]). Twist layout (rho, omega),
    left-multiplicative perturbation exp(d) * T — same parametrization g2o's
    SE3Quat uses, so damping/termination behavior is comparable.
    """
    xc = se3.apply(T, Xw)
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    r = jnp.stack([u, v], -1) - uv

    # d(uv)/d(xc)
    du = jnp.stack([cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * x * inv_z * inv_z], -1)
    dv = jnp.stack([jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * y * inv_z * inv_z], -1)
    duv_dxc = jnp.stack([du, dv], -2)  # [N, 2, 3]

    # d(xc)/d(twist) = [I | -hat(xc)]
    N = Xw.shape[0]
    I = jnp.broadcast_to(jnp.eye(3, dtype=Xw.dtype), (N, 3, 3))
    from eao_slam_tpu.geometry import so3

    dxc = jnp.concatenate([I, -so3.hat(xc)], axis=-1)  # [N, 3, 6]
    J = duv_dxc @ dxc  # [N, 2, 6]
    return r, J, z > 1e-6


def huber_weight(chi2: jnp.ndarray, delta: float = HUBER_DELTA) -> jnp.ndarray:
    """IRLS weight of the Huber kernel on the whitened residual norm."""
    chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(chi <= delta, 1.0, delta / chi)


class PoseOptResult(NamedTuple):
    T: jnp.ndarray        # [3, 4] optimized pose
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray
    chi2: jnp.ndarray     # [N] final whitened chi2


@partial(jax.jit, static_argnames=("cam", "schedule"))
def optimize_pose(
    cam: Camera,
    T0: jnp.ndarray,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    schedule: tuple = (4, 3, 2, 1),
) -> PoseOptResult:
    """Robust LM schedule of PoseOptimization (src/Optimizer.cc:243).

    Xw: [N, 3] matched map points, uv: [N, 2] observations, inv_sigma2: [N]
    per-octave information, valid: [N] initial match mask.

    The reference runs 4 rounds x 10 g2o-LM iterations with a chi2=5.991
    outlier re-classification between rounds. Here each `schedule` entry is
    one such round; the default (4, 3, 2, 1) keeps the 4 re-classification
    rounds but totals 10 inner iterations — with a constant-velocity prior
    the pose converges in <=4 iterations, and on TPU each iteration is a
    latency-bound sequential step (~50 us), so 40 of them cost more than
    they converge. Each iteration evaluates residuals ONCE (the classic
    accept/reject second evaluation is replaced by best-so-far tracking:
    steps always proceed from the current pose, damping adapts on cost
    change, and the best-cost pose wins the round).
    """

    def chi2_of(T):
        r, _, depth_ok = reproj_residual_jac(cam, T, Xw, uv)
        c2 = jnp.sum(r * r, -1) * inv_sigma2
        return jnp.where(depth_ok, c2, 1e9)

    def cost_of(T, active):
        r, _, depth_ok = reproj_residual_jac(cam, T, Xw, uv)
        c2 = jnp.sum(r * r, -1) * inv_sigma2
        return jnp.sum(jnp.where(active & depth_ok, _huber_cost(c2), 0.0))

    def lm_round(T, active, iters):
        lam0 = jnp.float32(1e-3)

        def lm_step(_, carry):
            T, lam, T_best, cost_best = carry
            r, J, depth_ok = reproj_residual_jac(cam, T, Xw, uv)
            m = active & depth_ok
            c2 = jnp.sum(r * r, -1) * inv_sigma2
            w = huber_weight(c2) * inv_sigma2 * m.astype(r.dtype)
            H = jnp.einsum("nki,n,nkj->ij", J, w, J)
            b = jnp.einsum("nki,n,nk->i", J, w, r)
            cost = jnp.sum(jnp.where(m, _huber_cost(c2), 0.0))

            better = cost < cost_best
            T_best = jnp.where(better, T, T_best)
            cost_best = jnp.minimum(cost, cost_best)
            lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-6, 1e3)

            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            delta = -jnp.linalg.solve(Hd, b)
            # trust region + SO(3) re-projection (see se3.orthonormalize)
            dn = jnp.linalg.norm(delta)
            delta = delta * jnp.minimum(1.0, 1.0 / jnp.maximum(dn, 1e-12))
            T = se3.orthonormalize(se3.compose(se3.exp(delta), T))
            return T, lam, T_best, cost_best

        T, _, T_best, cost_best = jax.lax.fori_loop(
            0, iters, lm_step, (T, lam0, T, jnp.float32(jnp.inf))
        )
        # the last step's pose was never costed — give it its shot
        return jnp.where(cost_of(T, active) < cost_best, T, T_best)

    T = T0
    active = valid
    for iters in schedule:
        T = lm_round(T, active, iters)
        # re-classify against all original matches, like the reference's
        # per-round setLevel(0/1) with chi2 5.991
        active = valid & (chi2_of(T) < CHI2_MONO)
    c2 = chi2_of(T)
    inliers = valid & (c2 < CHI2_MONO)
    return PoseOptResult(T=T, inliers=inliers, n_inliers=jnp.sum(inliers), chi2=c2)


def _huber_cost(chi2: jnp.ndarray, delta: float = HUBER_DELTA) -> jnp.ndarray:
    chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    quad = chi2
    lin = 2.0 * delta * chi - delta * delta
    return jnp.where(chi <= delta, quad, lin)
