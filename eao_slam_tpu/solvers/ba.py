"""Bundle adjustment: batched robust LM with Schur-complement reduction.

TPU-native replacement for the g2o BA stack (Optimizer::GlobalBundleAdjustemnt
src/Optimizer.cc:45-241 and ::LocalBundleAdjustment :459-796, SURVEY.md §2.2
g2o row): instead of a sparse pointer graph, the problem is four fixed-shape
arrays — camera poses [K, 3, 4], points [P, 3], and an observation table
(kf_idx, pt_idx, uv, inv_sigma2, valid) [O]. One LM iteration is:

    residuals/Jacobians  (batched, analytic)
    Hcc [K,6,6], Hpp [P,3,3]  via segment-sum scatters
    W   [K,P,6,3]             via 2-D scatter (one obs per (cam, point))
    S = Hcc - W Hpp^-1 W^T    one einsum  ->  dense [6K, 6K] MXU solve
    point back-substitution   batched 3x3 solves

Fixed cameras are masked out of the reduced system (identity rows). The same
machinery serves local-window BA (small K, frontier fixed — the reference's
5+10 iteration schedule) and full global BA (first camera fixed).

For pod-scale problems, `parallel/dist_ba.py` shards the observation table
and psum-reduces S — this module is the single-chip core.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3, so3
from eao_slam_tpu.geometry.camera import Camera
from eao_slam_tpu.solvers.pose_lm import HUBER_DELTA, huber_weight, _huber_cost

CHI2_MONO = 5.991


class BAProblem(NamedTuple):
    poses: jnp.ndarray       # [K, 3, 4] camera-from-world
    points: jnp.ndarray      # [P, 3]
    kf_idx: jnp.ndarray      # [O] int32
    pt_idx: jnp.ndarray      # [O] int32
    uv: jnp.ndarray          # [O, 2]
    inv_sigma2: jnp.ndarray  # [O]
    obs_valid: jnp.ndarray   # [O] bool
    cam_fixed: jnp.ndarray   # [K] bool (gauge / frontier)
    cam_valid: jnp.ndarray   # [K] bool
    pt_valid: jnp.ndarray    # [P] bool


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # [O] bool — chi2 < 5.991 at the solution
    cost: jnp.ndarray


def _residuals(cam: Camera, prob: BAProblem, poses, points):
    """Per-observation residuals + Jacobians wrt camera twist and point."""
    T = poses[prob.kf_idx]          # [O, 3, 4]
    Xw = points[prob.pt_idx]        # [O, 3]
    xc = se3.apply(T, Xw)
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    z_safe = jnp.where(z < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    r = jnp.stack([u, v], -1) - prob.uv

    du = jnp.stack([cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * x * inv_z * inv_z], -1)
    dv = jnp.stack([jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * y * inv_z * inv_z], -1)
    duv_dxc = jnp.stack([du, dv], -2)            # [O, 2, 3]

    O = r.shape[0]
    I = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (O, 3, 3))
    Jc = duv_dxc @ jnp.concatenate([I, -so3.hat(xc)], axis=-1)   # [O, 2, 6]
    Jp = duv_dxc @ se3.rot(T)                                     # [O, 2, 3]
    return r, Jc, Jp, z > 1e-6


def _weights(prob: BAProblem, r, depth_ok):
    chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
    m = prob.obs_valid & depth_ok & prob.pt_valid[prob.pt_idx] & prob.cam_valid[prob.kf_idx]
    w = huber_weight(chi2) * prob.inv_sigma2 * m.astype(r.dtype)
    cost = jnp.sum(jnp.where(m, _huber_cost(chi2), 0.0))
    return w, cost, chi2, m


def _cost_only(cam, prob, poses, points):
    r, _, _, depth_ok = _residuals(cam, prob, poses, points)
    _, cost, _, _ = _weights(prob, r, depth_ok)
    return cost


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) batched 3x3 inverse.

    jnp.linalg.inv on [P, 3, 3] lowers to an LU custom call that profiled
    at ~11 ms PER LM ITERATION inside the windowed-BA loop on v5e; the
    adjugate is ~40 fused elementwise ops.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    rows = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return rows * inv_det[..., None, None]


class _Gather(NamedTuple):
    """Iteration-invariant one-hot scatter matrices for system assembly.

    XLA scatter-add on TPU serializes (profiled ~60 ms per LM iteration
    for the [K, P, 6, 3] Wcp scatter at W=16, Pl=2048); these turn every
    assembly into an MXU matmul. Built ONCE per solve — pt_idx/kf_idx
    never change across LM iterations. Layout-agnostic: any observation
    order works.
    """

    Mk: jnp.ndarray   # [K, O] bf16 one-hot of kf_idx
    Mp: jnp.ndarray   # [P, O] bf16 one-hot of pt_idx


def _build_gather(prob: BAProblem) -> _Gather:
    K = prob.poses.shape[0]
    P = prob.points.shape[0]
    Mk = (
        jnp.arange(K, dtype=jnp.int32)[:, None] == prob.kf_idx[None, :]
    ).astype(jnp.bfloat16)
    Mp = (
        jnp.arange(P, dtype=jnp.int32)[:, None] == prob.pt_idx[None, :]
    ).astype(jnp.bfloat16)
    return _Gather(Mk=Mk, Mp=Mp)


def _mm(M: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """bf16-one-hot @ f32 tail matmul with exact selection (hi/lo split)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    return (
        jax.lax.dot_general(M, hi, dims, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(M, lo, dims, preferred_element_type=jnp.float32)
    )


def _lm_system(cam: Camera, prob: BAProblem, poses, points, G: _Gather):
    """Assemble the blocks of the normal equations (matmul scatter)."""
    r, Jc, Jp, depth_ok = _residuals(cam, prob, poses, points)
    w, cost, chi2, m = _weights(prob, r, depth_ok)
    K = prob.poses.shape[0]
    P = prob.points.shape[0]
    O = r.shape[0]

    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    occ = jnp.einsum("oki,okj->oij", wJc, Jc).reshape(O, 36)
    opp = jnp.einsum("oki,okj->oij", wJp, Jp).reshape(O, 9)
    ocp = jnp.einsum("oki,okj->oij", wJc, Jp).reshape(O, 18)
    obc = jnp.einsum("oki,ok->oi", wJc, r)
    obp = jnp.einsum("oki,ok->oi", wJp, r)

    Hcc = _mm(G.Mk, occ).reshape(K, 6, 6)
    bc = _mm(G.Mk, obc)
    Hpp = _mm(G.Mp, opp).reshape(P, 3, 3)
    bp = _mm(G.Mp, obp)
    # Wcp[k, p] = sum over obs of kf k on point p: mask ocp by each kf's
    # one-hot row, then one [P, O] @ [O, K*18] matmul
    masked = ocp[:, None, :] * G.Mk.T[:, :, None].astype(ocp.dtype)  # [O, K, 18]
    Wcp = _mm(G.Mp, masked.reshape(O, K * 18)).reshape(P, K, 6, 3)
    Wcp = Wcp.transpose(1, 0, 2, 3)                                  # [K, P, 6, 3]
    return Hcc, Hpp, Wcp, bc, bp, cost


def _solve_lm_step(prob: BAProblem, Hcc, Hpp, Wcp, bc, bp, lam):
    """One damped Schur step -> (pose twists [K, 6], point deltas [P, 3])."""
    K, P = Hcc.shape[0], Hpp.shape[0]
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    # Marquardt damping: scale each block diagonal by (1 + lam), with a
    # floor so empty/degenerate blocks stay invertible
    diag_p = jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-8)  # [P, 3]
    # relative floor keeps single-observation (rank-2) point blocks from
    # exploding the Schur cancellation in float32
    floor_p = 1e-5 * jnp.max(diag_p, axis=1, keepdims=True) + 1e-8
    Hpp_d = Hpp + (lam * diag_p + floor_p)[:, :, None] * eye3[None]
    Binv = inv3x3(Hpp_d)  # [P, 3, 3] (closed form; LU custom call is ~100x slower)

    diag_c = jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-8)  # [K, 6]
    Hcc_d = Hcc + lam * diag_c[:, :, None] * eye6[None]

    # S = Hcc_d - W Binv W^T ; rhs = -(bc - W Binv bp)
    WB = jnp.einsum("kpij,pjl->kpil", Wcp, Binv)          # [K, P, 6, 3]
    S_off = jnp.einsum("kpil,qpml->kqim", WB, Wcp)        # [K, K, 6, 6]
    S = -S_off
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)
    rhs = -(bc - jnp.einsum("kpil,pl->ki", WB, bp))       # [K, 6]

    # mask fixed/invalid cameras: identity rows, zero rhs
    free = (~prob.cam_fixed) & prob.cam_valid
    free_f = free.astype(S.dtype)
    S = S * free_f[:, None, None, None] * free_f[None, :, None, None]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        (1.0 - free_f)[:, None, None] * eye6[None]
    )
    rhs = rhs * free_f[:, None]

    Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    dc = jnp.linalg.solve(Sd + 1e-8 * jnp.eye(6 * K), rhs.reshape(-1)).reshape(K, 6)
    dc = dc * free_f[:, None]

    # back-substitute points: dp = Binv (-bp - W^T dc)
    rhs_p = -bp - jnp.einsum("kpij,ki->pj", Wcp, dc)
    dp = jnp.einsum("pij,pj->pi", Binv, rhs_p)
    dp = dp * prob.pt_valid[:, None].astype(dp.dtype)
    return dc, dp


@partial(jax.jit, static_argnames=("cam", "iters"))
def bundle_adjust(cam: Camera, prob: BAProblem, iters: int = 10, lam0: float = 1e-4) -> BAResult:
    """Robust LM BA. Matches the reference's schedules: GlobalBA uses 20
    iterations at init / 10 at loop close; LocalBA runs 5 then 10 with an
    outlier re-classification in between (drive that from the caller by
    invoking twice and masking obs_valid)."""

    G = _build_gather(prob)

    def step(_, carry):
        poses, points, lam = carry
        Hcc, Hpp, Wcp, bc, bp, cost = _lm_system(cam, prob, poses, points, G)
        dc, dp = _solve_lm_step(prob, Hcc, Hpp, Wcp, bc, bp, lam)
        # trust region on the twist: a huge step would push se3.exp outside
        # its float32-accurate range and R off SO(3)
        dc_norm = jnp.linalg.norm(dc, axis=-1, keepdims=True)
        dc = dc * jnp.minimum(1.0, 1.0 / jnp.maximum(dc_norm, 1e-12))
        new_poses = jax.vmap(
            lambda d, T: se3.orthonormalize(se3.compose(se3.exp(d), T))
        )(dc, poses)
        new_points = points + dp
        new_cost = _cost_only(cam, prob, new_poses, new_points)
        finite = (
            jnp.all(jnp.isfinite(new_poses))
            & jnp.all(jnp.isfinite(new_points))
            & jnp.isfinite(new_cost)
        )
        accept = (new_cost < cost) & finite
        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0), 1e-8, 1e4)
        return poses, points, lam

    poses, points, _ = jax.lax.fori_loop(
        0, iters, step, (prob.poses, prob.points, jnp.float32(lam0))
    )

    r, _, _, depth_ok = _residuals(cam, prob, poses, points)
    chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
    inlier = prob.obs_valid & depth_ok & (chi2 < CHI2_MONO)
    cost = _cost_only(cam, prob, poses, points)
    return BAResult(poses=poses, points=points, obs_inlier=inlier, cost=cost)


def local_ba(cam: Camera, prob: BAProblem) -> BAResult:
    """The reference's LocalBundleAdjustment schedule (src/Optimizer.cc:459):
    5 iterations, outlier removal at chi2 5.991, then 10 more."""
    res1 = bundle_adjust(cam, prob, iters=5)
    prob2 = prob._replace(
        poses=res1.poses, points=res1.points, obs_valid=prob.obs_valid & res1.obs_inlier
    )
    return bundle_adjust(cam, prob2, iters=10)
