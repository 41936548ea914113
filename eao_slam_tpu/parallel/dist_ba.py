"""Distributed bundle adjustment: point blocks sharded over the device mesh.

The reference's hottest native dependency is g2o's sparse LM BA
(src/Optimizer.cc:459-796 via Thirdparty/g2o — SURVEY.md §2.2). The
single-chip replacement is solvers/ba.py; this module scales it over a
`jax.sharding.Mesh` following the Schur structure (SURVEY.md §7.1):

  * points (and their Hpp / Wcp blocks) are *sharded* over the mesh axis —
    point elimination is embarrassingly parallel;
  * poses are *replicated*; the reduced camera system
    S = Hcc - Σ_p W_p Hpp_p^-1 W_p^T is assembled with one `psum` over the
    point axis and solved identically on every device;
  * the only other collective is an `all_gather` of the (small) point
    array for residual evaluation.

Collective volume per iteration: O(K²·36) for S plus O(P·3) for points —
independent of the observation count, so scaling efficiency stays high as
observations grow (the BASELINE.md ≥70% multi-host target).

Works on any mesh — real TPU ICI or the 8-device CPU test mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera
from eao_slam_tpu.solvers.ba import (
    BAProblem,
    BAResult,
    CHI2_MONO,
    _residuals,
    _weights,
)

AXIS = "dev"


def make_ba_mesh(devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def _pad_points_to(prob: BAProblem, n_dev: int) -> BAProblem:
    """Pad the point dimension to a multiple of the mesh size."""
    Pn = prob.points.shape[0]
    rem = (-Pn) % n_dev
    if rem == 0:
        return prob
    return prob._replace(
        points=jnp.pad(prob.points, ((0, rem), (0, 0))),
        pt_valid=jnp.pad(prob.pt_valid, (0, rem)),
    )


def _shard_lm_system(cam, prob, poses, points_local):
    """Device-local normal-equation blocks for the local point shard.

    Residuals are computed on the replicated observation table (cheap);
    scatter targets are masked to the local point range so Hpp/Wcp stay
    shard-local. Hcc/bc/cost are partial sums finished by psum.
    """
    n_dev = jax.lax.axis_size(AXIS)
    Pl = points_local.shape[0]
    offset = jax.lax.axis_index(AXIS) * Pl

    points = jax.lax.all_gather(points_local, AXIS, tiled=True)  # [P, 3]
    r, Jc, Jp, depth_ok = _residuals(cam, prob, poses, points)
    w, cost_part, chi2, m = _weights(prob, r, depth_ok)
    # every device sees all observations; divide so psum(cost) is the total
    cost = jax.lax.psum(cost_part / n_dev, AXIS)

    K = prob.poses.shape[0]
    local_pt = prob.pt_idx - offset
    in_shard = (local_pt >= 0) & (local_pt < Pl)
    lp = jnp.clip(local_pt, 0, Pl - 1)
    w_loc = w * in_shard.astype(w.dtype)

    wJc = Jc * w[:, None, None]
    Hcc = jnp.zeros((K, 6, 6)).at[prob.kf_idx].add(
        jnp.einsum("oki,okj->oij", wJc / n_dev, Jc)
    )
    Hcc = jax.lax.psum(Hcc, AXIS)
    bc = jnp.zeros((K, 6)).at[prob.kf_idx].add(
        jnp.einsum("oki,ok->oi", wJc / n_dev, r)
    )
    bc = jax.lax.psum(bc, AXIS)

    wJp = Jp * w_loc[:, None, None]
    Hpp = jnp.zeros((Pl, 3, 3)).at[lp].add(jnp.einsum("oki,okj->oij", wJp, Jp))
    Wcp = jnp.zeros((K, Pl, 6, 3)).at[prob.kf_idx, lp].add(
        jnp.einsum("oki,okj->oij", Jc * w_loc[:, None, None], Jp)
    )
    bp = jnp.zeros((Pl, 3)).at[lp].add(jnp.einsum("oki,ok->oi", wJp, r))
    return Hcc, Hpp, Wcp, bc, bp, cost


def _shard_solve(prob, Hcc, Hpp, Wcp, bc, bp, lam, pt_valid_local):
    """Schur step with the point elimination sharded and the reduced camera
    solve replicated (identical on all devices)."""
    K = Hcc.shape[0]
    Pl = Hpp.shape[0]
    eye3, eye6 = jnp.eye(3), jnp.eye(6)

    diag_p = jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-8)
    floor_p = 1e-5 * jnp.max(diag_p, axis=1, keepdims=True) + 1e-8
    Binv = jnp.linalg.inv(Hpp + (lam * diag_p + floor_p)[:, :, None] * eye3[None])

    diag_c = jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-8)
    Hcc_d = Hcc + lam * diag_c[:, :, None] * eye6[None]

    WB = jnp.einsum("kpij,pjl->kpil", Wcp, Binv)
    S_off = jax.lax.psum(jnp.einsum("kpil,qpml->kqim", WB, Wcp), AXIS)
    rhs_red = jax.lax.psum(jnp.einsum("kpil,pl->ki", WB, bp), AXIS)

    S = -S_off
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)
    rhs = -(bc - rhs_red)

    free = (~prob.cam_fixed) & prob.cam_valid
    f = free.astype(S.dtype)
    S = S * f[:, None, None, None] * f[None, :, None, None]
    S = S.at[jnp.arange(K), jnp.arange(K)].add((1.0 - f)[:, None, None] * eye6[None])
    rhs = rhs * f[:, None]

    Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    dc = jnp.linalg.solve(Sd + 1e-8 * jnp.eye(6 * K), rhs.reshape(-1)).reshape(K, 6)
    dc = dc * f[:, None]

    rhs_p = -bp - jnp.einsum("kpij,ki->pj", Wcp, dc)
    dp = jnp.einsum("pij,pj->pi", Binv, rhs_p)
    dp = dp * pt_valid_local[:, None].astype(dp.dtype)
    return dc, dp


def _shard_cost(cam, prob, poses, points_local):
    n_dev = jax.lax.axis_size(AXIS)
    points = jax.lax.all_gather(points_local, AXIS, tiled=True)
    r, _, _, depth_ok = _residuals(cam, prob, poses, points)
    _, cost, _, _ = _weights(prob, r, depth_ok)
    return jax.lax.psum(cost / n_dev, AXIS)


def _make_step(cam: Camera, iters: int):
    def body(prob: BAProblem, points_local: jnp.ndarray,
             pt_valid_local: jnp.ndarray):
        def step(_, carry):
            poses, pts_l, lam = carry
            Hcc, Hpp, Wcp, bc, bp, cost = _shard_lm_system(cam, prob, poses, pts_l)
            dc, dp = _shard_solve(prob, Hcc, Hpp, Wcp, bc, bp, lam, pt_valid_local)
            dc_norm = jnp.linalg.norm(dc, axis=-1, keepdims=True)
            dc = dc * jnp.minimum(1.0, 1.0 / jnp.maximum(dc_norm, 1e-12))
            new_poses = jax.vmap(
                lambda d, T: se3.orthonormalize(se3.compose(se3.exp(d), T))
            )(dc, poses)
            new_pts = pts_l + dp
            new_cost = _shard_cost(cam, prob, new_poses, new_pts)
            all_pts_finite = (
                jax.lax.psum(jnp.all(jnp.isfinite(new_pts)).astype(jnp.int32), AXIS)
                == jax.lax.axis_size(AXIS)
            )
            finite = (
                jnp.all(jnp.isfinite(new_poses))
                & all_pts_finite
                & jnp.isfinite(new_cost)
            )
            accept = (new_cost < cost) & finite
            poses = jnp.where(accept, new_poses, poses)
            pts_l = jnp.where(accept, new_pts, pts_l)
            lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0), 1e-8, 1e4)
            return poses, pts_l, lam

        poses, pts_l, _ = jax.lax.fori_loop(
            0, iters, step, (prob.poses, points_local, jnp.float32(1e-4))
        )

        points = jax.lax.all_gather(pts_l, AXIS, tiled=True)
        r, _, _, depth_ok = _residuals(cam, prob, poses, points)
        chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
        inlier = prob.obs_valid & depth_ok & (chi2 < CHI2_MONO)
        cost = _shard_cost(cam, prob, poses, pts_l)
        return poses, pts_l, inlier, cost

    return body


@partial(jax.jit, static_argnames=("cam", "iters", "mesh"))
def distributed_bundle_adjust(
    cam: Camera,
    prob: BAProblem,
    mesh: Mesh,
    iters: int = 10,
) -> BAResult:
    """Sharded robust LM BA over `mesh` (axis 'dev'); replicated-in,
    replicated-out so callers don't deal with shardings."""
    n_dev = mesh.devices.size
    prob = _pad_points_to(prob, n_dev)

    rep = P()
    pt_shard = P(AXIS)
    prob_specs = BAProblem(
        poses=rep, points=pt_shard,
        kf_idx=rep, pt_idx=rep, uv=rep, inv_sigma2=rep, obs_valid=rep,
        cam_fixed=rep, cam_valid=rep, pt_valid=pt_shard,
    )
    # the replicated copy of the problem used inside the body (points field
    # unused there — residuals take the all_gathered shard arg)
    body_prob_specs = prob_specs._replace(points=rep, pt_valid=rep)

    def wrapped(prob_rep: BAProblem, points_sh, pt_valid_sh):
        return _make_step(cam, iters)(prob_rep, points_sh, pt_valid_sh)

    sharded = jax.shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(body_prob_specs, pt_shard, pt_shard),
        out_specs=(rep, pt_shard, rep, rep),
        # replication of poses/cost holds by construction (every device
        # applies the same psum-reduced accept decision); the static VMA
        # checker cannot see through the fori_loop carry
        check_vma=False,
    )
    poses, points, inlier, cost = sharded(
        prob._replace(points=prob.points, pt_valid=prob.pt_valid),
        prob.points,
        prob.pt_valid,
    )
    return BAResult(poses=poses, points=points, obs_inlier=inlier, cost=cost)
