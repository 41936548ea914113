"""Multi-host distributed BA: observation-sharded Schur, direct or CG.

This is the scalable successor of `parallel/dist_ba.py`, addressing its two
structural limits (dense `Wcp [K, Pl, 6, 3]` memory — O(K*P) — and the single
flat mesh axis). The reference's analog is g2o's sparse LM inside
LocalBundleAdjustment / GlobalBundleAdjustemnt (src/Optimizer.cc:45-241,
:459-796); the reference itself has no distributed story (SURVEY.md §2.3) —
this layer is new TPU-native design.

Design
------
Mesh: 2 axes `('host', 'device')`. Points and their observations are sharded
over the *combined* axes (each shard owns a contiguous point block and every
observation of those points — prepared once on the host by a stable sort,
`shard_problem`). Keyframe blocks are sharded over the `host` axis (DCN):
the reduced-camera matvec and preconditioner are computed per host-block and
`all_gather`ed along `host`. Residual/point work rides the `device` axis
(ICI).

Two solvers share the LM loop, residual pass and accept logic:

method='direct' (production default): each shard assembles its point-clique
contribution to the reduced camera system S = Hcc_d − W B⁻¹ Wᵀ ([6K, 6K] —
a few hundred rows for any realistic BA window), ONE packed psum per LM
iteration carries (Hcc | bc | cost | WBW | W B⁻¹ bp), and every shard
solves the replicated dense system with one LU. 2 collectives per LM
iteration — 12 per 6-iteration solve vs the CG path's 169 — which is what
keeps 1→N efficiency ≥70% when per-collective latency dominates
(scaling_bench.py, SCALING_r04.json). Memory per shard is O(P_shard·K)
for the clique tensor; beyond K ≈ 300 switch to method='cg'.

method='cg' (large-K fallback), one LM iteration:
  * local pass over the observation shard -> Hcc/bc partial sums
    (psum over both axes), Hpp/bp/Binv fully shard-local;
  * the reduced camera system S = Hcc_d - W Hpp_d^-1 W^T is NEVER formed.
    `S @ x` is evaluated matrix-free in O(O_shard) work:
        z_p = sum_{o in p} w_o Jp_o^T (Jc_o x_{kf_o})     (local segment sum)
        t_p = Binv_p z_p                                   (local 3x3)
        u_k = sum_{o in k} w_o Jc_o^T (Jp_o t_{p_o})       (psum [K, 6])
        S x = Hcc_d x - u
    solved by block-Jacobi preconditioned CG (fixed iteration count, no
    data-dependent control flow);
  * point back-substitution is shard-local.

CG collective volume per step: one psum of [K, 6] (~KB) — independent of
P and O; CG memory per shard: O(O_shard + P_shard + K) — no K*P term
(BASELINE.md >=70% 1->N target; measured by `scaling_bench.py`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera
from eao_slam_tpu.solvers.ba import (
    BAProblem,
    BAResult,
    CHI2_MONO,
    inv3x3,
    _residuals,
    _weights,
)

HOST_AXIS = "host"
DEV_AXIS = "device"
BOTH = (HOST_AXIS, DEV_AXIS)


def make_hd_mesh(n_hosts: int = 1, devices: Optional[list] = None) -> Mesh:
    """2-axis ('host', 'device') mesh. With one real process the host axis is
    a *virtual* fold of the local devices (valid for correctness testing and
    the dryrun); under `jax.distributed` it is the process axis (see
    `parallel/distributed.py`)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_hosts == 0, f"{n} devices not divisible into {n_hosts} hosts"
    grid = np.asarray(devices).reshape(n_hosts, n // n_hosts)
    return Mesh(grid, (HOST_AXIS, DEV_AXIS))


class ShardedBA(NamedTuple):
    """Observation table re-blocked so shard s owns point block s and every
    observation of those points. Leading dim S = n_hosts * n_devices."""

    points: jnp.ndarray      # [S, Pl, 3]
    pt_valid: jnp.ndarray    # [S, Pl]
    kf_idx: jnp.ndarray      # [S, Os] int32 (global kf id)
    pt_local: jnp.ndarray    # [S, Os] int32 (point id within the shard, sorted)
    uv: jnp.ndarray          # [S, Os, 2]
    inv_sigma2: jnp.ndarray  # [S, Os]
    obs_valid: jnp.ndarray   # [S, Os]


def shard_problem(prob: BAProblem, n_shards: int, k_pad: int) -> tuple:
    """Host-side prep: pad K to a multiple of the host axis, pad P to a
    multiple of n_shards, and route each observation to the shard that owns
    its point (stable sort by point id => within-shard ids are sorted, which
    lets the segment sums run with indices_are_sorted=True)."""
    Pn = int(prob.points.shape[0])
    K = int(prob.poses.shape[0])
    p_pad = (-Pn) % n_shards
    P_tot = Pn + p_pad
    Pl = P_tot // n_shards
    kpad = (-K) % k_pad

    pts = np.asarray(prob.points)
    ptv = np.asarray(prob.pt_valid)
    if p_pad:
        pts = np.pad(pts, ((0, p_pad), (0, 0)))
        ptv = np.pad(ptv, (0, p_pad))

    pt_idx = np.asarray(prob.pt_idx)
    order = np.argsort(pt_idx, kind="stable")
    owner = pt_idx[order] // Pl
    counts = np.bincount(owner, minlength=n_shards)
    Os = max(8, int(-(-int(counts.max()) // 8) * 8))

    def blocked(x, fill=0):
        x = np.asarray(x)[order]
        out = np.full((n_shards, Os) + x.shape[1:], fill, dtype=x.dtype)
        pos = np.concatenate([[0], np.cumsum(counts)])
        for s in range(n_shards):
            out[s, : counts[s]] = x[pos[s] : pos[s + 1]]
        return out

    # observations of invalid cameras must not contribute to any block or
    # to the accept/reject cost — fold cam_valid into obs_valid here so the
    # device side matches the single-chip _weights mask (solvers/ba.py:83)
    obs_ok = np.asarray(prob.obs_valid) & np.asarray(prob.cam_valid)[
        np.clip(np.asarray(prob.kf_idx), 0, K - 1)
    ]
    sh = ShardedBA(
        points=jnp.asarray(pts.reshape(n_shards, Pl, 3)),
        pt_valid=jnp.asarray(ptv.reshape(n_shards, Pl)),
        kf_idx=jnp.asarray(blocked(np.asarray(prob.kf_idx))),
        # pad fill Pl-1 (not 0): the per-shard pt_local vector must stay
        # nondecreasing INCLUDING padding, because the segment sums run with
        # indices_are_sorted=True — padded w is 0 so the sums are unchanged
        pt_local=jnp.asarray(blocked(pt_idx % Pl, fill=Pl - 1)),
        uv=jnp.asarray(blocked(np.asarray(prob.uv))),
        inv_sigma2=jnp.asarray(blocked(np.asarray(prob.inv_sigma2))),
        obs_valid=jnp.asarray(blocked(obs_ok, fill=False)),
    )
    rep = BAProblem(
        poses=jnp.pad(prob.poses, ((0, kpad), (0, 0), (0, 0))),
        points=jnp.zeros((0, 3)),  # unused on device; points live in `sh`
        kf_idx=jnp.zeros((0,), jnp.int32),
        pt_idx=jnp.zeros((0,), jnp.int32),
        uv=jnp.zeros((0, 2)),
        inv_sigma2=jnp.zeros((0,)),
        obs_valid=jnp.zeros((0,), bool),
        cam_fixed=jnp.pad(prob.cam_fixed, (0, kpad), constant_values=True),
        cam_valid=jnp.pad(prob.cam_valid, (0, kpad), constant_values=False),
        pt_valid=jnp.zeros((0,), bool),
    )
    return sh, rep, Pn, K


# ---------------------------------------------------------------- device side


def _local_residuals(cam: Camera, poses, pts_l, sh: ShardedBA):
    """Residuals/Jacobians for the local observation shard (reuses the
    single-chip math by faking a BAProblem view over local arrays)."""
    view = BAProblem(
        poses=poses, points=pts_l,
        kf_idx=sh.kf_idx, pt_idx=sh.pt_local, uv=sh.uv,
        inv_sigma2=sh.inv_sigma2, obs_valid=sh.obs_valid,
        cam_fixed=None, cam_valid=None, pt_valid=sh.pt_valid,
    )
    r, Jc, Jp, depth_ok = _residuals(cam, view, poses, pts_l)
    chi2 = jnp.sum(r * r, -1) * sh.inv_sigma2
    m = sh.obs_valid & depth_ok & sh.pt_valid[sh.pt_local]
    from eao_slam_tpu.solvers.pose_lm import huber_weight, _huber_cost

    w = huber_weight(chi2) * sh.inv_sigma2 * m.astype(r.dtype)
    cost = jnp.sum(jnp.where(m, _huber_cost(chi2), 0.0))
    return r, Jc, Jp, w, cost, depth_ok


def _seg_pt(x, pt_local, Pl):
    return jax.ops.segment_sum(x, pt_local, num_segments=Pl,
                               indices_are_sorted=True)


def _seg_kf(x, kf_idx, K):
    return jax.ops.segment_sum(x, kf_idx, num_segments=K)


def _make_dist_step(cam: Camera, iters: int, n_cg: int, n_host: int,
                    n_shards: int, direct: bool = False):
    def body(rep: BAProblem, sh: ShardedBA):
        K = rep.poses.shape[0]
        Pl = sh.points.shape[0]
        free = (~rep.cam_fixed) & rep.cam_valid
        f = free.astype(jnp.float32)
        eye3, eye6 = jnp.eye(3), jnp.eye(6)

        def _apply_update(poses, pts_l, lam, cost, dc, bp, Binv, Jc, Jp, w):
            """Shared LM tail: point back-substitution (local), trust-region
            clip, accept/reject on the packed (cost, finiteness) psum.
            Returns (poses, pts_l, lam, cost-after-this-iteration) — the
            final carry cost IS the solve's cost, saving the post-loop
            cost psum (every collective counts at pod latency)."""
            # point back-substitution — fully local
            s = jnp.einsum("oij,oj->oi", Jc, dc[sh.kf_idx])          # [Os, 2]
            ztop = jnp.einsum("oij,oi->oj", Jp, s * w[:, None])      # [Os, 3]
            rhs_p = -bp - _seg_pt(ztop, sh.pt_local, Pl)
            dp = jnp.einsum("pij,pj->pi", Binv, rhs_p)
            dp = dp * sh.pt_valid[:, None].astype(dp.dtype)

            dc_norm = jnp.linalg.norm(dc, axis=-1, keepdims=True)
            dc = dc * jnp.minimum(1.0, 1.0 / jnp.maximum(dc_norm, 1e-12))
            new_poses = jax.vmap(
                lambda d, T: se3.orthonormalize(se3.compose(se3.exp(d), T))
            )(dc, poses)
            new_pts = pts_l + dp
            _, _, _, _, nc_p, _ = _local_residuals(cam, new_poses, new_pts, sh)
            # pack (new_cost, points-finite) into one psum
            pk = jax.lax.psum(
                jnp.stack([
                    nc_p, jnp.all(jnp.isfinite(new_pts)).astype(jnp.float32)
                ]), BOTH,
            )
            new_cost = pk[0]
            finite = (
                jnp.all(jnp.isfinite(new_poses))
                & jnp.isfinite(new_cost)
                & (pk[1] == n_shards)  # every shard reported finite points
            )
            accept = (new_cost < cost) & finite
            poses = jnp.where(accept, new_poses, poses)
            pts_l = jnp.where(accept, new_pts, pts_l)
            lam = jnp.clip(jnp.where(accept, lam * 0.4, lam * 5.0), 1e-8, 1e4)
            return poses, pts_l, lam, jnp.where(accept, new_cost, cost)

        def lm_iter_direct(_, carry):
            """Direct Schur: each shard assembles its point-clique
            contribution to the reduced camera matrix S = Hcc_d − W B⁻¹ Wᵀ
            ([6K, 6K] — small for any realistic BA window), ONE packed
            psum per LM iteration carries (Hcc, bc, cost, WBW, W B⁻¹ bp),
            and every shard solves the replicated dense system with a
            single LU (O((6K)³) ≈ 24 MFLOP at K=48 — noise next to the
            residual pass). Replaces the matrix-free CG whose per-matvec
            [K, 6] psum cost n_cg+2 latency-bound collectives per LM
            iteration: 169 → 13 collectives per solve at the scaling
            bench's 6×24 schedule, which is what moves 1→8 efficiency
            under the measured-latency model (SCALING_r03 item)."""
            poses, pts_l, lam, _prev_cost = carry
            r, Jc, Jp, w, cost_p, _ = _local_residuals(cam, poses, pts_l, sh)
            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]
            occ = _seg_kf(jnp.einsum("oki,okj->oij", wJc, Jc), sh.kf_idx, K)
            obc = _seg_kf(jnp.einsum("oki,ok->oi", wJc, r), sh.kf_idx, K)
            Hpp = _seg_pt(jnp.einsum("oki,okj->oij", wJp, Jp), sh.pt_local, Pl)
            bp = _seg_pt(jnp.einsum("oki,ok->oi", wJp, r), sh.pt_local, Pl)

            diag_p = jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-8)
            floor_p = 1e-5 * jnp.max(diag_p, axis=1, keepdims=True) + 1e-8
            Binv = inv3x3(Hpp + (lam * diag_p + floor_p)[:, :, None] * eye3[None])

            # per-(point, camera) clique blocks W_kp = Σ_o Jcᵀ w Jp  [6, 3]
            Wkp = jnp.einsum("oci,ocj->oij", wJc, Jp)               # [Os, 6, 3]
            idx = sh.pt_local * K + sh.kf_idx
            Y = jax.ops.segment_sum(
                Wkp, idx, num_segments=Pl * K).reshape(Pl, K, 6, 3)
            Z = jnp.einsum("pkil,plm->pkim", Y, Binv)               # W B⁻¹
            A = Z.transpose(1, 2, 0, 3).reshape(K * 6, Pl * 3)
            Bm = Y.transpose(1, 2, 0, 3).reshape(K * 6, Pl * 3)
            WBW = A @ Bm.T                                          # [6K, 6K]
            t0 = jnp.einsum("pij,pj->pi", Binv, bp)
            u0 = jnp.einsum("pkij,pj->ki", Y, t0)                   # [K, 6]

            packed = jax.lax.psum(
                jnp.concatenate([
                    occ.reshape(-1), obc.reshape(-1), cost_p[None],
                    WBW.reshape(-1), u0.reshape(-1),
                ]), BOTH,
            )
            off = K * 36
            Hcc = packed[:off].reshape(K, 6, 6)
            bc = packed[off:off + K * 6].reshape(K, 6); off += K * 6
            cost = packed[off]; off += 1
            WBW = packed[off:off + (K * 6) ** 2].reshape(K * 6, K * 6)
            off += (K * 6) ** 2
            u0 = packed[off:off + K * 6].reshape(K, 6)

            diag_c = jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-8)
            Hcc_d = Hcc + lam * diag_c[:, :, None] * eye6[None]
            Hcc_d = Hcc_d * f[:, None, None] + (1.0 - f)[:, None, None] * eye6[None]

            S = (-WBW).reshape(K, 6, K, 6)
            S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hcc_d)
            S = S.reshape(K * 6, K * 6)
            f6 = jnp.repeat(f, 6)
            S = S * (f6[:, None] * f6[None, :]) + jnp.diag(1.0 - f6)
            rhs = ((-bc + u0) * f[:, None]).reshape(-1)
            dc = jnp.linalg.solve(S, rhs).reshape(K, 6) * f[:, None]

            return _apply_update(poses, pts_l, lam, cost, dc, bp, Binv,
                                 Jc, Jp, w)

        def lm_iter(_, carry):
            poses, pts_l, lam, _prev_cost = carry
            r, Jc, Jp, w, cost_p, _ = _local_residuals(cam, poses, pts_l, sh)

            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]
            # ONE packed psum for (Hcc, bc, cost): the payloads are KBs, so
            # per-collective LATENCY dominates on any fabric — packing cuts
            # 3 round trips per LM iteration to 1
            occ = _seg_kf(jnp.einsum("oki,okj->oij", wJc, Jc), sh.kf_idx, K)
            obc = _seg_kf(jnp.einsum("oki,ok->oi", wJc, r), sh.kf_idx, K)
            packed = jax.lax.psum(
                jnp.concatenate([
                    occ.reshape(-1), obc.reshape(-1), cost_p[None]
                ]), BOTH,
            )
            Hcc = packed[: K * 36].reshape(K, 6, 6)
            bc = packed[K * 36 : K * 42].reshape(K, 6)
            cost = packed[K * 42]
            Hpp = _seg_pt(jnp.einsum("oki,okj->oij", wJp, Jp), sh.pt_local, Pl)
            bp = _seg_pt(jnp.einsum("oki,ok->oi", wJp, r), sh.pt_local, Pl)

            diag_p = jnp.maximum(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-8)
            floor_p = 1e-5 * jnp.max(diag_p, axis=1, keepdims=True) + 1e-8
            Binv = inv3x3(Hpp + (lam * diag_p + floor_p)[:, :, None] * eye3[None])
            diag_c = jnp.maximum(jnp.diagonal(Hcc, axis1=1, axis2=2), 1e-8)
            Hcc_d = Hcc + lam * diag_c[:, :, None] * eye6[None]
            # identity rows for fixed/invalid cameras
            Hcc_d = Hcc_d * f[:, None, None] + (1.0 - f)[:, None, None] * eye6[None]

            def Wt_x(x):
                """z_p = sum_o w Jp^T (Jc x_k) — local [Pl, 3]."""
                e = jnp.einsum("oij,oj->oi", Jc, x[sh.kf_idx])      # [Os, 2]
                z = jnp.einsum("oij,oi->oj", Jp, e * w[:, None])    # [Os, 3]
                return _seg_pt(z, sh.pt_local, Pl)

            def W_t(t):
                """u_k = sum_o w Jc^T (Jp t_p) — psum [K, 6]."""
                s = jnp.einsum("oij,oj->oi", Jp, t[sh.pt_local])    # [Os, 2]
                u = jnp.einsum("oij,oi->oj", Jc, s * w[:, None])    # [Os, 6]
                return jax.lax.psum(_seg_kf(u, sh.kf_idx, K), BOTH)

            def matvec(x):
                # the Hcc_d term is O(K*36) flops — cheaper replicated than
                # gathered; the observation term carries the real work and
                # needs exactly ONE [K, 6] psum
                x = x * f[:, None]
                t = jnp.einsum("pij,pj->pi", Binv, Wt_x(x))
                Sx = jnp.einsum("kij,kj->ki", Hcc_d, x) - W_t(t)
                return Sx * f[:, None] + x * (1.0 - f)[:, None]

            t0 = jnp.einsum("pij,pj->pi", Binv, bp)
            rhs = (-bc + W_t(t0)) * f[:, None]

            # block-Jacobi preconditioner: the K 6x6 inversions are the
            # keyframe-block work — sharded over the HOST axis (DCN),
            # one all_gather per LM iteration
            Kh = K // n_host
            hb = jax.lax.axis_index(HOST_AXIS) * Kh
            Minv_h = jnp.linalg.inv(
                jax.lax.dynamic_slice_in_dim(Hcc_d, hb, Kh) + 1e-6 * eye6[None]
            )
            Minv = jax.lax.all_gather(Minv_h, HOST_AXIS, tiled=True)

            def cg_step(_, cg):
                x, rr, p, rz = cg
                Sp = matvec(p)
                pSp = jnp.sum(p * Sp)
                alpha = rz / jnp.where(jnp.abs(pSp) < 1e-20, 1e-20, pSp)
                x = x + alpha * p
                rr = rr - alpha * Sp
                z = jnp.einsum("kij,kj->ki", Minv, rr)
                rz_new = jnp.sum(rr * z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                return x, rr, z + beta * p, rz_new

            x0 = jnp.zeros_like(rhs)
            z0 = jnp.einsum("kij,kj->ki", Minv, rhs)
            dc, _, _, _ = jax.lax.fori_loop(
                0, n_cg, cg_step, (x0, rhs, z0, jnp.sum(rhs * z0))
            )
            dc = dc * f[:, None]
            return _apply_update(poses, pts_l, lam, cost, dc, bp, Binv,
                                 Jc, Jp, w)

        poses, pts_l, _, cost = jax.lax.fori_loop(
            0, iters, lm_iter_direct if direct else lm_iter,
            (rep.poses, sh.points, jnp.float32(1e-4), jnp.float32(jnp.inf))
        )
        r, _, _, w, cost_p, depth_ok = _local_residuals(cam, poses, pts_l, sh)
        chi2 = jnp.sum(r * r, -1) * sh.inv_sigma2
        # depth_ok matches the single-chip classification (solvers/ba.py:276):
        # a behind-camera observation is never an inlier
        inlier = sh.obs_valid & depth_ok & (chi2 < CHI2_MONO)
        # final cost rides the last LM iteration's accept psum (carry) —
        # no post-loop collective
        return poses, pts_l, inlier, cost

    return body


@partial(jax.jit, static_argnames=("cam", "iters", "n_cg", "mesh", "direct"))
def _run_sharded(cam, rep, sh, mesh, iters, n_cg, direct=False):
    n_host = mesh.shape[HOST_AXIS]
    n_shards = int(mesh.devices.size)
    repsp = P()
    shsp = P(BOTH)
    in_rep = BAProblem(
        poses=repsp, points=repsp, kf_idx=repsp, pt_idx=repsp, uv=repsp,
        inv_sigma2=repsp, obs_valid=repsp, cam_fixed=repsp, cam_valid=repsp,
        pt_valid=repsp,
    )
    in_sh = ShardedBA(*([shsp] * len(sh)))

    def wrapped(rep_, sh_):
        sh_ = jax.tree.map(lambda a: a[0], sh_)  # drop the unit shard dim
        poses, pts_l, inlier, cost = _make_dist_step(
            cam, iters, n_cg, n_host, n_shards, direct=direct
        )(rep_, sh_)
        return poses, pts_l[None], inlier[None], cost

    return jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(in_rep, in_sh),
        out_specs=(repsp, shsp, shsp, repsp),
        # poses/cost replication holds by construction (identical psum-reduced
        # updates on every shard); the static checker can't see through the
        # fori_loop carry
        check_vma=False,
    )(rep, sh)


def distributed_bundle_adjust_v2(
    cam: Camera,
    prob: BAProblem,
    mesh: Mesh,
    iters: int = 10,
    n_cg: int = 32,
    method: str = "direct",
) -> BAResult:
    """Replicated-in / replicated-out distributed BA on a ('host','device')
    mesh. Observation routing happens once on the host (cheap vs the solve);
    results are re-assembled to the caller's original K / P sizes.

    method: 'direct' (default) assembles the [6K, 6K] reduced camera
    system from shard-local point cliques and solves it replicated — 2
    collectives per LM iteration, the production configuration for any
    BA window that fits K ≲ 300 (the clique tensor is O(P_shard·K)).
    'cg' is the matrix-free block-Jacobi CG solver — O(K) memory per
    shard, for camera counts where 6K×6K no longer fits or a dense
    solve would dominate."""
    assert method in ("direct", "cg"), method
    S = int(mesh.devices.size)
    n_host = int(mesh.shape[HOST_AXIS])
    sh, rep, Pn, K = shard_problem(prob, S, k_pad=n_host)
    poses, pts_blocked, inlier_blocked, cost = _run_sharded(
        cam, rep, sh, mesh, iters, n_cg, direct=(method == "direct")
    )
    points = pts_blocked.reshape(-1, 3)[:Pn]

    # map per-shard inliers back to the caller's observation order
    pt_idx = np.asarray(prob.pt_idx)
    order = np.argsort(pt_idx, kind="stable")
    Pl = pts_blocked.shape[1]
    counts = np.bincount(pt_idx[order] // Pl, minlength=S)
    inl = np.asarray(inlier_blocked)
    flat = np.concatenate([inl[s, : counts[s]] for s in range(S)])
    obs_inlier = np.zeros(len(pt_idx), bool)
    obs_inlier[order] = flat
    return BAResult(
        poses=poses[:K],
        points=points,
        obs_inlier=jnp.asarray(obs_inlier) & prob.obs_valid,
        cost=cost,
    )
