"""Multi-host distributed BA v2 (2-axis ('host','device') mesh,
observation-sharded matrix-free CG Schur — parallel/dist_ba2.py).

Must agree with the single-chip Schur solver and with ground truth on a
synthetic problem, on both a (2,4) and a (1,8) mesh, including ragged
point counts and fixed-camera gauges. Reference analog: g2o LM BA
(src/Optimizer.cc:45-241); the distributed layer itself is new design
(SURVEY.md §2.3)."""

import jax
import numpy as np
import pytest

from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.parallel.dist_ba2 import (
    distributed_bundle_adjust_v2,
    make_hd_mesh,
    shard_problem,
)
from eao_slam_tpu.solvers import ba

from test_ba import make_ba_problem


@pytest.fixture(scope="module", params=[(2, 4), (1, 8)])
def mesh(request):
    n_hosts, n_dev = request.param
    assert jax.device_count() >= n_hosts * n_dev
    return make_hd_mesh(n_hosts, jax.devices()[: n_hosts * n_dev])


def test_shard_problem_routing(rng):
    prob, _, _ = make_ba_problem(rng, K=5, P=250)  # 250 % 8 != 0 -> padding
    sh, rep, Pn, K = shard_problem(prob, 8, k_pad=2)
    assert Pn == 250 and K == 5
    assert rep.poses.shape[0] == 6  # K padded to host multiple
    assert sh.points.shape[0] == 8
    # every valid observation's point must live in its shard's block
    Pl = sh.points.shape[1]
    pt_local = np.asarray(sh.pt_local)
    valid = np.asarray(sh.obs_valid)
    assert (pt_local[valid] >= 0).all() and (pt_local[valid] < Pl).all()
    # total valid observation count preserved
    assert valid.sum() == np.asarray(prob.obs_valid).sum()
    # within-shard point ids are sorted INCLUDING padding (the segment sums
    # run with indices_are_sorted=True over the full vector, so padded tail
    # entries must not break monotonicity — they are filled with Pl-1)
    for s in range(8):
        assert (np.diff(pt_local[s]) >= 0).all()


def test_matches_single_chip_and_gt(rng, mesh):
    prob, poses_true, X_true = make_ba_problem(rng, K=5, P=256)
    res_n = distributed_bundle_adjust_v2(TUM3, prob, mesh, iters=8, n_cg=30)

    t_err = np.linalg.norm(
        np.asarray(res_n.poses)[:, :, 3] - poses_true[:, :, 3], axis=1
    )
    assert t_err.max() < 0.01, f"dist BA v2 pose errors {t_err}"
    x_err = np.linalg.norm(np.asarray(res_n.points) - X_true, axis=1)
    assert np.median(x_err) < 0.12  # same noise floor as test_ba

    res_1 = ba.bundle_adjust(TUM3, prob, iters=8)
    assert float(res_n.cost) <= float(res_1.cost) * 1.5 + 1e-3
    # inlier classification agrees with the single-chip solver on >=95%
    agree = np.mean(
        np.asarray(res_n.obs_inlier) == np.asarray(res_1.obs_inlier)
    )
    assert agree > 0.95


def test_ragged_points_and_fixed_cams(rng, mesh):
    prob, poses_true, _ = make_ba_problem(rng, K=4, P=173)
    fixed = np.zeros(4, bool)
    fixed[:2] = True  # two-camera gauge
    prob = prob._replace(poses=prob.poses, cam_fixed=np.asarray(fixed))
    res = distributed_bundle_adjust_v2(TUM3, prob, mesh, iters=6, n_cg=24)
    # fixed cameras unchanged
    np.testing.assert_allclose(
        np.asarray(res.poses)[:2], np.asarray(prob.poses)[:2], atol=1e-6
    )
    t_err = np.linalg.norm(
        np.asarray(res.poses)[2:, :, 3] - poses_true[2:, :, 3], axis=1
    )
    assert t_err.max() < 0.02


def test_direct_and_cg_solvers_agree(rng, mesh):
    """The direct dense-clique Schur solver (production, 2 collectives/LM
    iter) and the matrix-free CG solver (large-K fallback) must converge
    to the same solution on the same problem."""
    prob, poses_true, X_true = make_ba_problem(rng, K=5, P=192)
    rd = distributed_bundle_adjust_v2(TUM3, prob, mesh, iters=8,
                                      method="direct")
    rc = distributed_bundle_adjust_v2(TUM3, prob, mesh, iters=8, n_cg=30,
                                      method="cg")
    t_d = np.linalg.norm(np.asarray(rd.poses)[:, :, 3] - poses_true[:, :, 3],
                         axis=1)
    t_c = np.linalg.norm(np.asarray(rc.poses)[:, :, 3] - poses_true[:, :, 3],
                         axis=1)
    assert t_d.max() < 0.01, f"direct solver pose errors {t_d}"
    assert t_c.max() < 0.01
    # same final cost basin
    assert float(rd.cost) <= float(rc.cost) * 1.2 + 1e-3
    assert np.mean(np.asarray(rd.obs_inlier) == np.asarray(rc.obs_inlier)) > 0.95
