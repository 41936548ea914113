"""Distributed BA over the 8-device CPU mesh (SURVEY.md §4 multi-host
strategy): the sharded Schur solver must agree with the single-chip solver
and with ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.parallel.dist_ba import distributed_bundle_adjust, make_ba_mesh
from eao_slam_tpu.solvers import ba

from test_ba import make_ba_problem


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should force 8 CPU devices"
    return make_ba_mesh(jax.devices()[:8])


def test_matches_single_chip(rng, mesh):
    prob, poses_true, X_true = make_ba_problem(rng, K=5, P=256)
    res_1 = ba.bundle_adjust(TUM3, prob, iters=8)
    res_n = distributed_bundle_adjust(TUM3, prob, mesh, iters=8)

    t_err = np.linalg.norm(np.asarray(res_n.poses)[:, :, 3] - poses_true[:, :, 3], axis=1)
    assert t_err.max() < 0.01, f"distributed BA pose errors {t_err}"

    # same LM trajectory module float reassociation: costs should be close
    assert float(res_n.cost) < 1.5 * float(res_1.cost) + 1e-3

    pt_err = np.linalg.norm(np.asarray(res_n.points)[: X_true.shape[0]] - X_true, axis=1)
    assert np.median(pt_err) < 0.12


def test_point_padding_respected(rng, mesh):
    # 250 points does not divide 8 -> exercises the pad path
    prob, poses_true, _ = make_ba_problem(rng, K=4, P=250)
    res = distributed_bundle_adjust(TUM3, prob, mesh, iters=6)
    t_err = np.linalg.norm(np.asarray(res.poses)[:, :, 3] - poses_true[:, :, 3], axis=1)
    assert t_err.max() < 0.01
    assert res.points.shape[0] >= 250


def test_fixed_cameras_unchanged(rng, mesh):
    prob, _, _ = make_ba_problem(rng, K=4, P=128)
    res = distributed_bundle_adjust(TUM3, prob, mesh, iters=4)
    np.testing.assert_allclose(
        np.asarray(res.poses)[:2], np.asarray(prob.poses)[:2], atol=1e-6
    )
