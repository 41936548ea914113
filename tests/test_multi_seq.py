"""Multi-sequence batch BA sharded over the 8-device CPU mesh."""

import jax
import numpy as np

from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.parallel.dist_ba import make_ba_mesh
from eao_slam_tpu.parallel.multi_seq import batch_bundle_adjust

from test_ba import make_ba_problem


def test_batched_sequences_all_converge(rng):
    mesh = make_ba_mesh(jax.devices()[:8])
    problems, truths = [], []
    for s in range(11):   # deliberately not a multiple of 8 (pad path)
        prob, poses_true, _ = make_ba_problem(
            np.random.default_rng(100 + s), K=4, P=128
        )
        problems.append(prob)
        truths.append(poses_true)
    results = batch_bundle_adjust(TUM3, problems, mesh, iters=8)
    assert len(results) == 11
    for res, poses_true in zip(results, truths):
        t_err = np.linalg.norm(
            np.asarray(res.poses)[:, :, 3] - poses_true[:, :, 3], axis=1
        )
        assert t_err.max() < 0.015, t_err
