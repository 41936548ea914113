import numpy as np
import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3, so3, camera
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.solvers import ba


def make_ba_problem(rng, K=6, P=300, noise_px=0.5, pose_noise=0.02, pt_noise=0.05,
                    outlier_frac=0.0):
    X = np.stack(
        [rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P), rng.uniform(4, 9, P)], -1
    ).astype(np.float32)
    poses_true = []
    for k in range(K):
        ang = 0.04 * (k - K / 2)
        eye = np.array([0.5 * np.sin(ang * 4), 0.05 * k, 0.15 * k])
        R = np.asarray(so3.exp(jnp.array([0.0, ang, 0.0])), np.float32)
        t = (-R @ eye).astype(np.float32)
        poses_true.append(np.concatenate([R, t[:, None]], 1))
    poses_true = np.stack(poses_true)

    kf_idx, pt_idx, uvs = [], [], []
    for k in range(K):
        pc = X @ poses_true[k, :3, :3].T + poses_true[k, :3, 3]
        uv = np.stack(
            [TUM3.fx * pc[:, 0] / pc[:, 2] + TUM3.cx, TUM3.fy * pc[:, 1] / pc[:, 2] + TUM3.cy], -1
        )
        vis = (pc[:, 2] > 0.2) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        for p in np.nonzero(vis)[0]:
            kf_idx.append(k)
            pt_idx.append(p)
            uvs.append(uv[p] + rng.normal(0, noise_px, 2))
    O = len(kf_idx)
    uvs = np.asarray(uvs, np.float32)
    if outlier_frac > 0:
        bad = rng.choice(O, int(O * outlier_frac), replace=False)
        uvs[bad] += rng.uniform(15, 60, (len(bad), 2))

    # perturb initial state
    poses0 = poses_true.copy()
    for k in range(2, K):  # first two fixed -> keep exact
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses0[k] = np.asarray(se3.compose(se3.exp(jnp.asarray(xi)), jnp.asarray(poses0[k])))
    X0 = X + rng.normal(0, pt_noise, X.shape).astype(np.float32)

    prob = ba.BAProblem(
        poses=jnp.asarray(poses0),
        points=jnp.asarray(X0),
        kf_idx=jnp.asarray(kf_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(uvs),
        inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.ones((O,), bool),
        cam_fixed=jnp.asarray([k < 2 for k in range(K)]),
        cam_valid=jnp.ones((K,), bool),
        pt_valid=jnp.ones((P,), bool),
    )
    return prob, poses_true, X


class TestBA:
    def test_converges_to_ground_truth(self, rng):
        prob, poses_true, X_true = make_ba_problem(rng)
        res = ba.bundle_adjust(TUM3, prob, iters=12)
        t_err = np.linalg.norm(
            np.asarray(res.poses)[:, :, 3] - poses_true[:, :, 3], axis=1
        )
        assert t_err.max() < 0.01, f"pose errors {t_err}"
        # depth CRLB at this geometry (z~6m, B~1m, 0.5px) is ~0.08m
        pt_err = np.linalg.norm(np.asarray(res.points) - X_true, axis=1)
        assert np.median(pt_err) < 0.12
        assert float(res.cost) < 1.2 * 2 * int(prob.uv.shape[0])  # ~chi2 dof

    def test_reduces_cost_monotonically_enough(self, rng):
        prob, _, _ = make_ba_problem(rng, pose_noise=0.05, pt_noise=0.2)
        cost0 = float(ba._cost_only(TUM3, prob, prob.poses, prob.points))
        res = ba.bundle_adjust(TUM3, prob, iters=10)
        assert float(res.cost) < 0.05 * cost0

    def test_fixed_cameras_unchanged(self, rng):
        prob, poses_true, _ = make_ba_problem(rng)
        res = ba.bundle_adjust(TUM3, prob, iters=5)
        np.testing.assert_allclose(
            np.asarray(res.poses)[:2], np.asarray(prob.poses)[:2], atol=1e-6
        )

    def test_outlier_rejection_local_schedule(self, rng):
        prob, poses_true, X_true = make_ba_problem(rng, outlier_frac=0.1)
        res = ba.local_ba(TUM3, prob)
        t_err = np.linalg.norm(np.asarray(res.poses)[:, :, 3] - poses_true[:, :, 3], axis=1)
        assert t_err.max() < 0.02, f"pose errors with outliers {t_err}"
        # inlier classification: most clean obs kept
        assert float(jnp.mean(res.obs_inlier)) > 0.8

    def test_invalid_points_untouched(self, rng):
        prob, _, _ = make_ba_problem(rng, P=100)
        pt_valid = np.ones(100, bool)
        pt_valid[50:] = False
        prob = prob._replace(pt_valid=jnp.asarray(pt_valid))
        res = ba.bundle_adjust(TUM3, prob, iters=3)
        np.testing.assert_allclose(
            np.asarray(res.points)[50:], np.asarray(prob.points)[50:], atol=1e-6
        )
