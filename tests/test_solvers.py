import numpy as np
import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3, so3, camera
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.solvers import init2view, pose_lm


def make_world(rng, n=300, planar=False):
    if planar:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 5.0)], -1
        )
    else:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3.0, 8.0, n)], -1
        )
    return jnp.asarray(X, jnp.float32)


def project_two_views(X, T2, noise, rng):
    T1 = se3.identity()
    uv1 = camera.project(TUM3, se3.apply(T1, X))
    uv2 = camera.project(TUM3, se3.apply(jnp.broadcast_to(T2, (X.shape[0], 3, 4)), X))
    uv1 = uv1 + jnp.asarray(rng.normal(0, noise, uv1.shape), jnp.float32)
    uv2 = uv2 + jnp.asarray(rng.normal(0, noise, uv2.shape), jnp.float32)
    inb = camera.in_image(TUM3, uv1) & camera.in_image(TUM3, uv2)
    return uv1, uv2, inb


class TestInit2View:
    def test_general_scene_recovers_pose(self, rng):
        X = make_world(rng, 300)
        R = so3.exp(jnp.array([0.01, 0.06, 0.005]))
        t = jnp.array([-0.4, 0.03, 0.02])
        T2 = se3.make(R, t)
        uv1, uv2, valid = project_two_views(X, T2, 0.5, rng)
        res = init2view.initialize_two_view(
            TUM3, uv1, uv2, valid, jax.random.PRNGKey(0)
        )
        assert bool(res.success)
        # translation direction must match (scale unobservable)
        t_est = np.asarray(se3.trans(res.T21))
        t_true = np.asarray(t) / np.linalg.norm(np.asarray(t))
        cos = abs(t_est @ t_true / np.linalg.norm(t_est))
        assert cos > 0.99, f"translation direction off: cos={cos}"
        # rotation error small
        dR = np.asarray(se3.rot(res.T21)).T @ np.asarray(R)
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, f"rotation error {ang} deg"
        # triangulated points match the world up to scale
        good = np.asarray(res.point_ok)
        assert good.sum() > 150
        scale = np.median(np.asarray(res.points)[good, 2] / np.asarray(X)[good, 2])
        err = np.abs(np.asarray(res.points)[good] * 1 / scale - np.asarray(X)[good])
        assert np.median(err) < 0.15

    def test_planar_scene_uses_h(self, rng):
        X = make_world(rng, 300, planar=True)
        T2 = se3.make(so3.exp(jnp.array([0.0, 0.05, 0.0])), jnp.array([-0.35, 0.0, 0.02]))
        uv1, uv2, valid = project_two_views(X, T2, 0.4, rng)
        res = init2view.initialize_two_view(TUM3, uv1, uv2, valid, jax.random.PRNGKey(1))
        assert bool(res.used_h), "planar scene should select the homography model"
        if bool(res.success):
            t_est = np.asarray(se3.trans(res.T21))
            t_true = np.array([-0.35, 0.0, 0.02])
            cos = abs(
                t_est @ t_true / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
            )
            assert cos > 0.98

    def test_no_parallax_fails(self, rng):
        X = make_world(rng, 200)
        T2 = se3.make(so3.exp(jnp.array([0.0, 0.002, 0.0])), jnp.array([0.0, 0.0, 0.0]))
        uv1, uv2, valid = project_two_views(X, T2, 0.5, rng)
        res = init2view.initialize_two_view(TUM3, uv1, uv2, valid, jax.random.PRNGKey(2))
        assert not bool(res.success)

    def test_outlier_robustness(self, rng):
        X = make_world(rng, 300)
        T2 = se3.make(so3.exp(jnp.array([0.0, 0.06, 0.0])), jnp.array([-0.4, 0.0, 0.0]))
        uv1, uv2, valid = project_two_views(X, T2, 0.5, rng)
        # corrupt 25% of matches
        n_bad = 75
        bad = rng.choice(300, n_bad, replace=False)
        uv2 = np.array(uv2)
        uv2[bad] = rng.uniform(0, 600, (n_bad, 2))
        res = init2view.initialize_two_view(
            TUM3, uv1, jnp.asarray(uv2), valid, jax.random.PRNGKey(3)
        )
        assert bool(res.success)
        t_est = np.asarray(se3.trans(res.T21))
        cos = abs(t_est @ np.array([-1.0, 0, 0]) / np.linalg.norm(t_est))
        assert cos > 0.99


class TestPoseLM:
    def test_converges_from_perturbed_pose(self, rng):
        X = make_world(rng, 400)
        T_true = se3.make(so3.exp(jnp.array([0.05, -0.1, 0.02])), jnp.array([0.2, -0.1, 0.3]))
        uv = camera.project(TUM3, se3.apply(jnp.broadcast_to(T_true, (400, 3, 4)), X))
        uv = uv + jnp.asarray(rng.normal(0, 0.5, uv.shape), jnp.float32)
        T0 = se3.compose(se3.exp(jnp.array([0.02, -0.03, 0.01, 0.01, 0.02, -0.015])), T_true)
        res = pose_lm.optimize_pose(
            TUM3, T0, X, uv, jnp.ones((400,)), jnp.ones((400,), bool)
        )
        t_err = np.linalg.norm(np.asarray(se3.trans(res.T) - se3.trans(T_true)))
        assert t_err < 0.01, f"translation error {t_err}"
        assert int(res.n_inliers) > 380

    def test_rejects_outliers(self, rng):
        X = make_world(rng, 300)
        T_true = se3.make(so3.exp(jnp.array([0.0, 0.05, 0.0])), jnp.array([0.1, 0.0, 0.0]))
        uv = np.array(
            camera.project(TUM3, se3.apply(jnp.broadcast_to(T_true, (300, 3, 4)), X))
        )
        bad = rng.choice(300, 60, replace=False)
        uv[bad] += rng.uniform(20, 80, (60, 2))
        T0 = se3.compose(se3.exp(jnp.array([0.01, 0.01, 0.0, 0.005, -0.01, 0.0])), T_true)
        res = pose_lm.optimize_pose(
            TUM3, T0, X, jnp.asarray(uv, jnp.float32), jnp.ones((300,)), jnp.ones((300,), bool)
        )
        inl = np.asarray(res.inliers)
        assert inl[bad].sum() < 5, "outliers kept"
        good = np.setdiff1d(np.arange(300), bad)
        assert inl[good].mean() > 0.95
        t_err = np.linalg.norm(np.asarray(se3.trans(res.T) - se3.trans(T_true)))
        assert t_err < 0.01

    def test_invalid_mask_respected(self, rng):
        X = make_world(rng, 100)
        T = se3.identity()
        uv = camera.project(TUM3, se3.apply(jnp.broadcast_to(T, (100, 3, 4)), X))
        valid = jnp.zeros((100,), bool).at[:50].set(True)
        res = pose_lm.optimize_pose(TUM3, T, X, uv, jnp.ones((100,)), valid)
        assert int(res.n_inliers) <= 50
