"""EPnP + RANSAC absolute pose (PnPsolver replacement)."""

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.geometry import se3, so3
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.solvers.pnp import _epnp_once, pnp_ransac


def make_problem(rng, n=120, noise_px=0.5, outlier_frac=0.0):
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(3, 8, n)], -1).astype(np.float32)
    R = np.asarray(so3.exp(jnp.asarray(rng.normal(0, 0.2, 3), jnp.float32)))
    t = rng.normal(0, 0.3, 3).astype(np.float32)
    T = np.concatenate([R, t[:, None]], 1).astype(np.float32)
    pc = X @ R.T + t
    uv = np.stack([TUM3.fx * pc[:, 0] / pc[:, 2] + TUM3.cx,
                   TUM3.fy * pc[:, 1] / pc[:, 2] + TUM3.cy], -1).astype(np.float32)
    uv += rng.normal(0, noise_px, uv.shape)
    bad = np.zeros(n, bool)
    n_out = int(n * outlier_frac)
    if n_out:
        sel = rng.choice(n, n_out, replace=False)
        uv[sel] += rng.uniform(30, 120, (n_out, 2))
        bad[sel] = True
    return jnp.asarray(X), jnp.asarray(uv), T, bad


class TestEPnP:
    def test_minimal_exact(self, rng):
        X, uv, T, _ = make_problem(rng, n=8, noise_px=0.0)
        T_est = _epnp_once(TUM3, X, uv)
        err_t = np.linalg.norm(np.asarray(T_est)[:, 3] - T[:, 3])
        assert err_t < 0.02, err_t
        err_R = np.abs(np.asarray(T_est)[:3, :3] - T[:3, :3]).max()
        assert err_R < 0.02


class TestPnPRansac:
    def test_clean(self, rng):
        X, uv, T, _ = make_problem(rng)
        n = X.shape[0]
        res = pnp_ransac(TUM3, X, uv, jnp.ones(n, bool), jnp.ones(n),
                         jax.random.PRNGKey(0))
        assert bool(res.success)
        assert np.linalg.norm(np.asarray(res.T)[:, 3] - T[:, 3]) < 0.01

    def test_heavy_outliers(self, rng):
        X, uv, T, bad = make_problem(rng, outlier_frac=0.4)
        n = X.shape[0]
        res = pnp_ransac(TUM3, X, uv, jnp.ones(n, bool), jnp.ones(n),
                         jax.random.PRNGKey(1))
        assert bool(res.success)
        assert np.linalg.norm(np.asarray(res.T)[:, 3] - T[:, 3]) < 0.02
        inl = np.asarray(res.inliers)
        assert not inl[bad].any()

    def test_degenerate_fails_gracefully(self, rng):
        # all matches invalid -> must report failure, not crash
        X, uv, T, _ = make_problem(rng, n=32)
        res = pnp_ransac(TUM3, X, uv, jnp.zeros(32, bool), jnp.ones(32),
                         jax.random.PRNGKey(2))
        assert not bool(res.success)
