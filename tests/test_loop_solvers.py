"""Sim3 RANSAC/refinement + essential-graph optimization."""

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.geometry import se3, sim3, so3
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.solvers.pose_graph import (
    PoseGraphProblem,
    edge_residual,
    optimize_essential_graph,
)
from eao_slam_tpu.solvers.sim3_solver import (
    horn_sim3,
    optimize_sim3_schedule,
    solve_sim3_ransac,
)


def random_sim3(rng, scale_lo=0.7, scale_hi=1.4):
    R = np.asarray(so3.exp(jnp.asarray(rng.normal(0, 0.3, 3), jnp.float32)))
    t = rng.normal(0, 0.5, 3).astype(np.float32)
    s = np.float32(rng.uniform(scale_lo, scale_hi))
    return sim3.make(jnp.asarray(R), jnp.asarray(t), jnp.asarray(s))


class TestHorn:
    def test_exact_recovery(self, rng):
        S_true = random_sim3(rng)
        x = jnp.asarray(rng.uniform(-2, 2, (30, 3)), jnp.float32)
        y = sim3.apply(S_true, x)
        S = horn_sim3(x, y, jnp.ones(30))
        np.testing.assert_allclose(
            np.asarray(sim3.apply(S, x)), np.asarray(y), atol=1e-4
        )
        assert abs(float(sim3.scale(S)) - float(sim3.scale(S_true))) < 1e-4


class TestSim3Ransac:
    def _make_pair(self, rng, n=80, outlier_frac=0.3):
        # shared points ~5m in front of camera 1
        X1 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                       rng.uniform(4, 8, n)], -1).astype(np.float32)
        S12 = random_sim3(rng, 0.8, 1.3)     # camera-2 -> camera-1 coords
        X2 = np.array(sim3.apply(sim3.inverse(S12), jnp.asarray(X1)))
        # corrupt a fraction of matches
        n_out = int(n * outlier_frac)
        bad = rng.choice(n, n_out, replace=False)
        X2[bad] += rng.uniform(0.5, 2.0, (n_out, 3))
        return jnp.asarray(X1), jnp.asarray(X2), S12, bad

    def test_recovers_under_outliers(self, rng):
        X1, X2, S_true, bad = self._make_pair(rng)
        n = X1.shape[0]
        res = solve_sim3_ransac(
            TUM3, X1, X2, jnp.ones(n, bool), jnp.ones(n), jnp.ones(n),
            jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        assert abs(float(sim3.scale(res.S12)) - float(sim3.scale(S_true))) < 0.02
        # inliers exclude the corrupted matches
        inl = np.asarray(res.inliers)
        assert not inl[bad].any()
        assert inl.sum() >= n - len(bad) - 5

    def test_refine_tightens(self, rng):
        X1, X2, S_true, bad = self._make_pair(rng, outlier_frac=0.1)
        n = X1.shape[0]
        S0 = sim3.retract(S_true, jnp.asarray([0.05, -0.03, 0.04, 0.02, -0.02, 0.03, 0.05]))
        res = optimize_sim3_schedule(
            TUM3, S0, X1, X2, jnp.ones(n, bool), jnp.ones(n), jnp.ones(n)
        )
        e_before = np.linalg.norm(np.asarray(sim3.log(sim3.compose(sim3.inverse(S_true), S0))))
        e_after = np.linalg.norm(np.asarray(sim3.log(sim3.compose(sim3.inverse(S_true), res.S12))))
        assert e_after < 0.25 * e_before
        assert int(res.n_inliers) >= n - len(bad) - 5


class TestEssentialGraph:
    def test_loop_closure_distributes_drift(self, rng):
        """Odometry chain with injected drift + scale creep; a loop edge to
        the start should pull the chain back (7-dof correction)."""
        K = 12
        # ground truth: cameras on a circle, identity scale
        true = []
        for k in range(K):
            ang = 2 * np.pi * k / K
            R = np.asarray(so3.exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
            t = np.asarray([np.cos(ang), 0.0, np.sin(ang)], np.float32)
            true.append(sim3.make(jnp.asarray(R), jnp.asarray(t), jnp.asarray(1.0)))
        true = jnp.stack(true)

        # odometry measurements: exact relative transforms
        meas_rel = jax.vmap(
            lambda a, b: sim3.compose(b, sim3.inverse(a))
        )(true[:-1], true[1:])                               # S_{k+1} S_k^-1

        # drifted estimate: accumulate odometry with noise + scale creep
        est = [true[0]]
        for k in range(K - 1):
            noise = jnp.asarray(
                np.concatenate([rng.normal(0, 0.02, 6), [0.02]]), jnp.float32
            )
            est.append(sim3.compose(sim3.retract(meas_rel[k], noise), est[-1]))
        est = jnp.stack(est)

        # edges: odometry chain + loop edge (K-1 -> 0) with exact measure
        ei = list(range(K - 1)) + [0]
        ej = list(range(1, K)) + [K - 1]
        meas = [sim3.compose(true[j], sim3.inverse(true[i])) for i, j in zip(ei, ej)]
        E = len(ei)
        prob = PoseGraphProblem(
            vertices=est,
            v_fixed=jnp.asarray([True] + [False] * (K - 1)),
            v_valid=jnp.ones(K, bool),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_meas=jnp.stack(meas),
            edge_valid=jnp.ones(E, bool),
            edge_weight=jnp.ones(E),
        )
        cost0 = float(
            sum(np.sum(np.asarray(edge_residual(est[i], est[j], m)) ** 2)
                for i, j, m in zip(ei, ej, meas))
        )
        verts, cost = optimize_essential_graph(prob, iters=25)
        assert float(cost) < 0.02 * cost0

        # scale creep corrected: every vertex scale back near 1
        scales = np.asarray(sim3.scale(verts))
        assert np.abs(np.log(scales)).max() < 0.05

        # end of chain close to truth
        err = np.asarray(sim3.log(sim3.compose(verts[K - 1], sim3.inverse(true[K - 1]))))
        assert np.linalg.norm(err) < 0.1

    def test_fixed_vertex_unmoved(self, rng):
        K = 4
        verts = jnp.stack([random_sim3(rng) for _ in range(K)])
        prob = PoseGraphProblem(
            vertices=verts,
            v_fixed=jnp.asarray([True, False, False, False]),
            v_valid=jnp.ones(K, bool),
            edge_i=jnp.asarray([0, 1, 2], jnp.int32),
            edge_j=jnp.asarray([1, 2, 3], jnp.int32),
            edge_meas=jnp.stack([sim3.identity()] * 3),
            edge_valid=jnp.ones(3, bool),
            edge_weight=jnp.ones(3),
        )
        out, _ = optimize_essential_graph(prob, iters=10)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(verts[0]), atol=1e-6)
