import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eao_slam_tpu.geometry import so3, se3, sim3, camera, triangulate
from eao_slam_tpu.geometry.camera import TUM1, TUM3


def random_rotations(rng, n):
    """Uniform-ish random rotations via quaternion normalization."""
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return so3.quat_to_mat(jnp.asarray(q, jnp.float32))


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3))
        # keep rotation angles strictly inside (-pi, pi) so log is the inverse
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(1e-3, 3.0, (64, 1))
        w = jnp.asarray(w, jnp.float32)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(w, w2, atol=2e-3)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
        R = so3.exp(w)
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_exp_is_rotation(self, rng):
        w = jnp.asarray(rng.normal(size=(32, 3)) * 3.0, jnp.float32)
        R = so3.exp(w)
        RtR = jnp.swapaxes(R, -1, -2) @ R
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_quat_roundtrip(self, rng):
        R = random_rotations(rng, 64)
        R2 = so3.quat_to_mat(so3.mat_to_quat(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_log_near_pi(self):
        # Rotation by ~pi about a random-ish axis: log must be stable.
        axis = np.array([0.6, -0.64, 0.48])
        axis /= np.linalg.norm(axis)
        for ang in [np.pi - 1e-4, np.pi - 1e-2]:
            w = jnp.asarray((axis * ang)[None], jnp.float32)
            R = so3.exp(w)
            w2 = so3.log(R)
            np.testing.assert_allclose(np.abs(w), np.abs(w2), atol=5e-3)

    def test_quat_mul_matches_mat(self, rng):
        Ra, Rb = random_rotations(rng, 8), random_rotations(rng, 8)
        qa, qb = so3.mat_to_quat(Ra), so3.mat_to_quat(Rb)
        np.testing.assert_allclose(
            so3.quat_to_mat(so3.quat_mul(qa, qb)), Ra @ Rb, atol=1e-5
        )


class TestSE3:
    def test_compose_inverse(self, rng):
        R = random_rotations(rng, 16)
        t = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        T = se3.make(R, t)
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(
            I, np.broadcast_to(np.asarray(se3.identity()), (16, 3, 4)), atol=1e-5
        )

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6))
        # bound the rotation angle below pi (log wraps beyond that)
        xi[:, 3:] /= np.maximum(np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True) / 2.8, 1.0)
        xi = jnp.asarray(xi, jnp.float32)
        xi2 = se3.log(se3.exp(xi))
        np.testing.assert_allclose(xi, xi2, atol=2e-3)

    def test_apply_matches_matrix(self, rng):
        R = random_rotations(rng, 4)
        t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        T = se3.make(R, t)
        np.testing.assert_allclose(
            se3.apply(T, x), np.einsum("nij,nj->ni", np.asarray(R), np.asarray(x)) + t,
            atol=1e-5,
        )


class TestSim3:
    def test_compose_inverse(self, rng):
        R = random_rotations(rng, 8)
        t = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(8,)), jnp.float32)
        S = sim3.make(R, t, s)
        x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        x2 = sim3.apply(sim3.inverse(S), sim3.apply(S, x))
        np.testing.assert_allclose(x, x2, atol=1e-4)

    def test_apply(self, rng):
        R = random_rotations(rng, 8)
        t = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(8,)), jnp.float32)
        S = sim3.make(R, t, s)
        x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        expected = s[:, None] * np.einsum("nij,nj->ni", np.asarray(R), np.asarray(x)) + t
        np.testing.assert_allclose(sim3.apply(S, x), expected, atol=1e-4)

    def test_se3_roundtrip(self, rng):
        R = random_rotations(rng, 4)
        t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        T = se3.make(R, t)
        np.testing.assert_allclose(sim3.to_se3(sim3.from_se3(T)), T, atol=1e-5)


class TestCamera:
    def test_project_backproject(self, rng):
        uv = jnp.asarray(rng.uniform(50, 400, size=(128, 2)), jnp.float32)
        d = jnp.asarray(rng.uniform(0.5, 5.0, size=(128,)), jnp.float32)
        xc = camera.backproject(TUM3, uv, d)
        uv2 = camera.project(TUM3, xc)
        np.testing.assert_allclose(uv, uv2, atol=1e-3)

    def test_undistort_roundtrip_tum1(self, rng):
        # distort normalized coords, then check undistort recovers pixels
        xn = jnp.asarray(rng.uniform(-0.3, 0.3, size=(256, 2)), jnp.float32)
        xd = camera.distort_normalized(TUM1, xn)
        uv_dist = jnp.stack(
            [xd[..., 0] * TUM1.fx + TUM1.cx, xd[..., 1] * TUM1.fy + TUM1.cy], axis=-1
        )
        uv_true = jnp.stack(
            [xn[..., 0] * TUM1.fx + TUM1.cx, xn[..., 1] * TUM1.fy + TUM1.cy], axis=-1
        )
        uv_rec = camera.undistort_points(TUM1, uv_dist)
        np.testing.assert_allclose(uv_rec, uv_true, atol=0.05)

    def test_no_distortion_passthrough(self, rng):
        uv = jnp.asarray(rng.uniform(0, 640, size=(16, 2)), jnp.float32)
        np.testing.assert_allclose(camera.undistort_points(TUM3, uv), uv)


class TestTriangulate:
    def test_exact_recovery(self, rng):
        n = 256
        Xw = jnp.asarray(rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 5.0]), jnp.float32)
        T1 = se3.identity()
        T2 = se3.make(so3.exp(jnp.array([0.0, 0.05, 0.0])), jnp.array([-0.3, 0.0, 0.0]))
        xc1 = se3.apply(T1, Xw)
        xc2 = se3.apply(jnp.broadcast_to(T2, (n, 3, 4)), Xw)
        xn1 = xc1[..., :2] / xc1[..., 2:3]
        xn2 = xc2[..., :2] / xc2[..., 2:3]
        Xr = triangulate.triangulate(
            jnp.broadcast_to(T1, (n, 3, 4)), jnp.broadcast_to(T2, (n, 3, 4)), xn1, xn2
        )
        np.testing.assert_allclose(Xr, Xw, atol=5e-2)

    def test_check_gates(self, rng):
        cam = TUM3
        Xw = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, -3.0]], jnp.float32)  # 2nd behind
        T1 = jnp.broadcast_to(se3.identity(), (2, 3, 4))
        T2 = jnp.broadcast_to(
            se3.make(jnp.eye(3), jnp.array([-0.5, 0.0, 0.0])), (2, 3, 4)
        )
        uv1 = camera.project(cam, se3.apply(T1, Xw))
        uv2 = camera.project(cam, se3.apply(T2, Xw))
        ok = triangulate.check_triangulation(
            cam, T1, T2, Xw, uv1, uv2, jnp.ones((2,), jnp.float32)
        )
        assert bool(ok[0]) and not bool(ok[1])


def test_jit_geometry_composes():
    @jax.jit
    def f(xi):
        return se3.log(se3.compose(se3.exp(xi), se3.exp(-xi)))

    out = f(jnp.ones((4, 6), jnp.float32) * 0.1)
    np.testing.assert_allclose(out, np.zeros((4, 6)), atol=1e-4)
