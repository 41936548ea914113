import numpy as np
import jax.numpy as jnp

from eao_slam_tpu.ops import matching


def random_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(np.uint32))


class TestHamming:
    def test_matches_numpy_popcount(self, rng):
        a = random_desc(rng, 32)
        b = random_desc(rng, 48)
        d = np.asarray(matching.hamming_matrix(a, b))
        an, bn = np.asarray(a), np.asarray(b)
        for i in range(0, 32, 7):
            for j in range(0, 48, 11):
                expect = bin(
                    int.from_bytes(an[i].tobytes(), "little")
                    ^ int.from_bytes(bn[j].tobytes(), "little")
                ).count("1")
                assert d[i, j] == expect

    def test_mxu_equals_popcount(self, rng):
        a = random_desc(rng, 64)
        b = random_desc(rng, 64)
        np.testing.assert_array_equal(
            np.asarray(matching.hamming_matrix(a, b)),
            np.asarray(matching.hamming_matrix_mxu(a, b)),
        )

    def test_self_distance_zero(self, rng):
        a = random_desc(rng, 16)
        d = np.asarray(matching.hamming_matrix(a, a))
        np.testing.assert_array_equal(np.diag(d), 0)


class TestMatchNN:
    def test_finds_planted_matches(self, rng):
        base = random_desc(rng, 128)
        # corrupt ~10 bits per descriptor for the query set
        q = np.asarray(base).copy()
        for _ in range(10):
            i = rng.integers(0, 8, 128)
            q[np.arange(128), i] ^= np.uint32(1) << rng.integers(0, 32, 128).astype(np.uint32)
        perm = rng.permutation(128)
        dist = matching.hamming_matrix(jnp.asarray(q[perm]), base)
        mask = jnp.ones((128, 128), bool)
        idx, d, ok = matching.match_nn(dist, mask, max_dist=50, ratio=0.9, mutual=True)
        idx, ok = np.asarray(idx), np.asarray(ok)
        assert ok.sum() > 110
        assert (idx[ok] == perm[ok]).mean() > 0.98

    def test_threshold_and_mask(self, rng):
        a = random_desc(rng, 8)
        b = random_desc(rng, 8)
        dist = matching.hamming_matrix(a, b)
        none_mask = jnp.zeros((8, 8), bool)
        _, _, ok = matching.match_nn(dist, none_mask)
        assert not np.asarray(ok).any()

    def test_duplicate_resolution(self):
        # two rows match the same column; only the closer row survives
        idx = jnp.array([3, 3, 1], jnp.int32)
        dist = jnp.array([10, 5, 7], jnp.int32)
        ok = jnp.array([True, True, True])
        keep = np.asarray(matching.resolve_duplicate_cols(idx, dist, ok, 8))
        assert list(keep) == [False, True, True]


class TestRotationConsistency:
    def test_keeps_dominant_rotation(self, rng):
        n = 200
        angle_t = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        rot = 0.4
        angle_q = angle_t + rot
        # corrupt 20 of them with random rotations
        bad = rng.choice(n, 20, replace=False)
        angle_q[bad] += rng.uniform(1.0, 3.0, 20)
        idx = jnp.arange(n, dtype=jnp.int32)
        ok = jnp.ones((n,), bool)
        keep = np.asarray(
            matching.rotation_consistency(
                jnp.asarray(angle_q), jnp.asarray(angle_t), idx, ok
            )
        )
        good = np.setdiff1d(np.arange(n), bad)
        assert keep[good].mean() > 0.95
        assert keep[bad].mean() < 0.5


class TestEpipolar:
    def test_mask_accepts_true_correspondences(self, rng):
        from eao_slam_tpu.geometry import se3, so3, camera
        from eao_slam_tpu.geometry.camera import TUM3

        n = 100
        Xw = jnp.asarray(
            rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 5.0]), jnp.float32
        )
        T1 = se3.identity()
        T2 = se3.make(so3.exp(jnp.array([0.0, 0.08, 0.0])), jnp.array([-0.4, 0.02, 0.0]))
        uv1 = camera.project(TUM3, se3.apply(T1, Xw))
        uv2 = camera.project(TUM3, se3.apply(jnp.broadcast_to(T2, (n, 3, 4)), Xw))
        F12 = matching.fundamental_from_poses(TUM3.K, T1, T2)
        m = np.asarray(
            matching.epipolar_mask(F12, uv1, uv2, jnp.ones((n,), jnp.float32))
        )
        # diagonal (true pairs) accepted
        assert np.diag(m).mean() > 0.95
        # most off-diagonal pairs rejected
        assert (m.sum() - np.diag(m).sum()) / (n * n - n) < 0.2


class TestRegimes:
    def test_search_by_projection_recovers_shifted(self, rng):
        n = 256
        kp = jnp.asarray(rng.uniform(50, 400, (n, 2)), jnp.float32)
        desc = random_desc(rng, n)
        octave = jnp.zeros((n,), jnp.int32)
        valid = jnp.ones((n,), bool)
        proj = kp + jnp.asarray(rng.normal(0, 2.0, (n, 2)), jnp.float32)
        idx, d, ok = matching.search_by_projection(
            proj, octave, desc, valid, kp, octave, desc, valid,
            radius=jnp.float32(8.0),
        )
        idx, ok = np.asarray(idx), np.asarray(ok)
        assert ok.mean() > 0.9
        assert (idx[ok] == np.arange(n)[ok]).all()

    def test_search_brute_mutual(self, rng):
        n = 128
        desc = random_desc(rng, n)
        valid = jnp.ones((n,), bool)
        idx, d, ok = matching.search_brute(desc, valid, desc, valid)
        idx, ok = np.asarray(idx), np.asarray(ok)
        assert ok.all()
        assert (idx == np.arange(n)).all()
