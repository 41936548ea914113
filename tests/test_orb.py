import numpy as np
import jax.numpy as jnp
import pytest

from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io import synthetic
from eao_slam_tpu.ops import image as image_ops
from eao_slam_tpu.ops import orb


@pytest.fixture(scope="module")
def test_image():
    scene = synthetic.make_room_scene(seed=7, n_landmarks=300, n_objects=2)
    ts, poses = synthetic.make_arc_trajectory(3)
    return synthetic.render_image(scene, TUM3, poses[0]).astype(np.float32)


class TestPyramid:
    def test_level_sizes(self):
        sizes = image_ops.level_sizes(480, 640, 8, 1.2)
        assert sizes[0] == (480, 640)
        assert sizes[1] == (400, 533)
        assert len(sizes) == 8

    def test_build(self, test_image):
        lv = image_ops.build_pyramid(jnp.asarray(test_image))
        assert len(lv) == 8
        assert lv[3].shape == image_ops.level_sizes(480, 640, 8, 1.2)[3]

    def test_blur_matches_opencv(self, test_image):
        import cv2

        ours = np.asarray(image_ops.gaussian_blur(jnp.asarray(test_image)))
        ref = cv2.GaussianBlur(test_image, (7, 7), 2, borderType=cv2.BORDER_REPLICATE)
        # interior pixels must agree closely
        np.testing.assert_allclose(ours[10:-10, 10:-10], ref[10:-10, 10:-10], atol=0.5)


class TestFast:
    def test_score_agrees_with_opencv_detection(self, test_image):
        import cv2

        thr = 20
        score = np.asarray(orb.nms3x3(orb.fast_score(jnp.asarray(test_image))))
        det = cv2.FastFeatureDetector_create(threshold=thr, nonmaxSuppression=True)
        cv_kps = det.detect(test_image.astype(np.uint8))
        assert len(cv_kps) > 50
        # every strong OpenCV corner should have our score above threshold
        # within a 1px neighborhood (rounding differences)
        hits = 0
        strong = [k for k in cv_kps if k.response > 40][:200]
        for k in strong:
            x, y = int(round(k.pt[0])), int(round(k.pt[1]))
            if 3 <= x < 637 and 3 <= y < 477:
                if score[y - 1 : y + 2, x - 1 : x + 2].max() > thr:
                    hits += 1
        assert hits / max(len(strong), 1) > 0.9

    def test_flat_image_no_corners(self):
        img = jnp.full((128, 128), 100.0)
        s = orb.fast_score(img)
        assert float(s.max()) <= 0.0 + 1e-6


class TestSelect:
    def test_spatial_spread_and_validity(self, test_image):
        score = orb.nms3x3(orb.fast_score(jnp.asarray(test_image)))
        yx, resp, valid = orb.select_keypoints(score, 256, 20.0, 7.0, 19, 16)
        yx, resp, valid = np.asarray(yx), np.asarray(resp), np.asarray(valid)
        assert valid.sum() > 150
        v = yx[valid]
        # border respected
        assert v[:, 0].min() >= 19 and v[:, 1].min() >= 19
        assert v[:, 0].max() < 480 - 19 and v[:, 1].max() < 640 - 19
        # no duplicate cells: all coordinates unique
        assert len(np.unique(v[:, 0] * 640 + v[:, 1])) == len(v)
        # decent spread: keypoints in at least 3 of 4 quadrants
        quad = (v[:, 0] > 240).astype(int) * 2 + (v[:, 1] > 320).astype(int)
        assert len(np.unique(quad)) >= 3


class TestDescriptors:
    def test_rotation_steering(self, test_image):
        """Descriptors must be approximately invariant to in-plane rotation."""
        import cv2

        img = test_image
        h, w = img.shape
        angle_deg = 20.0
        M = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, 1.0)
        rot = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)

        f0 = orb.extract_orb(jnp.asarray(img), n_features=512)
        kp0 = np.asarray(f0.kp)
        val0 = np.asarray(f0.valid) & (np.asarray(f0.octave) == 0)

        # rotate keypoint positions into the rotated image
        ones = np.ones((len(kp0), 1))
        kp_rot = np.concatenate([kp0, ones], axis=1) @ M.T

        # extract descriptors at the *projected* locations in the rotated
        # image by running the extractor and associating nearest keypoints
        f1 = orb.extract_orb(jnp.asarray(rot), n_features=512)
        kp1 = np.asarray(f1.kp)
        val1 = np.asarray(f1.valid) & (np.asarray(f1.octave) == 0)

        d0 = np.asarray(f0.desc)
        d1 = np.asarray(f1.desc)

        def hamming(a, b):
            return bin(int.from_bytes(a.tobytes(), "little")
                       ^ int.from_bytes(b.tobytes(), "little")).count("1")

        dists, rand_dists = [], []
        rng = np.random.default_rng(0)
        valid1_idx = np.nonzero(val1)[0]
        for i in np.nonzero(val0)[0]:
            d2 = np.linalg.norm(kp1 - kp_rot[i], axis=1)
            d2[~val1] = 1e9
            j = int(np.argmin(d2))
            if d2[j] < 2.0:
                dists.append(hamming(d0[i], d1[j]))
                rand_dists.append(hamming(d0[i], d1[rng.choice(valid1_idx)]))
        assert len(dists) > 15
        assert np.mean(dists) < 60, f"matched hamming too high: {np.mean(dists)}"
        # random (wrong) pairs must be far relative to true matches
        assert np.mean(rand_dists) > 2.5 * np.mean(dists)

    def test_descriptor_determinism(self, test_image):
        f0 = orb.extract_orb(jnp.asarray(test_image), n_features=256)
        f1 = orb.extract_orb(jnp.asarray(test_image), n_features=256)
        np.testing.assert_array_equal(np.asarray(f0.desc), np.asarray(f1.desc))


class TestExtract:
    def test_full_pipeline_shapes(self, test_image):
        f = orb.extract_orb(jnp.asarray(test_image), n_features=1024)
        assert f.kp.shape == (1024, 2)
        assert f.desc.shape == (1024, 8) and f.desc.dtype == jnp.uint32
        assert np.asarray(f.valid).sum() > 500
        # multiple octaves populated
        octs = np.unique(np.asarray(f.octave)[np.asarray(f.valid)])
        assert len(octs) >= 4

    def test_keypoints_are_corners(self, test_image):
        f = orb.extract_orb(jnp.asarray(test_image), n_features=512)
        v = np.asarray(f.valid)
        assert (np.asarray(f.response)[v] > 7.0).all()
