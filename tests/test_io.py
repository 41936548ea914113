import os

import numpy as np
import pytest

from eao_slam_tpu.config import tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io import synthetic, trajectory, tum

REF_DATA = "/root/reference/data"


class TestTumContract:
    @pytest.mark.skipif(not os.path.exists(REF_DATA), reason="reference data absent")
    def test_image_list(self):
        il = tum.load_image_list(os.path.join(REF_DATA, "rgb_seq_pose.txt"))
        assert len(il.filenames) > 300
        assert il.timestamps[0] > 1.3e9
        assert il.filenames[0].startswith("rgb/")

    @pytest.mark.skipif(not os.path.exists(REF_DATA), reason="reference data absent")
    def test_groundtruth(self):
        gt = tum.load_groundtruth(os.path.join(REF_DATA, "groundtruth.txt"))
        assert gt.t_wc.shape[1] == 3 and gt.q_wc.shape[1] == 4
        # quaternions normalized
        np.testing.assert_allclose(np.linalg.norm(gt.q_wc, axis=1), 1.0, atol=1e-3)
        pose = tum.lookup_pose(gt, gt.timestamps[100])
        assert pose is not None

    @pytest.mark.skipif(not os.path.exists(REF_DATA), reason="reference data absent")
    def test_t_table_matches_reference_fixture(self):
        ref = tum.load_t_table(os.path.join(REF_DATA, "t_test.txt"))
        syn = tum.load_t_table(None)
        # compare a few well-known critical values
        for dof in (1, 5, 30, 100):
            np.testing.assert_allclose(ref[dof, 1:8], syn[dof, 1:8], rtol=2e-2)

    def test_synthesized_t_table(self):
        t = tum.load_t_table(None)
        assert t.shape[0] >= 122
        np.testing.assert_allclose(t[1, 5], 12.706, rtol=1e-3)  # dof=1, alpha=.05
        np.testing.assert_allclose(t[10, 5], 2.228, rtol=1e-3)


class TestSynthetic:
    def test_scene_and_render(self):
        scene = synthetic.make_room_scene(seed=3, n_landmarks=500, n_objects=2)
        ts, poses = synthetic.make_arc_trajectory(5)
        img = synthetic.render_image(scene, TUM3, poses[0])
        assert img.shape == (480, 640) and img.dtype == np.uint8
        assert img.std() > 20  # textured, not flat

    def test_render_view_consistency(self):
        # the same world point should have similar intensity from two
        # nearby views (needed for ORB matching to work at all)
        scene = synthetic.make_room_scene(seed=3, n_landmarks=10, n_objects=1)
        ts, poses = synthetic.make_arc_trajectory(60)
        im0 = synthetic.render_image(scene, TUM3, poses[0])
        im1 = synthetic.render_image(scene, TUM3, poses[1])
        diff = np.abs(im0.astype(int) - im1.astype(int)).mean()
        assert diff < 12.0, f"inter-frame photometric drift too high: {diff}"

    def test_project_boxes(self):
        scene = synthetic.make_room_scene(seed=3, n_landmarks=200, n_objects=3)
        ts, poses = synthetic.make_arc_trajectory(3)
        boxes, cls, score, valid = synthetic.project_boxes(scene, TUM3, poses[0], 16)
        assert valid.sum() >= 2
        assert (boxes[valid][:, 2:] > 10).all()

    def test_simulate_observations(self, rng):
        scene = synthetic.make_room_scene(seed=3, n_landmarks=800, n_objects=2)
        ts, poses = synthetic.make_arc_trajectory(4)
        obs = synthetic.simulate_observations(scene, TUM3, poses[0], 512, rng)
        assert obs["valid"].sum() > 200
        # reprojection of the true landmark must match the stored keypoint
        i = np.nonzero(obs["valid"])[0][0]
        lm = scene.landmarks[obs["lm_idx"][i]]
        pc = poses[0][:3, :3] @ lm + poses[0][:3, 3]
        u = TUM3.fx * pc[0] / pc[2] + TUM3.cx
        assert abs(u - obs["kp"][i, 0]) < 3.0


class TestTrajectory:
    def test_ate_zero_for_identical(self, rng):
        t = rng.normal(size=(50, 3))
        assert trajectory.ate_rmse(t, t) < 1e-9

    def test_ate_invariant_to_sim3(self, rng):
        from eao_slam_tpu.geometry import so3
        import jax.numpy as jnp

        t = rng.normal(size=(50, 3))
        R = np.asarray(so3.exp(jnp.array([0.3, -0.2, 0.9])))
        warped = 1.7 * t @ R.T + np.array([5.0, -2.0, 1.0])
        assert trajectory.ate_rmse(warped, t) < 1e-5

    def test_save_tum(self, tmp_path, rng):
        T = np.tile(np.eye(3, 4), (5, 1, 1))
        T[:, 0, 3] = np.arange(5)
        n = trajectory.save_tum(str(tmp_path / "kf.txt"), np.arange(5.0), T)
        assert n == 5
        rows = np.loadtxt(tmp_path / "kf.txt")
        assert rows.shape == (5, 8)
        np.testing.assert_allclose(rows[:, 1], -np.arange(5.0))  # twc = -R^T t


def test_config_flags():
    from eao_slam_tpu.config import DemoFlag

    cfg = tum3_config("Full")
    assert cfg.flag.use_iou and cfg.flag.use_nonparam and cfg.flag.use_ttest
    assert cfg.flag.use_iforest and cfg.flag.use_yaw_lines and cfg.flag.semidense_enabled
    assert not tum3_config("None").flag.objects_enabled
    assert tum3_config("IoU").flag.use_iou and not tum3_config("IoU").flag.use_nonparam
    assert tum3_config("NP").flag.use_nonparam and not tum3_config("NP").flag.use_iou
    # configs must be hashable (jit-static)
    hash(cfg)


class TestGroundtruthProtocol:
    """Per-frame GT-pose table protocol (src/Tracking.cc:197-241,506-555):
    the whole groundtruth.txt loads once, each frame looks up its pose by
    nearest timestamp, and System.set_groundtruth feeds the initializer
    frame's pose to the ground-alignment step."""

    def _write_gt(self, path, n=20):
        # TUM format: t tx ty tz qx qy qz qw
        rows = []
        for i in range(n):
            t = 100.0 + 0.1 * i
            rows.append(f"{t:.4f} {0.01*i:.4f} 0.0 {0.02*i:.4f} 0 0 0 1\n")
        with open(path, "w") as f:
            f.write("# ground truth\n")
            f.writelines(rows)

    def test_per_frame_lookup(self, tmp_path):
        from eao_slam_tpu.io.tum import load_groundtruth, lookup_pose_matrix

        p = str(tmp_path / "groundtruth.txt")
        self._write_gt(p)
        gt = load_groundtruth(p)
        assert len(gt.timestamps) == 20
        # exact hit
        T = lookup_pose_matrix(gt, 100.5)
        assert T is not None and abs(T[0, 3] - 0.05) < 1e-6
        # nearest within tolerance
        T = lookup_pose_matrix(gt, 100.52, tol=0.05)
        assert T is not None and abs(T[0, 3] - 0.05) < 1e-6
        # outside tolerance -> None (frames without GT track without it)
        assert lookup_pose_matrix(gt, 50.0, tol=0.05) is None

    def test_system_consumes_gt_for_alignment(self, tmp_path):
        """System.set_groundtruth + track_frame: only the initializer
        frame's pose is consumed (ground alignment); a missing per-frame
        entry must not break tracking."""
        import numpy as np

        from eao_slam_tpu.config import CapacityConfig, tum3_config
        from eao_slam_tpu.geometry.camera import TUM3
        from eao_slam_tpu.io.synthetic import (
            make_arc_trajectory, make_room_scene, simulate_observations,
        )
        from eao_slam_tpu.io.trajectory import save_tum
        from eao_slam_tpu.runtime.frame import frame_from_arrays
        from eao_slam_tpu.system import System

        cfg = tum3_config().replace(capacity=CapacityConfig(
            max_keyframes=32, max_points=2048, max_features=256,
            local_ba_points=512))
        scene = make_room_scene(seed=5, n_landmarks=1000, n_objects=2)
        ts, gt_poses = make_arc_trajectory(n_frames=14, sweep_deg=10.0)
        # write T_wc ground truth rows for only the first half of frames
        Twc = []
        for T in gt_poses:
            R = T[:3, :3].T
            t = -R @ T[:3, 3]
            Twc.append(np.concatenate([R, t[:, None]], 1))
        p = str(tmp_path / "groundtruth.txt")
        save_tum(p, ts[:7], np.stack([np.linalg.inv(
            np.vstack([T, [0, 0, 0, 1]]))[:3] for T in Twc[:7]]))

        sys_ = System(cfg)
        sys_.set_groundtruth(p)
        rng = np.random.default_rng(7)
        for i in range(14):
            obs = simulate_observations(scene, TUM3, gt_poses[i],
                                        max_features=256, rng=rng)
            obs.pop("lm_idx", None)
            f = frame_from_arrays(cfg, **obs)
            sys_.track_frame(f, float(ts[i]))
        sys_.flush()  # chunked mode: dispatch the buffered tail
        assert sys_.tracker.state == 2
        est_ts, _ = sys_.tracker.frame_trajectory()
        assert len(est_ts) >= 8
