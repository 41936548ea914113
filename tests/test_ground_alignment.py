"""Ground-frame alignment (src/Tracking.cc:1018-1045): under a tilted first
camera, feeding the initializer frame's GT pose must rotate the whole map
into the gravity-aligned ground frame, so keyframe poses match GT (up to
mono scale) and object yaw/ground-lift geometry is meaningful."""

import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, DemoFlag, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    simulate_observations,
)
from eao_slam_tpu.io.tum import pose_from_tq
from eao_slam_tpu.runtime.frame import frame_from_arrays
from eao_slam_tpu.runtime.tracker import OK, MonoTracker, np_inverse


def _tilt(deg_roll, deg_pitch):
    """World-frame tilt rotation applied to camera poses."""
    a, b = np.deg2rad(deg_roll), np.deg2rad(deg_pitch)
    Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    return (Rx @ Ry).astype(np.float64)


def test_pose_from_tq_roundtrip():
    q = np.array([np.cos(0.3), 0.0, np.sin(0.3), 0.0])  # wxyz, yaw 0.6 rad
    t = np.array([1.0, 2.0, 3.0])
    T = pose_from_tq(t, q)
    assert T.shape == (3, 4)
    R = T[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.allclose(T[:3, 3], t)


@pytest.mark.slow
def test_tilted_camera_map_lands_in_ground_frame():
    cfg = tum3_config(DemoFlag.NONE).replace(
        capacity=CapacityConfig(max_keyframes=32, max_points=4096,
                                max_features=256, local_ba_points=1024)
    )
    scene = make_room_scene(seed=3, n_landmarks=1500, n_objects=0)
    ts, gt = make_arc_trajectory(n_frames=16, sweep_deg=15.0)

    # tilt every camera pose: T_cw' = T_cw @ Tilt^-1 — the cameras look at
    # the same scene but the "SLAM world" (first camera) is NOT gravity
    # aligned unless ground alignment kicks in
    Q = _tilt(18.0, -12.0)
    gt_tilted = []
    for T in gt:
        R = T[:3, :3] @ Q.T
        gt_tilted.append(np.concatenate([R, T[:3, 3:4]], axis=1))
    # GT poses in the ground frame: T_wc = inverse(T_cw) of the tilted poses
    # expressed in the ORIGINAL (gravity-aligned) world
    rng = np.random.default_rng(7)

    tracker = MonoTracker(cfg)
    for i, T_cw in enumerate(gt_tilted):
        # rotate the world points into the camera consistent with the tilt:
        # equivalently use the tilted pose directly against the scene
        obs = simulate_observations(scene, TUM3, T_cw, max_features=256,
                                    rng=rng, pixel_noise=0.3, bit_flips=4)
        f = frame_from_arrays(cfg, kp=obs["kp"], desc=obs["desc"],
                              octave=obs["octave"], valid=obs["valid"])
        gt_pose = np_inverse(np.asarray(T_cw, np.float32))  # T_wc
        tracker.track(f, float(ts[i]), gt_pose=gt_pose)

    assert tracker.state == OK
    assert len(tracker.kf_slots) >= 2

    # after alignment, the first keyframe pose must equal the GT camera-from-
    # world of the initializer frame — i.e. the map lives in the ground frame
    kf0 = tracker.kf_slots[0]
    T0 = np.asarray(tracker.map.kf_pose)[kf0]
    init_ts = float(np.asarray(tracker.map.kf_timestamp)[kf0])
    i0 = int(np.argmin(np.abs(ts - init_ts)))
    T0_gt = gt_tilted[i0]
    assert np.allclose(T0[:3, :3], T0_gt[:3, :3], atol=1e-4), (
        f"rotation not ground-aligned:\n{T0}\nvs\n{T0_gt}"
    )

    # gravity check: the world -y axis maps to the GT world -y axis — a
    # ray straight down in SLAM world is straight down in ground frame
    down_slam = T0[:3, :3].T @ (T0_gt[:3, :3] @ np.array([0.0, 1.0, 0.0]))
    assert np.dot(down_slam, [0.0, 1.0, 0.0]) > 0.999
