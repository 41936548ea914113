"""End-to-end tracking slice (milestone M1, SURVEY.md §7.2 step 5).

Feature-level synthetic sequence -> MonoTracker -> trajectory, checked
against ground truth by Sim(3)-aligned ATE (the standard TUM mono protocol
the reference relies on, Examples/Monocular/mono_tum.cc:126).
"""

import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, SystemConfig, tum3_config
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    simulate_observations,
)
from eao_slam_tpu.io.trajectory import ate_rmse, associate_by_time
from eao_slam_tpu.runtime.frame import frame_from_arrays
from eao_slam_tpu.runtime.tracker import OK, MonoTracker


def small_config() -> SystemConfig:
    return tum3_config().replace(
        capacity=CapacityConfig(
            max_keyframes=64,
            max_points=4096,
            max_features=256,
            local_ba_points=1536,
        )
    )


@pytest.fixture(scope="module")
def sequence():
    scene = make_room_scene(seed=3, n_landmarks=1200, n_objects=3)
    ts, gt = make_arc_trajectory(n_frames=50, sweep_deg=40.0)
    rng = np.random.default_rng(7)
    frames = [
        simulate_observations(scene, _cam(), T, max_features=256, rng=rng,
                              pixel_noise=0.4, bit_flips=6, dropout=0.05)
        for T in gt
    ]
    return scene, ts, gt, frames


def _cam():
    from eao_slam_tpu.geometry.camera import TUM3

    return TUM3


def test_tracks_sequence_with_low_ate(sequence):
    scene, ts, gt, frames = sequence
    cfg = small_config()
    tracker = MonoTracker(cfg)

    tracked = 0
    for i, obs in enumerate(frames):
        f = frame_from_arrays(
            cfg, kp=obs["kp"], desc=obs["desc"], octave=obs["octave"],
            valid=obs["valid"],
        )
        T = tracker.track(f, float(ts[i]))
        if T is not None:
            tracked += 1

    assert tracker.state == OK, "tracker should end in OK state"
    # initialization needs parallax; expect the large majority of frames tracked
    assert tracked >= int(0.7 * len(frames)), f"only {tracked}/{len(frames)} tracked"

    est_ts, est_T = tracker.frame_trajectory()
    pairs = associate_by_time(est_ts, ts)
    assert len(pairs) == len(est_ts)

    # camera centers: C = -R^T t
    est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in est_T])
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt[pairs[:, 1]]])
    ate = ate_rmse(est_c, gt_c, with_scale=True)

    # trajectory spans ~2 m of motion; sub-2cm scale-aligned ATE means the
    # whole stack (init, matching, pose LM, triangulation, local BA) closes
    assert ate < 0.02, f"ATE {ate:.4f} m too high"


def test_map_grows_and_culls(sequence):
    scene, ts, gt, frames = sequence
    cfg = small_config()
    tracker = MonoTracker(cfg)
    for i, obs in enumerate(frames[:30]):
        f = frame_from_arrays(
            cfg, kp=obs["kp"], desc=obs["desc"], octave=obs["octave"],
            valid=obs["valid"],
        )
        tracker.track(f, float(ts[i]))
    assert len(tracker.kf_slots) >= 2
    assert tracker.pt_valid_host.sum() > 100
    # every keyframe observation refers to a valid point
    for s in tracker.kf_slots:
        pts = tracker.kf_pt_host[s]
        live = pts[pts >= 0]
        assert tracker.pt_valid_host[live].all()
