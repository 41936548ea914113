"""System facade + CLI demo contract."""

import json
import os

import numpy as np

from eao_slam_tpu.config import CapacityConfig, DemoFlag, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    project_boxes,
    simulate_observations,
)
from eao_slam_tpu.runtime.frame import frame_from_arrays
from eao_slam_tpu.system import System


def small_cfg(flag=DemoFlag.EAO):
    return tum3_config(flag).replace(
        capacity=CapacityConfig(max_keyframes=64, max_points=4096,
                                max_features=256, local_ba_points=1536)
    )


def test_system_end_to_end_exports(tmp_path, rng):
    cfg = small_cfg()
    sysm = System(cfg)
    scene = make_room_scene(seed=3, n_landmarks=1200, n_objects=3)
    ts, gt = make_arc_trajectory(n_frames=30, sweep_deg=30.0)
    nprng = np.random.default_rng(7)
    for i, T_gt in enumerate(gt):
        obs = simulate_observations(scene, TUM3, T_gt, max_features=256,
                                    rng=nprng, pixel_noise=0.4, bit_flips=6)
        bxs, cls, score, bvalid = project_boxes(scene, TUM3, T_gt,
                                                cfg.capacity.max_boxes)
        f = frame_from_arrays(cfg, kp=obs["kp"], desc=obs["desc"],
                              octave=obs["octave"], valid=obs["valid"],
                              boxes=bxs, box_class=cls, box_score=score,
                              box_valid=bvalid)
        sysm.track_frame(f, float(ts[i]))

    kf_path = tmp_path / "KeyFrameTrajectory.txt"
    n_kf = sysm.save_keyframe_trajectory_tum(str(kf_path))
    assert n_kf >= 2
    lines = kf_path.read_text().strip().splitlines()
    assert len(lines) == n_kf
    assert len(lines[0].split()) == 8  # t tx ty tz qx qy qz qw

    obj_path = tmp_path / "objects.json"
    n_obj = sysm.save_objects_json(str(obj_path))
    assert n_obj >= 2
    objs = json.loads(obj_path.read_text())
    assert {"class", "center", "size", "yaw", "n_obs"} <= set(objs[0].keys())

    stats = sysm.timing_stats()
    assert stats == {} or stats["mean_s"] >= 0


def test_flag_matrix_constructs():
    """Every ablation flag must build a working pipeline config
    (mono_tum's CLI contract, Examples/Monocular/mono_tum.cc:35-48)."""
    for flag in DemoFlag:
        s = System(small_cfg(flag))
        assert (s.tracker.obj_updater is not None) == flag.objects_enabled
