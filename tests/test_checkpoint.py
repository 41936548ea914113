"""Checkpoint / resume: save a live map, restore into a fresh tracker,
relocalize and keep tracking."""

import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, DemoFlag, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    simulate_observations,
)
from eao_slam_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from eao_slam_tpu.runtime.frame import frame_from_arrays
from eao_slam_tpu.runtime.tracker import LOST, OK, MonoTracker


def cfg_small():
    return tum3_config(DemoFlag.NONE).replace(
        capacity=CapacityConfig(max_keyframes=64, max_points=4096,
                                max_features=256, local_ba_points=1536)
    )


@pytest.mark.slow
def test_save_restore_relocalize(tmp_path, rng):
    cfg = cfg_small()
    scene = make_room_scene(seed=3, n_landmarks=1200, n_objects=2)
    ts, gt = make_arc_trajectory(n_frames=40, sweep_deg=35.0)
    nprng = np.random.default_rng(7)
    frames = [
        simulate_observations(scene, TUM3, T, max_features=256, rng=nprng,
                              pixel_noise=0.4, bit_flips=6)
        for T in gt
    ]

    t1 = MonoTracker(cfg)
    for i in range(25):
        f = frame_from_arrays(cfg, kp=frames[i]["kp"], desc=frames[i]["desc"],
                              octave=frames[i]["octave"], valid=frames[i]["valid"])
        t1.track(f, float(ts[i]))
    assert t1.state == OK
    path = str(tmp_path / "map.ckpt")
    save_checkpoint(path, t1)

    t2 = MonoTracker(cfg)
    meta = load_checkpoint(path, t2)
    assert t2.state == LOST
    assert meta["kf_slots"] == t1.kf_slots
    np.testing.assert_array_equal(
        np.asarray(t2.map.pt_pos), np.asarray(t1.map.pt_pos)
    )

    # continue the sequence: must relocalize and track
    tracked = 0
    for i in range(25, 40):
        f = frame_from_arrays(cfg, kp=frames[i]["kp"], desc=frames[i]["desc"],
                              octave=frames[i]["octave"], valid=frames[i]["valid"])
        if t2.track(f, float(ts[i])) is not None:
            tracked += 1
    assert t2.state == OK
    assert tracked >= 10, f"only {tracked}/15 frames tracked after restore"


def test_capacity_mismatch_rejected(tmp_path, rng):
    cfg = cfg_small()
    t1 = MonoTracker(cfg)
    path = str(tmp_path / "map.ckpt")
    save_checkpoint(path, t1)
    other = tum3_config(DemoFlag.NONE).replace(
        capacity=CapacityConfig(max_keyframes=32, max_points=2048,
                                max_features=128)
    )
    t2 = MonoTracker(other)
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(path, t2)
