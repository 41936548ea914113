"""System reset, early-loss auto-reset and localization-only mode
(src/Tracking.cc:771-779, 2345-2393; src/System.cc:254-286)."""

import numpy as np

from eao_slam_tpu.config import CapacityConfig, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    simulate_observations,
)
from eao_slam_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from eao_slam_tpu.runtime.frame import frame_from_arrays
from eao_slam_tpu.runtime.tracker import LOST, NO_IMAGES, OK, MonoTracker


def cfg_small():
    return tum3_config().replace(
        capacity=CapacityConfig(max_keyframes=64, max_points=4096,
                                max_features=256, local_ba_points=1024)
    )


def make_frames(cfg, n=40, seed=3, sweep=35.0):
    scene = make_room_scene(seed=seed, n_landmarks=1200, n_objects=2)
    ts, gt = make_arc_trajectory(n_frames=n, sweep_deg=sweep)
    rng = np.random.default_rng(7)
    obs = [simulate_observations(scene, TUM3, T, max_features=256, rng=rng,
                                 pixel_noise=0.4, bit_flips=6) for T in gt]
    frames = [frame_from_arrays(cfg, kp=o["kp"], desc=o["desc"],
                                octave=o["octave"], valid=o["valid"])
              for o in obs]
    return ts, gt, frames


def blank_frame(cfg, like):
    return frame_from_arrays(
        cfg, kp=np.asarray(like.kp), desc=np.asarray(like.desc),
        octave=np.asarray(like.octave),
        valid=np.zeros(like.valid.shape, bool),
    )


def test_manual_reset_clears_map():
    cfg = cfg_small()
    ts, gt, frames = make_frames(cfg)
    t = MonoTracker(cfg)
    for i in range(20):
        t.track(frames[i], float(ts[i]))
    assert t.state == OK and len(t.kf_slots) >= 2
    t.reset()
    assert t.state == NO_IMAGES
    assert len(t.kf_slots) == 0
    assert not np.asarray(t.map.kf_valid).any()
    assert not np.asarray(t.map.pt_valid).any()
    # and the tracker can rebuild a map afterwards
    for i in range(20):
        t.track(frames[i], float(ts[i]))
    assert t.state == OK


def test_early_loss_auto_reset_recovers():
    """A botched start (tracking dies right after init, <=5 keyframes) must
    auto-reset and re-initialize cleanly instead of relocalizing against a
    garbage map (src/Tracking.cc:771-779)."""
    cfg = cfg_small()
    ts, gt, frames = make_frames(cfg)
    t = MonoTracker(cfg)
    # initialize on the first few frames
    i = 0
    while t.state != OK and i < 10:
        t.track(frames[i], float(ts[i]))
        i += 1
    assert t.state == OK and len(t.kf_slots) <= 5
    # kill tracking immediately (blank observations) -> LOST with few KFs
    for _ in range(2):
        t.track(blank_frame(cfg, frames[i]), float(ts[i]))
        i += 1
    assert t.state == NO_IMAGES, "early loss must trigger a full reset"
    assert len(t.kf_slots) == 0
    # the rest of the sequence re-initializes and tracks
    tracked = 0
    while i < len(frames):
        if t.track(frames[i], float(ts[i])) is not None:
            tracked += 1
        i += 1
    assert t.state == OK
    assert tracked >= 15


def test_localization_mode_tracks_frozen_map(tmp_path):
    """Localization-only mode tracks against a checkpointed map without
    growing it (System::ActivateLocalizationMode semantics)."""
    cfg = cfg_small()
    ts, gt, frames = make_frames(cfg)
    t1 = MonoTracker(cfg)
    for i in range(25):
        t1.track(frames[i], float(ts[i]))
    assert t1.state == OK
    path = str(tmp_path / "map.ckpt")
    save_checkpoint(path, t1)

    t2 = MonoTracker(cfg)
    load_checkpoint(path, t2)
    t2.set_localization_mode(True)
    n_kf = len(t2.kf_slots)
    n_pts = int(np.asarray(t2.map.pt_valid).sum())
    tracked = 0
    for i in range(25, 40):
        if t2.track(frames[i], float(ts[i])) is not None:
            tracked += 1
    assert t2.state == OK
    assert tracked >= 10, f"only {tracked}/15 tracked in localization mode"
    # map is frozen: no new keyframes, no new points
    assert len(t2.kf_slots) == n_kf
    assert int(np.asarray(t2.map.pt_valid).sum()) == n_pts
