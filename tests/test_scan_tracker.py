"""Chunked device-resident tracker (runtime/scan_tracker.py).

Runs the same synthetic sequence as the interactive MonoTracker e2e test
through the lax.scan chunk program and checks the Sim(3)-aligned ATE bound —
the parity proof that moving the state machine + local mapping on-device
preserves the estimator (SURVEY.md §7.3 "thread-pipeline semantics").
"""

import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, SystemConfig, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    simulate_observations,
)
from eao_slam_tpu.io.trajectory import ate_rmse, associate_by_time
from eao_slam_tpu.runtime.frame import frame_from_arrays
from eao_slam_tpu.runtime.scan_tracker import (
    OK,
    ChunkedTracker,
    batch_from_frames,
)


def small_config() -> SystemConfig:
    return tum3_config().replace(
        capacity=CapacityConfig(
            max_keyframes=64,
            max_points=4096,
            max_features=256,
            local_ba_points=1024,
        )
    )


@pytest.fixture(scope="module")
def sequence():
    scene = make_room_scene(seed=3, n_landmarks=1200, n_objects=3)
    ts, gt = make_arc_trajectory(n_frames=50, sweep_deg=40.0)
    rng = np.random.default_rng(7)
    frames = [
        simulate_observations(scene, TUM3, T, max_features=256, rng=rng,
                              pixel_noise=0.4, bit_flips=6, dropout=0.05)
        for T in gt
    ]
    return ts, gt, frames


def test_chunked_tracker_matches_gt(sequence):
    ts, gt, obs_list = sequence
    cfg = small_config()
    tracker = ChunkedTracker(cfg, chunk=16)

    frames = [
        frame_from_arrays(cfg, kp=o["kp"], desc=o["desc"], octave=o["octave"],
                          valid=o["valid"])
        for o in obs_list
    ]

    i = 0
    while i < len(frames) and not tracker.bootstrap(frames[i], float(ts[i])):
        i += 1
    i += 1
    assert tracker.carry is not None, "two-view init never succeeded"

    while i < len(frames):
        j = min(i + 16, len(frames))
        # pad the tail chunk by repeating the last frame (outputs discarded)
        chunk = frames[i:j]
        tchunk = list(ts[i:j])
        while len(chunk) < 16:
            chunk.append(chunk[-1])
            tchunk.append(tchunk[-1])
        outs = tracker.track_batch(batch_from_frames(chunk, tchunk))
        # drop padded records
        if j - i < 16:
            tracker.records = tracker.records[: len(tracker.records) - (16 - (j - i))]
        i = j

    states = np.array([s for _, _, s in tracker.records])
    assert (states == OK).sum() >= 40, f"tracked {((states == OK).sum())}/50"

    est_ts, est_T = tracker.frame_trajectory()
    gt_T = np.stack(gt)
    pairs = associate_by_time(est_ts, np.asarray(ts))
    est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in est_T])
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt_T[pairs[:, 1]]])
    rmse = ate_rmse(est_c, gt_c, with_scale=True)
    assert rmse < 0.05, f"ATE RMSE {rmse:.4f} too high"

    kf_ts, kf_T = tracker.keyframe_trajectory()
    assert len(kf_ts) >= 3


def test_between_chunk_relocalization(sequence):
    """A chunk ending LOST with a stale pose recovers through the
    between-chunk signature+EPnP relocalization (Tracking::Relocalization
    at chunk rate) — the in-scan reacquire only retries the reference
    keyframe from the last pose."""
    import jax.numpy as jnp

    from eao_slam_tpu.runtime.scan_tracker import LOST

    ts, gt, frames = sequence
    cfg = small_config()
    chunk = 5
    tracker = ChunkedTracker(cfg, chunk=chunk)
    i = 0
    while i < len(frames) and tracker.carry is None:
        obs = frames[i]
        f = frame_from_arrays(cfg, kp=obs["kp"], desc=obs["desc"],
                              octave=obs["octave"], valid=obs["valid"])
        tracker.bootstrap(f, float(ts[i]))
        i += 1
    # two chunks of normal tracking to build a map
    for _ in range(2):
        fs = [frame_from_arrays(cfg, kp=frames[j]["kp"], desc=frames[j]["desc"],
                                octave=frames[j]["octave"], valid=frames[j]["valid"])
              for j in range(i, i + chunk)]
        tracker.track_batch(batch_from_frames(fs, ts[i:i + chunk]))
        i += chunk

    # kidnap: put the tracker in LOST with a garbage last pose but REAL
    # last-frame features (frame i), then run the between-chunk pass
    obs = frames[i]
    fr = frame_from_arrays(cfg, kp=obs["kp"], desc=obs["desc"],
                           octave=obs["octave"], valid=obs["valid"])
    T_garbage = np.eye(3, 4, dtype=np.float32)
    T_garbage[:, 3] = [5.0, 5.0, 5.0]
    c = tracker.carry
    tracker.carry = c._replace(
        state=jnp.asarray(LOST, jnp.int32),
        T_last=jnp.asarray(T_garbage),
        last_kp=fr.kp, last_desc=fr.desc,
        last_octave=fr.octave,
        last_valid=fr.valid,
        last_pt=jnp.full((cfg.capacity.max_features,), -1, jnp.int32),
    )
    # carry surgery must keep the host mirrors coherent (production code
    # updates them through _record_chunk)
    tracker.state_host = LOST
    tracker._maybe_relocalize()
    assert int(tracker.carry.state) == 2, "relocalization failed"
    # recovered pose is near this frame's ground truth AFTER sim3-aligning
    # the (scale-normalized) map to GT via the keyframe trajectory
    from eao_slam_tpu.io.trajectory import umeyama_alignment

    kf_ts, kf_T = tracker.keyframe_trajectory()
    est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in kf_T])
    idx = [int(np.argmin(np.abs(ts - t))) for t in kf_ts]
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt[idx]])
    s, R, t = umeyama_alignment(est_c, gt_c, with_scale=True)
    T_rec = np.asarray(tracker.carry.T_last)
    c_rec = s * (R @ (-T_rec[:3, :3].T @ T_rec[:3, 3])) + t
    c_gt = -gt[i][:3, :3].T @ gt[i][:3, 3]
    assert np.linalg.norm(c_rec - c_gt) < 0.05, (c_rec, c_gt)
    # and the next chunk tracks normally from the recovered pose
    fs = [frame_from_arrays(cfg, kp=frames[j]["kp"], desc=frames[j]["desc"],
                            octave=frames[j]["octave"], valid=frames[j]["valid"])
          for j in range(i, i + chunk)]
    outs = tracker.track_batch(batch_from_frames(fs, ts[i:i + chunk]))
    assert int(np.asarray(outs.state)[-1]) == 2
