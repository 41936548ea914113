"""Long-sequence endurance: 1000+ frames through the chunked tracker at
fixed capacities. The monotonic slot allocators must never exhaust —
between-chunk keyframe culling + compaction (runtime/compaction.py) frees
tail capacity the way the reference's continuous KeyFrameCulling / point
culling does (src/LocalMapping.cc:175,637-707)."""

import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    simulate_observations,
)
from eao_slam_tpu.io.trajectory import ate_rmse
from eao_slam_tpu.runtime.frame import frame_from_arrays
from eao_slam_tpu.runtime.scan_tracker import (
    OK,
    ChunkedTracker,
    batch_from_frames,
)


def _centers(Ts):
    return np.einsum("nij,ni->nj", -Ts[:, :3, :3], Ts[:, :3, 3])


@pytest.mark.slow
def test_1000_frames_fixed_capacity():
    cfg = tum3_config().replace(
        capacity=CapacityConfig(
            max_keyframes=40, max_points=3072, max_features=256,
            local_ba_points=1024,
        )
    )
    K = cfg.capacity.max_keyframes
    scene = make_room_scene(seed=3, n_landmarks=1500, n_objects=2)
    n = 1008
    ts, gt = make_arc_trajectory(n_frames=n, sweep_deg=110.0)
    rng = np.random.default_rng(7)

    chunk = 16
    tracker = ChunkedTracker(cfg, chunk=chunk)

    def frame(i):
        obs = simulate_observations(scene, TUM3, gt[i], max_features=256,
                                    rng=rng, pixel_noise=0.4, bit_flips=6,
                                    dropout=0.05)
        return frame_from_arrays(cfg, kp=obs["kp"], desc=obs["desc"],
                                 octave=obs["octave"], valid=obs["valid"])

    i = 0
    while i < n and tracker.carry is None:
        tracker.bootstrap(frame(i), float(ts[i]))
        i += 1
    assert tracker.carry is not None

    states, poses, gts = [], [], []
    while i + chunk <= n:
        batch = batch_from_frames([frame(j) for j in range(i, i + chunk)],
                                  ts[i:i + chunk])
        outs = tracker.track_batch(batch)
        states.append(np.asarray(outs.state))
        poses.append(np.asarray(outs.T))
        gts.append(gt[i:i + chunk])
        # the allocators must stay inside capacity at all times
        assert int(tracker.carry.kf_count) <= K
        i += chunk

    states = np.concatenate(states)
    poses = np.concatenate(poses)
    gts = np.concatenate(gts)
    ok = states == 2

    assert tracker.n_maintenance >= 1, "maintenance never triggered"
    assert int(tracker.carry.kf_count) < K, "keyframe capacity exhausted"
    assert ok.mean() >= 0.85, f"tracked only {ok.mean():.2%} of 1000 frames"
    assert int(states[-1]) == OK

    ate = ate_rmse(_centers(poses[ok]), _centers(gts[ok]), with_scale=True)
    assert ate < 0.25, f"unbounded drift: ATE {ate:.3f} m"
