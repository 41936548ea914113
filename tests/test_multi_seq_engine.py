"""Full-SLAM multi-sequence batch (parallel/multi_seq.MultiSeqEngine):
S independent sequences advanced by ONE vmapped fused extract+track
program, sequence axis sharded over the mesh — BASELINE.json configs[4]
('multi-sequence distributed batch'), which round 4 only had for BA
problems, not SLAM.

Correctness bar: the batch changes scheduling, not math — every
per-sequence trajectory must match the same sequence tracked solo."""

import jax
import numpy as np
import pytest

from eao_slam_tpu.config import tiny_profile_config
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    render_image,
)
from eao_slam_tpu.parallel.multi_seq import MultiSeqEngine, make_seq_mesh
from eao_slam_tpu.runtime.frame import frame_from_image
from eao_slam_tpu.runtime.scan_tracker import ChunkedTracker

OK = 2
CHUNK = 8

# the ONE shared tiny profile (config.tiny_profile_config) — also used by
# the multi-chip dryrun and the scaling rows, which cite this test for
# correctness
tiny_cfg = tiny_profile_config
CAM = tiny_profile_config().camera


@pytest.fixture(scope="module")
def sequences():
    """Two distinct scenes/trajectories (different seeds and sweeps)."""
    out = []
    for seed, sweep in ((5, 50.0), (11, 50.0)):
        scene = make_room_scene(seed=seed, n_landmarks=100, n_objects=2)
        ts, gt = make_arc_trajectory(n_frames=8 + 2 * CHUNK, sweep_deg=sweep)
        imgs = np.stack([render_image(scene, CAM, T) for T in gt])
        out.append((ts, gt, imgs))
    return out


def _bootstrap(tracker, ts, imgs):
    cfg = tracker.cfg
    i = 0
    while i < len(imgs) and tracker.carry is None:
        tracker.bootstrap(
            frame_from_image(cfg, np.asarray(imgs[i], np.float32)),
            float(ts[i]))
        i += 1
    assert tracker.carry is not None
    return i


def test_multi_seq_engine_matches_solo(sequences):
    cfg = tiny_cfg()
    S = len(sequences)

    # per-sequence bootstrap lengths differ; each sequence consumes its own
    # window of chunks starting where ITS init succeeded (sequences are
    # independent streams — lockstep applies to chunks, not timestamps)
    def n_chunks(start, n):
        return (n - start) // CHUNK

    # solo runs (the reference semantics)
    solo, starts0 = [], []
    for ts, gt, imgs in sequences:
        t = ChunkedTracker(cfg, chunk=CHUNK)
        i = _bootstrap(t, ts, imgs)
        starts0.append(i)
        while i + CHUNK <= len(imgs):
            t.track_images(imgs[i:i + CHUNK], ts[i:i + CHUNK])
            i += CHUNK
        assert int(t.carry.state) == OK
        solo.append(t.frame_trajectory())

    # batched run over the mesh
    mesh = make_seq_mesh(jax.devices()[:2]) if jax.device_count() >= 2 else None
    eng = MultiSeqEngine(cfg, n_seq=S, chunk=CHUNK, mesh=mesh)
    starts = []
    for s, (ts, gt, imgs) in enumerate(sequences):
        starts.append(_bootstrap(eng.trackers[s], ts, imgs))
    assert eng.armed
    assert starts == starts0, "batched bootstrap diverged from solo"
    rounds = min(n_chunks(starts[s], len(sequences[s][0])) for s in range(S))
    for k in range(rounds):
        eng.track_images(
            np.stack([seq[2][st + k * CHUNK: st + (k + 1) * CHUNK]
                      for st, seq in zip(starts, sequences)]),
            np.stack([seq[0][st + k * CHUNK: st + (k + 1) * CHUNK]
                      for st, seq in zip(starts, sequences)]),
        )

    for s in range(S):
        assert int(eng.trackers[s].carry.state) == OK
        ts_b, T_b = eng.frame_trajectory(s)
        ts_s, T_s = solo[s]
        np.testing.assert_array_equal(ts_b, ts_s)
        # vmapping the chunk program relayouts XLA reductions, so poses
        # agree to float32 accumulation noise (measured 2.5e-5 max), not
        # bit-exactly; 2e-4 on a ~1 m trajectory is 0.2 mm
        np.testing.assert_allclose(T_b, T_s, atol=2e-4)
