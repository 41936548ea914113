"""The unified production path: System fronting the device-resident
ChunkedTracker (the round-4 'one engine behind the facade' contract,
mirroring src/System.cc:41-154 where System fronts the whole thread pool).

Covers: image-in chunked tracking via the fused extract+track program,
partial-tail dispatch through FrameBatch.active, chunked object
formation + merge, localization mode freezing the map, loop-closer state
surviving slot compaction, and the FULL-flag offline exports."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, DemoFlag, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    project_boxes,
    render_image,
)
from eao_slam_tpu.io.trajectory import ate_rmse
from eao_slam_tpu.system import System

OK = 2


def eao_cfg(flag=DemoFlag.EAO):
    return tum3_config(flag).replace(
        capacity=CapacityConfig(
            max_keyframes=64, max_points=4096, max_features=256,
            max_boxes=8, max_objects=16, local_ba_points=1024, max_lines=32,
        )
    )


@pytest.fixture(scope="module")
def rendered_sequence():
    from eao_slam_tpu.io.synthetic import FACE_SHADE_LINES

    # shaded cuboid faces: the line-detection fixture (the FULL-mode test
    # needs detectable object edges); tracking tolerates it on this 45° arc
    scene = make_room_scene(seed=5, n_landmarks=200, n_objects=3,
                            face_shade=FACE_SHADE_LINES)
    ts, gt = make_arc_trajectory(n_frames=36, sweep_deg=45.0)
    images = np.stack([render_image(scene, TUM3, T) for T in gt])
    boxes = [project_boxes(scene, TUM3, T, 8) for T in gt]
    return scene, ts, gt, images, boxes


def centers(Ts):
    return np.stack([-T[:3, :3].T @ T[:3, 3] for T in Ts])


@pytest.mark.slow
def test_system_chunked_image_e2e(rendered_sequence, tmp_path):
    """track_monocular -> fused extract+track chunks -> exports. The tail
    (not a multiple of chunk) must dispatch through the active mask."""
    scene, ts, gt, images, boxes = rendered_sequence
    sysm = System(eao_cfg(), chunk=8)
    for i in range(len(images)):
        b = tuple(np.asarray(x) for x in boxes[i])
        sysm.track_monocular(images[i], float(ts[i]), boxes=b)
    sysm.shutdown(semidense=False)

    assert sysm.tracker.armed
    assert sysm.tracker.state == OK

    est_ts, est_T = sysm.tracker.frame_trajectory()
    assert len(est_ts) >= 0.9 * len(images)
    idx = [int(np.argmin(np.abs(ts - t))) for t in est_ts]
    ate = ate_rmse(centers(est_T), centers(gt[idx]), with_scale=True)
    assert ate < 0.10, f"chunked System drifted: {ate:.3f} m"

    # exports from the carry (the production engine, not a side map)
    n_kf = sysm.save_keyframe_trajectory_tum(str(tmp_path / "kf.txt"))
    assert n_kf >= 2
    n_obj = sysm.save_objects_json(str(tmp_path / "obj.json"))
    assert n_obj >= 2, "device-resident object layer built no landmarks"
    objs = json.loads((tmp_path / "obj.json").read_text())
    assert {"class", "center", "size", "yaw"} <= set(objs[0].keys())


@pytest.mark.slow
def test_system_full_flag_lines_drive_yaw_and_exports(rendered_sequence,
                                                      tmp_path):
    """DemoFlag.FULL through the unified chunked engine: per-frame line
    detection runs INSIDE the fused extract+track program
    (src/Frame.cc:324-335), its segments feed yaw sampling
    (src/Tracking.cc:2624-2871) with real evidence — the histogram must
    accumulate aligned-line counts and elect a yaw near the ground truth
    (the scene's cuboids are axis-aligned => yaw ~ 0) — and the offline
    semi-dense chain exports from the chunked carry."""
    scene, ts, gt, images, boxes = rendered_sequence
    sysm = System(eao_cfg(DemoFlag.FULL), chunk=8)
    for i in range(len(images)):
        b = tuple(np.asarray(x) for x in boxes[i])
        sysm.track_monocular(images[i], float(ts[i]), boxes=b)
    sysm.shutdown()

    assert sysm.tracker.state == OK
    table = sysm.tracker.carry.table
    valid = np.asarray(table.valid) & ~np.asarray(table.bad)
    assert valid.sum() >= 2

    # real line evidence reached the yaw layer (round-3 ran this on empty
    # line input end-to-end): per-frame votes accumulated in the histogram
    hist = np.asarray(table.yaw_hist)   # [J, S, (times, score, err)]
    votes = hist[valid][..., 0]
    assert votes.sum() > 0, "yaw sampling saw no line evidence"

    # supported objects elect a yaw within ±2 samples of the best
    # achievable one: the 30-sample grid over ±45° has no 0° sample (the
    # nearest are ±1.55°), so for the GT 0-yaw cuboids the tightest
    # possible election is 1.55° and a ±2-sample tolerance admits 7.8°
    # (the reference resolves to its 3° grid the same way,
    # src/Tracking.cc:2661). Measured on this fixture: the engine elects
    # -7.8°/-4.7° — the r4 plateau-wide ±27° gate is retired.
    elected = np.asarray(table.yaw)[valid]
    supported = votes.sum(axis=1) >= 3.0
    if supported.any():
        assert np.abs(elected[supported]).max() <= np.deg2rad(8.0), (
            np.rad2deg(elected[supported]))

    # FULL offline chain from the chunked carry: keyframe images were
    # retained through compactions and the semi-dense pass ran
    n_sd = sysm.save_semidense_obj(str(tmp_path / "sd.obj"))
    assert n_sd > 0, "semi-dense export empty on the chunked engine"


def test_partial_tail_chunk_active_mask(rendered_sequence):
    """A buffer shorter than the chunk dispatches padded+masked: inactive
    slots must not advance the frame counter, insert keyframes, or emit
    records."""
    scene, ts, gt, images, boxes = rendered_sequence
    cfg = tum3_config().replace(capacity=eao_cfg().capacity)
    sysm = System(cfg, chunk=8)
    n = 0
    for i in range(len(images)):
        sysm.track_monocular(images[i], float(ts[i]))
        n += 1
        if sysm.tracker.armed and (n - i) and len(sysm._img_buf) == 5:
            break
    assert sysm.tracker.armed and len(sysm._img_buf) == 5
    fid_before = int(sysm.tracker.carry.frame_id)
    rec_before = len(sysm.tracker.records)
    sysm.flush()
    assert int(sysm.tracker.carry.frame_id) == fid_before + 5
    assert len(sysm.tracker.records) == rec_before + 5
    assert sysm.tracker.state == OK


def test_localization_mode_freezes_chunked_map(rendered_sequence):
    scene, ts, gt, images, boxes = rendered_sequence
    cfg = tum3_config().replace(capacity=eao_cfg().capacity)
    sysm = System(cfg, chunk=8)
    for i in range(24):
        sysm.track_monocular(images[i], float(ts[i]))
    sysm.flush()
    assert sysm.tracker.armed and sysm.tracker.state == OK

    sysm.activate_localization_mode()
    kf_before = int(sysm.tracker.carry.kf_count)
    pt_before = int(sysm.tracker.carry.pt_count)
    for i in range(24, 32):
        sysm.track_monocular(images[i], float(ts[i]))
    sysm.flush()
    assert sysm.tracker.state == OK, "localization-only tracking lost"
    assert int(sysm.tracker.carry.kf_count) == kf_before
    assert int(sysm.tracker.carry.pt_count) == pt_before

    # deactivate: mapping resumes
    sysm.deactivate_localization_mode()
    for i in range(32, len(images)):
        sysm.track_monocular(images[i], float(ts[i]))
    sysm.flush()
    assert sysm.tracker.state == OK


def test_chunked_merge_pass_fuses_duplicate_objects(rng):
    """Two landmarks of one physical object merge between chunks on the
    production path (MergePotentialAssObjs, src/LocalMapping.cc:799-882) —
    the chunked mirror of tests/test_object_merge.py."""
    from eao_slam_tpu.runtime.scan_tracker import ChunkCarry, ChunkedTracker
    from tests.test_object_merge import make_two_object_map

    c = np.array([0.0, 0.0, 4.0])
    m, table = make_two_object_map(rng, c, c + 0.05)
    table = table._replace(re_obj=table.re_obj.at[0, 1].set(5))

    cfg = tum3_config(DemoFlag.EAO).replace(
        capacity=CapacityConfig(max_keyframes=8, max_points=512,
                                max_features=64, max_objects=8)
    )
    tracker = ChunkedTracker(cfg, chunk=4)
    F = 64
    tracker.carry = ChunkCarry(
        m=m, T_last=jnp.eye(3, 4), velocity=jnp.eye(3, 4),
        vel_ok=jnp.asarray(False),
        last_kp=jnp.zeros((F, 2)), last_desc=jnp.zeros((F, 8), jnp.uint32),
        last_octave=jnp.zeros((F,), jnp.int32),
        last_angle=jnp.zeros((F,)), last_valid=jnp.zeros((F,), bool),
        last_pt=jnp.full((F,), -1, jnp.int32),
        state=jnp.asarray(2, jnp.int32),
        frames_since_kf=jnp.asarray(0, jnp.int32),
        ref_kf_tracked=jnp.asarray(0, jnp.int32),
        peak_since_kf=jnp.asarray(0, jnp.int32),
        kf_count=jnp.asarray(0, jnp.int32),
        pt_count=jnp.asarray(80, jnp.int32),
        frame_id=jnp.asarray(0, jnp.int32),
        table=table, obj_key=jax.random.PRNGKey(0),
    )
    tracker._maybe_merge_objects()
    t2 = tracker.carry.table
    valid = np.asarray(t2.valid) & ~np.asarray(t2.bad)
    assert valid.sum() == 1, "duplicate object landmarks not merged"
    owner = np.asarray(tracker.carry.m.pt_object_id)
    j = int(np.nonzero(valid)[0][0])
    assert (owner == j).sum() > 60


def test_loop_closer_state_survives_compaction():
    """Signatures, consistency streaks and the last-loop anchor must remap
    through cull_and_compact instead of resetting (the reference's
    consistency groups persist for the map's lifetime,
    src/LoopClosing.cc:103-229)."""
    from eao_slam_tpu.runtime.loop_closing import LoopCloser

    cfg = tum3_config().replace(
        capacity=CapacityConfig(max_keyframes=8, max_points=512,
                                max_features=64)
    )
    lc = LoopCloser(cfg)
    lc.signatures[0] = 1.0
    lc.signatures[3] = 2.0
    lc.signatures[5] = 3.0
    lc.consistent_streak = {(3, 5): 2, (2, 4): 1}
    lc.last_loop_order = 4

    # slots 2 and 4 culled; survivors compact to the front
    kf_remap = np.array([0, 1, -1, 2, -1, 3, 4, 5])
    lc.remap_slots(kf_remap)

    assert lc.signatures[0, 0] == 1.0
    assert lc.signatures[2, 0] == 2.0   # old slot 3
    assert lc.signatures[3, 0] == 3.0   # old slot 5
    assert np.all(lc.signatures[5:] == 0)
    # group (3,5) -> (2,3) keeps its streak; (2,4) fully culled -> gone
    assert lc.consistent_streak == {(2, 3): 2}
    # anchor at old order 4: nearest surviving predecessor is new order 2
    assert lc.last_loop_order == 2
