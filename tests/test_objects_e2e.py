"""Objects-through-the-tracker e2e: synthetic sequence with YOLO-contract
boxes -> MonoTracker(EAO) -> object landmarks near ground truth."""

import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, DemoFlag, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    project_boxes,
    simulate_observations,
)
from eao_slam_tpu.io.trajectory import umeyama_alignment
from eao_slam_tpu.runtime.frame import frame_from_arrays
from eao_slam_tpu.runtime.tracker import OK, MonoTracker


def eao_config():
    return tum3_config(DemoFlag.EAO).replace(
        capacity=CapacityConfig(
            max_keyframes=64, max_points=4096, max_features=256,
            max_boxes=8, max_objects=16, local_ba_points=1536,
        )
    )


@pytest.mark.slow
def test_objects_form_and_match_gt():
    cfg = eao_config()
    scene = make_room_scene(seed=3, n_landmarks=1200, n_objects=3)
    ts, gt = make_arc_trajectory(n_frames=40, sweep_deg=35.0)
    rng = np.random.default_rng(7)

    tracker = MonoTracker(cfg)
    for i, T_gt in enumerate(gt):
        obs = simulate_observations(scene, TUM3, T_gt, max_features=256, rng=rng,
                                    pixel_noise=0.4, bit_flips=6, dropout=0.05)
        bxs, cls, score, bvalid = project_boxes(
            scene, TUM3, T_gt, cfg.capacity.max_boxes
        )
        f = frame_from_arrays(
            cfg, kp=obs["kp"], desc=obs["desc"], octave=obs["octave"],
            valid=obs["valid"], boxes=bxs, box_class=cls, box_score=score,
            box_valid=bvalid,
        )
        tracker.track(f, float(ts[i]))

    assert tracker.state == OK
    table = tracker.obj_table
    valid = np.asarray(table.valid) & ~np.asarray(table.bad)
    n_objects = int(valid.sum())
    assert 2 <= n_objects <= 5, f"expected ~3 objects, got {n_objects}"

    # objects must be observed repeatedly (association, not re-creation)
    n_obs = np.asarray(table.n_obs)[valid]
    assert (n_obs >= 5).sum() >= 2, f"n_obs too low: {n_obs}"

    # align the (scale-free) SLAM map to GT with the keyframe trajectory,
    # then object centers should land near the GT cuboid centers
    kf_ts, kf_T = tracker.keyframe_trajectory()
    est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in kf_T])
    idx = [int(np.argmin(np.abs(ts - t))) for t in kf_ts]
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt[idx]])
    s, R, t = umeyama_alignment(est_c, gt_c, with_scale=True)

    centers = np.asarray(table.center)[valid]
    centers_w = (s * (R @ centers.T)).T + t
    dists = np.linalg.norm(
        scene.obj_centers[None, :, :] - centers_w[:, None, :], axis=-1
    )
    # estimated objects lie near GT objects (centroids are biased toward
    # visible faces + occasional background-wall contamination through the
    # 2D box, so the tolerance is loose; the tight accuracy gate is the
    # ATE test in test_tracking_e2e)
    best = dists.min(axis=1)
    assert (best < 0.7).mean() >= 0.5, best
    assert best.min() < 0.25, best

    # classes preserved through the pipeline
    cls_est = set(np.asarray(table.cls)[valid].tolist())
    assert cls_est <= set(scene.obj_classes.tolist())
