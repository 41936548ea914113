"""Command-line drivers — the mono_tum contract plus a synthetic demo.

Mirrors Examples/Monocular/mono_tum.cc: `mono_tum <flag> <sequence_path>`
where flag ∈ {None, iForest, LineAndiForest, NA, IoU, NP, EAO, Full}
(the ablation harness, README §3) and sequence_path is a TUM directory
with rgb.txt; detections load from <seq>/yolo_txts/<timestamp>.txt in the
offline-YOLO contract (src/Tracking.cc:426-499). The `demo` subcommand
runs fully self-contained on the synthetic room scene (no dataset needed).

Usage:
    python -m eao_slam_tpu.cli mono_tum <flag> <sequence_path> [out_dir]
    python -m eao_slam_tpu.cli mono_kitti <flag> <sequence_path> [seq_num] [out_dir]
    python -m eao_slam_tpu.cli mono_euroc <flag> <image_dir> [times_file|-] [out_dir]
    python -m eao_slam_tpu.cli eval_cloud <est.obj/ply> <gt.obj/ply>
    python -m eao_slam_tpu.cli demo [flag] [n_frames]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from eao_slam_tpu.config import CapacityConfig, DemoFlag, tum3_config
from eao_slam_tpu.system import System


def run_mono_tum(flag: str, seq: str, out_dir: str = ".") -> dict:
    from eao_slam_tpu.io.native_loader import SequenceLoader
    from eao_slam_tpu.io.tum import load_image_list, load_yolo_boxes

    cfg = tum3_config(flag)
    sysm = System(cfg)
    lst = load_image_list(os.path.join(seq, "rgb.txt"))
    B = cfg.capacity.max_boxes
    yolo_dir = os.path.join(seq, "yolo_txts")
    gt_path = os.path.join(seq, "groundtruth.txt")
    if os.path.exists(gt_path):  # ground alignment (src/Tracking.cc:197-241)
        sysm.set_groundtruth(gt_path)

    # threaded native decode + prefetch (native/eao_loader.cpp); decoding
    # overlaps tracking instead of stalling it like the reference's
    # synchronous cv::imread loop
    with SequenceLoader(seq, lst.filenames, lst.timestamps,
                        cfg.camera.width, cfg.camera.height) as loader:
        for i, ts, img in loader:
            boxes = None
            if cfg.flag.objects_enabled and os.path.isdir(yolo_dir):
                boxes = load_yolo_boxes(yolo_dir, float(ts), B)
            sysm.track_monocular(img, float(ts), boxes=boxes)

    sysm.shutdown()
    return _export(sysm, out_dir)


def run_mono_kitti(flag: str, seq: str, sequence_num: int = 0,
                   out_dir: str = ".") -> dict:
    """mono_kitti parity driver (Examples/Monocular/mono_kitti.cc): grayscale
    frames from <seq>/image_2/%06d.png paced by times.txt; exports the
    KITTI-format CameraTrajectory.txt alongside the TUM exports."""
    from eao_slam_tpu.config import kitti_config
    from eao_slam_tpu.io.kitti import load_kitti_sequence
    from eao_slam_tpu.io.native_loader import SequenceLoader
    from eao_slam_tpu.io.trajectory import save_kitti

    cfg = kitti_config(sequence_num, flag)
    sysm = System(cfg)
    lst = load_kitti_sequence(seq)
    with SequenceLoader(seq, lst.filenames, lst.timestamps,
                        cfg.camera.width, cfg.camera.height) as loader:
        for i, ts, img in loader:
            sysm.track_monocular(img, float(ts))
    sysm.shutdown()
    stats = _export(sysm, out_dir)
    _, frame_T = sysm.tracker.frame_trajectory()
    stats["kitti_rows"] = save_kitti(
        os.path.join(out_dir, "CameraTrajectory.txt"), np.stack(frame_T)
    ) if len(frame_T) else 0
    return stats


def run_mono_euroc(flag: str, image_dir: str, times_file: str | None = None,
                   out_dir: str = ".") -> dict:
    """mono_euroc parity driver (Examples/Monocular/mono_euroc.cc): frames
    named by nanosecond stamps, EuRoC intrinsics with distortion."""
    from eao_slam_tpu.config import euroc_config
    from eao_slam_tpu.io.euroc import load_euroc_sequence
    from eao_slam_tpu.io.native_loader import SequenceLoader

    cfg = euroc_config(flag)
    sysm = System(cfg)
    lst = load_euroc_sequence(image_dir, times_file)
    with SequenceLoader(image_dir, lst.filenames, lst.timestamps,
                        cfg.camera.width, cfg.camera.height) as loader:
        for i, ts, img in loader:
            sysm.track_monocular(img, float(ts))
    sysm.shutdown()
    return _export(sysm, out_dir)


def run_demo(flag: str = "EAO", n_frames: int = 60, out_dir: str = ".") -> dict:
    from eao_slam_tpu.geometry.camera import TUM3
    from eao_slam_tpu.io.synthetic import (
        make_arc_trajectory,
        make_room_scene,
        project_boxes,
        simulate_observations,
    )
    from eao_slam_tpu.io.trajectory import ate_rmse
    from eao_slam_tpu.runtime.frame import frame_from_arrays

    cfg = tum3_config(flag).replace(
        capacity=CapacityConfig(max_keyframes=64, max_points=8192,
                                max_features=512, local_ba_points=2048)
    )
    sysm = System(cfg)
    scene = make_room_scene(seed=3, n_landmarks=2000, n_objects=3)
    ts, gt = make_arc_trajectory(n_frames=n_frames, sweep_deg=40.0)
    rng = np.random.default_rng(7)

    t0 = time.perf_counter()
    for i, T_gt in enumerate(gt):
        obs = simulate_observations(scene, TUM3, T_gt, max_features=512,
                                    rng=rng, pixel_noise=0.4, bit_flips=6)
        bxs, cls, score, bvalid = project_boxes(scene, TUM3, T_gt,
                                                cfg.capacity.max_boxes)
        f = frame_from_arrays(cfg, kp=obs["kp"], desc=obs["desc"],
                              octave=obs["octave"], valid=obs["valid"],
                              boxes=bxs, box_class=cls, box_score=score,
                              box_valid=bvalid)
        t1 = time.perf_counter()
        sysm.track_frame(f, float(ts[i]))
        sysm.timings.append(time.perf_counter() - t1)
    wall = time.perf_counter() - t0
    sysm.shutdown()

    stats = _export(sysm, out_dir)
    est_ts, est_T = sysm.tracker.frame_trajectory()
    if len(est_ts):
        idx = [int(np.argmin(np.abs(ts - t))) for t in est_ts]
        est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in est_T])
        gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt[idx]])
        stats["ate_rmse_m"] = round(ate_rmse(est_c, gt_c), 5)
    stats["wall_s"] = round(wall, 2)
    stats["fps"] = round(len(gt) / wall, 2)
    return stats


def _export(sysm: System, out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    n_kf = sysm.save_keyframe_trajectory_tum(
        os.path.join(out_dir, "KeyFrameTrajectory.txt"))
    n_fr = sysm.save_frame_trajectory_tum(
        os.path.join(out_dir, "FrameTrajectory.txt"))
    n_obj = sysm.save_objects_json(os.path.join(out_dir, "objects.json"))
    n_sd = sysm.save_semidense_obj(os.path.join(out_dir, "semidense.obj"))
    n_ln = sysm.save_lines_obj(os.path.join(out_dir, "lines3d.obj"))
    n_msh = sysm.save_mesh_obj(os.path.join(out_dir, "mesh.obj"))
    stats = {
        "keyframes": n_kf,
        "frames_tracked": n_fr,
        "objects": n_obj,
        "semidense_points": n_sd,
        "lines3d": n_ln,
        "mesh_tris": n_msh,
    }
    stats.update({f"tracking_{k}": round(v, 4) for k, v in sysm.timing_stats().items()})
    return stats


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd = argv[0]
    if cmd == "mono_tum":
        flag, seq = argv[1], argv[2]
        out = argv[3] if len(argv) > 3 else "."
        stats = run_mono_tum(flag, seq, out)
    elif cmd == "mono_kitti":
        flag, seq = argv[1], argv[2]
        num = int(argv[3]) if len(argv) > 3 else 0
        out = argv[4] if len(argv) > 4 else "."
        stats = run_mono_kitti(flag, seq, num, out)
    elif cmd == "mono_euroc":
        flag, image_dir = argv[1], argv[2]
        times = argv[3] if len(argv) > 3 and argv[3] != "-" else None
        out = argv[4] if len(argv) > 4 else "."
        stats = run_mono_euroc(flag, image_dir, times, out)
    elif cmd == "eval_cloud":
        from eao_slam_tpu.evaluation import evaluate_reconstruction

        stats = evaluate_reconstruction(argv[1], argv[2])
    elif cmd == "demo":
        flag = argv[1] if len(argv) > 1 else "EAO"
        n = int(argv[2]) if len(argv) > 2 else 60
        stats = run_demo(flag, n)
    else:
        print(__doc__)
        return 1
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
