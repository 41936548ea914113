"""mono_tum CLI contract end-to-end: TUM-layout sequence on disk (PNG +
rgb.txt + yolo_txts) -> native loader -> full image pipeline -> exports."""

import json
import os

import numpy as np
import pytest

from eao_slam_tpu.cli import run_mono_tum
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    project_boxes,
    render_image,
)


@pytest.fixture(scope="module")
def tum_sequence(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("tumseq")
    (d / "rgb").mkdir()
    (d / "yolo_txts").mkdir()
    scene = make_room_scene(seed=4, n_landmarks=60, n_objects=2)
    ts, gt = make_arc_trajectory(n_frames=26, sweep_deg=22.0)
    rows = []
    for i, T in enumerate(gt):
        img = render_image(scene, TUM3, T)
        stamp = 1000.0 + ts[i]
        name = f"rgb/{stamp:.6f}.png"
        cv2.imwrite(str(d / name), img)
        rows.append(f"{stamp:.6f} {name}")
        bxs, cls, score, valid = project_boxes(scene, TUM3, T, 8)
        with open(d / "yolo_txts" / f"{stamp:.6f}.txt", "w") as f:
            for b in range(8):
                if valid[b]:
                    x, y, w, h = bxs[b]
                    f.write(f"{cls[b]} {x:.1f} {y:.1f} {w:.1f} {h:.1f} {score[b]:.2f}\n")
    with open(d / "rgb.txt", "w") as f:
        f.write("# timestamp filename\n")
        f.write("\n".join(rows) + "\n")
    return str(d), ts, gt


@pytest.mark.slow
def test_mono_tum_runs_and_exports(tum_sequence, tmp_path):
    seq, ts, gt = tum_sequence
    stats = run_mono_tum("EAO", seq, str(tmp_path))
    assert stats["frames_tracked"] >= 12, stats
    assert stats["keyframes"] >= 2
    assert os.path.exists(tmp_path / "KeyFrameTrajectory.txt")
    objs = json.loads((tmp_path / "objects.json").read_text())
    assert isinstance(objs, list)

    # trajectory sanity: aligned ATE on the real-image pipeline
    rows = (tmp_path / "FrameTrajectory.txt").read_text().strip().splitlines()
    est = np.asarray([[float(v) for v in r.split()] for r in rows])
    from eao_slam_tpu.io.trajectory import ate_rmse

    idx = [int(np.argmin(np.abs((1000.0 + ts) - t))) for t in est[:, 0]]
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt[idx]])
    # save_tum exports camera-in-world, so columns 1:4 ARE camera centers
    ate = ate_rmse(est[:, 1:4], gt_c)
    assert ate < 0.1, f"image-pipeline ATE {ate:.3f} m"
