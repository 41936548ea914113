"""KITTI / EuRoC dataset contracts: loaders, camera presets, KITTI-format
trajectory export, and the mono_kitti CLI driver end-to-end
(Examples/Monocular/mono_kitti.cc, mono_euroc.cc parity)."""

import os

import numpy as np
import pytest

from eao_slam_tpu.geometry.camera import EUROC, KITTI00_02, KITTI03, KITTI04_12
from eao_slam_tpu.io.euroc import load_euroc_sequence
from eao_slam_tpu.io.kitti import kitti_camera, load_kitti_sequence
from eao_slam_tpu.io.trajectory import load_kitti_poses, save_kitti


def test_kitti_camera_presets():
    assert kitti_camera(0) is KITTI00_02
    assert kitti_camera(2) is KITTI00_02
    assert kitti_camera(3) is KITTI03
    assert kitti_camera(7) is KITTI04_12
    with pytest.raises(ValueError):
        kitti_camera(13)
    assert EUROC.has_distortion and not KITTI00_02.has_distortion


def test_load_kitti_sequence(tmp_path):
    (tmp_path / "image_2").mkdir()
    with open(tmp_path / "times.txt", "w") as f:
        f.write("0.000000\n0.103216\n\n0.206610\n")
    lst = load_kitti_sequence(str(tmp_path))
    assert len(lst.filenames) == 3
    assert lst.filenames[1] == os.path.join("image_2", "000001.png")
    np.testing.assert_allclose(lst.timestamps,
                               [0.0, 0.103216, 0.206610])


def test_load_euroc_sequence(tmp_path):
    times = tmp_path / "stamps.txt"
    times.write_text("#stamp\n1403636579763555584\n1403636579813555456\n")
    lst = load_euroc_sequence(str(tmp_path), str(times))
    assert lst.filenames[0] == "1403636579763555584.png"
    assert abs(lst.timestamps[0] - 1403636579.763555584) < 1e-6
    # directory-listing fallback (mav0/cam0/data layout)
    (tmp_path / "1403636579763555584.png").write_bytes(b"")
    (tmp_path / "1403636579813555456.png").write_bytes(b"")
    lst2 = load_euroc_sequence(str(tmp_path))
    assert lst2.filenames == lst.filenames


def test_save_kitti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    # random valid SE3 camera-from-world poses
    T = np.zeros((4, 3, 4))
    for i in range(4):
        A = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(A)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        T[i, :, :3] = q
        T[i, :, 3] = rng.normal(size=3)
    path = str(tmp_path / "CameraTrajectory.txt")
    n = save_kitti(path, T)
    assert n == 4
    P = load_kitti_poses(path)
    assert P.shape == (4, 3, 4)
    # first pose rebased to identity (src/System.cc: transform by Two)
    np.testing.assert_allclose(P[0], np.eye(4)[:3], atol=1e-7)
    # relative motion preserved: P_i = Twc0^-1 @ Twc_i
    def twc(Ti):
        M = np.eye(4)
        M[:3, :3] = Ti[:, :3].T
        M[:3, 3] = -Ti[:, :3].T @ Ti[:, 3]
        return M
    expect = np.linalg.inv(twc(T[0])) @ twc(T[2])
    np.testing.assert_allclose(P[2], expect[:3], atol=1e-6)


@pytest.mark.slow
def test_mono_kitti_end_to_end(tmp_path):
    import cv2

    from eao_slam_tpu.cli import run_mono_kitti
    from eao_slam_tpu.io.synthetic import (
        make_arc_trajectory,
        make_room_scene,
        render_image,
    )

    cam = KITTI00_02
    seq = tmp_path / "00"
    (seq / "image_2").mkdir(parents=True)
    scene = make_room_scene(seed=5, n_landmarks=80, n_objects=0)
    ts, gt = make_arc_trajectory(n_frames=20, sweep_deg=18.0)
    with open(seq / "times.txt", "w") as f:
        for i, T in enumerate(gt):
            img = render_image(scene, cam, T)
            cv2.imwrite(str(seq / "image_2" / ("%06d.png" % i)), img)
            f.write(f"{ts[i]:.6f}\n")

    out = tmp_path / "out"
    stats = run_mono_kitti("None", str(seq), 0, str(out))
    assert stats["frames_tracked"] >= 8, stats
    assert stats["kitti_rows"] == stats["frames_tracked"]
    P = load_kitti_poses(str(out / "CameraTrajectory.txt"))
    np.testing.assert_allclose(P[0], np.eye(4)[:3], atol=1e-6)
