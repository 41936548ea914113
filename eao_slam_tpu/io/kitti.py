"""KITTI odometry sequence loading (mono_kitti driver contract).

Mirrors Examples/Monocular/mono_kitti.cc LoadImages (:127-157): timestamps
from `<seq>/times.txt` (one float per line, seconds) and frames at
`<seq>/image_2/%06d.png`. Camera presets per sequence group follow the
reference's KITTI00-02 / KITTI03 / KITTI04-12 yamls
(geometry/camera.py KITTI* constants).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from eao_slam_tpu.geometry.camera import KITTI00_02, KITTI03, KITTI04_12, Camera


class ImageList(NamedTuple):
    timestamps: np.ndarray   # [N] f64 seconds
    filenames: list          # [N] paths relative to the sequence dir


def load_kitti_sequence(seq_dir: str, image_dir: str = "image_2") -> ImageList:
    """times.txt + image_2/%06d.png listing (mono_kitti.cc:127-157)."""
    times_path = os.path.join(seq_dir, "times.txt")
    ts = []
    with open(times_path) as f:
        for line in f:
            line = line.strip()
            if line:
                ts.append(float(line.split()[0]))
    names = [os.path.join(image_dir, "%06d.png" % i) for i in range(len(ts))]
    return ImageList(np.asarray(ts, np.float64), names)


def kitti_camera(sequence: int | str) -> Camera:
    """Sequence number -> intrinsics preset (the reference's yaml choice)."""
    n = int(sequence)
    if 0 <= n <= 2:
        return KITTI00_02
    if n == 3:
        return KITTI03
    if 4 <= n <= 12:
        return KITTI04_12
    raise ValueError(f"unknown KITTI odometry sequence {sequence}")
