"""EuRoC MAV sequence loading (mono_euroc driver contract).

Mirrors Examples/Monocular/mono_euroc.cc LoadImages: a timestamp file (one
nanosecond stamp per line, the reference ships them under
Examples/Monocular/EuRoC_TimeStamps/) names the frames
`<image_dir>/<stamp>.png`; timestamps convert to seconds (t/1e9). The
camera preset is geometry/camera.py EUROC (Examples/Monocular/EuRoC.yaml,
radial-tangential distortion).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class ImageList(NamedTuple):
    timestamps: np.ndarray   # [N] f64 seconds
    filenames: list          # [N] absolute or image_dir-relative paths


def load_euroc_sequence(image_dir: str, times_path: str | None = None) -> ImageList:
    """Timestamp file + `<image_dir>/<stamp>.png` listing.

    If times_path is None, stamps are taken from the directory listing
    itself (the mav0/cam0/data layout names files by their stamp), which
    covers running without the reference's separate TimeStamps files.
    """
    if times_path is not None:
        stamps = []
        with open(times_path) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    stamps.append(line.split(",")[0].split()[0])
    else:
        stamps = sorted(
            os.path.splitext(n)[0] for n in os.listdir(image_dir)
            if n.endswith(".png")
        )
    ts = np.asarray([float(s) for s in stamps], np.float64) / 1e9
    names = [s + ".png" for s in stamps]
    return ImageList(ts, names)
