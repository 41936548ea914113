"""Per-frame observation bundle.

TPU-native counterpart of the reference's Frame (include/Frame.h:83-298):
fixed-capacity padded arrays instead of cv::KeyPoint vectors, so every
downstream stage is shape-stable under jit. The YOLO box fields mirror the
EAO additions (Frame::boxes / boxes_eigen, include/Frame.h with the offline
txt contract of src/Tracking.cc:426-499).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import SystemConfig
from eao_slam_tpu.geometry.camera import undistort_points
from eao_slam_tpu.ops.orb import extract_orb


class Frame(NamedTuple):
    """One frame's front-end output, padded to capacity."""

    kp: jnp.ndarray        # [F, 2] float32 undistorted pixel coords
    desc: jnp.ndarray      # [F, 8] uint32 packed 256-bit descriptors
    octave: jnp.ndarray    # [F] int32
    angle: jnp.ndarray     # [F] float32 radians
    valid: jnp.ndarray     # [F] bool
    # --- EAO: offline detector boxes (class x y w h score contract)
    boxes: jnp.ndarray     # [B, 4] float32 (x, y, w, h)
    box_class: jnp.ndarray  # [B] int32 (-1 = empty slot)
    box_score: jnp.ndarray  # [B] float32
    box_valid: jnp.ndarray  # [B] bool
    # --- 2D line segments (for object-line association / yaw sampling)
    lines: jnp.ndarray     # [L, 4] float32 (x1, y1, x2, y2)
    line_valid: jnp.ndarray  # [L] bool


def pack_descriptors(desc_u8: np.ndarray) -> np.ndarray:
    """[N, 32] uint8 -> [N, 8] uint32 little-endian packed (the layout
    hamming_matrix expects)."""
    return np.ascontiguousarray(desc_u8).view("<u4").reshape(desc_u8.shape[0], 8)


def empty_boxes(cfg: SystemConfig):
    B = cfg.capacity.max_boxes
    return (
        jnp.zeros((B, 4), jnp.float32),
        jnp.full((B,), -1, jnp.int32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), bool),
    )


def empty_lines(cfg: SystemConfig):
    L = cfg.capacity.max_lines
    return jnp.zeros((L, 4), jnp.float32), jnp.zeros((L,), bool)


def frame_from_arrays(
    cfg: SystemConfig,
    kp: np.ndarray,
    desc: np.ndarray,
    octave: np.ndarray,
    valid: np.ndarray,
    angle: Optional[np.ndarray] = None,
    boxes: Optional[np.ndarray] = None,
    box_class: Optional[np.ndarray] = None,
    box_score: Optional[np.ndarray] = None,
    box_valid: Optional[np.ndarray] = None,
    lines: Optional[np.ndarray] = None,
    line_valid: Optional[np.ndarray] = None,
) -> Frame:
    """Build a Frame from precomputed front-end arrays (the injection point
    used by simulation tests and by external feature pipelines — the
    analogue of the reference's offline-YOLO substitution seam)."""
    F = cfg.capacity.max_features
    assert kp.shape[0] == F, f"expected {F} feature slots, got {kp.shape[0]}"
    if desc.dtype == np.uint8:
        desc = pack_descriptors(desc)
    if angle is None:
        angle = np.zeros((F,), np.float32)
    eb, ec, es, ev = empty_boxes(cfg)
    el, elv = empty_lines(cfg)
    return Frame(
        kp=jnp.asarray(kp, jnp.float32),
        desc=jnp.asarray(desc),
        octave=jnp.asarray(octave, jnp.int32),
        angle=jnp.asarray(angle, jnp.float32),
        valid=jnp.asarray(valid, bool),
        boxes=jnp.asarray(boxes, jnp.float32) if boxes is not None else eb,
        box_class=jnp.asarray(box_class, jnp.int32) if box_class is not None else ec,
        box_score=jnp.asarray(box_score, jnp.float32) if box_score is not None else es,
        box_valid=jnp.asarray(box_valid, bool) if box_valid is not None else ev,
        lines=jnp.asarray(lines, jnp.float32) if lines is not None else el,
        line_valid=jnp.asarray(line_valid, bool) if line_valid is not None else elv,
    )


def frame_from_image(
    cfg: SystemConfig,
    img: jnp.ndarray,
    n_features: Optional[int] = None,
    **box_line_kw,
) -> Frame:
    """Run the ORB front end (ops/orb.py — the Pallas-path replacement for
    ORBextractor::operator(), src/ORBextractor.cc:1044) and package the
    result. img: [H, W] grayscale float32 in 0..255."""
    n = n_features or cfg.capacity.max_features
    feats = extract_orb(
        img,
        n_features=n,
        n_levels=cfg.orb.n_levels,
        scale_factor=cfg.orb.scale_factor,
        threshold=float(cfg.orb.fast_threshold),
        min_threshold=float(cfg.orb.fast_min_threshold),
        border=cfg.orb.edge_threshold,
    )
    F = cfg.capacity.max_features
    def pad(a, fill=0):
        if a.shape[0] == F:
            return a
        if a.shape[0] > F:
            return a[:F]
        pad_width = [(0, F - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width, constant_values=fill)

    kp = undistort_points(cfg.camera, feats.kp)
    if cfg.flag.use_yaw_lines and "lines" not in box_line_kw:
        # online per-frame 2D line detection, as the reference runs in the
        # Frame constructor (src/Frame.cc:324-335) to feed object-line
        # association and yaw sampling (src/Tracking.cc:2472-2871)
        from eao_slam_tpu.ops.lines import detect_segments

        segs, sv = detect_segments(img, max_lines=cfg.capacity.max_lines)
        box_line_kw = dict(box_line_kw, lines=np.asarray(segs),
                           line_valid=np.asarray(sv))
    return frame_from_arrays(
        cfg,
        kp=pad(kp),
        desc=np.asarray(pad(feats.desc)),
        octave=np.asarray(pad(feats.octave)),
        valid=np.asarray(pad(feats.valid, fill=False)),
        angle=np.asarray(pad(feats.angle)),
        **box_line_kw,
    )
