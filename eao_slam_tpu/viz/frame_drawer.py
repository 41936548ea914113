"""2D frame overlay — FrameDrawer parity (src/FrameDrawer.cc).

DrawFrame (src/FrameDrawer.cc:30): tracked keypoints as green circles,
keypoints inside a detector box colored by the box (":107-136"),
YOLO boxes + class labels (DrawYoloInfo, ":151,217-262"), 2D line
segments, and the status text bar (":210"). Output is an RGB uint8
array (save with viz.raster.save_png).
"""

from __future__ import annotations

import numpy as np

from eao_slam_tpu.viz.raster import (
    draw_circles,
    draw_points,
    draw_rects,
    draw_segments,
    draw_text,
    gray_to_rgb,
)

STATE_NAMES = {0: "WAITING FOR IMAGES", 1: "TRYING TO INITIALIZE",
               2: "SLAM MODE", 3: "TRACK LOST"}

# deterministic per-class palette (DrawYoloInfo colors boxes by class id,
# src/FrameDrawer.cc:151-216)
def class_color(cls: int) -> tuple:
    rng = np.random.default_rng(int(cls) + 7)
    c = rng.integers(40, 230, 3)
    return int(c[0]), int(c[1]), int(c[2])


def _inside(kp: np.ndarray, box: np.ndarray) -> np.ndarray:
    x, y, w, h = box
    return ((kp[:, 0] >= x) & (kp[:, 0] <= x + w)
            & (kp[:, 1] >= y) & (kp[:, 1] <= y + h))


def draw_frame(img: np.ndarray, frame=None, state: int = 2,
               tracked_mask: np.ndarray | None = None,
               n_tracked: int | None = None,
               show_lines: bool = True) -> np.ndarray:
    """Render the FrameDrawer overlay.

    img: grayscale [H,W] (any dtype) or RGB uint8.
    frame: runtime.frame.Frame (optional — status bar only if absent).
    tracked_mask: [F] bool — features matched to a map point this frame
      (green); unmatched valid features draw dim gray.
    """
    canvas = gray_to_rgb(np.asarray(img))
    h, w = canvas.shape[:2]

    if frame is not None:
        kp = np.asarray(frame.kp)
        valid = np.asarray(frame.valid)
        boxes = np.asarray(frame.boxes)
        bcls = np.asarray(frame.box_class)
        bval = np.asarray(frame.box_valid)

        # 2D line segments (object-line association inputs)
        if show_lines and frame.lines is not None:
            lines = np.asarray(frame.lines)
            lval = np.asarray(frame.line_valid)
            if lval.any():
                draw_segments(canvas, lines[lval, :2], lines[lval, 2:],
                              color=(200, 120, 0))

        # keypoints: in-box keypoints take the box's class color
        # (src/FrameDrawer.cc:107-136); tracked ones get circles
        color = np.zeros((len(kp), 3), np.uint8)
        color[:] = (120, 120, 120)
        for b in range(len(boxes)):
            if bval[b] and bcls[b] >= 0:
                m = _inside(kp, boxes[b]) & valid
                color[m] = class_color(int(bcls[b]))
        tm = (np.asarray(tracked_mask) if tracked_mask is not None
              else np.zeros(len(kp), bool))
        plain = valid & ~tm
        if plain.any():
            # batch per distinct color (box count is small)
            colors = color[plain]
            pts = kp[plain]
            for col in np.unique(colors, axis=0):
                m = (colors == col).all(axis=1)
                draw_points(canvas, pts[m], color=col, radius=1)
        if tm.any():
            draw_circles(canvas, kp[valid & tm], radius=3, color=(0, 200, 0))
            draw_points(canvas, kp[valid & tm], color=(0, 200, 0), radius=1)

        # detector boxes + class label (DrawYoloInfo)
        for b in range(len(boxes)):
            if bval[b] and bcls[b] >= 0:
                col = class_color(int(bcls[b]))
                draw_rects(canvas, boxes[b:b + 1], color=col, thickness=1)
                draw_text(canvas, (boxes[b, 0] + 2, boxes[b, 1] + 2),
                          f"C{int(bcls[b])}", color=col)

    # status bar (FrameDrawer::DrawTextInfo)
    bar_h = 12
    bar = np.zeros((bar_h, w, 3), np.uint8)
    txt = STATE_NAMES.get(int(state), "?")
    if n_tracked is not None:
        txt += f"  MATCHES: {int(n_tracked)}"
    draw_text(bar, (4, 2), txt, color=(255, 255, 255))
    return np.concatenate([canvas, bar], axis=0)
