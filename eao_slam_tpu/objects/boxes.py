"""Axis-aligned box utilities, batched.

Replaces Converter::bboxOverlapratio{,Former,Latter} (include/Converter.h:56-59)
and the 2D box hygiene pass of Tracking (src/Tracking.cc:1383-1487) with
pairwise [N, M] tensor ops. Boxes are (x, y, w, h) float32.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(b[..., 2], 0.0) * jnp.maximum(b[..., 3], 0.0)


def pairwise_intersection(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a: [N, 4], b: [M, 4] -> [N, M] intersection areas."""
    ax0, ay0 = a[:, None, 0], a[:, None, 1]
    ax1, ay1 = ax0 + a[:, None, 2], ay0 + a[:, None, 3]
    bx0, by0 = b[None, :, 0], b[None, :, 1]
    bx1, by1 = bx0 + b[None, :, 2], by0 + b[None, :, 3]
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    return iw * ih


def iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, M] intersection-over-union (bboxOverlapratio)."""
    inter = pairwise_intersection(a, b)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def overlap_former(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, M] intersection / area(a) (bboxOverlapratioFormer)."""
    return pairwise_intersection(a, b) / jnp.maximum(box_area(a)[:, None], 1e-9)


def overlap_latter(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, M] intersection / area(b) (bboxOverlapratioLatter)."""
    return pairwise_intersection(a, b) / jnp.maximum(box_area(b)[None, :], 1e-9)


def intersection_elem(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise (broadcasting) intersection area of (..., 4) boxes."""
    ix0 = jnp.maximum(a[..., 0], b[..., 0])
    iy0 = jnp.maximum(a[..., 1], b[..., 1])
    ix1 = jnp.minimum(a[..., 0] + a[..., 2], b[..., 0] + b[..., 2])
    iy1 = jnp.minimum(a[..., 1] + a[..., 3], b[..., 1] + b[..., 3])
    return jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0)


def iou_elem(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of broadcastable (..., 4) boxes."""
    inter = intersection_elem(a, b)
    return inter / jnp.maximum(box_area(a) + box_area(b) - inter, 1e-9)


def overlap_former_elem(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise intersection / area(a)."""
    return intersection_elem(a, b) / jnp.maximum(box_area(a), 1e-9)


def points_in_box(kp: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """kp: [F, 2], boxes: [B, 4] -> [B, F] containment mask
    (AssociateObjAndPoints, src/Tracking.cc:2434)."""
    x, y = kp[None, :, 0], kp[None, :, 1]
    x0, y0 = boxes[:, 0, None], boxes[:, 1, None]
    return (
        (x >= x0) & (x <= x0 + boxes[:, 2, None])
        & (y >= y0) & (y <= y0 + boxes[:, 3, None])
    )


def bbox_of_points(uv: jnp.ndarray, mask: jnp.ndarray,
                   width: float, height: float) -> jnp.ndarray:
    """Clipped bounding rect of masked 2D points: uv [..., N, 2],
    mask [..., N] -> [..., 4] (x, y, w, h). Empty mask -> zero box."""
    big = 1e9
    x = jnp.where(mask, uv[..., 0], big)
    y = jnp.where(mask, uv[..., 1], big)
    x0 = jnp.clip(jnp.min(x, axis=-1), 0.0, width)
    y0 = jnp.clip(jnp.min(y, axis=-1), 0.0, height)
    x_ = jnp.where(mask, uv[..., 0], -big)
    y_ = jnp.where(mask, uv[..., 1], -big)
    x1 = jnp.clip(jnp.max(x_, axis=-1), 0.0, width)
    y1 = jnp.clip(jnp.max(y_, axis=-1), 0.0, height)
    any_pt = jnp.any(mask, axis=-1)
    w = jnp.where(any_pt, jnp.maximum(x1 - x0, 0.0), 0.0)
    h = jnp.where(any_pt, jnp.maximum(y1 - y0, 0.0), 0.0)
    x0 = jnp.where(any_pt, x0, 0.0)
    y0 = jnp.where(any_pt, y0, 0.0)
    return jnp.stack([x0, y0, w, h], axis=-1)


def box_hygiene(
    boxes: jnp.ndarray,
    cls: jnp.ndarray,
    score: jnp.ndarray,
    valid: jnp.ndarray,
    n_points: jnp.ndarray,
    width: float,
    height: float,
    ignore_classes=(0, 63, 15),
) -> jnp.ndarray:
    """Vectorized 2D detection culling (src/Tracking.cc:1383-1487):
    crowd-overlap, ignore-classes, too-large, too-few-points,
    few-points-on-edge, duplicate suppression by score, containment."""
    B = boxes.shape[0]
    not_self = ~jnp.eye(B, dtype=bool)
    pair_valid = valid[:, None] & valid[None, :] & not_self

    # overlap with > 4 other boxes
    latter = overlap_latter(boxes, boxes)
    crowd = jnp.sum((latter > 0.05) & pair_valid, axis=1) > 4
    bad = ~valid | crowd

    for c in ignore_classes:
        bad |= cls == c
    bad |= box_area(boxes) / (width * height) > 0.5
    bad |= n_points < 5

    on_edge20 = (
        (boxes[:, 0] < 20) | (boxes[:, 1] < 20)
        | (boxes[:, 0] + boxes[:, 2] > width - 20)
        | (boxes[:, 1] + boxes[:, 3] > height - 20)
    )
    bad |= (n_points < 10) & on_edge20

    # pairwise suppression: first keep the higher score at IoU > 0.3, then
    # drop contained boxes (containment > 0.85) among the survivors. (The
    # reference resolves both rules in one sequential sweep whose outcome is
    # iteration-order dependent for near-duplicates, src/Tracking.cc:1436-1460;
    # the two-phase vectorized pass keeps the sane winner.)
    alive = pair_valid & ~bad[:, None] & ~bad[None, :]
    ious = iou(boxes, boxes)
    order = score[:, None] < score[None, :]
    tie = (score[:, None] == score[None, :]) & (
        jnp.arange(B)[:, None] > jnp.arange(B)[None, :]
    )
    bad |= jnp.any(alive & (ious > 0.3) & (order | tie), axis=1)
    alive2 = pair_valid & ~bad[:, None] & ~bad[None, :]
    former = overlap_former(boxes, boxes)
    bad |= jnp.any(alive2 & (ious > 0.05) & (former > 0.85), axis=1)
    return ~bad & valid
