"""Object yaw estimation by image-line alignment.

Rebuild of Tracking::SampleObjYaw + AssociateObjAndLines
(src/Tracking.cc:2472-2871, SURVEY.md §2.1 yaw row): 30 yaw hypotheses in
±45° (3° steps) rotate the object cuboid about the (gravity) y axis; the
8 horizontal cuboid edges are projected into the frame and scored by how
parallel the object's detected 2D line segments are to them (5° gate);
per-sample (count, score, error) accumulate across frames in the object
table's yaw_hist, and the best-supported sample sets the cuboid yaw.

Everything is one [B, S, E, L] angle-comparison tensor per frame — the
reference's nested loops over samples x lines collapse into a broadcast.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera, project
from eao_slam_tpu.objects.state import ObjectTable, yaw_rotation

YAW_SAMPLES = 30
YAW_RANGE = jnp.deg2rad(45.0)
ANGLE_GATE = jnp.deg2rad(5.0)

# horizontal cuboid edges as corner index pairs (bottom 4 + top 4); corner
# order matches objects/state.cuboid_corners
H_EDGES = jnp.asarray(
    [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7], [7, 4]],
    jnp.int32,
)


def sample_yaws() -> jnp.ndarray:
    """30 absolute yaw hypotheses in ±45° (src/Tracking.cc:2661)."""
    return jnp.linspace(-YAW_RANGE, YAW_RANGE, YAW_SAMPLES)


def lines_in_box(lines: jnp.ndarray, line_valid: jnp.ndarray,
                 boxes: jnp.ndarray, expand: float = 15.0) -> jnp.ndarray:
    """[B, L] mask: both endpoints inside the (expanded) detection box
    (AssociateObjAndLines, src/Tracking.cc:2472-2527)."""
    x0 = boxes[:, 0:1] - expand
    y0 = boxes[:, 1:2] - expand
    x1 = boxes[:, 0:1] + boxes[:, 2:3] + expand
    y1 = boxes[:, 1:2] + boxes[:, 3:4] + expand

    def inside(px, py):
        return (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)

    m = inside(lines[None, :, 0], lines[None, :, 1]) \
        & inside(lines[None, :, 2], lines[None, :, 3])
    return m & line_valid[None, :]


@partial(jax.jit, static_argnames=("cam",))
def yaw_sample_scores(
    cam: Camera,
    table: ObjectTable,
    targets: jnp.ndarray,     # [B] object slot per detection (-1 inactive)
    boxes: jnp.ndarray,       # [B, 4]
    T_cw: jnp.ndarray,
    lines: jnp.ndarray,       # [L, 4]
    line_valid: jnp.ndarray,  # [L]
):
    """Per-(detection, yaw sample): (aligned-line count, angle-error sum).
    Returns (counts [B, S], errs [B, S], n_lines [B])."""
    J = table.capacity
    B = targets.shape[0]
    S = YAW_SAMPLES
    tj = jnp.clip(targets, 0, J - 1)
    active = targets >= 0

    lm = lines_in_box(lines, line_valid, boxes) & active[:, None]   # [B, L]
    n_lines = jnp.sum(lm, axis=1)

    line_ang = jnp.arctan2(
        lines[:, 3] - lines[:, 1], lines[:, 2] - lines[:, 0]
    )                                                                # [L]

    yaws = sample_yaws()                                             # [S]
    # cuboid corners per (detection, sample)
    lo = table.cub_min[tj]
    hi = table.cub_max[tj]
    ctr = table.center[tj]
    xs = jnp.stack([lo[:, 0], hi[:, 0], hi[:, 0], lo[:, 0],
                    lo[:, 0], hi[:, 0], hi[:, 0], lo[:, 0]], 1)
    ys_ = jnp.stack([lo[:, 1], lo[:, 1], hi[:, 1], hi[:, 1],
                     lo[:, 1], lo[:, 1], hi[:, 1], hi[:, 1]], 1)
    zs = jnp.stack([lo[:, 2], lo[:, 2], lo[:, 2], lo[:, 2],
                    hi[:, 2], hi[:, 2], hi[:, 2], hi[:, 2]], 1)
    corners_obj = jnp.stack([xs, ys_, zs], -1)                       # [B, 8, 3]
    R = yaw_rotation(yaws)                                           # [S, 3, 3]
    corners_w = ctr[:, None, None, :] + jnp.einsum(
        "sac,bkc->bska", R, corners_obj
    )                                                                # [B, S, 8, 3]

    uv = project(cam, se3.apply(T_cw[None, None, None], corners_w))  # [B, S, 8, 2]
    e0 = uv[:, :, H_EDGES[:, 0], :]                                  # [B, S, E, 2]
    e1 = uv[:, :, H_EDGES[:, 1], :]
    edge_ang = jnp.arctan2(e1[..., 1] - e0[..., 1], e1[..., 0] - e0[..., 0])

    # min angle distance line vs any projected edge (mod pi)
    diff = jnp.abs(edge_ang[:, :, :, None] - line_ang[None, None, None, :])
    diff = jnp.abs(jnp.mod(diff + jnp.pi / 2, jnp.pi) - jnp.pi / 2)  # [B,S,E,L]
    best = jnp.min(diff, axis=2)                                     # [B, S, L]
    aligned = (best < ANGLE_GATE) & lm[:, None, :]
    counts = jnp.sum(aligned, axis=2)                                # [B, S]
    errs = jnp.sum(jnp.where(aligned, best, 0.0), axis=2)
    return counts, errs, n_lines


@jax.jit
def update_yaw(
    table: ObjectTable,
    targets: jnp.ndarray,
    counts: jnp.ndarray,   # [B, S]
    errs: jnp.ndarray,
    n_lines: jnp.ndarray,  # [B]
):
    """Accumulate per-sample evidence into yaw_hist and re-elect each
    object's yaw (the reference's multi-frame (yaw, count, score, err)
    table, src/Tracking.cc:2760-2871)."""
    J = table.capacity
    tj = jnp.clip(targets, 0, J - 1)
    active = (targets >= 0) & (n_lines >= 2)
    safe = jnp.where(active, tj, J)

    score = counts / jnp.maximum(n_lines, 1)[:, None]
    upd = jnp.stack([
        counts.astype(jnp.float32), score.astype(jnp.float32), errs
    ], -1)                                                           # [B, S, 3]
    hist = table.yaw_hist.at[safe].add(upd, mode="drop")

    # elect: rank = total_count * mean_score / (mean_err + eps), needs some
    # minimum accumulated support before overriding yaw 0
    cnt = hist[..., 0]
    sc = hist[..., 1]
    er = hist[..., 2]
    rank = cnt * sc / (er / jnp.maximum(cnt, 1.0) + 0.05)
    best = jnp.argmax(rank, axis=1)                                  # [J]
    enough = jnp.take_along_axis(cnt, best[:, None], 1)[:, 0] >= 5.0
    yaws = sample_yaws()[best]
    new_yaw = jnp.where(enough & table.valid, yaws, table.yaw)
    return table._replace(yaw_hist=hist, yaw=new_yaw)
