"""Object yaw estimation by image-line alignment.

Rebuild of Tracking::SampleObjYaw + AssociateObjAndLines
(src/Tracking.cc:2472-2871, SURVEY.md §2.1 yaw row): 30 yaw hypotheses in
±45° (3° steps) rotate the object cuboid about the (gravity) y axis; the
cuboid's three characteristic edge directions — length (top x-edge), width
(top z-edge) and height (a vertical edge) — are projected into the frame
and each associated 2D line votes for hypotheses whose edges it parallels
(5° gate, raw left-to-right-normalized angles, src/Tracking.cc:2701-2795).
Per the reference, the projected edge that is currently SHORTEST (most
foreshortened, least reliable) is excluded from matching, except for the
chair class which always matches all and triple-weights the length edge
(src/Tracking.cc:2745-2752).

Multi-frame accumulation mirrors mvAngleTimesAndScore
(src/Tracking.cc:2813-2871): each frame casts ONE vote — the argmax-count
sample — carrying score (num/nLines)·(1 − 0.1·meanErr/10); votes and
running-mean scores accumulate per sample, and the elected yaw is the
best-scoring among the 3 most-voted samples. Per-frame argmax voting is
what makes the estimator robust: a broad flat match distribution
contributes exactly one (low-score) vote instead of drowning the signal.

Everything is one [B, S, L] angle-comparison tensor per frame — the
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
CHAIR_CLASS = 56

# characteristic edges as corner index pairs in the bottom-ring/top-ring
# corner order of objects/state.cuboid_corners: length = top x-edge
# (ref corner_5→6), width = top z-edge (ref corner_6→7), height = a
# vertical edge (ref corner_2→6) — src/Tracking.cc:2689-2723
EDGE_LEN = (4, 5)
EDGE_WID = (5, 6)
EDGE_HGT = (1, 5)


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


def _lr_angle(d):
    """Angle of a 2D direction normalized left-to-right (the reference's
    align_left_right_edges convention): result in (-pi/2, pi/2]."""
    sgn = jnp.where(d[..., 0] >= 0, 1.0, -1.0)
    return jnp.arctan2(sgn * d[..., 1], sgn * d[..., 0])


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
    """Per-(detection, yaw sample): (parallel-line count, yaw-error sum in
    degrees). Returns (counts [B, S], errs [B, S], n_lines [B])."""
    J = table.capacity
    B = targets.shape[0]
    tj = jnp.clip(targets, 0, J - 1)
    active = targets >= 0

    lm = lines_in_box(lines, line_valid, boxes) & active[:, None]   # [B, L]
    n_lines = jnp.sum(lm, axis=1)

    line_ang = _lr_angle(lines[:, 2:4] - lines[:, 0:2])             # [L]

    yaws = sample_yaws()                                            # [S]
    # cuboid corners per (detection, sample): bottom ring then top ring
    # (state.cuboid_corners order)
    lo = table.cub_min[tj]
    hi = table.cub_max[tj]
    ctr = table.center[tj]
    xs = jnp.stack([lo[:, 0], hi[:, 0], hi[:, 0], lo[:, 0],
                    lo[:, 0], hi[:, 0], hi[:, 0], lo[:, 0]], 1)
    ys_ = jnp.stack([lo[:, 1], lo[:, 1], lo[:, 1], lo[:, 1],
                     hi[:, 1], hi[:, 1], hi[:, 1], hi[:, 1]], 1)
    zs = jnp.stack([lo[:, 2], lo[:, 2], hi[:, 2], hi[:, 2],
                    lo[:, 2], lo[:, 2], hi[:, 2], hi[:, 2]], 1)
    corners_obj = jnp.stack([xs, ys_, zs], -1)                      # [B, 8, 3]
    R = yaw_rotation(yaws)                                          # [S, 3, 3]
    corners_w = ctr[:, None, None, :] + jnp.einsum(
        "sac,bkc->bska", R, corners_obj
    )                                                               # [B, S, 8, 3]

    uv = project(cam, se3.apply(T_cw[None, None, None], corners_w))  # [B, S, 8, 2]

    def edge(pair):
        d = uv[:, :, pair[1], :] - uv[:, :, pair[0], :]
        return _lr_angle(d), jnp.linalg.norm(d, axis=-1)            # [B, S]

    ang1, len1 = edge(EDGE_LEN)
    ang2, len2 = edge(EDGE_WID)
    ang3, len3 = edge(EDGE_HGT)

    # raw (non-wrapped) angle distances, as the reference compares them
    d1 = jnp.abs(ang1[:, :, None] - line_ang[None, None, :])        # [B, S, L]
    d2 = jnp.abs(ang2[:, :, None] - line_ang[None, None, :])
    d3 = jnp.abs(ang3[:, :, None] - line_ang[None, None, :])

    lens = jnp.stack([len1, len2, len3], -1)                        # [B, S, 3]
    shortest = jnp.argmin(lens, axis=-1)[:, :, None]                # [B, S, 1]

    m1 = d1 < ANGLE_GATE
    m2 = d2 < ANGLE_GATE
    m3 = d3 < ANGLE_GATE
    # non-chair: the shortest projected edge is excluded; a line counts if
    # it parallels either remaining edge; yaw error = min distance to them
    cnt_s0 = (m2 | m3).astype(jnp.float32)     # shortest == len1
    err_s0 = jnp.minimum(d2, d3)
    cnt_s1 = (m1 | m3).astype(jnp.float32)     # shortest == len2
    err_s1 = jnp.minimum(d1, d3)
    cnt_s2 = (m1 | m2).astype(jnp.float32)     # shortest == len3
    err_s2 = jnp.minimum(d1, d2)
    cnt_gen = jnp.where(shortest == 0, cnt_s0,
                        jnp.where(shortest == 1, cnt_s1, cnt_s2))
    err_gen = jnp.where(shortest == 0, err_s0,
                        jnp.where(shortest == 1, err_s1, err_s2))
    # chair: width/height edges vote once, the length edge votes triple
    # (src/Tracking.cc:2745-2752). Divergence: the reference accumulates
    # no yaw error for chairs, leaving every sample in the ±5° match
    # plateau tied; we accumulate the min edge distance so the score can
    # rank within the plateau (their fError field is "no used in this
    # version" anyway).
    cnt_chair = (m2 | m3).astype(jnp.float32) + 3.0 * m1.astype(jnp.float32)
    err_chair = jnp.minimum(d1, jnp.minimum(d2, d3))
    is_chair = (table.cls[tj] == CHAIR_CLASS)[:, None, None]
    cnt = jnp.where(is_chair, cnt_chair, cnt_gen)
    err = jnp.where(is_chair, err_chair, err_gen)

    counts = jnp.sum(jnp.where(lm[:, None, :], cnt, 0.0), axis=2)   # [B, S]
    errs = jnp.rad2deg(jnp.sum(jnp.where(lm[:, None, :], err, 0.0), axis=2))
    return counts, errs, n_lines


@jax.jit
def update_yaw(
    table: ObjectTable,
    targets: jnp.ndarray,
    counts: jnp.ndarray,   # [B, S]
    errs: jnp.ndarray,     # [B, S] summed yaw error, degrees
    n_lines: jnp.ndarray,  # [B]
):
    """One vote per frame: the argmax-count sample gets (times += 1,
    running-mean score), then the object's yaw re-elects as the best-scoring
    of its 3 most-voted samples — the mvAngleTimesAndScore protocol
    (src/Tracking.cc:2796-2871). yaw_hist layout: [J, S, (times, mean
    score, mean yaw-error)]."""
    J = table.capacity
    S = counts.shape[1]
    tj = jnp.clip(targets, 0, J - 1)
    active = (targets >= 0) & (n_lines >= 2)
    safe = jnp.where(active, tj, J)

    yaws = sample_yaws()
    # winner = max count, count ties broken by lower mean yaw error, then
    # by proximity to 0 (the reference iterates 0° outward and keeps the
    # first maximum, src/Tracking.cc:2647-2650)
    err_mean = errs / jnp.maximum(counts, 1.0)      # degrees
    tie = -1e-4 * jnp.abs(yaws)[None, :]
    # lexicographic: count dominance must be exact — errs sums raw angle
    # distances over up to max_lines lines, so err_mean can exceed any
    # fixed count spacing; restrict the error/proximity tiebreak to the
    # max-count samples instead of folding it into one weighted score
    is_max = counts >= jnp.max(counts, axis=1, keepdims=True)
    win = jnp.argmax(jnp.where(is_max, -err_mean + tie, -jnp.inf), axis=1)
    num = jnp.take_along_axis(counts, win[:, None], 1)[:, 0]
    e_win = jnp.take_along_axis(errs, win[:, None], 1)[:, 0]
    # num==0 fallback: one phantom vote with 10° error (src/Tracking.cc:2796)
    e_win = jnp.where(num > 0, e_win, 10.0)
    num = jnp.maximum(num, 1.0)
    f_err = (e_win / num) / 10.0
    score = (num / jnp.maximum(n_lines, 1)) * (1.0 - 0.1 * f_err)

    # scatter the one vote per detection (times, running-mean score/err)
    hist = table.yaw_hist
    times0 = hist[jnp.clip(safe, 0, J - 1), win, 0]
    times1 = times0 + 1.0
    upd = jnp.stack([
        jnp.ones_like(score),
        (score - hist[jnp.clip(safe, 0, J - 1), win, 1]) / times1,
        (f_err - hist[jnp.clip(safe, 0, J - 1), win, 2]) / times1,
    ], -1)                                                          # [B, 3]
    hist = hist.at[safe, win].add(
        jnp.where(active[:, None], upd, 0.0), mode="drop")

    # elect: best mean score among the 3 most-voted samples, once an
    # object has accumulated >=3 votes (guards early jitter; the reference
    # re-elects from the first vote)
    times = hist[..., 0]
    sc = hist[..., 1]
    _, top3 = jax.lax.top_k(times, 3)                               # [J, 3]
    sc3 = jnp.take_along_axis(sc, top3, 1)
    t3 = jnp.take_along_axis(times, top3, 1)
    sc3 = jnp.where(t3 > 0, sc3, -1.0)
    best = jnp.take_along_axis(top3, jnp.argmax(sc3, 1)[:, None], 1)[:, 0]
    enough = jnp.sum(times, axis=1) >= 3.0
    new_yaw = jnp.where(enough & table.valid, yaws[best], table.yaw)
    return table._replace(yaw_hist=hist, yaw=new_yaw)
