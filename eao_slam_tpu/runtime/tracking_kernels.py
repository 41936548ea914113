"""Jitted device steps for the per-frame tracking loop.

Each function is one fixed-shape jitted program, so the whole per-frame hot
path is a handful of XLA executables with zero retraces (SURVEY.md §7.3
throughput note). They replace the corresponding reference paths:

- track_motion_model   <- Tracking::TrackWithMotionModel (src/Tracking.cc:1198)
- track_reference_kf   <- Tracking::TrackReferenceKeyFrame (src/Tracking.cc:1088)
- track_local_map_step <- Tracking::TrackLocalMap + SearchLocalPoints
                          (src/Tracking.cc:1731, 1989-2038) with the
                          isInFrustum gates of Frame::isInFrustum
- match_for_init       <- ORBmatcher::SearchForInitialization

Design: matching is dense masked matrix ops over the full point table (the
[P, F] hamming matrix is one int8 MXU matmul) — no local-keyframe gather is
needed because masking is free relative to one tile-op.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera, in_image, project
from eao_slam_tpu.ops import matching
from eao_slam_tpu.solvers.pose_lm import PoseOptResult, optimize_pose

LOG_SCALE = 0.1823215568  # log(1.2)


class TrackResult(NamedTuple):
    T: jnp.ndarray          # [3, 4] optimized camera-from-world
    cur_pt: jnp.ndarray     # [F] int32 map-point id per feature (-1 = none)
    n_inliers: jnp.ndarray  # int32
    n_matches: jnp.ndarray  # int32 (pre-pose-opt match count)


def _scales(scale2: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(scale2)


@partial(jax.jit, static_argnames=("cam",))
def track_motion_model(
    cam: Camera,
    pt_pos: jnp.ndarray,
    pt_valid: jnp.ndarray,
    T_pred: jnp.ndarray,
    last_kp: jnp.ndarray,
    last_desc: jnp.ndarray,
    last_octave: jnp.ndarray,
    last_angle: jnp.ndarray,
    last_valid: jnp.ndarray,
    last_pt: jnp.ndarray,
    kp: jnp.ndarray,
    desc: jnp.ndarray,
    octave: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    scale2: jnp.ndarray,
    radius: float = 15.0,
) -> TrackResult:
    """Project last frame's map points with the constant-velocity prediction,
    window-match into the current frame, run the 4x10 robust pose LM."""
    P = pt_pos.shape[0]
    F = kp.shape[0]
    q_pt = jnp.clip(last_pt, 0, P - 1)
    Xw = pt_pos[q_pt]
    q_valid = last_valid & (last_pt >= 0) & pt_valid[q_pt]

    xc = se3.apply(T_pred, Xw)
    proj = project(cam, xc)
    q_valid &= xc[..., 2] > 0.05
    q_valid &= in_image(cam, proj)

    rad = radius * _scales(scale2)[jnp.clip(last_octave, 0, scale2.shape[0] - 1)]
    idx, d, ok = matching.search_by_projection(
        proj, last_octave, last_desc, q_valid,
        kp, octave, desc, valid, rad,
        query_angle=last_angle, kp_angle=angle,
        max_dist=matching.TH_HIGH, ratio=0.9, check_rotation=True,
    )

    uv_m = kp[idx]
    inv_s2 = 1.0 / scale2[jnp.clip(octave[idx], 0, scale2.shape[0] - 1)]
    res: PoseOptResult = optimize_pose(cam, T_pred, Xw, uv_m, inv_s2, ok)

    keep = ok & res.inliers
    cur_pt = jnp.full((F,), -1, jnp.int32).at[idx].max(jnp.where(keep, last_pt, -1))
    return TrackResult(res.T, cur_pt, jnp.sum(keep), jnp.sum(ok))


@partial(jax.jit, static_argnames=("cam",))
def track_reference_kf(
    cam: Camera,
    pt_pos: jnp.ndarray,
    pt_valid: jnp.ndarray,
    T0: jnp.ndarray,
    ref_desc: jnp.ndarray,
    ref_valid: jnp.ndarray,
    ref_pt: jnp.ndarray,
    kp: jnp.ndarray,
    desc: jnp.ndarray,
    octave: jnp.ndarray,
    valid: jnp.ndarray,
    scale2: jnp.ndarray,
) -> TrackResult:
    """Brute descriptor match against the reference keyframe's mapped
    features + pose LM from the last pose (TrackReferenceKeyFrame; the BoW
    bucketing is replaced by exact NN, SURVEY.md §7.2 step 3)."""
    P = pt_pos.shape[0]
    F = kp.shape[0]
    q_pt = jnp.clip(ref_pt, 0, P - 1)
    q_valid = ref_valid & (ref_pt >= 0) & pt_valid[q_pt]
    idx, d, ok = matching.search_brute(
        ref_desc, q_valid, desc, valid, max_dist=matching.TH_LOW, ratio=0.7
    )
    Xw = pt_pos[q_pt]
    uv_m = kp[idx]
    inv_s2 = 1.0 / scale2[jnp.clip(octave[idx], 0, scale2.shape[0] - 1)]
    res = optimize_pose(cam, T0, Xw, uv_m, inv_s2, ok)
    keep = ok & res.inliers
    cur_pt = jnp.full((F,), -1, jnp.int32).at[idx].max(jnp.where(keep, ref_pt, -1))
    return TrackResult(res.T, cur_pt, jnp.sum(keep), jnp.sum(ok))


@partial(jax.jit, static_argnames=("cam", "n_levels"))
def track_local_map_step(
    cam: Camera,
    pt_pos: jnp.ndarray,
    pt_valid: jnp.ndarray,
    pt_desc: jnp.ndarray,
    pt_normal: jnp.ndarray,
    pt_min_dist: jnp.ndarray,
    pt_max_dist: jnp.ndarray,
    T: jnp.ndarray,
    cur_pt: jnp.ndarray,
    kp: jnp.ndarray,
    desc: jnp.ndarray,
    octave: jnp.ndarray,
    valid: jnp.ndarray,
    scale2: jnp.ndarray,
    n_levels: int = 8,
) -> TrackResult:
    """Project the whole map through the current pose estimate, match the
    still-unmatched features, rerun pose LM over the union of matches."""
    P = pt_pos.shape[0]
    F = kp.shape[0]

    matched_pt = jnp.zeros((P,), bool).at[jnp.clip(cur_pt, 0, P - 1)].max(cur_pt >= 0)

    xc = se3.apply(T, pt_pos)
    proj = project(cam, xc)
    Ow = se3.trans(se3.inverse(T))
    view = pt_pos - Ow[None, :]
    dist = jnp.linalg.norm(view, axis=-1)
    dist_safe = jnp.maximum(dist, 1e-9)

    visible = pt_valid & (xc[..., 2] > 0.05) & in_image(cam, proj)
    visible &= (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    cos_view = jnp.sum(view * pt_normal, axis=-1) / dist_safe
    visible &= cos_view > 0.5

    # PredictScale (MapPoint::PredictScale): level = ceil(log(maxDist/d)/log(s))
    lvl = jnp.ceil(jnp.log(jnp.maximum(pt_max_dist, 1e-9) / dist_safe) / LOG_SCALE)
    lvl = jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)
    rad_base = jnp.where(cos_view > 0.998, 2.5, 4.0)
    rad = rad_base * _scales(scale2)[lvl]

    q_valid = visible & ~matched_pt
    train_valid = valid & (cur_pt < 0)
    idx, d, ok = matching.search_by_projection(
        proj, lvl, pt_desc, q_valid,
        kp, octave, desc, train_valid, rad,
        max_dist=matching.TH_HIGH, ratio=0.8,
    )

    pt_ids = jnp.arange(P, dtype=jnp.int32)
    cur_pt2 = cur_pt.at[idx].max(jnp.where(ok, pt_ids, -1))

    m_valid = (cur_pt2 >= 0) & valid
    Xw_f = pt_pos[jnp.clip(cur_pt2, 0, P - 1)]
    inv_s2 = 1.0 / scale2[jnp.clip(octave, 0, scale2.shape[0] - 1)]
    res = optimize_pose(cam, T, Xw_f, kp, inv_s2, m_valid)
    cur_pt3 = jnp.where(m_valid & res.inliers, cur_pt2, -1)
    return TrackResult(res.T, cur_pt3, jnp.sum(cur_pt3 >= 0), jnp.sum(m_valid))


@jax.jit
def match_for_init(
    kp1, desc1, angle1, valid1,
    kp2, desc2, angle2, valid2,
):
    """SearchForInitialization wrapper (100px window, 0.9 ratio)."""
    return matching.search_for_initialization(
        kp1, desc1, angle1, valid1, kp2, desc2, angle2, valid2,
        window=100.0, max_dist=matching.TH_LOW, ratio=0.9,
    )


@jax.jit
def count_visible(
    pt_pos, pt_valid, T, cam_fx, cam_fy, cam_cx, cam_cy, w, h
) -> jnp.ndarray:
    """How many valid map points project into the frame at pose T (used by
    the keyframe decision's visibility bookkeeping)."""
    xc = se3.apply(T, pt_pos)
    z = jnp.maximum(xc[..., 2], 1e-9)
    u = cam_fx * xc[..., 0] / z + cam_cx
    v = cam_fy * xc[..., 1] / z + cam_cy
    ok = pt_valid & (xc[..., 2] > 0.05) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    return jnp.sum(ok)
