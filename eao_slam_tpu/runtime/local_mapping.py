"""Local mapping: new-point triangulation, fusion and windowed BA.

TPU-native counterpart of the LocalMapping thread's per-keyframe work
(src/LocalMapping.cc:42-117): ProcessNewKeyFrame/CreateNewMapPoints
(:212-457, epipolar search + SVD triangulation), SearchInNeighbors fusion
(:459-539) and Optimizer::LocalBundleAdjustment (src/Optimizer.cc:459-796).
Here it runs synchronously between frames (explicit interleaving instead of
the reference's stale-read thread races, SURVEY.md §7.3) as fixed-shape
jitted programs plus a thin host assembly step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera, project
from eao_slam_tpu.geometry.triangulate import (
    check_triangulation,
    pixels_to_normalized,
    triangulate,
)
from eao_slam_tpu.ops import matching
from eao_slam_tpu.runtime.map_state import MapState
from eao_slam_tpu.solvers.ba import BAProblem, BAResult, local_ba


class TriangulationResult(NamedTuple):
    idx2: jnp.ndarray    # [F] match in neighbor frame per new-KF feature
    points: jnp.ndarray  # [F, 3] triangulated world points
    good: jnp.ndarray    # [F] bool


@partial(jax.jit, static_argnames=("cam",))
def triangulate_with_neighbor(
    cam: Camera,
    T1: jnp.ndarray,
    kp1, desc1, oct1, valid1, pt1,
    T2: jnp.ndarray,
    kp2, desc2, oct2, valid2, pt2,
    scale2: jnp.ndarray,
) -> TriangulationResult:
    """Epipolar-constrained matching of both frames' *unmatched* features +
    batched DLT triangulation with the CheckRT-style gates
    (LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:212-457)."""
    F12 = matching.fundamental_from_poses(cam.K, T1, T2)
    O1 = se3.trans(se3.inverse(T1))
    epi2 = project(cam, se3.apply(T2, O1))
    # parallax gate near the epipole: ref rejects kp2 within 100*sigma^2 px^2
    min_epi2 = 100.0 * scale2[jnp.clip(oct2, 0, scale2.shape[0] - 1)]

    un1 = valid1 & (pt1 < 0)
    un2 = valid2 & (pt2 < 0)
    idx, d, ok = matching.search_for_triangulation(
        kp1, desc1, oct1, un1, kp2, desc2, oct2, un2,
        F12, scale2, epi2, min_epi2, max_dist=matching.TH_LOW,
    )

    xn1 = pixels_to_normalized(cam, kp1)
    xn2 = pixels_to_normalized(cam, kp2)[idx]
    Xw = triangulate(T1[None], T2[None], xn1, xn2)
    s2 = scale2[jnp.clip(oct1, 0, scale2.shape[0] - 1)]
    good = ok & check_triangulation(cam, T1, T2, Xw, kp1, kp2[idx], s2)
    return TriangulationResult(idx2=idx, points=Xw, good=good)


@partial(jax.jit, static_argnames=("cam",))
def fuse_into_keyframe(
    cam: Camera,
    pt_pos, pt_valid, pt_desc, pt_min_dist, pt_max_dist,
    T: jnp.ndarray,
    kp, desc, octave, valid, cur_pt,
    scale2: jnp.ndarray,
):
    """Project map points into a keyframe and bind unmatched features that
    lie on them (the descriptor-duplicate half of ORBmatcher::Fuse used by
    SearchInNeighbors; replace-conflict resolution stays host-side)."""
    P = pt_pos.shape[0]
    matched_pt = jnp.zeros((P,), bool).at[jnp.clip(cur_pt, 0, P - 1)].max(cur_pt >= 0)
    xc = se3.apply(T, pt_pos)
    proj = project(cam, xc)
    Ow = se3.trans(se3.inverse(T))
    dist = jnp.linalg.norm(pt_pos - Ow[None, :], axis=-1)
    visible = pt_valid & ~matched_pt & (xc[..., 2] > 0.05)
    visible &= (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    lvl = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(pt_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)) / 0.1823215568),
        0, scale2.shape[0] - 1,
    ).astype(jnp.int32)
    rad = 3.0 * jnp.sqrt(scale2)[lvl]
    idx, d, ok = matching.search_by_projection(
        proj, lvl, pt_desc, visible,
        kp, octave, desc, valid & (cur_pt < 0), rad,
        max_dist=matching.TH_LOW, ratio=1.0,
    )
    pt_ids = jnp.arange(P, dtype=jnp.int32)
    return cur_pt.at[idx].max(jnp.where(ok, pt_ids, -1))


@partial(jax.jit, static_argnames=("n_win",))
def refresh_point_descriptors(
    kf_pt_idx: jnp.ndarray,    # [K, F]
    kf_desc: jnp.ndarray,      # [K, F, 8] uint32
    kf_kp_valid: jnp.ndarray,  # [K, F]
    pt_desc: jnp.ndarray,      # [P, 8] uint32
    win: jnp.ndarray,          # [W] window keyframe slots
    win_valid: jnp.ndarray,    # [W]
    n_win: int,
):
    """MapPoint::ComputeDistinctiveDescriptors over a keyframe window: each
    point observed in the window gets the observation descriptor whose
    MEDIAN hamming distance to its other observations is smallest
    (src/MapPoint.cc ComputeDistinctiveDescriptors, invoked after fusion,
    src/LocalMapping.cc:459-539). Points with <2 window observations keep
    their current descriptor. Returns updated pt_desc."""
    P = pt_desc.shape[0]
    W = n_win

    # cand[p, w] = descriptor of p's observation in window keyframe w
    cand = jnp.zeros((P, W, 8), jnp.uint32)
    cand_ok = jnp.zeros((P, W), bool)
    for w in range(W):
        row = kf_pt_idx[win[w]]                              # [F]
        ok = (row >= 0) & kf_kp_valid[win[w]] & win_valid[w]
        dest = jnp.where(ok, row, P)
        cand = cand.at[dest, w].set(kf_desc[win[w]], mode="drop")
        cand_ok = cand_ok.at[dest, w].set(ok, mode="drop")

    # pairwise hamming over the window observations [P, W, W]
    x = cand[:, :, None, :] ^ cand[:, None, :, :]            # [P, W, W, 8]
    ham = jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), axis=-1
    )
    pair_ok = cand_ok[:, :, None] & cand_ok[:, None, :]
    BIG = jnp.int32(10_000)
    ham = jnp.where(pair_ok, ham, BIG)

    # per-row median over valid entries: sort ascending, index (n-1)//2
    srt = jnp.sort(ham, axis=-1)                             # [P, W, W]
    n_valid = jnp.sum(cand_ok, axis=1)                       # [P]
    med_idx = jnp.clip((n_valid[:, None] - 1) // 2, 0, W - 1)
    med = jnp.take_along_axis(
        srt, jnp.broadcast_to(med_idx[:, :, None], (P, W, 1)), axis=2
    )[..., 0]                                                # [P, W]
    med = jnp.where(cand_ok, med, BIG)
    best_w = jnp.argmin(med, axis=1)                         # [P]
    best_med = jnp.min(med, axis=1)
    new_desc = jnp.take_along_axis(
        cand, best_w[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]

    # sticky update: replace only on a clear improvement over the CURRENT
    # descriptor's median distance to the same observations. The reference
    # recomputes over a point's full (stable) observation set; this window
    # slides every chunk, and unconditional replacement churned descriptors
    # chunk after chunk (measured 3x worse bench ATE).
    xc = pt_desc[:, None, :] ^ cand                          # [P, W, 8]
    cur_d = jnp.sum(jax.lax.population_count(xc).astype(jnp.int32), axis=-1)
    cur_d = jnp.where(cand_ok, cur_d, BIG)
    cur_srt = jnp.sort(cur_d, axis=-1)
    cur_med = jnp.take_along_axis(
        cur_srt, jnp.clip((n_valid[:, None] - 1) // 2, 0, W - 1), axis=1
    )[:, 0]
    refresh = (n_valid >= 2) & (best_med + 8 <= cur_med)
    return jnp.where(refresh[:, None], new_desc, pt_desc)


@partial(jax.jit, static_argnames=("cam",))
def merge_duplicate_points(
    cam: Camera,
    pt_pos, pt_valid, pt_desc, pt_min_dist, pt_max_dist,
    kf_pt_idx: jnp.ndarray,    # [K, F] full observation table
    T: jnp.ndarray,            # [3, 4] keyframe pose to project into
    kp, desc, octave, valid, cur_pt,   # that keyframe's features
    scale2: jnp.ndarray,
):
    """The Replace half of ORBmatcher::Fuse (src/ORBmatcher.cc Fuse +
    MapPoint::Replace): project map points into a keyframe and, where the
    matched feature ALREADY holds a different map point, merge the two —
    the point with fewer observations is replaced by the other everywhere
    in the observation table and invalidated.

    Returns (kf_pt_idx, pt_valid) with all rows rewritten through the
    replacement map."""
    P = pt_pos.shape[0]
    matched_pt = jnp.zeros((P,), bool).at[jnp.clip(cur_pt, 0, P - 1)].max(cur_pt >= 0)
    xc = se3.apply(T, pt_pos)
    proj = project(cam, xc)
    Ow = se3.trans(se3.inverse(T))
    dist = jnp.linalg.norm(pt_pos - Ow[None, :], axis=-1)
    visible = pt_valid & ~matched_pt & (xc[..., 2] > 0.05)
    visible &= (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    lvl = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(pt_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)) / 0.1823215568),
        0, scale2.shape[0] - 1,
    ).astype(jnp.int32)
    rad = 3.0 * jnp.sqrt(scale2)[lvl]
    # match against features that already hold a DIFFERENT point
    idx, d, ok = matching.search_by_projection(
        proj, lvl, pt_desc, visible,
        kp, octave, desc, valid & (cur_pt >= 0), rad,
        max_dist=matching.TH_LOW, ratio=1.0,
    )
    other = cur_pt[idx]                                      # [P] existing point
    dup = ok & (other >= 0) & (other != jnp.arange(P))
    # 3D-proximity gate: the two landmarks must actually be the same
    # physical point. The reference's Fuse verifies the candidate with an
    # exact per-feature chi2 reprojection test (src/ORBmatcher.cc Fuse);
    # the batched equivalent bounds the 3D separation relative to depth —
    # without it nearby same-texture points merge and geometry corrupts
    # (caught by the bench ATE gate: 5.5 cm -> 11.3 cm).
    o_safe = jnp.clip(other, 0, P - 1)
    sep = jnp.linalg.norm(pt_pos - pt_pos[o_safe], axis=-1)
    dup &= sep < 0.02 * jnp.maximum(dist, 1e-6)

    # winner = more observations (MapPoint::Replace keeps the better-observed)
    obs = (kf_pt_idx >= 0).astype(jnp.int32)
    n_obs = jnp.zeros((P,), jnp.int32).at[
        jnp.clip(kf_pt_idx, 0, P - 1).reshape(-1)
    ].add(obs.reshape(-1))
    o = jnp.clip(other, 0, P - 1)
    self_wins = n_obs >= n_obs[o]
    winner = jnp.where(self_wins, jnp.arange(P), o)
    loser = jnp.where(self_wins, o, jnp.arange(P))

    rmap = jnp.arange(P, dtype=jnp.int32).at[
        jnp.where(dup, loser, P)
    ].set(jnp.where(dup, winner, 0).astype(jnp.int32), mode="drop")
    # squash merge chains (a -> b -> c): two queries matching the same
    # feature can make the intermediate a loser AND a winner in the same
    # pass — without squashing, rows would be rewired into a dead point
    # (measured 3x worse bench ATE)
    rmap = rmap[rmap]
    rmap = rmap[rmap]
    new_kf_pt = jnp.where(kf_pt_idx >= 0, rmap[jnp.clip(kf_pt_idx, 0, P - 1)],
                          kf_pt_idx)
    dead = rmap != jnp.arange(P, dtype=jnp.int32)
    return new_kf_pt, pt_valid & ~dead


# ---------------------------------------------------------------------------
# windowed BA assembly (host side, keyframe rate)
# ---------------------------------------------------------------------------

class LocalBAResult(NamedTuple):
    kf_slots: np.ndarray     # [W] map keyframe slots in the window (-1 pad)
    poses: np.ndarray        # [W, 3, 4] optimized
    pt_slots: np.ndarray     # [Pl] map point slots (-1 pad)
    points: np.ndarray       # [Pl, 3] optimized
    drop_obs: np.ndarray     # [W, F] bool — observations classified outliers


def run_local_ba(
    cam: Camera,
    state: MapState,
    window_slots: Sequence[int],
    fixed_slots: Sequence[int],
    scale2: np.ndarray,
    max_points: int,
    solver=None,
) -> LocalBAResult:
    """Assemble a compact fixed-shape BAProblem for the keyframe window and
    run the 5+10 LM schedule (src/Optimizer.cc:459-796). Host does the slot
    gather/remap; the solve is the jitted Schur LM in solvers/ba.py by
    default, or `solver(cam, prob) -> BAResult` when given (the mesh-parallel
    engine passes the distributed dense-clique solver here)."""
    W = len(window_slots)
    ws = np.asarray(window_slots, np.int32)
    kf_pt = np.asarray(state.kf_pt_idx[ws])       # [W, F]
    kf_kp = np.asarray(state.kf_kp[ws])           # [W, F, 2]
    kf_oct = np.asarray(state.kf_octave[ws])      # [W, F]
    kf_kp_valid = np.asarray(state.kf_kp_valid[ws])
    poses = np.asarray(state.kf_pose[ws])

    F = kf_pt.shape[1]
    obs_mask = (kf_pt >= 0) & kf_kp_valid
    pt_slots = np.unique(kf_pt[obs_mask])
    if len(pt_slots) > max_points:
        # keep the most-observed points (host-side; rare unless capacity-tight)
        counts = np.zeros(int(state.pt_pos.shape[0]), np.int64)
        np.add.at(counts, kf_pt[obs_mask], 1)
        order = np.argsort(-counts[pt_slots], kind="stable")
        pt_slots = np.sort(pt_slots[order[:max_points]])
    Pl = max_points
    remap = np.full(int(state.pt_pos.shape[0]) + 1, -1, np.int64)
    remap[pt_slots] = np.arange(len(pt_slots))

    local_pt = remap[np.clip(kf_pt, 0, len(remap) - 1)]  # [W, F]
    obs_mask = obs_mask & (local_pt >= 0)

    kf_idx = np.broadcast_to(np.arange(W, dtype=np.int32)[:, None], (W, F))
    inv_s2 = 1.0 / scale2[np.clip(kf_oct, 0, len(scale2) - 1)]

    points = np.zeros((Pl, 3), np.float32)
    pt_valid = np.zeros((Pl,), bool)
    points[: len(pt_slots)] = np.asarray(state.pt_pos)[pt_slots]
    pt_valid[: len(pt_slots)] = True

    fixed = np.isin(ws, np.asarray(fixed_slots))
    if not fixed.any():
        fixed[0] = True  # gauge

    prob = BAProblem(
        poses=jnp.asarray(poses),
        points=jnp.asarray(points),
        kf_idx=jnp.asarray(kf_idx.reshape(-1)),
        pt_idx=jnp.asarray(np.clip(local_pt, 0, Pl - 1).reshape(-1).astype(np.int32)),
        uv=jnp.asarray(kf_kp.reshape(-1, 2)),
        inv_sigma2=jnp.asarray(inv_s2.reshape(-1).astype(np.float32)),
        obs_valid=jnp.asarray(obs_mask.reshape(-1)),
        cam_fixed=jnp.asarray(fixed),
        cam_valid=jnp.ones((W,), bool),
        pt_valid=jnp.asarray(pt_valid),
    )
    res: BAResult = (solver or local_ba)(cam, prob)

    inlier = np.asarray(res.obs_inlier).reshape(W, F)
    drop = obs_mask & ~inlier
    pt_slots_padded = np.full((Pl,), -1, np.int64)
    pt_slots_padded[: len(pt_slots)] = pt_slots
    return LocalBAResult(
        kf_slots=ws,
        poses=np.asarray(res.poses),
        pt_slots=pt_slots_padded,
        points=np.asarray(res.points),
        drop_obs=drop,
    )
