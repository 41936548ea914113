"""Struct-of-arrays map state: the TPU replacement for the pointer web.

The reference keeps the map as heap objects behind mutexes — Map (set of
KeyFrame*/MapPoint*, include/Map.h:31-89), KeyFrame covisibility pointers,
MapPoint observation maps. Here the entire map is one pytree of fixed-size
arrays + validity masks (SURVEY.md §7.1), so every SLAM stage is a pure
jitted transform MapState -> MapState, checkpointable with orbax and
shardable with pjit.

Capacities come from CapacityConfig; slot allocation is host-side (keyframe
insertion happens at keyframe rate, not frame rate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import CapacityConfig


class MapState(NamedTuple):
    # --- keyframes (replaces KeyFrame, include/KeyFrame.h:47-299)
    kf_pose: jnp.ndarray       # [K, 3, 4] camera-from-world
    kf_valid: jnp.ndarray      # [K] bool
    kf_timestamp: jnp.ndarray  # [K] f32 (relative time)
    kf_frame_id: jnp.ndarray   # [K] i32
    kf_kp: jnp.ndarray         # [K, F, 2] undistorted keypoints
    kf_desc: jnp.ndarray       # [K, F, 8] uint32
    kf_octave: jnp.ndarray     # [K, F] i32
    kf_angle: jnp.ndarray      # [K, F] f32
    kf_kp_valid: jnp.ndarray   # [K, F] bool
    kf_pt_idx: jnp.ndarray     # [K, F] i32 map-point id per feature (-1 = none)
    kf_by_object: jnp.ndarray  # [K] bool — object-driven keyframe (EAO, exempt from culling)

    # --- map points (replaces MapPoint, include/MapPoint.h:31-150)
    pt_pos: jnp.ndarray        # [P, 3]
    pt_valid: jnp.ndarray      # [P] bool
    pt_desc: jnp.ndarray       # [P, 8] uint32 distinctive descriptor
    pt_normal: jnp.ndarray     # [P, 3] mean viewing direction
    pt_min_dist: jnp.ndarray   # [P] scale-invariance range
    pt_max_dist: jnp.ndarray   # [P]
    pt_visible: jnp.ndarray    # [P] i32 — times predicted visible (mnVisible)
    pt_found: jnp.ndarray      # [P] i32 — times actually matched (mnFound)
    pt_first_kf: jnp.ndarray   # [P] i32
    pt_obs: jnp.ndarray        # [P] i32 — number of observing keyframes
    # --- EAO per-point object fields (include/MapPoint.h:82-91)
    pt_object_id: jnp.ndarray  # [P] i32 (-1 = background)
    pt_obj_votes: jnp.ndarray  # [P] i32 — observation votes for pt_object_id
    # (compressed MapPoint::object_id_vector: votes for the current owner)

    @property
    def max_keyframes(self) -> int:
        return self.kf_pose.shape[0]

    @property
    def max_points(self) -> int:
        return self.pt_pos.shape[0]

    @property
    def max_features(self) -> int:
        return self.kf_kp.shape[1]


def empty_map_state(cap: CapacityConfig) -> MapState:
    K, F, P = cap.max_keyframes, cap.max_features, cap.max_points
    return MapState(
        kf_pose=jnp.tile(jnp.eye(3, 4, dtype=jnp.float32), (K, 1, 1)),
        kf_valid=jnp.zeros((K,), bool),
        kf_timestamp=jnp.zeros((K,), jnp.float32),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_kp=jnp.zeros((K, F, 2), jnp.float32),
        kf_desc=jnp.zeros((K, F, 8), jnp.uint32),
        kf_octave=jnp.zeros((K, F), jnp.int32),
        kf_angle=jnp.zeros((K, F), jnp.float32),
        kf_kp_valid=jnp.zeros((K, F), bool),
        kf_pt_idx=jnp.full((K, F), -1, jnp.int32),
        kf_by_object=jnp.zeros((K,), bool),
        pt_pos=jnp.zeros((P, 3), jnp.float32),
        pt_valid=jnp.zeros((P,), bool),
        pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_normal=jnp.zeros((P, 3), jnp.float32),
        pt_min_dist=jnp.zeros((P,), jnp.float32),
        pt_max_dist=jnp.full((P,), 1e9, jnp.float32),
        pt_visible=jnp.ones((P,), jnp.int32),
        pt_found=jnp.ones((P,), jnp.int32),
        pt_first_kf=jnp.full((P,), -1, jnp.int32),
        pt_obs=jnp.zeros((P,), jnp.int32),
        pt_object_id=jnp.full((P,), -1, jnp.int32),
        pt_obj_votes=jnp.zeros((P,), jnp.int32),
    )


@jax.jit
def covisibility_counts(state: MapState) -> jnp.ndarray:
    """[K, K] shared-point counts — the covisibility graph
    (KeyFrame::UpdateConnections) as one MXU matmul over the incidence
    matrix instead of per-KF hash-map counting."""
    K, F = state.kf_pt_idx.shape
    P = state.pt_pos.shape[0]
    obs = state.kf_pt_idx >= 0
    pt = jnp.clip(state.kf_pt_idx, 0, P - 1)
    inc = jnp.zeros((K, P), jnp.float32)
    inc = jax.vmap(
        lambda row, o, p: row.at[p].max(o.astype(jnp.float32))
    )(inc, obs, pt)
    inc = inc * state.pt_valid[None, :].astype(jnp.float32)
    C = inc @ inc.T
    C = C * state.kf_valid[None, :] * state.kf_valid[:, None]
    return C.astype(jnp.int32) - jnp.diag(jnp.diag(C.astype(jnp.int32)))


@jax.jit
def point_observation_counts(state: MapState) -> jnp.ndarray:
    """[P] number of keyframes observing each point (recomputed from the
    feature->point table; replaces MapPoint::Observations())."""
    P = state.pt_pos.shape[0]
    obs = (state.kf_pt_idx >= 0) & state.kf_valid[:, None] & state.kf_kp_valid
    pt = jnp.clip(state.kf_pt_idx, 0, P - 1)
    return (
        jnp.zeros((P,), jnp.int32)
        .at[pt.reshape(-1)]
        .add(obs.reshape(-1).astype(jnp.int32))
    )


def free_point_slots(state: MapState, n: int) -> np.ndarray:
    """Host-side allocator: indices of up to n free point slots."""
    free = np.nonzero(~np.asarray(state.pt_valid))[0]
    return free[:n]


def free_kf_slot(state: MapState) -> int:
    free = np.nonzero(~np.asarray(state.kf_valid))[0]
    if len(free) == 0:
        raise RuntimeError("keyframe capacity exhausted")
    return int(free[0])
