"""Map maintenance for the production (chunked) path: device keyframe
culling, slot compaction, and the device covisibility matmul.

The chunked tracker's scan body uses MONOTONIC slot allocators (slot ==
insertion order — runtime/scan_tracker.py), which the windowed BA relies
on. Long sequences would exhaust capacity, so between chunks the host
triggers this jitted maintenance program: cull redundant keyframes
(LocalMapping::KeyFrameCulling, src/LocalMapping.cc:637-707), drop
under-observed points, then stably COMPACT both tables to the front —
surviving keyframes keep their insertion order, so the monotonic invariant
is restored with freed tail capacity.

Covisibility is one incidence matmul over the observation table instead of
the round-2 host-side O(K*P) numpy loop (KeyFrame::UpdateConnections /
GetBestCovisibilityKeyFrames, src/KeyFrame.cc).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.runtime.map_state import MapState


@functools.lru_cache(maxsize=8)
def make_covis(P: int):
    """Build a jitted covis fn closed over the (static) point capacity.
    Cached per capacity — a fresh closure per call would recompile the
    incidence matmul every invocation."""

    @jax.jit
    def covis(kf_pt_idx, kf_kp_valid, kf_valid):
        K, F = kf_pt_idx.shape
        obs_ok = (kf_pt_idx >= 0) & kf_kp_valid & kf_valid[:, None]
        dest = jnp.where(obs_ok, kf_pt_idx, P)
        inc = jnp.zeros((K, P + 1), jnp.bfloat16)
        inc = inc.at[jnp.arange(K)[:, None], dest].set(1.0, mode="drop")
        inc = inc[:, :P]
        C = jax.lax.dot_general(
            inc, inc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        return C * (1 - jnp.eye(K, dtype=jnp.int32))

    return covis


class MaintResult(NamedTuple):
    m: MapState
    kf_count: jnp.ndarray   # int32 — compacted keyframe count
    pt_count: jnp.ndarray   # int32 — compacted point count
    pt_remap: jnp.ndarray   # [P] old point id -> new id (-1 = dropped)
    kf_remap: jnp.ndarray   # [K] old keyframe slot -> new slot (-1 = culled)
    n_culled_kf: jnp.ndarray


@partial(jax.jit, static_argnames=("n_levels", "max_cull"))
def cull_and_compact(
    m: MapState,
    kf_count: jnp.ndarray,
    pt_count: jnp.ndarray,
    n_levels: int = 8,
    max_cull: int = 4,
    redundancy: float = 0.9,
) -> MaintResult:
    """KeyFrameCulling + point culling + stable slot compaction.

    Redundancy rule (src/LocalMapping.cc:637-707): a keyframe >=90% of
    whose tracked points are observed by >=3 OTHER keyframes at the same or
    finer octave is redundant. Object-created keyframes, the first two and
    the newest two are exempt; at most `max_cull` keyframes die per pass
    (the reference culls sequentially — capping the simultaneous batch
    bounds the divergence from its one-at-a-time recount).

    Points observed by <2 keyframes afterwards die. Both tables compact
    stably to the front (insertion order preserved), restoring the chunked
    tracker's monotonic-slot invariant with freed tail capacity.
    """
    K, F = m.kf_pt_idx.shape
    P = m.pt_pos.shape[0]
    L = n_levels

    # --- per-(point, octave) observation counts, cumulative over octave
    obs_ok = (m.kf_pt_idx >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    p_of = jnp.where(obs_ok, m.kf_pt_idx, P)
    oct_of = jnp.clip(m.kf_octave, 0, L - 1)
    cnt = jnp.zeros((P + 1, L), jnp.int32).at[
        p_of.reshape(-1), oct_of.reshape(-1)
    ].add(obs_ok.reshape(-1).astype(jnp.int32), mode="drop")
    cnt_le = jnp.cumsum(cnt, axis=1)                        # [P+1, L]

    # --- redundancy per keyframe
    o_plus = jnp.clip(oct_of + 1, 0, L - 1)
    others = cnt_le[jnp.clip(p_of, 0, P), o_plus] - 1       # exclude self
    red_f = obs_ok & (others >= 3)
    n_tracked = jnp.sum(obs_ok, axis=1)
    n_red = jnp.sum(red_f, axis=1)

    slot_order = jnp.arange(K)
    protected = (
        ~m.kf_valid
        | m.kf_by_object
        | (slot_order < 2)
        | (slot_order >= kf_count - 2)
    )
    ratio = n_red / jnp.maximum(n_tracked, 1)
    redundant = ~protected & (n_tracked > 0) & (ratio >= redundancy)
    # cap the batch: top max_cull by ratio
    score = jnp.where(redundant, ratio, -1.0)
    top_v, top_i = jax.lax.top_k(score, max_cull)
    cull = jnp.zeros((K,), bool).at[top_i].max(top_v > 0)
    n_culled = jnp.sum(cull)

    kf_valid = m.kf_valid & ~cull
    kf_pt_idx = jnp.where(cull[:, None], -1, m.kf_pt_idx)

    # --- point culling: <2 observations from surviving keyframes
    obs_ok2 = (kf_pt_idx >= 0) & m.kf_kp_valid & kf_valid[:, None]
    pcnt = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(obs_ok2, kf_pt_idx, P).reshape(-1)
    ].add(obs_ok2.reshape(-1).astype(jnp.int32), mode="drop")[:P]
    pt_valid = m.pt_valid & (pcnt >= 2)

    # --- stable compaction: valid entries to the front, order preserved
    # points
    p_rank = jnp.cumsum(pt_valid.astype(jnp.int32)) - 1
    pt_remap = jnp.where(pt_valid, p_rank, -1)              # [P] old -> new
    p_order = jnp.argsort(~pt_valid, stable=True)           # valid first

    def pgather(x):
        return x[p_order]

    # keyframes (insertion order == slot order, preserved by stable sort)
    k_rank = jnp.cumsum(kf_valid.astype(jnp.int32)) - 1
    kf_remap = jnp.where(kf_valid, k_rank, -1)
    k_order = jnp.argsort(~kf_valid, stable=True)

    def kgather(x):
        return x[k_order]

    new_kf_pt = jnp.where(
        kf_pt_idx >= 0, pt_remap[jnp.clip(kf_pt_idx, 0, P - 1)], -1
    )
    new_first_kf = jnp.where(
        m.pt_first_kf >= 0, kf_remap[jnp.clip(m.pt_first_kf, 0, K - 1)], -1
    )

    m2 = m._replace(
        kf_pose=kgather(m.kf_pose),
        kf_valid=kgather(kf_valid),
        kf_timestamp=kgather(m.kf_timestamp),
        kf_frame_id=kgather(m.kf_frame_id),
        kf_kp=kgather(m.kf_kp),
        kf_desc=kgather(m.kf_desc),
        kf_octave=kgather(m.kf_octave),
        kf_angle=kgather(m.kf_angle),
        kf_kp_valid=kgather(m.kf_kp_valid),
        kf_pt_idx=kgather(new_kf_pt),
        kf_by_object=kgather(m.kf_by_object),
        pt_pos=pgather(m.pt_pos),
        pt_valid=pgather(pt_valid),
        pt_desc=pgather(m.pt_desc),
        pt_normal=pgather(m.pt_normal),
        pt_min_dist=pgather(m.pt_min_dist),
        pt_max_dist=pgather(m.pt_max_dist),
        pt_visible=pgather(m.pt_visible),
        pt_found=pgather(m.pt_found),
        pt_first_kf=pgather(new_first_kf),
        pt_obs=pgather(m.pt_obs),
        pt_object_id=pgather(m.pt_object_id),
        pt_obj_votes=pgather(m.pt_obj_votes),
    )
    return MaintResult(
        m=m2,
        kf_count=jnp.sum(kf_valid).astype(jnp.int32),
        pt_count=jnp.sum(pt_valid).astype(jnp.int32),
        pt_remap=pt_remap,
        kf_remap=kf_remap,
        n_culled_kf=n_culled,
    )
