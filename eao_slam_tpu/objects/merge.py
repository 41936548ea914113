"""Map-level object merge and overlap resolution (keyframe-rate pass).

Rebuilds the LocalMapping-side object work (src/LocalMapping.cc:772-882):

- MergePotentialAssObjs -> Object_Map::WhetherMergeTwoMapObjs
  (src/Object.cc:1607-1654): objects repeatedly flagged as potential
  associations (mReObj votes >= 3) merge into the better-observed one,
  gated on never having co-occurred in a frame. (The reference also
  computes a two-sample t-test here whose result cannot affect the branch
  — `!bSametime || bDoubelTtest` with bSametime always false at that
  point — so the co-occurrence gate is the effective rule; the t statistic
  lives in objects/stats.py and stays tested.)
- WhetherOverlapObject -> DealTwoOverlapObjs (src/Object.cc:2077-2178):
  five-case handling of 3D-overlapping cuboids — merge, false-positive
  deletion by volume, equal division, big-to-small point eviction.

Pair statistics are one jitted [J, J] program; the rare merge decisions run
on host; membership rewrites + stats refresh are one jitted apply.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.objects.state import ObjectTable, yaw_rotation
from eao_slam_tpu.runtime.map_state import MapState


# ---------------------------------------------------------------------------
# shared stats refresh (ComputeMeanAndStandard over the whole table)
# ---------------------------------------------------------------------------

def member_stats(m: MapState, table: ObjectTable):
    """Recompute center/std/object-frame AABB/r_max from point membership —
    the batched ComputeMeanAndStandard (src/Object.cc:967-1198)."""
    J = table.capacity
    member = (m.pt_object_id[None, :] == jnp.arange(J)[:, None]) & m.pt_valid[None, :]
    mw = member.astype(jnp.float32)
    n_mem = jnp.sum(mw, axis=1)
    center = (mw @ m.pt_pos) / jnp.maximum(n_mem, 1.0)[:, None]
    var = (mw @ (m.pt_pos**2)) / jnp.maximum(n_mem, 1.0)[:, None] - center**2
    std = jnp.sqrt(jnp.maximum(var, 1e-12))

    RyJ = yaw_rotation(table.yaw)
    rel = m.pt_pos[None, :, :] - center[:, None, :]
    x_obj = jnp.einsum("jba,jpb->jpa", RyJ, rel)
    big = 1e9
    cub_min = jnp.min(jnp.where(member[..., None], x_obj, big), axis=1)
    cub_max = jnp.max(jnp.where(member[..., None], x_obj, -big), axis=1)
    has = n_mem > 0
    cub_min = jnp.where(has[:, None], cub_min, 0.0)
    cub_max = jnp.where(has[:, None], cub_max, 0.0)
    r_max = jnp.linalg.norm(jnp.maximum(jnp.abs(cub_min), jnp.abs(cub_max)), axis=-1)
    return member, n_mem, center, std, cub_min, cub_max, r_max


@jax.jit
def pair_stats(m: MapState, table: ObjectTable):
    """[J, J] pairwise overlap/volume tensors for the host decisions."""
    size = table.cub_max - table.cub_min                       # [J, 3]
    cub_center = table.center + 0.5 * (table.cub_min + table.cub_max)
    dis = jnp.abs(cub_center[:, None, :] - cub_center[None, :, :])
    sum_half = 0.5 * (size[:, None, :] + size[None, :, :])
    overlap = sum_half - dis                                   # [J, J, 3]
    overlaps = jnp.all(dis < sum_half, axis=-1)
    vol = jnp.prod(jnp.maximum(size, 0.0), axis=-1)            # [J]
    ov_vol = jnp.prod(jnp.maximum(overlap, 0.0), axis=-1)
    iou3d = ov_vol / jnp.maximum(vol[:, None] + vol[None, :] - ov_vol, 1e-9)
    member_count = jnp.sum(
        (m.pt_object_id[None, :] == jnp.arange(table.capacity)[:, None])
        & m.pt_valid[None, :], axis=1,
    )
    return overlaps, overlap, iou3d, vol, member_count


@jax.jit
def merge_stats_packed(m: MapState, table: ObjectTable) -> jnp.ndarray:
    """Everything the host merge decisions read, as ONE flat f32 vector —
    one device->host sync per between-chunk merge pass instead of the ~12
    separate array pulls the unpacked form costs (each readback is a full
    link round trip; the merge pass dominated the measured between-chunk
    sync count)."""
    overlaps, overlap, iou3d, vol, member_count = pair_stats(m, table)
    valid = table.valid & ~table.bad
    f32 = jnp.float32
    return jnp.concatenate([
        overlaps.astype(f32).ravel(),
        overlap.astype(f32).ravel(),
        iou3d.astype(f32).ravel(),
        table.co_occur.astype(f32).ravel(),
        table.re_obj.astype(f32).ravel(),
        vol.astype(f32),
        member_count.astype(f32),
        valid.astype(f32),
        table.n_obs.astype(f32),
        table.cls.astype(f32),
        table.center.astype(f32).ravel(),
        (table.center + table.cub_min).astype(f32).ravel(),
        (table.center + table.cub_max).astype(f32).ravel(),
    ])


def _unpack_merge_stats(flat: np.ndarray, J: int):
    """Host-side unpack of merge_stats_packed's layout."""
    o = [0]

    def take(*shape):
        n = int(np.prod(shape))
        out = flat[o[0]:o[0] + n].reshape(shape)
        o[0] += n
        return out

    ov_np = take(J, J) > 0.5
    ovl = take(J, J, 3)
    iou_np = take(J, J)
    co = take(J, J)
    re = take(J, J)
    vol_np = take(J)
    nmem = take(J)
    valid = take(J) > 0.5
    n_obs = take(J).astype(np.int64)
    cls = take(J).astype(np.int64)
    center = take(J, 3)
    cmin = take(J, 3)
    cmax = take(J, 3)
    return ov_np, ovl, iou_np, co, re, vol_np, nmem, valid, n_obs, cls, \
        center, cmin, cmax


@partial(jax.jit, static_argnames=())
def apply_object_edits(
    m: MapState,
    table: ObjectTable,
    merge_winner,   # [K] int32 winner slot per merge (-1 pad)
    merge_loser,    # [K] int32
    evict_obj,      # [E] int32 object whose points get evicted in a region
    evict_lo,       # [E, 3] world-frame AABB of the eviction region
    evict_hi,       # [E, 3]
    kill,           # [J] bool — objects to bad-erase
):
    """Batched point-membership rewrites for merges / divisions, then a
    full stats refresh."""
    J = table.capacity
    P = m.pt_pos.shape[0]

    # --- merges: loser members move to winner if inside 1.1x winner cuboid
    # (MergeTwoMapObjs scale gate, src/Object.cc:1722-1729)
    owner = m.pt_object_id
    votes = m.pt_obj_votes
    K = merge_winner.shape[0]

    def do_merge(k, carry):
        owner, votes = carry
        w = merge_winner[k]
        l = merge_loser[k]
        wj = jnp.clip(w, 0, J - 1)
        Ry = yaw_rotation(table.yaw[wj])
        x_obj = (m.pt_pos - table.center[wj]) @ Ry  # R^T applied: [P,3]@[3,3]
        half = 0.5 * (table.cub_max[wj] - table.cub_min[wj])
        inside = jnp.all(jnp.abs(x_obj) <= 1.1 * jnp.maximum(half, 1e-6), axis=-1)
        from_loser = owner == l
        active = w >= 0
        owner = jnp.where(active & from_loser & inside, wj, owner)
        owner = jnp.where(active & from_loser & ~inside, -1, owner)
        votes = jnp.where(active & from_loser, jnp.where(inside, 1, 0), votes)
        return owner, votes

    owner, votes = jax.lax.fori_loop(0, K, do_merge, (owner, votes))

    # --- regional evictions (DivideEquallyTwoObjs / BigToSmall)
    E = evict_obj.shape[0]

    def do_evict(e, carry):
        owner, votes = carry
        o = evict_obj[e]
        inside = jnp.all(
            (m.pt_pos > evict_lo[e][None]) & (m.pt_pos < evict_hi[e][None]), axis=-1
        )
        hit = (owner == o) & inside & (o >= 0)
        return jnp.where(hit, -1, owner), jnp.where(hit, 0, votes)

    owner, votes = jax.lax.fori_loop(0, E, do_evict, (owner, votes))

    # killed objects lose their members
    owner_j = jnp.clip(owner, 0, J - 1)
    killed_pt = (owner >= 0) & kill[owner_j]
    owner = jnp.where(killed_pt, -1, owner)
    votes = jnp.where(killed_pt, 0, votes)

    m = m._replace(pt_object_id=owner, pt_obj_votes=votes)

    # winner inherits loser's observation count + rect history recency
    def inherit(k, tab):
        w, l = merge_winner[k], merge_loser[k]
        wj = jnp.clip(w, 0, J - 1)
        lj = jnp.clip(l, 0, J - 1)
        act = (w >= 0).astype(jnp.int32)
        n_obs = tab.n_obs.at[wj].add(act * tab.n_obs[lj])
        cent_sum = tab.cent_sum.at[wj].add(act * tab.cent_sum[lj])
        cent_sumsq = tab.cent_sumsq.at[wj].add(act * tab.cent_sumsq[lj])
        return tab._replace(n_obs=n_obs, cent_sum=cent_sum, cent_sumsq=cent_sumsq)

    table = jax.lax.fori_loop(0, K, inherit, table)
    lj_all = jnp.clip(merge_loser, 0, J - 1)
    losers = jnp.zeros((J,), bool).at[lj_all].max(merge_winner >= 0)
    bad = table.bad | kill | losers
    valid = table.valid & ~bad

    member, n_mem, center, std, cub_min, cub_max, r_max = member_stats(
        m, table._replace(bad=bad, valid=valid)
    )
    center = jnp.where((n_mem > 0)[:, None], center, table.center)
    bad |= valid & (n_mem == 0)  # emptied object dies (src/Object.cc:1046)
    valid &= ~bad
    n_f = jnp.maximum(table.n_obs, 1).astype(jnp.float32)[:, None]
    mean_c = table.cent_sum / n_f
    center_std = jnp.sqrt(jnp.maximum(table.cent_sumsq / n_f - mean_c**2, 1e-12))
    return m, table._replace(
        bad=bad, valid=valid, center=center, std=std, center_std=center_std,
        cub_min=cub_min, cub_max=cub_max, r_max=r_max,
    )


# ---------------------------------------------------------------------------
# host decisions
# ---------------------------------------------------------------------------

def run_merge_pass(m: MapState, table: ObjectTable):
    """Full keyframe-rate pass; returns (map_state, table). All decision
    inputs arrive through merge_stats_packed — ONE readback."""
    J = table.capacity
    (ov_np, ovl, iou_np, co, re, vol_np, nmem, valid, n_obs, cls,
     center, cmin, cmax) = _unpack_merge_stats(
        np.asarray(merge_stats_packed(m, table)), J)
    merges: List[Tuple[int, int]] = []
    evicts: List[Tuple[int, np.ndarray, np.ndarray]] = []
    kill = np.zeros((J,), bool)
    gone = np.zeros((J,), bool)

    def do_merge(i, j):
        # better-observed object wins (WhetherMergeTwoMapObjs)
        w, l = (i, j) if n_obs[i] >= n_obs[j] else (j, i)
        merges.append((w, l))
        gone[l] = True

    # --- potential-association merges
    for i in range(J):
        if not valid[i] or gone[i] or n_obs[i] < 10:
            continue
        for j in range(J):
            if i == j or not valid[j] or gone[j] or gone[i]:
                continue
            if re[i, j] >= 3 and co[i, j] == 0:
                do_merge(i, j)

    # --- overlap handling (DealTwoOverlapObjs case analysis)
    for i in range(J):
        if not valid[i] or gone[i] or nmem[i] < 10 or n_obs[i] < 10:
            continue
        for j in range(i + 1, J):
            if not valid[j] or gone[j] or gone[i] or nmem[j] < 10 or n_obs[j] < 10:
                continue
            if not ov_np[i, j]:
                continue
            b_iou = iou_np[i, j] >= 0.3
            b_volume = (vol_np[i] > 2 * vol_np[j]) or (vol_np[j] > 2 * vol_np[i])
            b_same_time = co[i, j] > 3
            b_class = cls[i] == cls[j]

            if b_iou and not b_volume and not b_same_time and b_class:
                do_merge(i, j)                                  # case 1
            elif b_volume and not b_same_time and b_class:      # case 2
                if n_obs[i] >= n_obs[j] and vol_np[i] > vol_np[j]:
                    kill[j] = True
                    gone[j] = True
                elif n_obs[i] < n_obs[j] and vol_np[i] < vol_np[j]:
                    kill[i] = True
                    gone[i] = True
            elif b_iou and not b_volume and b_same_time and b_class:  # case 3
                # both drop their points inside the other's core region
                shrink_i = 0.5 * (cmax[j] - cmin[j]) - 0.5 * ovl[i, j]
                cj = 0.5 * (cmin[j] + cmax[j])
                evicts.append((i, cj - shrink_i, cj + shrink_i))
                shrink_j = 0.5 * (cmax[i] - cmin[i]) - 0.5 * ovl[i, j]
                ci = 0.5 * (cmin[i] + cmax[i])
                evicts.append((j, ci - shrink_j, ci + shrink_j))
            elif not b_iou and b_volume and b_same_time and not b_class:  # case 4
                big, small = (i, j) if vol_np[i] > vol_np[j] else (j, i)
                evicts.append((big, cmin[small], cmax[small]))
            elif b_iou and not b_same_time and b_class:         # case 5
                if n_obs[i] // 2 >= n_obs[j]:
                    do_merge(i, j)
                elif n_obs[j] // 2 >= n_obs[i]:
                    do_merge(j, i)

    if not merges and not evicts and not kill.any():
        return m, table

    K = max(len(merges), 1)
    mw = np.full((K,), -1, np.int32)
    ml = np.full((K,), -1, np.int32)
    for k, (w, l) in enumerate(merges):
        mw[k], ml[k] = w, l
    E = max(len(evicts), 1)
    eo = np.full((E,), -1, np.int32)
    elo = np.zeros((E, 3), np.float32)
    ehi = np.zeros((E, 3), np.float32)
    for e, (o, lo, hi) in enumerate(evicts):
        eo[e], elo[e], ehi[e] = o, lo, hi

    return apply_object_edits(
        m, table,
        jnp.asarray(mw), jnp.asarray(ml),
        jnp.asarray(eo), jnp.asarray(elo), jnp.asarray(ehi),
        jnp.asarray(kill),
    )
