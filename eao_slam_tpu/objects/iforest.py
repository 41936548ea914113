"""Vectorized isolation forest over (trees x points).

Replaces the header-only recursive iForest the reference bundles
(include/isolation_forest.h:429-499, used by
Object_Map::IsolationForestDeleteOutliers, src/Object.cc:1202-1309) with a
breadth-synchronous formulation: all 50 trees advance one level per step,
node statistics come from segment scatter-min/max, and every point of every
tree routes in parallel — no recursion, fixed shapes, jit/vmap friendly.

Matches the reference's parameters: 50 trees, subsample n/2, anomaly score
2^(-E[h]/c(psi)) with threshold 0.6 (0.65 for tvmonitor class 62), classes
{75, 64, 65} skipped.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

EULER_GAMMA = 0.5772156649


def _c_factor(n: jnp.ndarray) -> jnp.ndarray:
    """Average unsuccessful-search path length c(n) of a BST."""
    n = jnp.maximum(n.astype(jnp.float32), 2.0)
    h = jnp.log(n - 1.0) + EULER_GAMMA
    return 2.0 * h - 2.0 * (n - 1.0) / n


@partial(jax.jit, static_argnames=("n_trees", "psi", "depth"))
def anomaly_scores(
    key: jnp.ndarray,
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    n_trees: int = 50,
    psi: int = 96,
    depth: int = 7,
) -> jnp.ndarray:
    """Anomaly score in [0, 1] per point. pts: [N, D], mask: [N] (padded
    slots scored 0). Higher = more isolated."""
    N, D = pts.shape
    T = n_trees
    NODES = 1 << depth

    k_sub, k_dims, k_fracs = jax.random.split(key, 3)
    # per-tree subsample: psi draws weighted to valid points (duplicates on
    # tiny sets only make splits slightly denser — same effect as the
    # reference clamping sample size to the data size)
    p = mask.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    sub_idx = jax.random.choice(k_sub, N, shape=(T, psi), p=p)     # [T, psi]
    sub_pts = pts[sub_idx]                                          # [T, psi, D]

    # per (tree, level, node) random dim + split fraction
    dims = jax.random.randint(k_dims, (depth, T, NODES), 0, D)
    fracs = jax.random.uniform(k_fracs, (depth, T, NODES))

    BIG = jnp.float32(1e30)
    node_ids = jnp.arange(NODES, dtype=jnp.int32)

    # TPU note: every per-(tree, node) aggregate below is a DENSE masked
    # reduction over a [T, *, NODES] one-hot tensor (~50x96x128 / 50xNx128
    # elements — trivial VPU work). The previous formulation used XLA
    # scatter-min/max/add with 2D indices, which serializes on TPU and
    # profiled at ~84 ms per frame for 8 detections; this one runs in ~1 ms.

    def pick_dim(x, d):
        """x: [..., D] with D==3, d: [...] int — branchless minor-dim pick."""
        return jnp.where(
            d == 0, x[..., 0], jnp.where(d == 1, x[..., 1], x[..., 2])
        )

    def level(l, carry):
        """One tree level, unrolled: level l has at most 2^l live parents
        and 2^(l+1) children, so the one-hot aggregation tensors shrink to
        the occupied prefix instead of the full NODES width."""
        n_par = min(1 << l, NODES)
        n_chl = min(n_par * 2, NODES)
        par_ids = node_ids[:n_par]
        chl_ids = node_ids[:n_chl]
        sub_nid, all_nid, sub_done_h, all_done_h = carry
        d_l = dims[l][:, :n_par]                                    # [T, n_par]
        f_l = fracs[l][:, :n_par]
        sub_oh = sub_nid[:, :, None] == par_ids[None, None, :]      # [T, psi, n_par]
        d_sub = jnp.sum(jnp.where(sub_oh, d_l[:, None, :], 0), axis=2)
        sub_dim = pick_dim(sub_pts, d_sub)                          # [T, psi]
        active_s = sub_done_h < 0
        memb = sub_oh & active_s[:, :, None]
        node_min = jnp.min(
            jnp.where(memb, sub_dim[:, :, None], BIG), axis=1
        )                                                           # [T, n_par]
        node_max = jnp.max(
            jnp.where(memb, sub_dim[:, :, None], -BIG), axis=1
        )
        split = node_min + f_l * (node_max - node_min)              # [T, n_par]

        # route subset
        s_split = jnp.sum(jnp.where(sub_oh, split[:, None, :], 0.0), axis=2)
        sub_right = sub_dim > s_split
        new_sub_nid = jnp.where(
            active_s, (sub_nid * 2 + sub_right.astype(jnp.int32)) % NODES, sub_nid
        )
        # member counts at the new level
        new_sub_oh = new_sub_nid[:, :, None] == chl_ids[None, None, :]
        counts = jnp.sum(
            (new_sub_oh & active_s[:, :, None]).astype(jnp.int32), axis=1
        )                                                           # [T, n_chl]
        sub_cnt = jnp.sum(jnp.where(new_sub_oh, counts[:, None, :], 0), axis=2)
        sub_done_h = jnp.where(
            active_s & (sub_cnt <= 1), jnp.float32(l + 1), sub_done_h
        )

        # route all points through the same splits
        all_oh = all_nid[:, :, None] == par_ids[None, None, :]      # [T, N, n_par]
        d_all = jnp.sum(jnp.where(all_oh, d_l[:, None, :], 0), axis=2)
        a_dim = pick_dim(pts[None], d_all)                          # [T, N]
        a_split = jnp.sum(jnp.where(all_oh, split[:, None, :], 0.0), axis=2)
        active_a = all_done_h < 0
        new_all_nid = jnp.where(
            active_a,
            (all_nid * 2 + (a_dim > a_split).astype(jnp.int32)) % NODES,
            all_nid,
        )
        new_all_oh = new_all_nid[:, :, None] == chl_ids[None, None, :]
        a_cnt = jnp.sum(jnp.where(new_all_oh, counts[:, None, :], 0), axis=2)
        all_done_h = jnp.where(
            active_a & (a_cnt <= 1), jnp.float32(l + 1), all_done_h
        )
        return new_sub_nid, new_all_nid, sub_done_h, all_done_h

    sub_nid0 = jnp.zeros((T, psi), jnp.int32)
    all_nid0 = jnp.zeros((T, N), jnp.int32)
    sub_h0 = jnp.full((T, psi), -1.0)
    all_h0 = jnp.full((T, N), -1.0)
    carry = (sub_nid0, all_nid0, sub_h0, all_h0)
    for l in range(depth):  # unrolled: per-level static shapes (see `level`)
        carry = level(l, carry)
    sub_nid, all_nid, sub_h, all_h = carry

    # points not isolated by the depth limit: h = depth + c(node size)
    fin_sub_oh = sub_nid[:, :, None] == node_ids[None, None, :]
    counts_final = jnp.sum(
        (fin_sub_oh & (sub_h < 0)[:, :, None]).astype(jnp.int32), axis=1
    )                                                               # [T, NODES]
    fin_all_oh = all_nid[:, :, None] == node_ids[None, None, :]
    leaf_cnt = jnp.sum(jnp.where(fin_all_oh, counts_final[:, None, :], 0), axis=2)
    h_all = jnp.where(
        all_h >= 0,
        all_h,
        depth + jnp.where(leaf_cnt >= 2, _c_factor(leaf_cnt), 0.0),
    )                                                               # [T, N]

    e_h = jnp.mean(h_all, axis=0)                                   # [N]
    score = jnp.exp2(-e_h / _c_factor(jnp.asarray(float(psi))))
    return jnp.where(mask, score, 0.0)


def psi_depth_for(n_points_cap: int):
    """Reference semantics: sample size n/2; depth limit ceil(log2(psi))."""
    psi = max(n_points_cap // 2, 8)
    depth = max(int(math.ceil(math.log2(psi))), 3)
    return psi, depth
