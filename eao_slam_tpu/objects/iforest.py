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

    def level(l, carry):
        sub_nid, all_nid, sub_done_h, all_done_h = carry
        # node extents from subset members (segment min/max per (tree, node))
        d_l = dims[l]                                               # [T, NODES]
        f_l = fracs[l]
        sub_dim = jnp.take_along_axis(
            sub_pts, d_l[jnp.arange(T)[:, None], sub_nid][..., None], axis=2
        )[..., 0]                                                   # [T, psi]
        active_s = sub_done_h < 0
        node_min = jnp.full((T, NODES), BIG).at[
            jnp.arange(T)[:, None], sub_nid
        ].min(jnp.where(active_s, sub_dim, BIG))
        node_max = jnp.full((T, NODES), -BIG).at[
            jnp.arange(T)[:, None], sub_nid
        ].max(jnp.where(active_s, sub_dim, -BIG))
        split = node_min + f_l * (node_max - node_min)              # [T, NODES]

        # route subset
        s_split = split[jnp.arange(T)[:, None], sub_nid]
        sub_right = sub_dim > s_split
        new_sub_nid = jnp.where(
            active_s, (sub_nid * 2 + sub_right.astype(jnp.int32)) % NODES, sub_nid
        )
        # member counts at the new level
        counts = jnp.zeros((T, NODES), jnp.int32).at[
            jnp.arange(T)[:, None], new_sub_nid
        ].add(active_s.astype(jnp.int32))
        sub_cnt = counts[jnp.arange(T)[:, None], new_sub_nid]
        sub_done_h = jnp.where(
            active_s & (sub_cnt <= 1), jnp.float32(l + 1), sub_done_h
        )

        # route all points through the same splits
        a_dim = jnp.take_along_axis(
            jnp.broadcast_to(pts[None], (T, N, D)),
            d_l[jnp.arange(T)[:, None], all_nid][..., None],
            axis=2,
        )[..., 0]
        a_split = split[jnp.arange(T)[:, None], all_nid]
        active_a = all_done_h < 0
        new_all_nid = jnp.where(
            active_a,
            (all_nid * 2 + (a_dim > a_split).astype(jnp.int32)) % NODES,
            all_nid,
        )
        a_cnt = counts[jnp.arange(T)[:, None], new_all_nid]
        all_done_h = jnp.where(
            active_a & (a_cnt <= 1), jnp.float32(l + 1), all_done_h
        )
        return new_sub_nid, all_nid * 0 + new_all_nid, sub_done_h, all_done_h

    sub_nid0 = jnp.zeros((T, psi), jnp.int32)
    all_nid0 = jnp.zeros((T, N), jnp.int32)
    sub_h0 = jnp.full((T, psi), -1.0)
    all_h0 = jnp.full((T, N), -1.0)
    sub_nid, all_nid, sub_h, all_h = jax.lax.fori_loop(
        0, depth, level, (sub_nid0, all_nid0, sub_h0, all_h0)
    )

    # points not isolated by the depth limit: h = depth + c(node size)
    counts_final = jnp.zeros((T, NODES), jnp.int32).at[
        jnp.arange(T)[:, None], sub_nid
    ].add((sub_h < 0).astype(jnp.int32))
    leaf_cnt = counts_final[jnp.arange(T)[:, None], all_nid]
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
