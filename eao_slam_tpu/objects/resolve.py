"""Device-side ensemble-cascade resolution.

The association cascade (Object_2D::ObjectDataAssociation,
src/Object.cc:162-710) is first-success sequential per detection with a
shared `taken` set — ~B*J scalar decisions. Round 1 replayed it on host,
which forces a device->host sync per frame; that is fatal for the chunked
device-resident tracker (one readback per 32 frames). This module runs the
SAME decision procedure as a jitted fori_loop over detections: every stage
is a masked argmax/flip-argmax over [J] score rows precomputed by
compute_detection_stats, and the mReObj potential-association votes
accumulate into a [J, J] increment matrix.

Semantics mirror objects/association.py:ObjectUpdater._resolve exactly
(tested equal in tests/test_resolve_device.py):
  stage 1  IoU vs motion-predicted box, per-object threshold 0.5/0.6
  stage 2  Wilcoxon rank-sum pass, newest-first, sanity-gated
  stage 3  projected-box IoU argmax (skip gate: npts>=10 & n_obs>8)
  stage 4  per-axis t-test vs t-table, alpha 0.05 / relaxed 0.001,
           newest-first, sanity-gated
plus new-object creation for unassociated non-border detections.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.objects.association import FrameDetections
from eao_slam_tpu.objects.state import ObjectTable


class ResolveResult(NamedTuple):
    assoc: jnp.ndarray      # [B] associated slot or -1
    new_slots: jnp.ndarray  # [B] allocated new-object slot or -1
    re_inc: jnp.ndarray     # [J, J] mReObj vote increments


def _highest_true(mask: jnp.ndarray) -> jnp.ndarray:
    """Highest index where mask is True, or -1 (the reference iterates the
    object vector newest-first, src/Object.cc:904-924 loop order)."""
    J = mask.shape[0]
    j = J - 1 - jnp.argmax(mask[::-1])
    return jnp.where(jnp.any(mask), j, -1)


@partial(
    jax.jit,
    static_argnames=("use_iou", "use_nonparam", "use_ttest",
                     "img_w", "img_h", "min_points"),
)
def resolve_cascade(
    det: FrameDetections,
    table: ObjectTable,
    t_table: jnp.ndarray,       # [122, 9] critical values (data/t_test.txt)
    bxs: jnp.ndarray,           # [B, 4]
    proj_iou_threshold: float,
    use_iou: bool = True,
    use_nonparam: bool = True,
    use_ttest: bool = True,
    img_w: int = 640,
    img_h: int = 480,
    min_points: int = 5,
) -> ResolveResult:
    B = det.det_valid.shape[0]
    J = table.capacity
    jidx = jnp.arange(J)

    tab_valid = table.valid & ~table.bad
    n_obs = table.n_obs
    t_crit_5 = t_table[jnp.clip(n_obs - 1, 1, 121), 5]   # alpha 0.05
    t_crit_8 = t_table[jnp.clip(n_obs - 1, 1, 121), 8]   # alpha 0.001
    sanity = (det.sanity_iou >= 0.5) | (det.sanity_former >= 0.8)  # [B, J]

    def body(b, carry):
        # TPU shape note: the per-detection mReObj votes accumulate into a
        # [B, J] ROW buffer (dynamic-update-slice per iteration) and are
        # scattered into the [J, J] matrix ONCE after the loop — the
        # previous 3 scatter-adds per detection serialized the whole
        # cascade (~2.6 ms/frame at B=8 on v5e).
        taken, assoc, new_mask, re_rows = carry
        # invalid detections contribute no stages, no votes, no objects
        cand = tab_valid & det.class_ok[b] & ~taken & det.det_valid[b]
        got = jnp.int32(-1)
        row = jnp.zeros((J,), jnp.int32)

        # ---- stage 1: IoU vs predicted box
        if use_iou:
            s1 = jnp.where(cand & (det.iou_pred[b] > det.iou_thresh),
                           det.iou_pred[b], 0.0)
            j1 = jnp.argmax(s1).astype(jnp.int32)
            got = jnp.where(s1[j1] > 0, j1, got)

        # ---- stage 2: rank-sum, newest-first, sanity-gated
        if use_nonparam:
            np_c = cand & det.np_pass[b] & det.np_n_ok & det.np_m_ok[b]
            j2 = _highest_true(np_c & sanity[b]).astype(jnp.int32)
            got2 = jnp.where(got < 0, j2, got)
            add2 = (got2 >= 0) & np_c & (jidx != got2)
            row = row + add2.astype(jnp.int32)
            got = got2

        # ---- stages 3+4: projected IoU, then t-test
        if use_ttest:
            skip = (det.det_npts[b] >= 10) & (n_obs > 8)
            pj = cand & ~skip & (det.proj_iou[b] >= proj_iou_threshold)
            s3 = jnp.where(pj, det.proj_iou[b], 0.0)
            j3 = jnp.argmax(s3).astype(jnp.int32)
            got3 = jnp.where((got < 0) & (s3[j3] > 0), j3, got)
            add3 = (got3 >= 0) & pj & (jidx != got3)
            row = row + add3.astype(jnp.int32)
            got = got3

            tv = det.t_vals[b]                               # [J, 3]
            df_ok = cand & (n_obs > 8)
            strong = df_ok & jnp.all(tv < t_crit_5[:, None], axis=1)
            relax = df_ok & (det.proj_iou[b] > 0.25) & (
                jnp.all(tv < t_crit_8[:, None], axis=1) | (tv.mean(1) < 10.0)
            )
            lower = df_ok & ~strong & ~relax & (det.proj_iou[b] > 0.25)
            t_c = strong | relax
            j4 = _highest_true(t_c & sanity[b]).astype(jnp.int32)
            got4 = jnp.where(got < 0, j4, got)
            add4 = (got4 >= 0) & (t_c | lower) & (jidx != got4)
            row = row + add4.astype(jnp.int32)
            got = got4

        got = jnp.where(det.det_valid[b], got, -1)
        taken = taken.at[jnp.clip(got, 0, J - 1)].max(got >= 0)
        assoc = assoc.at[b].set(got)
        # stage re-votes never target the winner itself, and rows of
        # unassociated detections are dropped by the final scatter
        re_rows = jax.lax.dynamic_update_index_in_dim(re_rows, row, b, 0)

        # new object unless the box hugs the image border
        x, y, w, h = bxs[b, 0], bxs[b, 1], bxs[b, 2], bxs[b, 3]
        edge = (x < 10) | (y < 10) | (x + w > img_w - 10) | (y + h > img_h - 10)
        is_new = (
            det.det_valid[b] & (got < 0) & ~edge
            & (det.det_npts[b] >= min_points)
        )
        new_mask = new_mask.at[b].set(is_new)
        return taken, assoc, new_mask, re_rows

    taken0 = jnp.zeros((J,), bool)
    assoc0 = jnp.full((B,), -1, jnp.int32)
    new0 = jnp.zeros((B,), bool)
    rr0 = jnp.zeros((B, J), jnp.int32)
    taken, assoc, new_mask, re_rows = jax.lax.fori_loop(
        0, B, body, (taken0, assoc0, new0, rr0)
    )
    re_inc = jnp.zeros((J, J), jnp.int32).at[
        jnp.where(assoc >= 0, assoc, J)
    ].add(re_rows, mode="drop")

    # ---- free-slot allocation for new objects (ascending free slots,
    # matching ObjectUpdater._allocate_slots)
    free_sorted = jnp.sort(jnp.where(~table.valid, jidx, J))     # [J]
    n_free = jnp.sum(~table.valid)
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1            # [B]
    slot = free_sorted[jnp.clip(rank, 0, J - 1)]
    new_slots = jnp.where(
        new_mask & (rank < n_free) & (slot < J), slot, -1
    ).astype(jnp.int32)
    return ResolveResult(assoc=assoc, new_slots=new_slots, re_inc=re_inc)
