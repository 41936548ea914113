"""Ensemble object data association: the EAO core, TPU-shaped.

The reference runs a sequential 4-stage cascade per 2D detection against
every map object (Object_2D::ObjectDataAssociation, src/Object.cc:162-710):

  1. IoU against the motion-predicted box        (thresh 0.5 / 0.6)
  2. Wilcoxon rank-sum over member points        (80% band, ±1.282 σ_W)
  3. IoU against the projected-member-point box  (≥ 0.25)
  4. per-axis one-sample t-test vs centroid history (t-table α=0.05,
     relaxed to α=0.001 / mean-t when the projected IoU is high)

followed by DataAssociateUpdate (src/Object.cc:1313-1554: reprojection
sanity gate, gated point insertion, historical-point culling) and new-object
creation.

Here all pair scores for all (detection, object) pairs are computed in ONE
jitted program as [B, J] tensors (SURVEY.md §7.2 step 6 — the rank-sum
O(m·n) comparison loop is a broadcast sign-sum, ideal VPU work), a tiny
host step replays the cascade's priority/first-success semantics over the
score matrices (B ≤ 16, J ≤ 64 scalars), and a second jitted program
applies all updates batched.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import SystemConfig
from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera, project
from eao_slam_tpu.objects import boxes as boxops
from eao_slam_tpu.objects import stats
from eao_slam_tpu.objects.iforest import anomaly_scores, psi_depth_for
from eao_slam_tpu.objects.state import ObjectTable, cuboid_corners, yaw_rotation
from eao_slam_tpu.runtime.map_state import MapState

# iForest class gates (src/Object.cc:1206-1212)
IFOREST_SKIP_CLASSES = (75, 64, 65)
IFOREST_TV_CLASS = 62
# scale-gated insertion classes (src/Object.cc:1462: chair 56, teddy 77)
SCALE_GATE_CLASSES = (56, 77)

N_OBJ_SAMPLE = 192   # member-point subsample per object for pair stats
N_DET_SAMPLE = 128   # detection-point subsample


class FrameDetections(NamedTuple):
    """Stage scores + per-detection data produced by the jitted pass."""
    det_valid: jnp.ndarray      # [B] after hygiene + boxplot + min points
    det_center: jnp.ndarray     # [B, 3]
    det_npts: jnp.ndarray       # [B]
    det_pt_mask: jnp.ndarray    # [B, F] final member mask
    feat_rect: jnp.ndarray      # [B, 4]
    iou_pred: jnp.ndarray       # [B, J] stage-1 IoU vs predicted rect
    iou_thresh: jnp.ndarray     # [J] 0.5 or 0.6
    np_pass: jnp.ndarray        # [B, J] stage-2 rank-sum verdict
    np_m_ok: jnp.ndarray        # [B] m >= 20
    np_n_ok: jnp.ndarray        # [J] n >= 20
    proj_iou: jnp.ndarray       # [B, J] stage-3 max IoU vs projected rect
    t_vals: jnp.ndarray         # [B, J, 3] stage-4 per-axis t
    sanity_iou: jnp.ndarray     # [B, J] DataAssociateUpdate step-1 IoU
    sanity_former: jnp.ndarray  # [B, J] overlapFormer(union, det box)
    class_ok: jnp.ndarray       # [B, J]
    obj_sub_idx: jnp.ndarray    # [J, No] member subsample point ids
    obj_sub_mask: jnp.ndarray   # [J, No]


class ObjectUpdater:
    """Per-frame object pipeline: detections -> cascade -> table update.

    Host-side wrapper owning the jitted stages; mirrors the object work in
    TrackWithMotionModel (src/Tracking.cc:1246-1647)."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.cam = cfg.camera
        self.t_table = stats.make_t_table()
        self.psi, self.depth = psi_depth_for(N_OBJ_SAMPLE)
        self._key = jax.random.PRNGKey(cfg.objects.iforest_seed)

    # ------------------------------------------------------------------
    # public entry
    # ------------------------------------------------------------------

    def frame_update(
        self,
        m: MapState,
        table: ObjectTable,
        frame_boxes,        # (boxes [B,4], cls [B], score [B], valid [B])
        T_cw: np.ndarray,
        kp: jnp.ndarray,    # [F, 2] current frame keypoints
        cur_pt: jnp.ndarray,  # [F] map-point id per feature
        frame_id: int,
        lines=None,         # ([L, 4], [L] valid) 2D segments for yaw sampling
    ):
        """Returns (map_state, table, appear_new_object: bool)."""
        bxs, cls, score, bvalid = frame_boxes
        det = compute_detection_stats(
            self.cam, m.pt_pos, m.pt_valid, m.pt_object_id,
            table, jnp.asarray(T_cw, jnp.float32),
            kp, cur_pt, bxs, cls, score, bvalid,
            jnp.int32(frame_id),
        )
        assoc, new_mask, re_pairs = self._resolve(det, table, cls, bxs, frame_id)

        new_slots = self._allocate_slots(table, new_mask)
        self._key, k1 = jax.random.split(self._key)
        m2, table2 = apply_frame_update(
            self.cam, m, table,
            det, jnp.asarray(assoc), jnp.asarray(new_slots),
            bxs, cls,
            jnp.asarray(T_cw, jnp.float32), kp, cur_pt,
            jnp.int32(frame_id), k1,
            psi=self.psi, depth=self.depth,
        )
        if re_pairs:
            src = jnp.asarray([p[0] for p in re_pairs])
            dst = jnp.asarray([p[1] for p in re_pairs])
            table2 = table2._replace(
                re_obj=table2.re_obj.at[src, dst].add(1)
            )

        # line-alignment yaw sampling (SampleObjYaw, src/Tracking.cc:2624)
        if self.cfg.flag.use_yaw_lines and lines is not None:
            from eao_slam_tpu.objects.yaw import update_yaw, yaw_sample_scores

            lns, lns_valid = lines
            targets = jnp.asarray(
                np.where(assoc >= 0, assoc, new_slots).astype(np.int32)
            )
            counts, errs, n_lines = yaw_sample_scores(
                self.cam, table2, targets, bxs,
                jnp.asarray(T_cw, jnp.float32), lns, lns_valid,
            )
            table2 = update_yaw(table2, targets, counts, errs, n_lines)

        appear_new = bool((np.asarray(new_slots) >= 0).any())
        return m2, table2, appear_new

    # ------------------------------------------------------------------
    # host cascade resolution (B*J scalars — trivial)
    # ------------------------------------------------------------------

    def _resolve(self, det: FrameDetections, table: ObjectTable,
                 cls, bxs, frame_id: int):
        cfg = self.cfg.objects
        flag = self.cfg.flag
        B = det.det_valid.shape[0]
        J = table.capacity

        d = {f: np.asarray(getattr(det, f)) for f in det._fields
             if f not in ("obj_sub_idx", "obj_sub_mask")}
        tab_valid = np.asarray(table.valid) & ~np.asarray(table.bad)
        n_obs = np.asarray(table.n_obs)
        t_crit_5 = self.t_table[np.clip(n_obs - 1, 1, 121), 5]   # alpha 0.05
        t_crit_8 = self.t_table[np.clip(n_obs - 1, 1, 121), 8]   # alpha 0.001
        bxs_np = np.asarray(bxs)
        W, H = self.cam.width, self.cam.height

        assoc = np.full((B,), -1, np.int64)
        new_mask = np.zeros((B,), bool)
        re_pairs = []
        taken = np.zeros((J,), bool)  # one detection per object per frame

        def sanity_ok(b, j):
            # DataAssociateUpdate step 1 (flags 2/3 only)
            return d["sanity_iou"][b, j] >= 0.5 or d["sanity_former"][b, j] >= 0.8

        for b in range(B):
            if not d["det_valid"][b]:
                continue
            cand_base = tab_valid & d["class_ok"][b] & ~taken
            got = -1

            # ---- stage 1: IoU vs predicted box
            if flag.use_iou:
                ious = np.where(
                    cand_base & (d["iou_pred"][b] > d["iou_thresh"]),
                    d["iou_pred"][b], 0.0,
                )
                j = int(np.argmax(ious))
                if ious[j] > 0:
                    got = j

            # ---- stage 2: nonparametric rank-sum
            if flag.use_nonparam and d["np_m_ok"][b]:
                np_cand = np.nonzero(
                    cand_base & d["np_pass"][b] & d["np_n_ok"]
                )[0][::-1]  # reference iterates newest-first
                if got >= 0:
                    for j in np_cand:
                        if j != got:
                            re_pairs.append((got, int(j)))
                else:
                    for j in np_cand:
                        if sanity_ok(b, j):
                            got = int(j)
                            for j2 in np_cand:
                                if j2 != got:
                                    re_pairs.append((got, int(j2)))
                            break

            # ---- stage 3: projected-box IoU
            if flag.use_ttest:
                skip = (d["det_npts"][b] >= 10) & (n_obs > 8)
                proj = np.where(
                    cand_base & ~skip & (d["proj_iou"][b] >= cfg.proj_iou_threshold),
                    d["proj_iou"][b], 0.0,
                )
                pj_cand = np.nonzero(proj > 0)[0]
                if len(pj_cand):
                    if got >= 0:
                        for j in pj_cand:
                            if j != got:
                                re_pairs.append((got, int(j)))
                    else:
                        j = int(pj_cand[np.argmax(proj[pj_cand])])
                        got = j
                        for j2 in pj_cand:
                            if j2 != got:
                                re_pairs.append((got, int(j2)))

                # ---- stage 4: t-test
                tv = d["t_vals"][b]                    # [J, 3]
                df_ok = cand_base & (n_obs > 8)
                strong = df_ok & (tv < t_crit_5[:, None]).all(1)
                relax = df_ok & (d["proj_iou"][b] > 0.25) & (
                    (tv < t_crit_8[:, None]).all(1) | (tv.mean(1) < 10.0)
                )
                # potential-association pool: failed the tests but the
                # projected boxes still overlap (the reference's second
                # branch re-projects and re-checks the same 0.25 gate)
                lower = df_ok & ~strong & ~relax & (d["proj_iou"][b] > 0.25)
                t_cand = np.nonzero(strong | relax)[0]
                if got >= 0:
                    for j in t_cand:
                        if j != got:
                            re_pairs.append((got, int(j)))
                    for j in np.nonzero(lower)[0]:
                        if j != got:
                            re_pairs.append((got, int(j)))
                else:
                    for j in t_cand[::-1]:  # newest-first like the reference
                        if sanity_ok(b, int(j)):
                            got = int(j)
                            for j2 in t_cand:
                                if j2 != got:
                                    re_pairs.append((got, int(j2)))
                            for j2 in np.nonzero(lower)[0]:
                                if j2 != got:
                                    re_pairs.append((got, int(j2)))
                            break

            if got >= 0:
                assoc[b] = got
                taken[got] = True
            else:
                # new object unless the box hugs the image border
                x, y, w, h = bxs_np[b]
                edge = (x < 10) or (y < 10) or (x + w > W - 10) or (y + h > H - 10)
                if not edge and d["det_npts"][b] >= self.cfg.objects.min_points_per_object:
                    new_mask[b] = True
        return assoc, new_mask, re_pairs

    def _allocate_slots(self, table: ObjectTable, new_mask) -> np.ndarray:
        free = np.nonzero(~np.asarray(table.valid))[0]
        out = np.full(len(new_mask), -1, np.int64)
        k = 0
        for b in np.nonzero(new_mask)[0]:
            if k >= len(free):
                break
            out[b] = free[k]
            k += 1
        return out


# ---------------------------------------------------------------------------
# jitted stage 1: all pair statistics
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam",))
def compute_detection_stats(
    cam: Camera,
    pt_pos, pt_valid, pt_object_id,
    table: ObjectTable,
    T_cw,
    kp, cur_pt,
    bxs, cls, score, bvalid,
    frame_id,
) -> FrameDetections:
    P = pt_pos.shape[0]
    F = kp.shape[0]
    B = bxs.shape[0]
    J = table.capacity

    # --- detection membership: tracked features inside each box
    has_pt = cur_pt >= 0
    in_box = boxops.points_in_box(kp, bxs)                   # [B, F]
    det_mask = in_box & has_pt[None, :] & bvalid[:, None]

    pt_of_feat = jnp.clip(cur_pt, 0, P - 1)
    Xw_feat = pt_pos[pt_of_feat]                             # [F, 3]
    xc_feat = se3.apply(T_cw, Xw_feat)

    # box-plot depth rejection per detection (src/Object.cc:106-158)
    z = jnp.broadcast_to(xc_feat[None, :, 2], (B, F))
    det_mask = stats.boxplot_depth_inliers(z, det_mask)

    det_npts = jnp.sum(det_mask, axis=1)
    det_center = jnp.sum(
        jnp.where(det_mask[..., None], Xw_feat[None], 0.0), axis=1
    ) / jnp.maximum(det_npts, 1)[:, None]
    feat_rect = boxops.bbox_of_points(
        jnp.broadcast_to(kp[None], (B, F, 2)), det_mask,
        float(cam.width), float(cam.height),
    )

    # 2D hygiene (src/Tracking.cc:1383-1487)
    det_valid = boxops.box_hygiene(
        bxs, cls, score, bvalid, det_npts, float(cam.width), float(cam.height)
    )
    det_valid &= det_npts >= 5

    # --- object member subsample [J, No]
    member = (pt_object_id[None, :] == jnp.arange(J)[:, None]) & pt_valid[None, :]
    # deterministic pseudo-random tiebreak so the subsample spreads
    h = ((jnp.arange(P, dtype=jnp.uint32) * jnp.uint32(2654435761)) % 997).astype(jnp.float32) / 997.0
    sel_score = jnp.where(member, 1.0 + h[None, :], 0.0)
    top_vals, obj_sub_idx = jax.lax.top_k(sel_score, N_OBJ_SAMPLE)     # [J, No]
    obj_sub_mask = top_vals > 0.0
    obj_sub_pos = pt_pos[obj_sub_idx]                                  # [J, No, 3]
    obj_n = jnp.sum(member, axis=1)

    # --- projected rect per object (ComputeProjectRectFrame)
    xc_obj = se3.apply(T_cw[None, None], obj_sub_pos)
    uv_obj = project(cam, xc_obj)                                      # [J, No, 2]
    vis_obj = obj_sub_mask & (xc_obj[..., 2] > 0.05)
    proj_rect = boxops.bbox_of_points(uv_obj, vis_obj, float(cam.width), float(cam.height))

    # --- stage 1: predicted rect + IoU
    two_frames = table.last_last_frame == frame_id - 2
    lr, llr = table.last_rect, table.last_last_rect
    px0 = jnp.maximum(lr[:, 0] * 2 - llr[:, 0], 0.0)
    py0 = jnp.maximum(lr[:, 1] * 2 - llr[:, 1], 0.0)
    px1 = (lr[:, 0] + lr[:, 2]) * 2 - (llr[:, 0] + llr[:, 2])
    py1 = (lr[:, 1] + lr[:, 3]) * 2 - (llr[:, 1] + llr[:, 3])
    pred_rect = jnp.where(
        two_frames[:, None],
        jnp.stack([px0, py0, px1 - px0, py1 - py0], axis=1),
        lr,
    )
    seen_last = table.last_frame == frame_id - 1
    iou_pred = boxops.iou(bxs, pred_rect) * seen_last[None, :]
    iou_thresh = jnp.where(two_frames & seen_last, 0.6, 0.5)

    # --- stage 2: rank-sum over (det points x obj subsample)
    dsel = jnp.where(det_mask, 1.0 + h[None, :F], 0.0)
    dvals, det_sub_idx = jax.lax.top_k(dsel, N_DET_SAMPLE)             # [B, Nd]
    det_sub_mask = dvals > 0.0
    det_sub_pos = Xw_feat[det_sub_idx]                                 # [B, Nd, 3]
    np_pass = stats.rank_sum_all_axes_pass(
        det_sub_pos[:, None], det_sub_mask[:, None],
        jnp.broadcast_to(obj_sub_pos[None], (B, J, N_OBJ_SAMPLE, 3)),
        jnp.broadcast_to(obj_sub_mask[None], (B, J, N_OBJ_SAMPLE)),
    )                                                                  # [B, J]
    np_m_ok = det_npts >= 20
    np_n_ok = obj_n >= 20

    # --- stage 3: projected IoU (box and feature-rect variants)
    proj_iou = jnp.maximum(
        boxops.iou(bxs, proj_rect), boxops.iou(feat_rect, proj_rect)
    )

    # --- stage 4: t statistics
    t_vals = stats.t_statistic_center(
        det_center[:, None, :], table.center[None], table.center_std[None],
        jnp.maximum(table.n_obs, 1)[None].astype(jnp.float32),
    )                                                                  # [B, J, 3]

    # --- sanity gate inputs (DataAssociateUpdate step 1): bbox of the union
    # of det points + object points projected into this frame
    uv_feat = project(cam, xc_feat)                                    # [F, 2]
    det_uv = jnp.broadcast_to(uv_feat[None], (B, F, 2))
    # union box = merge of det-point bbox and object's proj_rect
    det_rect_pts = boxops.bbox_of_points(det_uv, det_mask, float(cam.width), float(cam.height))
    ux0 = jnp.minimum(det_rect_pts[:, None, 0], proj_rect[None, :, 0])
    uy0 = jnp.minimum(det_rect_pts[:, None, 1], proj_rect[None, :, 1])
    ux1 = jnp.maximum(det_rect_pts[:, None, 0] + det_rect_pts[:, None, 2],
                      proj_rect[None, :, 0] + proj_rect[None, :, 2])
    uy1 = jnp.maximum(det_rect_pts[:, None, 1] + det_rect_pts[:, None, 3],
                      proj_rect[None, :, 1] + proj_rect[None, :, 3])
    union_rect = jnp.stack([ux0, uy0, ux1 - ux0, uy1 - uy0], axis=-1)  # [B, J, 4]
    sanity_iou = boxops.iou_elem(union_rect, proj_rect[None, :, :])
    sanity_former = boxops.overlap_former_elem(union_rect, bxs[:, None, :])

    class_ok = cls[:, None] == table.cls[None, :]

    return FrameDetections(
        det_valid=det_valid,
        det_center=det_center,
        det_npts=det_npts,
        det_pt_mask=det_mask,
        feat_rect=feat_rect,
        iou_pred=iou_pred,
        iou_thresh=iou_thresh,
        np_pass=np_pass,
        np_m_ok=np_m_ok,
        np_n_ok=np_n_ok,
        proj_iou=proj_iou,
        t_vals=t_vals,
        sanity_iou=sanity_iou,
        sanity_former=sanity_former,
        class_ok=class_ok,
        obj_sub_idx=obj_sub_idx,
        obj_sub_mask=obj_sub_mask,
    )


# ---------------------------------------------------------------------------
# jitted stage 2: apply all updates batched
# ---------------------------------------------------------------------------

N_IFOREST_SAMPLE = 512  # member cap for the per-frame iForest pass


def member_stats(cam, pt_pos, pt_valid, pt_object_id, table, T_cw, h):
    """Member-derived object statistics, recomputed from the point tables:
    centroid/std (ComputeMeanAndStandard, src/Object.cc:967), object-frame
    AABB + r_max, and the projected rect for the next frame
    (ComputeProjectRectFrame). Shared by the per-frame update and the
    chunk-rate iForest cull. h: [P] deterministic subsample hash."""
    J = table.capacity
    member = (pt_object_id[None, :] == jnp.arange(J)[:, None]) & pt_valid[None, :]
    mw = member.astype(jnp.float32)
    n_mem = jnp.sum(mw, axis=1)
    has_mem = n_mem > 0
    center = (mw @ pt_pos) / jnp.maximum(n_mem, 1.0)[:, None]
    center = jnp.where(has_mem[:, None], center, table.center)  # keep stale
    var = (mw @ (pt_pos**2)) / jnp.maximum(n_mem, 1.0)[:, None] - center**2
    std = jnp.sqrt(jnp.maximum(var, 1e-12))

    # object-frame AABB + r_max
    RyJ = yaw_rotation(table.yaw)                               # [J, 3, 3]
    rel = pt_pos[None, :, :] - center[:, None, :]               # [J, P, 3]
    x_objJ = jnp.einsum("jba,jpb->jpa", RyJ, rel)
    big = 1e9
    cub_min = jnp.min(jnp.where(member[..., None], x_objJ, big), axis=1)
    cub_max = jnp.max(jnp.where(member[..., None], x_objJ, -big), axis=1)
    cub_min = jnp.where(has_mem[:, None], cub_min, 0.0)
    cub_max = jnp.where(has_mem[:, None], cub_max, 0.0)
    r_max = jnp.linalg.norm(
        jnp.maximum(jnp.abs(cub_min), jnp.abs(cub_max)), axis=-1
    )

    # projected rect for the next frame (ComputeProjectRectFrame)
    mem_sel = jnp.where(member, 1.0 + h[None, :], 0.0)
    tv2, sub2 = jax.lax.top_k(mem_sel, N_OBJ_SAMPLE)
    sub2_mask = tv2 > 0.0
    xc2 = se3.apply(T_cw[None, None], pt_pos[sub2])
    uv2 = project(cam, xc2)
    proj_rect = boxops.bbox_of_points(
        uv2, sub2_mask & (xc2[..., 2] > 0.05), float(cam.width), float(cam.height)
    )
    return center, std, cub_min, cub_max, r_max, proj_rect, has_mem


@partial(jax.jit, static_argnames=("cam", "psi", "depth", "run_iforest"))
def apply_frame_update(
    cam: Camera,
    m: MapState,
    table: ObjectTable,
    det: FrameDetections,
    assoc,            # [B] associated object slot or -1
    new_slots,        # [B] new-object slot or -1
    bxs, cls,
    T_cw, kp, cur_pt,
    frame_id,
    key,
    psi: int = 96,
    depth: int = 7,
    run_iforest: bool = True,
):
    """Batched DataAssociateUpdate + InitObjMap + iForest + stats refresh
    (src/Object.cc:1313-1554, 1202-1309, 967-1198; src/Tracking.cc:2531).
    Detections update disjoint objects (guaranteed by the resolver), so all
    scatters are conflict-free."""
    P = m.pt_pos.shape[0]
    F = kp.shape[0]
    B = assoc.shape[0]
    J = table.capacity

    target = jnp.where(assoc >= 0, assoc, new_slots)            # [B]
    is_new = (new_slots >= 0) & (assoc < 0)
    active = target >= 0
    tj = jnp.clip(target, 0, J - 1)

    # ---- 1. point membership insertion (gated) ---------------------------
    owner_b = jnp.argmax(
        det.det_pt_mask & active[:, None], axis=0
    )                                                           # [F]
    in_any = jnp.any(det.det_pt_mask & active[:, None], axis=0)
    feat_obj = jnp.where(in_any, target[owner_b], -1)           # [F]

    p_of_f = jnp.clip(cur_pt, 0, P - 1)
    Xf = m.pt_pos[p_of_f]                                       # [F, 3]
    fj = jnp.clip(feat_obj, 0, J - 1)
    centers = table.center[fj]
    dist = jnp.linalg.norm(Xf - centers, axis=-1)
    th_dist = jnp.where(table.n_obs[fj] > 5, 0.9, 1.0)
    obj_isnew = jnp.zeros((J,), bool).at[tj].max(is_new)
    dist_ok = (dist <= th_dist * jnp.maximum(table.r_max[fj], 1e-6)) | obj_isnew[fj]

    # scale gate for chair/teddy after 10 obs (src/Object.cc:1462-1469)
    Ry = yaw_rotation(table.yaw[fj])                            # [F, 3, 3]
    x_obj = jnp.einsum("fba,fb->fa", Ry, Xf - centers)
    half = 0.5 * (table.cub_max[fj] - table.cub_min[fj])
    scale_class = jnp.zeros((F,), bool)
    for c in SCALE_GATE_CLASSES:
        scale_class |= table.cls[fj] == c
    scale_applies = scale_class & (table.n_obs[fj] >= 10)
    scale_ok = ~scale_applies | jnp.all(
        jnp.abs(x_obj) <= 1.2 * jnp.maximum(half, 1e-6), axis=-1
    )

    insert = (feat_obj >= 0) & (cur_pt >= 0) & (dist_ok & scale_ok | obj_isnew[fj])
    pt_object_id = m.pt_object_id
    pt_obj_votes = m.pt_obj_votes
    same = pt_object_id[p_of_f] == feat_obj
    upd_votes = jnp.where(same, pt_obj_votes[p_of_f] + 1, 1)
    pt_object_id = pt_object_id.at[jnp.where(insert, p_of_f, P)].set(
        jnp.where(insert, feat_obj, 0), mode="drop"
    )
    pt_obj_votes = pt_obj_votes.at[jnp.where(insert, p_of_f, P)].set(
        jnp.where(insert, upd_votes, 0), mode="drop"
    )

    # ---- 2. historical-point culling (DataAssociateUpdate step 4) --------
    # members of an object associated this frame, projecting inside the
    # image but outside its detection box, with <= 8 votes, are evicted
    margin_ok = (
        (bxs[:, 0] > 25) & (bxs[:, 1] > 25)
        & (bxs[:, 0] + bxs[:, 2] < cam.width - 25)
        & (bxs[:, 1] + bxs[:, 3] < cam.height - 25)
    ) & active & ~is_new
    # drop-guarded scatters: inactive rows (target -1) must not clobber slot 0
    cull_idx = jnp.where(margin_ok, tj, J)
    obj_box = jnp.zeros((J, 4)).at[cull_idx].set(bxs, mode="drop")
    obj_cullable = jnp.zeros((J,), bool).at[cull_idx].set(True, mode="drop")

    xc_all = se3.apply(T_cw, m.pt_pos)
    uv_all = project(cam, xc_all)
    in_img = (xc_all[..., 2] > 0.05) & (
        (uv_all[:, 0] >= 0) & (uv_all[:, 0] < cam.width)
        & (uv_all[:, 1] >= 0) & (uv_all[:, 1] < cam.height)
    )
    oj = jnp.clip(pt_object_id, 0, J - 1)
    bx = obj_box[oj]
    in_box = (
        (uv_all[:, 0] >= bx[:, 0]) & (uv_all[:, 0] <= bx[:, 0] + bx[:, 2])
        & (uv_all[:, 1] >= bx[:, 1]) & (uv_all[:, 1] <= bx[:, 1] + bx[:, 3])
    )
    evict = (
        (pt_object_id >= 0) & obj_cullable[oj] & in_img & ~in_box
        & (pt_obj_votes <= 8) & m.pt_valid
    )
    pt_object_id = jnp.where(evict, -1, pt_object_id)
    pt_obj_votes = jnp.where(evict, 0, pt_obj_votes)

    # ---- 3. iForest on updated objects (src/Object.cc:1202-1309) ---------
    # The chunked device tracker passes run_iforest=False and instead runs
    # chunk_iforest_cull once per chunk OUTSIDE the lax.scan body: these
    # tiny-shape tree kernels cost ~0.05 ms standalone but ~4.3 ms inside a
    # TPU while-loop body (no cross-op fusion at [50, 512] shapes), which
    # was 55% of the whole per-frame budget.
    h = ((jnp.arange(P, dtype=jnp.uint32) * jnp.uint32(2654435761)) % 1009).astype(jnp.float32) / 1009.0
    if run_iforest:
        upd_member = (pt_object_id[None, :] == tj[:, None]) & (m.pt_valid[None, :]) \
            & active[:, None]                                       # [B, P]
        pt_object_id, pt_obj_votes = _iforest_score_and_evict(
            m.pt_pos, pt_object_id, pt_obj_votes, upd_member, cls,
            active, key, h, psi, depth,
        )

    # ---- 4. table bookkeeping + stats refresh ----------------------------
    valid = table.valid.at[tj].max(active)
    cls_tab = table.cls.at[jnp.where(is_new, tj, J)].set(
        jnp.where(is_new, cls, 0), mode="drop"
    )
    n_obs = table.n_obs.at[jnp.where(active, tj, J)].add(
        jnp.where(active, 1, 0), mode="drop"
    )
    safe_t = jnp.where(active, tj, J)
    last_last_frame = table.last_last_frame.at[safe_t].set(
        table.last_frame[tj], mode="drop"
    )
    last_frame = table.last_frame.at[safe_t].set(
        jnp.broadcast_to(frame_id, (B,)), mode="drop"
    )
    last_last_rect = table.last_last_rect.at[safe_t].set(
        table.last_rect[tj], mode="drop"
    )
    last_rect = table.last_rect.at[jnp.where(active, tj, J)].set(
        jnp.where(active[:, None], bxs, 0.0), mode="drop"
    )
    cent_sum = table.cent_sum.at[jnp.where(active, tj, J)].add(
        jnp.where(active[:, None], det.det_center, 0.0), mode="drop"
    )
    cent_sumsq = table.cent_sumsq.at[jnp.where(active, tj, J)].add(
        jnp.where(active[:, None], det.det_center**2, 0.0), mode="drop"
    )
    n_f = jnp.maximum(n_obs, 1).astype(jnp.float32)[:, None]
    mean_c = cent_sum / n_f
    center_std = jnp.sqrt(jnp.maximum(cent_sumsq / n_f - mean_c**2, 1e-12))

    # full membership stats (ComputeMeanAndStandard, src/Object.cc:967)
    center, std, cub_min, cub_max, r_max, proj_rect, has_mem = member_stats(
        cam, m.pt_pos, m.pt_valid, pt_object_id, table, T_cw, h
    )

    # co-occurrence (src/Tracking.cc:1619-1647)
    seen_now = jnp.zeros((J,), bool).at[tj].max(active)
    co = seen_now[:, None] & seen_now[None, :] & ~jnp.eye(J, dtype=bool)
    co_occur = table.co_occur + co.astype(jnp.int32)

    # object culling (src/Tracking.cc:1580-1617): young objects unseen for
    # 30 frames die (df<5), or die on 3D overlap (5<=df<10)
    unseen = last_frame < frame_id - 30
    w_min = center + cub_min  # world AABB (yaw≈0 approx for the cull test)
    w_max = center + cub_max
    ov = jnp.all(
        (w_min[:, None, :] <= w_max[None, :, :])
        & (w_max[:, None, :] >= w_min[None, :, :]), axis=-1
    ) & valid[:, None] & valid[None, :] & ~jnp.eye(J, dtype=bool)
    overlaps_any = jnp.any(ov, axis=1)
    bad = table.bad | (valid & unseen & (n_obs < 5)) | (
        valid & unseen & (n_obs >= 5) & (n_obs < 10) & overlaps_any
    )
    # an object whose member points were all culled is dead (the reference
    # sets bBadErase when the point vector empties, src/Object.cc:1046-1051)
    bad |= valid & ~has_mem

    table = table._replace(
        valid=valid, bad=bad, cls=cls_tab, n_obs=n_obs,
        last_frame=last_frame, last_last_frame=last_last_frame,
        last_rect=last_rect, last_last_rect=last_last_rect,
        proj_rect=proj_rect,
        center=center, std=std,
        cent_sum=cent_sum, cent_sumsq=cent_sumsq, center_std=center_std,
        r_max=r_max, cub_min=cub_min, cub_max=cub_max,
        co_occur=co_occur,
    )
    m = m._replace(pt_object_id=pt_object_id, pt_obj_votes=pt_obj_votes)
    return m, table


def _iforest_score_and_evict(pt_pos, pt_object_id, pt_obj_votes, member,
                             cls_vec, extra_gate, key, h, psi, depth):
    """Shared hash-subsample → isolation-forest score → threshold-evict
    block of the per-frame and chunk-rate iForest passes
    (IsolationForestDeleteOutliers, src/Object.cc:1202-1309).

    member: [N, P] point membership per scored row (detections for the
    per-frame pass, objects for the chunk pass); cls_vec: [N] COCO class
    (drives the tvmonitor threshold + skip-class gate); extra_gate: [N]
    caller-specific liveness. psi/depth are keyed to N_OBJ_SAMPLE (not the
    N_IFOREST_SAMPLE subsample cap) INTENTIONALLY: both passes must score
    with identical tree geometry so the chunk-rate cull evicts exactly the
    points the per-frame pass would (tests/test_objects.py pacing test).
    Returns the updated (pt_object_id, pt_obj_votes)."""
    P = pt_pos.shape[0]
    N = member.shape[0]
    sel = jnp.where(member, 1.0 + h[None, :], 0.0)
    top_v, mem_idx = jax.lax.top_k(sel, N_IFOREST_SAMPLE)       # [N, S]
    mem_mask = top_v > 0.0
    mem_pos = pt_pos[mem_idx]                                   # [N, S, 3]
    n_members = jnp.sum(member, axis=1)

    keys = jax.random.split(key, N)
    scores = jax.vmap(
        lambda k, p, msk: anomaly_scores(k, p, msk, 50, psi, depth)
    )(keys, mem_pos, mem_mask)                                  # [N, S]

    th_if = jnp.where(cls_vec == IFOREST_TV_CLASS, 0.65, 0.6)[:, None]
    skip_cls = jnp.zeros((N,), bool)
    for c in IFOREST_SKIP_CLASSES:
        skip_cls |= cls_vec == c
    run_forest = extra_gate & ~skip_cls & (n_members >= 30)
    outlier = mem_mask & (scores > th_if) & run_forest[:, None]
    flat_idx = jnp.where(outlier, mem_idx, P).reshape(-1)
    pt_object_id = pt_object_id.at[flat_idx].set(-1, mode="drop")
    pt_obj_votes = pt_obj_votes.at[flat_idx].set(0, mode="drop")
    return pt_object_id, pt_obj_votes


@partial(jax.jit, static_argnames=("cam", "psi", "depth"))
def chunk_iforest_cull(
    cam: Camera,
    m: MapState,
    table: ObjectTable,
    T_cw,             # [3, 4] chunk-final camera pose (for proj_rect refresh)
    since_frame,      # objects with last_frame >= since_frame are culled
    key,
    psi: int = 96,
    depth: int = 7,
):
    """Chunk-rate isolation-forest outlier cull over every object updated
    this chunk (IsolationForestDeleteOutliers, src/Object.cc:1202-1309).

    The reference culls after each frame's DataAssociateUpdate; the chunked
    device tracker batches the cull to once per chunk because the tree
    kernels are ~80x slower inside the scan body than outside it (tiny
    [50, 512] shapes defeat fusion in a TPU while-loop). One cull per chunk
    over all J objects does the same eviction work at 1/B of the per-frame
    cost. The semantic drift: an outlier can survive up to chunk_len-1
    extra frames before eviction. During that window it biases not just the
    running stats (which the next refresh recomputes) but also the
    member-derived gates that feed back into association — the inflated
    r_max loosens the insertion distance gate (dist <= th*r_max) and the
    inflated cub_min/cub_max can trip the 3D-overlap young-object cull —
    so decisions, not only statistics, can diverge from per-frame pacing.
    tests/test_objects_chunked.py::test_iforest_pacing_equivalence bounds
    that divergence on a full sequence (per_frame_iforest=True restores
    the reference pacing exactly)."""
    P = m.pt_pos.shape[0]
    J = table.capacity

    h = ((jnp.arange(P, dtype=jnp.uint32) * jnp.uint32(2654435761)) % 1009).astype(jnp.float32) / 1009.0
    member = (m.pt_object_id[None, :] == jnp.arange(J)[:, None]) & m.pt_valid[None, :]
    sel = jnp.where(member, 1.0 + h[None, :], 0.0)
    top_v, mem_idx = jax.lax.top_k(sel, N_IFOREST_SAMPLE)       # [J, S]
    mem_mask = top_v > 0.0
    mem_pos = m.pt_pos[mem_idx]                                 # [J, S, 3]
    n_members = jnp.sum(member, axis=1)

    keys = jax.random.split(key, J)
    scores = jax.vmap(
        lambda k, p, msk: anomaly_scores(k, p, msk, 50, psi, depth)
    )(keys, mem_pos, mem_mask)                                  # [J, S]

    th_if = jnp.where(table.cls == IFOREST_TV_CLASS, 0.65, 0.6)[:, None]
    skip_cls = jnp.zeros((J,), bool)
    for c in IFOREST_SKIP_CLASSES:
        skip_cls |= table.cls == c
    run_forest = (
        table.valid & ~table.bad & ~skip_cls
        & (table.last_frame >= since_frame) & (n_members >= 30)
    )
    outlier = mem_mask & (scores > th_if) & run_forest[:, None]
    flat_idx = jnp.where(outlier, mem_idx, P).reshape(-1)
    pt_object_id = m.pt_object_id.at[flat_idx].set(-1, mode="drop")
    pt_obj_votes = m.pt_obj_votes.at[flat_idx].set(0, mode="drop")
    m = m._replace(pt_object_id=pt_object_id, pt_obj_votes=pt_obj_votes)

    # refresh member-derived stats on the post-cull membership
    center, std, cub_min, cub_max, r_max, proj_rect, has_mem = member_stats(
        cam, m.pt_pos, m.pt_valid, pt_object_id, table, T_cw, h
    )
    bad = table.bad | (table.valid & ~has_mem)
    table = table._replace(
        center=center, std=std, cub_min=cub_min, cub_max=cub_max,
        r_max=r_max, proj_rect=proj_rect, bad=bad,
    )
    return m, table
