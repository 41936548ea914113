"""Monocular SLAM runtime: host orchestrator over jitted device steps.

Replaces the reference's Tracking + LocalMapping thread pair
(src/Tracking.cc:562-804 state machine, src/LocalMapping.cc:42-117) with a
single-threaded host loop dispatching fixed-shape jitted programs
(SURVEY.md §7.1 "Pipeline"): per frame one-or-two matching+pose programs;
per keyframe triangulation/fusion/windowed-BA programs. All map state lives
in the SoA MapState pytree on device; the host only makes scalar decisions
(state machine, keyframe policy) and allocates slots.

Interleaving is explicit — mapping runs between frames instead of racing
tracking behind a mutex (Map::mMutexMapUpdate, src/Tracking.cc:572) — which
makes the system deterministic for a fixed seed.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import SystemConfig
from eao_slam_tpu.geometry import se3
from eao_slam_tpu.ops.orb import scale_sigma2
from eao_slam_tpu.runtime import tracking_kernels as tk
from eao_slam_tpu.runtime.frame import Frame
from eao_slam_tpu.runtime.local_mapping import (
    fuse_into_keyframe,
    merge_duplicate_points,
    refresh_point_descriptors,
    run_local_ba,
    triangulate_with_neighbor,
)
from eao_slam_tpu.runtime.map_state import MapState, empty_map_state
from eao_slam_tpu.solvers.init2view import initialize_two_view

# --- tracking states (Tracking::eTrackingState, include/Tracking.h)
NO_IMAGES = 0
NOT_INITIALIZED = 1
OK = 2
LOST = 3


def np_compose(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    R = A[:3, :3] @ B[:3, :3]
    t = A[:3, :3] @ B[:3, 3] + A[:3, 3]
    return np.concatenate([R, t[:, None]], axis=1)


def np_inverse(T: np.ndarray) -> np.ndarray:
    Rt = T[:3, :3].T
    return np.concatenate([Rt, (-Rt @ T[:3, 3])[:, None]], axis=1)


@dataclasses.dataclass
class FrameRecord:
    timestamp: float
    T_cw: Optional[np.ndarray]  # None while not tracked
    state: int
    n_inliers: int = 0


class MonoTracker:
    """End-to-end monocular tracker + local mapper (milestone M1 slice)."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.cam = cfg.camera
        cap = cfg.capacity
        self.scale2 = scale_sigma2(cfg.orb.n_levels, cfg.orb.scale_factor)
        self.scale2_np = np.asarray(self.scale2)
        self.scale_factors = np.sqrt(self.scale2_np)
        # tracking-only mode: the map is frozen — no keyframes, no new
        # points, no object updates (System::ActivateLocalizationMode,
        # src/System.cc:254-270 + LocalMapping stop)
        self.localization_only = False
        self._reset_state()

    def _reset_state(self):
        """(Re)initialize everything the reference's Tracking::Reset clears
        (src/Tracking.cc:2345-2393): map, keyframe database, loop closer,
        object landmarks, state machine."""
        cfg = self.cfg
        cap = cfg.capacity
        self.map: MapState = empty_map_state(cap)
        self.state = NO_IMAGES
        self.rng_key = jax.random.PRNGKey(cfg.seed)

        # host mirrors (avoid device pulls on the per-frame path)
        self.kf_slots: List[int] = []          # insertion order
        self.kf_pt_host = np.full((cap.max_keyframes, cap.max_features), -1, np.int32)
        self.kf_valid_host = np.zeros((cap.max_keyframes,), bool)
        self.pt_valid_host = np.zeros((cap.max_points,), bool)
        self.pt_first_kf_host = np.full((cap.max_points,), -1, np.int32)
        self.n_points = 0

        # per-frame transient state
        self.last_frame: Optional[Frame] = None
        self.last_T: Optional[np.ndarray] = None
        self.last_pt: Optional[jnp.ndarray] = None
        self.velocity: Optional[np.ndarray] = None
        self.frames_since_kf = 0
        self.ref_kf_tracked = 0
        self.peak_since_kf = 0   # best inlier count since the last KF — the
        # keyframe trigger baseline (more robust than the insertion-time
        # count, which underestimates right after BA settles)
        self.frame_id = 0

        self.init_ref: Optional[Frame] = None
        self.init_ref_t: float = 0.0
        self.init_gt: Optional[np.ndarray] = None  # [3,4] T_wc of init frame
        self.records: List[FrameRecord] = []

        # --- loop closing (LoopClosing thread equivalent)
        self.loop_closer = None
        if cfg.tracking.enable_loop_closing:
            from eao_slam_tpu.runtime.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(cfg)

        # --- BoW vocabulary + recognition database (DBoW2/KeyFrameDatabase
        # equivalent, ops/bow.py + runtime/keyframe_db.py). A pre-trained
        # vocabulary loads from cfg.vocab_path (the reference's ORBvoc.bin,
        # src/System.cc:79); otherwise a small vocabulary is bootstrap-
        # trained online from the first keyframes' descriptors.
        self.vocab = None
        self.kfdb = None
        if cfg.use_bow and cfg.vocab_path:
            from eao_slam_tpu.ops import bow
            from eao_slam_tpu.runtime.keyframe_db import KeyFrameDatabase

            self.vocab = bow.load_vocabulary(cfg.vocab_path)
            self.kfdb = KeyFrameDatabase(self.vocab, cap.max_keyframes)

        # --- EAO object layer (lazy import keeps the core slice light)
        self.obj_table = None
        self.obj_updater = None
        if cfg.flag.objects_enabled:
            from eao_slam_tpu.objects import ObjectUpdater, empty_object_table

            self.obj_table = empty_object_table(
                cfg.capacity.max_objects, cfg.objects.yaw_samples
            )
            self.obj_updater = ObjectUpdater(cfg)
        self._appear_new_object = False
        self.last_cuboids = None  # CubeSLAM proposals of the latest frame

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def reset(self):
        """Full system reset (Tracking::Reset, src/Tracking.cc:2345-2393):
        clears the map, keyframe database, loop closer and object table and
        returns the state machine to NO_IMAGES. frame_id keeps counting."""
        frame_id = self.frame_id
        self._reset_state()
        self.frame_id = frame_id

    def set_localization_mode(self, on: bool):
        """Tracking-only mode: freeze the map and track against it
        (System::ActivateLocalizationMode, src/System.cc:254-270)."""
        self.localization_only = bool(on)

    def track(self, frame: Frame, timestamp: float,
              gt_pose: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
        """Process one frame; returns the camera-from-world pose [3, 4] or
        None if tracking failed (System::TrackMonocular contract).

        gt_pose: optional [3, 4] camera-in-world GT pose of THIS frame
        (mGroundtruthPose_mat protocol, src/Tracking.cc:506-555). Only the
        initializer reference frame's pose is consumed — it rotates the
        world frame onto the gravity-aligned ground at map creation
        (src/Tracking.cc:1018-1045), which the cuboid/yaw layer requires."""
        self.frame_id += 1
        if self.state in (NO_IMAGES, NOT_INITIALIZED):
            T = self._initialize(frame, timestamp, gt_pose)
        elif self.state == OK:
            T = self._track_frame(frame, timestamp)
        else:  # LOST
            T = self._relocalize(frame, timestamp)
        # early-loss auto-reset: losing track right after initialization
        # means the initial map was bad — rebuild from scratch rather than
        # relocalize against garbage (src/Tracking.cc:771-779)
        if (
            self.state == LOST
            and len(self.kf_slots) <= 5
            and not self.localization_only
        ):
            self.reset()
        self.records.append(
            FrameRecord(timestamp, None if T is None else T.copy(), self.state,
                        self.ref_kf_tracked if T is not None else 0)
        )
        return T

    def keyframe_trajectory(self):
        """(timestamps, T_cw [N, 3, 4]) of surviving keyframes
        (System::SaveKeyFrameTrajectoryTUM, src/System.cc:387-421)."""
        slots = [s for s in self.kf_slots if self.kf_valid_host[s]]
        ts = np.asarray(self.map.kf_timestamp)[slots]
        Ts = np.asarray(self.map.kf_pose)[slots]
        return ts, Ts

    def frame_trajectory(self):
        recs = [r for r in self.records if r.T_cw is not None]
        ts = np.array([r.timestamp for r in recs])
        Ts = np.stack([r.T_cw for r in recs]) if recs else np.zeros((0, 3, 4))
        return ts, Ts

    # ------------------------------------------------------------------
    # initialization (MonocularInitialization, src/Tracking.cc:806-939)
    # ------------------------------------------------------------------

    def _initialize(self, frame: Frame, timestamp: float,
                    gt_pose: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
        n_feats = int(jnp.sum(frame.valid))
        if self.init_ref is None or n_feats < self.cfg.tracking.min_init_matches:
            if n_feats >= self.cfg.tracking.min_init_matches:
                self.init_ref, self.init_ref_t = frame, timestamp
                self.init_gt = gt_pose
                self.state = NOT_INITIALIZED
            return None

        ref = self.init_ref
        idx, d, ok = tk.match_for_init(
            ref.kp, ref.desc, ref.angle, ref.valid,
            frame.kp, frame.desc, frame.angle, frame.valid,
        )
        n_matches = int(jnp.sum(ok))
        if n_matches < self.cfg.tracking.min_init_matches:
            self.init_ref, self.init_ref_t = frame, timestamp
            self.init_gt = gt_pose
            return None

        self.rng_key, sub = jax.random.split(self.rng_key)
        res = initialize_two_view(
            self.cam, ref.kp, frame.kp[idx], ok, sub,
            min_triangulated=self.cfg.tracking.min_init_matches // 2,
        )
        if not bool(res.success):
            return None
        return self._create_initial_map(ref, frame, timestamp, idx, res)

    def _create_initial_map(self, ref: Frame, frame: Frame, timestamp, idx, res):
        """CreateInitialMapMonocular (src/Tracking.cc:941-1069): two KFs,
        triangulated points, GBA, median-depth scale normalization."""
        good = np.asarray(res.point_ok)
        pts = np.asarray(res.points)
        T21 = np.asarray(res.T21)

        depths = pts[good][:, 2]
        med = float(np.median(depths)) if len(depths) else 1.0
        if med <= 0:
            return None
        pts = pts / med
        T21 = np.concatenate([T21[:, :3], T21[:, 3:] / med], axis=1)

        rows = np.nonzero(good)[0]
        n_new = len(rows)
        cap = self.cfg.capacity
        if n_new > cap.max_points:
            rows = rows[: cap.max_points]
            n_new = len(rows)
        slots = np.arange(n_new, dtype=np.int32)

        idx_np = np.asarray(idx)
        T1 = np.asarray(se3.identity())

        # point attributes from the reference view (MapPoint ctor +
        # UpdateNormalAndDepth semantics)
        oct1 = np.asarray(ref.octave)[rows]
        X = pts[rows]
        dist = np.linalg.norm(X, axis=1)
        max_d = dist * self.scale_factors[np.clip(oct1, 0, len(self.scale_factors) - 1)]
        min_d = max_d / self.scale_factors[-1]
        normal = X / np.maximum(dist, 1e-9)[:, None]

        m = self.map
        m = m._replace(
            pt_pos=m.pt_pos.at[slots].set(jnp.asarray(X, jnp.float32)),
            pt_valid=m.pt_valid.at[slots].set(True),
            pt_desc=m.pt_desc.at[slots].set(ref.desc[jnp.asarray(rows)]),
            pt_normal=m.pt_normal.at[slots].set(jnp.asarray(normal, jnp.float32)),
            pt_min_dist=m.pt_min_dist.at[slots].set(jnp.asarray(min_d, jnp.float32)),
            pt_max_dist=m.pt_max_dist.at[slots].set(jnp.asarray(max_d, jnp.float32)),
            pt_first_kf=m.pt_first_kf.at[slots].set(0),
        )
        self.map = m
        self.pt_valid_host[slots] = True
        self.pt_first_kf_host[slots] = 0
        self.n_points = n_new

        F = cap.max_features
        pt1 = np.full((F,), -1, np.int32)
        pt1[rows] = slots
        pt2 = np.full((F,), -1, np.int32)
        pt2[idx_np[rows]] = slots

        self._insert_keyframe(ref, self.init_ref_t, T1, pt1)
        self._insert_keyframe(frame, timestamp, T21, pt2)

        ba = run_local_ba(
            self.cam, self.map, self.kf_slots[-2:], [self.kf_slots[-2]],
            self.scale2_np, self.cfg.capacity.local_ba_points,
        )
        self._apply_ba(ba)

        if self.init_gt is not None:
            self._align_world_to_ground(np.asarray(self.init_gt, np.float64))

        T_final = np.asarray(self.map.kf_pose)[self.kf_slots[-1]]
        self.state = OK
        self.last_frame = frame
        self.last_T = T_final
        self.last_pt = jnp.asarray(
            np.where(self.kf_pt_host[self.kf_slots[-1]] >= 0,
                     self.kf_pt_host[self.kf_slots[-1]], -1)
        )
        self.velocity = None
        self.frames_since_kf = 0
        self.ref_kf_tracked = int((pt2 >= 0).sum())
        return T_final

    def _align_world_to_ground(self, init_to_ground: np.ndarray) -> None:
        """[EAO] Rotate the world frame onto the ground using the initial
        frame's GT pose (src/Tracking.cc:1018-1045): with G = T_wc(init)
        ("InitToGround"), keyframe poses become T_c<-ground = T_c<-init *
        G^-1 and points X_ground = R_G X + t_G. The gravity direction is
        then the world -y axis, which the cuboid yaw/ground-lift layer
        assumes (objects/state.py:yaw_rotation)."""
        G = init_to_ground.astype(np.float32)           # [3, 4] T_wc
        G_inv = np_inverse(G)                           # [3, 4] T_cw
        R_G = jnp.asarray(G[:3, :3])
        t_G = jnp.asarray(G[:3, 3])
        m = self.map
        kf_R = m.kf_pose[..., :3]
        kf_t = m.kf_pose[..., 3]
        Ginv_R = jnp.asarray(G_inv[:3, :3])
        Ginv_t = jnp.asarray(G_inv[:3, 3])
        new_R = jnp.einsum("kab,bc->kac", kf_R, Ginv_R)
        new_t = jnp.einsum("kab,b->ka", kf_R, Ginv_t) + kf_t
        m = m._replace(
            kf_pose=jnp.concatenate([new_R, new_t[..., None]], axis=-1),
            pt_pos=m.pt_pos @ R_G.T + t_G[None, :],
            pt_normal=m.pt_normal @ R_G.T,
        )
        self.map = m

    # ------------------------------------------------------------------
    # per-frame tracking (Tracking::Track, src/Tracking.cc:562-804)
    # ------------------------------------------------------------------

    def _track_frame(self, frame: Frame, timestamp: float) -> Optional[np.ndarray]:
        cfg = self.cfg
        T_pred = (
            np_compose(self.velocity, self.last_T)
            if self.velocity is not None
            else self.last_T
        )

        r = tk.track_motion_model(
            self.cam, self.map.pt_pos, self.map.pt_valid,
            jnp.asarray(T_pred, jnp.float32),
            self.last_frame.kp, self.last_frame.desc, self.last_frame.octave,
            self.last_frame.angle, self.last_frame.valid, self.last_pt,
            frame.kp, frame.desc, frame.octave, frame.angle, frame.valid,
            self.scale2,
            radius=cfg.matcher.search_radius_motion,
        )
        n = int(r.n_inliers)

        if n < cfg.tracking.min_inliers_after_pose:
            # fall back to reference keyframe (TrackReferenceKeyFrame)
            ref_slot = self.kf_slots[-1]
            r = tk.track_reference_kf(
                self.cam, self.map.pt_pos, self.map.pt_valid,
                jnp.asarray(self.last_T, jnp.float32),
                self.map.kf_desc[ref_slot], self.map.kf_kp_valid[ref_slot],
                self.map.kf_pt_idx[ref_slot],
                frame.kp, frame.desc, frame.octave, frame.valid, self.scale2,
            )
            n = int(r.n_inliers)
            if n < cfg.tracking.min_inliers_after_pose:
                self.state = LOST
                return None

        # TrackLocalMap: widen matches against the full map, re-optimize
        r2 = tk.track_local_map_step(
            self.cam,
            self.map.pt_pos, self.map.pt_valid, self.map.pt_desc,
            self.map.pt_normal, self.map.pt_min_dist, self.map.pt_max_dist,
            r.T, r.cur_pt,
            frame.kp, frame.desc, frame.octave, frame.valid,
            self.scale2, n_levels=cfg.orb.n_levels,
        )
        n2 = int(r2.n_inliers)
        if n2 < cfg.tracking.min_tracked_for_ok:
            self.state = LOST
            return None

        T = np.asarray(r2.T)
        self.velocity = np_compose(T, np_inverse(self.last_T))
        self.frames_since_kf += 1
        self.peak_since_kf = max(self.peak_since_kf, n2)

        # --- EAO object pass (TrackWithMotionModel object work,
        # src/Tracking.cc:1246-1647)
        self._appear_new_object = False
        if (self.obj_updater is not None and not self.localization_only
                and bool(jnp.any(frame.box_valid))):
            self.map, self.obj_table, appear_new = self.obj_updater.frame_update(
                self.map, self.obj_table,
                (frame.boxes, frame.box_class, frame.box_score, frame.box_valid),
                T, frame.kp, r2.cur_pt, self.frame_id,
                lines=(frame.lines, frame.line_valid),
            )
            self._appear_new_object = appear_new

        # optional CubeSLAM single-view cuboid proposals (bCubeslam path,
        # src/Tracking.cc:1211-1238 — draw/save only, off by default)
        self.last_cuboids = None
        if (cfg.objects.use_cubeslam and bool(jnp.any(frame.box_valid))
                and frame.lines is not None):
            from eao_slam_tpu.objects.cuboid_proposal import detect_cuboid

            self.last_cuboids = detect_cuboid(
                self.cam, jnp.asarray(T, jnp.float32),
                frame.boxes, frame.box_valid,
                frame.lines, frame.line_valid,
            )

        if not self.localization_only and self._need_new_keyframe(frame, n2):
            cur_pt = np.asarray(r2.cur_pt)
            self._insert_keyframe(frame, timestamp, T, cur_pt,
                                  by_object=self._appear_new_object)
            self._local_mapping()
            T = np.asarray(self.map.kf_pose)[self.kf_slots[-1]]
            self.frames_since_kf = 0
            self.ref_kf_tracked = n2
            self.peak_since_kf = n2
            self.last_pt = jnp.asarray(self.kf_pt_host[self.kf_slots[-1]])
            # velocity across the BA pose correction would be inconsistent;
            # rebase it on the post-BA pose
            self.velocity = None
        else:
            self.last_pt = r2.cur_pt

        self.last_frame = frame
        self.last_T = T
        return T

    def _reloc_candidates(self, frame: Frame, k: int = 5):
        """Candidate keyframes for relocalization
        (DetectRelocalizationCandidates, src/KeyFrameDatabase.cc:198):
        BoW database when a vocabulary exists, signature scoring otherwise,
        falling back to recency."""
        slots = [s for s in self.kf_slots if self.kf_valid_host[s]]
        if self.kfdb is not None and self.vocab is not None and slots:
            from eao_slam_tpu.ops import bow

            word, _ = bow.quantize(self.vocab, frame.desc)
            q = np.asarray(bow.bow_vector(self.vocab, word, frame.valid))
            cands = self.kfdb.detect_reloc_candidates(q, self.covis_matrix())
            if cands:
                return cands[:k]
        if self.loop_closer is None or not slots:
            return list(reversed(self.kf_slots[-k:]))
        from eao_slam_tpu.runtime.loop_closing import kf_signature

        sig = np.asarray(kf_signature(frame.desc, frame.valid))
        scores = self.loop_closer.signatures[slots] @ sig
        order = np.argsort(-scores)[:k]
        return [slots[i] for i in order]

    def _relocalize(self, frame: Frame, timestamp: float) -> Optional[np.ndarray]:
        """Relocalization (Tracking::Relocalization, src/Tracking.cc:2184):
        signature candidates -> brute descriptor match -> EPnP RANSAC ->
        local-map tracking from the recovered pose."""
        from eao_slam_tpu.ops import matching
        from eao_slam_tpu.solvers.pnp import pnp_ransac

        P = self.cfg.capacity.max_points
        for slot in self._reloc_candidates(frame):
            if not self.kf_valid_host[slot]:
                continue
            pt_kf = self.map.kf_pt_idx[slot]
            q_valid = self.map.kf_kp_valid[slot] & (pt_kf >= 0)
            idx, d, ok = matching.search_brute(
                self.map.kf_desc[slot], q_valid,
                frame.desc, frame.valid,
                max_dist=matching.TH_LOW, ratio=0.75,
            )
            if int(jnp.sum(ok)) < 15:
                continue
            Xw = self.map.pt_pos[jnp.clip(pt_kf, 0, P - 1)]
            uv = frame.kp[idx]
            inv_s2 = 1.0 / self.scale2[jnp.clip(frame.octave[idx], 0, 7)]
            self.rng_key, sub = jax.random.split(self.rng_key)
            pnp = pnp_ransac(self.cam, Xw, uv, ok, inv_s2, sub)
            if not bool(pnp.success):
                continue
            # matched features of the frame inherit the keyframe's points
            keep = ok & pnp.inliers
            cur_pt = jnp.full((frame.kp.shape[0],), -1, jnp.int32).at[idx].max(
                jnp.where(keep, pt_kf, -1)
            )
            r = tk.TrackResult(pnp.T, cur_pt, pnp.n_inliers, jnp.sum(ok))
            if int(r.n_inliers) >= self.cfg.tracking.min_inliers_after_pose:
                r2 = tk.track_local_map_step(
                    self.cam,
                    self.map.pt_pos, self.map.pt_valid, self.map.pt_desc,
                    self.map.pt_normal, self.map.pt_min_dist, self.map.pt_max_dist,
                    r.T, r.cur_pt,
                    frame.kp, frame.desc, frame.octave, frame.valid,
                    self.scale2, n_levels=self.cfg.orb.n_levels,
                )
                if int(r2.n_inliers) >= self.cfg.tracking.min_tracked_for_ok:
                    self.state = OK
                    self.last_frame = frame
                    self.last_T = np.asarray(r2.T)
                    self.last_pt = r2.cur_pt
                    self.velocity = None
                    return self.last_T
        return None

    def _need_new_keyframe(self, frame: Frame, n_tracked: int) -> bool:
        """Mono keyframe policy (Tracking::NeedNewKeyFrame,
        src/Tracking.cc:1777-1900; the object-driven path 2 arrives with the
        EAO layer)."""
        cfg = self.cfg.tracking
        if len(self.kf_slots) == 0:
            return False
        c1 = self.frames_since_kf >= cfg.max_frames_between_kf
        base = max(self.ref_kf_tracked, self.peak_since_kf, 1)
        c2 = n_tracked < cfg.kf_tracked_ratio * base
        # path 2: a new object landmark forces a keyframe
        # (Frame::AppearNewObject, src/Tracking.cc:1850-1897)
        c3 = self._appear_new_object
        return (c1 or c2 or c3) and n_tracked > cfg.min_matches_ref_kf

    # ------------------------------------------------------------------
    # keyframe insertion + local mapping
    # ------------------------------------------------------------------

    def _free_kf_slot(self) -> int:
        free = np.nonzero(~self.kf_valid_host)[0]
        if len(free) == 0:
            raise RuntimeError("keyframe capacity exhausted")
        return int(free[0])

    def _insert_keyframe(self, frame: Frame, timestamp: float, T: np.ndarray,
                         cur_pt: np.ndarray, by_object: bool = False) -> int:
        slot = self._free_kf_slot()
        m = self.map
        s = slot
        m = m._replace(
            kf_pose=m.kf_pose.at[s].set(jnp.asarray(T, jnp.float32)),
            kf_valid=m.kf_valid.at[s].set(True),
            kf_timestamp=m.kf_timestamp.at[s].set(float(timestamp)),
            kf_frame_id=m.kf_frame_id.at[s].set(self.frame_id),
            kf_kp=m.kf_kp.at[s].set(frame.kp),
            kf_desc=m.kf_desc.at[s].set(frame.desc),
            kf_octave=m.kf_octave.at[s].set(frame.octave),
            kf_angle=m.kf_angle.at[s].set(frame.angle),
            kf_kp_valid=m.kf_kp_valid.at[s].set(frame.valid),
            kf_pt_idx=m.kf_pt_idx.at[s].set(jnp.asarray(cur_pt, jnp.int32)),
            kf_by_object=m.kf_by_object.at[s].set(by_object),
        )
        self.map = m
        self.kf_valid_host[slot] = True
        self.kf_pt_host[slot] = np.asarray(cur_pt)
        self.kf_slots.append(slot)
        self._bow_on_keyframe(slot)
        return slot

    # ------------------------------------------------------------------
    # BoW bookkeeping (Frame::ComputeBoW + KeyFrameDatabase::add)
    # ------------------------------------------------------------------

    def _bow_on_keyframe(self, slot: int) -> None:
        cfg = self.cfg
        if not cfg.use_bow:
            return
        from eao_slam_tpu.ops import bow
        from eao_slam_tpu.runtime.keyframe_db import KeyFrameDatabase

        if self.vocab is None:
            # online bootstrap: train once enough keyframes exist, then
            # backfill the database for all existing keyframes
            if cfg.vocab_path is not None or len(self.kf_slots) < cfg.bow_bootstrap_kfs:
                return
            slots = [s for s in self.kf_slots if self.kf_valid_host[s]]
            desc = np.asarray(self.map.kf_desc[jnp.asarray(slots)])
            mask = np.asarray(self.map.kf_kp_valid[jnp.asarray(slots)])
            train = desc[mask]
            self.vocab = bow.build_vocabulary(train, k=10, depth=3,
                                              seed=cfg.seed)
            self.kfdb = KeyFrameDatabase(self.vocab, cfg.capacity.max_keyframes)
            for s in slots:
                self._bow_add(s)
            return
        self._bow_add(slot)

    def _bow_add(self, slot: int) -> None:
        from eao_slam_tpu.ops import bow

        word, _node = bow.quantize(self.vocab, self.map.kf_desc[slot])
        vec = bow.bow_vector(self.vocab, word, self.map.kf_kp_valid[slot])
        self.kfdb.add(slot, np.asarray(vec))

    def covis_matrix(self) -> np.ndarray:
        """[K, K] covisibility weights (KeyFrame::GetBestCovisibilityKeyFrames
        graph) — ONE device incidence matmul over the observation table
        (runtime/compaction.py:make_covis) instead of the round-2 host-side
        O(K*P) numpy materialization."""
        if not hasattr(self, "_covis_fn"):
            from eao_slam_tpu.runtime.compaction import make_covis

            self._covis_fn = make_covis(self.cfg.capacity.max_points)
        return np.asarray(self._covis_fn(
            self.map.kf_pt_idx, self.map.kf_kp_valid, self.map.kf_valid
        )).astype(np.int64)

    def _covisible_neighbors(self, slot: int, k: int, min_weight: int = 10):
        """Top-k covisible keyframes by shared map points (host mirror of
        KeyFrame::UpdateConnections) — one row of the device covis matmul."""
        row = self.covis_matrix()[slot]
        order = np.argsort(-row, kind="stable")
        out = []
        for s in order:
            if row[s] < min_weight:
                break
            if s != slot and self.kf_valid_host[s]:
                out.append(int(s))
            if len(out) >= k:
                break
        return out

    def _local_mapping(self):
        """Per-keyframe mapping pass: triangulate new points with covisible
        neighbors, fuse, windowed BA, light point culling."""
        cfg = self.cfg
        slot = self.kf_slots[-1]
        neighbors = self._covisible_neighbors(
            slot, cfg.mapping.triangulation_neighbors, cfg.mapping.min_covis_weight
        )
        for nb in neighbors:
            self._triangulate_new_points(slot, nb)

        # fuse existing map points into the new KF's unmatched features,
        # and the other direction too — the reference's SearchInNeighbors
        # fuses BOTH ways (src/LocalMapping.cc:459-539)
        for s in [slot] + list(neighbors[:2]):
            fused = fuse_into_keyframe(
                self.cam,
                self.map.pt_pos, self.map.pt_valid, self.map.pt_desc,
                self.map.pt_min_dist, self.map.pt_max_dist,
                self.map.kf_pose[s],
                self.map.kf_kp[s], self.map.kf_desc[s],
                self.map.kf_octave[s], self.map.kf_kp_valid[s],
                self.map.kf_pt_idx[s],
                self.scale2,
            )
            self.map = self.map._replace(
                kf_pt_idx=self.map.kf_pt_idx.at[s].set(fused)
            )
            self.kf_pt_host[s] = np.asarray(fused)

        # duplicate-point merge (ORBmatcher::Fuse conflict branch +
        # MapPoint::Replace): points landing on already-bound features of
        # the new keyframe absorb / get absorbed by the holder
        new_kf_pt, new_pt_valid = merge_duplicate_points(
            self.cam,
            self.map.pt_pos, self.map.pt_valid, self.map.pt_desc,
            self.map.pt_min_dist, self.map.pt_max_dist,
            self.map.kf_pt_idx,
            self.map.kf_pose[slot],
            self.map.kf_kp[slot], self.map.kf_desc[slot],
            self.map.kf_octave[slot], self.map.kf_kp_valid[slot],
            self.map.kf_pt_idx[slot],
            self.scale2,
        )
        self.map = self.map._replace(kf_pt_idx=new_kf_pt, pt_valid=new_pt_valid)
        kf_pt_np = np.asarray(new_kf_pt)
        for s in self.kf_slots:
            self.kf_pt_host[s] = kf_pt_np[s]
        self.pt_valid_host &= np.asarray(new_pt_valid)

        # windowed BA over the most recent keyframes
        W = min(len(self.kf_slots), cfg.mapping.local_ba_kf_window)
        window = self.kf_slots[-W:]
        fixed = [window[0]]
        if self.kf_slots[0] in window:
            fixed.append(self.kf_slots[0])
        ba = run_local_ba(
            self.cam, self.map, window, fixed, self.scale2_np,
            cfg.capacity.local_ba_points,
        )
        self._apply_ba(ba)
        self._cull_points()

        # distinctive-descriptor refresh over the window
        # (MapPoint::ComputeDistinctiveDescriptors after fusion)
        Wpad = cfg.mapping.local_ba_kf_window
        win = np.full((Wpad,), 0, np.int32)
        win[: len(window)] = window
        wv = np.zeros((Wpad,), bool)
        wv[: len(window)] = True
        self.map = self.map._replace(
            pt_desc=refresh_point_descriptors(
                self.map.kf_pt_idx, self.map.kf_desc, self.map.kf_kp_valid,
                self.map.pt_desc, jnp.asarray(win), jnp.asarray(wv),
                n_win=Wpad,
            )
        )

        # EAO keyframe-rate object pass: merge potential associations and
        # resolve 3D-overlapping cuboids (src/LocalMapping.cc:799-882)
        if self.obj_updater is not None:
            from eao_slam_tpu.objects.merge import run_merge_pass

            self.map, self.obj_table = run_merge_pass(self.map, self.obj_table)

        self._cull_keyframes(window)

        # loop detection + closure (LoopClosing::Run per-keyframe work)
        if self.loop_closer is not None:
            self.loop_closer.on_keyframe(self, slot)

    def _cull_keyframes(self, window):
        """KeyFrameCulling (src/LocalMapping.cc:637-707): a local keyframe
        whose tracked points are >=90% observed by >=3 other keyframes at a
        similar-or-finer scale is redundant. Object-created keyframes are
        exempt (src/LocalMapping.cc:651-652)."""
        if len(self.kf_slots) < 5:
            return
        ratio = self.cfg.mapping.kf_cull_redundancy
        P = self.cfg.capacity.max_points
        by_obj = np.asarray(self.map.kf_by_object)
        oct_host = np.asarray(self.map.kf_octave)

        # observation count + best (finest) octave per point across KFs
        obs_count = np.zeros((P,), np.int32)
        best_oct = np.full((P,), 99, np.int32)
        for s in self.kf_slots:
            if not self.kf_valid_host[s]:
                continue
            pts = self.kf_pt_host[s]
            sel = pts >= 0
            obs_count[pts[sel]] += 1
            np.minimum.at(best_oct, pts[sel], oct_host[s][sel])

        # candidates: interior of the window (never the newest, the first
        # two, or object keyframes)
        protected = set(self.kf_slots[:2]) | {self.kf_slots[-1]}
        for s in list(window[:-1]):
            if s in protected or not self.kf_valid_host[s] or by_obj[s]:
                continue
            pts = self.kf_pt_host[s]
            sel = pts >= 0
            ids = pts[sel]
            if len(ids) < 10:
                continue
            # redundant: seen by >=3 others (4 total) at <= our octave + 1
            redundant = (obs_count[ids] >= 4) & (
                best_oct[ids] <= oct_host[s][sel] + 1
            )
            if redundant.mean() > ratio:
                # erase the keyframe: observations removed, slot freed
                obs_count[ids] -= 1
                self.kf_valid_host[s] = False
                self.kf_pt_host[s] = -1
                self.map = self.map._replace(
                    kf_valid=self.map.kf_valid.at[s].set(False),
                    kf_pt_idx=self.map.kf_pt_idx.at[s].set(-1),
                )
                self.kf_slots.remove(s)
                if self.kfdb is not None:
                    self.kfdb.erase(s)

    def _triangulate_new_points(self, slot: int, nb: int):
        tri = triangulate_with_neighbor(
            self.cam,
            self.map.kf_pose[slot],
            self.map.kf_kp[slot], self.map.kf_desc[slot], self.map.kf_octave[slot],
            self.map.kf_kp_valid[slot], self.map.kf_pt_idx[slot],
            self.map.kf_pose[nb],
            self.map.kf_kp[nb], self.map.kf_desc[nb], self.map.kf_octave[nb],
            self.map.kf_kp_valid[nb], self.map.kf_pt_idx[nb],
            self.scale2,
        )
        good = np.asarray(tri.good)
        rows = np.nonzero(good)[0]
        if len(rows) == 0:
            return
        free = np.nonzero(~self.pt_valid_host)[0]
        n_new = min(len(rows), len(free))
        rows = rows[:n_new]
        slots = free[:n_new].astype(np.int32)

        X = np.asarray(tri.points)[rows]
        idx2 = np.asarray(tri.idx2)[rows]
        oct1 = np.asarray(self.map.kf_octave[slot])[rows]
        T1 = np.asarray(self.map.kf_pose[slot])
        O1 = -T1[:3, :3].T @ T1[:3, 3]
        dist = np.linalg.norm(X - O1[None, :], axis=1)
        max_d = dist * self.scale_factors[np.clip(oct1, 0, len(self.scale_factors) - 1)]
        min_d = max_d / self.scale_factors[-1]
        normal = (X - O1[None, :]) / np.maximum(dist, 1e-9)[:, None]

        m = self.map
        js = jnp.asarray(slots)
        m = m._replace(
            pt_pos=m.pt_pos.at[js].set(jnp.asarray(X, jnp.float32)),
            pt_valid=m.pt_valid.at[js].set(True),
            pt_desc=m.pt_desc.at[js].set(m.kf_desc[slot][jnp.asarray(rows)]),
            pt_normal=m.pt_normal.at[js].set(jnp.asarray(normal, jnp.float32)),
            pt_min_dist=m.pt_min_dist.at[js].set(jnp.asarray(min_d, jnp.float32)),
            pt_max_dist=m.pt_max_dist.at[js].set(jnp.asarray(max_d, jnp.float32)),
            pt_first_kf=m.pt_first_kf.at[js].set(slot),
            kf_pt_idx=m.kf_pt_idx.at[slot, jnp.asarray(rows)].set(js)
            .at[nb, jnp.asarray(idx2)].set(js),
        )
        self.map = m
        self.pt_valid_host[slots] = True
        self.pt_first_kf_host[slots] = slot
        self.kf_pt_host[slot, rows] = slots
        self.kf_pt_host[nb, idx2] = slots
        self.n_points += n_new

    def _apply_ba(self, ba):
        m = self.map
        ws = jnp.asarray(ba.kf_slots)
        m = m._replace(kf_pose=m.kf_pose.at[ws].set(jnp.asarray(ba.poses)))
        keep = ba.pt_slots >= 0
        ps = jnp.asarray(ba.pt_slots[keep])
        m = m._replace(pt_pos=m.pt_pos.at[ps].set(jnp.asarray(ba.points[keep])))
        # drop outlier observations (the reference erases the edge's
        # observation pair after the second LocalBA pass)
        drop = ba.drop_obs
        if drop.any():
            new_pt = self.kf_pt_host[ba.kf_slots]
            new_pt[drop] = -1
            self.kf_pt_host[ba.kf_slots] = new_pt
            m = m._replace(kf_pt_idx=m.kf_pt_idx.at[ws].set(jnp.asarray(new_pt)))
        self.map = m

    def _cull_points(self):
        """Light MapPointCulling (src/LocalMapping.cc:175): drop points whose
        observations fell below 2 keyframes after their creation window."""
        obs = np.zeros((self.cfg.capacity.max_points,), np.int32)
        valid_rows = self.kf_pt_host[self.kf_valid_host]
        flat = valid_rows[valid_rows >= 0]
        np.add.at(obs, flat, 1)
        recent_kf = self.kf_slots[-1] if self.kf_slots else 0
        stale = (
            self.pt_valid_host
            & (obs < 2)
            & (self.pt_first_kf_host != recent_kf)
        )
        if stale.any():
            idx = np.nonzero(stale)[0]
            self.map = self.map._replace(
                pt_valid=self.map.pt_valid.at[jnp.asarray(idx)].set(False)
            )
            self.pt_valid_host[idx] = False
