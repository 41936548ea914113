"""System facade: the public entry point of the framework.

Mirror of ORB_SLAM2::System (src/System.cc:41-154): constructs the full
pipeline for a config/ablation flag, accepts monocular frames, and exports
trajectories, object maps and semi-dense clouds on shutdown.

The production engine is the device-resident ChunkedTracker
(runtime/scan_tracker.py): frames accumulate host-side into fixed-size
chunks and one jitted program per chunk runs ORB extraction, line
detection (in line-enabled modes), tracking, keyframe insertion, windowed
BA and the EAO object cascade — one device round trip per chunk, with
object merging, map maintenance, loop closing and relocalization between
chunks. This is the same program the benchmark times; facade and bench
front one engine, like the reference's System fronts its whole thread
pool. The reference's five threads are explicit pipeline stages of that
chunk program (SURVEY.md §7.1); the semi-dense + line + mesh pass runs
offline at shutdown exactly like the reference's ProbabilityMapping
thread does (src/ProbabilityMapping.cc:204-300).

`chunked=False` selects the interactive per-frame MonoTracker (host
decision per frame — the debugging/inspection path).
"""

from __future__ import annotations

import json
import time
from typing import Optional

import numpy as np

from eao_slam_tpu.config import DemoFlag, SystemConfig, tum3_config
from eao_slam_tpu.io.trajectory import save_tum
from eao_slam_tpu.runtime.frame import Frame, frame_from_image
from eao_slam_tpu.runtime.scan_tracker import ChunkedTracker, batch_from_frames
from eao_slam_tpu.runtime.tracker import MonoTracker

OK = 2


class System:
    """Monocular object-SLAM engine (System::System + TrackMonocular)."""

    def __init__(self, config: Optional[SystemConfig] = None,
                 flag: DemoFlag | str = DemoFlag.NONE,
                 chunked: bool = True, chunk: int = 32, mesh=None):
        """mesh: optional jax.sharding.Mesh (or the string "auto" to build
        one over every visible device). With >1 device the engine itself
        goes mesh-parallel: chunk extraction shards over the frame axis and
        the loop-correction global BA dispatches the distributed
        dense-clique Schur solver (runtime/scan_tracker.py:ba_solver)."""
        self.cfg = config if config is not None else tum3_config(flag)
        self.chunked = chunked
        if mesh == "auto":
            import jax

            from eao_slam_tpu.parallel.frames import make_frame_mesh

            devs = jax.devices()
            mesh = make_frame_mesh(devs) if len(devs) > 1 else None
        if chunked:
            self.tracker = ChunkedTracker(self.cfg, chunk=chunk, mesh=mesh)
            self.tracker.compaction_listeners.append(self._on_compaction)
        else:
            self.tracker = MonoTracker(self.cfg)
        self.timings: list = []
        # structured stage timing (SURVEY.md §5 observability equivalent)
        from eao_slam_tpu.utils.profiling import StageProfiler

        self.profiler = StageProfiler()
        # retained keyframe images for the offline semi-dense pass,
        # keyed by keyframe slot (remapped through compactions)
        self._kf_images: dict = {}
        self._groundtruth = None  # io.tum.GroundTruth for ground alignment
        self._semidense_result = None
        self._semidense_slots: list = []
        self._lines3d = None
        self._mesh_tris = None
        # chunk accumulation buffers (image path and feature path are
        # mutually exclusive — pick one per System instance)
        self._img_buf: list = []   # (img u8, ts, boxes-tuple or None)
        self._frame_buf: list = []  # (Frame, ts, img or None)

    # ------------------------------------------------------------------

    @property
    def _armed(self) -> bool:
        return self.chunked and self.tracker.carry is not None

    def track_monocular(self, img: np.ndarray, timestamp: float,
                        boxes=None) -> Optional[np.ndarray]:
        """Feed one grayscale image [H, W] (uint8/float). boxes: optional
        (boxes [B,4], cls [B], score [B], valid [B]) in the offline-YOLO
        contract (src/Tracking.cc:426-499). Returns T_cw [3,4], or None in
        chunked mode while the frame sits in the accumulation buffer (its
        pose lands in frame_trajectory when the chunk dispatches)."""
        t0 = time.perf_counter()
        T = None
        if self._armed:
            assert not self._frame_buf, "mixed track_frame/track_monocular"
            self._img_buf.append(
                (np.asarray(img, np.uint8), float(timestamp), boxes))
            if len(self._img_buf) >= self.tracker.chunk:
                T = self._flush_images()
        else:
            kw = {}
            if boxes is not None:
                b, c, s, v = boxes
                kw = dict(boxes=b, box_class=c, box_score=s, box_valid=v)
            frame = frame_from_image(
                self.cfg, np.asarray(img, np.float32), **kw
            )
            T = self.track_frame(frame, timestamp, img=img)
        self.timings.append(time.perf_counter() - t0)
        return T

    def set_groundtruth(self, gt_or_path) -> None:
        """Arm the GT-pose protocol (src/Tracking.cc:197-241): per-frame GT
        lookup by timestamp; only the initializer frame's pose is consumed,
        to rotate the world onto the ground (src/Tracking.cc:1018-1045)."""
        from eao_slam_tpu.io.tum import GroundTruth, load_groundtruth

        if isinstance(gt_or_path, str):
            gt_or_path = load_groundtruth(gt_or_path)
        assert isinstance(gt_or_path, GroundTruth)
        self._groundtruth = gt_or_path

    def track_frame(self, frame: Frame, timestamp: float,
                    img: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
        """Feed a pre-extracted Frame (the feature-level injection seam)."""
        if self._armed:
            assert not self._img_buf, "mixed track_frame/track_monocular"
            self._frame_buf.append((frame, float(timestamp), img))
            if len(self._frame_buf) >= self.tracker.chunk:
                return self._flush_frames()
            return None

        gt_pose = None
        if self._groundtruth is not None:
            from eao_slam_tpu.io.tum import lookup_pose_matrix

            gt_pose = lookup_pose_matrix(self._groundtruth, timestamp)

        if self.chunked:
            inner = self.tracker.inner
            n_kf_before = len(inner.kf_slots)
            self.tracker.bootstrap(frame, timestamp, gt_pose=gt_pose)
            T = inner.last_T if inner.state == OK else None
            if (img is not None and self.cfg.flag.semidense_enabled
                    and len(inner.kf_slots) > n_kf_before):
                self._kf_images[inner.kf_slots[-1]] = np.asarray(
                    img, np.float32)
            return None if T is None else np.asarray(T)

        n_kf_before = len(self.tracker.kf_slots)
        T = self.tracker.track(frame, timestamp, gt_pose=gt_pose)
        if (
            img is not None
            and self.cfg.flag.semidense_enabled
            and len(self.tracker.kf_slots) > n_kf_before
        ):
            self._kf_images[self.tracker.kf_slots[-1]] = np.asarray(img, np.float32)
        return T

    # ------------------------------------------------------------------
    # chunk buffering
    # ------------------------------------------------------------------

    def _flush_images(self) -> Optional[np.ndarray]:
        """Dispatch the buffered image chunk through the fused
        extract+track program (one device round trip)."""
        buf, self._img_buf = self._img_buf, []
        if not buf:
            return None
        imgs = np.stack([b[0] for b in buf])
        ts = np.asarray([b[1] for b in buf], np.float32)
        kw = {}
        if self.cfg.flag.objects_enabled and any(
                b[2] is not None for b in buf):
            B = self.cfg.capacity.max_boxes
            zero = (np.zeros((B, 4), np.float32), np.full((B,), -1, np.int32),
                    np.zeros((B,), np.float32), np.zeros((B,), bool))
            bx = [b[2] if b[2] is not None else zero for b in buf]
            kw = dict(boxes=np.stack([np.asarray(b[0]) for b in bx]),
                      box_class=np.stack([np.asarray(b[1]) for b in bx]),
                      box_score=np.stack([np.asarray(b[2]) for b in bx]),
                      box_valid=np.stack([np.asarray(b[3]) for b in bx]))
        outs = self.tracker.track_images(imgs, ts, **kw)
        self._retain_kf_images([b[0].astype(np.float32) for b in buf])
        T = np.asarray(outs.T[len(buf) - 1])
        return T if int(outs.state[len(buf) - 1]) == OK else None

    def _flush_frames(self) -> Optional[np.ndarray]:
        """Dispatch the buffered pre-extracted-Frame chunk (padding short
        tails via the batch's active mask)."""
        buf, self._frame_buf = self._frame_buf, []
        if not buf:
            return None
        C = self.tracker.chunk
        n = len(buf)
        frames = [b[0] for b in buf] + [buf[-1][0]] * (C - n)
        ts = [b[1] for b in buf] + [buf[-1][1]] * (C - n)
        batch = batch_from_frames(
            frames, ts, with_boxes=self.cfg.flag.objects_enabled)
        if n < C:
            import jax.numpy as jnp

            act = np.zeros((C,), bool)
            act[:n] = True
            batch = batch._replace(active=jnp.asarray(act))
        outs = self.tracker.track_batch(batch)
        imgs = [None if b[2] is None else np.asarray(b[2], np.float32)
                for b in buf]
        self._retain_kf_images(imgs)
        T = np.asarray(outs.T[n - 1])
        return T if int(outs.state[n - 1]) == OK else None

    def _retain_kf_images(self, chunk_imgs: list) -> None:
        if not self.cfg.flag.semidense_enabled:
            return
        for i, slot in self.tracker.last_kf_slots:
            if i < len(chunk_imgs) and chunk_imgs[i] is not None:
                self._kf_images[slot] = chunk_imgs[i]

    def _on_compaction(self, kf_remap: np.ndarray, pt_remap: np.ndarray):
        """Keyframe slots were compacted: re-key the retained images."""
        self._kf_images = {
            int(kf_remap[s]): img for s, img in self._kf_images.items()
            if 0 <= s < len(kf_remap) and kf_remap[s] >= 0
        }

    def flush(self) -> None:
        """Force-dispatch any partially filled chunk buffer."""
        if self._img_buf:
            self._flush_images()
        if self._frame_buf:
            self._flush_frames()

    def current_pose(self, extrapolate: bool = True):
        """Latest pose estimate NOW, without waiting for a chunk boundary.

        The reference returns a pose every frame (src/System.cc:246); the
        chunked engine emits poses when a chunk dispatches, so an online
        consumer polling mid-buffer gets the newest tracked pose — by
        default extrapolated through the engine's constant-velocity motion
        model for the frames still sitting in the accumulation buffer
        (exactly the prediction the chunk program itself will start from).
        Returns (timestamp, T_cw [3,4]) or None before initialization."""
        tr = self.tracker
        if not self.chunked:   # per-frame path already returns every pose
            T = getattr(tr, "last_T", None)
            return None if T is None else (None, np.asarray(T))
        # newest tracked record, scanning backwards (records grow one
        # entry per frame — a forward filter would make per-frame polling
        # quadratic over the run)
        t_last = T_last = None
        for t, T, s in reversed(tr.records):
            if T is not None:
                t_last, T_last = t, T
                break
        if T_last is None:
            return None
        n_buf = len(self._img_buf) + len(self._frame_buf)
        if (not extrapolate or n_buf == 0 or not tr.armed
                or tr.state != OK):
            return t_last, np.asarray(T_last)
        from eao_slam_tpu.geometry import se3

        vel = np.asarray(tr.carry.velocity)
        T = np.asarray(tr.carry.T_last)
        for _ in range(n_buf):
            T = np.asarray(se3.compose(vel, T))
        buf = self._img_buf or self._frame_buf
        return float(buf[-1][1]), T

    # ------------------------------------------------------------------
    # mode switches (System::TrackMonocular preamble, src/System.cc:254-286)
    # ------------------------------------------------------------------

    def reset(self):
        """Clear the map and restart tracking from scratch (the viewer's
        Reset button / System::Reset, src/System.cc:283-286)."""
        self.tracker.reset()
        self._img_buf = []
        self._frame_buf = []
        self._kf_images.clear()
        self._semidense_result = None
        self._semidense_slots = []
        self._lines3d = None
        self._mesh_tris = None

    def activate_localization_mode(self):
        """Tracking-only: freeze the map, keep localizing against it
        (System::ActivateLocalizationMode, src/System.cc:254-270)."""
        self.flush()
        self.tracker.set_localization_mode(True)

    def deactivate_localization_mode(self):
        self.flush()
        self.tracker.set_localization_mode(False)

    # ------------------------------------------------------------------
    # checkpoint / resume (SURVEY.md §5: real persistence where the
    # reference has only TODO stubs, include/System.h:115-117)
    # ------------------------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        """Serialize the production engine mid-sequence: the full device
        ChunkCarry (map, objects, motion model, allocators), trajectory
        records, loop-closer state, and the retained keyframe images for
        the offline semi-dense phase. Pending chunk buffers flush first."""
        assert self.chunked, "checkpointing covers the chunked engine"
        self.flush()
        from eao_slam_tpu.runtime.checkpoint import save_chunked_checkpoint

        save_chunked_checkpoint(path, self.tracker, kf_images=self._kf_images)

    def load_checkpoint(self, path: str) -> dict:
        """Restore a checkpoint into this System (same config capacities).
        Tracking resumes exactly where the save left off — state, motion
        model and last-frame block included."""
        assert self.chunked, "checkpointing covers the chunked engine"
        from eao_slam_tpu.runtime.checkpoint import load_chunked_checkpoint

        meta, kf_images = load_chunked_checkpoint(path, self.tracker)
        self._kf_images = kf_images
        self._img_buf = []
        self._frame_buf = []
        return meta

    # ------------------------------------------------------------------

    def shutdown(self, semidense: bool = True):
        """Offline phase (the ProbabilityMapping thread's run-after-tracking
        behavior): flush pending chunks, then semi-dense depth, 3D line
        segments, surface mesh."""
        self.flush()
        if semidense and self.cfg.flag.semidense_enabled and len(self._kf_images) >= 4:
            self._semidense_result = self._run_semidense()
            if self._semidense_result is not None:
                self._run_lines3d()
                self._run_mesh()
        return self._semidense_result

    def _run_lines3d(self):
        """Per-KF 3D line fitting + multi-view clustering (LineDetector +
        the Line3D++ offline pass)."""
        import jax.numpy as jnp

        from eao_slam_tpu.dense.lines3d import cluster_world_segments, fit_3d_segments
        from eao_slam_tpu.ops.lines import detect_segments

        tr = self.tracker
        res = self._semidense_result
        slots = self._semidense_slots
        cam = self.cfg.camera
        all_segs, all_valid = [], []
        for i, s in enumerate(slots):
            img = jnp.asarray(self._kf_images[s])
            segs2d, sv = detect_segments(img)
            s3 = fit_3d_segments(
                cam, segs2d, sv, res.pixels[i], res.inv_depth[i], res.valid[i],
                jnp.asarray(np.asarray(tr.map.kf_pose)[s]),
                height=cam.height, width=cam.width,
            )
            all_segs.append(np.asarray(s3.seg))
            all_valid.append(np.asarray(s3.valid))
        seg = np.concatenate(all_segs)
        val = np.concatenate(all_valid)
        self._lines3d = cluster_world_segments(seg, val, min_views=2)
        return self._lines3d

    def _run_mesh(self):
        from eao_slam_tpu.dense.mesh import extract_mesh

        tr = self.tracker
        poses = np.asarray(tr.map.kf_pose)[self._semidense_slots]
        cam = self.cfg.camera
        self._mesh_tris, _ = extract_mesh(
            cam, self._semidense_result, poses, cam.height, cam.width
        )
        return self._mesh_tris

    def _run_semidense(self):
        from eao_slam_tpu.dense import semidense_reconstruct

        tr = self.tracker
        kf_valid = tr.kf_valid_host
        slots = [s for s in tr.kf_slots if s in self._kf_images
                 and kf_valid[s]]
        if len(slots) < 4:
            return None
        self._semidense_slots = slots
        imgs = np.stack([self._kf_images[s] for s in slots])
        poses = np.asarray(tr.map.kf_pose)[slots]
        kf_pt = tr.kf_pt_host

        # depth prior per KF from its tracked map points (mean ± 2 sigma,
        # StereoSearchConstraints src/ProbabilityMapping.cc:734-747)
        pts = np.asarray(tr.map.pt_pos)
        ranges = []
        for i, s in enumerate(slots):
            ids = kf_pt[s]
            X = pts[ids[ids >= 0]]
            z = X @ poses[i][:3, :3][2] + poses[i][2, 3]
            z = z[z > 0.05]
            if len(z) < 5:
                ranges.append((0.3, 10.0))
            else:
                mu, sd = float(z.mean()), float(z.std())
                ranges.append((max(mu - 2 * sd, 0.1), mu + 2 * sd))
        neighbors = self._semidense_neighbors(slots)
        return semidense_reconstruct(
            self.cfg.camera, imgs, poses, np.asarray(ranges, np.float32),
            neighbors,
        )

    def _semidense_neighbors(self, slots: list) -> list:
        """Top-covisible neighbor selection for the depth sweep: each
        keyframe sweeps against its 7 best-covisible peers (covisN=7,
        include/ProbabilityMapping.h:45, used at
        src/ProbabilityMapping.cc:447-489) via the device covisibility
        matmul — a temporal window misses the highest-parallax revisit
        neighbors on loopy trajectories. Falls back to the ±3 temporal
        window when covisibility is degenerate."""
        from eao_slam_tpu.runtime.compaction import make_covis

        tr = self.tracker
        m = tr.map
        covis = np.asarray(make_covis(int(m.pt_pos.shape[0]))(
            m.kf_pt_idx, m.kf_kp_valid, m.kf_valid))
        idx_of = {s: i for i, s in enumerate(slots)}
        neighbors = []
        for i, s in enumerate(slots):
            w = covis[s]
            order = np.argsort(-w)
            nb = [idx_of[int(t)] for t in order
                  if int(t) in idx_of and int(t) != s and w[t] >= 5][:7]
            if len(nb) < 2:  # degenerate covisibility: temporal fallback
                nb = [j for j in range(max(0, i - 3), min(len(slots), i + 4))
                      if j != i][:6]
            neighbors.append(nb)
        return neighbors

    # ------------------------------------------------------------------
    # exports (System::SaveKeyFrameTrajectoryTUM and friends)
    # ------------------------------------------------------------------

    def save_keyframe_trajectory_tum(self, path: str) -> int:
        self.flush()
        ts, Ts = self.tracker.keyframe_trajectory()
        return save_tum(path, ts, Ts)

    def save_frame_trajectory_tum(self, path: str) -> int:
        self.flush()
        ts, Ts = self.tracker.frame_trajectory()
        return save_tum(path, ts, Ts)

    def save_objects_json(self, path: str) -> int:
        """Cuboid landmark export: class, center, size, yaw, confidence —
        the headless replacement for MapDrawer's cuboid/quadric rendering
        (src/MapDrawer.cc:419-703)."""
        self.flush()
        t = self.tracker.obj_table
        if t is None:
            with open(path, "w") as f:
                json.dump([], f)
            return 0
        valid = np.asarray(t.valid) & ~np.asarray(t.bad)
        out = []
        for j in np.nonzero(valid)[0]:
            out.append({
                "id": int(j),
                "class": int(np.asarray(t.cls)[j]),
                "center": np.asarray(t.center)[j].tolist(),
                "size": (np.asarray(t.cub_max)[j] - np.asarray(t.cub_min)[j]).tolist(),
                "yaw": float(np.asarray(t.yaw)[j]),
                "n_obs": int(np.asarray(t.n_obs)[j]),
            })
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        return len(out)

    def save_semidense_obj(self, path: str) -> int:
        from eao_slam_tpu.dense.semidense import save_obj

        if self._semidense_result is None:
            return 0
        return save_obj(path, self._semidense_result)

    def save_lines_obj(self, path: str) -> int:
        from eao_slam_tpu.dense.lines3d import save_lines_obj

        if self._lines3d is None or len(self._lines3d) == 0:
            return 0
        return save_lines_obj(path, self._lines3d)

    def save_mesh_obj(self, path: str) -> int:
        from eao_slam_tpu.dense.mesh import save_mesh_obj

        if self._mesh_tris is None or len(self._mesh_tris) == 0:
            return 0
        return save_mesh_obj(path, self._mesh_tris)

    # ------------------------------------------------------------------

    def timing_stats(self):
        """Median/mean tracking time (mono_tum's end-of-run print,
        Examples/Monocular/mono_tum.cc:114-123)."""
        if not self.timings:
            return {}
        t = np.asarray(self.timings)
        return {
            "median_s": float(np.median(t)),
            "mean_s": float(t.mean()),
            "fps": float(1.0 / max(t.mean(), 1e-9)),
        }
