"""Configuration for the TPU-native EAO-SLAM engine.

Replaces the reference's three config mechanisms (SURVEY.md §5): OpenCV YAML
settings (Examples/Monocular/TUM3.yaml, parsed in src/Tracking.cc:78-195),
the CLI demo-flag string gating ablations (src/System.cc:41-43), and
compile-time #defines (include/ProbabilityMapping.h:45-56). Everything is a
frozen dataclass so configs hash as jit-static arguments.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

from eao_slam_tpu.geometry.camera import Camera, TUM3


class DemoFlag(enum.Enum):
    """Ablation flags, mirroring mono_tum's CLI contract
    (Examples/Monocular/mono_tum.cc:35-48, README §3)."""

    NONE = "None"            # plain mono tracking + BA, objects off
    IFOREST = "iForest"      # + iForest outlier rejection only
    LINE_IFOREST = "LineAndiForest"  # + line-alignment yaw
    NA = "NA"                # objects on, no parametric/nonparametric assoc tests
    IOU = "IoU"              # association by IoU only
    NP = "NP"                # association by nonparametric rank-sum only
    EAO = "EAO"              # full ensemble association, no lines
    FULL = "Full"            # everything (incl. semi-dense mapping)

    @property
    def objects_enabled(self) -> bool:
        return self != DemoFlag.NONE

    @property
    def use_iou(self) -> bool:
        # IoU stage active in IoU / EAO / Full / iForest / LineAndiForest
        # (reference checks mflag != "NA" && mflag != "NP", src/Object.cc:184)
        return self not in (DemoFlag.NA, DemoFlag.NP, DemoFlag.NONE)

    @property
    def use_nonparam(self) -> bool:
        # rank-sum stage active unless flag is NA or IoU (src/Object.cc:258)
        return self not in (DemoFlag.NA, DemoFlag.IOU, DemoFlag.NONE)

    @property
    def use_ttest(self) -> bool:
        # t-test stage belongs to the full ensemble (src/Object.cc:465)
        return self in (DemoFlag.EAO, DemoFlag.FULL, DemoFlag.IFOREST, DemoFlag.LINE_IFOREST)

    @property
    def use_iforest(self) -> bool:
        return self in (DemoFlag.IFOREST, DemoFlag.LINE_IFOREST, DemoFlag.EAO, DemoFlag.FULL)

    @property
    def use_yaw_lines(self) -> bool:
        # line-alignment yaw sampling (src/Tracking.cc:2627 gates on flag)
        return self in (DemoFlag.LINE_IFOREST, DemoFlag.FULL)

    @property
    def semidense_enabled(self) -> bool:
        return self == DemoFlag.FULL


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB extractor parameters (TUM3.yaml:39-56 / include/ORBextractor.h)."""

    n_features: int = 1024          # ref: 1000 online / 2000 at init (src/Tracking.cc:144-150)
    n_features_init: int = 2048
    scale_factor: float = 1.2
    n_levels: int = 8
    fast_threshold: int = 20        # iniThFAST
    fast_min_threshold: int = 7     # minThFAST fallback
    cell_size: int = 32             # ref uses 30px cells (src/ORBextractor.cc:790); 32 tiles better
    edge_threshold: int = 19        # border for descriptor support (include/ORBextractor.h)
    patch_size: int = 31


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """ORBmatcher thresholds (include/ORBmatcher.h:85-87 and call sites)."""

    th_low: int = 50
    th_high: int = 100
    nn_ratio_tracking: float = 0.9
    nn_ratio_init: float = 0.9
    hist_bins: int = 30             # rotation-consistency histogram (HISTO_LENGTH)
    search_radius_motion: float = 15.0
    search_radius_map: float = 3.0  # multiplied by scale of predicted octave


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    max_frames_between_kf: int = 30     # == fps (Tracking::NeedNewKeyFrame)
    min_frames_between_kf: int = 0
    min_tracked_for_ok: int = 30
    min_matches_motion: int = 20
    min_matches_ref_kf: int = 15
    min_inliers_after_pose: int = 10
    kf_tracked_ratio: float = 0.9       # thRefRatio for mono (src/Tracking.cc:1840)
    min_init_matches: int = 100         # Initializer gate (src/Tracking.cc:880)
    enable_loop_closing: bool = True


@dataclasses.dataclass(frozen=True)
class ObjectConfig:
    """EAO object-layer parameters (src/Object.cc constants)."""

    iou_threshold: float = 0.5            # motion-IoU stage (src/Object.cc:222)
    iou_threshold_nomotion: float = 0.6
    proj_iou_threshold: float = 0.25      # projected-box stage (src/Object.cc:351)
    rank_sum_band: float = 1.282          # 80% two-sided band on Wilcoxon W (src/Object.cc:904)
    ttest_alpha_col: int = 4              # alpha=0.05 column of data/t_test.txt
    iforest_trees: int = 50               # src/Object.cc:1214
    iforest_threshold: float = 0.6        # anomaly score gate (:1260)
    iforest_threshold_tv: float = 0.65    # class 62 tvmonitor (:1258)
    iforest_seed: int = 12345             # :1214
    iforest_min_points: int = 8
    yaw_samples: int = 30                 # ±45° in 3° steps (src/Tracking.cc:2661)
    yaw_range_deg: float = 45.0
    yaw_angle_gate_deg: float = 5.0       # line-parallelism gate (:2757)
    box_expand_px: float = 15.0           # AssociateObjAndLines (:2477)
    min_points_per_object: int = 5
    depth_subsample_limit: float = 3.0    # map-point subsampling band (src/Object.cc:752-810)
    use_cubeslam: bool = False            # single-view cuboid proposals, disabled
                                          # by default like bCubeslam (src/Tracking.cc:1211)
    per_frame_iforest: bool = False       # True = cull inside the scan body after
                                          # every frame (the reference's exact pacing,
                                          # src/Object.cc:1202-1309) instead of the
                                          # chunk-rate batched cull; ~80x costlier on
                                          # TPU, kept for the pacing-equivalence test


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    """Local-mapping + BA parameters (src/Optimizer.cc, src/LocalMapping.cc)."""

    local_ba_kf_window: int = 16
    local_ba_iters_first: int = 5
    local_ba_iters_second: int = 10
    # top-N covisible neighbors for new-KF triangulation (ref uses 20
    # covisible KFs for mono, src/LocalMapping.cc:218; here the scan's
    # 8-keyframe recency window bounds the candidate set). Sensitivity
    # measured on the real chip, bench arc, 4 timed chunks, same gates
    # (r5): N=2 270.7 fps / 3.94 cm sim3 ATE; N=4 228.2 fps / 3.65 cm;
    # N=8 170.8 fps / 6.07 cm. N=4's 0.3 cm gain is inside the arc's
    # ~2 cm noise band while costing 16% throughput, and N=8 actively
    # hurts (each extra neighbor is a smaller-baseline pair whose noisy
    # triangulations the BA then has to reject) — so 2 stays the
    # default. Exploratory trajectories that outrun the recency window
    # (the loop-closure circuit) measured best at 4.
    triangulation_neighbors: int = 2
    min_covis_weight: int = 10
    # per-round inner-iteration counts of the motion-only pose LM; one
    # chi2-5.991 re-classification between rounds (solvers/pose_lm.py)
    pose_lm_schedule: tuple = (4, 3, 2, 1)
    chi2_mono: float = 5.991
    huber_delta: float = 2.4477       # sqrt(5.991)
    kf_cull_redundancy: float = 0.9   # 90% rule (src/LocalMapping.cc:637-707)
    # MapPoint maintenance (src/LocalMapping.cc:459-539, src/MapPoint.cc):
    # fuse target-KF points into neighbors too, Replace-merge duplicate
    # landmarks, and refresh distinctive descriptors after fusion/BA
    bidirectional_fuse: bool = True
    merge_duplicates: bool = True
    refresh_descriptors: bool = True
    # chunked-path (scan_tracker) overrides for merge/refresh: measured on
    # the rendered-ORB bench, running them at chunk rate degraded sim3 ATE
    # 2-4x (0.055 -> 0.13-0.21 m) regardless of pre/post-BA placement,
    # while the per-keyframe host path holds 0.004 m with them on — the
    # chunk-rate cadence lets their matching perturbations steer tracking
    # for a whole chunk before BA can reject anything. Post-BA fusion is
    # unaffected (0.052 m) and stays on via bidirectional_fuse.
    scan_merge_duplicates: bool = False
    scan_refresh_descriptors: bool = False
    point_cull_found_ratio: float = 0.25


@dataclasses.dataclass(frozen=True)
class SemiDenseConfig:
    """ProbabilityMapping parameters (include/ProbabilityMapping.h:45-56)."""

    covis_n: int = 7
    sigma_i: float = 20.0
    lambda_g: float = 8.0
    lambda_l: float = 80.0
    lambda_theta: float = 45.0
    lambda_n: float = 3
    theta: float = 0.23
    n_support: int = 7                # NNRATIO-style support requirement


@dataclasses.dataclass(frozen=True)
class CapacityConfig:
    """Fixed capacities of the SoA map state (SURVEY.md §7.1): all device
    arrays are padded to these sizes and masked."""

    max_keyframes: int = 256
    max_points: int = 16384
    max_objects: int = 64
    max_features: int = 1024          # per-frame keypoint slots
    max_boxes: int = 16               # YOLO boxes per frame
    max_lines: int = 128              # 2D line segments per frame
    max_obs: int = 65536              # observation table for BA
    grid_cols: int = 64
    grid_rows: int = 48
    grid_bucket: int = 16             # max features per grid cell bucket
    local_ba_points: int = 4096       # compact point capacity of the BA window


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    camera: Camera = TUM3
    flag: DemoFlag = DemoFlag.NONE
    orb: OrbConfig = OrbConfig()
    matcher: MatcherConfig = MatcherConfig()
    tracking: TrackingConfig = TrackingConfig()
    objects: ObjectConfig = ObjectConfig()
    mapping: MappingConfig = MappingConfig()
    semidense: SemiDenseConfig = SemiDenseConfig()
    capacity: CapacityConfig = CapacityConfig()
    seed: int = 12345
    # BoW vocabulary (ops/bow.py): path to a trained .npz, or None to
    # bootstrap-train a small vocabulary online from the first keyframes
    # (the reference loads Vocabulary/ORBvoc.bin offline, src/System.cc:79)
    vocab_path: str | None = None
    bow_bootstrap_kfs: int = 5        # keyframes before online vocab training
    use_bow: bool = True              # place recognition via vocabulary tree

    def replace(self, **kw) -> "SystemConfig":
        return dataclasses.replace(self, **kw)


def tum3_config(flag: DemoFlag | str = DemoFlag.NONE, **kw) -> SystemConfig:
    if isinstance(flag, str):
        flag = DemoFlag(flag)
    return SystemConfig(camera=TUM3, flag=flag, **kw)


def kitti_config(sequence: int | str = 0, flag: DemoFlag | str = DemoFlag.NONE,
                 **kw) -> SystemConfig:
    """KITTI odometry preset (Examples/Monocular/KITTI*.yaml — 2000 ORB
    features like the reference's KITTI configs)."""
    from eao_slam_tpu.io.kitti import kitti_camera

    if isinstance(flag, str):
        flag = DemoFlag(flag)
    kw.setdefault("orb", OrbConfig(n_features=2000))
    return SystemConfig(camera=kitti_camera(sequence), flag=flag, **kw)


def euroc_config(flag: DemoFlag | str = DemoFlag.NONE, **kw) -> SystemConfig:
    """EuRoC MAV preset (Examples/Monocular/EuRoC.yaml — 1000 features,
    radial-tangential distortion handled by the undistortion path)."""
    from eao_slam_tpu.geometry.camera import EUROC

    if isinstance(flag, str):
        flag = DemoFlag(flag)
    return SystemConfig(camera=EUROC, flag=flag, **kw)


def tiny_profile_config():
    """160x120 / 128-feature / 4-level profile sized so the whole engine
    compiles in seconds on a CPU host — the shared fixture of the
    multi-chip dryrun (__graft_entry__), the multi-sequence scaling rows
    (scaling_bench.py) and their correctness tests
    (tests/test_multi_seq_engine.py). One definition: the scaling rows'
    claim that 'correctness is asserted by the tests' is only true while
    all three run the same profile."""
    from eao_slam_tpu.geometry.camera import Camera

    cam = Camera(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                 width=160, height=120, fps=30.0)
    return tum3_config().replace(
        camera=cam,
        orb=OrbConfig(n_features=128, n_features_init=256, n_levels=4),
        tracking=TrackingConfig(min_init_matches=40, min_tracked_for_ok=15,
                                min_matches_motion=12, min_matches_ref_kf=10,
                                min_inliers_after_pose=8),
        capacity=CapacityConfig(max_keyframes=16, max_points=1024,
                                max_features=128, local_ba_points=256,
                                grid_cols=16, grid_rows=12),
    )
