"""EAO object layer: stats tests vs scipy, iForest behavior, box ops, and
the ensemble association pipeline on fabricated scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, tum3_config, DemoFlag
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.objects import ObjectUpdater, empty_object_table
from eao_slam_tpu.objects import boxes as boxops
from eao_slam_tpu.objects import stats
from eao_slam_tpu.objects.iforest import anomaly_scores
from eao_slam_tpu.runtime.map_state import empty_map_state


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------

class TestRankSum:
    def test_same_distribution_passes(self, rng):
        a = rng.normal(0, 1, (60, 3)).astype(np.float32)
        b = rng.normal(0, 1, (80, 3)).astype(np.float32)
        ok = stats.rank_sum_all_axes_pass(
            jnp.asarray(a), jnp.ones(60, bool), jnp.asarray(b), jnp.ones(80, bool)
        )
        assert bool(ok)

    def test_shifted_distribution_fails(self, rng):
        a = rng.normal(0, 1, (60, 3)).astype(np.float32)
        b = rng.normal(3.0, 1, (80, 3)).astype(np.float32)
        ok = stats.rank_sum_all_axes_pass(
            jnp.asarray(a), jnp.ones(60, bool), jnp.asarray(b), jnp.ones(80, bool)
        )
        assert not bool(ok)

    def test_statistic_matches_bruteforce(self, rng):
        a = rng.normal(0, 1, (25, 1)).astype(np.float32)
        b = rng.normal(0.5, 1, (35, 1)).astype(np.float32)
        w, m, n = stats.rank_sum_statistic(
            jnp.asarray(a), jnp.ones(25, bool), jnp.asarray(b), jnp.ones(35, bool)
        )
        # brute-force reference of the exact formula used by src/Object.cc:904
        w12 = sum((x > y) for x in a[:, 0] for y in b[:, 0])
        w21 = sum((x < y) for x in a[:, 0] for y in b[:, 0])
        expect = min(w12 + 25 * 26 / 2, w21 + 35 * 36 / 2)
        assert abs(float(w[0]) - expect) < 1e-3

    def test_masked_rows_ignored(self, rng):
        a = rng.normal(0, 1, (40, 3)).astype(np.float32)
        a[30:] = 100.0  # masked-out garbage
        mask_a = np.arange(40) < 30
        b = rng.normal(0, 1, (50, 3)).astype(np.float32)
        ok = stats.rank_sum_all_axes_pass(
            jnp.asarray(a), jnp.asarray(mask_a), jnp.asarray(b), jnp.ones(50, bool)
        )
        assert bool(ok)


class TestTTest:
    def test_t_table_matches_scipy(self):
        from scipy.stats import t as t_dist

        table = stats.make_t_table()
        # col 5 = alpha 0.025-> two-sided 0.05? layout: col idx 5 = alpha 0.05
        # per reference usage, check a couple of known values
        assert table.shape == (122, 9)
        # dof=10, upper-tail for the column used at alpha=0.05 in the cascade
        alpha = table[0, 5]
        expect = t_dist.ppf(1 - alpha / 2.0, 10)
        assert abs(table[10, 5] - expect) < 1e-3

    def test_center_t(self):
        t = stats.t_statistic_center(
            jnp.asarray([1.0, 1.0, 1.0]),
            jnp.asarray([0.0, 0.0, 0.0]),
            jnp.asarray([2.0, 2.0, 2.0]),
            jnp.asarray(16.0),
        )
        np.testing.assert_allclose(np.asarray(t), 2.0, atol=1e-5)


class TestBoxplot:
    def test_depth_outliers_removed(self, rng):
        z = np.concatenate([rng.normal(4.0, 0.1, 50), [9.0, 12.0]]).astype(np.float32)
        mask = np.ones(52, bool)
        keep = stats.boxplot_depth_inliers(jnp.asarray(z)[None], jnp.asarray(mask)[None])
        keep = np.asarray(keep)[0]
        assert keep[:50].all()
        assert not keep[50:].any()


# ---------------------------------------------------------------------------
# boxes
# ---------------------------------------------------------------------------

class TestBoxes:
    def test_iou_known_value(self):
        a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.asarray([[5.0, 5.0, 10.0, 10.0]])
        got = float(boxops.iou(a, b)[0, 0])
        assert abs(got - 25.0 / 175.0) < 1e-6

    def test_former_latter(self):
        a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.asarray([[0.0, 0.0, 5.0, 5.0]])  # inside a
        assert abs(float(boxops.overlap_former(a, b)[0, 0]) - 0.25) < 1e-6
        assert abs(float(boxops.overlap_latter(a, b)[0, 0]) - 1.0) < 1e-6

    def test_hygiene_duplicate_suppression(self):
        boxes = jnp.asarray([
            [100.0, 100.0, 80.0, 80.0],
            [105.0, 105.0, 80.0, 80.0],   # near duplicate, lower score
            [400.0, 300.0, 60.0, 60.0],
        ])
        cls = jnp.asarray([56, 56, 62])
        score = jnp.asarray([0.9, 0.5, 0.8])
        valid = jnp.ones(3, bool)
        n_pts = jnp.asarray([30, 30, 30])
        keep = boxops.box_hygiene(boxes, cls, score, valid, n_pts, 640.0, 480.0)
        assert bool(keep[0]) and not bool(keep[1]) and bool(keep[2])

    def test_hygiene_kills_ignore_class_and_edge(self):
        boxes = jnp.asarray([
            [2.0, 100.0, 60.0, 60.0],      # few points + on edge
            [300.0, 200.0, 60.0, 60.0],    # person class -> ignored
        ])
        cls = jnp.asarray([56, 0])
        score = jnp.asarray([0.9, 0.9])
        valid = jnp.ones(2, bool)
        n_pts = jnp.asarray([7, 50])
        keep = boxops.box_hygiene(boxes, cls, score, valid, n_pts, 640.0, 480.0)
        assert not bool(keep[0]) and not bool(keep[1])


# ---------------------------------------------------------------------------
# isolation forest
# ---------------------------------------------------------------------------

class TestIForest:
    def test_outliers_score_higher(self, rng):
        pts = np.zeros((128, 3), np.float32)
        pts[:100] = rng.uniform(40, 50, (100, 3))
        pts[100:110] = rng.uniform(70, 100, (10, 3))   # anomalies
        mask = np.zeros(128, bool)
        mask[:110] = True
        s = anomaly_scores(
            jax.random.PRNGKey(12345), jnp.asarray(pts), jnp.asarray(mask),
            n_trees=50, psi=55, depth=6,
        )
        s = np.asarray(s)
        assert s[100:110].mean() > s[:100].mean() + 0.1
        assert (s[100:110] > 0.6).mean() > 0.7
        assert (s[:100] > 0.6).mean() < 0.1
        assert (s[110:] == 0).all()

    def test_uniform_cloud_no_outliers(self, rng):
        pts = rng.uniform(0, 1, (64, 3)).astype(np.float32)
        s = anomaly_scores(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.ones(64, bool),
            n_trees=50, psi=32, depth=5,
        )
        assert float(jnp.max(s)) < 0.75


# ---------------------------------------------------------------------------
# ensemble association pipeline
# ---------------------------------------------------------------------------

def make_cfg():
    return tum3_config(DemoFlag.EAO).replace(
        capacity=CapacityConfig(
            max_keyframes=16, max_points=1024, max_features=256, max_boxes=8,
            max_objects=16, local_ba_points=512,
        )
    )


def project_np(X, T):
    pc = X @ T[:3, :3].T + T[:3, 3]
    return np.stack([
        TUM3.fx * pc[:, 0] / pc[:, 2] + TUM3.cx,
        TUM3.fy * pc[:, 1] / pc[:, 2] + TUM3.cy,
    ], -1)


@pytest.fixture
def object_scene(rng):
    """Two point clusters (a 'chair' and a 'tv') plus background points,
    with a map state whose tracked features see them."""
    cfg = make_cfg()
    m = empty_map_state(cfg.capacity)

    c1 = np.array([-0.6, 0.3, 4.0])
    c2 = np.array([0.8, 0.1, 4.5])
    pts1 = (c1 + rng.normal(0, 0.12, (60, 3))).astype(np.float32)
    pts2 = (c2 + rng.normal(0, 0.12, (60, 3))).astype(np.float32)
    bg = rng.uniform([-2, -1, 3], [2, 1, 6], (120, 3)).astype(np.float32)
    allpts = np.concatenate([pts1, pts2, bg])
    P = len(allpts)
    m = m._replace(
        pt_pos=m.pt_pos.at[:P].set(jnp.asarray(allpts)),
        pt_valid=m.pt_valid.at[:P].set(True),
    )
    return cfg, m, allpts, (c1, c2)


def frame_inputs(allpts, T, cfg, rng):
    """Feature arrays: every map point is 'tracked' in this frame."""
    F = cfg.capacity.max_features
    uv = project_np(allpts, T)
    n = min(len(allpts), F)
    kp = np.zeros((F, 2), np.float32)
    kp[:n] = uv[:n]
    cur_pt = np.full((F,), -1, np.int32)
    cur_pt[:n] = np.arange(n)
    return jnp.asarray(kp), jnp.asarray(cur_pt)


def boxes_for(centers_uv, cfg, size=120.0, cls=(56, 62)):
    B = cfg.capacity.max_boxes
    boxes = np.zeros((B, 4), np.float32)
    bcls = np.full((B,), -1, np.int32)
    score = np.zeros((B,), np.float32)
    valid = np.zeros((B,), bool)
    for i, c in enumerate(centers_uv):
        boxes[i] = (c[0] - size / 2, c[1] - size / 2, size, size)
        bcls[i] = cls[i]
        score[i] = 0.9
        valid[i] = True
    return (jnp.asarray(boxes), jnp.asarray(bcls), jnp.asarray(score),
            jnp.asarray(valid))


class TestAssociation:
    def test_create_then_associate(self, object_scene, rng):
        cfg, m, allpts, (c1, c2) = object_scene
        updater = ObjectUpdater(cfg)
        table = empty_object_table(cfg.capacity.max_objects)

        T = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
        kp, cur_pt = frame_inputs(allpts, T, cfg, rng)
        uv_c = project_np(np.stack([c1, c2]), T)
        fb = boxes_for(uv_c, cfg)

        # frame 1: two new objects
        m, table, new1 = updater.frame_update(m, table, fb, T, kp, cur_pt, 1)
        assert new1
        valid = np.asarray(table.valid)
        assert valid.sum() == 2
        cls = np.asarray(table.cls)[valid]
        assert set(cls.tolist()) == {56, 62}

        centers = np.asarray(table.center)[valid]
        gt = np.stack([c1, c2])
        for c in centers:
            assert np.linalg.norm(gt - c, axis=1).min() < 0.15

        # frame 2 (slightly moved camera): must associate, not create
        T2 = T.copy()
        T2[0, 3] += 0.01
        kp2, cur_pt2 = frame_inputs(allpts, T2, cfg, rng)
        m, table, new2 = updater.frame_update(m, table, fb, T2, kp2, cur_pt2, 2)
        assert not new2
        assert np.asarray(table.valid).sum() == 2
        assert (np.asarray(table.n_obs)[np.asarray(table.valid)] == 2).all()

    def test_iou_stage_tracks_moving_box(self, object_scene, rng):
        cfg, m, allpts, (c1, c2) = object_scene
        updater = ObjectUpdater(cfg)
        table = empty_object_table(cfg.capacity.max_objects)
        T = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
        kp, cur_pt = frame_inputs(allpts, T, cfg, rng)
        uv_c = project_np(np.stack([c1, c2]), T)

        m, table, _ = updater.frame_update(m, table, boxes_for(uv_c, cfg), T, kp, cur_pt, 1)
        # consecutive frames: box drifts a few px -> stage-1 IoU association
        for fid in range(2, 6):
            uv_c = uv_c + np.array([2.0, 1.0])
            m, table, new = updater.frame_update(
                m, table, boxes_for(uv_c, cfg), T, kp, cur_pt, fid
            )
            assert not new
        assert np.asarray(table.valid).sum() == 2
        assert (np.asarray(table.n_obs)[np.asarray(table.valid)] == 5).all()

    def test_membership_assignment(self, object_scene, rng):
        cfg, m, allpts, (c1, c2) = object_scene
        updater = ObjectUpdater(cfg)
        table = empty_object_table(cfg.capacity.max_objects)
        T = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
        kp, cur_pt = frame_inputs(allpts, T, cfg, rng)
        uv_c = project_np(np.stack([c1, c2]), T)
        m, table, _ = updater.frame_update(m, table, boxes_for(uv_c, cfg), T, kp, cur_pt, 1)

        owner = np.asarray(m.pt_object_id)
        # cluster points mostly assigned to their object
        assert (owner[:60] >= 0).mean() > 0.7
        assert (owner[60:120] >= 0).mean() > 0.7
        # the two clusters map to different objects
        o1 = owner[:60][owner[:60] >= 0]
        o2 = owner[60:120][owner[60:120] >= 0]
        assert len(set(o1.tolist())) == 1
        assert len(set(o2.tolist())) == 1
        assert o1[0] != o2[0]
