"""Hough line-segment detection + object yaw by line alignment."""

import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import TUM3, project
from eao_slam_tpu.objects.state import empty_object_table, yaw_rotation
from eao_slam_tpu.objects.yaw import (
    YAW_SAMPLES,
    sample_yaws,
    update_yaw,
    yaw_sample_scores,
)
from eao_slam_tpu.ops.lines import detect_segments, merge_collinear


def draw_line(img, x1, y1, x2, y2, value=255.0, thickness=1):
    n = int(max(abs(x2 - x1), abs(y2 - y1)) * 2) + 1
    xs = np.linspace(x1, x2, n).astype(int)
    ys = np.linspace(y1, y2, n).astype(int)
    for t in range(-thickness, thickness + 1):
        img[np.clip(ys + t, 0, img.shape[0] - 1), np.clip(xs, 0, img.shape[1] - 1)] = value
        img[np.clip(ys, 0, img.shape[0] - 1), np.clip(xs + t, 0, img.shape[1] - 1)] = value
    return img


class TestHoughSegments:
    def test_detects_drawn_segments(self, rng):
        img = rng.uniform(95, 105, (480, 640)).astype(np.float32)
        truths = [
            (100.0, 100.0, 400.0, 120.0),
            (150.0, 300.0, 170.0, 450.0),
            (350.0, 200.0, 500.0, 380.0),
        ]
        for t in truths:
            draw_line(img, *t)
        segs, valid = detect_segments(jnp.asarray(img), max_lines=32)
        segs = np.asarray(segs)[np.asarray(valid)]
        assert len(segs) >= 3

        def ang(s):
            return np.arctan2(s[3] - s[1], s[2] - s[0]) % np.pi

        for t in truths:
            ta = ang(t)
            mid_t = np.array([(t[0] + t[2]) / 2, (t[1] + t[3]) / 2])
            found = False
            for s in segs:
                da = abs((ang(s) - ta + np.pi / 2) % np.pi - np.pi / 2)
                # perpendicular distance of the truth midpoint to the
                # detected segment's infinite line (endpoint spans may
                # over/under-shoot along the line)
                d = np.array([s[2] - s[0], s[3] - s[1]])
                n = np.array([-d[1], d[0]]) / max(np.linalg.norm(d), 1e-9)
                off = abs(n @ (mid_t - np.array([s[0], s[1]])))
                # 8 deg: the crude test rasterizer (axis-aligned thickening)
                # biases steep strokes' apparent angle by a few degrees
                if da < np.deg2rad(8) and off < 8.0:
                    found = True
                    break
            assert found, f"segment {t} not detected"

    def test_flat_image_no_lines(self):
        img = jnp.full((240, 320), 100.0)
        segs, valid = detect_segments(img, max_lines=16)
        assert int(valid.sum()) == 0

    def test_merge_collinear(self):
        segs = jnp.asarray([
            [100.0, 100.0, 200.0, 100.0],
            [210.0, 100.5, 320.0, 101.0],   # collinear continuation
            [100.0, 300.0, 200.0, 300.0],   # unrelated
        ])
        valid = jnp.ones(3, bool)
        _, keep = merge_collinear(segs, valid)
        keep = np.asarray(keep)
        assert keep.sum() == 2
        assert keep[2]


class TestYaw:
    def _setup(self, rng, true_yaw):
        table = empty_object_table(8, YAW_SAMPLES)
        j = 0
        # off the optical axis: an on-axis symmetric cuboid projects the
        # same edge-angle set for yaw ±theta (true ambiguity of
        # parallelism-only scoring); perspective breaks it off-center
        center = jnp.asarray([0.9, 0.2, 4.0])
        # non-chair class: the generic exclude-shortest-edge scoring path;
        # the chair path's triple-weighted length edge (src/Tracking.cc:
        # 2745-2752) trades precision for stability and is exercised by
        # the e2e chunked test instead
        table = table._replace(
            valid=table.valid.at[j].set(True),
            cls=table.cls.at[j].set(62),
            center=table.center.at[j].set(center),
            cub_min=table.cub_min.at[j].set(jnp.asarray([-0.5, -0.4, -0.3])),
            cub_max=table.cub_max.at[j].set(jnp.asarray([0.5, 0.4, 0.3])),
        )
        # lines = projected horizontal edges of the cuboid at true_yaw
        lo = np.array([-0.5, -0.4, -0.3])
        hi = np.array([0.5, 0.4, 0.3])
        # bottom ring then top ring (state.cuboid_corners order): the fake
        # "detected lines" below are the projected HORIZONTAL edges only
        corners = np.array([
            [lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
            [hi[0], lo[1], hi[2]], [lo[0], lo[1], hi[2]],
            [lo[0], hi[1], lo[2]], [hi[0], hi[1], lo[2]],
            [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]],
        ])
        R = np.asarray(yaw_rotation(jnp.asarray(true_yaw)))
        cw = np.asarray(center) + corners @ R.T
        T = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
        uv = np.asarray(project(TUM3, se3.apply(jnp.asarray(T), jnp.asarray(cw, jnp.float32))))
        # feed the DOMINANT top-ring edges (what a line detector reliably
        # finds on a real box); the scoring model compares lines against
        # the two longest of {length, width, height} edge directions, so
        # bottom-ring/vertical clutter only bounds its precision
        edges = [(4, 5), (5, 6), (6, 7), (7, 4)]
        L = 32
        lines = np.zeros((L, 4), np.float32)
        lvalid = np.zeros((L,), bool)
        for i, (a, b) in enumerate(edges):
            lines[i] = (*uv[a], *uv[b])
            lvalid[i] = True
        # box covering the projection
        x0, y0 = uv.min(0) - 10
        x1, y1 = uv.max(0) + 10
        boxes = np.zeros((4, 4), np.float32)
        boxes[0] = (x0, y0, x1 - x0, y1 - y0)
        targets = np.full((4,), -1, np.int32)
        targets[0] = j
        return table, T, lines, lvalid, boxes, targets

    def test_recovers_yaw(self, rng):
        """±4° = one sample step: the scheme's best-case precision. The
        shortest-projected-edge exclusion (src/Tracking.cc:2745) caps
        accuracy for larger |yaw| where the most informative (width) edge
        is the most foreshortened — inherited reference behavior."""
        true_yaw = np.deg2rad(10.0)
        table, T, lines, lvalid, boxes, targets = self._setup(rng, true_yaw)
        for _ in range(4):  # several frames of consistent evidence
            counts, errs, n_lines = yaw_sample_scores(
                TUM3, table, jnp.asarray(targets), jnp.asarray(boxes),
                jnp.asarray(T), jnp.asarray(lines), jnp.asarray(lvalid),
            )
            table = update_yaw(table, jnp.asarray(targets), counts, errs, n_lines)
        got = float(table.yaw[0])
        assert abs(np.rad2deg(got) - 10.0) <= 4.0, np.rad2deg(got)

    def test_zero_yaw_stays(self, rng):
        table, T, lines, lvalid, boxes, targets = self._setup(rng, 0.0)
        for _ in range(4):
            counts, errs, n_lines = yaw_sample_scores(
                TUM3, table, jnp.asarray(targets), jnp.asarray(boxes),
                jnp.asarray(T), jnp.asarray(lines), jnp.asarray(lvalid),
            )
            table = update_yaw(table, jnp.asarray(targets), counts, errs, n_lines)
        assert abs(np.rad2deg(float(table.yaw[0]))) <= 4.0
