"""3D line fitting from semi-dense depth + multi-view clustering."""

import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.dense.lines3d import (
    cluster_world_segments,
    fit_3d_segments,
    save_lines_obj,
)
from eao_slam_tpu.geometry.camera import TUM3


def make_line_scene(rng, T=None):
    """One 3D segment + its projected 2D segment + semi-dense samples."""
    if T is None:
        T = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
    p1 = np.array([-0.8, -0.2, 4.0])
    p2 = np.array([0.9, 0.4, 5.0])
    t = np.linspace(0, 1, 400)
    X = p1[None] + t[:, None] * (p2 - p1)[None]
    Xc = X @ T[:3, :3].T + T[:3, 3]
    uv = np.stack([TUM3.fx * Xc[:, 0] / Xc[:, 2] + TUM3.cx,
                   TUM3.fy * Xc[:, 1] / Xc[:, 2] + TUM3.cy], -1)
    rho = 1.0 / Xc[:, 2] * (1.0 + rng.normal(0, 0.003, len(X)))
    seg2d = np.array([[uv[0, 0], uv[0, 1], uv[-1, 0], uv[-1, 1]]], np.float32)
    return (p1, p2), seg2d, uv.astype(np.float32), rho.astype(np.float32), T


class TestFit3D:
    def test_recovers_segment(self, rng):
        (p1, p2), seg2d, px, rho, T = make_line_scene(rng)
        L = 8
        segs = np.zeros((L, 4), np.float32)
        segs[0] = seg2d[0]
        valid = np.zeros(L, bool)
        valid[0] = True
        res = fit_3d_segments(
            TUM3, jnp.asarray(segs), jnp.asarray(valid),
            jnp.asarray(px), jnp.asarray(rho), jnp.ones(len(px), bool),
            jnp.asarray(T),
        )
        assert bool(res.valid[0])
        got = np.asarray(res.seg[0])
        e1 = min(np.linalg.norm(got[:3] - p1), np.linalg.norm(got[:3] - p2))
        e2 = min(np.linalg.norm(got[3:] - p1), np.linalg.norm(got[3:] - p2))
        assert e1 < 0.1 and e2 < 0.1, got

    def test_no_depth_rejected(self, rng):
        (p1, p2), seg2d, px, rho, T = make_line_scene(rng)
        L = 8
        segs = np.zeros((L, 4), np.float32)
        segs[0] = (50, 50, 200, 60)   # segment in a depth-free area
        valid = np.zeros(L, bool)
        valid[0] = True
        res = fit_3d_segments(
            TUM3, jnp.asarray(segs), jnp.asarray(valid),
            jnp.asarray(px), jnp.asarray(rho), jnp.ones(len(px), bool),
            jnp.asarray(T),
        )
        assert not bool(res.valid[0])


class TestCluster:
    def test_multiview_merge(self, rng, tmp_path):
        p1 = np.array([0.0, 0.0, 4.0])
        p2 = np.array([1.0, 0.2, 4.5])
        segs = []
        # the same physical line observed 3 times with noise + partial extent
        for _ in range(3):
            a = rng.uniform(0.0, 0.2)
            b = rng.uniform(0.8, 1.0)
            q1 = p1 + a * (p2 - p1) + rng.normal(0, 0.01, 3)
            q2 = p1 + b * (p2 - p1) + rng.normal(0, 0.01, 3)
            segs.append(np.concatenate([q1, q2]))
        # an unrelated single-view line (dropped by min_views)
        segs.append(np.array([2.0, 1.0, 3.0, 2.0, 1.0, 5.0]))
        segs = np.asarray(segs, np.float32)
        merged = cluster_world_segments(segs, np.ones(len(segs), bool), min_views=2)
        assert len(merged) == 1
        got = merged[0]
        d_got = got[3:] - got[:3]
        d_true = p2 - p1
        cos = abs(d_got @ d_true) / (np.linalg.norm(d_got) * np.linalg.norm(d_true))
        assert cos > 0.999
        n = save_lines_obj(str(tmp_path / "lines.obj"), merged)
        assert n == 1
        assert "l 1 2" in (tmp_path / "lines.obj").read_text()
