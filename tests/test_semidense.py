"""Semi-dense mapping: inverse-depth sweeps on rendered synthetic views vs
ray-cast ground-truth depth."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from eao_slam_tpu.config import SemiDenseConfig
from eao_slam_tpu.dense.semidense import (
    fuse_hypotheses,
    save_obj,
    select_edge_pixels,
    semidense_reconstruct,
)
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import make_room_scene, look_at, render_image


@pytest.fixture(scope="module")
def views():
    scene = make_room_scene(seed=9, n_landmarks=50, n_objects=2)
    poses, imgs, depths = [], [], []
    for i in range(4):
        eye = np.array([-0.12 + 0.08 * i, 0.0, 0.0])
        T = look_at(eye, np.array([0.0, 0.0, 4.5])).astype(np.float32)
        img, z = render_image(scene, TUM3, T, return_depth=True)
        poses.append(T)
        imgs.append(img.astype(np.float32))
        depths.append(z)
    return np.stack(imgs), np.stack(poses), depths


class TestEdgeSelection:
    def test_selects_high_gradient(self, views):
        imgs, poses, _ = views
        uv, valid = select_edge_pixels(jnp.asarray(imgs[0]), 4096)
        assert int(valid.sum()) > 2000
        # selected pixels should be strong-gradient locations
        from eao_slam_tpu.ops.image import sobel_gradients

        _, _, mag = sobel_gradients(jnp.asarray(imgs[0]))
        sel_mag = np.asarray(mag)[
            np.asarray(uv[:, 1], int)[np.asarray(valid)],
            np.asarray(uv[:, 0], int)[np.asarray(valid)],
        ]
        assert np.median(sel_mag) > np.median(np.asarray(mag))


class TestFusion:
    def test_compatible_hypotheses_fuse(self):
        rho = jnp.asarray([[0.25, 0.251, 0.249, 0.4, 0.1]])
        sig = jnp.full((1, 5), 0.002)
        ok = jnp.ones((1, 5), bool)
        r, s, v = fuse_hypotheses(rho, sig, ok, lambda_n=3)
        assert bool(v[0])
        assert abs(float(r[0]) - 0.25) < 0.002
        assert float(s[0]) < 0.002

    def test_insufficient_support_rejected(self):
        rho = jnp.asarray([[0.25, 0.4, 0.1, 0.55, 0.7]])
        sig = jnp.full((1, 5), 0.002)
        ok = jnp.ones((1, 5), bool)
        _, _, v = fuse_hypotheses(rho, sig, ok, lambda_n=3)
        assert not bool(v[0])


@pytest.mark.slow
def test_reconstruction_matches_raycast_depth(views, tmp_path):
    imgs, poses, depths = views
    K = len(imgs)
    ranges = np.asarray([[2.0, 8.0]] * K, np.float32)
    neighbors = [[j for j in range(K) if j != k][:3] for k in range(K)]
    res = semidense_reconstruct(
        TUM3, imgs, poses, ranges, neighbors,
        n_pix=4096, n_depth=96,
    )

    k = 0
    uv = np.asarray(res.pixels[k])
    val = np.asarray(res.valid[k])
    rho = np.asarray(res.inv_depth[k])
    gt_z = depths[k][uv[:, 1].astype(int), uv[:, 0].astype(int)]
    ok = val & np.isfinite(gt_z)
    assert ok.sum() > 500, f"too few fused pixels: {ok.sum()}"
    est_z = 1.0 / np.maximum(rho[ok], 1e-6)
    rel_err = np.abs(est_z - gt_z[ok]) / gt_z[ok]
    # median relative depth error of a few percent like the reference's
    # semi-dense clouds
    assert np.median(rel_err) < 0.05, f"median rel err {np.median(rel_err):.3f}"
    assert (rel_err < 0.1).mean() > 0.6

    # export path (SaveSemiDensePoints parity)
    n = save_obj(str(tmp_path / "cloud.obj"), res, sigma_max=1e9)
    assert n > 1000
    assert (tmp_path / "cloud.obj").exists()
