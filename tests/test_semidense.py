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
    # pass 2 (inter-KF consistency) culls pixels whose depth can't be
    # cross-validated in neighbor maps — fewer but cleaner survivors
    assert ok.sum() > 300, f"too few fused pixels: {ok.sum()}"
    est_z = 1.0 / np.maximum(rho[ok], 1e-6)
    rel_err = np.abs(est_z - gt_z[ok]) / gt_z[ok]
    # median relative depth error of a few percent like the reference's
    # semi-dense clouds
    assert np.median(rel_err) < 0.05, f"median rel err {np.median(rel_err):.3f}"
    assert (rel_err < 0.1).mean() > 0.6

    # export path (SaveSemiDensePoints parity)
    n = save_obj(str(tmp_path / "cloud.obj"), res, sigma_max=1e9)
    assert n > 800
    assert (tmp_path / "cloud.obj").exists()


class TestTileSpread:
    def test_edge_pixels_cover_occupied_tiles(self, views):
        """Per-tile selection must land pixels in >=80% of tiles that hold
        any strong gradient (the global top-k collapsed onto few contours)."""
        from eao_slam_tpu.ops.image import sobel_gradients

        imgs, _, _ = views
        img = jnp.asarray(imgs[0])
        uv, valid = select_edge_pixels(img, 4096)
        _, _, mag = sobel_gradients(img)
        mag = np.asarray(mag)
        H, W, cell = mag.shape[0], mag.shape[1], 16
        occ = set()
        ys, xs = np.nonzero(mag > 8.0 * 4.0)
        inb = (ys >= 8) & (ys < H - 8) & (xs >= 8) & (xs < W - 8)
        for y, x in zip(ys[inb], xs[inb]):
            occ.add((y // cell, x // cell))
        hit = set()
        u = np.asarray(uv)[np.asarray(valid)]
        for x, y in u:
            hit.add((int(y) // cell, int(x) // cell))
        assert len(occ) > 20
        coverage = len(hit & occ) / len(occ)
        assert coverage >= 0.8, f"tile coverage {coverage:.2f}"


@pytest.mark.slow
def test_inter_kf_check_culls_corrupted_plane(views):
    """A corrupted depth region in one keyframe must be removed by the
    inter-keyframe consistency pass while consistent structure survives
    (src/ProbabilityMapping.cc:1011-1295)."""
    from eao_slam_tpu.dense.semidense import inter_kf_check, rasterize_depth
    from eao_slam_tpu.geometry import se3

    imgs, poses, depths = views
    K = len(imgs)
    cam = TUM3
    H, W = imgs.shape[1:]

    # ground-truth inverse depths at shared edge pixels per KF
    uvs, rhos, vals = [], [], []
    for k in range(K):
        uv, pxv = select_edge_pixels(jnp.asarray(imgs[k]), 2048)
        ui = np.clip(np.asarray(uv[:, 0], int), 0, W - 1)
        vi = np.clip(np.asarray(uv[:, 1], int), 0, H - 1)
        z = np.asarray(depths[k])[vi, ui]
        ok = np.asarray(pxv) & np.isfinite(z) & (z > 0.1)
        rho = np.where(ok, 1.0 / np.maximum(z, 0.1), 0.0).astype(np.float32)
        uvs.append(uv); rhos.append(jnp.asarray(rho)); vals.append(jnp.asarray(ok))

    # corrupt half of KF0's depths (a bogus near-plane)
    N = rhos[0].shape[0]
    corrupt = np.zeros(N, bool); corrupt[: N // 2] = True
    rho0_bad = jnp.where(jnp.asarray(corrupt), 2.0, rhos[0])

    maps = [rasterize_depth(uvs[k], rhos[k], jnp.full((N,), 0.01),
                            vals[k], H, W) for k in range(1, K)]
    T_nbs = jnp.stack([jnp.asarray(poses[k]) for k in range(1, K)])
    rho_ref, keep, n_sup = inter_kf_check(
        cam, uvs[0], rho0_bad, vals[0], jnp.asarray(poses[0]),
        T_nbs,
        jnp.stack([m[0] for m in maps]),
        jnp.stack([m[1] for m in maps]),
        min_support=1,  # 3 neighbors with subsampled maps (ref: 3-of-7)
    )
    keep = np.asarray(keep)
    base = np.asarray(vals[0])
    # corrupted pixels die, a solid share of honest pixels survive
    bad_survival = keep[corrupt & base].mean() if (corrupt & base).any() else 0
    good_survival = keep[~corrupt & base].mean()
    assert bad_survival < 0.1, f"corrupted depths survived: {bad_survival:.2f}"
    assert good_survival > 0.5, f"good depths culled: {good_survival:.2f}"
    # refinement keeps honest survivors near their true depth
    err = np.abs(np.asarray(rho_ref) - np.asarray(rhos[0]))[keep & ~corrupt]
    assert np.median(err) < 0.02
