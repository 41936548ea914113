"""Reconstruction-evaluation pipeline (evaluation.py — eval/*.m parity):
cloud I/O, downsampling, scaled ICP registration, mean vertex distance."""

import numpy as np
import pytest

from eao_slam_tpu.evaluation import (
    evaluate_reconstruction,
    icp_register,
    load_cloud,
    mean_cloud_distance,
    nearest_neighbors,
    random_downsample,
    voxel_downsample,
)


@pytest.fixture
def cloud(rng):
    # structured cloud: three walls of a room
    n = 800
    a = np.stack([rng.uniform(0, 2, n), rng.uniform(0, 2, n), np.zeros(n)], 1)
    b = np.stack([np.zeros(n), rng.uniform(0, 2, n), rng.uniform(0, 2, n)], 1)
    c = np.stack([rng.uniform(0, 2, n), np.zeros(n), rng.uniform(0, 2, n)], 1)
    return np.concatenate([a, b, c])


def test_nearest_neighbors_exact(rng):
    ref = rng.normal(size=(257, 3))
    q = ref[[3, 77, 200]] + 1e-4
    idx, dist = nearest_neighbors(q, ref)
    assert list(idx) == [3, 77, 200]
    assert np.all(dist < 1e-3)


def test_downsample(cloud):
    d = random_downsample(cloud, 0.25, seed=0)
    assert len(d) == int(round(len(cloud) * 0.25))
    v = voxel_downsample(cloud, 0.5)
    assert 10 < len(v) < len(cloud)


def test_icp_recovers_similarity(cloud, rng):
    # known similarity: scale 2.5 (the reference's init_scale for EuRoC),
    # rotation about z, translation
    ang = 0.4
    R_gt = np.array([[np.cos(ang), -np.sin(ang), 0],
                     [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    s_gt, t_gt = 2.5, np.array([0.3, -0.2, 0.5])
    dst = (s_gt * (R_gt @ cloud.T)).T + t_gt
    # automatic centroid/RMS init stands in for the reference's hand-set
    # initial transform
    src = cloud + rng.normal(scale=0.002, size=cloud.shape)
    s, R, t = icp_register(src, dst, iters=50)
    assert abs(s - s_gt) < 0.05
    assert np.linalg.norm(R - R_gt) < 0.05
    assert np.linalg.norm(t - t_gt) < 0.1
    assert mean_cloud_distance(src, dst, (s, R, t)) < 0.02


def test_evaluate_reconstruction_files(cloud, tmp_path):
    est = tmp_path / "est.obj"
    gt = tmp_path / "gt.ply"
    with open(est, "w") as f:
        for p in cloud:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
    sub = cloud * 1.0
    with open(gt, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(sub)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in sub:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    assert load_cloud(str(est)).shape == cloud.shape
    assert load_cloud(str(gt)).shape == cloud.shape
    out = evaluate_reconstruction(str(est), str(gt), downsample_rate=0.3,
                                  icp_iters=15)
    assert abs(out["scale"] - 1.0) < 0.02
    assert out["mean_distance"] < 0.01
    assert out["n_est"] == len(cloud)
