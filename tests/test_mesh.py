"""TSDF fusion + marching tetrahedra (the CARV surface-model replacement)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eao_slam_tpu.dense.mesh import (
    densify_depth,
    marching_tetrahedra,
    save_mesh_obj,
    tsdf_fuse,
)
from eao_slam_tpu.geometry.camera import TUM3


def test_tsdf_of_flat_wall():
    """A frontal wall at z=4 seen from the origin: the zero crossing of the
    fused TSDF must lie at z≈4 and the mesh triangles on that plane."""
    H, W = 120, 160
    cam = TUM3._replace(width=W, height=H, fx=140.0, fy=140.0, cx=80.0, cy=60.0)
    depth = jnp.full((1, H, W), 4.0)
    pose = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)[None]

    n = 48
    origin = jnp.asarray([-1.0, -1.0, 3.0])
    voxel = jnp.float32(2.0 / (n - 1))
    tsdf, w = tsdf_fuse(cam, depth, pose, origin, voxel, nx=n, ny=n, nz=n)

    # sdf sign: in front of the wall (z<4) positive, behind negative
    zs = np.asarray(origin)[2] + np.asarray(voxel) * np.arange(n)
    mid = n // 2
    t = np.asarray(tsdf)[mid, mid, :]
    wt = np.asarray(w)[mid, mid, :]
    seen = wt > 0
    assert (t[seen & (zs < 3.8)] > 0).all()
    assert (t[seen & (zs > 4.2)] <= 0).all()

    tris, tv = marching_tetrahedra(tsdf, w, origin, voxel, min_weight=1.0,
                                   max_tris=50_000)
    tris = np.asarray(tris)[np.asarray(tv)]
    assert len(tris) > 200
    # all mesh vertices on the z=4 plane (within a voxel)
    zerr = np.abs(tris[..., 2] - 4.0)
    assert zerr.max() < 2.1 * float(voxel), zerr.max()


def test_densify_and_save(tmp_path, rng):
    H, W = 60, 80
    px = rng.uniform([2, 2], [W - 2, H - 2], (300, 2)).astype(np.float32)
    rho = np.full(300, 0.25, np.float32)
    zmap = densify_depth(jnp.asarray(px), jnp.asarray(rho),
                         jnp.ones(300, bool), H, W)
    z = np.asarray(zmap)
    assert (np.abs(z[z > 0] - 4.0) < 1e-4).all()
    assert (z > 0).mean() > 0.5  # dilation filled most of the map

    tris = rng.uniform(-1, 1, (5, 3, 3)).astype(np.float32)
    n = save_mesh_obj(str(tmp_path / "mesh.obj"), tris)
    assert n == 5
    text = (tmp_path / "mesh.obj").read_text()
    assert text.count("\nf ") + text.startswith("f ") == 5 or "f 13 14 15" in text
