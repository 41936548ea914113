"""Surface reconstruction: TSDF fusion + marching tetrahedra.

The reference's CARV subsystem (src/CARV/, SURVEY.md §2.1 Modeler row)
builds a mesh by incremental free-space carving of a 3D Delaunay
triangulation — an inherently sequential, combinatorial CPU algorithm
(CGAL + ray-tet vote counting). This module provides the same capability
(a triangle mesh of the scene surface from keyframe depth + visibility)
with a TPU-native algorithm instead: per-keyframe semi-dense depth is
densified and fused into a truncated signed distance field over a regular
voxel grid — the same free-space/behind-surface evidence CARV accumulates
per tetrahedron, on a grid — and the zero level set is extracted by
marching tetrahedra (6 tets/cell; the case table is derived
programmatically, no magic constants). Every stage is fixed-shape batched
work. Documented divergence: output is a level-set mesh rather than a
carved Delaunay complex.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera

# the 6 tetrahedra decomposing a cube, as corner indices of the cube's 8
# vertices (corner k = (k&1, (k>>1)&1, (k>>2)&1) in (x, y, z))
_TETS = np.asarray([
    [0, 5, 1, 6], [0, 1, 3, 6], [0, 3, 2, 6],
    [0, 2, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], np.int32)
# mismatch note: tets must share the main diagonal 0-6; the set above does.
_CORNER_OFF = np.asarray(
    [[k & 1, (k >> 1) & 1, (k >> 2) & 1] for k in range(8)], np.int32
)


def densify_depth(px: jnp.ndarray, rho: jnp.ndarray, valid: jnp.ndarray,
                  height: int, width: int, dilate: int = 2) -> jnp.ndarray:
    """Sparse semi-dense samples -> dense depth map [H, W] (0 = unknown)."""
    xi = jnp.clip(px[:, 0].astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(px[:, 1].astype(jnp.int32), 0, height - 1)
    z = jnp.where(valid & (rho > 1e-6), 1.0 / jnp.maximum(rho, 1e-6), 0.0)
    zmap = jnp.zeros((height * width,), jnp.float32).at[yi * width + xi].max(z)
    zmap = zmap.reshape(height, width)
    for _ in range(dilate):
        p = jnp.pad(zmap, 1)
        d = zmap
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                d = jnp.maximum(d, jax.lax.slice(
                    p, (dy, dx), (dy + height, dx + width)))
        zmap = jnp.where(zmap > 0, zmap, d)
    return zmap


@partial(jax.jit, static_argnames=("cam", "nx", "ny", "nz"))
def tsdf_fuse(
    cam: Camera,
    depth_maps: jnp.ndarray,   # [K, H, W] (0 = unknown)
    poses: jnp.ndarray,        # [K, 3, 4]
    origin: jnp.ndarray,       # [3] grid origin (world)
    voxel: jnp.ndarray,        # scalar voxel size
    nx: int = 96, ny: int = 96, nz: int = 96,
    trunc_factor: float = 4.0,
):
    """Fuse depth maps into (tsdf [nx,ny,nz], weight [nx,ny,nz])."""
    K, H, W = depth_maps.shape
    trunc = trunc_factor * voxel

    ii, jj, kk = jnp.meshgrid(
        jnp.arange(nx), jnp.arange(ny), jnp.arange(nz), indexing="ij"
    )
    Xw = origin[None, :] + voxel * jnp.stack(
        [ii.reshape(-1), jj.reshape(-1), kk.reshape(-1)], -1
    ).astype(jnp.float32)                                       # [V, 3]

    def one_view(carry, inp):
        tsdf, wsum = carry
        T, dm = inp
        xc = se3.apply(T, Xw)
        z = xc[:, 2]
        u = cam.fx * xc[:, 0] / jnp.maximum(z, 1e-6) + cam.cx
        v = cam.fy * xc[:, 1] / jnp.maximum(z, 1e-6) + cam.cy
        ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
        d = dm[vi, ui]
        ok = (z > 0.1) & (u >= 0) & (u < W) & (v >= 0) & (v < H) & (d > 0)
        sdf = d - z                                             # + in front
        w = jnp.where(ok & (sdf > -trunc), 1.0, 0.0)
        sdf_t = jnp.clip(sdf, -trunc, trunc) / trunc
        tsdf = tsdf + w * sdf_t
        wsum = wsum + w
        return (tsdf, wsum), None

    V = Xw.shape[0]
    (tsdf, wsum), _ = jax.lax.scan(
        one_view, (jnp.zeros((V,)), jnp.zeros((V,))), (poses, depth_maps)
    )
    tsdf = jnp.where(wsum > 0, tsdf / jnp.maximum(wsum, 1e-9), 1.0)
    return tsdf.reshape(nx, ny, nz), wsum.reshape(nx, ny, nz)


@partial(jax.jit, static_argnames=("max_tris", "n_slabs"))
def marching_tetrahedra(
    tsdf: jnp.ndarray,
    weight: jnp.ndarray,
    origin: jnp.ndarray,
    voxel: jnp.ndarray,
    min_weight: float = 2.0,
    max_tris: int = 200_000,
    n_slabs: int = 16,
):
    """Zero level set as triangles. Returns (tris [T, 3, 3], valid [T]).

    Cells process in n_slabs x-slabs under lax.map so peak memory is
    bounded by ONE slab's intermediates regardless of grid resolution — a
    monolithic 96^3 pass holds several [C, 6, 6, 3] tensors (~370 MB
    each) live at once and exhausted a 16 GB chip inside a long-running
    bench process. Each slab keeps a FULL max_tris budget (the stacked
    slab outputs are ~100 MB — cheap next to the per-slab intermediates)
    so a surface concentrated in one slab, e.g. a wall perpendicular to
    the slab axis, is never silently truncated below the global cap."""
    nx, ny, nz = tsdf.shape
    cy, cz = ny - 1, nz - 1
    cx = nx - 1
    # pad x so cells split evenly into slabs (padded cells carry weight 0
    # and die on the cell_ok gate)
    pad = (-cx) % n_slabs
    if pad:
        tsdf = jnp.pad(tsdf, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
        weight = jnp.pad(weight, ((0, pad), (0, 0), (0, 0)))
    sx = (cx + pad) // n_slabs            # cells per slab along x

    off = jnp.asarray(_CORNER_OFF)
    tets = jnp.asarray(_TETS)                                   # [6, 4]
    E_np = np.asarray([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
    E = jnp.asarray(E_np, jnp.int32)

    # case table: for each of the 16 sign patterns, which 3-edge
    # intersections form the triangle(s)
    tri_table = np.full((16, 2, 3), -1, np.int64)
    edge_of = {(a, b): e for e, (a, b) in enumerate(map(tuple, E_np))}
    edge_of.update({(b, a): e for (a, b), e in list(edge_of.items())})
    for case in range(16):
        ins = [v for v in range(4) if case >> v & 1]
        outs = [v for v in range(4) if not case >> v & 1]
        if len(ins) == 1:
            tri_table[case, 0] = [edge_of[(ins[0], o)] for o in outs]
        elif len(ins) == 3:
            tri_table[case, 0] = [edge_of[(outs[0], i)] for i in ins]
        elif len(ins) == 2:
            a, b = ins
            c, d = outs
            quad = [edge_of[(a, c)], edge_of[(a, d)],
                    edge_of[(b, d)], edge_of[(b, c)]]
            tri_table[case, 0] = [quad[0], quad[1], quad[2]]
            tri_table[case, 1] = [quad[0], quad[2], quad[3]]
    tri_tab = jnp.asarray(tri_table)                            # [16, 2, 3]

    slab_budget = max_tris

    def one_slab(x0):
        ii, jj, kk = jnp.meshgrid(
            jnp.arange(sx), jnp.arange(cy), jnp.arange(cz), indexing="ij"
        )
        base = jnp.stack(
            [x0 + ii.reshape(-1), jj.reshape(-1), kk.reshape(-1)], -1
        )                                                       # [C, 3]
        corner_idx = base[:, None, :] + off[None, :, :]         # [C, 8, 3]
        f = tsdf[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]
        wgt = weight[corner_idx[..., 0], corner_idx[..., 1],
                     corner_idx[..., 2]]
        pos = origin[None, None, :] + voxel * corner_idx.astype(jnp.float32)
        cell_ok = jnp.all(wgt >= min_weight, axis=1)            # [C]

        fv = f[:, tets]                                         # [C, 6, 4]
        pv = pos[:, tets]                                       # [C, 6, 4, 3]
        inside = fv < 0.0
        fa = fv[..., E[:, 0]]
        fb = fv[..., E[:, 1]]
        t = fa / jnp.where(jnp.abs(fa - fb) < 1e-12, 1e-12, fa - fb)
        pa = pv[:, :, E[:, 0], :]
        pb = pv[:, :, E[:, 1], :]
        pe = pa + t[..., None] * (pb - pa)                      # [C, 6, 6, 3]

        code = jnp.sum(inside.astype(jnp.int32) * jnp.asarray([1, 2, 4, 8]),
                       -1)
        tcase = tri_tab[code]                                   # [C, 6, 2, 3]
        tvalid = (tcase[..., 0] >= 0) & cell_ok[:, None, None]  # [C, 6, 2]
        esafe = jnp.clip(tcase, 0, 5)
        # one flat gather (no broadcast of pe)
        C6 = pe.shape[0] * pe.shape[1]
        flat_pe = pe.reshape(C6 * 6, 3)
        bidx = (jnp.arange(C6, dtype=jnp.int32) * 6).reshape(
            pe.shape[0], pe.shape[1], 1, 1)
        tris = flat_pe[(bidx + esafe).reshape(-1)].reshape(-1, 3, 3)
        tvalid = tvalid.reshape(-1)
        take = jnp.argsort(~tvalid)[:slab_budget]
        return tris[take], tvalid[take]

    tris, tvalid = jax.lax.map(one_slab, jnp.arange(n_slabs) * sx)
    tris = tris.reshape(-1, 3, 3)
    tvalid = tvalid.reshape(-1)
    take = jnp.argsort(~tvalid)[:max_tris]
    return tris[take], tvalid[take]


def extract_mesh(cam: Camera, result, poses, height: int, width: int,
                 n_voxels: int = 96, margin: float = 0.2):
    """Semi-dense result -> (tris [T, 3, 3] np, count). Host wrapper that
    picks grid bounds from the fused cloud."""
    pts = np.asarray(result.points_w).reshape(-1, 3)
    val = np.asarray(result.valid).reshape(-1)
    if val.sum() < 100:
        return np.zeros((0, 3, 3), np.float32), 0
    P = pts[val]
    lo = np.percentile(P, 2, axis=0) - margin
    hi = np.percentile(P, 98, axis=0) + margin
    voxel = float((hi - lo).max() / (n_voxels - 1))
    origin = jnp.asarray(lo, jnp.float32)

    dms = []
    for k in range(len(poses)):
        dms.append(densify_depth(
            result.pixels[k], result.inv_depth[k], result.valid[k],
            height, width,
        ))
    tsdf, w = tsdf_fuse(
        cam, jnp.stack(dms), jnp.asarray(poses, jnp.float32), origin,
        jnp.float32(voxel), nx=n_voxels, ny=n_voxels, nz=n_voxels,
    )
    tris, tv = marching_tetrahedra(tsdf, w, origin, jnp.float32(voxel))
    tris = np.asarray(tris)[np.asarray(tv)]
    return tris, len(tris)


def save_mesh_obj(path: str, tris: np.ndarray) -> int:
    """Triangle soup .obj (Model export parity, src/Modeler.cc:77)."""
    with open(path, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
        for i in range(len(tris)):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
    return len(tris)
