"""3D line segments from semi-dense depth + multi-view line clustering.

Rebuilds the reference's line stack (SURVEY.md §2.1 LineDetector row +
§2.2 Line3Dpp row):

- fit_3d_segments  <- LineDetector::LineFit (src/LineDetector.cc:712-841):
  each 2D segment samples the semi-dense inverse-depth field along its
  length, back-projects, and fits a robust 3D line (two IRLS rounds of
  PCA); endpoints come from inlier extent.
- cluster_world_segments <- the Line3D++ role (multi-view reconstruction,
  src/LineDetector.cc:167-249): world-frame segments from all keyframes
  cluster by direction + mutual line distance; clusters merge into single
  segments by weighted PCA. Pairwise tensors on device, a tiny union-find
  on host.
- save_lines_obj <- the .obj line export (src/LineDetector.cc:535,1091).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera


class Segments3D(NamedTuple):
    seg: jnp.ndarray     # [L, 6] world (x1 y1 z1 x2 y2 z2)
    valid: jnp.ndarray   # [L]


@partial(jax.jit, static_argnames=("cam", "n_samples", "height", "width"))
def fit_3d_segments(
    cam: Camera,
    segs2d: jnp.ndarray,     # [L, 4]
    seg_valid: jnp.ndarray,  # [L]
    px: jnp.ndarray,         # [N, 2] semi-dense pixels of this keyframe
    rho: jnp.ndarray,        # [N] fused inverse depths
    px_valid: jnp.ndarray,   # [N]
    T_cw: jnp.ndarray,
    height: int = 480,
    width: int = 640,
    n_samples: int = 32,
    min_support: float = 0.5,
) -> Segments3D:
    L = segs2d.shape[0]

    # scatter the sparse semi-dense depth into a dense inverse-depth map
    xi = jnp.clip(px[:, 0].astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(px[:, 1].astype(jnp.int32), 0, height - 1)
    flat = yi * width + xi
    rho_map = jnp.zeros((height * width,), jnp.float32).at[flat].max(
        jnp.where(px_valid, rho, 0.0)
    ).reshape(height, width)

    # 3x3 dilation so segment samples tolerate 1px misalignment
    p = jnp.pad(rho_map, 1)
    dil = rho_map
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            dil = jnp.maximum(dil, jax.lax.slice(p, (dy, dx), (dy + height, dx + width)))

    t = jnp.linspace(0.0, 1.0, n_samples)
    pts = segs2d[:, None, :2] + t[None, :, None] * (
        segs2d[:, None, 2:] - segs2d[:, None, :2]
    )                                                       # [L, S, 2]
    sx = jnp.clip(pts[..., 0].astype(jnp.int32), 0, width - 1)
    sy = jnp.clip(pts[..., 1].astype(jnp.int32), 0, height - 1)
    r = dil[sy, sx]                                         # [L, S]
    has_depth = r > 1e-6
    support = jnp.mean(has_depth, axis=1)

    # back-project to camera then world
    xn = jnp.stack([
        (pts[..., 0] - cam.cx) / cam.fx,
        (pts[..., 1] - cam.cy) / cam.fy,
        jnp.ones_like(pts[..., 0]),
    ], -1)
    Xc = xn / jnp.maximum(r, 1e-6)[..., None]
    Xw = se3.apply(se3.inverse(T_cw)[None, None], Xc)       # [L, S, 3]

    def robust_line(X, w0):
        w = w0
        c = jnp.zeros((3,))
        d = jnp.asarray([1.0, 0.0, 0.0])
        for _ in range(3):   # PCA + two IRLS reweightings (LineFit's trim)
            wn = w / jnp.maximum(jnp.sum(w), 1e-9)
            c = jnp.einsum("s,si->i", wn, X)
            cov = jnp.einsum("s,si,sj->ij", wn, X - c, X - c)
            _, V = jnp.linalg.eigh(cov)
            d = V[:, -1]
            res = jnp.linalg.norm(
                (X - c) - jnp.einsum("si,i->s", X - c, d)[:, None] * d, axis=-1
            )
            med = jnp.median(jnp.where(w0 > 0, res, 1e9))
            w = w0 * (res < 3.0 * jnp.maximum(med, 1e-3))
        s = jnp.einsum("si,i->s", X - c, d)
        s_lo = jnp.min(jnp.where(w > 0, s, 1e9))
        s_hi = jnp.max(jnp.where(w > 0, s, -1e9))
        frac = jnp.sum(w) / jnp.maximum(jnp.sum(w0), 1e-9)
        p1 = c + s_lo * d
        p2 = c + s_hi * d
        return jnp.concatenate([p1, p2]), frac

    seg3, inlier_frac = jax.vmap(robust_line)(Xw, has_depth.astype(jnp.float32))
    ok = seg_valid & (support >= min_support) & (inlier_frac > 0.6)
    length = jnp.linalg.norm(seg3[:, 3:] - seg3[:, :3], axis=-1)
    ok &= (length > 0.05) & (length < 20.0) & jnp.all(jnp.isfinite(seg3), axis=-1)
    return Segments3D(seg=seg3, valid=ok)


@jax.jit
def segment_affinity(seg: jnp.ndarray, valid: jnp.ndarray,
                     angle_tol_deg: float = 5.0, dist_tol: float = 0.08):
    """[N, N] same-line adjacency: direction within tolerance AND each
    segment's midpoint close to the other's infinite line."""
    d = seg[:, 3:] - seg[:, :3]
    n = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    cosang = jnp.abs(n @ n.T)
    mid = 0.5 * (seg[:, :3] + seg[:, 3:])
    rel = mid[:, None, :] - seg[None, :, :3]
    proj = jnp.einsum("ijk,jk->ij", rel, n)
    perp = rel - proj[..., None] * n[None, :, :]
    dist = jnp.linalg.norm(perp, axis=-1)
    adj = (cosang > np.cos(np.deg2rad(angle_tol_deg))) \
        & (dist < dist_tol) & (dist.T < dist_tol)
    return adj & valid[:, None] & valid[None, :]


def cluster_world_segments(seg: np.ndarray, valid: np.ndarray,
                           min_views: int = 2):
    """Union-find over the affinity graph; merge each cluster into one
    segment (weighted PCA of member endpoints). Segments observed from
    fewer than min_views keyframes are dropped — the Line3D++ multi-view
    verification role. seg: [N, 6] with an accompanying kf id per segment
    folded in by the caller via distinct rows."""
    adj = np.asarray(segment_affinity(jnp.asarray(seg), jnp.asarray(valid)))
    N = len(seg)
    parent = np.arange(N)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(N):
        if not valid[i]:
            continue
        for j in np.nonzero(adj[i])[0]:
            if j > i:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[rb] = ra

    clusters = {}
    for i in range(N):
        if valid[i]:
            clusters.setdefault(find(i), []).append(i)

    merged = []
    for root, members in clusters.items():
        if len(members) < min_views:
            continue
        ends = seg[members].reshape(-1, 3)
        c = ends.mean(0)
        _, _, Vt = np.linalg.svd(ends - c)
        d = Vt[0]
        s = (ends - c) @ d
        merged.append(np.concatenate([c + s.min() * d, c + s.max() * d]))
    return np.asarray(merged).reshape(-1, 6)


def save_lines_obj(path: str, segments: np.ndarray) -> int:
    """.obj export with line elements (LineDetector's SaveLines)."""
    with open(path, "w") as f:
        for s in segments:
            f.write(f"v {s[0]:.5f} {s[1]:.5f} {s[2]:.5f}\n")
            f.write(f"v {s[3]:.5f} {s[4]:.5f} {s[5]:.5f}\n")
        for i in range(len(segments)):
            f.write(f"l {2*i+1} {2*i+2}\n")
    return len(segments)
