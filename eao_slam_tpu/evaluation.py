"""Offline reconstruction evaluation (eval/*.m pipeline parity).

Rebuild of the reference's MATLAB point-cloud evaluation
(eval/downsample.m -> eval/register.m -> eval/evaluate.m, eval/README —
SURVEY.md §2.1 L7 row): downsample the estimated and ground-truth clouds,
register them with scaled ICP (the reference runs MATLAB pcregistericp +
an fminsearch over a global scale), then report the mean distance of
estimated vertices to their nearest ground-truth vertex.

The MATLAB loop (per-iteration KD-tree queries) becomes batched JAX:
nearest neighbours are chunked [C, M] pairwise-distance argmins — an
MXU-friendly dense program — and the similarity fit per ICP iteration is
a closed-form Umeyama solve, so scale is estimated jointly instead of by
an outer scalar search. Clouds load from .obj/.ply/.xyz vertex lists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.io.trajectory import umeyama_alignment


# ---------------------------------------------------------------------------
# cloud I/O (the reference pipeline reads .ply converted from .obj)
# ---------------------------------------------------------------------------

def load_cloud(path: str) -> np.ndarray:
    """Vertices [N, 3] from .obj (``v x y z`` rows), ascii .ply, or plain
    whitespace-separated xyz rows."""
    pts = []
    if path.endswith(".ply"):
        with open(path, "rb") as f:
            header = []
            while True:
                line = f.readline().decode("ascii", "ignore").strip()
                header.append(line)
                if line == "end_header":
                    break
            n = next(int(h.split()[-1]) for h in header
                     if h.startswith("element vertex"))
            fmt = next((h for h in header if h.startswith("format")), "ascii")
            if "ascii" not in fmt:
                raise ValueError("only ascii .ply supported")
            for _ in range(n):
                vals = f.readline().split()
                pts.append([float(v) for v in vals[:3]])
        return np.asarray(pts, np.float64)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":          # .obj vertex
                pts.append([float(v) for v in parts[1:4]])
            elif parts[0][0] not in "#vfgl" and len(parts) >= 3:
                try:
                    pts.append([float(v) for v in parts[:3]])
                except ValueError:
                    continue
    return np.asarray(pts, np.float64)


def random_downsample(points: np.ndarray, rate: float = 0.1,
                      seed: int = 0) -> np.ndarray:
    """pcdownsample(...,'random',rate) equivalent (eval/downsample.m)."""
    n = len(points)
    k = max(1, int(round(n * rate)))
    idx = np.random.default_rng(seed).choice(n, size=min(k, n), replace=False)
    return points[np.sort(idx)]


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Grid downsampling: one (mean) point per occupied voxel."""
    keys = np.floor(points / voxel).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    sums = np.zeros((len(counts), 3))
    np.add.at(sums, inv, points)
    return sums / counts[:, None]


# ---------------------------------------------------------------------------
# nearest neighbours + scaled ICP
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _nn_chunk(chunk: jnp.ndarray, ref: jnp.ndarray):
    """[C, 3] x [M, 3] -> (idx [C], dist [C]) via one dense distance tile."""
    d2 = (jnp.sum(chunk**2, 1)[:, None] + jnp.sum(ref**2, 1)[None, :]
          - 2.0 * chunk @ ref.T)
    idx = jnp.argmin(d2, axis=1)
    return idx, jnp.sqrt(jnp.maximum(jnp.take(d2, idx + jnp.arange(chunk.shape[0]) * ref.shape[0]), 0.0))


def nearest_neighbors(query: np.ndarray, ref: np.ndarray,
                      chunk: int = 4096):
    """Nearest ref vertex per query vertex; returns (idx [N], dist [N])."""
    ref_j = jnp.asarray(ref, jnp.float32)
    idxs, dists = [], []
    for s in range(0, len(query), chunk):
        q = np.asarray(query[s:s + chunk], np.float32)
        pad = chunk - len(q)
        if pad:
            q = np.concatenate([q, np.zeros((pad, 3), np.float32)])
        i, d = _nn_chunk(jnp.asarray(q), ref_j)
        idxs.append(np.asarray(i)[: chunk - pad])
        dists.append(np.asarray(d)[: chunk - pad])
    return np.concatenate(idxs), np.concatenate(dists)


def icp_register(src: np.ndarray, dst: np.ndarray, iters: int = 30,
                 with_scale: bool = True, trim: float = 0.9,
                 init: tuple | None = None):
    """Scaled trimmed ICP: returns (s, R, t) with dst ≈ s·R·src + t.

    Covers eval/register.m (pcregistericp + fminsearch scale): each
    iteration matches every src point to its nearest dst point, keeps the
    closest `trim` fraction (robustness to partial overlap), and solves
    the similarity in closed form (Umeyama) — scale inside the loop
    rather than an outer search.
    """
    if init is None:
        # centroid + RMS-radius initialization — the automatic counterpart
        # of register.m's hand-set init_scale/initial transform (which the
        # reference warns are "critical to correctly estimating the
        # transform")
        ms, md = src.mean(0), dst.mean(0)
        rs = np.sqrt(((src - ms) ** 2).sum(1).mean())
        rd = np.sqrt(((dst - md) ** 2).sum(1).mean())
        s = float(rd / max(rs, 1e-12))
        R = np.eye(3)
        t = md - s * R @ ms
    else:
        s, R, t = init
    for _ in range(iters):
        moved = (s * (R @ src.T)).T + t
        idx, dist = nearest_neighbors(moved, dst)
        if trim < 1.0:
            keep = dist <= np.quantile(dist, trim)
        else:
            keep = np.ones(len(dist), bool)
        if keep.sum() < 4:
            break
        s2, R2, t2 = umeyama_alignment(src[keep], dst[idx[keep]], with_scale)
        if (abs(s2 - s) < 1e-9 and np.allclose(R2, R, atol=1e-9)
                and np.allclose(t2, t, atol=1e-9)):
            s, R, t = s2, R2, t2
            break
        s, R, t = s2, R2, t2
    return s, R, t


def mean_cloud_distance(est: np.ndarray, gt: np.ndarray,
                        transform: tuple | None = None) -> float:
    """Mean distance of estimated vertices to nearest GT vertex
    (eval/evaluate.m's printed metric)."""
    if transform is not None:
        s, R, t = transform
        est = (s * (R @ est.T)).T + t
    _, dist = nearest_neighbors(est, gt)
    return float(dist.mean())


def evaluate_reconstruction(est_path: str, gt_path: str,
                            downsample_rate: float = 0.1,
                            icp_iters: int = 30) -> dict:
    """Full eval/ pipeline on files: downsample -> register (scaled ICP on
    the downsampled clouds) -> evaluate (mean vertex distance of the full
    estimated cloud under the fitted transform)."""
    est = load_cloud(est_path)
    gt = load_cloud(gt_path)
    est_d = random_downsample(est, downsample_rate, seed=1)
    gt_d = random_downsample(gt, downsample_rate, seed=2)
    s, R, t = icp_register(est_d, gt_d, iters=icp_iters)
    mean_d = mean_cloud_distance(est, gt, (s, R, t))
    return {
        "scale": float(s),
        "mean_distance": mean_d,
        "n_est": int(len(est)),
        "n_gt": int(len(gt)),
    }
