"""Semi-dense probabilistic mapping: batched inverse-depth sweeps.

TPU-native rebuild of ProbabilityMapping (src/ProbabilityMapping.cc,
include/ProbabilityMapping.h — SURVEY.md §2.1): the reference walks the
epipolar line per edge pixel per neighbor inside an OpenMP loop
(EpipolarSearch, :749-845) with three gradient/angle gates, photometric +
gradient SSD matching, subpixel refinement and an uncertainty estimate;
hypotheses from 7 neighbors are chi2-fused (InverseDepthHypothesisFusion,
:978-1009) and cross-checked between keyframes (:1011-1295).

The TPU formulation replaces the pixel-walk with an **inverse-depth sweep**:
every (edge pixel, depth sample) pair projects into the neighbor in one
fixed-shape batch — the same correspondence search, shaped as a dense
[N_pix, D] tensor instead of a data-dependent line walk. Gates, scoring,
parabolic subpixel refinement and the chi-squared hypothesis fusion are all
elementwise over that tensor. Edge pixels are selected by gradient top-k
(the EdgeDrawing chain mask reduces to 'strong-gradient pixel' for depth
purposes, SURVEY.md §2.2 EDTest row).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import SemiDenseConfig
from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera
from eao_slam_tpu.ops.image import sobel_gradients


class SemiDenseResult(NamedTuple):
    pixels: jnp.ndarray      # [K, N, 2] (x, y)
    inv_depth: jnp.ndarray   # [K, N] fused inverse depth
    sigma: jnp.ndarray       # [K, N] fused std
    valid: jnp.ndarray       # [K, N]
    points_w: jnp.ndarray    # [K, N, 3] world points


def bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img [H, W] at uv [..., 2] (x, y); out-of-range clamped."""
    H, W = img.shape
    x = jnp.clip(uv[..., 0], 0.0, W - 1.001)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


@partial(jax.jit, static_argnames=("n_pix", "cell"))
def select_edge_pixels(img: jnp.ndarray, n_pix: int, lambda_g: float = 8.0,
                       cell: int = 16):
    """Spatially-spread strong-gradient pixels -> (uv [N, 2] f32, valid [N]).

    Per-tile top-m selection (m = n_pix / n_tiles) followed by a global
    top-n_pix trim — the EdgeDrawing chains the reference restricts depth to
    (src/ProbabilityMapping.cc:454) cover every textured region of the
    frame, whereas a single global top-k collapses onto the few strongest
    contours and starves low-contrast areas (the round-2 behavior)."""
    gx, gy, mag = sobel_gradients(img)
    H, W = img.shape
    border = 8
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    score = jnp.where(inb & (mag > lambda_g * 4.0), mag, 0.0)

    # pack (score | linear idx) so per-tile top-k recovers positions
    idx_map = (ys * W + xs).astype(jnp.int32)
    # score field: 11 bits (Sobel magnitude of uint8 input <= 1443), index
    # field: 20 bits (VGA = 307200 < 2^20); bit 31 stays clear
    comb = (jnp.clip(score, 0, 2047).astype(jnp.int32) << 20) | idx_map
    ph = (cell - H % cell) % cell
    pw = (cell - W % cell) % cell
    sp = jnp.pad(comb, ((0, ph), (0, pw)))
    H2, W2 = sp.shape
    th, tw = H2 // cell, W2 // cell
    tiles = sp.reshape(th, cell, tw, cell).transpose(0, 2, 1, 3).reshape(
        th * tw, cell * cell
    )
    m = max(1, -(-n_pix // (th * tw)))                      # ceil per-tile quota
    per_tile, _ = jax.lax.top_k(tiles, min(m, cell * cell))  # [tiles, m]
    pool = per_tile.reshape(-1)
    top, _ = jax.lax.top_k(pool, n_pix)                      # global trim
    pix = top & ((1 << 20) - 1)
    uv = jnp.stack([(pix % W).astype(jnp.float32),
                    (pix // W).astype(jnp.float32)], -1)
    return uv, (top >> 20) > 0


@partial(jax.jit, static_argnames=("cam", "n_depth", "sd"))
def depth_sweep(
    cam: Camera,
    img_ref: jnp.ndarray,
    img_nb: jnp.ndarray,
    T_ref: jnp.ndarray,
    T_nb: jnp.ndarray,
    uv_ref: jnp.ndarray,      # [N, 2]
    px_valid: jnp.ndarray,    # [N]
    rho_min: jnp.ndarray,
    rho_max: jnp.ndarray,
    sd: SemiDenseConfig = SemiDenseConfig(),
    n_depth: int = 64,
):
    """One (keyframe, neighbor) hypothesis: per edge pixel the best inverse
    depth + uncertainty. Replaces EpipolarSearch + ComputeInvDepthHypothesis
    (src/ProbabilityMapping.cc:749-845, 1310-1360)."""
    N = uv_ref.shape[0]
    D = n_depth

    gx_r, gy_r, mag_r = sobel_gradients(img_ref)
    gx_n, gy_n, mag_n = sobel_gradients(img_nb)

    i_ref = bilinear(img_ref, uv_ref)                    # [N]
    g_ref = bilinear(mag_r, uv_ref)
    ang_ref = jnp.arctan2(bilinear(gy_r, uv_ref), bilinear(gx_r, uv_ref))

    T_rel = se3.compose(T_nb, se3.inverse(T_ref))        # ref cam -> nb cam
    rhos = rho_min + (rho_max - rho_min) * jnp.linspace(0.0, 1.0, D)  # [D]

    xn = jnp.stack([
        (uv_ref[:, 0] - cam.cx) / cam.fx,
        (uv_ref[:, 1] - cam.cy) / cam.fy,
        jnp.ones((N,)),
    ], -1)                                               # [N, 3] ray
    X = xn[:, None, :] / jnp.maximum(rhos, 1e-6)[None, :, None]   # [N, D, 3]
    xc = se3.apply(T_rel[None, None], X)                 # [N, D, 3]
    z = xc[..., 2]
    u = cam.fx * xc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx
    v = cam.fy * xc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy
    uv_n = jnp.stack([u, v], -1)                         # [N, D, 2]

    in_img = (z > 0.1) & (u >= 2) & (u < cam.width - 2) & (v >= 2) & (v < cam.height - 2)

    i_nb = bilinear(img_nb, uv_n)                        # [N, D]
    g_nb = bilinear(mag_n, uv_n)
    ang_nb = jnp.arctan2(bilinear(gy_n, uv_n), bilinear(gx_n, uv_n))

    # the reference's three gates (:787-808): neighbor gradient magnitude,
    # epipolar-angle vs gradient-angle, orientation consistency
    epi_dir = uv_n[:, :, :] - uv_n[:, :1, :]             # along-sweep direction
    epi_ang = jnp.arctan2(epi_dir[..., 1], epi_dir[..., 0])
    d_epi = jnp.abs(jnp.mod(ang_nb - epi_ang + jnp.pi / 2, jnp.pi) - jnp.pi / 2)
    d_ori = jnp.abs(jnp.mod(ang_nb - ang_ref[:, None] + jnp.pi, 2 * jnp.pi) - jnp.pi)
    gate = in_img & (g_nb > sd.lambda_g)
    gate &= d_epi < jnp.deg2rad(sd.lambda_l)
    gate &= d_ori < jnp.deg2rad(sd.lambda_theta)

    # photometric + gradient SSD score (:809-813)
    err_i = i_nb - i_ref[:, None]
    err_g = g_nb - g_ref[:, None]
    score = (err_i * err_i + err_g * err_g / sd.theta) / (sd.sigma_i**2)
    BIG = jnp.float32(1e9)
    score = jnp.where(gate, score, BIG)

    best = jnp.argmin(score, axis=1)                     # [N]
    s_best = jnp.take_along_axis(score, best[:, None], 1)[:, 0]
    ok = px_valid & (s_best < BIG * 0.5)

    # parabolic subpixel refinement over the inverse-depth axis (:825-842)
    bm = jnp.clip(best - 1, 0, D - 1)
    bp = jnp.clip(best + 1, 0, D - 1)
    sm = jnp.take_along_axis(score, bm[:, None], 1)[:, 0]
    sp = jnp.take_along_axis(score, bp[:, None], 1)[:, 0]
    denom = sm - 2 * s_best + sp
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (sm - sp) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    step = (rho_max - rho_min) / (D - 1)
    rho = rhos[best] + delta * step

    # uncertainty from the score curvature: sigma^2 ~ 2 / d2s/drho2, floored
    # at one sweep step (curvature of a locally sharp SSD minimum
    # underestimates the geometric ambiguity of low-texture edges)
    curv = jnp.maximum(denom, 1e-6) / (step * step)
    sigma = jnp.sqrt(2.0 / curv)
    sigma = jnp.clip(sigma, step, (rho_max - rho_min))

    return rho, sigma, ok


@jax.jit
def fuse_hypotheses(rho: jnp.ndarray, sigma: jnp.ndarray, ok: jnp.ndarray,
                    lambda_n: int = 3):
    """Chi-squared compatibility fusion over neighbor hypotheses
    (InverseDepthHypothesisFusion, :978-1009): for each pixel pick the
    hypothesis with most compatible peers (|rho_i - rho_j| under the joint
    2-sigma gate) and inverse-variance fuse its clique."""
    # rho/sigma/ok: [N, Hn]
    diff = jnp.abs(rho[:, :, None] - rho[:, None, :])
    tol = 2.0 * jnp.sqrt(sigma[:, :, None] ** 2 + sigma[:, None, :] ** 2)
    compat = (diff < tol) & ok[:, :, None] & ok[:, None, :]
    support = jnp.sum(compat, axis=2)                     # [N, Hn]
    best = jnp.argmax(support, axis=1)
    clique = jnp.take_along_axis(compat, best[:, None, None], 1)[:, 0, :]  # [N, Hn]
    w = jnp.where(clique, 1.0 / jnp.maximum(sigma, 1e-9) ** 2, 0.0)
    wsum = jnp.sum(w, axis=1)
    rho_f = jnp.sum(w * rho, axis=1) / jnp.maximum(wsum, 1e-12)
    sigma_f = jnp.sqrt(1.0 / jnp.maximum(wsum, 1e-12))
    n_support = jnp.take_along_axis(support, best[:, None], 1)[:, 0]
    valid = n_support >= lambda_n
    return rho_f, sigma_f, valid


@partial(jax.jit, static_argnames=("cam", "n_gn"))
def inter_kf_check(
    cam: Camera,
    uv: jnp.ndarray,          # [N, 2] ref pixels
    rho: jnp.ndarray,         # [N] fused inverse depth (ref frame)
    valid: jnp.ndarray,       # [N]
    T_ref: jnp.ndarray,       # [3, 4]
    T_nbs: jnp.ndarray,       # [Hn, 3, 4] neighbor poses
    nb_rho_maps: jnp.ndarray,   # [Hn, H, W] neighbor fused inv-depth (0 = none)
    nb_sig_maps: jnp.ndarray,   # [Hn, H, W] neighbor fused sigma
    min_support: int = 2,
    n_gn: int = 3,
):
    """Inter-keyframe depth-consistency check + Gauss-Newton refinement
    (ProbabilityMapping::InterKeyFrameDepthChecking,
    src/ProbabilityMapping.cc:1011-1295).

    Each ref pixel's depth is projected into every neighbor keyframe; the
    neighbor's own fused inverse depth at the landing pixel must agree under
    the chi-square(1) 95% gate ((rho_nb - rho_proj)^2 / sigma_nb^2 < 3.84).
    Pixels with < min_support agreeing neighbors are culled; survivors get
    their inverse depth Gauss-Newton-refined against the agreeing set
    (minimizing sum_j ((rho_proj_j(rho) - rho_nb_j) / sigma_nb_j)^2).

    Returns (rho_refined [N], valid [N], n_support [N]).
    """
    N = uv.shape[0]
    Hn = T_nbs.shape[0]
    H, W = nb_rho_maps.shape[1:]

    xn = jnp.stack([
        (uv[:, 0] - cam.cx) / cam.fx,
        (uv[:, 1] - cam.cy) / cam.fy,
        jnp.ones((N,)),
    ], -1)                                                  # [N, 3]

    T_rel = jax.vmap(lambda Tn: se3.compose(Tn, se3.inverse(T_ref)))(T_nbs)
    # z_nb(rho) = (r3 . xn) / rho + t_z  =>  rho_proj = rho / (a + t_z rho)
    a = jnp.einsum("hj,nj->hn", T_rel[:, 2, :3], xn)        # [Hn, N]
    tz = T_rel[:, 2, 3][:, None]                            # [Hn, 1]

    def project_lookup(rho_cur):
        """rho_cur [N] -> per-neighbor (rho_proj, rho_nb, sig_nb, hit).

        The fused depth maps are sparse (edge pixels only) and edges are
        ~1 px thin, so the landing pixel is probed over a 3x3 neighborhood
        and the most compatible valid entry wins — the same tolerance the
        reference gets from its contiguous edge-chain depth maps."""
        X = xn[None] / jnp.maximum(rho_cur, 1e-6)[None, :, None]  # [1, N, 3]
        xc = se3.apply(T_rel[:, None], X)                   # [Hn, N, 3]
        z = xc[..., 2]
        u = cam.fx * xc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx
        v = cam.fy * xc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 1, W - 2)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 1, H - 2)
        in_img = (z > 0.1) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        rho_proj = rho_cur[None] / jnp.maximum(
            a + tz * rho_cur[None], 1e-6
        )

        BIG = jnp.float32(1e9)
        best_err = jnp.full((Hn, N), BIG)
        rho_nb = jnp.zeros((Hn, N))
        sig_nb = jnp.zeros((Hn, N))
        flat_rho = nb_rho_maps.reshape(Hn, -1)
        flat_sig = nb_sig_maps.reshape(Hn, -1)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                idx = (vi + dy) * W + (ui + dx)
                r = jnp.take_along_axis(flat_rho, idx, axis=1)
                s = jnp.take_along_axis(flat_sig, idx, axis=1)
                ok = (r > 0.0) & (s > 0.0)
                err = jnp.where(ok, jnp.abs(r - rho_proj), BIG)
                better = err < best_err
                best_err = jnp.where(better, err, best_err)
                rho_nb = jnp.where(better, r, rho_nb)
                sig_nb = jnp.where(better, s, sig_nb)
        hit = in_img & (best_err < BIG * 0.5)
        return rho_proj, rho_nb, sig_nb, hit

    rho_proj, rho_nb, sig_nb, hit = project_lookup(rho)
    chi2 = (rho_nb - rho_proj) ** 2 / jnp.maximum(sig_nb, 1e-9) ** 2
    agree = hit & (chi2 < 3.84)                             # [Hn, N]
    n_support = jnp.sum(agree, axis=0)
    keep = valid & (n_support >= min_support)

    # GN refinement of rho against the agreeing neighbors
    def gn_step(rho_cur, _):
        rho_p, r_nb, s_nb, _ = project_lookup(rho_cur)
        denom = jnp.maximum(a + tz * rho_cur[None], 1e-6)
        J = a / (denom * denom)                             # d rho_proj / d rho
        w = jnp.where(agree, 1.0 / jnp.maximum(s_nb, 1e-9) ** 2, 0.0)
        r = rho_p - r_nb
        num = jnp.sum(w * J * r, axis=0)
        den = jnp.sum(w * J * J, axis=0)
        step = jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), 0.0)
        new = jnp.clip(rho_cur - step, 1e-4, 1e3)
        return jnp.where(keep, new, rho_cur), None

    rho_ref, _ = jax.lax.scan(gn_step, rho, None, length=n_gn)
    return rho_ref, keep, n_support


def rasterize_depth(uv, rho, sigma, valid, height: int, width: int,
                    dilate: int = 1):
    """Scatter sparse fused pixels into dense inv-depth / sigma maps
    (the reference keeps per-KF depth_map_/depth_sigma_ cv::Mats,
    include/KeyFrame.h:153-177). `dilate` stamps each pixel into its
    (2d+1)^2 neighborhood — the reference's edge-chain maps are contiguous
    along edges, whereas the top-k selection here subsamples them, so a
    1-px dilation restores cross-frame lookup coverage of the same edge."""
    ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), dilate, width - 1 - dilate)
    vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), dilate, height - 1 - dilate)
    rho_map = jnp.zeros((height * width,))
    sig_map = jnp.zeros((height * width,))
    # center last so exact hits win over dilated stamps
    offs = [(dy, dx) for dy in range(-dilate, dilate + 1)
            for dx in range(-dilate, dilate + 1) if (dy, dx) != (0, 0)]
    for dy, dx in offs + [(0, 0)]:
        flat = jnp.where(valid, (vi + dy) * width + (ui + dx), height * width)
        rho_map = rho_map.at[flat].set(jnp.where(valid, rho, 0.0), mode="drop")
        sig_map = sig_map.at[flat].set(jnp.where(valid, sigma, 0.0), mode="drop")
    return rho_map.reshape(height, width), sig_map.reshape(height, width)


def semidense_reconstruct(
    cam: Camera,
    images: np.ndarray,          # [K, H, W] float32 grayscale
    poses: np.ndarray,           # [K, 3, 4] camera-from-world
    depth_ranges: np.ndarray,    # [K, 2] (z_min, z_max) priors from ORB depths
    neighbors: Sequence[Sequence[int]],
    sd: SemiDenseConfig = SemiDenseConfig(),
    n_pix: int = 8192,
    n_depth: int = 64,
    inter_kf: bool = True,
    min_support: int | None = None,
) -> SemiDenseResult:
    """Offline semi-dense pass over keyframes (SemiDenseLoop,
    src/ProbabilityMapping.cc:348-597). depth_ranges mirrors
    StereoSearchConstraints (:734-747 — mean ± 2 sigma of tracked depths).

    Pass 1: per-keyframe inverse-depth sweep + chi2 hypothesis fusion.
    Pass 2 (inter_kf): cross-keyframe depth-consistency check with
    Gauss-Newton refinement and culling (src/ProbabilityMapping.cc:1011-1295),
    then the world point set is regenerated from refined depths (:700-731).
    """
    K = len(images)
    imgs = jnp.asarray(images, jnp.float32)
    Ts = jnp.asarray(poses, jnp.float32)

    def backproject(uv, rho_f, k):
        xn = jnp.stack([
            (uv[:, 0] - cam.cx) / cam.fx,
            (uv[:, 1] - cam.cy) / cam.fy,
            jnp.ones((uv.shape[0],)),
        ], -1)
        Xc = xn / jnp.maximum(rho_f, 1e-6)[:, None]
        return se3.apply(se3.inverse(Ts[k])[None], Xc)

    out_px, out_rho, out_sig, out_val = [], [], [], []
    for k in range(K):
        uv, pxv = select_edge_pixels(imgs[k], n_pix, sd.lambda_g)
        z_lo, z_hi = float(depth_ranges[k][0]), float(depth_ranges[k][1])
        rho_min = jnp.float32(1.0 / max(z_hi, 1e-3))
        rho_max = jnp.float32(1.0 / max(z_lo, 1e-3))

        hyps = []
        for nb in neighbors[k]:
            r, s, o = depth_sweep(
                cam, imgs[k], imgs[nb], Ts[k], Ts[nb], uv, pxv,
                rho_min, rho_max, sd, n_depth,
            )
            hyps.append((r, s, o))
        rho = jnp.stack([h[0] for h in hyps], 1)
        sig = jnp.stack([h[1] for h in hyps], 1)
        okm = jnp.stack([h[2] for h in hyps], 1)
        rho_f, sig_f, val = fuse_hypotheses(rho, sig, okm, sd.lambda_n)

        out_px.append(uv)
        out_rho.append(rho_f)
        out_sig.append(sig_f)
        out_val.append(val & pxv)

    if inter_kf and K >= 2:
        H, W = int(imgs.shape[1]), int(imgs.shape[2])
        maps = [rasterize_depth(out_px[k], out_rho[k], out_sig[k],
                                out_val[k], H, W) for k in range(K)]
        new_rho, new_val = [], []
        for k in range(K):
            nbs = list(neighbors[k])
            # reference gate: lambdaN=3 of covisN=7 neighbors must agree
            # (include/ProbabilityMapping.h:45,50) — scaled to the actual
            # neighbor count when fewer are available
            ms = min_support if min_support is not None else max(
                1, round(len(nbs) * 3 / 7)
            )
            rho_k, keep_k, _ = inter_kf_check(
                cam, out_px[k], out_rho[k], out_val[k], Ts[k],
                jnp.stack([Ts[n] for n in nbs]),
                jnp.stack([maps[n][0] for n in nbs]),
                jnp.stack([maps[n][1] for n in nbs]),
                min_support=ms,
            )
            new_rho.append(rho_k)
            new_val.append(keep_k)
        out_rho, out_val = new_rho, new_val

    out_pts = [backproject(out_px[k], out_rho[k], k) for k in range(K)]
    return SemiDenseResult(
        pixels=jnp.stack(out_px),
        inv_depth=jnp.stack(out_rho),
        sigma=jnp.stack(out_sig),
        valid=jnp.stack(out_val),
        points_w=jnp.stack(out_pts),
    )


def save_obj(path: str, result: SemiDenseResult, sigma_max: float = 0.05) -> int:
    """Export the fused cloud as a Wavefront .obj point set — the
    reference's SaveSemiDensePoints (.obj of `v x y z` lines,
    src/ProbabilityMapping.cc:136-192). Returns point count."""
    pts = np.asarray(result.points_w).reshape(-1, 3)
    val = np.asarray(result.valid).reshape(-1)
    sig = np.asarray(result.sigma).reshape(-1)
    keep = val & (sig < sigma_max)
    with open(path, "w") as f:
        for p in pts[keep]:
            f.write(f"v {p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
    return int(keep.sum())
