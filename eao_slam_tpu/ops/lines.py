"""2D line-segment detection as dense Hough voting.

TPU-native stand-in for the reference's EDLines detector
(Thirdparty/EDLines binary .a + line_lbd wrapper, src/Frame.cc:324-335 —
SURVEY.md §2.2): pixel-chain edge walking is replaced by a gradient-guided
Hough transform — every strong-gradient pixel votes for the (theta, rho)
cell orthogonal to its gradient, peaks are extracted with accumulator NMS,
and segment endpoints come from masked min/max projections of each peak's
inlier pixels. All fixed-shape scatter/top-k work.

Segments feed Object-line association + yaw sampling
(Tracking::AssociateObjAndLines / SampleObjYaw, src/Tracking.cc:2472-2871)
and the semi-dense 3D line fitting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.ops.image import sobel_gradients

N_THETA = 90            # 2-degree bins over [0, pi)
RHO_BIN = 3.0           # px


@partial(jax.jit, static_argnames=("max_lines", "min_votes", "min_len"))
def detect_segments(
    img: jnp.ndarray,
    max_lines: int = 64,
    grad_thresh: float = 40.0,
    min_votes: int = 40,
    min_len: float = 30.0,
):
    """[H, W] grayscale -> (segments [L, 4] (x1,y1,x2,y2), valid [L]).

    Matches the role of line_lbd_detect::detect_filter_lines (raw detect +
    length filter, include/line_lbd/line_lbd_allclass.h:20-70).

    Tiled (windowed) Hough: the image splits into TH x TW tiles and each
    tile votes into its own small (theta, rho) accumulator — one vmapped
    scatter over tiles. A global accumulator lets long wall/floor
    boundaries crowd every short object edge out of the top-k (EDLines has
    no such bias: its pixel chains are local); per-tile peaks keep short
    high-contrast segments competitive inside their own neighborhood. The
    cost of tiling is that an edge crossing a 160x120 tile seam is
    reported as two per-tile segments (each must clear min_len on its
    own); downstream consumers that need joined lines can deduplicate
    with merge_collinear, which this detector does not call.
    The edge threshold adapts per tile (max of grad_thresh and 1.5x the
    tile's mean gradient), mirroring EDLines' anchor thresholding, so
    dense texture speckle does not flood the vote space.
    """
    H, W = img.shape
    TH, TW = 120, 160
    nty = -(-H // TH)
    ntx = -(-W // TW)
    T = nty * ntx
    Hp, Wp = nty * TH, ntx * TW

    gx, gy, mag = sobel_gradients(img)
    if (Hp, Wp) != (H, W):
        gx = jnp.pad(gx, ((0, Hp - H), (0, Wp - W)))
        gy = jnp.pad(gy, ((0, Hp - H), (0, Wp - W)))
        mag = jnp.pad(mag, ((0, Hp - H), (0, Wp - W)))

    def tile(a):
        return a.reshape(nty, TH, ntx, TW).transpose(0, 2, 1, 3).reshape(
            T, TH, TW)

    gx_t, gy_t, mag_t = tile(gx), tile(gy), tile(mag)
    # per-tile adaptive edge threshold (EDLines-style anchor gating)
    thr = jnp.maximum(grad_thresh,
                      1.5 * jnp.mean(mag_t, axis=(1, 2)))[:, None, None]
    strong = mag_t > thr                                        # [T, TH, TW]

    tile_diag = float(np.hypot(TH, TW))
    n_rho = int(2 * tile_diag / RHO_BIN) + 2
    ys = jnp.broadcast_to(jnp.arange(TH, dtype=jnp.float32)[:, None],
                          (TH, TW))
    xs = jnp.broadcast_to(jnp.arange(TW, dtype=jnp.float32)[None, :],
                          (TH, TW))

    # line angle = gradient normal; theta parametrizes the line normal so
    # theta == gradient direction (mod pi)
    theta = jnp.mod(jnp.arctan2(gy_t, gx_t), jnp.pi)            # [T, TH, TW]
    t_bin = jnp.clip((theta / jnp.pi * N_THETA).astype(jnp.int32),
                     0, N_THETA - 1)
    t_centers = (jnp.arange(N_THETA) + 0.5) * (jnp.pi / N_THETA)
    cos_t = jnp.cos(t_centers)[t_bin]
    sin_t = jnp.sin(t_centers)[t_bin]
    rho = xs[None] * cos_t + ys[None] * sin_t
    r_bin = jnp.clip(((rho + tile_diag) / RHO_BIN).astype(jnp.int32),
                     0, n_rho - 1)

    # vote accumulation as ONE-HOT MATMULS, not scatter-adds: a [theta]
    # one-hot (gated by the edge mask) against a [rho] one-hot contracts
    # the pixel axis on the MXU. The scatter formulation (.at[].add over
    # 614k pixel votes/frame) serializes on TPU and measured 43 ms/frame
    # inside the fused chunk program — the entire FULL-mode slowdown.
    def tile_acc(tb, rb, st):
        tb = tb.reshape(-1)
        rb = rb.reshape(-1)
        stf = st.reshape(-1)
        oh_t = ((tb[None, :] == jnp.arange(N_THETA)[:, None]) & stf[None, :]
                ).astype(jnp.float32)                           # [Nt, px]
        oh_r = (rb[:, None] == jnp.arange(n_rho)[None, :]
                ).astype(jnp.float32)                           # [px, Nr]
        return oh_t @ oh_r

    acc = jax.vmap(tile_acc)(t_bin, r_bin, strong)              # [T, Nt, Nr]

    # 3x3 accumulator NMS; votes counted over the peak's 3x3 neighborhood:
    # texture noise perturbs per-pixel gradient directions by +-1-2 bins,
    # smearing a real edge's mass across adjacent cells — the windowed
    # count recovers it (the classic smoothed-Hough accumulator)
    pad = jnp.pad(acc, ((0, 0), (1, 1), (1, 1)), constant_values=0.0)
    mx = acc
    acc3 = acc
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            sl = jax.lax.slice(
                pad, (0, 1 + dy, 1 + dx),
                (T, 1 + dy + N_THETA, 1 + dx + n_rho))
            mx = jnp.maximum(mx, sl)
            acc3 = acc3 + sl
    K = max(2, max_lines // T + 2)          # peaks per tile
    peaks = jnp.where(acc >= mx, acc3, 0.0).reshape(T, -1)
    votes, flat = jax.lax.top_k(peaks, K)                       # [T, K]
    pk_t = flat // n_rho
    pk_r = flat % n_rho
    line_ok = votes >= min_votes

    # endpoint extraction = longest contiguous inlier run along the line
    # (EDLines walks pixel chains, so its segments are contiguous by
    # construction; a raw min/max over ALL inliers of the infinite line
    # lets isolated texture pixels elsewhere on the line stretch a short
    # edge into a tile-crossing segment). The tangent parameter s is
    # histogrammed into SBINS occupancy bins, <=2-bin gaps close, and the
    # run holding the most occupied bins becomes the segment.
    SBINS = 128
    s_scale = SBINS / (2.0 * tile_diag)

    def one_line(c, sn, r, tc, strong_t, theta_t):
        d = xs * c + ys * sn - r
        dth = jnp.abs(theta_t - tc)
        ang_ok = jnp.minimum(dth, jnp.pi - dth) < jnp.deg2rad(10.0)
        inlier = strong_t & (jnp.abs(d) < 1.5 * RHO_BIN) & ang_ok
        # tangent direction (-sin, cos): param s = -x sin + y cos
        s = -xs * sn + ys * c
        sb = jnp.clip(((s + tile_diag) * s_scale).astype(jnp.int32),
                      0, SBINS - 1)
        # occupancy via a one-hot contraction (same MXU-vs-scatter
        # rationale as the vote accumulator above)
        occ = (((sb.reshape(-1)[None, :] == jnp.arange(SBINS)[:, None])
                & inlier.reshape(-1)[None, :]).sum(axis=1)) > 0
        occ_d = occ
        for _ in range(2):  # close gaps up to ~2 bins (~6 px)
            occ_d = occ_d | jnp.roll(occ_d, 1) | jnp.roll(occ_d, -1)
        grp = jnp.cumsum((~occ_d).astype(jnp.int32))    # run id per bin
        cnt = jnp.zeros((SBINS + 1,), jnp.int32).at[grp].add(
            occ.astype(jnp.int32))
        best = jnp.argmax(cnt)
        in_best = occ & (grp == best)
        bins = jnp.arange(SBINS)
        lo = jnp.min(jnp.where(in_best, bins, SBINS))
        hi = jnp.max(jnp.where(in_best, bins, -1))
        s_min = lo.astype(jnp.float32) / s_scale - tile_diag
        s_max = (hi.astype(jnp.float32) + 1.0) / s_scale - tile_diag
        return s_min, s_max, cnt[best] > 0

    cos_p = jnp.cos(t_centers)[pk_t]                            # [T, K]
    sin_p = jnp.sin(t_centers)[pk_t]
    rho_p = (pk_r.astype(jnp.float32) + 0.5) * RHO_BIN - tile_diag
    tc_p = t_centers[pk_t]

    s_min, s_max, has = jax.vmap(            # over tiles
        jax.vmap(one_line, in_axes=(0, 0, 0, 0, None, None))
    )(cos_p, sin_p, rho_p, tc_p, strong, theta)                 # [T, K]
    length = jnp.where(has, s_max - s_min, 0.0)
    line_ok &= has & (length >= min_len)

    # endpoints in tile coordinates -> global image coordinates
    x0 = ((jnp.arange(T) % ntx) * TW).astype(jnp.float32)[:, None]
    y0 = ((jnp.arange(T) // ntx) * TH).astype(jnp.float32)[:, None]
    x1 = rho_p * cos_p - s_min * sin_p + x0
    y1 = rho_p * sin_p + s_min * cos_p + y0
    x2 = rho_p * cos_p - s_max * sin_p + x0
    y2 = rho_p * sin_p + s_max * cos_p + y0
    segs_all = jnp.stack([x1, y1, x2, y2], -1).reshape(T * K, 4)
    ok_all = line_ok.reshape(T * K)

    # keep the strongest max_lines across tiles
    score = jnp.where(ok_all, votes.reshape(T * K), -1.0)
    top_v, top_i = jax.lax.top_k(score, max_lines)
    segs = segs_all[top_i]
    return segs, top_v > 0.0


@jax.jit
def merge_collinear(
    segs: jnp.ndarray,
    valid: jnp.ndarray,
    angle_tol_deg: float = 5.0,
    dist_tol: float = 20.0,
):
    """Drop collinear duplicates (merge_break_lines' absorption rule,
    src/detect_3d_cuboid/object_3d_util.cpp:349): one vectorized pass —
    a segment collinear and close to a strictly longer neighbor is
    invalidated, the longer survivor keeps its own endpoints (no
    endpoint extension, unlike the reference's in-place merge)."""
    L = segs.shape[0]
    d = segs[:, 2:] - segs[:, :2]
    length = jnp.linalg.norm(d, axis=-1)
    ang = jnp.arctan2(d[:, 1], d[:, 0])
    da = jnp.abs(jnp.mod(ang[:, None] - ang[None, :] + jnp.pi / 2, jnp.pi) - jnp.pi / 2)
    # midpoint distance to the other's infinite line
    mid = 0.5 * (segs[:, :2] + segs[:, 2:])
    n = jnp.stack([-d[:, 1], d[:, 0]], -1) / jnp.maximum(length, 1e-6)[:, None]
    off = jnp.abs(jnp.einsum("jd,ijd->ij", n, mid[:, None, :] - segs[None, :, :2]))
    # gap between segment extents along the longer's direction
    close = off.T < 4.0
    mergeable = (
        valid[:, None] & valid[None, :]
        & (da < jnp.deg2rad(angle_tol_deg)) & close
        & (jnp.linalg.norm(mid[:, None] - mid[None, :], axis=-1)
           < (length[:, None] + length[None, :]) / 2 + dist_tol)
    )
    absorbed = mergeable & (length[:, None] < length[None, :])
    keep = valid & ~jnp.any(absorbed, axis=1)
    return segs, keep
