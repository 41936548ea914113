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
    """
    H, W = img.shape
    gx, gy, mag = sobel_gradients(img)
    diag = float(np.hypot(H, W))
    n_rho = int(2 * diag / RHO_BIN) + 2

    ys = jnp.arange(H)[:, None] * jnp.ones((1, W))
    xs = jnp.ones((H, 1)) * jnp.arange(W)[None, :]
    strong = mag > grad_thresh

    # line angle = gradient normal; theta parametrizes the line normal so
    # theta == gradient direction (mod pi)
    theta = jnp.mod(jnp.arctan2(gy, gx), jnp.pi)
    t_bin = jnp.clip((theta / jnp.pi * N_THETA).astype(jnp.int32), 0, N_THETA - 1)
    # rho = x cos(theta) + y sin(theta) (use the binned angle so votes and
    # inlier tests agree exactly)
    t_centers = (jnp.arange(N_THETA) + 0.5) * (jnp.pi / N_THETA)
    cos_t = jnp.cos(t_centers)[t_bin]
    sin_t = jnp.sin(t_centers)[t_bin]
    rho = xs * cos_t + ys * sin_t
    r_bin = jnp.clip(((rho + diag) / RHO_BIN).astype(jnp.int32), 0, n_rho - 1)

    acc = jnp.zeros((N_THETA, n_rho), jnp.float32).at[
        t_bin.reshape(-1), r_bin.reshape(-1)
    ].add(strong.reshape(-1).astype(jnp.float32))

    # 3x3 accumulator NMS + top-k peaks (index-packed max, see ops/orb.py)
    pad = jnp.pad(acc, 1, constant_values=0.0)
    mx = acc
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mx = jnp.maximum(mx, jax.lax.slice(
                pad, (1 + dy, 1 + dx), (1 + dy + N_THETA, 1 + dx + n_rho)))
    peaks = jnp.where(acc >= mx, acc, 0.0).reshape(-1)
    votes, flat = jax.lax.top_k(peaks, max_lines)
    pk_t = flat // n_rho
    pk_r = flat % n_rho
    line_ok = votes >= min_votes

    # endpoints: min/max projection of inlier pixels along each peak line
    cos_p = jnp.cos(t_centers)[pk_t]                      # [L]
    sin_p = jnp.sin(t_centers)[pk_t]
    rho_p = (pk_r.astype(jnp.float32) + 0.5) * RHO_BIN - diag

    BIG = jnp.float32(1e9)

    def one_line(args):
        c, sn, r, tc = args
        d = xs * c + ys * sn - r
        dth = jnp.abs(theta - tc)
        ang_ok = jnp.minimum(dth, jnp.pi - dth) < jnp.deg2rad(6.0)
        inlier = strong & (jnp.abs(d) < RHO_BIN) & ang_ok
        # tangent direction (-sin, cos): param s = -x sin + y cos
        s = -xs * sn + ys * c
        s_min = jnp.min(jnp.where(inlier, s, BIG))
        s_max = jnp.max(jnp.where(inlier, s, -BIG))
        return s_min, s_max, jnp.any(inlier)

    # lax.map keeps memory at one [H, W] temporary per step instead of an
    # [L, H, W] blow-up
    s_min, s_max, has = jax.lax.map(
        one_line, (cos_p, sin_p, rho_p, t_centers[pk_t])
    )
    length = jnp.where(has, s_max - s_min, 0.0)
    line_ok &= has & (length >= min_len)

    # endpoint coordinates from (rho, s) line coordinates
    x1 = rho_p * cos_p - s_min * sin_p
    y1 = rho_p * sin_p + s_min * cos_p
    x2 = rho_p * cos_p - s_max * sin_p
    y2 = rho_p * sin_p + s_max * cos_p
    segs = jnp.stack([x1, y1, x2, y2], axis=-1)
    return segs, line_ok


@jax.jit
def merge_collinear(
    segs: jnp.ndarray,
    valid: jnp.ndarray,
    angle_tol_deg: float = 5.0,
    dist_tol: float = 20.0,
):
    """Merge collinear nearby segments (merge_break_lines semantics,
    src/detect_3d_cuboid/object_3d_util.cpp:349): one vectorized pass —
    a segment absorbed by a longer collinear neighbor is dropped and the
    survivor's endpoints expand."""
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
