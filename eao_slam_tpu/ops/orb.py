"""ORB feature extraction as batched, static-shape TPU ops.

TPU-native re-design of ORBextractor (src/ORBextractor.cc, SURVEY.md §2.1):

  * FAST-9/16 corner score — computed densely for the whole level on the VPU
    (rolled-difference min-max formulation) instead of the reference's
    per-30px-cell scalar loops (ComputeKeyPointsOctTree, :765-834).
  * spatial distribution — the reference's DistributeOctTree (:539) exists to
    spread keypoints uniformly; the TPU-idiomatic equivalent is per-tile
    argmax followed by a global top-k (SURVEY.md §7.2 step 2).
  * orientation — IC_Angle (:77) as a masked intensity-centroid over gathered
    31x31 patches, vmapped across keypoints.
  * descriptors — steered BRIEF (computeOrbDescriptor, :108) with a
    deterministically generated 256-pair pattern (fixed seed; NOT the OpenCV
    learned table — this engine only matches against its own descriptors).

Everything below is shape-static and jit-compiles to one fused program.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.ops import image as image_ops

# FAST circle of radius 3 (standard Bresenham 16-point ring), (dy, dx).
_FAST_RING = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    np.int32,
)

PATCH_R = 15          # IC_Angle / BRIEF support radius (HALF_PATCH_SIZE)
PATCH = 2 * PATCH_R + 1


def _make_brief_pattern(seed: int = 8017, n_bits: int = 256, radius: int = 13) -> np.ndarray:
    """Deterministic BRIEF sampling pattern [n_bits, 4] = (y1, x1, y2, x2).

    Gaussian-distributed pairs (sigma = radius/2.5) clipped to a disc of
    `radius`, so rotated offsets never leave the 31x31 support patch. This
    replaces the reference's learned bit_pattern_31 constant with a generated
    one — matching is internal, so only self-consistency matters.
    """
    rng = np.random.default_rng(seed)
    pts = []
    while len(pts) < n_bits * 2:
        p = rng.normal(0.0, radius / 2.5, 2)
        if p @ p <= radius * radius:
            pts.append(p)
    pts = np.asarray(pts[: n_bits * 2])
    return np.concatenate([pts[:n_bits], pts[n_bits:]], axis=1).astype(np.float32)


BRIEF_PATTERN = _make_brief_pattern()


# ---------------------------------------------------------------------------
# dense FAST score
# ---------------------------------------------------------------------------

def fast_score(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9/16 corner score.

    score(p) = max(  max_s min_{i in arc9(s)} (ring_i - I_p),
                     max_s min_{i in arc9(s)} (I_p - ring_i) )
    i.e. the largest threshold at which p is still a FAST corner — the same
    quantity cv::FAST's score computes per detected corner, but evaluated
    densely with rolled tensors (pure VPU work, no data-dependent loops).
    """
    # ring samples as statically-shifted images — 16 fused slices instead of
    # a [16, H, W] stacked tensor whose leading-axis rolls hit TPU slow paths.
    # Computed in int16: pixel values are small integers so the score is
    # exact, and the narrower lanes run ~2.5x faster on the VPU.
    im = jnp.round(img).astype(jnp.int16)
    ring = image_ops.shifted(im, [(dy, dx) for dy, dx in _FAST_RING])
    diff_b = [r - im for r in ring]    # bright: ring brighter than center
    diff_d = [im - r for r in ring]

    def arc9_max_min(d):
        # min over 9 consecutive ring positions (circular), then max over the
        # 16 start positions; hierarchical runs (2, 4, 8, then +1) keep it at
        # 64 fusable elementwise mins.
        e2 = [jnp.minimum(d[i], d[(i + 1) % 16]) for i in range(16)]
        e4 = [jnp.minimum(e2[i], e2[(i + 2) % 16]) for i in range(16)]
        e8 = [jnp.minimum(e4[i], e4[(i + 4) % 16]) for i in range(16)]
        e9 = [jnp.minimum(e8[i], d[(i + 8) % 16]) for i in range(16)]
        out = e9[0]
        for i in range(1, 16):
            out = jnp.maximum(out, e9[i])
        return out

    s = jnp.maximum(arc9_max_min(diff_b), arc9_max_min(diff_d))
    return s.astype(jnp.float32)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only 3x3-local maxima (cv::FAST nonmaxSuppression=true).
    Shifted-max formulation — fuses, unlike reduce_window on TPU."""
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    neigh = image_ops.shifted(score, offs, pad_value=-np.inf)
    mx = neigh[0]
    for s in neigh[1:]:
        mx = jnp.maximum(mx, s)
    return jnp.where(score >= mx, score, 0.0)


# ---------------------------------------------------------------------------
# per-tile keypoint selection (octree replacement)
# ---------------------------------------------------------------------------

def select_from_comb(comb: jnp.ndarray, n_out: int, threshold: float,
                     min_threshold: float, cell: int):
    """Spatially-uniform top-n selection from a packed (score << 20 | idx)
    map (already NMS'd + border-masked). See select_keypoints."""
    h, w = comb.shape
    assert h * w < (1 << 20)
    ph = (cell - h % cell) % cell
    pw = (cell - w % cell) % cell
    # pad with (0 << 20 | 0): zero score never survives min_threshold
    sp = jnp.pad(comb, ((0, ph), (0, pw)))
    H2, W2 = sp.shape
    th, tw = H2 // cell, W2 // cell

    # two contiguous reshape-maxes (no transpose) pick each tile's winner
    m = sp.reshape(th, cell, W2).max(axis=1)
    m = m.reshape(th, tw, cell).max(axis=2).reshape(th * tw)

    tile_score = (m >> 20).astype(jnp.float32)
    tile_pos = m & ((1 << 20) - 1)
    # strong corners rank above weak-but-acceptable ones
    rank = jnp.where(
        tile_score >= threshold, tile_score + 1e4,
        jnp.where(tile_score >= min_threshold, tile_score, -1.0),
    )
    k = min(n_out, th * tw)
    top_rank, top_idx = jax.lax.top_k(rank, k)

    pos = tile_pos[top_idx]
    yx = jnp.stack([pos // w, pos % w], axis=-1).astype(jnp.int32)
    resp = tile_score[top_idx]
    valid = top_rank > 0.0
    if k < n_out:
        pad = n_out - k
        yx = jnp.concatenate([yx, jnp.zeros((pad, 2), jnp.int32)])
        resp = jnp.concatenate([resp, jnp.zeros((pad,), resp.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return yx, resp, valid


def pack_comb(score: jnp.ndarray, border: int) -> jnp.ndarray:
    """Pack an NMS'd score map into (score << 20 | linear index) int32.

    Index-in-value argmax: FAST scores are integer-valued, so pure max
    reductions recover both the winner and its position. TPU note: a real
    argmax here makes XLA duplicate the whole fused FAST graph into the
    (value, index) variadic reduce (~45 ms at VGA); the packed form stays a
    fusable max."""
    h, w = score.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    s = jnp.where(inb, score, 0.0)
    idx = (ys * w + xs).astype(jnp.int32)
    return (jnp.clip(s, 0, 1023).astype(jnp.int32) << 20) | idx


def select_keypoints(score: jnp.ndarray, n_out: int, threshold: float,
                     min_threshold: float, border: int, cell: int):
    """Spatially-uniform top-n keypoints from a dense score map.

    Two-tier selection replicating the octree's intent (DistributeOctTree,
    src/ORBextractor.cc:539): each `cell`x`cell` tile contributes its best
    corner; the global top-`n_out` of those tile winners is kept. Tile
    winners scoring above `threshold` are strictly preferred over those only
    above `min_threshold` (the reference's per-cell threshold fallback).

    Returns (yx [n_out, 2] int32, resp [n_out], valid [n_out]).
    """
    return select_from_comb(
        pack_comb(score, border), n_out, threshold, min_threshold, cell
    )


# ---------------------------------------------------------------------------
# orientation + descriptor
# ---------------------------------------------------------------------------

N_ROT_BINS = 15       # coarse rotation bins; first-order angle correction
                      # makes the effective steering continuous (see
                      # _brief_onehot) so 24-degree bins suffice
_BLUR_R = 3           # 7x7 sigma-2 pre-descriptor blur radius
GPATCH = PATCH + 2 * _BLUR_R  # 37: raw patch with blur apron


def fast_atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial atan2 (max error ~1.2e-5 rad).

    jnp.arctan2 lowers to a software transcendental that measured ~17 ms
    per 32-frame chunk on v5e — two orders of magnitude over this fused
    9th-order odd polynomial on the reduced octant.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx, mn = jnp.maximum(ax, ay), jnp.minimum(ax, ay)
    z = mn / jnp.maximum(mx, 1e-20)
    z2 = z * z
    a = z * (0.9998660 + z2 * (-0.3302995 + z2 * (0.1801410 + z2 * (-0.0851330 + z2 * 0.0208351))))
    a = jnp.where(ay > ax, 1.5707963 - a, a)
    a = jnp.where(x < 0, 3.14159265 - a, a)
    return jnp.where(y < 0, -a, a)


def _ic_angle_weights():
    """Circular-mask moment weight planes (x*mask, y*mask): the moments are
    two fused multiply-reduces over the [N, 31, 31] patches (reshape+matvec
    forces an unaligned relayout that measured ~3 ms per chunk)."""
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    mask = (ys * ys + xs * xs) <= PATCH_R * PATCH_R
    return (
        jnp.asarray(xs * mask, jnp.float32),
        jnp.asarray(ys * mask, jnp.float32),
    )

_IC_WX, _IC_WY = _ic_angle_weights()


def _brief_onehot():
    """Static sampling matrices for continuously-steered BRIEF via matmul.

    Columns [0, Q*256): for each of Q rotation-bin centers, the 256 (p1, p2)
    pattern pairs rotated to continuous positions and encoded as BILINEAR
    weights (+ at p2, - at p1), so one [961, .] matmul yields v2 - v1 for
    every (bin, bit) — the descriptor needs NO data-dependent gather
    (take_along_axis measured 49 ms per 32-frame chunk on v5e).

    Columns [Q*256, 2*Q*256): d/dtheta of the same sampled difference
    (gradient of the bilinear interpolant dotted with the rotational
    velocity of each sample point). The kernel then evaluates
        diff(theta) ~= diff(theta_q) + (theta - theta_q) * ddiff(theta_q),
    which steers the pattern CONTINUOUSLY in angle: with Q=15 the residual
    is second-order, 0.5*(pi/Q)^2*r < 0.3 px at the pattern edge — below
    the +-0.5 px cvRound noise of the reference's own steering
    (src/ORBextractor.cc:108). Hard 6-degree binning measured 3-10x worse
    e2e ATE; this recovers continuous-steering accuracy at Q=15 cost.
    """
    pat = BRIEF_PATTERN  # [256, 4] (y1, x1, y2, x2)
    Q = N_ROT_BINS
    mat = np.zeros((PATCH * PATCH, 2 * Q * 256), np.float32)

    def scatter(col, py, px, sign, d_dpy=None, d_dpx=None):
        y0 = min(max(int(np.floor(py)), 0), PATCH - 2)
        x0 = min(max(int(np.floor(px)), 0), PATCH - 2)
        fy = min(max(py - y0, 0.0), 1.0)
        fx = min(max(px - x0, 0.0), 1.0)
        cells = ((y0, x0), (y0 + 1, x0), (y0, x0 + 1), (y0 + 1, x0 + 1))
        if d_dpy is None:
            w = ((1 - fy) * (1 - fx), fy * (1 - fx), (1 - fy) * fx, fy * fx)
        else:
            # d(bilinear)/dtheta = d/dpy * dpy/dtheta + d/dpx * dpx/dtheta
            w = (
                -(1 - fx) * d_dpy - (1 - fy) * d_dpx,
                +(1 - fx) * d_dpy - fy * d_dpx,
                -fx * d_dpy + (1 - fy) * d_dpx,
                +fx * d_dpy + fy * d_dpx,
            )
        for (yy, xx), wi in zip(cells, w):
            mat[yy * PATCH + xx, col] += sign * wi

    for q in range(Q):
        a = 2.0 * np.pi * q / Q
        c, s = np.cos(a), np.sin(a)
        for k in range(256):
            y1, x1, y2, x2 = pat[k]
            for sign, yy, xx in ((-1.0, y1, x1), (1.0, y2, x2)):
                ry = xx * s + yy * c   # rotated position (continuous)
                rx = xx * c - yy * s
                dry = rx               # d(ry)/dtheta
                drx = -ry              # d(rx)/dtheta
                scatter(q * 256 + k, ry + PATCH_R, rx + PATCH_R, sign)
                scatter(Q * 256 + q * 256 + k, ry + PATCH_R, rx + PATCH_R,
                        sign, d_dpy=dry, d_dpx=drx)
    return mat

_BRIEF_OH = jnp.asarray(_brief_onehot(), jnp.bfloat16)


def _brief_onehot_blurfolded() -> np.ndarray:
    """Blur-folded BRIEF sampling matrix over the RAW 37x37 patch.

    The 7x7 sigma-2 pre-descriptor blur is linear, so instead of blurring
    each gathered patch (_blur_patches: ~12 ms per 32-frame chunk of sliced
    multiply-adds) it is folded into the sampling matrix once at build time:

        diff = W31 @ blur(raw)  ==  (blur^T @ W31) @ raw

    Every 31x31 bilinear sampling weight is replaced by its 7x7-blur stamp in
    37x37 raw-patch coordinates (offset +_BLUR_R). Sampling positions stay
    within radius 13+1 of the center, so the stamped support (±3 more) never
    leaves the 37x37 patch — zero padding is exact, not an approximation.
    """
    from eao_slam_tpu.ops.image import gaussian_kernel1d

    mat31 = _brief_onehot()                       # [31*31, 2*Q*256]
    C = mat31.shape[1]
    k = gaussian_kernel1d(2.0, _BLUR_R).astype(np.float64)
    src = mat31.reshape(PATCH, PATCH, C).astype(np.float64)
    out = np.zeros((GPATCH, GPATCH, C), np.float64)
    for dy in range(2 * _BLUR_R + 1):
        for dx in range(2 * _BLUR_R + 1):
            out[dy : dy + PATCH, dx : dx + PATCH, :] += k[dy] * k[dx] * src
    return out.reshape(GPATCH * GPATCH, C).astype(np.float32)


_BRIEF_OH_RAW = jnp.asarray(_brief_onehot_blurfolded(), jnp.bfloat16)


def _gather_patches(
    img: jnp.ndarray, yx: jnp.ndarray, r: int = PATCH_R, assume_int: bool = False
) -> jnp.ndarray:
    """Extract [N, 2r+1, 2r+1] patches centered at integer keypoints
    (selection guarantees keypoints >= border=19 >= r from the image edge).

    TPU-native formulation: two one-hot matmuls (row selection on the MXU,
    then per-keypoint column selection as a batched matmul). Every gather
    alternative loses badly on TPU: vmapped dynamic_slice lowers to a
    SEQUENTIAL while loop of [1, d, d] slices (profiled at ~90 ms of a
    118 ms extraction chunk), jnp.take of rows lowers to the same, and
    take_along_axis on the minor axis is worse. One-hot selection costs
    ~2.5 G bf16 MACs per VGA frame — noise for the MXU — and fuses cleanly.

    assume_int=True: the image holds integer grey levels <= 255 (the rounded
    pyramid, matching the reference's uint8 levels) — every value is exact in
    bfloat16, so one bf16 matmul per stage selects pixels EXACTLY and the
    hi/lo split (2x matmuls) is skipped.
    """
    d = 2 * r + 1
    N = yx.shape[0]
    H, W = img.shape
    offs = jnp.arange(-r, r + 1, dtype=jnp.int32)

    rows = yx[:, 0:1] + offs[None, :]                       # [N, d]
    oh_rows = (
        rows.reshape(-1)[:, None] == jnp.arange(H, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)                                   # [N*d, H]
    dims = (((1,), (0,)), ((), ()))
    hi = img.astype(jnp.bfloat16)
    band = jax.lax.dot_general(oh_rows, hi, dims, preferred_element_type=jnp.float32)
    if not assume_int:
        # hi/lo split keeps the selected pixels exact (bf16 would round them)
        lo = (img - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        band = band + jax.lax.dot_general(
            oh_rows, lo, dims, preferred_element_type=jnp.float32
        )
    band = band.reshape(N, d, W)                             # [N, d, W]

    cols = yx[:, 1:2] + offs[None, :]                        # [N, d]
    oh_cols = (
        jnp.arange(W, dtype=jnp.int32)[None, :, None] == cols[:, None, :]
    ).astype(jnp.bfloat16)                                   # [N, W, d]
    bdims = (((2,), (1,)), ((0,), (0,)))
    bhi = band.astype(jnp.bfloat16)
    out = jax.lax.dot_general(bhi, oh_cols, bdims, preferred_element_type=jnp.float32)
    if not assume_int:
        blo = (band - bhi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + jax.lax.dot_general(
            blo, oh_cols, bdims, preferred_element_type=jnp.float32
        )
    return out                                               # [N, d, d]


def _blur_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """7x7 sigma-2 separable blur INSIDE gathered [N, 37, 37] patches ->
    [N, 31, 31]. Replaces whole-level GaussianBlur (5 ms per chunk at VGA):
    only descriptor support pixels are ever blurred, as static fused slices."""
    from eao_slam_tpu.ops.image import gaussian_kernel1d

    k = gaussian_kernel1d(2.0, _BLUR_R)
    rows = sum(
        float(k[t]) * patches[:, t : t + PATCH, :] for t in range(2 * _BLUR_R + 1)
    )  # [N, 31, 37]
    return sum(
        float(k[t]) * rows[:, :, t : t + PATCH] for t in range(2 * _BLUR_R + 1)
    )  # [N, 31, 31]


def _brief_diffs(blurred_flat: jnp.ndarray) -> jnp.ndarray:
    """[N, 961] f32 -> [N, Q*256] pattern differences v2 - v1.

    bf16 hi/lo split: a single bf16 matmul rounds pixel values by up to
    +-0.5 grey level, which flips near-tie descriptor bits (measured 3x
    worse e2e ATE). Splitting x = hi + lo into two bf16 matmuls keeps MXU
    speed with ~2^-16 relative error — numerically f32.
    """
    hi = blurred_flat.astype(jnp.bfloat16)
    lo = (blurred_flat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    return (
        jax.lax.dot_general(hi, _BRIEF_OH, dims, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(lo, _BRIEF_OH, dims, preferred_element_type=jnp.float32)
    )


def ic_angles(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """IC_Angle (src/ORBextractor.cc:77): orientation from the intensity
    centroid of the circular patch. Returns radians [N]."""
    patches = _gather_patches(img, yx)
    m10 = jnp.sum(patches * _IC_WX, axis=(1, 2))
    m01 = jnp.sum(patches * _IC_WY, axis=(1, 2))
    return fast_atan2(m01, m10)


def _angles_and_descriptors(img: jnp.ndarray, yx: jnp.ndarray):
    """Fused orientation + descriptor path off ONE raw patch gather.

    Returns (angles [N] rad, desc [N, 8] uint32). Matches the reference
    split: IC_Angle on the raw level image, BRIEF on the 7x7/sigma-2 blurred
    one (src/ORBextractor.cc:1040-1100), with the steering angle quantized
    to N_ROT_BINS (the original ORB paper's 12-degree lookup construction —
    matching is internal-only, so only self-consistency matters).

    Perf structure: pyramid levels are integer-valued (build_pyramid rounds,
    like the reference's uint8 levels), so the patch gather runs exact
    single-bf16 matmuls (assume_int), and the blur is pre-folded into the
    sampling matrix (_BRIEF_OH_RAW) — the whole descriptor path is the
    gather + one [N, 1369] @ [1369, 2*Q*256] matmul."""
    raw = _gather_patches(img, yx, r=PATCH_R + _BLUR_R, assume_int=True)
    N = raw.shape[0]
    center = raw[:, _BLUR_R : _BLUR_R + PATCH, _BLUR_R : _BLUR_R + PATCH]
    m10 = jnp.sum(center * _IC_WX, axis=(1, 2))
    m01 = jnp.sum(center * _IC_WY, axis=(1, 2))
    angles = fast_atan2(m01, m10)

    # raw patches are exact integers <= 255: one bf16 matmul, no hi/lo split
    dims = (((1,), (0,)), ((), ()))
    diffs_all = jax.lax.dot_general(
        raw.reshape(N, -1).astype(jnp.bfloat16), _BRIEF_OH_RAW, dims,
        preferred_element_type=jnp.float32,
    )                                                     # [N, 2*Q*256]
    return angles, _steered_pack(diffs_all, angles)


def _steered_pack(diffs_all: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Select the angle bin, apply the first-order steering correction and
    pack 256 bits -> [N, 8] uint32 (see _brief_onehot)."""
    N = diffs_all.shape[0]
    Q = N_ROT_BINS
    binw = 2.0 * jnp.pi / Q
    qreal = angles / binw
    qidx = jnp.round(qreal)
    dtheta = (qreal - qidx) * binw                        # [-binw/2, binw/2]
    qbin = jnp.mod(qidx, Q).astype(jnp.int32)
    onehot = (qbin[:, None] == jnp.arange(Q)[None, :]).astype(jnp.float32)
    base = diffs_all[:, : Q * 256].reshape(N, Q, 256)
    deriv = diffs_all[:, Q * 256 :].reshape(N, Q, 256)
    d = (
        jnp.einsum("nqk,nq->nk", base, onehot)
        + dtheta[:, None] * jnp.einsum("nqk,nq->nk", deriv, onehot)
    )
    bits = d > 0.0
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(
        bits.astype(jnp.uint32).reshape(-1, 8, 32) * weights, axis=2,
        dtype=jnp.uint32,
    )


def brief_descriptors(
    img_blur: jnp.ndarray, yx: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF over an already-blurred image -> [N, 8] uint32.

    Kept for compatibility/tests; extract_orb uses the fused
    _angles_and_descriptors path (one gather, matmul-sampled pattern)."""
    patches = _gather_patches(img_blur, yx).reshape(yx.shape[0], -1)
    return _steered_pack(_brief_diffs(patches), angles)


# ---------------------------------------------------------------------------
# full extractor
# ---------------------------------------------------------------------------

class Features(NamedTuple):
    """Padded per-frame feature set (level-0 pixel coordinates)."""

    kp: jnp.ndarray       # [F, 2] float32 (x, y) in level-0 coords
    desc: jnp.ndarray     # [F, 8] uint32
    octave: jnp.ndarray   # [F] int32
    angle: jnp.ndarray    # [F] float32 radians
    response: jnp.ndarray  # [F] float32
    valid: jnp.ndarray    # [F] bool


def per_level_counts(n_features: int, n_levels: int, scale_factor: float):
    """Geometric feature budget per level (ORBextractor ctor semantics)."""
    factor = 1.0 / scale_factor
    base = n_features * (1 - factor) / (1 - factor ** n_levels)
    counts = [int(round(base * factor ** l)) for l in range(n_levels - 1)]
    counts.append(max(n_features - sum(counts), 8))
    return counts


@partial(
    jax.jit,
    static_argnames=(
        "n_features", "n_levels", "scale_factor", "threshold", "min_threshold",
        "border", "cell",
    ),
)
def extract_orb(
    img: jnp.ndarray,
    n_features: int = 1024,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    threshold: float = 20.0,
    min_threshold: float = 7.0,
    border: int = 19,
    cell: int = 16,
) -> Features:
    """Full ORB front end for one grayscale image [H, W] float32 (0..255)."""
    levels = image_ops.build_pyramid(img, n_levels, scale_factor)
    counts = per_level_counts(n_features, n_levels, scale_factor)

    # The Pallas FAST kernel is opt-in: on real TPUs it pins the dense stage
    # into one VMEM pass, but tunneled/emulated devices (axon) stall when
    # compiling Mosaic kernels, so the portable XLA path is the default.
    use_pallas = (
        jax.default_backend() == "tpu" and os.environ.get("EAO_PALLAS") == "1"
    )
    if use_pallas:
        from eao_slam_tpu.ops.fast_pallas import fast_nms_comb

    kp_all, desc_all, oct_all, ang_all, resp_all, val_all = [], [], [], [], [], []
    for l, lvl in enumerate(levels):
        n_l = counts[l]
        if use_pallas:
            comb = fast_nms_comb(lvl, border=border)
            yx, resp, valid = select_from_comb(
                comb, n_l, threshold, min_threshold, cell
            )
        else:
            score = nms3x3(fast_score(lvl))
            yx, resp, valid = select_keypoints(
                score, n_l, threshold, min_threshold, border, cell
            )
        ang, desc = _angles_and_descriptors(lvl, yx)
        scale = scale_factor ** l
        kp = jnp.stack([yx[:, 1].astype(jnp.float32), yx[:, 0].astype(jnp.float32)], -1) * scale
        kp_all.append(kp)
        desc_all.append(desc)
        oct_all.append(jnp.full((n_l,), l, jnp.int32))
        ang_all.append(ang)
        resp_all.append(resp)
        val_all.append(valid)

    return Features(
        kp=jnp.concatenate(kp_all),
        desc=jnp.concatenate(desc_all),
        octave=jnp.concatenate(oct_all),
        angle=jnp.concatenate(ang_all),
        response=jnp.concatenate(resp_all),
        valid=jnp.concatenate(val_all),
    )


def scale_sigma2(n_levels: int = 8, scale_factor: float = 1.2) -> jnp.ndarray:
    """Per-octave sigma^2 = (scale^l)^2, as used by every chi2 gate in the
    reference optimizer (mvLevelSigma2)."""
    return jnp.asarray([(scale_factor ** l) ** 2 for l in range(n_levels)], jnp.float32)
