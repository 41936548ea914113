"""Descriptor matching as dense masked matrix ops.

TPU-native replacement for the 9 ORBmatcher entry points
(include/ORBmatcher.h:48-83, src/ORBmatcher.cc — SURVEY.md §2.1): instead of
per-feature grid walks + BoW bucket iteration, every regime is expressed as

    full hamming matrix  ->  feasibility mask  ->  row-wise best/second
    ->  ratio + threshold + rotation-consistency gates

At the reference's scale (~1-2k features, ~1-16k points) the dense [N, M]
matrix is a few MFLOP — far below one MXU tile-op — so masking beats any
sparse gather scheme on TPU. The XOR+popcount runs on the VPU; an int8
±1-matmul MXU variant is provided for the biggest matrices.

Thresholds follow the reference exactly: TH_LOW=50, TH_HIGH=100,
rotation histogram of 30 bins keeping the top-3 (HISTO_LENGTH,
ORBmatcher::ComputeThreeMaxima).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TH_LOW = 50
TH_HIGH = 100
HISTO_BINS = 30
BIG = jnp.int32(1 << 20)


def hamming_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise hamming distance between packed descriptors.

    a: [N, 8] uint32, b: [M, 8] uint32 -> [N, M] int32 in [0, 256].
    Replaces ORBmatcher::DescriptorDistance (the Stanford bit-twiddle) with
    XOR + population_count over the whole matrix at once.
    """
    # word-unrolled accumulation: keeps every intermediate at [N, M] so XLA
    # fuses the whole matrix into one pass (the [N, M, 8] xor tensor is
    # 268 MB at [8192, 1024] — materializing it costs ~2 ms of HBM traffic)
    acc = jax.lax.population_count(jnp.bitwise_xor(a[:, None, 0], b[None, :, 0]))
    for w in range(1, a.shape[1]):
        acc = acc + jax.lax.population_count(
            jnp.bitwise_xor(a[:, None, w], b[None, :, w])
        )
    return acc.astype(jnp.int32)


def unpack_pm1(desc: jnp.ndarray, dtype=jnp.int8) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] ±1 (for the MXU matmul formulation:
    hamming = (256 - a·b) / 2)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256)
    return (bits.astype(jnp.int32) * 2 - 1).astype(dtype)


def hamming_matrix_mxu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MXU formulation of the hamming matrix — one int8 matmul."""
    pa, pb = unpack_pm1(a), unpack_pm1(b)
    dots = jax.lax.dot_general(
        pa, pb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (256 - dots) >> 1


# Sentinel distance for masked-out candidates. Hamming distances are <= 256
# and every threshold in the system is <= TH_HIGH = 100, so 300 behaves like
# +inf while keeping the packed key inside int32 for column counts up to 2^22.
_MASKED = 300


def best_two(dist: jnp.ndarray, mask: jnp.ndarray):
    """Row-wise best and second-best over a feasibility mask.

    dist: [N, M] int32, mask: [N, M] bool -> (best_idx [N], best [N], second [N]).

    TPU note: implemented as two fused min-reductions over a packed
    (dist << shift | col) key instead of lax.top_k — top_k lowers to a
    partial sort that costs ~1.7 ms at [1024, 1024] on v5e, while a packed
    min fuses straight into the hamming-matrix producer (~0.1 ms).
    """
    M = dist.shape[1]
    shift = max(int(M - 1).bit_length(), 1)
    assert (_MASKED << shift) < (1 << 31), "column count too large for packed min"
    cols = jnp.arange(M, dtype=jnp.int32)
    key = jnp.where(mask, dist, _MASKED) << shift | cols[None, :]
    p1 = jnp.min(key, axis=1)
    best = p1 >> shift
    best_idx = p1 & ((1 << shift) - 1)
    key2 = jnp.where(cols[None, :] == best_idx[:, None], (_MASKED << shift) | cols[None, :], key)
    second = jnp.min(key2, axis=1) >> shift
    return best_idx, best, second


def match_nn(
    dist: jnp.ndarray,
    mask: jnp.ndarray,
    max_dist: int = TH_LOW,
    ratio: float = 1.0,
    mutual: bool = False,
):
    """Nearest-neighbor matching with threshold + Lowe ratio (+ optional
    mutual-best cross check). Returns (idx [N] int32, dist [N] int32,
    ok [N] bool); idx is into the columns of `dist`.
    """
    best_idx, best, second = best_two(dist, mask)
    ok = (best <= max_dist) & (best.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    if mutual:
        # packed min down the columns (same trick as best_two, row ids packed)
        N = dist.shape[0]
        shift = max(int(N - 1).bit_length(), 1)
        rows = jnp.arange(N, dtype=jnp.int32)
        key = jnp.where(mask, dist, _MASKED) << shift | rows[:, None]
        col_best = jnp.min(key, axis=0) & ((1 << shift) - 1)  # [M]
        ok &= col_best[best_idx] == rows
    return best_idx.astype(jnp.int32), best, ok


def resolve_duplicate_cols(idx: jnp.ndarray, dist: jnp.ndarray, ok: jnp.ndarray, n_cols: int):
    """Keep only the lowest-distance row per matched column (the reference
    does this with its `rotHist`/bestDist bookkeeping in SearchForInit etc.).
    """
    key = jnp.where(ok, dist, BIG)
    # min distance per column
    col_min = jnp.full((n_cols,), BIG, key.dtype).at[idx].min(key)
    keep = ok & (key == col_min[idx])
    # among equal-distance ties keep the lowest row id
    row_ids = jnp.arange(idx.shape[0], dtype=jnp.int32)
    col_row = jnp.full((n_cols,), jnp.int32(1 << 30)).at[idx].min(
        jnp.where(keep, row_ids, jnp.int32(1 << 30))
    )
    return keep & (col_row[idx] == row_ids)


def rotation_consistency(
    angle_q: jnp.ndarray,
    angle_t: jnp.ndarray,
    idx: jnp.ndarray,
    ok: jnp.ndarray,
    bins: int = HISTO_BINS,
    keep_top: int = 3,
) -> jnp.ndarray:
    """Keep matches whose relative rotation falls in the 3 dominant histogram
    bins (ORBmatcher rotation-consistency check, CheckOrientation=true)."""
    rot = angle_q - angle_t[idx]
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(rot, two_pi)
    bin_idx = jnp.clip((rot * bins / two_pi).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.int32).at[bin_idx].add(ok.astype(jnp.int32))
    top_vals, top_bins = jax.lax.top_k(hist, keep_top)
    # reference drops bins below 10% of the best bin too
    good_bin = jnp.zeros((bins,), bool).at[top_bins].set(
        top_vals > jnp.maximum(1, (0.1 * top_vals[0]).astype(jnp.int32))
    )
    return ok & good_bin[bin_idx]


# ---------------------------------------------------------------------------
# feasibility masks for each regime
# ---------------------------------------------------------------------------

def window_mask(
    proj_uv: jnp.ndarray,
    kp: jnp.ndarray,
    radius: jnp.ndarray,
    query_valid: jnp.ndarray,
    train_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Search-window feasibility: |kp - proj| <= radius per query.

    proj_uv: [N, 2] projected query positions; kp: [M, 2] candidate
    keypoints; radius: [N] or scalar. The reference's GetFeaturesInArea grid
    walk becomes one broadcast compare.
    """
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (proj_uv.shape[0],))
    d = jnp.abs(proj_uv[:, None, :] - kp[None, :, :])
    inside = (d[..., 0] <= r[:, None]) & (d[..., 1] <= r[:, None])
    return inside & query_valid[:, None] & train_valid[None, :]


def octave_mask(
    pred_octave: jnp.ndarray, kp_octave: jnp.ndarray, lo: int = 0, hi: int = 1
) -> jnp.ndarray:
    """Scale-consistency: candidate octave within [pred-lo, pred+hi]
    (SearchByProjection checks kpLevel in [nPredictedLevel-1, +1])."""
    d = kp_octave[None, :] - pred_octave[:, None]
    return (d >= -lo) & (d <= hi)


def epipolar_mask(
    F12: jnp.ndarray,
    kp1: jnp.ndarray,
    kp2: jnp.ndarray,
    sigma2_kp2: jnp.ndarray,
    chi2: float = 3.84,
) -> jnp.ndarray:
    """Epipolar feasibility for triangulation search
    (ORBmatcher::CheckDistEpipolarLine): squared point-to-epiline distance
    of kp2 under chi2 * sigma2 of kp2's octave. F12: [3,3] fundamental."""
    ones1 = jnp.ones((kp1.shape[0], 1), kp1.dtype)
    x1 = jnp.concatenate([kp1, ones1], axis=1)  # [N, 3]
    lines = x1 @ F12  # [N, 3] epilines in image 2: l2 = F12^T x1
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * kp2[None, :, 0] + b * kp2[None, :, 1] + c
    den = a * a + b * b
    dsq = (num * num) / jnp.maximum(den, 1e-12)
    return dsq < chi2 * sigma2_kp2[None, :]


def fundamental_from_poses(K: jnp.ndarray, T1w: jnp.ndarray, T2w: jnp.ndarray) -> jnp.ndarray:
    """F12 such that x1^T F12 x2 = 0, from camera-from-world poses
    (ORBmatcher-adjacent ComputeF12 in LocalMapping)."""
    R1, t1 = T1w[:3, :3], T1w[:3, 3]
    R2, t2 = T2w[:3, :3], T2w[:3, 3]
    R12 = R1 @ R2.T
    t12 = -R12 @ t2 + t1
    tx = jnp.array(
        [
            [0.0, -t12[2], t12[1]],
            [t12[2], 0.0, -t12[0]],
            [-t12[1], t12[0], 0.0],
        ]
    )
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ tx @ R12 @ Kinv


# ---------------------------------------------------------------------------
# composite regimes
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_dist", "check_rotation"))
def search_by_projection(
    proj_uv: jnp.ndarray,
    pred_octave: jnp.ndarray,
    query_desc: jnp.ndarray,
    query_valid: jnp.ndarray,
    kp: jnp.ndarray,
    kp_octave: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_valid: jnp.ndarray,
    radius: jnp.ndarray,
    query_angle: jnp.ndarray | None = None,
    kp_angle: jnp.ndarray | None = None,
    max_dist: int = TH_HIGH,
    ratio: float = 0.9,
    check_rotation: bool = False,
):
    """SearchByProjection core (regimes 1-4 of the reference): project map
    points / last-frame points, window+octave mask, hamming NN + gates.
    Returns (idx [N], dist [N], ok [N]) with unique columns."""
    dist = hamming_matrix(query_desc, kp_desc)
    mask = window_mask(proj_uv, kp, radius, query_valid, kp_valid)
    mask &= octave_mask(pred_octave, kp_octave)
    idx, d, ok = match_nn(dist, mask, max_dist=max_dist, ratio=ratio)
    if check_rotation and query_angle is not None:
        ok = rotation_consistency(query_angle, kp_angle, idx, ok)
    ok = resolve_duplicate_cols(idx, d, ok, kp.shape[0])
    return idx, d, ok


@partial(jax.jit, static_argnames=("window", "max_dist"))
def search_for_initialization(
    kp1: jnp.ndarray,
    desc1: jnp.ndarray,
    angle1: jnp.ndarray,
    valid1: jnp.ndarray,
    kp2: jnp.ndarray,
    desc2: jnp.ndarray,
    angle2: jnp.ndarray,
    valid2: jnp.ndarray,
    window: float = 100.0,
    max_dist: int = TH_LOW,
    ratio: float = 0.9,
):
    """SearchForInitialization: wide-window NN with ratio + rotation checks
    (src/ORBmatcher.cc SearchForInitialization)."""
    dist = hamming_matrix(desc1, desc2)
    mask = window_mask(kp1, kp2, jnp.float32(window), valid1, valid2)
    idx, d, ok = match_nn(dist, mask, max_dist=max_dist, ratio=ratio)
    ok = rotation_consistency(angle1, angle2, idx, ok)
    ok = resolve_duplicate_cols(idx, d, ok, kp2.shape[0])
    return idx, d, ok


@jax.jit
def search_brute(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    max_dist: int = TH_LOW,
    ratio: float = 0.75,
):
    """BoW-free stand-in for SearchByBoW (SURVEY.md §7.2 step 3): exact
    brute-force NN with mutual check — strictly better recall than BoW
    bucketing at equal thresholds, and one matmul-shaped op on TPU."""
    dist = hamming_matrix(desc1, desc2)
    mask = valid1[:, None] & valid2[None, :]
    idx, d, ok = match_nn(dist, mask, max_dist=max_dist, ratio=ratio, mutual=True)
    ok = resolve_duplicate_cols(idx, d, ok, desc2.shape[0])
    return idx, d, ok


@partial(jax.jit, static_argnames=("max_dist",))
def search_for_triangulation(
    kp1: jnp.ndarray,
    desc1: jnp.ndarray,
    octave1: jnp.ndarray,
    valid1: jnp.ndarray,
    kp2: jnp.ndarray,
    desc2: jnp.ndarray,
    octave2: jnp.ndarray,
    valid2: jnp.ndarray,
    F12: jnp.ndarray,
    sigma2_by_octave: jnp.ndarray,
    epi_center2: jnp.ndarray,
    min_epi_dist2: jnp.ndarray,
    max_dist: int = TH_LOW,
):
    """SearchForTriangulation (src/ORBmatcher.cc): unmatched-feature pairs
    constrained to the epipolar line, rejecting kp2 too close to the
    epipole (parallax gate). epi_center2: [2] epipole in image 2;
    min_epi_dist2: [M] squared minimum distance by octave."""
    dist = hamming_matrix(desc1, desc2)
    sigma2_kp2 = sigma2_by_octave[octave2]
    mask = valid1[:, None] & valid2[None, :]
    mask &= epipolar_mask(F12, kp1, kp2, sigma2_kp2)
    d_epi = jnp.sum((kp2 - epi_center2[None, :]) ** 2, axis=-1)
    mask &= (d_epi > min_epi_dist2)[None, :]
    idx, d, ok = match_nn(dist, mask, max_dist=max_dist, ratio=1.0, mutual=True)
    ok = resolve_duplicate_cols(idx, d, ok, kp2.shape[0])
    return idx, d, ok
