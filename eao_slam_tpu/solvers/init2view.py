"""Two-view monocular initialization: batched H/F RANSAC + pose recovery.

TPU-native re-design of Initializer (src/Initializer.cc:45-931, SURVEY.md
§2.1): the reference runs 200 sequential RANSAC iterations for a homography
and a fundamental matrix in two CPU threads; here all hypotheses for both
models are solved simultaneously as one batched eigendecomposition each,
scored against all correspondences with one broadcast, and the H-vs-F
selection (RH = SH/(SH+SF)) plus cheirality-checked pose recovery
(ReconstructF / ReconstructH-Faugeras, :470+) is a masked argmax over all
candidate (R, t) decompositions at once.

All shapes static: M matched pairs (padded + mask), B hypotheses.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3, triangulate
from eao_slam_tpu.geometry.camera import Camera

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_CAP = 5.991


def normalize_points(uv: jnp.ndarray, valid: jnp.ndarray):
    """Zero-mean unit-average-deviation normalization (Initializer::Normalize).
    Returns (normalized [M, 2], T [3, 3]) with x_norm = T x."""
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid[:, None], uv, 0.0), axis=0) / n
    dev = jnp.sum(jnp.where(valid[:, None], jnp.abs(uv - mean), 0.0), axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-6)
    out = (uv - mean) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], uv.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return out, T


def _smallest_eigvec(AtA: jnp.ndarray) -> jnp.ndarray:
    """Batched smallest eigenvector of symmetric [B, k, k] -> [B, k]."""
    _, V = jnp.linalg.eigh(AtA)
    return V[..., :, 0]


def _solve_h_batch(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """DLT homographies from [B, 8, 2] normalized pairs -> [B, 3, 3] with
    x2 ~ H21 x1 (matches ComputeH21)."""
    x, y = p1[..., 0], p1[..., 1]
    u, v = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    r2 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [B, 16, 9]
    h = _smallest_eigvec(jnp.swapaxes(A, -1, -2) @ A)
    return h.reshape(*h.shape[:-1], 3, 3)


def _solve_f_batch(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """8-point fundamental matrices from [B, 8, 2] -> [B, 3, 3] with
    x2^T F21 x1 = 0 (matches ComputeF21), rank-2 enforced."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1
    )  # [B, 8, 9]
    f = _smallest_eigvec(jnp.swapaxes(A, -1, -2) @ A)
    F = f.reshape(*f.shape[:-1], 3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., :, None] * Vt)


def _score_h(H21: jnp.ndarray, uv1, uv2, valid, sigma: float):
    """Symmetric transfer score (Initializer::CheckHomography)."""
    inv_s2 = 1.0 / (sigma * sigma)
    H12 = jnp.linalg.inv(H21)

    def transfer(H, a, b):
        x = jnp.einsum("bij,mj->bmi", H, jnp.concatenate([a, jnp.ones_like(a[:, :1])], -1))
        w = jnp.where(jnp.abs(x[..., 2]) < 1e-9, 1e-9, x[..., 2])
        p = x[..., :2] / w[..., None]
        return jnp.sum((p - b[None]) ** 2, axis=-1) * inv_s2

    chi1 = transfer(H21, uv1, uv2)
    chi2 = transfer(H12, uv2, uv1)
    in1 = (chi1 < CHI2_H) & valid[None]
    in2 = (chi2 < CHI2_H) & valid[None]
    score = jnp.sum(jnp.where(in1, CHI2_H - chi1, 0.0), -1) + jnp.sum(
        jnp.where(in2, CHI2_H - chi2, 0.0), -1
    )
    return score, in1 & in2


def _score_f(F21: jnp.ndarray, uv1, uv2, valid, sigma: float):
    """Epipolar-distance score (Initializer::CheckFundamental)."""
    inv_s2 = 1.0 / (sigma * sigma)
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], -1)
    x2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], -1)

    l2 = jnp.einsum("bij,mj->bmi", F21, x1)  # epiline of p1 in image 2
    num2 = jnp.sum(l2 * x2[None], -1)
    chi1 = num2 * num2 / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12) * inv_s2

    l1 = jnp.einsum("bji,mj->bmi", F21, x2)  # F^T x2: epiline of p2 in image 1
    num1 = jnp.sum(l1 * x1[None], -1)
    chi2 = num1 * num1 / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12) * inv_s2

    in1 = (chi1 < CHI2_F) & valid[None]
    in2 = (chi2 < CHI2_F) & valid[None]
    score = jnp.sum(jnp.where(in1, SCORE_CAP - chi1, 0.0), -1) + jnp.sum(
        jnp.where(in2, SCORE_CAP - chi2, 0.0), -1
    )
    return score, in1 & in2


def _decompose_e(E: jnp.ndarray):
    """Essential -> 4 (R, t) candidates (DecomposeE)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _decompose_h(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras SVD homography decomposition -> 8 (R, t) candidates
    (Initializer::ReconstructH). Degenerate cases (d1≈d2≈d3) yield candidates
    that simply fail cheirality scoring."""
    A = jnp.linalg.inv(K) @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' > 0
    stheta = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        st = jnp.where(x1s[i] * x3s[i] >= 0, stheta, -stheta) * jnp.sign(x1s[i] * x3s[i] + 1e-30)
        st = stheta * jnp.sign(x1s[i]) * jnp.sign(x3s[i])
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        Rp = Rp.at[0, 0].set(ctheta).at[0, 2].set(-st).at[2, 0].set(st).at[2, 2].set(ctheta)
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        R = s * U @ Rp @ Vt
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-9))
    # case d' < 0
    sphi = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        sp = sphi * jnp.sign(x1s[i]) * jnp.sign(x3s[i])
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
        Rp = Rp.at[0, 0].set(cphi).at[0, 2].set(sp).at[2, 0].set(sp).at[2, 2].set(-cphi)
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        R = s * U @ Rp @ Vt
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-9))
    return jnp.stack(Rs), jnp.stack(ts)


def _check_rt(cam: Camera, R, t, uv1, uv2, inliers):
    """Cheirality + quality score of one (R, t) candidate over all inlier
    matches (Initializer::CheckRT). Returns (n_good, median_parallax_deg,
    points [M, 3], good_mask [M])."""
    T1 = se3.identity()
    T2 = se3.make(R, t)
    xn1 = triangulate.pixels_to_normalized(cam, uv1)
    xn2 = triangulate.pixels_to_normalized(cam, uv2)
    M = uv1.shape[0]
    Xw = triangulate.triangulate(
        jnp.broadcast_to(T1, (M, 3, 4)), jnp.broadcast_to(T2, (M, 3, 4)), xn1, xn2
    )
    good = triangulate.check_triangulation(
        cam, jnp.broadcast_to(T1, (M, 3, 4)), jnp.broadcast_to(T2, (M, 3, 4)),
        Xw, uv1, uv2, jnp.ones((M,), jnp.float32) * 1.0,
        max_reproj_chi2=4.0, min_parallax_cos=0.99998,
    )
    good &= inliers
    # parallax of good points (degrees); use the 50th best like the ref's
    # sorted-parallax trick
    c2 = -R.T @ t
    v1 = Xw
    v2 = Xw - c2[None]
    cosp = jnp.sum(v1 * v2, -1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1), 1e-9
    )
    par_deg = jnp.degrees(jnp.arccos(jnp.clip(cosp, -1.0, 1.0)))
    par_sorted = jnp.sort(jnp.where(good, par_deg, 0.0))[::-1]
    idx50 = jnp.minimum(jnp.sum(good), 50) - 1
    parallax = par_sorted[jnp.maximum(idx50, 0)]
    return jnp.sum(good), parallax, Xw, good


def _refine_h(p1, p2, w):
    """Weighted DLT re-fit of H over all inliers (beyond the reference's
    minimal-sample estimate — one masked eigh, large accuracy win)."""
    x, y = p1[:, 0], p1[:, 1]
    u, v = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], -1)
    r2 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], 0)
    h = _smallest_eigvec((A.T @ A)[None])[0]
    return h.reshape(3, 3)


def _refine_f(p1, p2, w):
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], -1)
    A = A * w[:, None]
    f = _smallest_eigvec((A.T @ A)[None])[0]
    F = f.reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ (S[:, None] * Vt)


class InitResult(NamedTuple):
    success: jnp.ndarray     # bool scalar
    T21: jnp.ndarray         # [3, 4] pose of frame 2 wrt frame 1
    points: jnp.ndarray      # [M, 3] triangulated world points (frame-1 frame)
    point_ok: jnp.ndarray    # [M] bool
    used_h: jnp.ndarray      # bool scalar (which model was selected)
    n_inliers: jnp.ndarray   # int


@partial(jax.jit, static_argnames=("cam", "n_hyp", "min_triangulated"))
def initialize_two_view(
    cam: Camera,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    sigma: float = 1.0,
    n_hyp: int = 256,
    min_triangulated: int = 50,
) -> InitResult:
    """Full monocular initialization from matched pairs.

    uv1/uv2: [M, 2] matched undistorted pixels, valid: [M]. Runs `n_hyp`
    8-point hypotheses for H and F simultaneously, reproduces the
    RH = SH/(SH+SF) model selection (src/Initializer.cc:104-118) and
    candidate-pose cheirality election.
    """
    M = uv1.shape[0]
    n_valid = jnp.sum(valid)

    # --- sample hypotheses over valid matches only (probability mass on
    # valid rows; duplicates within a set just yield degenerate hypotheses
    # that score poorly).
    p = valid.astype(jnp.float32) / jnp.maximum(n_valid, 1)
    idx = jax.random.choice(key, M, shape=(n_hyp, 8), p=p)

    nuv1, T1n = normalize_points(uv1, valid)
    nuv2, T2n = normalize_points(uv2, valid)
    s1 = nuv1[idx]  # [B, 8, 2]
    s2 = nuv2[idx]

    # --- homography hypotheses (normalized space -> denormalize)
    Hn = _solve_h_batch(s1, s2)
    H21 = jnp.linalg.inv(T2n)[None] @ Hn @ T1n[None]
    h_scores, h_in = _score_h(H21, uv1, uv2, valid, sigma)
    h_best = jnp.argmax(h_scores)
    # refine on inliers (normalized space) with re-scoring rounds: the
    # minimal-sample winner's inlier set is biased, one IRLS-ish polish
    # round removes that bias (goes beyond the reference, which decomposes
    # the raw minimal-sample model)
    SH, H_best, h_inliers = h_scores[h_best], H21[h_best], h_in[h_best]
    for _ in range(2):
        Hn_r = _refine_h(nuv1, nuv2, h_inliers.astype(jnp.float32))
        H_r = jnp.linalg.inv(T2n) @ Hn_r @ T1n
        h_scores_r, h_in_r = _score_h(H_r[None], uv1, uv2, valid, sigma)
        better = h_scores_r[0] > SH
        SH = jnp.where(better, h_scores_r[0], SH)
        H_best = jnp.where(better, H_r, H_best)
        h_inliers = jnp.where(better, h_in_r[0], h_inliers)

    # --- fundamental hypotheses
    Fn = _solve_f_batch(s1, s2)
    F21 = T2n.T[None] @ Fn @ T1n[None]
    f_scores, f_in = _score_f(F21, uv1, uv2, valid, sigma)
    f_best = jnp.argmax(f_scores)
    SF, F_best, f_inliers = f_scores[f_best], F21[f_best], f_in[f_best]
    for _ in range(2):
        Fn_r = _refine_f(nuv1, nuv2, f_inliers.astype(jnp.float32))
        F_r = T2n.T @ Fn_r @ T1n
        f_scores_r, f_in_r = _score_f(F_r[None], uv1, uv2, valid, sigma)
        better = f_scores_r[0] > SF
        SF = jnp.where(better, f_scores_r[0], SF)
        F_best = jnp.where(better, F_r, F_best)
        f_inliers = jnp.where(better, f_in_r[0], f_inliers)

    RH = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = RH > 0.40  # src/Initializer.cc:115

    # --- candidate poses: JOINT election over both decompositions.
    #
    # Documented divergence from the reference (src/Initializer.cc:104-118,
    # which decomposes only the RH-selected model): on plane-dominated
    # scenes the homography wins RH, and the classic two-fold (R, t, n)
    # ambiguity of the H decomposition can be decided by cheirality NOISE
    # alone, silently accepting a pose with tens of degrees of translation
    # error. Electing over the union of all 8 H-candidates and 4
    # E-candidates with the UNION inlier set fixes this: the true pose
    # also reconstructs the off-plane inliers that only F explains, while
    # the wrong H branch only ever explains the plane. Pure-plane scenes
    # degrade gracefully (E candidates score low, H election unchanged).
    K = cam.K
    E = K.T @ F_best @ K
    Rs_e, ts_e = _decompose_e(E)  # [4]
    Rs_h, ts_h = _decompose_h(H_best, K)  # [8]
    Rs = jnp.concatenate([Rs_h, Rs_e], 0)  # [12]
    ts = jnp.concatenate([ts_h, ts_e], 0)
    inliers = h_inliers | f_inliers

    n_good, par, Xw, good = jax.vmap(
        lambda R, t: _check_rt(cam, R, t, uv1, uv2, inliers)
    )(Rs, ts)

    best = jnp.argmax(n_good)
    n_best = n_good[best]
    # uniqueness: no POSE-DISTINCT candidate close to best (ReconstructF
    # demands nsimilar <= 1 at 0.7*max). Joint H+E election means the true
    # motion usually appears TWICE (once per decomposition), so candidates
    # within ~15 degrees of the winner in both rotation and translation
    # direction are the same solution, not ambiguity.
    R_b = Rs[best]
    t_b = ts[best] / jnp.maximum(jnp.linalg.norm(ts[best]), 1e-9)
    tr = jnp.einsum("ij,nij->n", R_b, Rs)          # trace(R_b^T R_n)
    t_n = ts / jnp.maximum(
        jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-9
    )
    same_pose = (tr > 1.0 + 2.0 * jnp.cos(jnp.deg2rad(15.0))) & (
        jnp.einsum("j,nj->n", t_b, t_n) > jnp.cos(jnp.deg2rad(15.0))
    )
    n_similar = jnp.sum((n_good > 0.7 * n_best) & ~same_pose)
    min_good = jnp.maximum(
        jnp.asarray(min_triangulated, jnp.int32),
        (0.9 * jnp.sum(inliers)).astype(jnp.int32),
    )
    ok = (n_best >= min_good) & (n_similar == 0) & (par[best] > 1.0)

    return InitResult(
        success=ok,
        T21=se3.make(Rs[best], ts[best]),
        points=Xw[best],
        point_ok=good[best] & ok,
        used_h=use_h,
        n_inliers=jnp.sum(inliers),
    )
