"""Statistical tests of the ensemble association, vectorized.

- Wilcoxon rank-sum (Mann-Whitney) band check over masked sample pairs
  (Object_2D::NoParaDataAssociation, src/Object.cc:714-930): the O(m*n)
  pairwise comparison loop is exactly a broadcast sign-sum — MXU/VPU food.
- One-sample t-test of the detection centroid against the object's centroid
  history (stage 4, src/Object.cc:447-537).
- Two-sample t-test gating map-object merges (DoubleSampleTtest,
  src/Object.cc:1659-1712).
- Box-plot (IQR) depth outlier rejection
  (Object_2D::RemoveOutliersByBoxPlot, src/Object.cc:106-158).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RANK_SUM_BAND = 1.282  # 80% two-sided band on W (src/Object.cc:904)


def rank_sum_statistic(
    a: jnp.ndarray, a_mask: jnp.ndarray,
    b: jnp.ndarray, b_mask: jnp.ndarray,
):
    """Per-axis Wilcoxon W for batched masked samples.

    a: [..., M, D], b: [..., N, D] with boolean masks [..., M] / [..., N].
    Returns (w [..., D], m [...], n [...]): the reference's
    W = min(w12 + m(m+1)/2, w21 + n(n+1)/2) + ties/2 per axis.
    """
    am = a_mask[..., :, None].astype(jnp.float32)
    bm = b_mask[..., :, None].astype(jnp.float32)
    pair = am[..., :, None, :] * bm[..., None, :, :]          # [..., M, N, 1]
    gt = (a[..., :, None, :] > b[..., None, :, :]).astype(jnp.float32) * pair
    lt = (a[..., :, None, :] < b[..., None, :, :]).astype(jnp.float32) * pair
    eq = (a[..., :, None, :] == b[..., None, :, :]).astype(jnp.float32) * pair
    w12 = jnp.sum(gt, axis=(-3, -2))
    w21 = jnp.sum(lt, axis=(-3, -2))
    w00 = jnp.sum(eq, axis=(-3, -2))
    m = jnp.sum(a_mask, axis=-1).astype(jnp.float32)
    n = jnp.sum(b_mask, axis=-1).astype(jnp.float32)
    w = jnp.minimum(
        w12 + (m * (m + 1) / 2)[..., None],
        w21 + (n * (n + 1) / 2)[..., None],
    ) + w00 / 2
    return w, m, n


def rank_sum_all_axes_pass(
    a: jnp.ndarray, a_mask: jnp.ndarray,
    b: jnp.ndarray, b_mask: jnp.ndarray,
    band: float = RANK_SUM_BAND,
) -> jnp.ndarray:
    """True where all D axes' W fall inside the normal-approximation band
    mean(W) ± band * sigma(W) (the reference's r1 < W < r2 check)."""
    w, m, n = rank_sum_statistic(a, a_mask, b, b_mask)
    mean = 0.5 * m * (m + n + 1)
    sigma = jnp.sqrt(jnp.maximum(m * n * (m + n + 1) / 12.0, 1e-9))
    lo = (mean - band * sigma)[..., None]
    hi = (mean + band * sigma)[..., None]
    return jnp.all((w > lo) & (w < hi), axis=-1)


def t_statistic_center(
    det_center: jnp.ndarray,
    obj_center: jnp.ndarray,
    obj_center_std: jnp.ndarray,
    df: jnp.ndarray,
) -> jnp.ndarray:
    """Per-axis single-sample t of a detection centroid against the object's
    per-frame-centroid distribution: |c_det - c_obj| / (s / sqrt(df)).
    det_center [..., 3], obj_center [..., 3], obj_center_std [..., 3],
    df [...] -> t [..., 3]."""
    denom = obj_center_std / jnp.sqrt(jnp.maximum(df, 1.0))[..., None]
    return jnp.abs(det_center - obj_center) / jnp.maximum(denom, 1e-9)


def two_sample_t_statistic(
    mean1, std1, n1, mean2, std2, n2
) -> jnp.ndarray:
    """Welch-style pooled two-sample t per axis (DoubleSampleTtest,
    src/Object.cc:1659-1712 uses the pooled-variance form)."""
    n1 = jnp.maximum(n1, 2.0)
    n2 = jnp.maximum(n2, 2.0)
    sp2 = ((n1 - 1)[..., None] * std1**2 + (n2 - 1)[..., None] * std2**2) / (
        n1 + n2 - 2
    )[..., None]
    denom = jnp.sqrt(jnp.maximum(sp2 * (1.0 / n1 + 1.0 / n2)[..., None], 1e-12))
    return jnp.abs(mean1 - mean2) / denom


def make_t_table() -> np.ndarray:
    """Upper-tail t critical values, [122, 9]: rows = dof 1..121 (row 0 is
    the alpha header), columns 1..8 = alpha {0.5 0.4 0.2 0.1 0.05 0.025 0.01
    0.001} — the layout of the reference fixture data/t_test.txt so column
    indices in the cascade match (col 5 = alpha 0.05, col 8 = 0.001)."""
    from eao_slam_tpu.io.tum import load_t_table

    return load_t_table(None)


def boxplot_depth_inliers(
    z: jnp.ndarray, mask: jnp.ndarray, k: float = 1.5
) -> jnp.ndarray:
    """IQR outlier mask on camera-frame depth per detection
    (RemoveOutliersByBoxPlot: keep z in [Q1 - k*IQR, Q3 + k*IQR]).
    z: [..., N], mask: [..., N] -> inlier mask [..., N]."""
    big = 1e9
    zs = jnp.sort(jnp.where(mask, z, big), axis=-1)
    n = jnp.sum(mask, axis=-1)

    def quantile(q):
        # linear interpolation at rank q*(n-1) over the valid prefix
        idx = q * jnp.maximum(n - 1, 0).astype(jnp.float32)
        lo = jnp.floor(idx).astype(jnp.int32)
        hi = jnp.ceil(idx).astype(jnp.int32)
        frac = idx - lo.astype(jnp.float32)
        vlo = jnp.take_along_axis(zs, lo[..., None], axis=-1)[..., 0]
        vhi = jnp.take_along_axis(zs, hi[..., None], axis=-1)[..., 0]
        return vlo * (1 - frac) + vhi * frac

    q1 = quantile(0.25)
    q3 = quantile(0.75)
    iqr = q3 - q1
    keep = (z >= (q1 - k * iqr)[..., None]) & (z <= (q3 + k * iqr)[..., None])
    return keep & mask
