"""Pallas TPU kernel: fused FAST-9/16 score + 3x3 NMS + index packing.

The XLA formulation of the dense FAST front end (ops/orb.py fast_score /
nms3x3) is correct everywhere but at the mercy of XLA's scheduler: on v5e
the same elementwise graph compiles anywhere between 5 ms and 30 ms per
pyramid level depending on what consumes it. This kernel pins the whole
dense stage — ring sampling, arc-of-9 threshold score, non-max suppression,
and (score << 20 | linear_index) packing — into one VMEM-resident pass, so
`select_keypoints` downstream only does two contiguous max-reductions and a
top-k on the packed map.

Replaces the per-pixel work of cv::FAST inside
ORBextractor::ComputeKeyPointsOctTree (src/ORBextractor.cc:765-834).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FAST-9/16 Bresenham ring of radius 3, clockwise from 12 o'clock
# (identical to ops/orb.py's _FAST_RING; checked by tests).
FAST_RING = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
PAD = 4  # ring radius 3 + 1 for the NMS halo


def _kernel(pimg_ref, out_ref, *, H, W, border):
    He, We = H + 2, W + 2  # extended domain so NMS can see its halo

    def sl(arr_ref, dy, dx):
        # window of the padded image shifted by (dy, dx), on the extended
        # domain anchored at (PAD - 1, PAD - 1)
        y0 = PAD - 1 + dy
        x0 = PAD - 1 + dx
        return arr_ref[y0:y0 + He, x0:x0 + We]

    center = sl(pimg_ref, 0, 0)
    ring = [sl(pimg_ref, dy, dx) for dy, dx in FAST_RING]
    diff_b = [r - center for r in ring]
    diff_d = [center - r for r in ring]
    # (int16 like the XLA path is unnecessary here: the kernel is already
    # one VMEM-resident pass and f32 keeps the in-kernel graph simple)

    def arc9(d):
        e2 = [jnp.minimum(d[i], d[(i + 1) % 16]) for i in range(16)]
        e4 = [jnp.minimum(e2[i], e2[(i + 2) % 16]) for i in range(16)]
        e8 = [jnp.minimum(e4[i], e4[(i + 4) % 16]) for i in range(16)]
        e9 = [jnp.minimum(e8[i], d[(i + 8) % 16]) for i in range(16)]
        m = e9[0]
        for i in range(1, 16):
            m = jnp.maximum(m, e9[i])
        return m

    score_ext = jnp.maximum(arc9(diff_b), arc9(diff_d))   # [He, We]

    # 3x3 NMS on the interior
    score = jax.lax.slice(score_ext, (1, 1), (1 + H, 1 + W))
    mx = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mx = jnp.maximum(
                mx, jax.lax.slice(score_ext, (1 + dy, 1 + dx), (1 + dy + H, 1 + dx + W))
            )
    keep = score >= mx

    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    s_int = jnp.clip(score, 0.0, 1023.0).astype(jnp.int32)
    s_int = jnp.where(keep & inb, s_int, 0)
    out_ref[:, :] = (s_int << 20) | (ys * W + xs)


@partial(jax.jit, static_argnames=("border",))
def fast_nms_comb(img: jnp.ndarray, border: int = 19) -> jnp.ndarray:
    """[H, W] float32 image -> [H, W] int32 packed (score << 20 | index)
    map with 3x3 NMS and border masking applied."""
    H, W = img.shape
    pimg = jnp.pad(img, PAD, mode="edge")
    return pl.pallas_call(
        partial(_kernel, H=H, W=W, border=border),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(pimg)
