"""Image-plane ops: pyramid, separable blur, gradients.

Replaces ORBextractor::ComputePyramid + GaussianBlur (src/ORBextractor.cc:
1086-1130) with static-shape jnp ops: the 8 pyramid levels have fixed sizes
derived from the config, so jit compiles one fused program per level set.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def level_sizes(height: int, width: int, n_levels: int, scale_factor: float):
    """Static (h, w) per pyramid level, mirroring cv::resize rounding."""
    sizes = []
    for l in range(n_levels):
        s = 1.0 / (scale_factor ** l)
        sizes.append((int(round(height * s)), int(round(width * s))))
    return sizes


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def shifted(img: jnp.ndarray, offsets, pad_value=None):
    """Statically-shifted copies of a 2D image: for each (dy, dx) returns
    img translated so out[y, x] = img[y + dy, x + dx] (edge padded).

    This is THE fast sampling primitive on TPU: pad once + static slices
    fuse into the consuming elementwise graph, where single-channel convs,
    rolls and reduce_windows all hit slow paths (measured: 16 static slices
    0.56 ms vs 3.3 ms rolls vs 18 ms one-hot conv at 480x640 on v5e).
    """
    H, W = img.shape
    r_y = max(max(abs(dy) for dy, _ in offsets), 0)
    r_x = max(max(abs(dx) for _, dx in offsets), 0)
    if pad_value is None:
        p = jnp.pad(img, ((r_y, r_y), (r_x, r_x)), mode="edge")
    else:
        p = jnp.pad(img, ((r_y, r_y), (r_x, r_x)), constant_values=pad_value)
    return [
        jax.lax.slice(p, (r_y + dy, r_x + dx), (r_y + dy + H, r_x + dx + W))
        for dy, dx in offsets
    ]


def sep_conv2d(img: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D convolution with replicate-edge padding, expressed as
    shift-and-add (fuses on TPU; see `shifted`). img: [H, W]."""
    k = np.asarray(k1d)
    r = len(k) // 2
    rows = shifted(img, [(dy, 0) for dy in range(-r, r + 1)])
    acc = sum(float(k[i]) * rows[i] for i in range(len(k)))
    cols = shifted(acc, [(0, dx) for dx in range(-r, r + 1)])
    return sum(float(k[i]) * cols[i] for i in range(len(k)))


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """7x7 sigma-2 blur like the pre-descriptor blur in the reference
    (src/ORBextractor.cc: GaussianBlur(..., Size(7,7), 2, 2))."""
    return sep_conv2d(img, gaussian_kernel1d(sigma, radius))


def resize_bilinear(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    return jax.image.resize(img, out_hw, method="bilinear")


@partial(jax.jit, static_argnames=("n_levels", "scale_factor"))
def build_pyramid(img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2):
    """Image [H, W] float32 -> tuple of per-level images (static shapes)."""
    h, w = img.shape
    sizes = level_sizes(h, w, n_levels, scale_factor)
    levels = [img]
    for l in range(1, n_levels):
        # resize from the previous level (like cv::resize chain in the ref),
        # rounded to integer grey levels — the reference pyramid is uint8
        # (src/ORBextractor.cc:1107 ComputePyramid on CV_8U). Integer levels
        # also make every value exactly representable in bfloat16 (<= 255
        # needs 8 mantissa bits), so downstream one-hot-matmul patch gathers
        # select pixels EXACTLY with single bf16 matmuls (no hi/lo split).
        levels.append(jnp.round(resize_bilinear(levels[-1], sizes[l])))
    return tuple(levels)


def sobel_gradients(img: jnp.ndarray):
    """(gx, gy, magnitude) via 3x3 Sobel — feeds the semi-dense edge mask
    (stand-in for EdgeDrawing chains, SURVEY.md §2.2 EDTest row)."""
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    s = dict(zip(offs, shifted(img, offs)))
    gx = (s[(-1, 1)] + 2 * s[(0, 1)] + s[(1, 1)]) - (
        s[(-1, -1)] + 2 * s[(0, -1)] + s[(1, -1)]
    )
    gy = (s[(1, -1)] + 2 * s[(1, 0)] + s[(1, 1)]) - (
        s[(-1, -1)] + 2 * s[(-1, 0)] + s[(-1, 1)]
    )
    mag = jnp.sqrt(gx * gx + gy * gy)
    return gx, gy, mag
