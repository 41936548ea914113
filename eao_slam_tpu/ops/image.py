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


def sep_conv2d(img: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D convolution with replicate-edge padding. img: [H, W]."""
    r = k1d.shape[0] // 2
    x = img[None, None]  # NCHW
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (r, r)), mode="edge")
    kh = k1d.reshape(1, 1, -1, 1)
    kw = k1d.reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return x[0, 0]


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """7x7 sigma-2 blur like the pre-descriptor blur in the reference
    (src/ORBextractor.cc: GaussianBlur(..., Size(7,7), 2, 2))."""
    return sep_conv2d(img, jnp.asarray(gaussian_kernel1d(sigma, radius)))


def resize_bilinear(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    return jax.image.resize(img, out_hw, method="bilinear")


@partial(jax.jit, static_argnames=("n_levels", "scale_factor"))
def build_pyramid(img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2):
    """Image [H, W] float32 -> tuple of per-level images (static shapes)."""
    h, w = img.shape
    sizes = level_sizes(h, w, n_levels, scale_factor)
    levels = [img]
    for l in range(1, n_levels):
        # resize from the previous level (like cv::resize chain in the ref)
        levels.append(resize_bilinear(levels[-1], sizes[l]))
    return tuple(levels)


def sobel_gradients(img: jnp.ndarray):
    """(gx, gy, magnitude) via 3x3 Sobel — feeds the semi-dense edge mask
    (stand-in for EdgeDrawing chains, SURVEY.md §2.2 EDTest row)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    x = jnp.pad(img[None, None], ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    gx = jax.lax.conv_general_dilated(x, kx[None, None], (1, 1), "VALID")[0, 0]
    gy = jax.lax.conv_general_dilated(x, ky[None, None], (1, 1), "VALID")[0, 0]
    mag = jnp.sqrt(gx * gx + gy * gy)
    return gx, gy, mag
