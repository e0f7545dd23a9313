"""Image primitives: bilinear resize, separable Gaussian blur, pyramids.

Replaces the OpenCV calls of the reference extractor
(`/root/reference/src/ORBextractor.cc:1152-1177` ``ComputePyramid`` uses
``cv::resize`` INTER_LINEAR level-from-level; `:1115` blurs each level with
``GaussianBlur(7, 7, 2, 2, BORDER_REFLECT_101)`` before rBRIEF sampling).

Images are float32 (H, W) in [0, 255] — keeping uint8 units so the FAST
thresholds (20 / 7) carry over unchanged.  Everything is jit-safe with static
shapes; pyramid level sizes are computed in Python at trace time.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """Matches cv::getGaussianKernel for odd ksize."""
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with BORDER_REFLECT_101 edges.

    img: (..., H, W) float32.
    """
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma), dtype=img.dtype)
    r = ksize // 2
    # reflect-101: edge pixel not duplicated
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)], mode="reflect")
    # horizontal then vertical via conv per axis — implemented as sum of shifts
    # (cheap: k is tiny; XLA fuses the shifted adds into one loop)
    out = jnp.zeros_like(x[..., r:-r])
    for i in range(ksize):
        out = out + k[i] * x[..., :, i : i + img.shape[-1]]
    out2 = jnp.zeros_like(out[..., r:-r, :])
    for i in range(ksize):
        out2 = out2 + k[i] * out[..., i : i + img.shape[-2], :]
    return out2


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv::resize INTER_LINEAR equivalent (half-pixel centers)."""
    return jax.image.resize(img, img.shape[:-2] + (out_h, out_w), method="linear")


def pyramid_sizes(h: int, w: int, n_levels: int, scale_factor: float):
    """Per-level (h, w) with OpenCV-style rounding (level-from-level)."""
    sizes = [(h, w)]
    fh, fw = float(h), float(w)
    for _ in range(1, n_levels):
        fh, fw = fh / scale_factor, fw / scale_factor
        sizes.append((int(round(fh)), int(round(fw))))
    return sizes


def build_pyramid(
    img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2
) -> list[jnp.ndarray]:
    """List of (Hl, Wl) float32 levels; level 0 is the input."""
    h, w = img.shape[-2], img.shape[-1]
    sizes = pyramid_sizes(h, w, n_levels, scale_factor)
    levels = [img]
    for lvl in range(1, n_levels):
        hl, wl = sizes[lvl]
        levels.append(resize_bilinear(levels[-1], hl, wl))
    return levels


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) [0,255] -> (H, W) using the BT.601 weights cv::cvtColor uses."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=img.dtype)
    return img @ w
