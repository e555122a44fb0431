"""Reconstruction post-processing: tone mapping, sharpening, filtering.

Capability parity with the reference's inference-time image pipeline
(/root/reference/e2vid/utils/inference_utils.py):
- ``IntensityRescaler`` (:112-153): rescale intensities to [0, 1] by fixed
  Imin/Imax or robust-percentile auto-HDR with a median-smoothed bound
  window
- ``UnsharpMaskFilter`` (:261-279): gaussian-blur unsharp masking
- ``EventPreprocessor`` hot-pixel zeroing (:86-89)
- ``ImageFilter`` bilateral filter (:282-299) — host-side via cv2
- ``robust_min/robust_max`` (e2vid/utils/util.py) percentile helpers

The device ops are pure jnp (jit/vmap-friendly); the stateful auto-HDR
bound smoothing is a small host-side class like the reference's deque.
"""

from __future__ import annotations

from collections import deque
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def robust_min(img: jax.Array, top_percent: float = 5.0) -> jax.Array:
    return jnp.percentile(img, top_percent)


def robust_max(img: jax.Array, top_percent: float = 95.0) -> jax.Array:
    return jnp.percentile(img, top_percent)


def rescale_intensity(
    img: jax.Array, imin: float | jax.Array = 0.0, imax: float | jax.Array = 1.0
) -> jax.Array:
    """Linear rescale of [imin, imax] -> [0, 1], clipped, with the
    reference's 8-bit quantize-dequantize round trip
    (inference_utils.py:140-147)."""
    out = 255.0 * (img - imin) / jnp.maximum(imax - imin, 1e-9)
    out = jnp.clip(out, 0.0, 255.0)
    out = jnp.floor(out)  # .byte() truncation
    return out / 255.0


class IntensityRescaler:
    """Auto-HDR intensity rescaling with median-smoothed bounds."""

    def __init__(self, auto_hdr: bool = False, imin: float = 0.0,
                 imax: float = 1.0, median_filter_size: int = 10,
                 percentile: float = 5.0):
        self.auto_hdr = auto_hdr
        self.imin, self.imax = imin, imax
        self.percentile = percentile
        self._mins: deque = deque(maxlen=median_filter_size)
        self._maxs: deque = deque(maxlen=median_filter_size)

    def __call__(self, img: jax.Array) -> jax.Array:
        imin, imax = self.imin, self.imax
        if self.auto_hdr:
            self._mins.append(float(robust_min(img, self.percentile)))
            self._maxs.append(float(robust_max(img, 100 - self.percentile)))
            imin = float(np.median(self._mins))
            imax = float(np.median(self._maxs))
        return rescale_intensity(img, imin, imax)


def gaussian_kernel(size: int = 5, sigma: float = 1.0) -> jax.Array:
    """2D gaussian kernel (inference_utils.gkern equivalent)."""
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g1 = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    k = jnp.outer(g1, g1)
    return k / jnp.sum(k)


def unsharp_mask(img: jax.Array, amount: float = 0.3, sigma: float = 1.0,
                 size: int = 5) -> jax.Array:
    """img + amount * (img - blur(img)), normalized like the reference
    (inference_utils.py:271-279: (img + a*(img - blurred)) / (1 + a))."""
    k = gaussian_kernel(size, sigma)[:, :, None, None]
    pad = size // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    blurred = jax.lax.conv_general_dilated(
        x, jnp.broadcast_to(k, (size, size, 1, img.shape[-1])),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=img.shape[-1])
    return (img + amount * (img - blurred)) / (1.0 + amount)


def zero_hot_pixels(events: jax.Array, hot_pixels: np.ndarray) -> jax.Array:
    """Zero (x, y) hot-pixel locations in an NHWC event tensor
    (EventPreprocessor, inference_utils.py:86-89)."""
    if len(hot_pixels) == 0:
        return events
    mask = np.ones(events.shape[1:3], np.float32)
    for x, y in np.asarray(hot_pixels, np.int64):
        if 0 <= y < mask.shape[0] and 0 <= x < mask.shape[1]:
            mask[y, x] = 0.0
    return events * jnp.asarray(mask)[None, :, :, None]


def bilateral_filter(img_hw: np.ndarray, sigma: float = 0.0) -> np.ndarray:
    """Host-side bilateral filter (ImageFilter, inference_utils.py:282-299)."""
    if sigma <= 0:
        return img_hw
    import cv2
    img8 = (np.clip(img_hw, 0, 1) * 255).astype(np.uint8)
    out = cv2.bilateralFilter(img8, 5, 25.0 * sigma, 25.0 * sigma)
    return out.astype(np.float32) / 255.0
