"""Resize ops (NHWC) used on the training path.

The reference resizes with torch.nn.functional.interpolate (bilinear,
align_corners=False — e.g. ddd17_events_loader.py:162-166) and nearest
(prediction upsampling before mIoU scoring, ess_trainer.py:484). jax.image
matches torch's align_corners=False conventions: 'linear' == bilinear
half-pixel centers, 'nearest' == floor sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize of an NHWC (or HWC) tensor to (height, width)."""
    shape = list(x.shape)
    shape[-3] = height
    shape[-2] = width
    return jax.image.resize(x, shape, method="linear")


def resize_nearest(x: jax.Array, height: int, width: int) -> jax.Array:
    """Nearest-neighbor resize of an NHWC (or NHW label) tensor."""
    shape = list(x.shape)
    if x.ndim == 3:  # NHW integer labels
        shape[-2] = height
        shape[-1] = width
    else:
        shape[-3] = height
        shape[-2] = width
    return jax.image.resize(x, shape, method="nearest")
