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


def resize_bilinear(x: jax.Array, height: int, width: int,
                    align_corners: bool = False) -> jax.Array:
    """Bilinear resize of an NHWC (or HWC) tensor to (height, width).

    ``align_corners=True`` reproduces torch's align_corners=True sampling
    (output i samples input i*(in-1)/(out-1)) — the mode the reference uses
    for DDD17/DSEC event-tensor resizes (ddd17_events_loader.py:164,
    sequence.py:288). Default False == half-pixel centers.
    """
    shape = list(x.shape)
    shape[-3] = height
    shape[-2] = width
    if not align_corners:
        return jax.image.resize(x, shape, method="linear")
    in_h, in_w = x.shape[-3], x.shape[-2]
    scale = jnp.array([
        (height - 1) / max(in_h - 1, 1),
        (width - 1) / max(in_w - 1, 1),
    ], jnp.float32)
    # scale_and_translate samples input index (o + 0.5 - t)/s - 0.5 for
    # output index o; solving for o/s (align_corners) gives t = 0.5 - 0.5*s.
    translation = 0.5 - 0.5 * scale
    return jax.image.scale_and_translate(
        x, shape, (x.ndim - 3, x.ndim - 2), scale, translation,
        method="linear", antialias=False)


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
