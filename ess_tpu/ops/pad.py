"""Pad/crop geometry for UNet divisibility (reflection padding).

Capability parity with the reference's CropParameters / optimal_crop_size
(/root/reference/e2vid/utils/inference_utils.py:302-338): inputs are
reflection-padded up to the next multiple of 2^num_encoders before entering
the recurrent UNet, and outputs are cropped back.

Geometry is computed at trace time (static shapes), so under jit the pad is
a single fused XLA pad op. Layout is NHWC (TPU-native).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def optimal_crop_size(size: int, max_subsample_factor: int) -> int:
    """Smallest multiple of 2**max_subsample_factor that is >= size."""
    f = 2 ** max_subsample_factor
    return f * math.ceil(size / f)


@dataclass(frozen=True)
class CropGeometry:
    """Static pad/crop amounts for a (height, width) input.

    Padding is centered: ceil on top/left, floor on bottom/right,
    matching inference_utils.py:326-329.
    """

    height: int
    width: int
    num_encoders: int

    @property
    def padded_height(self) -> int:
        return optimal_crop_size(self.height, self.num_encoders)

    @property
    def padded_width(self) -> int:
        return optimal_crop_size(self.width, self.num_encoders)

    @property
    def pads(self) -> tuple[int, int, int, int]:
        """(top, bottom, left, right)."""
        dh = self.padded_height - self.height
        dw = self.padded_width - self.width
        return (math.ceil(dh / 2), math.floor(dh / 2), math.ceil(dw / 2), math.floor(dw / 2))


def reflect_pad(x: jax.Array, geom: CropGeometry) -> jax.Array:
    """Reflection-pad an NHWC tensor to the UNet-divisible size."""
    top, bottom, left, right = geom.pads
    if top == bottom == left == right == 0:
        return x
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="reflect")


def crop_output(x: jax.Array, geom: CropGeometry) -> jax.Array:
    """Crop an NHWC tensor back to the original (height, width)."""
    top, _, left, _ = geom.pads
    return jax.lax.dynamic_slice(
        x, (0, top, left, 0), (x.shape[0], geom.height, geom.width, x.shape[3])
    )
