"""Shared semantic-segmentation decoder head.

Capability parity with SemSegE2VID
(/root/reference/models/style_networks.py:9-107): decodes the scale-8 256ch
latent through instance-norm res/conv blocks with nearest 2x upsampling,
optionally skip-merging the encoder latent dict at scales 4 and 2, and emits
a multi-scale output dict {8: input latent, 4: feat, 2: feat, 1: logits}
consumed by the cycle-consistency losses.

Channel flow (skip_connect variant, input_c=256):
  256 --[5x INSResBlock + ReLUINSConv]--> 128 @ /8
  up2 + merge(latent[4]) --> 2 convs --> 64 @ /4     (out[4])
  up2 + merge(latent[2]) --> 2 convs --> 64 @ /2     (out[2])
  up2 --> conv --> 32 --> 1x1 --> num_classes @ /1    (out[1])

Because flax convs infer input width lazily, both 'sum' and 'concat' skip
types work without separate channel bookkeeping.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ess_tpu.models.layers import (
    INSResBlock,
    ReLUINSConv2d,
    skip_merge,
    upsample2x_nearest,
)

Dtype = Any
Latent = Dict[int, jax.Array]


class SegmentationHead(nn.Module):
    """Multi-scale segmentation decoder over a {1,2,4,8} latent dict."""

    num_classes: int
    input_features: int = 256
    skip_connect: bool = True
    skip_type: str = "concat"  # 'sum' | 'concat'
    input_index_map: bool = False  # non-skip variant: append (i, j) coords
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latent: Latent) -> Latent:
        tch = self.input_features
        x = latent[8].astype(self.dtype)
        out: Latent = {8: latent[8]}

        if self.skip_connect:
            for i in range(5):
                x = INSResBlock(tch, dtype=self.dtype, name=f"res_{i}")(x)
            x = ReLUINSConv2d(tch // 2, dtype=self.dtype, name="reduce")(x)

            x = upsample2x_nearest(x)
            x = skip_merge(self.skip_type, x, latent[4])
            x = ReLUINSConv2d(tch // 2, dtype=self.dtype, name="s2_a")(x)
            x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s2_b")(x)
            out[4] = x

            x = upsample2x_nearest(x)
            x = skip_merge(self.skip_type, x, latent[2])
            x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s3_a")(x)
            x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s3_b")(x)
            out[2] = x

            x = upsample2x_nearest(x)
            x = ReLUINSConv2d(tch // 8, dtype=self.dtype, name="s4")(x)
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="logits")(x)
            # logits stay in compute dtype: the values are already bf16
            # -rounded, so upcasting here only materializes a 2x-bandwidth
            # full-res f32 tensor; the losses upcast inside their own passes
            out[1] = x
        else:
            if self.input_index_map:
                n, h, w, _ = x.shape
                ii = jnp.broadcast_to(
                    jnp.arange(h, dtype=self.dtype)[None, :, None, None], (n, h, w, 1))
                jj = jnp.broadcast_to(
                    jnp.arange(w, dtype=self.dtype)[None, None, :, None], (n, h, w, 1))
                x = jnp.concatenate([x, ii, jj], axis=-1)
            for i in range(3):
                x = INSResBlock(x.shape[-1], dtype=self.dtype, name=f"res_{i}")(x)
            x = upsample2x_nearest(x)
            x = ReLUINSConv2d(tch // 2, dtype=self.dtype, name="s2")(x)
            out[4] = x
            x = upsample2x_nearest(x)
            x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s3")(x)
            out[2] = x
            x = upsample2x_nearest(x)
            x = ReLUINSConv2d(tch // 8, dtype=self.dtype, name="s4")(x)
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="logits")(x)
            out[1] = x

        return out
