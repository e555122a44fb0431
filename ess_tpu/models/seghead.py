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
    _BlockConv,
    _PointwiseConv,
    skip_merge,
    upsample2x_nearest,
)

Dtype = Any
Latent = Dict[int, jax.Array]


class SegmentationHead(nn.Module):
    """Multi-scale segmentation decoder over a {1,2,4,8} latent dict.

    ``block_space=True`` (train-step fast path; requires ``skip_connect``)
    evaluates the scale-2 stage in s2d form and the scale-1 stage in s4d
    form — exact math via the block-kernel weight remaps, same params. Why:
    those stages are the MXU-hostile half of the head (64->64 at 220x320
    runs at half MXU occupancy, 64->32 at 440x640 at a quarter, and the
    logits' class dim lane-pads 11 -> 128 on TPU so every full-res logits
    pass moves ~12x its information content). Blocked, the convs contract
    over 4x/16x wider channels, the nearest-2x upsamples become channel
    broadcasts (no full-res intermediate is ever materialized), and the
    logits emerge as (B, H/4, W/4, 16*C). Returned layouts then differ:
    ``out[2]`` is s2d, ``out[1]`` is s4d — the train-step losses consume
    them directly (elementwise/softmax losses are layout-invariant once
    labels are folded to match; see train/losses.py fold helpers).
    """

    num_classes: int
    input_features: int = 256
    skip_connect: bool = True
    skip_type: str = "concat"  # 'sum' | 'concat'
    input_index_map: bool = False  # non-skip variant: append (i, j) coords
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latent: Latent, *, block_space: bool = False,
                 fused_final: bool = False) -> Latent:
        tch = self.input_features
        x = latent[8].astype(self.dtype)
        out: Latent = {8: latent[8]}
        assert not (block_space and not self.skip_connect), (
            "block_space supports the skip_connect head (the production "
            "config); the non-skip variant has no blocked path")
        assert not (block_space and fused_final)

        if self.skip_connect:
            for i in range(5):
                x = INSResBlock(tch, dtype=self.dtype, name=f"res_{i}")(x)
            x = ReLUINSConv2d(tch // 2, dtype=self.dtype, name="reduce")(x)

            x = upsample2x_nearest(x)
            x = skip_merge(self.skip_type, x, latent[4])
            x = ReLUINSConv2d(tch // 2, dtype=self.dtype, name="s2_a")(x)
            x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s2_b")(x)
            out[4] = x

            if block_space:
                from ess_tpu.ops.conv_s2d import (
                    space_to_depth, tile_upsample2x_s2d,
                    tile_upsample2x_s2d_to_s4d)

                cx, cs = x.shape[-1], latent[2].shape[-1]
                x = tile_upsample2x_s2d(x)              # s2d of up2x(out[4])
                skip = space_to_depth(latent[2].astype(x.dtype))
                if self.skip_type == "sum":
                    x = x + skip                        # aligned s2d layouts
                    segs = None
                else:
                    x = jnp.concatenate([x, skip], axis=-1)
                    segs = (cx, cs)
                x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s3_a")(
                    x, block_space=2, in_segments=segs)
                x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s3_b")(
                    x, block_space=2)
                out[2] = x                              # s2d layout

                x = tile_upsample2x_s2d_to_s4d(x)       # s4d of up2x(out[2])
                x = ReLUINSConv2d(tch // 8, dtype=self.dtype, name="s4")(
                    x, block_space=4)
                x = _BlockConv(self.num_classes, kernel_size=1, in_block=4,
                               dtype=self.dtype, name="logits")(x)
                out[1] = x                              # s4d layout
                return out

            x = upsample2x_nearest(x)
            x = skip_merge(self.skip_type, x, latent[2])
            x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s3_a")(x)
            x = ReLUINSConv2d(tch // 4, dtype=self.dtype, name="s3_b")(x)
            out[2] = x

            out[1] = self._final_stage(x, fused_final)
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
            out[1] = self._final_stage(x, fused_final)

        return out

    def _final_stage(self, x: jax.Array, fused: bool) -> jax.Array:
        """The scale-1 stage: nearest-2x upsample -> 3x3 conv + IN + ReLU
        ('s4') -> 1x1 class conv ('logits').

        ``fused=True`` folds the upsample into the s4 conv's weights
        (models/layers._UpFusedConv — identical MACs, full MXU occupancy,
        source-resolution InstanceNorm) and applies the 1x1 logits conv on
        the parity-unpacked (B, h, w*4, C_s4) view, so logits emerge
        class-minor at (B, h, w*4, num_classes) — one pseudo-pixel per
        full-res pixel in (j, r, s) order, ready for the folded losses
        (train/losses.fold_labels_up2x) — and the lane-padded full-res
        (2h, 2w, C<=32) tensors of this stage never exist. Same parameters,
        same math as the standard evaluation."""
        tch = self.input_features
        if fused:
            x = ReLUINSConv2d(tch // 8, dtype=self.dtype, name="s4")(
                x, up2x_fused=True)                    # (B, h, w, 4*C_s4)
            b, h, w, c4 = x.shape
            x = x.reshape(b, h, w * 4, c4 // 4)        # parity pseudo-pixels
            return _PointwiseConv(self.num_classes, dtype=self.dtype,
                                  name="logits")(x)
        x = upsample2x_nearest(x)
        x = ReLUINSConv2d(tch // 8, dtype=self.dtype, name="s4")(x)
        # logits stay in compute dtype: the values are already bf16
        # -rounded, so upcasting here only materializes a 2x-bandwidth
        # full-res f32 tensor; the losses upcast inside their own passes
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="logits")(x)
