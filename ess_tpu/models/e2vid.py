"""E2VID model family: (recurrent) UNet events->image reconstruction nets.

Capability parity with the reference model family
(/root/reference/e2vid/model/model.py:9-166, e2vid/model/unet.py:16-279):
``UNet`` (plain), ``RecurrentUNet`` (E2VIDRecurrent: per-encoder ConvLSTM,
returns image + states + multi-scale latent dict), and ``UNetDecoder``
(decoder-only variant, E2VIDDecoder).

The shipped E2VID-lightweight geometry is 3 encoders / base 32 / sum skips /
no norm (SURVEY.md section 2.5): latent channels {1: 32, 2: 64, 4: 128,
8: 256}.

TPU-first: NHWC; recurrent state is an explicit pytree argument (a tuple of
per-encoder ConvLSTM (h, c) pairs) so a 20-window rollout is one
``jax.lax.scan`` with donated carry, not 20 retraced calls; the latent dict
is keyed by downsample factor like the reference so the segmentation head and
cycle losses line up.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ess_tpu.models.layers import (
    ConvLayer,
    RecurrentConvLayer,
    ResidualBlock,
    TransposedConvLayer,
    UpsampleConvLayer,
    skip_merge,
)

Dtype = Any
Latent = Dict[int, jax.Array]


def zero_recurrent_state(
    batch: int,
    height: int,
    width: int,
    *,
    num_encoders: int = 3,
    base_channels: int = 32,
    recurrent_block: str = "convlstm",
    quad_block: bool = False,
    dtype=jnp.float32,
):
    """Zero ConvLSTM/GRU state for a padded (height, width) input.

    Equivalent to the reference's lazily-created zero state tensors
    (submodules.py:195-207); here the caller owns the state explicitly.
    ``quad_block=True``: the first encoder's state lives in space-to-depth
    form (B, H/4, W/4, 4*C) — the quad-block rollout's layout.
    """
    states = []
    h, w = height, width
    for i in range(num_encoders):
        h, w = h // 2, w // 2
        c = base_channels * 2 ** (i + 1)
        sh = ((batch, h // 2, w // 2, 4 * c) if quad_block and i == 0
              else (batch, h, w, c))
        if recurrent_block == "convlstm":
            # distinct buffers: (h, c) sharing one zeros array would alias
            # under buffer donation ("donate the same buffer twice")
            states.append((jnp.zeros(sh, dtype),
                           jnp.zeros(sh, dtype).copy()))
        else:
            states.append(jnp.zeros(sh, dtype))
    return tuple(states)


class RecurrentUNet(nn.Module):
    """E2VID recurrent UNet (unet.py:117-181 behavior).

    head 5x5 conv -> num_encoders x (stride-2 conv + ConvLSTM) ->
    num_residual_blocks resblocks -> decoders with skip merge -> 1x1 pred +
    sigmoid. Returns ``(image, new_states, latent)`` where latent maps
    downsample factor -> NHWC feature (latent[1]=head, latent[2^i]=encoder
    i-1 output), matching unet.py:172.
    """

    base_channels: int = 32
    num_encoders: int = 3
    num_residual_blocks: int = 2
    num_output_channels: int = 1
    skip_type: str = "sum"
    recurrent_block: str = "convlstm"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    final_activation: Optional[str] = "sigmoid"
    # Head-conv implementation. The 5-channel voxel input is MXU-hostile for
    # XLA's direct conv lowering (~4 TF/s measured on v5e); 'auto' resolves
    # to the space-to-depth block conv (ops/conv_s2d.py: exact same math,
    # contraction 180 / 128 output lanes) when stride 1, k=5 and even H/W.
    head_conv_impl: str = "auto"
    # ConvLSTM cell implementation: 'xla' | 'pallas' | 'pallas_interpret'
    # (ops/conv_lstm_pallas.py fused kernel; resolved from cfg by the builder)
    lstm_impl: str = "xla"
    # Block-space conv implementation for the head + first-encoder convs when
    # running with block_input=True: 'xla' | 'pallas' | 'pallas_int8'
    # (ops/conv3x3_pallas.py). The builder derives this from lstm_impl so the
    # whole frozen rollout runs one precision policy.
    block_conv_impl: str = "xla"
    # Quad-block rollout: with block_input, consume 4x4 space-to-depth
    # windows (B, H/4, W/4, 16C); the head + first encoder evaluate at
    # quarter resolution with 16x/4x channel widths and the first ConvLSTM
    # runs on s2d state — exact-math weight remaps throughout
    # (ops/conv_s2d.block_kernel). Why: the 64-channel first level is the
    # single most MXU-hostile stage of the DSEC rollout (measured ~2x the
    # per-FLOP cost of the 128-channel level on v5e).
    quad_block: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, states: Sequence, *, train: bool = False,
        decode: bool = True, block_input: bool = False,
    ) -> Tuple[Optional[jax.Array], Tuple, Latent]:
        """Forward one event window.

        ``decode=False`` runs only head + recurrent encoders (state update +
        latent) and returns ``(None, states, latent)``. The training rollout
        uses this for all but the final window — only the last window's image
        and decoded features are ever consumed (ess_trainer.py:277-285), so
        skipping the decoder halves the recurrent FLOPs.

        ``block_input=True``: ``x`` is the SPACE-TO-DEPTH window
        (B, H/2, W/2, 4*C). The head conv and the first encoder's stride-2
        conv both evaluate in block space (ops/conv_s2d.py) — the full
        -resolution 32-channel head activation (the single largest HBM
        tensor of the rollout) is materialized only on decode windows, and
        both MXU-hostile convs become well-tiled 3x3 convs. Same params,
        same math.
        """
        compute = x.astype(self.dtype)

        if block_input:
            from ess_tpu.ops.conv_s2d import depth_to_space, depth_to_space4

            quad = self.quad_block
            head_blk = ConvLayer(
                self.base_channels, kernel_size=5, strides=1,
                activation="relu", norm=None,
                block_conv_impl=self.block_conv_impl,
                dtype=self.dtype, name="head",
            )(compute, train=train, block_space=4 if quad else True)
            # full-res head only where consumed (decode windows); the scan
            # body drops latent, so XLA DCEs this transpose there.
            head = (depth_to_space4 if quad else depth_to_space)(head_blk)
            enc_in = head_blk
        else:
            quad = False
            head = ConvLayer(
                self.base_channels, kernel_size=5, strides=1,
                activation="relu", norm=None, conv_impl=self.head_conv_impl,
                dtype=self.dtype, name="head",
            )(compute, train=train)
            enc_in = head

        latent: Latent = {1: head}
        blocks = []
        new_states = []
        h = enc_in
        for i in range(self.num_encoders):
            features = self.base_channels * 2 ** (i + 1)
            if quad:
                # level 0 consumes s4d, runs on s2d state; level 1 consumes
                # the s2d hidden state through the existing block conv
                bs = 4 if i == 0 else (True if i == 1 else False)
            else:
                bs = block_input and i == 0
            h, st = RecurrentConvLayer(
                features, kernel_size=5, strides=2,
                recurrent_block=self.recurrent_block, norm=self.norm,
                lstm_impl=self.lstm_impl,
                block_conv_impl=self.block_conv_impl, dtype=self.dtype,
                name=f"encoder_{i}",
            )(h, states[i], train=train, block_space=bs)
            new_states.append(st)
            if bs == 4:
                # decoder skips / latent want the standard layout; in the
                # encoder-only scan body these are dropped, so XLA DCEs the
                # transpose — only decode windows pay it. `h` itself stays
                # s2d: the next level's block conv consumes it directly.
                from ess_tpu.ops.conv_s2d import depth_to_space as _d2s
                h_std = _d2s(h)
            else:
                h_std = h
            blocks.append(h_std)
            latent[2 ** (i + 1)] = h_std

        if not decode:
            return None, tuple(new_states), latent

        for i in range(self.num_residual_blocks):
            h = ResidualBlock(
                self.base_channels * 2 ** self.num_encoders,
                norm=self.norm, dtype=self.dtype, name=f"resblock_{i}",
            )(h, train=train)

        Up = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        for i in range(self.num_encoders):
            in_scale_feats = self.base_channels * 2 ** (self.num_encoders - i)
            h = Up(
                in_scale_feats // 2, kernel_size=5,
                activation="relu", norm=self.norm, dtype=self.dtype,
                name=f"decoder_{i}",
            )(skip_merge(self.skip_type, h, blocks[self.num_encoders - i - 1]),
              train=train)

        img = ConvLayer(
            self.num_output_channels, kernel_size=1, strides=1,
            activation=self.final_activation, norm=self.norm,
            dtype=self.dtype, name="pred",
        )(skip_merge(self.skip_type, h, head), train=train)

        return img.astype(jnp.float32), tuple(new_states), latent


class UNet(nn.Module):
    """Plain (non-recurrent) E2VID UNet (unet.py:70-114 behavior)."""

    base_channels: int = 32
    num_encoders: int = 3
    num_residual_blocks: int = 2
    num_output_channels: int = 1
    skip_type: str = "sum"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    final_activation: Optional[str] = "sigmoid"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        compute = x.astype(self.dtype)
        head = ConvLayer(self.base_channels, kernel_size=5, activation="relu",
                         dtype=self.dtype, name="head")(compute, train=train)
        blocks = []
        h = head
        for i in range(self.num_encoders):
            h = ConvLayer(
                self.base_channels * 2 ** (i + 1), kernel_size=5, strides=2,
                activation="relu", norm=self.norm, dtype=self.dtype,
                name=f"encoder_{i}",
            )(h, train=train)
            blocks.append(h)
        for i in range(self.num_residual_blocks):
            h = ResidualBlock(self.base_channels * 2 ** self.num_encoders,
                              norm=self.norm, dtype=self.dtype,
                              name=f"resblock_{i}")(h, train=train)
        Up = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        for i in range(self.num_encoders):
            h = Up(
                self.base_channels * 2 ** (self.num_encoders - i) // 2,
                kernel_size=5, activation="relu", norm=self.norm,
                dtype=self.dtype, name=f"decoder_{i}",
            )(skip_merge(self.skip_type, h, blocks[self.num_encoders - i - 1]),
              train=train)
        img = ConvLayer(self.num_output_channels, kernel_size=1,
                        activation=self.final_activation, dtype=self.dtype,
                        name="pred")(skip_merge(self.skip_type, h, head),
                                     train=train)
        return img.astype(jnp.float32)


class UNetTaskDecoder(nn.Module):
    """UNet-style multi-scale semantic-segmentation decoder over a latent
    dict (unet.py:222-279 UNetTask / model.py E2VIDTask capability).

    Consumes the E2VID latent {1, 2, 4, 8} and emits a multi-scale output
    dict {8: latent, 4: feat, 2: feat, 1: class logits} like the reference's
    UNetTask (which ESS itself supersedes with SegmentationHead). The
    reference feeds a hard-coded zero head at full scale (unet.py:264); here
    the real latent[1] is used — strictly more information, same shapes.
    """

    num_classes: int
    base_channels: int = 32
    num_encoders: int = 3
    num_residual_blocks: int = 2
    skip_type: str = "sum"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latent: Latent, *, train: bool = False) -> Latent:
        h = latent[2 ** self.num_encoders].astype(self.dtype)
        out: Latent = {2 ** self.num_encoders: latent[2 ** self.num_encoders]}
        for i in range(self.num_residual_blocks):
            h = ResidualBlock(self.base_channels * 2 ** self.num_encoders,
                              norm=self.norm, dtype=self.dtype,
                              name=f"resblock_{i}")(h, train=train)
        Up = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        for i in range(self.num_encoders):
            h = Up(
                self.base_channels * 2 ** (self.num_encoders - i) // 2,
                kernel_size=5, activation="relu", norm=self.norm,
                dtype=self.dtype, name=f"decoder_{i}",
            )(skip_merge(self.skip_type, h, latent[2 ** (self.num_encoders - i)]),
              train=train)
            out[2 ** (self.num_encoders - i - 1)] = h
        h = skip_merge(self.skip_type, h, latent[1])
        h = ConvLayer(self.base_channels, kernel_size=1, activation="relu",
                      dtype=self.dtype, name="pred_hidden")(h, train=train)
        logits = ConvLayer(self.num_classes, kernel_size=1, activation=None,
                           dtype=self.dtype, name="pred")(h, train=train)
        out[1] = logits.astype(jnp.float32)
        return out


class UNetDecoder(nn.Module):
    """Decoder-only variant (unet.py:183-219, E2VIDDecoder model.py:103-139):
    consumes a latent dict produced elsewhere and decodes an image."""

    base_channels: int = 32
    num_encoders: int = 3
    num_residual_blocks: int = 2
    num_output_channels: int = 1
    skip_type: str = "sum"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    final_activation: Optional[str] = "sigmoid"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latent: Latent, *, train: bool = False) -> jax.Array:
        h = latent[2 ** self.num_encoders].astype(self.dtype)
        head = latent[1]
        for i in range(self.num_residual_blocks):
            h = ResidualBlock(self.base_channels * 2 ** self.num_encoders,
                              norm=self.norm, dtype=self.dtype,
                              name=f"resblock_{i}")(h, train=train)
        Up = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        for i in range(self.num_encoders):
            h = Up(
                self.base_channels * 2 ** (self.num_encoders - i) // 2,
                kernel_size=5, activation="relu", norm=self.norm,
                dtype=self.dtype, name=f"decoder_{i}",
            )(skip_merge(self.skip_type, h, latent[2 ** (self.num_encoders - i)]),
              train=train)
        img = ConvLayer(self.num_output_channels, kernel_size=1,
                        activation=self.final_activation, dtype=self.dtype,
                        name="pred")(skip_merge(self.skip_type, h, head),
                                     train=train)
        return img.astype(jnp.float32)
