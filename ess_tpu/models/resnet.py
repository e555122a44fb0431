"""ResNet18-based grayscale image encoder (sensor-A front-end).

Capability parity with StyleEncoderE2VID
(/root/reference/models/style_networks.py:110-145): a 1-channel 7x7/2 stem
(no maxpool) followed by ResNet18's bn/relu and layer1 (scale 2, 64ch),
layer2 (scale 4, 128ch), layer3 (scale 8, 256ch). Output is a multi-scale
latent dict {1: input, 2: ..., 4: ..., 8: ...} whose channel counts match the
E2VID recurrent latent, so the two domains share one segmentation head.

The reference initializes from torchvision's ImageNet-pretrained resnet18;
``ess_tpu.io.convert.load_torch_resnet18`` converts those weights when a
torch checkpoint is available (no-network environments train from scratch).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ess_tpu.models.layers import TorchBatchNorm

Dtype = Any


class BasicBlock(nn.Module):
    """ResNet basic block: two 3x3 convs with BN, identity or 1x1-projected
    skip.

    ``block_space=True`` (stride-1 identity blocks only): both convs
    evaluate on the s2d input via the exact block-kernel remap and the BNs
    pool statistics over subpixels — same params, same math, 4x-wider MXU
    contractions (layer1's 64-channel convs run at half MXU occupancy in
    the standard layout). Input and output are s2d tensors.
    """

    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 block_space: bool = False) -> jax.Array:
        def bn(name, h, block=1):
            return TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, block=block,
                                  dtype=self.dtype, name=name)(h)

        if block_space:
            from ess_tpu.models.layers import _BlockConv

            assert self.strides == 1 and x.shape[-1] == 4 * self.features, (
                "blocked BasicBlock supports stride-1 identity blocks")
            y = _BlockConv(self.features, kernel_size=3, use_bias=False,
                           in_block=2, dtype=self.dtype, name="conv1")(x)
            y = nn.relu(bn("bn1", y, block=2))
            y = _BlockConv(self.features, kernel_size=3, use_bias=False,
                           in_block=2, dtype=self.dtype, name="conv2")(y)
            y = bn("bn2", y, block=2)
            return nn.relu(y + x)

        needs_proj = self.strides != 1 or x.shape[-1] != self.features
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1", y))
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2", y)
        if needs_proj:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="proj_conv")(x)
            residual = bn("proj_bn", residual)
        return nn.relu(y + residual)


class ResNet18Encoder(nn.Module):
    """Grayscale ResNet18 trunk returning multi-scale features.

    Stem: 7x7/2 conv (1 -> 64) + BN + ReLU, deliberately without the usual
    maxpool (style_networks.py:115-121) so layer1 output sits at scale 2.
    """

    dtype: Dtype = jnp.float32
    skip_connect: bool = True
    # Width of layer1; layers scale (1x, 2x, 4x). 64 is torchvision's
    # resnet18; the builder sets 2*e2vid_base so the multi-scale channel
    # counts always match the E2VID latent the head was built for.
    base_width: int = 64
    # Stem evaluation: 'auto' evaluates the 7x7/2 C_in=1 conv in 4x4 block
    # space when the input tiles into 4x4 blocks — the 1-channel contraction
    # is the worst MXU shape in the framework (K=49 vs the 128-lane tile;
    # the analogous 5-channel head conv measured ~4 TF/s under XLA's direct
    # lowering on v5e). block_kernel(k=7, bi=4, bo=2, stride=2) turns it
    # into a stride-1 3x3 conv (16 -> 256 channels) followed by one cheap
    # depth-to-space; same (7,7,1,64) params, exact math. 'xla' forces the
    # direct lowering (A/B + odd geometries).
    stem_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[int, jax.Array]:
        out: Dict[int, jax.Array] = {1: x}
        w = self.base_width
        h = x.astype(self.dtype)
        blocked = (self.stem_impl == "auto"
                   and h.shape[1] % 4 == 0 and h.shape[2] % 4 == 0)
        if blocked:
            # The whole scale-2 trunk runs in s2d: the stem's blocked conv
            # EMITS s2d, layer1's 64-channel convs (half MXU occupancy in
            # the standard layout) consume it, and one cheap depth-to-space
            # at the end restores the standard latent[2]. Exact math
            # throughout (block-kernel remaps + subpixel-pooled BN stats).
            from ess_tpu.models.layers import _BlockConv
            from ess_tpu.ops.conv_s2d import depth_to_space, space_to_depth4

            h = _BlockConv(w, kernel_size=7, strides=2, use_bias=False,
                           in_block=4, dtype=self.dtype,
                           name="stem_conv")(space_to_depth4(h))
            h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, block=2, dtype=self.dtype,
                               name="stem_bn")(h)
            h = nn.relu(h)
            h = BasicBlock(w, dtype=self.dtype, name="layer1_0")(
                h, train=train, block_space=True)
            h = BasicBlock(w, dtype=self.dtype, name="layer1_1")(
                h, train=train, block_space=True)
            h = depth_to_space(h)
        else:
            h = nn.Conv(w, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=self.dtype, name="stem_conv")(h)
            h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype, name="stem_bn")(h)
            h = nn.relu(h)
            # layer1: 2 blocks @ base_width, stride 1 (scale 2)
            h = BasicBlock(w, dtype=self.dtype, name="layer1_0")(h, train=train)
            h = BasicBlock(w, dtype=self.dtype, name="layer1_1")(h, train=train)
        if self.skip_connect:
            out[2] = h
        # layer2: 2 blocks @ 2*base_width, first stride 2 (scale 4)
        h = BasicBlock(2 * w, strides=2, dtype=self.dtype, name="layer2_0")(h, train=train)
        h = BasicBlock(2 * w, dtype=self.dtype, name="layer2_1")(h, train=train)
        if self.skip_connect:
            out[4] = h
        # layer3: 2 blocks @ 4*base_width, first stride 2 (scale 8)
        h = BasicBlock(4 * w, strides=2, dtype=self.dtype, name="layer3_0")(h, train=train)
        h = BasicBlock(4 * w, dtype=self.dtype, name="layer3_1")(h, train=train)
        out[8] = h
        return out
