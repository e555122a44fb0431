"""Layer primitives: conv blocks, recurrent conv cells, style blocks.

Capability parity with the reference conv zoo
(/root/reference/e2vid/model/submodules.py:7-273 — ConvLayer,
TransposedConvLayer, UpsampleConvLayer, RecurrentConvLayer, ResidualBlock,
ConvLSTM, ConvGRU) and the style-network building blocks
(/root/reference/models/style_networks.py:152-201 — ReLUINSConv2d,
INSResBlock).

TPU-first choices:
- NHWC layout throughout (XLA:TPU's native conv layout).
- A ``dtype`` knob threads bfloat16 compute through every conv while params
  stay float32 (MXU-native mixed precision).
- Recurrent cells are pure functions of (input, state) -> (output, state) so
  the temporal rollout lives in a single ``jax.lax.scan`` (see
  ess_tpu/recon/reconstructor.py) instead of a Python loop.
- ConvLSTM computes all four gates with one conv on concat([x, h]) — one big
  MXU matmul per step; gate order (input, forget, output, candidate) is fixed
  so torch checkpoints convert index-for-index.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "tanh": jnp.tanh,
}


def activation_fn(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    if name is None:
        return lambda x: x
    return _ACTIVATIONS[name]


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's running-stat semantics.

    torch `_BatchNorm` normalizes with the biased batch variance but updates
    ``running_var`` with the UNBIASED one (factor n/(n-1), n = batch*spatial
    count); flax ``nn.BatchNorm`` uses the biased variance for both. The
    difference is negligible at production spatial sizes but is a systematic
    ~n/(n-1) drift on converted-checkpoint training trajectories (caught by
    tests/test_trajectory_parity.py at n=48). Parameter / batch_stats
    naming matches nn.BatchNorm ('scale', 'bias' / 'mean', 'var'), so
    checkpoints interchange.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    # block > 1: x is a space-to-depth tensor (channel = subpixel*C + c);
    # stats/params stay per ORIGINAL channel (C,), pooled over subpixels —
    # the same value set as the standard layout, so the math (and the
    # running-stat trajectory) is exactly the standard BatchNorm's.
    block: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_shape = x.shape
        nsub = self.block * self.block
        if nsub > 1:
            x = x.reshape(*x.shape[:-1], nsub, x.shape[-1] // nsub)
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype).reshape(orig_shape)


def instance_norm(x: jax.Array, *, epsilon: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel normalization over spatial dims (no affine).

    Equivalent to torch InstanceNorm2d(affine=False), the default used by
    the style blocks (style_networks.py:165, :180).
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + epsilon)


def instance_norm_blocked(
    x_blk: jax.Array, block: int, *, epsilon: float = 1e-5
) -> jax.Array:
    """:func:`instance_norm` of a space-to-depth tensor, in block space.

    A channel c of the standard-layout tensor appears as ``block**2``
    subpixel channels of the blocked one; its spatial statistics are
    therefore the reduction over (H, W, subpixels) of the blocked tensor —
    the identical value set, so the math matches :func:`instance_norm` of
    the unfolded tensor exactly.
    """
    b, h, w, cblk = x_blk.shape
    nsub = block * block
    xg = x_blk.reshape(b, h, w, nsub, cblk // nsub)
    mean = jnp.mean(xg, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + epsilon)
    return xg.reshape(b, h, w, cblk)


class _Im2ColConv(nn.Module):
    """Stride-1 conv evaluated as an explicit patch contraction.

    Mathematically identical to nn.Conv (same 'kernel'/'bias' param tree, so
    checkpoints interchange), but contracts over k*k*C_in — the fix for
    MXU-hostile channel counts (the 5-bin voxel-grid head conv, which XLA's
    conv lowering runs at ~4 TF/s on v5e).

    impl='xla_im2col': plain XLA patches (measured SLOWER end-to-end: the
    25x-wider patch tensor thrashes HBM); kept for comparison. (A round-1
    Pallas patch-conv variant was retired in round 2: the space-to-depth
    re-expression — 's2d' — wins end-to-end, has gradients, and needs no
    layout transpose.)
    """

    features: int
    kernel_size: int
    use_bias: bool = True
    impl: str = "s2d"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else jnp.zeros((self.features,), self.dtype))

        if self.impl == "s2d":
            from ess_tpu.ops.conv_s2d import conv5x5_s2d
            return conv5x5_s2d(x, kernel, bias if self.use_bias else None,
                               dtype=self.dtype)

        pad = k // 2
        xb = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        cols = [
            jax.lax.dynamic_slice(
                xb, (0, dy, dx, 0),
                (x.shape[0], x.shape[1], x.shape[2], cin))
            for dy in range(k) for dx in range(k)
        ]
        patches = jnp.concatenate(cols, axis=-1)
        wflat = kernel.reshape(k * k * cin, self.features).astype(self.dtype)
        out = jax.lax.dot_general(
            patches, wflat, (((3,), (0,)), ((), ())),
            preferred_element_type=self.dtype)
        return out + bias.astype(self.dtype)


class _BlockConv(nn.Module):
    """Odd-k conv evaluated on a space-to-depth (block) input.

    Parameters are identical to nn.Conv's (k, k, C_in, features) 'kernel' +
    'bias', so checkpoints interchange with every other impl; the kernel is
    remapped to block space at apply time (ops/conv_s2d.py block_kernel —
    exact math). ``in_block`` is the input's blocking factor (2 = s2d,
    4 = the quad-block rollout's s4d); the output blocking follows from the
    stride (out_block = in_block // strides), so strides=2 on an s2d input
    lands at half resolution unblocked, and on an s4d input lands at half
    resolution in s2d form — the layout the quad-block ConvLSTM consumes.

    ``in_segments``: when the blocked input is a channel-concat of
    SEPARATELY blocked operands (skip connections: ``[s2d(x) | s2d(skip)]``),
    the per-segment channel widths — the kernel's input dim is permuted to
    match (ops/conv_s2d.py segment_input_perm), keeping the concat free.
    """

    features: int
    kernel_size: int = 5
    strides: int = 1
    use_bias: bool = True
    in_block: int = 2
    in_segments: Optional[Tuple[int, ...]] = None
    # post-conv activation; fused into the Pallas kernel when impl != 'xla'
    activation: Optional[str] = None
    # 'xla' | 'pallas' | 'pallas_int8' (+ '_interpret'): ops/conv3x3_pallas
    # fused block conv — kept as an opt-in (measured slower than XLA at
    # DSEC scale, see train/builder.py); int8 is the frozen-rollout
    # double-rate path, same policy as ConvLSTMCell impl='pallas_int8'.
    impl: str = "xla"
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_blk: jax.Array) -> jax.Array:
        from ess_tpu.ops.conv_s2d import (
            block_bias, block_kernel, segment_input_perm)

        bi = self.in_block
        bo = bi // self.strides
        cin = x_blk.shape[-1] // (bi * bi)
        k = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        w2 = block_kernel(kernel, bi=bi, bo=bo, stride=self.strides)
        if self.in_segments is not None:
            assert sum(self.in_segments) == cin, (self.in_segments, cin)
            w2 = w2[:, :, segment_input_perm(bi, self.in_segments), :]
        b2 = block_bias(bias, bo) if bias is not None else None
        if self.impl != "xla":
            from ess_tpu.ops.conv3x3_pallas import conv3x3_fused
            fuse_relu = self.activation == "relu"
            out = conv3x3_fused(x_blk.astype(self.dtype), w2, b2,
                                relu=fuse_relu, impl=self.impl)
            return out if fuse_relu else activation_fn(self.activation)(out)
        out = jax.lax.conv_general_dilated(
            x_blk.astype(self.dtype), w2.astype(self.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        if b2 is not None:
            out = out + b2.astype(self.dtype)
        return activation_fn(self.activation)(out)


class ConvLayer(nn.Module):
    """Conv + optional norm + optional activation (submodules.py:7-31)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None  # None | 'BN' | 'IN'
    # conv_impl: 'xla' (default) | 's2d' | 'xla_im2col' | 'auto'
    # ('auto' = space-to-depth block conv for stride-1 5x5 on even H/W —
    # the MXU-hostile few-channel head-conv case; otherwise XLA conv)
    conv_impl: str = "xla"
    # implementation of the block-space (space-to-depth) conv when called
    # with block_space=True: 'xla' | 'pallas' | 'pallas_int8' (_BlockConv)
    block_conv_impl: str = "xla"
    dtype: Dtype = jnp.float32

    def _resolve_impl(self, x: jax.Array) -> str:
        impl = self.conv_impl
        if impl not in ("auto", "xla", "s2d", "xla_im2col"):
            # e.g. the retired round-1 'pallas' patch kernel: failing loudly
            # beats silently falling back to the MXU-hostile direct lowering
            raise ValueError(f"unknown conv_impl {impl!r}; "
                             "use 'auto' | 'xla' | 's2d' | 'xla_im2col'")
        if impl == "auto":
            ok = (self.strides == 1 and self.kernel_size == 5
                  and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
            impl = "s2d" if ok else "xla"
        return impl

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 block_space: bool = False) -> jax.Array:
        if block_space:
            # x is space-to-depth (block_space=True/2) or the quad-block
            # s4d form (block_space=4); params stay (5,5,C,features)
            assert self.kernel_size == 5 and self.norm is None, (
                "block-space path supports 5x5 norm-free convs")
            return _BlockConv(self.features, strides=self.strides,
                              use_bias=True,
                              in_block=4 if block_space == 4 else 2,
                              activation=self.activation,
                              impl=self.block_conv_impl,
                              dtype=self.dtype, name="Conv_0")(x)
        pad = self.kernel_size // 2
        impl = self._resolve_impl(x)
        if (impl in ("xla_im2col", "s2d") and self.strides == 1
                and not (impl == "s2d" and self.kernel_size != 5)):
            x = _Im2ColConv(
                self.features, self.kernel_size,
                use_bias=self.norm != "BN",
                impl="s2d" if impl == "s2d" else "xla",
                dtype=self.dtype, name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding=((pad, pad), (pad, pad)),
                use_bias=self.norm != "BN",
                dtype=self.dtype,
            )(x)
        if self.norm == "BN":
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype)(x)
        elif self.norm == "IN":
            x = instance_norm(x)
        return activation_fn(self.activation)(x)


class TransposedConvLayer(nn.Module):
    """Stride-2 transposed conv upsample (submodules.py:34-63)."""

    features: int
    kernel_size: int = 5
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(2, 2),
            padding="SAME",
            use_bias=self.norm != "BN",
            dtype=self.dtype,
        )(x)
        if self.norm == "BN":
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype)(x)
        elif self.norm == "IN":
            x = instance_norm(x)
        return activation_fn(self.activation)(x)


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, half-pixel centers (torch align_corners=False)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="linear")


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """2x nearest upsample via broadcast-reshape (cheaper than gather resize;
    same trick the reference special-cases in models/submodules.py:14-22)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


class UpsampleConvLayer(nn.Module):
    """Bilinear 2x upsample + conv — no checkerboard artefacts
    (submodules.py:66-94).

    ``conv_impl='auto'`` evaluates the post-upsample 5x5 conv in s2d block
    space when the output channel count underfills the 128-lane MXU (the
    E2VID decoder tail: 64ch at half res, 32ch at full res — the hot convs
    of every decode window in reconstruction/eval and of the UDA step's
    img_fake decode). The upsampled tensor is folded space-to-depth (its
    dims are always even), the conv runs via the exact block-kernel remap
    (SAME zero padding in block space == the standard pad k//2), and one
    depth-to-space restores the layout. Same params, same math; 'xla'
    forces the direct lowering.
    """

    features: int
    kernel_size: int = 5
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    conv_impl: str = "auto"  # 'auto' | 'xla'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        blocked = (self.conv_impl == "auto" and self.kernel_size == 5
                   and self.norm is None and self.features < 128)
        if blocked:
            from ess_tpu.ops.conv_s2d import depth_to_space, up2x_bilinear_s2d

            # the bilinear upsample lands directly in s2d form at source
            # resolution (fused shifted adds) — the full-resolution
            # upsampled tensor and its space_to_depth relayout never exist
            x = _BlockConv(self.features, kernel_size=5, in_block=2,
                           use_bias=True, dtype=self.dtype,
                           name="Conv_0")(up2x_bilinear_s2d(x))
            x = depth_to_space(x)
            return activation_fn(self.activation)(x)
        x = upsample2x_bilinear(x)
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.norm != "BN",
            dtype=self.dtype,
        )(x)
        if self.norm == "BN":
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype)(x)
        elif self.norm == "IN":
            x = instance_norm(x)
        return activation_fn(self.activation)(x)


class ResidualBlock(nn.Module):
    """conv-norm-relu-conv-norm + skip, final relu (submodules.py:143-172)."""

    features: int
    norm: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        residual = x
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.norm != "BN", dtype=self.dtype)(x)
        if self.norm == "BN":
            y = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype)(y)
        elif self.norm == "IN":
            y = instance_norm(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=self.norm != "BN", dtype=self.dtype)(y)
        if self.norm == "BN":
            y = TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype)(y)
        elif self.norm == "IN":
            y = instance_norm(y)
        return nn.relu(y + residual)


# ----------------------------------------------------------------------
# Recurrent conv cells
# ----------------------------------------------------------------------

LSTMState = Tuple[jax.Array, jax.Array]  # (hidden, cell), NHWC each


class _GateParams(nn.Module):
    """Bare (kernel, bias) params shaped/named exactly like nn.Conv's, so
    checkpoints interchange between the XLA and Pallas ConvLSTM paths."""

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell (submodules.py:175-230).

    One fused gates conv: concat([x, h]) -> 4*hidden channels, split into
    (input, forget, output, candidate) gates.

    ``impl``: 'xla' (nn.Conv + fused pointwise), or 'pallas' /
    'pallas_interpret' for the fused single-kernel cell
    (ops/conv_lstm_pallas.py) — identical params, f32 gate accumulation,
    no gates round-trip through HBM.
    """

    hidden: int
    kernel_size: int = 3
    impl: str = "xla"
    # state_block=2: operands (x, h, c) arrive/leave in space-to-depth form
    # (quad-block rollout). The gate params stay at the original channel
    # counts; ops/conv_s2d.gates_kernel_s2d remaps them per call (exact
    # math), so checkpoints and every other path interchange. `hidden` is
    # the ORIGINAL hidden width; s2d operands carry 4*hidden channels.
    state_block: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, state: LSTMState) -> Tuple[jax.Array, LSTMState]:
        h_prev, c_prev = state
        if self.state_block == 2:
            from ess_tpu.ops.conv_s2d import gates_bias_s2d, gates_kernel_s2d
            from ess_tpu.ops.conv_lstm_pallas import (
                conv_lstm_cell, conv_lstm_ref)
            cx = x.shape[-1] // 4
            kernel, bias = _GateParams(
                4 * self.hidden, self.kernel_size,
                cx + self.hidden, name="gates")()
            k2 = gates_kernel_s2d(kernel)
            b2 = gates_bias_s2d(bias)
            fn = (conv_lstm_ref if self.impl == "xla"
                  else lambda *a: conv_lstm_cell(*a, impl=self.impl))
            h, c = fn(x.astype(self.dtype), h_prev.astype(self.dtype),
                      c_prev.astype(self.dtype), k2, b2)
            return h, (h, c)
        if self.impl != "xla":
            from ess_tpu.ops.conv_lstm_pallas import conv_lstm_cell
            kernel, bias = _GateParams(
                4 * self.hidden, self.kernel_size,
                x.shape[-1] + self.hidden, name="gates")()
            h, c = conv_lstm_cell(
                x.astype(self.dtype), h_prev.astype(self.dtype),
                c_prev.astype(self.dtype), kernel, bias, impl=self.impl)
            return h, (h, c)
        gates = nn.Conv(
            4 * self.hidden,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            name="gates",
        )(jnp.concatenate([x, h_prev.astype(x.dtype)], axis=-1))
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c_prev.astype(x.dtype) + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell (submodules.py:233-273). Orthogonal-initialized
    gate convs as in the reference."""

    hidden: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, state: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h_prev = state.astype(x.dtype)
        xh = jnp.concatenate([x, h_prev], axis=-1)
        ortho = nn.initializers.orthogonal()
        update = nn.sigmoid(
            nn.Conv(self.hidden, (self.kernel_size, self.kernel_size), padding="SAME",
                    kernel_init=ortho, dtype=self.dtype, name="update_gate")(xh))
        reset = nn.sigmoid(
            nn.Conv(self.hidden, (self.kernel_size, self.kernel_size), padding="SAME",
                    kernel_init=ortho, dtype=self.dtype, name="reset_gate")(xh))
        cand = jnp.tanh(
            nn.Conv(self.hidden, (self.kernel_size, self.kernel_size), padding="SAME",
                    kernel_init=ortho, dtype=self.dtype, name="out_gate")(
                jnp.concatenate([x, h_prev * reset], axis=-1)))
        h = h_prev * (1.0 - update) + cand * update
        return h, h


class RecurrentConvLayer(nn.Module):
    """Stride-2 conv encoder followed by a recurrent cell
    (submodules.py:97-115)."""

    features: int
    kernel_size: int = 5
    strides: int = 2
    recurrent_block: str = "convlstm"  # 'convlstm' | 'convgru'
    norm: Optional[str] = None
    lstm_impl: str = "xla"
    block_conv_impl: str = "xla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, state, *, train: bool = False,
                 block_space=False):
        """``block_space``: False = NHWC input; True/2 = space-to-depth
        input (stride-2 conv lands unblocked); 4 = quad-block s4d input —
        the conv lands in s2d form and the ConvLSTM runs on s2d state
        (state_block=2), all exact-math weight remaps."""
        x = ConvLayer(
            self.features, self.kernel_size, self.strides,
            activation="relu", norm=self.norm,
            block_conv_impl=self.block_conv_impl,
            dtype=self.dtype, name="conv",
        )(x, train=train, block_space=block_space)
        state_block = 2 if block_space == 4 else 1
        if self.recurrent_block == "convlstm":
            cell = ConvLSTMCell(self.features, impl=self.lstm_impl,
                                state_block=state_block,
                                dtype=self.dtype, name="rnn")
        else:
            assert state_block == 1, "quad-block path requires convlstm"
            cell = ConvGRUCell(self.features, dtype=self.dtype, name="rnn")
        out, new_state = cell(x, state)
        return out, new_state


# ----------------------------------------------------------------------
# Style-network blocks (instance-norm family)
# ----------------------------------------------------------------------

def _gaussian_init(stddev: float = 0.02):
    return nn.initializers.normal(stddev=stddev)


class _PointwiseConv(nn.Module):
    """1x1 conv evaluated as a last-dim matmul.

    Parameter tree is identical to ``nn.Conv(features, (1, 1))``
    ((1, 1, C_in, features) 'kernel' + 'bias'), so checkpoints interchange.
    Why: XLA's TPU conv lowering imposes operand layouts on even a 1x1
    conv — on the fused head's (B, h, w*4, C) logits pass it wraps the conv
    in {3,0,2,1}<->{1,3,2,0} relayout copies (~1.3 ms each at DSEC scale,
    x6 across the UDA step's passes + backward). A dot_general on the minor
    dim carries no layout constraint."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], self.features))
        out = jax.lax.dot_general(
            x.astype(self.dtype), kernel[0, 0].astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            out = out + bias.astype(self.dtype)
        return out


class _UpFusedConv(nn.Module):
    """``conv_kxk(up2x_nearest(x))`` with the upsample folded into the
    weights (ops/conv_s2d.fold_up2x_into_conv) — output in s2d form
    (B, h, w, 4*features). Parameters are identical to nn.Conv's
    (k, k, C_in, features) 'kernel' + 'bias', so checkpoints interchange
    with the standard upsample-then-conv evaluation."""

    features: int
    kernel_size: int = 3
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ess_tpu.ops.conv_s2d import up2x_conv_fused

        k = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return up2x_conv_fused(x, kernel, bias, dtype=self.dtype)


class ReLUINSConv2d(nn.Module):
    """conv -> InstanceNorm(no affine) -> ReLU with N(0, 0.02) init
    (style_networks.py:159-171).

    ``block_space`` (2 or 4): evaluate on a space-to-depth input — same
    (k, k, C_in, features) params via the exact block-kernel remap, IN
    statistics pooled over subpixels (instance_norm_blocked). This is the
    seg-head's MXU fix: its scale-1/2 stages are narrow-channel convs at
    full resolution (N=32 at 440x640 runs the MXU at 1/4 occupancy and the
    logits' tiny class dim lane-pads C -> 128); blocked evaluation widens
    both onto MXU tiles. ``in_segments`` supports concat-skip inputs built
    as ``[blk(x) | blk(skip)]``.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, block_space: int | bool = False,
                 in_segments: Optional[Tuple[int, ...]] = None,
                 up2x_fused: bool = False) -> jax.Array:
        if up2x_fused:
            # conv(up2x_nearest(x)) with the upsample folded into the conv
            # weights (ops/conv_s2d.fold_up2x_into_conv): one conv at SOURCE
            # resolution emits all four output parities as s2d channels —
            # same params, same math, identical MAC count for k=3, and the
            # doubled-resolution conv / full-res InstanceNorm tensors never
            # exist. IN statistics pool over the parity subchannels (the
            # identical value set as full-res IN).
            assert self.strides == 1 and not block_space
            x = _UpFusedConv(
                self.features, kernel_size=self.kernel_size,
                kernel_init=_gaussian_init(), dtype=self.dtype,
                name="Conv_0",
            )(x)
            return nn.relu(instance_norm_blocked(x, 2))
        if block_space:
            bi = 4 if block_space == 4 else 2
            assert self.strides == 1, "blocked IN conv is stride-1 only"
            x = _BlockConv(
                self.features, kernel_size=self.kernel_size,
                use_bias=True, in_block=bi, in_segments=in_segments,
                kernel_init=_gaussian_init(), dtype=self.dtype,
                name="Conv_0",
            )(x)
            return nn.relu(instance_norm_blocked(x, bi))
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            kernel_init=_gaussian_init(),
            dtype=self.dtype,
        )(x)
        return nn.relu(instance_norm(x))


class INSResBlock(nn.Module):
    """(conv3x3 -> IN -> ReLU -> conv3x3 -> IN) + residual
    (style_networks.py:174-194)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_init=_gaussian_init(), dtype=self.dtype)(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_init=_gaussian_init(), dtype=self.dtype)(y)
        y = instance_norm(y)
        return y + x


def skip_merge(kind: str, x: jax.Array, skip: jax.Array) -> jax.Array:
    """'sum' or 'concat' skip connection (unet.py:9-15)."""
    if kind == "sum":
        return x + skip.astype(x.dtype)
    return jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
