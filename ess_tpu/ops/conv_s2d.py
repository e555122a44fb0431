"""Space-to-depth evaluation of small-C_in stride-1 convs.

The E2VID head conv (5x5, C_in = 5 voxel bins -> 32, unet.py:140-141 in the
reference) is MXU-hostile as written: XLA's TPU conv lowering runs it at
~4 TF/s on v5e because the contraction (C_in) is far below the 128-lane MXU
tile, costing ~100 ms of every DSEC train step (CLAUDE.md round-1 notes).

TPU-first fix: evaluate the SAME conv in 2x2-block space. For output pixel
(2Y+p, 2X+q) the 5x5 taps read input rows 2Y+p+dy-2 = 2(Y+DY)+r, so the
whole conv is EXACTLY a 3x3 conv over the space-to-depth input
(H/2, W/2, 4*C_in) producing all four output phases at once
(H/2, W/2, 4*C_out):

    contraction 3*3*4*C_in = 180 (vs 5 before), output lanes 4*32 = 128

Both dimensions now land on MXU tile boundaries. The kernel remapping is a
pure reshuffle of the original (5, 5, C_in, C_out) weights, so parameters
(and converted torch checkpoints) are unchanged; gradients flow through the
remap, making this valid for trainable paths too.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _block_index(k: int) -> np.ndarray:
    """idx[ky, r, p] into the (k+2)-padded kernel axis: the original tap
    dy = 2*ky + r - p - (k // 2 - 1) shifted by the zero-pad offset."""
    kb = (k - 2) // 2 + 2  # block-kernel extent (3 for k=5)
    idx = np.zeros((kb, 2, 2), np.int64)
    for ky in range(kb):
        for r in range(2):
            for p in range(2):
                idx[ky, r, p] = 2 * ky + r - p + 1
    return idx


def s2d_kernel(kernel: jax.Array) -> jax.Array:
    """(k, k, C_in, C_out) stride-1 kernel -> (kb, kb, 4*C_in, 4*C_out)
    block-space kernel; k must be odd with k//2 == 2 (i.e. k == 5)."""
    k, k2, cin, cout = kernel.shape
    assert k == k2 == 5, "s2d path is specialized to 5x5 kernels"
    kp = jnp.pad(kernel, ((1, 1), (1, 1), (0, 0), (0, 0)))
    idx = _block_index(k)  # (3, 2, 2), values in [0, 6]
    # gather rows then cols: (3,2,2)(3,2,2) c f
    w = kp[idx.reshape(-1)][:, idx.reshape(-1)]
    w = w.reshape(3, 2, 2, 3, 2, 2, cin, cout)
    #      ky r  p  kx s  q
    # -> (ky, kx, r, s, cin, p, q, cout) -> (3, 3, 4*cin, 4*cout)
    w = w.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return w.reshape(3, 3, 4 * cin, 4 * cout)


def s2d_kernel_stride2(kernel: jax.Array) -> jax.Array:
    """(5, 5, C_in, C_out) STRIDE-2 kernel -> (3, 3, 4*C_in, C_out).

    A 5x5/stride-2 SAME conv reads, for output (Y, X), input rows
    2Y+dy-2 = 2(Y+DY)+r — i.e. it is exactly a 3x3 stride-1 conv over the
    space-to-depth input. This removes the full-resolution intermediate
    between the E2VID head conv and the first recurrent encoder: both run
    in block space and the encoder's output IS the scale-2 feature map.
    """
    k, k2, cin, cout = kernel.shape
    assert k == k2 == 5, "stride-2 s2d path is specialized to 5x5 kernels"
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    idx = np.array([[2 * ky + r for r in range(2)] for ky in range(3)])
    w = kp[idx.reshape(-1)][:, idx.reshape(-1)]  # (6, 6, cin, cout)
    w = w.reshape(3, 2, 3, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return w.reshape(3, 3, 4 * cin, cout)


def conv5x5_s2d_stride2(
    x_s2d: jax.Array, kernel: jax.Array, bias: jax.Array | None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Stride-2 5x5 conv evaluated on an s2d input: (B, H/2, W/2, 4*C_in)
    -> (B, H/2, W/2, C_out). Equals conv(x, stride=2, SAME-ish pad 2)."""
    w2 = s2d_kernel_stride2(kernel).astype(dtype)
    out = jax.lax.conv_general_dilated(
        x_s2d.astype(dtype), w2, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (r*2 + s)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H/2, W/2, 4C) -> (B, H, W, C); inverse of :func:`space_to_depth`."""
    b, hh, ww, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hh, ww, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hh, 2 * ww, c)


def conv5x5_s2d_blocks(
    x_s2d: jax.Array, kernel: jax.Array, bias: jax.Array | None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Block-space core: s2d input (B, H/2, W/2, 4*C_in) -> s2d output
    (B, H/2, W/2, 4*C_out). Callers that keep working in block space (the
    recurrent encoder's stride-2 conv consumes exactly this layout) avoid the
    full-resolution round trip entirely."""
    w2 = s2d_kernel(kernel).astype(dtype)
    out = jax.lax.conv_general_dilated(
        x_s2d.astype(dtype), w2, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    if bias is not None:
        out = out + jnp.tile(bias, 4).astype(dtype)
    return out


def conv5x5_s2d(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Drop-in 5x5 stride-1 SAME conv, evaluated in block space.

    Requires even H and W (E2VID inputs are reflection-padded to /2^E,
    ops/pad.py). Matches ``lax.conv_general_dilated`` bit-for-bit in f32.
    """
    b, h, w, _ = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    out = conv5x5_s2d_blocks(space_to_depth(x), kernel, bias, dtype=dtype)
    return depth_to_space(out)
