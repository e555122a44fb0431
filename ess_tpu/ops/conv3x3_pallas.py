"""Fused Pallas 3x3 conv (+bias +ReLU), bf16 / double-rate int8.

Capability parity: these are the E2VID head conv and per-encoder stride-2
convs of the reference (/root/reference/e2vid/model/submodules.py:7-31,
:97-115) — evaluated in space-to-depth block form (ops/conv_s2d.py turns
both 5x5 convs into exact 3x3 convs over lane-friendly channel counts).

Why a kernel: XLA:TPU's conv lowering runs the block-space head conv and the
first encoder conv at 3-50x off MXU peak at DSEC scale (round-3 xplane:
fusion.662 8.7 ms + fusion.665 16.4 ms of a 261 ms step; roofline is
~0.5 + ~6 ms bf16). The same im2row construction that powers the fused
ConvLSTM cell (ops/conv_lstm_pallas.py) applies unchanged: halo-extended
row tiles, one deep MXU matmul (K = 9*C_in), bias + ReLU on the accumulator
while it is still in VMEM.

int8 path: per-call absmax scale for the input folded into per-output
-channel quantized weights — identical scheme to the fused cell's x path.
Opt-in for the FROZEN E2VID rollout only (the supervised/UDA train steps
stop-gradient the rollout), same policy as lstm_impl='pallas_int8'.
Gradients: jax.custom_vjp recomputes through the XLA reference conv, so the
op stays differentiable for generic (bf16) use.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ess_tpu.ops.conv_lstm_pallas import (
    _halo_rows, _round_up, im2row_3x3, pick_row_tile, quant_cols)


def conv3x3_ref(x: jax.Array, kernel: jax.Array,
                bias: Optional[jax.Array], *, relu: bool) -> jax.Array:
    """Pure-XLA 3x3 SAME conv with f32 accumulation (parity + vjp)."""
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def _conv_kernel(TH, W, WP, CIN, COUT, int8, relu,
                 x_blk, xh_blk, w_ref, sb_ref, sx_ref, out_ref, V, F):
    if int8:
        inv_sx = sx_ref[0, 0]

        def quant(v):
            return jnp.clip(jnp.round(v.astype(jnp.float32) * inv_sx),
                            -127, 127).astype(jnp.int8)
    else:
        quant = lambda v: v

    V[0:1] = quant(xh_blk[0, 0, 0:1])
    V[1:TH + 1] = quant(x_blk[0])
    V[TH + 1:TH + 2] = quant(xh_blk[0, 0, 1:2])
    im2row_3x3(F, V[:], TH, W, CIN)

    acc = jax.lax.dot_general(
        F[:].reshape(TH * WP, 9 * CIN), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if int8 else jnp.float32,
    )
    out = (acc.astype(jnp.float32).reshape(TH, WP, COUT)[:, :W, :]
           * sb_ref[0] + sb_ref[1])
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


def _quantize_weights(w2: jax.Array, s_x: jax.Array):
    """Fold the input scale into the (9*CIN, COUT) tap matrix and quantize
    per output channel: W~ = W * s_x ~= wq * ws[n] (int8, f32)."""
    return quant_cols(w2.astype(jnp.float32) * s_x)


def _pallas_conv(x, kernel, bias, *, th, relu, int8, interpret):
    B, H, W, CIN = x.shape
    COUT = kernel.shape[-1]
    NT = H // th
    assert H % th == 0
    WP = _round_up(W, 32 if int8 else 16)

    w2 = kernel.reshape(9 * CIN, COUT)
    if int8:
        s_x = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32),
                          1e-8) / 127.0
        wcat, ws = _quantize_weights(w2, s_x)
        sx2 = (1.0 / s_x).reshape(1, 1)
        buf_dtype = jnp.int8
    else:
        wcat = w2.astype(x.dtype)
        ws = jnp.ones((COUT,), jnp.float32)
        sx2 = jnp.ones((1, 1), jnp.float32)
        buf_dtype = x.dtype
    b32 = (bias.astype(jnp.float32) if bias is not None
           else jnp.zeros((COUT,), jnp.float32))
    sb = jnp.stack([ws, b32])                                 # (2, COUT)

    xhalo = _halo_rows(x, th)
    kern = functools.partial(_conv_kernel, th, W, WP, CIN, COUT, int8, relu)
    blk = lambda c: pl.BlockSpec(
        (1, th, W, c), lambda b, it: (b, it, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, NT),
        in_specs=[
            blk(CIN),                                # x
            pl.BlockSpec((1, 1, 2, W, CIN), lambda b, it: (b, it, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # halo rows
            pl.BlockSpec((9 * CIN, COUT), lambda b, it: (0, 0),
                         memory_space=pltpu.VMEM),   # im2row weights
            pl.BlockSpec((2, COUT), lambda b, it: (0, 0),
                         memory_space=pltpu.VMEM),   # dequant scale + bias
            pl.BlockSpec((1, 1), lambda b, it: (0, 0),
                         memory_space=pltpu.SMEM),   # 1/s_x
        ],
        out_specs=blk(COUT),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W, CIN), buf_dtype),       # V
            pltpu.VMEM((th, WP, 9 * CIN), buf_dtype),      # im2row buffer
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, xhalo, wcat, sb, sx2)
    return out


@functools.lru_cache(maxsize=None)
def _make_fused(th: int, relu: bool, int8: bool, interpret: bool):
    @jax.custom_vjp
    def fused(x, kernel, bias):
        return _pallas_conv(x, kernel, bias, th=th, relu=relu, int8=int8,
                            interpret=interpret)

    def fwd(x, kernel, bias):
        return fused(x, kernel, bias), (x, kernel, bias)

    def bwd(res, ct):
        x, kernel, bias = res
        _, vjp = jax.vjp(
            lambda x_, k_, b_: conv3x3_ref(
                x_, k_.reshape(3, 3, x.shape[-1], k_.shape[-1]), b_,
                relu=relu),
            x, kernel.reshape(9 * x.shape[-1], kernel.shape[-1]), bias)
        gx, gk, gb = vjp(ct)
        return gx, gk.reshape(kernel.shape), gb

    fused.defvjp(fwd, bwd)
    return fused


_IMPLS = ("xla", "pallas", "pallas_interpret",
          "pallas_int8", "pallas_int8_interpret")


def conv3x3_fused(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array],
    *, relu: bool = True, impl: str = "xla",
) -> jax.Array:
    """3x3 SAME conv + bias + optional ReLU; `impl` as in the fused cell.

    `kernel`: (3, 3, CIN, COUT). int8 quantizes the input with a per-call
    absmax scale (lossy, frozen-rollout opt-in). Falls back to the XLA conv
    when no row tile divides H or the tensor is too small to amortize the
    kernel launch (same 4M-element gate as the fused ConvLSTM cell).
    """
    if impl not in _IMPLS:
        raise ValueError(f"unknown conv impl {impl!r}")
    big_enough = (impl.endswith("_interpret")
                  or int(np.prod(x.shape)) >= 4_000_000)
    if impl != "xla" and kernel.shape[:2] == (3, 3) and big_enough:
        th = pick_row_tile(x.shape[1])
        if th is not None:
            base = impl.removesuffix("_interpret")
            b = bias if bias is not None else jnp.zeros(
                (kernel.shape[-1],), jnp.float32)
            return _make_fused(th, relu, base == "pallas_int8",
                               impl.endswith("_interpret"))(
                x, kernel.reshape(9 * kernel.shape[2], kernel.shape[3]), b)
    return conv3x3_ref(x, kernel, bias, relu=relu)
