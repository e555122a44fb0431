"""Fused ConvLSTM cell: 3x3 gate conv + LSTM pointwise in one Pallas kernel.

Capability parity: the ConvLSTM recurrence of the reference's E2VID encoders
(/root/reference/e2vid/model/submodules.py:175-230) — one conv over
concat([x, h]) producing 4*hidden gate channels (i, f, o, g order), then
c' = sigmoid(f)*c + sigmoid(i)*tanh(g); h' = sigmoid(o)*tanh(c').

Why a kernel: on v5e the XLA pipeline materializes the gates tensor (4*hidden
channels — the largest intermediate of the recurrent rollout) in HBM between
the conv and the pointwise fusion. Per DSEC timestep that is ~0.5 GB of HBM
write+read that carries no information the kernel can't keep in VMEM. The
measured cost (round-2 xplane, CLAUDE.md): gate convs 98 ms + pointwise
~45 ms of a 321 ms supervised step. This kernel computes the conv as MXU
matmuls and applies the LSTM update in-register, writing only (h', c').

Kernel design (per grid cell = one batch element x one row-tile):
- Inputs arrive as non-overlapping BlockSpec row-tiles plus a tiny
  XLA-precomputed "halo rows" array (rows r0-1 / r0+TH per tile, zeros at
  the image edges): every tile is uniform — no manual DMA, no edge
  predication, automatic double-buffering, and no HBM-slice lane-alignment
  constraints for the 64-channel first encoder.
- Build the FULL im2row buffer F (TH, W, 9*CIN): output pixel (t, w)'s
  K-row concatenates all nine (dy, dx) taps of concat(x, h). The whole 3x3
  conv is then ONE deep matmul (M = TH*W rows, K = 9*CIN =
  1152/2304/4608 for the E2VID encoders) — the f32 accumulator is produced
  exactly once by the MXU. A 3-dot flat-shift variant was measured first:
  its per-tap f32 partial products and operand relayouts made it
  VMEM-bandwidth-bound (~3x off roofline).
- The LSTM pointwise (f32) runs on the accumulator while it is still in
  VMEM; only h' and c' are stored.

The reference XLA implementation (`conv_lstm_ref`) is used as the
backward-pass recompute (jax.custom_vjp): the production ESS steps never
differentiate through the frozen E2VID rollout (train/supervised.py,
train/uda.py stop-gradient the rollout outputs), so the hot path is
forward-only; gradients remain available for generic use at XLA speed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def pick_row_tile(height: int, lo: int = 2, hi: int = 24) -> Optional[int]:
    """Divisor of `height` in [lo, hi] closest to 22 (larger wins ties).

    Large row tiles amortize the per-tile halo rows and im2row edge writes
    and cut fixed per-program overhead; v5e sweep on the DSEC L0 geometry
    (220 rows): th=22 4.18 ms vs th=10 5.37 ms per bf16 cell step, int8
    3.63 vs ~4.0 (tools/bench_lstm.py). VMEM stays comfortable: the int8
    im2row buffer at th=22/W=320/CIN=128 is ~8 MB.
    """
    cands = [t for t in range(lo, hi + 1) if height % t == 0]
    if not cands:
        return None
    return min(cands, key=lambda t: (abs(t - 22), -t))


def im2row_3x3(F, src, TH, W, CIN, base=0):
    """Write the nine (dy, dx) shifted copies of ``src`` (TH+2, W, CIN) into
    the im2row buffer ``F`` (TH, WP, 9*CIN_total) starting at channel
    ``base``, with zero columns at the image edges (SAME padding).

    Shared by every im2row Pallas kernel here (the fused cell,
    ops/conv3x3_pallas, ops/level_pallas) — a trace-time Python helper, so
    the emitted Mosaic IR is identical to the inlined loop.
    """
    for dy in range(3):
        rows = src[dy:dy + TH]                     # (TH, W, CIN)
        for dx in range(3):
            cs = slice(base + (dy * 3 + dx) * CIN,
                       base + (dy * 3 + dx + 1) * CIN)
            if dx == 0:
                F[:, 0:1, cs] = jnp.zeros((TH, 1, CIN), F.dtype)
                F[:, 1:W, cs] = rows[:, 0:W - 1]
            elif dx == 1:
                F[:, 0:W, cs] = rows
            else:
                F[:, 0:W - 1, cs] = rows[:, 1:W]
                F[:, W - 1:W, cs] = jnp.zeros((TH, 1, CIN), F.dtype)


def quant_cols(w2: jax.Array):
    """(K, N) f32 -> per-output-channel int8 weights + f32 column scales
    (absmax/127 per column; any input-scale folding happens before this)."""
    ws = jnp.maximum(jnp.max(jnp.abs(w2), axis=0), 1e-20) / 127.0
    wq = jnp.clip(jnp.round(w2 / ws), -127, 127).astype(jnp.int8)
    return wq, ws


def prepare_gate_weights(kernel: jax.Array, dtype) -> jax.Array:
    """(3, 3, CIN, 4*CH) conv kernel -> (9*CIN, 4*CH) im2row tap matrix.

    Row-major (dy, dx, cin) ordering matches the kernel's im2row buffer
    block layout (block k = dy*3 + dx).
    """
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3, "fused ConvLSTM supports 3x3 gate convs"
    return kernel.reshape(9 * cin, cout).astype(dtype)


def conv_lstm_ref(
    x: jax.Array, h_prev: jax.Array, c_prev: jax.Array,
    kernel: jax.Array, bias: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Pure-XLA ConvLSTM cell with f32 gate accumulation (parity + vjp)."""
    xh = jnp.concatenate([x, h_prev.astype(x.dtype)], axis=-1)
    gates = jax.lax.conv_general_dilated(
        xh, kernel.astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    cp = c_prev.astype(jnp.float32)
    c_new = jax.nn.sigmoid(f) * cp + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new.astype(x.dtype), c_new.astype(c_prev.dtype)


def _fused_kernel(TH, W, WP, CX, CH, int8,
                  x_blk, xh_blk, h_blk, hh_blk, c_blk, w_ref, sb_ref,
                  sx_ref, hout_ref, cout_ref, V, F):
    CIN = CX + CH

    if int8:
        # x: dynamic per-call absmax scale (inv passed via SMEM); h: the
        # ConvLSTM hidden is tanh*sigmoid-bounded in (-1, 1), so its scale
        # is the static 1/127 — no reduce needed. Both scales are folded
        # into the per-call weight requantization (XLA side), so the i32
        # accumulator dequantizes with one per-output-channel multiply.
        inv_sx = sx_ref[0, 0]

        def quant_x(v):
            return jnp.clip(jnp.round(v.astype(jnp.float32) * inv_sx),
                            -127, 127).astype(jnp.int8)

        def quant_h(v):
            return jnp.clip(jnp.round(v.astype(jnp.float32) * 127.0),
                            -127, 127).astype(jnp.int8)
    else:
        quant_x = quant_h = lambda v: v

    # V = rows r0-1 .. r0+TH of concat(x, h): the halo-extended input tile.
    # Out-of-tile rows come from the XLA-precomputed halo-rows arrays
    # (zeros at the image edges) so every tile is uniform: no DMA, no edge
    # predication, and Mosaic double-buffers all operands.
    V[0:1, :, 0:CX] = quant_x(xh_blk[0, 0, 0:1])
    V[1:TH + 1, :, 0:CX] = quant_x(x_blk[0])
    V[TH + 1:TH + 2, :, 0:CX] = quant_x(xh_blk[0, 0, 1:2])
    V[0:1, :, CX:CIN] = quant_h(hh_blk[0, 0, 0:1])
    V[1:TH + 1, :, CX:CIN] = quant_h(h_blk[0])
    V[TH + 1:TH + 2, :, CX:CIN] = quant_h(hh_blk[0, 0, 1:2])
    Vv = V[:]

    # Full im2row: output pixel (t, w)'s K-row concatenates all nine taps
    # (dy, dx), so the whole conv is ONE deep matmul — the accumulator is
    # produced exactly once by the MXU (no per-tap partial-product
    # round-trips through VMEM, which dominated the 3-dot variant).
    # (DEAD END, r5: building F with 9 async local DMAs instead — the dx
    # taps are W-1-wide slices, and Mosaic requires DMA slice shapes
    # aligned to the (8, 128) tiling, so the variant does not compile.)
    im2row_3x3(F, Vv, TH, W, CIN)

    acc = jax.lax.dot_general(
        F[:].reshape(TH * WP, 9 * CIN), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if int8 else jnp.float32,
    )

    # sb_ref row 0 = per-output-channel dequant scale (ones for bf16),
    # row 1 = conv bias.
    gates = (acc.astype(jnp.float32).reshape(TH, WP, 4 * CH)[:, :W, :]
             * sb_ref[0] + sb_ref[1])
    i = gates[..., 0 * CH:1 * CH]
    f = gates[..., 1 * CH:2 * CH]
    o = gates[..., 2 * CH:3 * CH]
    g = gates[..., 3 * CH:4 * CH]
    cp = c_blk[0].astype(jnp.float32)
    c_new = jax.nn.sigmoid(f) * cp + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    hout_ref[0] = h_new.astype(hout_ref.dtype)
    cout_ref[0] = c_new.astype(cout_ref.dtype)


def quantize_gate_weights(kernel: jax.Array, s_x: jax.Array,
                          cx: int, ch: int):
    """Fold the (dynamic) input scales into the im2row tap matrix and
    quantize per output channel: W~[k,n] = W[k,n]*s_src(k) with s_src = s_x
    for x rows and 1/127 for h rows, then W~ ~= wq * ws[n] (int8, f32)."""
    w2 = prepare_gate_weights(kernel, jnp.float32)          # (9*CIN, 4*CH)
    is_x = jnp.tile(jnp.concatenate(
        [jnp.ones((cx,), bool), jnp.zeros((ch,), bool)]), 9)
    row_scale = jnp.where(is_x, s_x, 1.0 / 127.0)
    return quant_cols(w2 * row_scale[:, None])


def _halo_rows(a: jax.Array, th: int) -> jax.Array:
    """(B, H, W, C) -> (B, NT, 2, W, C): rows r0-1 and r0+TH per row-tile,
    zeros at the image edges (the conv's zero padding)."""
    B, H, W, C = a.shape
    NT = H // th
    # slice via the free (B, NT, th, W, C) view: a strided slice here was
    # measured to lower to full-array relayout copies (~0.2 ms/call on the
    # first DSEC encoder), the tiled view to narrow row copies.
    v = a.reshape(B, NT, th, W, C)
    halo = jnp.zeros((B, NT, 2, W, C), a.dtype)
    if NT > 1:
        halo = halo.at[:, 1:, 0].set(v[:, :-1, th - 1])   # rows r0-1, it>=1
        halo = halo.at[:, :-1, 1].set(v[:, 1:, 0])        # rows r0+TH
    return halo


def _pallas_forward(x, h_prev, c_prev, kernel, bias, *, th, interpret,
                    int8=False):
    B, H, W, CX = x.shape
    CH = h_prev.shape[-1]
    CIN = CX + CH
    NT = H // th
    assert H % th == 0
    # sublane tile (16 bf16 / 32 int8): the flat reshape stays layout-free
    WP = _round_up(W, 32 if int8 else 16)

    h_prev = h_prev.astype(x.dtype)
    xhalo = _halo_rows(x, th)
    hhalo = _halo_rows(h_prev, th)
    if int8:
        # staged absmax: a scalar-rooted reduce fused with the x relayout
        # measured ~20x off bandwidth on v5e (the reduce root serializes
        # the whole 9 MB fusion); reducing to a per-channel vector first
        # keeps the big pass a fast vectorized column reduce
        ax = jnp.max(jnp.abs(x), axis=(0, 1, 2))          # (CX,)
        s_x = jnp.maximum(jnp.max(ax).astype(jnp.float32), 1e-8) / 127.0
        wcat, ws = quantize_gate_weights(kernel, s_x, CX, CH)
        sx2 = (1.0 / s_x).reshape(1, 1)
        buf_dtype = jnp.int8
    else:
        wcat = prepare_gate_weights(kernel, x.dtype)
        ws = jnp.ones((4 * CH,), jnp.float32)
        sx2 = jnp.ones((1, 1), jnp.float32)
        buf_dtype = x.dtype
    sb = jnp.stack([ws, bias.astype(jnp.float32)])           # (2, 4*CH)

    kern = functools.partial(_fused_kernel, th, W, WP, CX, CH, int8)
    blk = lambda c: pl.BlockSpec(
        (1, th, W, c), lambda b, it: (b, it, 0, 0), memory_space=pltpu.VMEM)
    halo_blk = lambda c: pl.BlockSpec(
        (1, 1, 2, W, c), lambda b, it: (b, it, 0, 0, 0),
        memory_space=pltpu.VMEM)
    h_new, c_new = pl.pallas_call(
        kern,
        grid=(B, NT),
        in_specs=[
            blk(CX),                                # x
            halo_blk(CX),                           # x halo rows
            blk(CH),                                # h
            halo_blk(CH),                           # h halo rows
            blk(CH),                                # c_prev
            pl.BlockSpec((9 * CIN, 4 * CH), lambda b, it: (0, 0),
                         memory_space=pltpu.VMEM),  # im2row weights
            pl.BlockSpec((2, 4 * CH), lambda b, it: (0, 0),
                         memory_space=pltpu.VMEM),  # dequant scale + bias
            pl.BlockSpec((1, 1), lambda b, it: (0, 0),
                         memory_space=pltpu.SMEM),  # 1/s_x
        ],
        out_specs=(blk(CH), blk(CH)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, CH), x.dtype),
            jax.ShapeDtypeStruct((B, H, W, CH), c_prev.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W, CIN), buf_dtype),      # V
            pltpu.VMEM((th, WP, 9 * CIN), buf_dtype),     # im2row buffer
        ],
        # h/c update in place: the scan carry stays in its buffer (XLA was
        # inserting two full-tensor copies per step around the custom call)
        input_output_aliases={2: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, xhalo, h_prev, hhalo, c_prev, wcat, sb, sx2)
    return h_new, c_new


@functools.lru_cache(maxsize=None)
def _make_fused(th: int, interpret: bool, int8: bool = False):
    @jax.custom_vjp
    def fused(x, h_prev, c_prev, kernel, bias):
        return _pallas_forward(x, h_prev, c_prev, kernel, bias,
                               th=th, interpret=interpret, int8=int8)

    def fwd(x, h_prev, c_prev, kernel, bias):
        return fused(x, h_prev, c_prev, kernel, bias), (
            x, h_prev, c_prev, kernel, bias)

    def bwd(res, cts):
        # Recompute-backward through the XLA reference cell: the fused
        # forward is only ever used under stop_gradient in production, so
        # this path exists for generic correctness, not speed.
        _, vjp = jax.vjp(conv_lstm_ref, *res)
        return vjp(cts)

    fused.defvjp(fwd, bwd)
    return fused


_IMPLS = ("auto", "xla", "pallas", "pallas_interpret",
          "pallas_int8", "pallas_int8_interpret")


def resolve_lstm_impl(requested: str) -> str:
    """'auto' -> 'pallas' on TPU, 'xla' elsewhere; validates explicit names."""
    if requested not in _IMPLS:
        raise ValueError(f"unknown lstm_impl {requested!r}")
    if requested == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return requested


def conv_lstm_cell(
    x: jax.Array, h_prev: jax.Array, c_prev: jax.Array,
    kernel: jax.Array, bias: jax.Array, *, impl: str = "xla",
) -> Tuple[jax.Array, jax.Array]:
    """ConvLSTM cell update; `impl` in {'xla', 'pallas', 'pallas_int8'}
    (+ '_interpret' suffixed variants for CPU tests of the kernel path).

    'pallas_int8' runs the gate matmul on the double-rate int8 MXU path
    (per-call absmax quantization of x, static 1/127 scale for the bounded
    hidden state, per-output-channel weight scales) — a lossy opt-in for
    the frozen-backbone training rollout; see tests for the error bound.
    Falls back to the XLA cell when the geometry doesn't tile (non-3x3
    kernel, or no row-tile divides H).
    """
    # Small geometries are per-invocation-overhead-dominated (and the int8
    # variant's per-call weight requant is no longer amortized): measured on
    # v5e, the DDD17-UDA 120x216-crop encoders run ~3% FASTER on the XLA
    # cell, while everything >= DSEC's deepest encoder (9M elements) wins
    # on the fused kernel. Interpret-mode (tests) always exercises the
    # kernel path.
    big_enough = (impl.endswith("_interpret")
                  or int(np.prod(x.shape)) >= 4_000_000)
    if impl != "xla" and kernel.shape[:2] == (3, 3) and big_enough:
        th = pick_row_tile(x.shape[1])
        if th is not None:
            base = impl.removesuffix("_interpret")
            return _make_fused(th, impl.endswith("_interpret"),
                               base == "pallas_int8")(
                x, h_prev, c_prev, kernel, bias)
    return conv_lstm_ref(x, h_prev, c_prev, kernel, bias)
