"""Fused E2VID encoder level: stride-2 conv + ReLU + int8 ConvLSTM cell.

Capability parity: one RecurrentConvLayer step of the reference's E2VID
encoders (/root/reference/e2vid/model/submodules.py:97-115 — a 5x5/stride-2
conv feeding a 3x3 ConvLSTM), for the FROZEN training rollout.

Why one kernel (round-3 v5e measurements):
- XLA runs the three encoder convs 2-50x off MXU peak (35 ms of a 261 ms
  DSEC step) because 32/64-channel operands waste the 128-lane tile, and the
  conv output then round-trips HBM into the Pallas cell with a full-tensor
  relayout + absmax reduce (8.2 ms) for int8 quantization.
- Here the conv output x never leaves VMEM: each grid cell computes
  x = relu(conv(u)) for its row tile (+1 halo row each side), quantizes it
  with a PER-TILE absmax (finer than the global scale the standalone cell
  uses -> strictly better int8 resolution, and no XLA-side reduce at all),
  and runs the gate dots + LSTM pointwise in place.
- The 5x5/stride-2 conv is evaluated as an exact 3x3 conv over the
  space-to-depth view of u (ops/conv_s2d.py math); the phase split happens
  in VMEM during the quantizing copy, so no s2d layout pass exists in HBM.

Because the x and h operands carry different quantization scales (per-tile
dynamic vs the static 1/127 of the tanh*sigmoid-bounded hidden state), the
gate conv runs as TWO int8 dots (K = 9*CH each) whose dequantized partial
sums add — algebraically identical to the fused cell's single K = 18*CH dot.

int8-only and forward-only by design: the ESS train steps stop-gradient the
rollout (ess_trainer.py:145-146 semantics); gradients fall back to an XLA
recompute of the reference chain via custom_vjp. Eval always runs the exact
bf16 path (models/layers.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ess_tpu.ops.conv_lstm_pallas import (
    _round_up, conv_lstm_ref, im2row_3x3, pick_row_tile, quant_cols)
from ess_tpu.ops.conv_s2d import s2d_kernel_stride2


def _halo_rows_d(a: jax.Array, th: int, d: int) -> jax.Array:
    """(B, H, W, C) -> (B, NT, 2*d, W, C): rows r0-d..r0-1 and
    r0+th..r0+th+d-1 per row-tile, zeros past the image edges."""
    B, H, W, C = a.shape
    NT = H // th
    v = a.reshape(B, NT, th, W, C)
    halo = jnp.zeros((B, NT, 2 * d, W, C), a.dtype)
    for j in range(d):
        # above: row r0-d+j  == tile it-1, local row th-d+j
        halo = halo.at[:, 1:, j].set(v[:, :-1, th - d + j])
        # below: row r0+th+j == tile it+1, local row j
        halo = halo.at[:, :-1, d + j].set(v[:, 1:, j])
    return halo


def _quant_i8(v, inv_s):
    return jnp.clip(jnp.round(v.astype(jnp.float32) * inv_s),
                    -127, 127).astype(jnp.int8)


def _level_kernel(TH, WO, WOP, CU, CH, u_s2d,
                  u_blk, uh_blk, h_blk, hh_blk, c_blk,
                  we_ref, wx_ref, wh_ref, sbe_ref, sbg_ref,
                  hout_ref, cout_ref, U, Vs, Fe, Xq, Fg):
    """One (batch, row-tile) cell: x = relu(conv_s2d(u)); h', c' = LSTM(x, h).

    CU = s2d input channels (4 * original C_in); CH = hidden channels.
    Row geometry: x is computed on TH+2 rows (the cell's halo rows included)
    from TH+4 s2d rows of u.
    """
    # ---- assemble the s2d view of u, quantized per tile ----------------
    if u_s2d:
        # u already space-to-depth at output resolution: rows r0-2..r0+TH+1
        amax_u = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(u_blk[0].astype(jnp.float32))),
                        jnp.max(jnp.abs(uh_blk[0, 0].astype(jnp.float32)))),
            1e-6)
        inv_su = 127.0 / amax_u
        Vs[0:2] = _quant_i8(uh_blk[0, 0, 0:2], inv_su)
        Vs[2:TH + 2] = _quant_i8(u_blk[0], inv_su)
        Vs[TH + 2:TH + 4] = _quant_i8(uh_blk[0, 0, 2:4], inv_su)
    else:
        # u at full resolution: 2*TH block rows + 4 halo rows each side
        U[0:4] = uh_blk[0, 0, 0:4]
        U[4:2 * TH + 4] = u_blk[0]
        U[2 * TH + 4:2 * TH + 8] = uh_blk[0, 0, 4:8]
        Uv = U[:]
        amax_u = jnp.maximum(jnp.max(jnp.abs(Uv.astype(jnp.float32))), 1e-6)
        inv_su = 127.0 / amax_u
        C1 = CU // 4
        # phase split: rows via the free outer reshape, cols via the
        # (WO, 2) sublane view — the in-VMEM equivalent of space_to_depth
        u4 = Uv.reshape(TH + 4, 2, WO, 2, C1)
        for r in range(2):
            for s in range(2):
                Vs[:, :, (2 * r + s) * C1:(2 * r + s + 1) * C1] = _quant_i8(
                    u4[:, r, :, s, :], inv_su)

    # ---- encoder conv: one deep int8 dot over the 3x3 s2d taps ---------
    im2row_3x3(Fe, Vs[:], TH + 2, WO, CU, 0)
    acc_e = jax.lax.dot_general(
        Fe[:].reshape((TH + 2) * WOP, 9 * CU), we_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # dequant: per-output-channel weight scale x per-tile input scale
    x = (acc_e.astype(jnp.float32).reshape(TH + 2, WOP, CH)[:, :WO, :]
         * (sbe_ref[0] * (amax_u / 127.0)) + sbe_ref[1])
    x = jnp.maximum(x, 0.0)

    # ---- quantize x per tile, build both gate operand buffers ----------
    # x rows r0-1 / r0+TH past the image edge must be ZERO (the gate conv's
    # zero padding) — computed from zero-padded u they'd be relu(bias).
    it = pl.program_id(1)
    nt = pl.num_programs(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, 1, 1), 0)
    edge = ((row == 0) & (it == 0)) | ((row == TH + 1) & (it == nt - 1))
    x = jnp.where(edge, 0.0, x)
    amax_x = jnp.maximum(jnp.max(x), 1e-6)   # x >= 0 after relu
    inv_sx = 127.0 / amax_x
    Xq[:] = _quant_i8(x, inv_sx)
    im2row_3x3(Fg, Xq[:], TH, WO, CH, 0)
    # h rows r0-1..r0+TH from the depth-1 halo + block
    Vs[0:1, :, 0:CH] = _quant_i8(hh_blk[0, 0, 0:1], 127.0)
    Vs[1:TH + 1, :, 0:CH] = _quant_i8(h_blk[0], 127.0)
    Vs[TH + 1:TH + 2, :, 0:CH] = _quant_i8(hh_blk[0, 0, 1:2], 127.0)
    im2row_3x3(Fg, Vs[0:TH + 2, :, 0:CH], TH, WO, CH, 9 * CH)

    acc_x = jax.lax.dot_general(
        Fg[:, :, 0:9 * CH].reshape(TH * WOP, 9 * CH), wx_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_h = jax.lax.dot_general(
        Fg[:, :, 9 * CH:18 * CH].reshape(TH * WOP, 9 * CH), wh_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    gates = (acc_x.astype(jnp.float32).reshape(TH, WOP, 4 * CH)[:, :WO, :]
             * (sbg_ref[0] * (amax_x / 127.0))
             + acc_h.astype(jnp.float32).reshape(TH, WOP, 4 * CH)[:, :WO, :]
             * sbg_ref[1]
             + sbg_ref[2])

    i = gates[..., 0 * CH:1 * CH]
    f = gates[..., 1 * CH:2 * CH]
    o = gates[..., 2 * CH:3 * CH]
    g = gates[..., 3 * CH:4 * CH]
    cp = c_blk[0].astype(jnp.float32)
    c_new = jax.nn.sigmoid(f) * cp + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    hout_ref[0] = h_new.astype(hout_ref.dtype)
    cout_ref[0] = c_new.astype(cout_ref.dtype)


def _level_forward(u, h_prev, c_prev, enc_kernel, enc_bias,
                   gate_kernel, gate_bias, *, th, u_s2d, interpret):
    B = u.shape[0]
    CH = h_prev.shape[-1]
    HO, WO = h_prev.shape[1], h_prev.shape[2]
    NT = HO // th
    WOP = _round_up(WO, 32)

    # weight prep (tiny XLA ops, per call)
    we2 = s2d_kernel_stride2(enc_kernel).astype(jnp.float32)
    CU = we2.shape[2]                                  # 4 * C_in
    we_q, wse = quant_cols(we2.reshape(9 * CU, CH))
    gk = gate_kernel.astype(jnp.float32)               # (3,3,2*CH,4*CH)
    wx_q, wsx = quant_cols(gk[:, :, :CH, :].reshape(9 * CH, 4 * CH))
    wh_q, wsh = quant_cols(gk[:, :, CH:, :].reshape(9 * CH, 4 * CH))
    sbe = jnp.stack([wse, enc_bias.astype(jnp.float32)])       # (2, CH)
    sbg = jnp.stack([wsx, wsh / 127.0,
                     gate_bias.astype(jnp.float32)])           # (3, 4*CH)

    h_prev = h_prev.astype(u.dtype)
    hhalo = _halo_rows_d(h_prev, th, 1)
    if u_s2d:
        assert u.shape[1] == HO and u.shape[2] == WO and u.shape[3] == CU
        uhalo = _halo_rows_d(u, th, 2)
        u_spec = pl.BlockSpec((1, th, WO, CU), lambda b, it: (b, it, 0, 0),
                              memory_space=pltpu.VMEM)
        uh_spec = pl.BlockSpec((1, 1, 4, WO, CU),
                               lambda b, it: (b, it, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        u_scr = pltpu.VMEM((1, 1), jnp.int8)          # unused placeholder
    else:
        C1 = CU // 4
        assert u.shape[1] == 2 * HO and u.shape[2] == 2 * WO
        assert u.shape[3] == C1, (u.shape, C1)
        uhalo = _halo_rows_d(u, 2 * th, 4)
        u_spec = pl.BlockSpec((1, 2 * th, 2 * WO, C1),
                              lambda b, it: (b, it, 0, 0),
                              memory_space=pltpu.VMEM)
        uh_spec = pl.BlockSpec((1, 1, 8, 2 * WO, C1),
                               lambda b, it: (b, it, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        u_scr = pltpu.VMEM((2 * th + 8, 2 * WO, C1), u.dtype)

    blk = lambda c: pl.BlockSpec((1, th, WO, c), lambda b, it: (b, it, 0, 0),
                                 memory_space=pltpu.VMEM)
    hh_spec = pl.BlockSpec((1, 1, 2, WO, CH), lambda b, it: (b, it, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    wspec = lambda k, n: pl.BlockSpec((k, n), lambda b, it: (0, 0),
                                      memory_space=pltpu.VMEM)

    kern = functools.partial(_level_kernel, th, WO, WOP, CU, CH, u_s2d)
    h_new, c_new = pl.pallas_call(
        kern,
        grid=(B, NT),
        in_specs=[u_spec, uh_spec, blk(CH), hh_spec, blk(CH),
                  wspec(9 * CU, CH), wspec(9 * CH, 4 * CH),
                  wspec(9 * CH, 4 * CH), wspec(2, CH), wspec(3, 4 * CH)],
        out_specs=(blk(CH), blk(CH)),
        out_shape=(jax.ShapeDtypeStruct((B, HO, WO, CH), u.dtype),
                   jax.ShapeDtypeStruct((B, HO, WO, CH), c_prev.dtype)),
        scratch_shapes=[
            u_scr,                                         # U (full-res asm)
            pltpu.VMEM((th + 4, WO, max(CU, CH)), jnp.int8),   # Vs
            pltpu.VMEM((th + 2, WOP, 9 * CU), jnp.int8),   # Fe
            pltpu.VMEM((th + 2, WO, CH), jnp.int8),        # Xq
            pltpu.VMEM((th, WOP, 18 * CH), jnp.int8),      # Fg (x | h taps)
        ],
        input_output_aliases={2: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(u, uhalo, h_prev, hhalo, c_prev, we_q, wx_q, wh_q, sbe, sbg)
    return h_new, c_new


def encoder_level_ref(u, h_prev, c_prev, enc_kernel, enc_bias,
                      gate_kernel, gate_bias, *, u_s2d: bool):
    """XLA reference chain: x = relu(stride-2 5x5 conv(u)); ConvLSTM(x)."""
    if u_s2d:
        from ess_tpu.ops.conv_s2d import conv5x5_s2d_stride2
        x = conv5x5_s2d_stride2(u, enc_kernel, enc_bias, dtype=u.dtype)
    else:
        x = jax.lax.conv_general_dilated(
            u, enc_kernel.astype(u.dtype), window_strides=(2, 2),
            padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=u.dtype) + enc_bias.astype(u.dtype)
    x = jnp.maximum(x, 0)
    return conv_lstm_ref(x, h_prev, c_prev, gate_kernel, gate_bias)


@functools.lru_cache(maxsize=None)
def _make_fused(th: int, u_s2d: bool, interpret: bool):
    @jax.custom_vjp
    def fused(u, h_prev, c_prev, ek, eb, gk, gb):
        return _level_forward(u, h_prev, c_prev, ek, eb, gk, gb,
                              th=th, u_s2d=u_s2d, interpret=interpret)

    def fwd(u, h_prev, c_prev, ek, eb, gk, gb):
        return fused(u, h_prev, c_prev, ek, eb, gk, gb), (
            u, h_prev, c_prev, ek, eb, gk, gb)

    def bwd(res, cts):
        _, vjp = jax.vjp(
            functools.partial(encoder_level_ref, u_s2d=u_s2d), *res)
        return vjp(cts)

    fused.defvjp(fwd, bwd)
    return fused


def encoder_level_int8(
    u: jax.Array, state: Tuple[jax.Array, jax.Array],
    enc_kernel: jax.Array, enc_bias: jax.Array,
    gate_kernel: jax.Array, gate_bias: jax.Array,
    *, u_s2d: bool, interpret: bool = False,
) -> Optional[Tuple[jax.Array, Tuple[jax.Array, jax.Array]]]:
    """Fused stride-2 conv + int8 ConvLSTM encoder level.

    ``u``: the level input — the full-resolution previous-level output
    (B, 2H, 2W, C_in), or with ``u_s2d=True`` its space-to-depth form at
    output resolution (B, H, W, 4*C_in) (the E2VID block-space head).
    Returns (h, (h, c)), or None when the geometry doesn't tile (caller
    falls back to the unfused path).
    """
    h_prev, c_prev = state
    HO = h_prev.shape[1]
    if enc_kernel.shape[:2] != (5, 5) or gate_kernel.shape[:2] != (3, 3):
        return None
    if not u_s2d and (u.shape[1] != 2 * HO or u.shape[2] % 2
                      or u.shape[1] % 2):
        return None
    if not interpret and int(np.prod(h_prev.shape)) < 1_000_000:
        return None
    th = pick_row_tile(HO)
    if th is None:
        return None
    h, c = _make_fused(th, u_s2d, interpret)(
        u, h_prev.astype(u.dtype), c_prev.astype(u.dtype),
        enc_kernel, enc_bias, gate_kernel, gate_bias)
    return h, (h, c)
