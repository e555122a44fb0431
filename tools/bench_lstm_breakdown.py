"""Attribute the fused ConvLSTM cell's time: MXU dot vs im2row build vs
LSTM pointwise (transcendentals).

Runs kernel VARIANTS on the real TPU at the DSEC L0/L1/L2 geometries:
  full      - the production int8 kernel math
  ptw_mul   - transcendentals replaced by multiplies (same data flow)
  ptw_bf16  - gates converted to bf16 before sigmoid/tanh (half VPU width)
  no_ptw    - h' = slice of the raw accumulator (dot + build only)

The deltas between variants measure each stage. Queued-dispatch timing
(20-step scan chain, one scalar fetch).

Usage: python tools/bench_lstm_breakdown.py [--layers 0,1,2] [--int8 0|1]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ess_tpu.ops.conv_lstm_pallas import (
        _halo_rows, _round_up, pick_row_tile, prepare_gate_weights,
        quantize_gate_weights)

    T = 20
    args = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
    layers = [int(i) for i in args.get("--layers", "0,1,2").split(",")]
    use_int8 = args.get("--int8", "1") == "1"
    shapes = [(8, 220, 320, 64), (8, 110, 160, 128), (8, 55, 80, 256)]

    def make_kernel(TH, W, WP, CX, CH, int8, mode):
        CIN = CX + CH

        def kern(x_blk, xh_blk, h_blk, hh_blk, c_blk, w_ref, sb_ref,
                 sx_ref, hout_ref, cout_ref, V, F):
            if int8:
                inv_sx = sx_ref[0, 0]
                quant_x = lambda v: jnp.clip(
                    jnp.round(v.astype(jnp.float32) * inv_sx),
                    -127, 127).astype(jnp.int8)
                quant_h = lambda v: jnp.clip(
                    jnp.round(v.astype(jnp.float32) * 127.0),
                    -127, 127).astype(jnp.int8)
            else:
                quant_x = quant_h = lambda v: v
            V[0:1, :, 0:CX] = quant_x(xh_blk[0, 0, 0:1])
            V[1:TH + 1, :, 0:CX] = quant_x(x_blk[0])
            V[TH + 1:TH + 2, :, 0:CX] = quant_x(xh_blk[0, 0, 1:2])
            V[0:1, :, CX:CIN] = quant_h(hh_blk[0, 0, 0:1])
            V[1:TH + 1, :, CX:CIN] = quant_h(h_blk[0])
            V[TH + 1:TH + 2, :, CX:CIN] = quant_h(hh_blk[0, 0, 1:2])
            Vv = V[:]
            build = mode != "no_build"
            for dy in range(3 if build else 0):
                rows = Vv[dy:dy + TH]
                for dx in range(3):
                    cs = slice((dy * 3 + dx) * CIN, (dy * 3 + dx + 1) * CIN)
                    if dx == 0:
                        F[:, 0:1, cs] = jnp.zeros((TH, 1, CIN), F.dtype)
                        F[:, 1:W, cs] = rows[:, 0:W - 1]
                    elif dx == 1:
                        F[:, 0:W, cs] = rows
                    else:
                        F[:, 0:W - 1, cs] = rows[:, 1:W]
                        F[:, W - 1:W, cs] = jnp.zeros((TH, 1, CIN), F.dtype)
            acc = jax.lax.dot_general(
                F[:].reshape(TH * WP, 9 * CIN), w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32 if int8 else jnp.float32)
            gates = (acc.astype(jnp.float32).reshape(TH, WP, 4 * CH)[:, :W, :]
                     * sb_ref[0] + sb_ref[1])
            if mode in ("no_ptw", "no_build"):
                hout_ref[0] = gates[..., 0 * CH:1 * CH].astype(hout_ref.dtype)
                cout_ref[0] = gates[..., 1 * CH:2 * CH].astype(cout_ref.dtype)
                return
            if mode == "ptw_bf16":
                gates = gates.astype(jnp.bfloat16)
            i = gates[..., 0 * CH:1 * CH]
            f = gates[..., 1 * CH:2 * CH]
            o = gates[..., 2 * CH:3 * CH]
            g = gates[..., 3 * CH:4 * CH]
            cp = c_blk[0].astype(gates.dtype)
            if mode == "ptw_mul":
                c_new = f * cp + i * g
                h_new = o * c_new
            elif mode == "ptw_bf16":
                # logistic/bf16 trips a Mosaic verifier bug; sigmoid via tanh
                half = jnp.bfloat16(0.5)
                sig = lambda v: jnp.tanh(v * half) * half + half
                c_new = sig(f) * cp + sig(i) * jnp.tanh(g)
                h_new = sig(o) * jnp.tanh(c_new)
            else:
                c_new = jax.nn.sigmoid(f) * cp + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            hout_ref[0] = h_new.astype(hout_ref.dtype)
            cout_ref[0] = c_new.astype(cout_ref.dtype)

        return kern

    def build(mode, B, H, W, CH, th, int8):
        CX = CH
        CIN = CX + CH
        WP = _round_up(W, 32 if int8 else 16)

        def fwd(x, h_prev, c_prev, kernel, bias):
            h_prev = h_prev.astype(x.dtype)
            xhalo = _halo_rows(x, th)
            hhalo = _halo_rows(h_prev, th)
            if int8:
                s_x = jnp.maximum(
                    jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-8) / 127.0
                wcat, ws = quantize_gate_weights(kernel, s_x, CX, CH)
                sx2 = (1.0 / s_x).reshape(1, 1)
                buf = jnp.int8
            else:
                wcat = prepare_gate_weights(kernel, x.dtype)
                ws = jnp.ones((4 * CH,), jnp.float32)
                sx2 = jnp.ones((1, 1), jnp.float32)
                buf = x.dtype
            sb = jnp.stack([ws, bias.astype(jnp.float32)])
            kern = make_kernel(th, W, WP, CX, CH, int8, mode)
            blk = lambda c: pl.BlockSpec((1, th, W, c),
                                         lambda b, it: (b, it, 0, 0),
                                         memory_space=pltpu.VMEM)
            hblk = lambda c: pl.BlockSpec((1, 1, 2, W, c),
                                          lambda b, it: (b, it, 0, 0, 0),
                                          memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern, grid=(B, H // th),
                in_specs=[blk(CX), hblk(CX), blk(CH), hblk(CH), blk(CH),
                          pl.BlockSpec((9 * CIN, 4 * CH),
                                       lambda b, it: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((2, 4 * CH), lambda b, it: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, 1), lambda b, it: (0, 0),
                                       memory_space=pltpu.SMEM)],
                out_specs=(blk(CH), blk(CH)),
                out_shape=(jax.ShapeDtypeStruct((B, H, W, CH), x.dtype),
                           jax.ShapeDtypeStruct((B, H, W, CH), c_prev.dtype)),
                scratch_shapes=[pltpu.VMEM((th + 2, W, CIN), buf),
                                pltpu.VMEM((th, WP, 9 * CIN), buf)],
                input_output_aliases={2: 0, 4: 1},
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, xhalo, h_prev, hhalo, c_prev, wcat, sb, sx2)
        return fwd

    for li in layers:
        B, H, W, C = shapes[li]
        th = pick_row_tile(H)
        ks = jax.random.split(jax.random.PRNGKey(li), 5)
        x = jax.random.normal(ks[0], (B, H, W, C), jnp.bfloat16)
        h0 = jnp.tanh(jax.random.normal(ks[1], (B, H, W, C), jnp.bfloat16))
        c0 = jax.random.normal(ks[2], (B, H, W, C), jnp.bfloat16) * 0.5
        kern = (jax.random.normal(ks[3], (3, 3, 2 * C, 4 * C), jnp.float32)
                * (1.0 / np.sqrt(9 * 2 * C)))
        bias = jax.random.normal(ks[4], (4 * C,), jnp.float32) * 0.05
        print(f"L{li} (B{B} {H}x{W}x{C}) th={th} int8={use_int8}")
        for mode in ("full", "ptw_bf16", "ptw_mul", "no_ptw", "no_build"):
            cell = build(mode, B, H, W, C, th, use_int8)

            @jax.jit
            def run(x, h, c, kern, bias):
                def body(carry, _):
                    h, c = carry
                    h, c = cell(x, h, c, kern, bias)
                    return (h, c), None
                (h, c), _ = jax.lax.scan(body, (h, c), None, length=T)
                return h, c

            h, c = run(x, h0, c0, kern, bias)
            float(jnp.sum(h.astype(jnp.float32)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                h, c = run(x, h0, c0, kern, bias)
                float(jnp.sum(h.astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            print(f"  {mode:9s}: {best * 1e3:7.2f} ms / {T} steps "
                  f"({best * 1e3 / T:6.3f} ms/step)")


if __name__ == "__main__":
    main()
