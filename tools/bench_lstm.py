"""Micro-benchmark for the fused Pallas ConvLSTM cell on the real TPU.

For each DSEC encoder shape (B8: 220x320x64, 110x160x128, 55x80x256) times a
20-step recurrent scan (the rollout's shape of work) for the XLA cell vs the
fused kernel, plus a one-step parity check. Queued-dispatch timing: the scan
chain itself serializes on-device; one scalar fetch at the end.

Usage: python tools/bench_lstm.py [--th N] [--layers 0,1,2]
"""

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
    from ess_tpu.ops.conv_lstm_pallas import (
        _make_fused, conv_lstm_ref, pick_row_tile)

    T = 20
    shapes = [(8, 220, 320, 64), (8, 110, 160, 128), (8, 55, 80, 256)]
    args = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
    layers = [int(i) for i in args.get("--layers", "0,1,2").split(",")]
    th_override = int(args["--th"]) if "--th" in args else None

    for li in layers:
        B, H, W, C = shapes[li]
        th = th_override or pick_row_tile(H)
        ks = jax.random.split(jax.random.PRNGKey(li), 5)
        x = jax.random.normal(ks[0], (B, H, W, C), jnp.bfloat16)
        h0 = jnp.tanh(jax.random.normal(ks[1], (B, H, W, C), jnp.bfloat16))
        c0 = jax.random.normal(ks[2], (B, H, W, C), jnp.bfloat16) * 0.5
        kern = (jax.random.normal(ks[3], (3, 3, 2 * C, 4 * C), jnp.float32)
                * (1.0 / np.sqrt(9 * 2 * C)))
        bias = jax.random.normal(ks[4], (4 * C,), jnp.float32) * 0.05

        fused = _make_fused(th, False)
        fused8 = _make_fused(th, False, True)

        def scan_fn(cell):
            def run(x, h, c, kern, bias):
                def body(carry, _):
                    h, c = carry
                    h, c = cell(x, h, c, kern, bias)
                    return (h, c), None
                (h, c), _ = jax.lax.scan(body, (h, c), None, length=T)
                return h, c
            return jax.jit(run)

        f_ref = scan_fn(conv_lstm_ref)
        f_pl = scan_fn(fused)

        # parity (single application)
        h1r, c1r = jax.jit(conv_lstm_ref)(x, h0, c0, kern, bias)
        h1p, c1p = jax.jit(fused)(x, h0, c0, kern, bias)
        dh = float(jnp.max(jnp.abs(h1p.astype(jnp.float32)
                                   - h1r.astype(jnp.float32))))
        dc = float(jnp.max(jnp.abs(c1p.astype(jnp.float32)
                                   - c1r.astype(jnp.float32))))
        print(f"L{li} (B{B} {H}x{W}x{C}) th={th}: parity |dh|={dh:.2e} "
              f"|dc|={dc:.2e}")

        f_i8 = scan_fn(fused8)
        h8, c8 = jax.jit(fused8)(x, h0, c0, kern, bias)
        d8 = float(jnp.max(jnp.abs(h8.astype(jnp.float32)
                                   - h1r.astype(jnp.float32))))
        print(f"  int8 single-step |dh| = {d8:.2e}")
        for name, fn in (("xla", f_ref), ("pallas", f_pl), ("int8", f_i8)):
            h, c = fn(x, h0, c0, kern, bias)
            float(jnp.sum(h.astype(jnp.float32)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                h, c = fn(x, h0, c0, kern, bias)
                float(jnp.sum(h.astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            print(f"  {name:7s}: {best*1e3:8.2f} ms / {T} steps "
                  f"({best/T*1e3:6.2f} ms/step)")


if __name__ == "__main__":
    main()
