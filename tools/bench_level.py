"""Micro-benchmark: fused encoder-level kernel vs the current split path.

Per DSEC level (L0 s2d-input, L1/L2 full-res input), times a 20-step scan of
  split: XLA stride-2 conv (+quant relayout implied) + pallas_int8 cell
  fused: ops/level_pallas.py one-kernel conv+cell
plus a single-step int8-vs-ref error check. Queued-dispatch timing.

Usage: python tools/bench_level.py [--layers 0,1,2]
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
    from ess_tpu.ops.conv_lstm_pallas import conv_lstm_cell
    from ess_tpu.ops.conv_s2d import conv5x5_s2d_stride2, space_to_depth
    from ess_tpu.ops.level_pallas import encoder_level_int8, encoder_level_ref

    T = 20
    # (u_shape NHWC full-res or s2d, ch, u_s2d)
    layers = [
        ((8, 220, 320, 128), 64, True),    # L0: head_s2d in
        ((8, 220, 320, 64), 128, False),   # L1: h0 in
        ((8, 110, 160, 128), 256, False),  # L2: h1 in
    ]
    args = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
    which = [int(i) for i in args.get("--layers", "0,1,2").split(",")]

    for li in which:
        ushape, ch, u_s2d = layers[li]
        ho = ushape[1] if u_s2d else ushape[1] // 2
        wo = ushape[2] if u_s2d else ushape[2] // 2
        cin = ushape[3] // 4 if u_s2d else ushape[3]
        ks = jax.random.split(jax.random.PRNGKey(li), 6)
        u = jax.nn.relu(jax.random.normal(ks[0], ushape, jnp.bfloat16))
        h0 = jnp.tanh(jax.random.normal(
            ks[1], (ushape[0], ho, wo, ch), jnp.bfloat16))
        c0 = jax.random.normal(
            ks[2], (ushape[0], ho, wo, ch), jnp.bfloat16) * 0.5
        ek = (jax.random.normal(ks[3], (5, 5, cin, ch), jnp.float32)
              / np.sqrt(25 * cin))
        eb = jax.random.normal(ks[4], (ch,), jnp.float32) * 0.1
        gk = (jax.random.normal(ks[5], (3, 3, 2 * ch, 4 * ch), jnp.float32)
              / np.sqrt(18 * ch))
        gb = jnp.zeros((4 * ch,), jnp.float32)

        def split_step(u, h, c):
            if u_s2d:
                x = jnp.maximum(
                    conv5x5_s2d_stride2(u, ek, eb, dtype=jnp.bfloat16), 0)
            else:
                x = jnp.maximum(jax.lax.conv_general_dilated(
                    u, ek.astype(jnp.bfloat16), (2, 2),
                    ((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)
                    + eb.astype(jnp.bfloat16), 0)
            return conv_lstm_cell(x, h, c, gk, gb, impl="pallas_int8")

        def fused_step(u, h, c):
            h2, (_, c2) = encoder_level_int8(u, (h, c), ek, eb, gk, gb,
                                             u_s2d=u_s2d)
            return h2, c2

        # error check vs the f32 reference
        h_ref, c_ref = encoder_level_ref(
            u.astype(jnp.float32), h0.astype(jnp.float32),
            c0.astype(jnp.float32), ek, eb, gk, gb, u_s2d=u_s2d)
        for name, step in (("split", split_step), ("fused", fused_step)):
            h1, _ = jax.jit(step)(u, h0, c0)
            dh = float(jnp.max(jnp.abs(h1.astype(jnp.float32) - h_ref)))
            print(f"L{li} {name}: single-step |dh| vs f32 ref = {dh:.3e}")

        for name, step in (("split", split_step), ("fused", fused_step)):
            @jax.jit
            def run(u, h, c, step=step):
                def body(carry, _):
                    h, c = step(u, *carry)
                    return (h, c), None
                (h, c), _ = jax.lax.scan(body, (h, c), None, length=T)
                return h, c

            h, c = run(u, h0, c0)
            float(jnp.sum(h.astype(jnp.float32)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                h, c = run(u, h0, c0)
                float(jnp.sum(h.astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            print(f"  {name}: {best * 1e3:7.2f} ms / {T} steps "
                  f"({best * 1e3 / T:6.3f} ms/step)")


if __name__ == "__main__":
    main()
