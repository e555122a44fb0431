"""Xplane profile of one ConvLSTM layer scan: XLA cell vs fused Pallas cell.

Usage: python tools/profile_lstm.py [layer_idx] [th]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from profile_bench import parse_xplane


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ess_tpu.ops.conv_lstm_pallas import (
        _make_fused, conv_lstm_ref, pick_row_tile)

    li = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    shapes = [(8, 220, 320, 64), (8, 110, 160, 128), (8, 55, 80, 256)]
    B, H, W, C = shapes[li]
    th = int(sys.argv[2]) if len(sys.argv) > 2 else pick_row_tile(H)
    T = 20

    ks = jax.random.split(jax.random.PRNGKey(li), 5)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.bfloat16)
    h0 = jnp.tanh(jax.random.normal(ks[1], (B, H, W, C), jnp.bfloat16))
    c0 = jax.random.normal(ks[2], (B, H, W, C), jnp.bfloat16) * 0.5
    kern = (jax.random.normal(ks[3], (3, 3, 2 * C, 4 * C), jnp.float32)
            * (1.0 / np.sqrt(9 * 2 * C)))
    bias = jax.random.normal(ks[4], (4 * C,), jnp.float32) * 0.05

    def scan_fn(cell):
        def run(x, h, c, kern, bias):
            def body(carry, _):
                h, c = carry
                h, c = cell(x, h, c, kern, bias)
                return (h, c), None
            (h, c), _ = jax.lax.scan(body, (h, c), None, length=T)
            return h, c
        return jax.jit(run)

    for name, cell in (("xla", conv_lstm_ref), ("pallas", _make_fused(th, False))):
        fn = scan_fn(cell)
        h, c = fn(x, h0, c0, kern, bias)
        float(jnp.sum(h.astype(jnp.float32)))
        trace_dir = f"/tmp/lstm_profile_{name}"
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            h, c = fn(x, h0, c0, kern, bias)
            float(jnp.sum(h.astype(jnp.float32)))
        jax.profiler.stop_trace()
        print(f"\n######## {name} L{li} th={th} "
              f"(per profiled step = {T} cell steps) ########")
        parse_xplane(trace_dir, top=12, steps=3)


if __name__ == "__main__":
    main()
