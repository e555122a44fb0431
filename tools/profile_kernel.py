"""Profile voxelize_tiled alone and attribute kernel vs fold time."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ess_tpu.ops.voxel_pallas import host_tile_bin, voxelize_tiled

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    layout = sys.argv[3] if len(sys.argv) > 3 else "s2d"

    B, N = 160, 100_000
    H, W, BINS = 480, 640, 5
    rng = np.random.default_rng(0)
    raw = np.zeros((B, N, 4), np.float32)
    raw[..., 0] = rng.uniform(0, W - 1, (B, N))
    raw[..., 1] = rng.uniform(0, H - 1, (B, N))
    raw[..., 2] = np.sort(rng.uniform(0, BINS - 1, (B, N)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (B, N)) * 2.0 - 1.0
    valid = np.ones((B, N), bool)
    sraw, svalid, offs = host_tile_bin(raw, valid, height=H, width=W,
                                       bins=BINS)
    x = jnp.asarray(sraw[..., 0])
    y = jnp.asarray(sraw[..., 1])
    ts = jnp.asarray(sraw[..., 2])
    pol = jnp.asarray(np.where(svalid, sraw[..., 3], 0.0))
    offsets = jnp.asarray(offs)

    fn = jax.jit(lambda *a: voxelize_tiled(
        *a, bins=BINS, height=H, width=W, oh_dtype=jnp.bfloat16,
        layout=layout, k_tiles=k, chunk=chunk))
    out = fn(x, y, ts, pol, offsets)
    float(out.reshape(-1)[0])

    trace_dir = "/tmp/ess_kprof"
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = fn(x, y, ts, pol, offsets)
        float(out.reshape(-1)[0])
    jax.profiler.stop_trace()

    from tools.profile_bench import parse_xplane
    parse_xplane(trace_dir, top=15)


if __name__ == "__main__":
    main()
