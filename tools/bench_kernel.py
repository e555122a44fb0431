"""Micro-benchmark / sweep for the Pallas voxelizer on the real TPU.

Times voxelize_tiled alone at DSEC window-batch scale (160 x 100k events,
the full-step precompute shape) across K/CHUNK/oh_dtype. The output must be
materialized (sum reduces get DCE'd through the tunnel), so we fetch a
scalar derived from the folded grid.

Usage: python tools/bench_kernel.py [--quick]
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
    from ess_tpu.ops.voxel_pallas import (
        host_tile_bin, tile_h_for_bins, voxelize_tiled)

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

    th = tile_h_for_bins(BINS)
    n_tiles = (H // th) * (W // 128)
    print(f"tile_h={th} n_tiles={n_tiles} events={B*N/1e6:.1f}M")

    quick = "--quick" in sys.argv
    ks = [5] if quick else [k for k in (2, 4, 5, 10, 20) if n_tiles % k == 0]
    chunks = [1024] if quick else [512, 1024, 2048]
    dtypes = [jnp.bfloat16]

    for oh in dtypes:
        for k in ks:
            for chunk in chunks:
                fn = jax.jit(lambda x, y, ts, pol, offsets, k=k, c=chunk,
                             oh=oh: voxelize_tiled(
                                 x, y, ts, pol, offsets, bins=BINS,
                                 height=H, width=W, oh_dtype=oh,
                                 layout="s2d", k_tiles=k, chunk=c))
                out = fn(x, y, ts, pol, offsets)
                float(out[0, 0, 0, 0])  # sync through the tunnel
                # queued-dispatch timing: per-iteration fetches measure the
                # tunnel RTT, not the kernel
                iters = 8
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        out = fn(x, y, ts, pol, offsets)
                    float(out[0, 0, 0, 0])
                    best = min(best, (time.perf_counter() - t0) / iters)
                dt = best
                name = jnp.dtype(oh).name
                print(f"oh={name:9s} K={k:2d} CHUNK={chunk:4d}: "
                      f"{dt*1e3:8.2f} ms  ({dt/ (B*N) * 1e9:.2f} ns/event)")


if __name__ == "__main__":
    main()
