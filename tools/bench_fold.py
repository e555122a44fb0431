"""Micro-benchmark of the s2d halo-fold variants on the real TPU.

Times fold implementations alone on a DSEC-shaped tile array
(160, 20, 128, 680) bf16, queued-dispatch with one scalar fetch.

Usage: python tools/bench_fold.py
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
    from ess_tpu.ops import voxel_pallas as vp

    bins, th, height, width = 5, 24, 480, 640
    n_ty = height // th
    rows = vp._row_pad(bins, th)
    cols = (width // vp.TILE_W) * vp.COL_SLOT
    bt = 160
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        rng.normal(size=(bt, n_ty, rows, cols)).astype(np.float32),
        jnp.bfloat16)

    variants = {"xla_v1": lambda t: vp._fold_halo_s2d(
        t, bins=bins, tile_h=th, height=height, width=width)}
    variants["xla_v2"] = lambda t: vp._fold_halo_s2d_v2(
        t, bins=bins, tile_h=th, height=height, width=width)
    variants["mxu_v3"] = lambda t: vp._fold_halo_s2d_mxu(
        t, bins=bins, tile_h=th, height=height, width=width)

    # normalize (stats) fused behind the fold, as in production
    def with_norm(fold):
        def f(t):
            g = fold(t)
            flat = g.reshape(g.shape[0], 1, -1)
            from ess_tpu.ops.batch_voxel import _normalize_flat
            return _normalize_flat(flat).reshape(g.shape)
        return jax.jit(f)

    ref = None
    for name, fold in variants.items():
        fn = with_norm(fold)
        out = fn(tiles)
        if ref is None:
            ref = np.asarray(out[:2], np.float32)
        else:
            got = np.asarray(out[:2], np.float32)
            bad = np.abs(got - ref) > 5e-2
            assert bad.mean() < 1e-5, bad.mean()  # bf16 halo-add order
        float(out[0, 0, 0, 0].astype(jnp.float32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn(tiles)
            float(out[0, 0, 0, 0].astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / 8)
        print(f"{name:8s}: {best*1e3:7.2f} ms (fold + normalize)")


if __name__ == "__main__":
    main()
