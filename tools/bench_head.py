"""Derisk probe: C-major (plane-form) head conv formulations on the TPU.

The E2VID head conv consumes a (B, 220, 320, 20) s2d voxel window per scan
step; with C=20 minor XLA lane-pads the input 6.4x and relayouts the window
slice (~1 ms/window total, round-3 xplane). A Pallas kernel reading the
C-MAJOR window (B, 20, 220, 320) builds im2row as 180 aligned (th, W)
PLANE copies (K on the outer dim) — but the MXU dot then contracts the
outer dim, whose lowering cost is unknown. This probe times the variants:

  xla    : current conv5x5_s2d_blocks on NHWC (B, 220, 320, 20) incl. the
           normalize-apply + the relayout from a C-major source
  tform  : Pallas, dot_general((K, th, W) reshaped, (K, N)) -> NHWC out
  nchw   : Pallas, dot_general((N, K), (K, M)) -> NCHW out

Each fuses the per-window nonzero-normalize apply. 20-call chain.

OUTCOME (round 3, recorded so nobody retries): `nchw` violates the Pallas
block constraint (last-two block dims must be (8,128)-divisible or full —
220 has no 8-divisible row tile); `tform` with a full-image input block
crashes the axon remote compiler (tpu_compile_helper exit 1) on the
(180, th, W) -> (180, th*W) scratch reshape + dim-0-contracting dot. The
C-major head-conv line was dropped; the quad-block rollout
(models/e2vid.py) attacks the same lane-padding problem with exact-math
weight remaps instead.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ess_tpu.ops.conv_s2d import conv5x5_s2d_blocks, s2d_kernel
    from ess_tpu.ops.conv_lstm_pallas import pick_row_tile

    B, HH, WW, C = 8, 220, 320, 20
    COUT = 128
    T = 20
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x_nchw = jax.random.normal(ks[0], (B, C, HH, WW), jnp.bfloat16)
    x_nchw = jnp.where(jnp.abs(x_nchw) < 0.5, 0, x_nchw)
    k5 = (jax.random.normal(ks[1], (5, 5, 5, 32), jnp.float32)
          / np.sqrt(125))
    bias = jax.random.normal(ks[2], (32,), jnp.float32) * 0.1
    shift, scale = 0.1, 1.5   # python floats: compile-time constants

    w2 = s2d_kernel(k5).astype(jnp.bfloat16)       # (3, 3, 20, 128)
    wflat = w2.reshape(9 * C, COUT)
    b4 = jnp.tile(bias, 4).astype(jnp.float32)

    th = pick_row_tile(HH)
    NT = HH // th

    def make_pallas(nchw_out):
        def kern(x_blk, w_ref, b_ref, out_ref, F):
            it = pl.program_id(1)
            r0 = it * th

            def norm(v):
                vf = v.astype(jnp.float32)
                return jnp.where(vf != 0, (vf - shift) * scale,
                                 0.0).astype(jnp.bfloat16)

            zrow = jnp.zeros((1, WW), jnp.bfloat16)
            for cin in range(C):
                # rows r0-1 .. r0+th from the fully resident image; zero
                # rows past the image edge (conv zero padding)
                top = jnp.where(it == 0, zrow,
                                norm(x_blk[0, cin, pl.ds(r0 - 1 + (it == 0), 1)]))
                mid = norm(x_blk[0, cin, pl.ds(r0, th)])
                bot = jnp.where(it == NT - 1, zrow,
                                norm(x_blk[0, cin,
                                           pl.ds(r0 + th - (it == NT - 1), 1)]))
                plane = jnp.concatenate([top, mid, bot], axis=0)
                for dy in range(3):
                    rows = plane[dy:dy + th]
                    for dx in range(3):
                        kidx = (dy * 3 + dx) * C + cin
                        if dx == 0:
                            F[kidx, :, 0:1] = jnp.zeros((th, 1), F.dtype)
                            F[kidx, :, 1:WW] = rows[:, 0:WW - 1]
                        elif dx == 1:
                            F[kidx] = rows
                        else:
                            F[kidx, :, 0:WW - 1] = rows[:, 1:WW]
                            F[kidx, :, WW - 1:WW] = jnp.zeros((th, 1),
                                                              F.dtype)
            if nchw_out:
                acc = jax.lax.dot_general(
                    w_ref[:], F[:].reshape(9 * C, th * WW),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (COUT, th*WW)
                out = jnp.maximum(acc + b_ref[:, 0:1], 0.0)
                out_ref[0] = out.reshape(COUT, th, WW).astype(out_ref.dtype)
            else:
                acc = jax.lax.dot_general(
                    F[:].reshape(9 * C, th * WW), w_ref[:],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (th*WW, COUT)
                out = jnp.maximum(acc + b_ref[0], 0.0)
                out_ref[0] = out.reshape(th, WW, COUT).astype(out_ref.dtype)

        if nchw_out:
            out_spec = pl.BlockSpec((1, COUT, th, WW),
                                    lambda b, it: (b, 0, it, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((B, COUT, HH, WW), jnp.bfloat16)
            b_in = jnp.broadcast_to(b4[:, None], (COUT, 128)).copy()
            b_spec = pl.BlockSpec((COUT, 128), lambda b, it: (0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            out_spec = pl.BlockSpec((1, th, WW, COUT),
                                    lambda b, it: (b, it, 0, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((B, HH, WW, COUT), jnp.bfloat16)
            b_in = jnp.broadcast_to(b4[None, :], (8, COUT)).copy()
            b_spec = pl.BlockSpec((8, COUT), lambda b, it: (0, 0),
                                  memory_space=pltpu.VMEM)

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kern,
                grid=(B, NT),
                in_specs=[
                    pl.BlockSpec((1, C, HH, WW), lambda b, it: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9 * C, COUT), lambda b, it: (0, 0),
                                 memory_space=pltpu.VMEM),
                    b_spec,
                ],
                out_specs=out_spec,
                out_shape=out_shape,
                scratch_shapes=[pltpu.VMEM((9 * C, th, WW), jnp.bfloat16)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, wflat, b_in)
        return run

    # XLA reference path: relayout from C-major + normalize + conv
    @jax.jit
    def run_xla(x):
        xn = jnp.moveaxis(x, 1, -1)                    # -> NHWC
        xf = xn.astype(jnp.float32)
        xn = jnp.where(xf != 0, (xf - shift) * scale, 0.0).astype(jnp.bfloat16)
        return conv5x5_s2d_blocks(xn, k5, bias, dtype=jnp.bfloat16)

    ref = run_xla(x_nchw)

    variants = [("xla", run_xla, "nhwc")]
    for name, nchw in (("tform", False), ("nchw", True)):
        try:
            fn = make_pallas(nchw)
            out = fn(x_nchw)
            cmp = (jnp.moveaxis(out, 1, -1) if nchw else out)
            d = float(jnp.max(jnp.abs(cmp.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
            print(f"{name}: maxdiff vs xla = {d:.3e}")
            variants.append((name, fn, "nchw" if nchw else "nhwc"))
        except Exception as e:
            print(f"{name}: FAILED to build/run: {type(e).__name__}: "
                  f"{str(e)[:200]}")

    for name, fn, _ in variants:
        out = fn(x_nchw)
        float(jnp.sum(out.astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(T):
                out = fn(x_nchw)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:6s}: {best * 1e3 / T:7.3f} ms/window")


if __name__ == "__main__":
    main()
