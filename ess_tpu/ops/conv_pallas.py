"""Pallas TPU conv for MXU-hostile channel counts (the E2VID head conv).

The E2VID head is a 5x5 conv over the 5-channel voxel grid
(e2vid/model/unet.py:140-141). XLA's conv lowering contracts over C_in
padded to 8 lanes => ~4 TF/s on v5e (~100 ms of the DSEC train step). A
plain XLA im2col is worse (the 25x patch tensor thrashes HBM).

This kernel builds the im2col patches TILE-WISE IN VMEM: each program DMAs a
channels-major (C, TILE_H+8, W+4) input slab, assembles a
(k*k*C, TILE_H, W) patch tensor in VMEM scratch (full-row writes, lane
-contiguous), and contracts the k*k*C axis in ONE dot_general — a 200-deep
MXU contraction instead of XLA's 8-deep one.

Forward-only (the head runs under stop_gradient / frozen params in every ESS
trainer, so no VJP is needed on this path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
KSIZE = 5
PAD = KSIZE // 2
SLAB_H = TILE_H + 8  # sublane-aligned fetch covering TILE_H + 2*PAD rows


def _kernel(x_ref, w_ref, b_ref, out_ref, slab, patches, sem, *,
            cin: int, cout: int, width: int, hpad: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_ref.at[bi, :, pl.ds(ti * TILE_H, SLAB_H), :], slab, sem)
    cp.start()
    cp.wait()

    for c in range(cin):
        for ky in range(KSIZE):
            for kx in range(KSIZE):
                col = (ky * KSIZE + kx) * cin + c
                patches[col] = slab[c, ky: ky + TILE_H, kx: kx + width]

    out = jax.lax.dot_general(
        patches[:], w_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TILE_H, width, cout)
    out_ref[0, 0] = out + b_ref[0][None, None, :]


def head_conv_pallas(
    x: jax.Array, kernel: jax.Array, bias: jax.Array,
) -> jax.Array:
    """5x5 stride-1 'SAME' conv: (B, H, W, Cin) x (5, 5, Cin, Cout) ->
    (B, H, W, Cout) f32. H must be a multiple of TILE_H."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % TILE_H == 0, (h, TILE_H)

    # channels-major input padded to (B, Cin, H + 8, Wp): halo rows/cols,
    # extra bottom rows so every SLAB_H fetch stays in bounds, and the minor
    # dim rounded to the 128-lane tiling (DMA slices must be lane-aligned)
    hpad = h + 8
    wp = ((w + 2 * PAD + 127) // 128) * 128
    xp = jnp.pad(jnp.moveaxis(x.astype(jnp.float32), -1, 1),
                 ((0, 0), (0, 0), (PAD, 8 - 2 * PAD + PAD),
                  (PAD, wp - w - PAD)))
    wflat = kernel.reshape(KSIZE * KSIZE * cin, cout).astype(jnp.float32)
    bias2 = bias.reshape(1, cout).astype(jnp.float32)

    grid = (b, h // TILE_H)
    out = pl.pallas_call(
        functools.partial(_kernel, cin=cin, cout=cout, width=w, hpad=hpad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # full input, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec((1, 1, TILE_H, w, cout),
                               lambda bi, i: (bi, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // TILE_H, TILE_H, w, cout),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cin, SLAB_H, wp), jnp.float32),
            pltpu.VMEM((KSIZE * KSIZE * cin, TILE_H, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xp, wflat, bias2)
    return out.reshape(b, h, w, cout)
