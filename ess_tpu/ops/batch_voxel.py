"""Batched on-device voxelization of raw event windows.

The reference voxelizes on the host CPU inside DataLoader workers (joblib
threads, DSEC/dataset/sequence.py:278-279) — its throughput bottleneck
(SURVEY.md section 3.3). Here raw event windows ship to the device as fixed
-capacity (B, T, N, 4) buffers with validity masks and the voxel grids are
built on-chip (vmap over batch x window of the ops.voxel kernels), fused into
the same jit as the train step. Optional per-pixel rectification
(DSEC rectify_map.h5 lookup, sequence.py:193-200) is a device-side gather.

Event column order is (x, y, t, p) matching the reference's loader output
(example_loader_ddd17.py:70-87).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ess_tpu.ops.voxel import (
    EventWindow,
    event_histogram,
    voxel_grid_temporal,
    voxel_grid_trilinear,
)


def rectify_events(
    x: jax.Array, y: jax.Array, rectify_map: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Undistort integer sensor coords through a (H, W, 2) float map.

    ``rectify_map[y, x] = (x_rect, y_rect)`` — the DSEC rectification lookup
    (sequence.py:193-200). Returns float coordinates.
    """
    xi = jnp.clip(x.astype(jnp.int32), 0, rectify_map.shape[1] - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, rectify_map.shape[0] - 1)
    rect = rectify_map[yi, xi]
    return rect[..., 0], rect[..., 1]


def voxelize_windows(
    events: jax.Array,
    valid: jax.Array,
    *,
    num_bins: int,
    height: int,
    width: int,
    representation: str = "voxel_grid",
    separate_pol: bool = False,
    rectify_map: Optional[jax.Array] = None,
    normalize: bool = False,
) -> jax.Array:
    """(B, T, N, 4) raw events -> (B, T, H, W, C) NHWC voxel grids.

    With ``rectify_map`` the coords are undistorted first and the full
    trilinear kernel is used (DSEC path); otherwise the temporal-bilinear
    kernel (DDD17 path). ``representation='histogram'`` gives 2-channel
    counts.
    """

    def one(ev_win: jax.Array, valid_win: jax.Array) -> jax.Array:
        x, y, t, p = (ev_win[:, 0], ev_win[:, 1], ev_win[:, 2], ev_win[:, 3])
        if rectify_map is not None:
            x, y = rectify_events(x, y, rectify_map)
        ev = EventWindow.from_arrays(x, y, t, p, valid_win)
        if representation == "histogram":
            chw = event_histogram(ev, height=height, width=width)
        elif rectify_map is not None:
            chw = voxel_grid_trilinear(
                ev, num_bins=num_bins, height=height, width=width,
                normalize=normalize)
        else:
            chw = voxel_grid_temporal(
                ev, num_bins=num_bins, height=height, width=width,
                separate_pol=separate_pol)
        return jnp.moveaxis(chw, 0, -1)  # CHW -> HWC

    return jax.vmap(jax.vmap(one))(events, valid)
