"""Event -> dense tensor representations (voxel grids, histograms), in JAX.

Capability parity with the reference's three voxelizer variants
(SURVEY.md section 2.3):

- temporal-bilinear voxel grid with optional polarity separation
  (/root/reference/datasets/data_util.py:54-126)
- trilinear (x, y, t) voxel grid over float rectified coordinates
  (/root/reference/DSEC/dataset/representations.py:15-55)
- 2-channel event-count histogram (/root/reference/datasets/data_util.py:17-35)
- nonzero mean/std normalization (/root/reference/datasets/data_util.py:38-51,
  e2vid/utils/inference_utils.py:95-108)

TPU-first design: event windows are fixed-capacity buffers with validity
masks (XLA needs static shapes; ragged time-window slices are padded on the
host). All variants lower to a single fused scatter-add; invalid lanes
scatter a zero into cell 0 instead of branching. These jnp versions are the
semantic reference; `ess_tpu.ops.voxel_pallas` provides the tuned kernel for
the same contract.

Events are struct-of-arrays: x, y (pixel coords, float or int), t (raw
timestamps, any monotonic unit), p (polarity, {0,1} or {-1,1}).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EventWindow(NamedTuple):
    """A fixed-capacity window of events with a validity mask.

    All arrays share shape ``(N,)``. ``valid`` marks real events; padded
    lanes may hold arbitrary values.
    """

    x: jax.Array
    y: jax.Array
    t: jax.Array
    p: jax.Array
    valid: jax.Array  # bool

    @staticmethod
    def from_arrays(x, y, t, p, valid=None) -> "EventWindow":
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
        p = jnp.asarray(p, jnp.float32)
        if valid is None:
            valid = jnp.ones(x.shape, dtype=bool)
        return EventWindow(x, y, t, p, jnp.asarray(valid, bool))


def _signed_polarity(p: jax.Array) -> jax.Array:
    """Map polarity encodings {0,1} or {-1,1} to {-1,+1}."""
    return jnp.where(p > 0, 1.0, -1.0).astype(jnp.float32)


def _window_time_bounds(t: jax.Array, valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """First/last valid timestamp in the window.

    The reference indexes t[0] / t[-1] directly (data_util.py:76-77,
    representations.py:28); with padding we take the masked min/max, which is
    identical for sorted streams padded at the tail.
    """
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    t_first = jnp.min(jnp.where(valid, t, big))
    t_last = jnp.max(jnp.where(valid, t, -big))
    return t_first, t_last


def _normalized_time(t: jax.Array, valid: jax.Array, num_bins: int) -> jax.Array:
    t_first, t_last = _window_time_bounds(t, valid)
    delta = t_last - t_first
    delta = jnp.where(delta <= 0, 1.0, delta)  # data_util.py:79-80 deltaT==0 guard
    return (num_bins - 1) * (t - t_first) / delta


def voxel_grid_temporal(
    ev: EventWindow,
    *,
    num_bins: int,
    height: int,
    width: int,
    separate_pol: bool = False,
) -> jax.Array:
    """Temporal-bilinear voxel grid for integer pixel coordinates.

    Splits each event's |polarity| between the two neighbouring temporal bins
    and scatter-adds at its (y, x) pixel. Matches
    /root/reference/datasets/data_util.py:54-126 bit-for-bit on valid inputs
    (including its bounds predicate ``ts >= 0 & ts < num_bins`` evaluated on
    the *float* normalized time).

    Returns ``(2*num_bins, H, W)`` when ``separate_pol`` (positive grid then
    negative grid), else the signed difference ``(num_bins, H, W)``.
    """
    xs = ev.x.astype(jnp.int32)
    ys = ev.y.astype(jnp.int32)
    ts = _normalized_time(ev.t, ev.valid, num_bins)
    pol = _signed_polarity(ev.p)

    tis = ts.astype(jnp.int32)  # truncation == floor for ts >= 0
    dts = ts - tis.astype(jnp.float32)

    in_frame = (
        (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
        & (ts >= 0.0) & (ts < num_bins) & ev.valid
    )

    cells = height * width
    pix = ys * width + xs

    def scatter(values: jax.Array, grid_shape_c: int) -> jax.Array:
        """Two scatter-adds (left/right temporal bin) into a flat grid."""
        left_ok = in_frame & (tis < num_bins)
        right_ok = in_frame & (tis + 1 < num_bins)
        idx_l = jnp.where(left_ok, tis * cells + pix, 0)
        idx_r = jnp.where(right_ok, (tis + 1) * cells + pix, 0)
        v_l = jnp.where(left_ok, values * (1.0 - dts), 0.0)
        v_r = jnp.where(right_ok, values * dts, 0.0)
        flat = jnp.zeros((grid_shape_c * cells,), jnp.float32)
        flat = flat.at[idx_l].add(v_l, mode="drop")
        flat = flat.at[idx_r].add(v_r, mode="drop")
        return flat.reshape(grid_shape_c, height, width)

    if separate_pol:
        pos = scatter(jnp.where(pol > 0, 1.0, 0.0), num_bins)
        neg = scatter(jnp.where(pol < 0, 1.0, 0.0), num_bins)
        return jnp.concatenate([pos, neg], axis=0)
    # pos - neg == direct signed scatter of pol * weight
    return scatter(pol, num_bins)


def voxel_grid_trilinear(
    ev: EventWindow,
    *,
    num_bins: int,
    height: int,
    width: int,
    normalize: bool = False,
) -> jax.Array:
    """Full trilinear (x, y, t) voxel grid for float (rectified) coordinates.

    Each event deposits ``(2p-1) * wx * wy * wt`` into the 8 surrounding
    corners. Matches /root/reference/DSEC/dataset/representations.py:15-55
    (per-corner bounds mask, value ``2p-1`` with p in {0,1}).

    Returns ``(num_bins, H, W)`` float32.
    """
    x = ev.x.astype(jnp.float32)
    y = ev.y.astype(jnp.float32)
    ts = _normalized_time(ev.t, ev.valid, num_bins)
    value = _signed_polarity(ev.p)

    x0 = x.astype(jnp.int32)
    y0 = y.astype(jnp.int32)
    t0 = ts.astype(jnp.int32)

    cells = height * width
    flat = jnp.zeros((num_bins * cells,), jnp.float32)

    idx_list = []
    val_list = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dt in (0, 1):
                xl = x0 + dx
                yl = y0 + dy
                tl = t0 + dt
                ok = (
                    (xl >= 0) & (xl < width) & (yl >= 0) & (yl < height)
                    & (tl >= 0) & (tl < num_bins) & ev.valid
                )
                w = (
                    value
                    * (1.0 - jnp.abs(xl.astype(jnp.float32) - x))
                    * (1.0 - jnp.abs(yl.astype(jnp.float32) - y))
                    * (1.0 - jnp.abs(tl.astype(jnp.float32) - ts))
                )
                idx_list.append(jnp.where(ok, tl * cells + yl * width + xl, 0))
                val_list.append(jnp.where(ok, w, 0.0))

    idx = jnp.concatenate(idx_list)
    val = jnp.concatenate(val_list)
    flat = flat.at[idx].add(val, mode="drop")
    grid = flat.reshape(num_bins, height, width)

    if normalize:
        grid = normalize_nonzero(grid)
    return grid


def event_histogram(
    ev: EventWindow, *, height: int, width: int
) -> jax.Array:
    """2-channel (neg, pos) event-count histogram.

    Matches /root/reference/datasets/data_util.py:17-35 (channel 0 negative,
    channel 1 positive).
    """
    xs = ev.x.astype(jnp.int32)
    ys = ev.y.astype(jnp.int32)
    pol = _signed_polarity(ev.p)
    ok = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height) & ev.valid

    cells = height * width
    pix = jnp.where(ok, ys * width + xs, 0)
    chan = jnp.where(pol > 0, 1, 0)
    idx = chan * cells + pix
    flat = jnp.zeros((2 * cells,), jnp.float32)
    flat = flat.at[idx].add(jnp.where(ok, 1.0, 0.0), mode="drop")
    return flat.reshape(2, height, width)


def normalize_nonzero(grid: jax.Array) -> jax.Array:
    """Standardize the nonzero entries of an event tensor to mean 0 / std 1.

    Matches /root/reference/datasets/data_util.py:38-51 and
    e2vid/utils/inference_utils.py:95-108 (biased std over nonzeros; zeros
    stay zero; untouched when the tensor is all-zero).
    """
    nonzero = grid != 0
    num = jnp.sum(nonzero)
    num_f = jnp.maximum(num, 1).astype(jnp.float32)
    mean = jnp.sum(grid) / num_f
    var = jnp.sum(grid * grid) / num_f - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    safe_std = jnp.where(std > 0, std, 1.0)
    normed = jnp.where(nonzero, (grid - mean) / safe_std, 0.0)
    return jnp.where(num > 0, normed, grid)
