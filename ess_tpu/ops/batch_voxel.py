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


def _masked_time_norm(t: jax.Array, valid: jax.Array, num_bins: int) -> jax.Array:
    """Per-sample normalized time in [0, bins-1] over valid events; (B, N)."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    t0 = jnp.min(jnp.where(valid, t, big), axis=-1, keepdims=True)
    t1 = jnp.max(jnp.where(valid, t, -big), axis=-1, keepdims=True)
    delta = jnp.where(t1 - t0 <= 0, 1.0, t1 - t0)
    return (num_bins - 1) * (t - t0) / delta


def _normalize_flat(grid: jax.Array) -> jax.Array:
    """Nonzero mean/std standardization per sample on (B, C, cells) layout
    (bandwidth-friendly: reductions run over the large minor axis). Stats
    accumulate in f32 regardless of the grid dtype (bf16 grids from the
    Pallas writeback)."""
    nz = grid != 0
    num = jnp.sum(nz, axis=(1, 2))
    num_f = jnp.maximum(num, 1).astype(jnp.float32)
    mean = jnp.sum(grid, axis=(1, 2), dtype=jnp.float32) / num_f
    var = (jnp.sum(jnp.square(grid.astype(jnp.float32)), axis=(1, 2))
           / num_f - mean * mean)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    std = jnp.where(std > 0, std, 1.0)
    # the elementwise pass stays in the grid dtype (a bf16 grid would
    # otherwise materialize an f32 copy through the fold transposes); the
    # f32 stats are folded in as dtype-cast scale/shift
    shift = mean.astype(grid.dtype)[:, None, None]
    scale = (1.0 / std).astype(grid.dtype)[:, None, None]
    out = jnp.where(nz, (grid - shift) * scale, jnp.zeros_like(grid))
    return jnp.where((num > 0)[:, None, None], out, grid)


def _use_pallas_default() -> bool:
    import jax as _jax
    return _jax.default_backend() == "tpu"


def effective_bins(num_bins: int, separate_pol: bool, trilinear: bool) -> int:
    """Channel count the Pallas kernel builds (separate_pol folds polarity
    into the bin axis on the temporal-bilinear path). Host tile binning
    (``host_tile_bin(bins=...)``) must use THIS value so tile geometry
    matches the device kernel."""
    return 2 * num_bins if (separate_pol and not trilinear) else num_bins


def _voxelize_pallas(
    x, y, t, p, valid, *, num_bins, height, width, separate_pol, trilinear,
    tile_offsets=None, interpret: bool = False, layout: str = "nhwc",
    oh_dtype=jnp.bfloat16, out_dtype=jnp.float32,
    t_prenormalized: bool = False, offsets_kind: str = "tile",
    normalize: bool = False, resize_width_to=None,
    resize_align_corners: bool = True, chunk=None, deint=None,
):
    """Route through the tiled Pallas kernel (ops.voxel_pallas).

    The kernel needs H % tile_h == 0 and W % 128 == 0; smaller sensors
    (DDD17's 260x346) voxelize into a padded grid and crop — events never
    land in the pad so the crop is exact. The temporal-bilinear variant is
    the same kernel with integer coords (zero spatial fractions);
    separate_pol folds the polarity into the channel axis by shifting the
    normalized time by ``num_bins`` for negative events.

    ``layout='s2d'`` emits space-to-depth blocks (B, H/2, W/2, 4*C) without
    ever materializing the full-resolution grid (requires height/width even;
    the caller crops in block space).
    """
    from ess_tpu.ops.voxel_pallas import (
        bin_events_device, tile_h_for_bins, voxelize_folded, voxelize_tiled)

    # events with a coordinate in (-1, 0) still have one in-frame corner;
    # the kernel deposits its correct bilinear weight (the torch reference
    # truncates instead of flooring there, adding a spurious NEGATIVE
    # weight at index 1 — representations.py:27-37; we keep the
    # mathematically correct single-corner deposit, see PARITY.md)
    ok = valid & (x > -1) & (x < width) & (y > -1) & (y < height)
    ts = (t.astype(jnp.float32) if t_prenormalized
          else _masked_time_norm(t.astype(jnp.float32), valid, num_bins))
    if offsets_kind == "band":
        # pre-folded events (host_band_bin_folded): p arrives PRE-WEIGHTED
        # (signed, edge/boundary fractions already folded in) and every
        # coordinate is in-frame by construction
        assert tile_offsets is not None, "band offsets require host binning"
        pol = p.astype(jnp.float32)
    else:
        pol = jnp.where(p > 0, 1.0, -1.0).astype(jnp.float32)

    if not trilinear:
        # integer coords => zero spatial fractions => pure temporal bilinear
        x = jnp.floor(x.astype(jnp.float32))
        y = jnp.floor(y.astype(jnp.float32))
        ts = jnp.clip(ts, 0.0, num_bins - 1)

    bins_eff = effective_bins(num_bins, separate_pol, trilinear)
    if bins_eff != num_bins:
        ts = ts + jnp.where(pol < 0, float(num_bins), 0.0)
        pol = jnp.abs(pol)  # preserves pre-weighted magnitudes (band mode)

    th = tile_h_for_bins(bins_eff)
    hp = ((height + th - 1) // th) * th
    wp = ((width + 127) // 128) * 128

    if offsets_kind == "band":
        from ess_tpu.ops.voxel_pallas import _resize_w_matrix

        out_w = width
        resize_w = None
        if resize_width_to is not None and resize_width_to != width:
            out_w = resize_width_to
            out_pad = ((out_w + 7) // 8) * 8
            resize_w = jnp.asarray(_resize_w_matrix(
                width, out_w, wp, out_pad, resize_align_corners))
        if layout == "raw":
            # raw-accumulator mode (see voxelize_folded): returns the
            # untransposed kernel output + per-window stats; the consumer
            # (EventPipeline.build_all_raw) owns crop/normalize/flip and
            # the fine s2d transform, fused per window inside the scan
            return voxelize_folded(
                x.astype(jnp.float32), y.astype(jnp.float32), ts,
                jnp.where(ok, pol, 0.0), tile_offsets,
                bins=bins_eff, height=hp, width=wp, interpret=interpret,
                layout="raw", oh_dtype=oh_dtype, out_dtype=out_dtype,
                normalize=normalize, resize_w=resize_w, chunk=chunk)
        if layout == "stack":
            # in-kernel s2d NCHW stack emission (see voxelize_folded):
            # returns ((B, 4*C, H/2, W/2), stats) with normalize/flip
            # deferred to the consumer's per-window elementwise map
            # (EventPipeline.build_all_stack); no resize support
            assert resize_w is None, "stack layout: no in-kernel resize"
            stack, stats = voxelize_folded(
                x.astype(jnp.float32), y.astype(jnp.float32), ts,
                jnp.where(ok, pol, 0.0), tile_offsets,
                bins=bins_eff, height=hp, width=wp, interpret=interpret,
                layout="stack", oh_dtype=oh_dtype, out_dtype=out_dtype,
                normalize=normalize, chunk=chunk)
            return stack[:, :, : height // 2, : width // 2], stats
        grid = voxelize_folded(
            x.astype(jnp.float32), y.astype(jnp.float32), ts,
            jnp.where(ok, pol, 0.0), tile_offsets,
            bins=bins_eff, height=hp, width=wp, interpret=interpret,
            layout=layout, oh_dtype=oh_dtype, out_dtype=out_dtype,
            normalize=normalize, resize_w=resize_w, chunk=chunk,
            deint=deint)
        if layout == "s4d":
            return grid[:, : height // 4, : out_w // 4, :]
        if layout == "s2d":
            return grid[:, : height // 2, : out_w // 2, :]
        return grid[:, :height, :out_w, :]
    if tile_offsets is None:
        xs, ys, tss, ps, offsets = jax.vmap(
            lambda a, b_, c, d, v: bin_events_device(
                a, b_, c, d, v, height=hp, width=wp, bins=bins_eff)
        )(x.astype(jnp.float32), y.astype(jnp.float32), ts,
          jnp.where(ok, pol, 0.0), ok)
    else:
        # events arrive tile-sorted from the host loader (host_tile_bin)
        xs, ys, tss, ps = (x.astype(jnp.float32), y.astype(jnp.float32), ts,
                           jnp.where(ok, pol, 0.0))
        offsets = tile_offsets
    grid = voxelize_tiled(xs, ys, tss, ps, offsets,
                          bins=bins_eff, height=hp, width=wp,
                          interpret=interpret, layout=layout,
                          oh_dtype=oh_dtype, out_dtype=out_dtype,
                          **({"chunk": chunk} if chunk else {}))
    if layout == "s4d":
        return grid[:, : height // 4, : width // 4, :]
    if layout == "s2d":
        return grid[:, : height // 2, : width // 2, :]
    return grid[:, :height, :width, :]  # (B, H, W, C)


def voxelize_window_soa(
    x: jax.Array,
    y: jax.Array,
    t: jax.Array,
    p: jax.Array,
    valid: jax.Array,
    *,
    num_bins: int,
    height: int,
    width: int,
    representation: str = "voxel_grid",
    separate_pol: bool = False,
    trilinear: bool = False,
    rectify_map: Optional[jax.Array] = None,
    normalize: bool = False,
    use_pallas: Optional[bool] = None,
    tile_offsets: Optional[jax.Array] = None,
    pallas_interpret: bool = False,
    layout: str = "nhwc",
    oh_dtype=jnp.bfloat16,
    out_dtype=jnp.float32,
    t_prenormalized: bool = False,
    offsets_kind: str = "tile",
    resize_width_to=None,
    resize_align_corners: bool = True,
    voxel_chunk: Optional[int] = None,
    deint: Optional[bool] = None,
) -> jax.Array:
    """One batched window of struct-of-arrays events -> (B, H, W, C) grids.

    Performance-critical path (runs inside the recurrent scan):
    - SoA (B, N) inputs: a trailing size-4 AoS dim would be lane-padded
      128/4 = 32x by TPU tiling.
    - The whole batch is ONE flat scatter-add with the batch index folded
      into the cell index — measured ~0.1 ms for 8 x 100k events x 8 corners
      on v5e, where a vmapped per-sample scatter took ~9 ms.
    - ``trilinear`` selects the float-coordinate 8-corner kernel (DSEC
      rectified events; integer-coordinate streams use the 2x cheaper
      temporal-bilinear kernel). ``rectify_map`` applies the undistortion
      lookup on-device; NOTE a (B, N) gather costs ~13 ms/window on v5e, so
      production loaders rectify on the host (ess_tpu/data/dsec.py) and this
      stays None.
    """
    b, n = x.shape
    if rectify_map is not None:
        x, y = rectify_events(x, y, rectify_map)
        trilinear = True
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    if use_pallas is None:
        use_pallas = _use_pallas_default()
        if not use_pallas and offsets_kind == "band":
            # Pre-folded (band-offset) batches carry pre-weighted
            # polarities + ghost records that ONLY the fold-free Pallas
            # kernel (voxelize_folded) can consume — on a non-TPU backend
            # (CPU tests, the train CLI run off-chip) auto-resolution runs
            # that kernel in interpret mode instead of falling back to the
            # XLA scatter path, which has no folded decode.
            use_pallas = True
            pallas_interpret = True
    if layout in ("raw", "stack"):
        assert use_pallas and representation == "voxel_grid" and \
            offsets_kind == "band", (
                "raw/stack layouts require the fold-free Pallas "
                "kernel (pre-folded band-offset batches)")
    if use_pallas and representation == "voxel_grid":
        assert rectify_map is None or tile_offsets is None, (
            "host tile offsets were computed on pre-rectification "
            "coordinates; rectify on the host before binning instead")
        band = offsets_kind == "band"
        grid = _voxelize_pallas(
            x, y, t, p, valid, num_bins=num_bins, height=height, width=width,
            separate_pol=separate_pol, trilinear=trilinear,
            tile_offsets=tile_offsets, interpret=pallas_interpret,
            layout=layout, oh_dtype=oh_dtype, out_dtype=out_dtype,
            t_prenormalized=t_prenormalized,
            offsets_kind=offsets_kind,
            # band mode: normalization comes from exact kernel-epilogue
            # stats (no grid-wide stats pass) and the optional width-only
            # resize is one MXU matmul on the band accumulators — both
            # inside voxelize_folded, at sensor res, in the reference's
            # normalize -> crop -> resize order
            normalize=normalize and band,
            resize_width_to=resize_width_to if band else None,
            resize_align_corners=resize_align_corners,
            chunk=voxel_chunk, deint=deint,
        )  # NHWC or s2d blocks
        if normalize and not band:
            flat = grid.reshape(grid.shape[0], 1, -1)
            grid = _normalize_flat(flat).reshape(grid.shape)
        return grid
    assert offsets_kind != "band", (
        "pre-folded (band-offset) events carry pre-weighted polarities; "
        "only the Pallas fold-free kernel consumes them")
    assert layout == "nhwc", "s2d layout requires the Pallas voxelizer"

    pol = jnp.where(p > 0, 1.0, -1.0).astype(jnp.float32)
    cells = height * width

    if representation == "ev_segnet":
        # EV-SegNet 6-channel representation (Alonso & Murillo 2019): per
        # polarity, the per-pixel event count plus mean and std of the
        # normalized timestamps. The reference DECLARES this mode
        # (settings.py:156-157 sets 6 input channels) but its generator
        # returns None (data_util.generate_input_representation); this is a
        # working implementation. Channel order:
        # [cnt+, cnt-, mean_t+, mean_t-, std_t+, std_t-].
        xi = x.astype(jnp.int32)
        yi = y.astype(jnp.int32)
        ok = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) & valid
        tmax = jnp.max(jnp.where(valid, t, -jnp.inf), axis=-1, keepdims=True)
        tmin = jnp.min(jnp.where(valid, t, jnp.inf), axis=-1, keepdims=True)
        tn = (t - tmin) / jnp.maximum(tmax - tmin, 1e-9)  # [0, 1]
        chan = jnp.where(pol > 0, 0, 1)
        boff = (jnp.arange(b, dtype=jnp.int32) * 2 * cells)[:, None]
        idx = jnp.where(ok, boff + chan * cells + yi * width + xi, 0).reshape(-1)

        def scat(vals):
            flat = jnp.zeros((b * 2 * cells,), jnp.float32)
            return flat.at[idx].add(
                jnp.where(ok, vals, 0.0).reshape(-1), mode="drop"
            ).reshape(b, 2, cells)

        cnt = scat(jnp.ones_like(tn))
        s_t = scat(tn)
        s_t2 = scat(tn * tn)
        denom = jnp.maximum(cnt, 1.0)
        mean = s_t / denom
        std = jnp.sqrt(jnp.maximum(s_t2 / denom - mean * mean, 0.0))
        grid = jnp.concatenate([cnt, mean, std], axis=1)  # (B, 6, cells)
        return jnp.moveaxis(grid.reshape(b, 6, height, width), 1, -1)

    if representation == "histogram":
        num_ch = 2
        per_b = num_ch * cells
        xi = x.astype(jnp.int32)
        yi = y.astype(jnp.int32)
        ok = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) & valid
        chan = (pol > 0).astype(jnp.int32)
        boff = (jnp.arange(b, dtype=jnp.int32) * per_b)[:, None]
        idx = jnp.where(ok, boff + chan * cells + yi * width + xi, 0)
        flat = jnp.zeros((b * per_b,), jnp.float32).at[idx.reshape(-1)].add(
            jnp.where(ok, 1.0, 0.0).reshape(-1), mode="drop")
        grid = flat.reshape(b, num_ch, cells)
        return jnp.moveaxis(grid.reshape(b, num_ch, height, width), 1, -1)

    ts = (t.astype(jnp.float32) if t_prenormalized
          else _masked_time_norm(t.astype(jnp.float32), valid, num_bins))
    x0 = x.astype(jnp.int32)
    y0 = y.astype(jnp.int32)
    t0 = ts.astype(jnp.int32)
    num_ch = num_bins * 2 if separate_pol else num_bins
    per_b = num_ch * cells
    boff = (jnp.arange(b, dtype=jnp.int32) * per_b)[:, None]

    idx_list = []
    val_list = []
    if trilinear:
        in_xy = valid  # per-corner bounds checked below
        for dx in (0, 1):
            for dy in (0, 1):
                for dt in (0, 1):
                    xl, yl, tl = x0 + dx, y0 + dy, t0 + dt
                    ok = ((xl >= 0) & (xl < width) & (yl >= 0) & (yl < height)
                          & (tl >= 0) & (tl < num_bins) & in_xy)
                    w = (pol
                         * (1.0 - jnp.abs(xl.astype(jnp.float32) - x))
                         * (1.0 - jnp.abs(yl.astype(jnp.float32) - y))
                         * (1.0 - jnp.abs(tl.astype(jnp.float32) - ts)))
                    idx_list.append(
                        jnp.where(ok, boff + tl * cells + yl * width + xl, 0))
                    val_list.append(jnp.where(ok, w, 0.0))
    else:
        # temporal bilinear: integer pixel, split |pol| between 2 time bins
        in_frame = ((x0 >= 0) & (x0 < width) & (y0 >= 0) & (y0 < height)
                    & (ts >= 0.0) & (ts < num_bins) & valid)
        dts = ts - t0.astype(jnp.float32)
        pix = y0 * width + x0
        if separate_pol:
            chan_off = jnp.where(pol > 0, 0, num_bins * cells).astype(jnp.int32)
            mag = jnp.ones_like(pol)
        else:
            chan_off = jnp.zeros_like(x0)
            mag = pol
        for tl, w in ((t0, mag * (1.0 - dts)), (t0 + 1, mag * dts)):
            ok = in_frame & (tl < num_bins)
            idx_list.append(jnp.where(ok, boff + chan_off + tl * cells + pix, 0))
            val_list.append(jnp.where(ok, w, 0.0))

    idx = jnp.concatenate([i.reshape(-1) for i in idx_list])
    vals = jnp.concatenate([v.reshape(-1) for v in val_list])
    flat = jnp.zeros((b * per_b,), jnp.float32).at[idx].add(vals, mode="drop")
    grid = flat.reshape(b, num_ch, cells)
    if normalize:
        grid = _normalize_flat(grid)
    return jnp.moveaxis(grid.reshape(b, num_ch, height, width), 1, -1)


def voxelize_windows(
    events: jax.Array,
    valid: jax.Array,
    *,
    num_bins: int,
    height: int,
    width: int,
    representation: str = "voxel_grid",
    separate_pol: bool = False,
    trilinear: bool = False,
    rectify_map: Optional[jax.Array] = None,
    normalize: bool = False,
) -> jax.Array:
    """(B, T, N, 4) AoS raw events -> (B, T, H, W, C) NHWC voxel grids.

    Dense convenience wrapper over :func:`voxelize_window_soa` (folds B*T
    into one flat batched scatter). Production training uses the SoA form
    directly inside the recurrent scan instead.
    """
    b, t_dim, n = events.shape[:3]
    flat = lambda a: a.reshape(b * t_dim, n)
    grids = voxelize_window_soa(
        flat(events[..., 0]), flat(events[..., 1]), flat(events[..., 2]),
        flat(events[..., 3]), flat(valid),
        num_bins=num_bins, height=height, width=width,
        representation=representation, separate_pol=separate_pol,
        trilinear=trilinear, rectify_map=rectify_map, normalize=normalize,
    )
    return grids.reshape(b, t_dim, *grids.shape[1:])
