"""Fused Pallas TPU voxelization kernel (tile-binned, MXU scatter).

The hot op of ESS ingest is the trilinear scatter-add of ~100k events x 8
corners per window (DSEC/dataset/representations.py:33-43 semantics). XLA's
TPU scatter executes ~1 update / ~10 ns (serialized), costing ~70 ms per
8-sample window-batch — ~80% of the DSEC train step.

This kernel reformulates the scatter as dense MXU work:

1. Events are pre-binned by spatial tile (tile_h x 128 pixels, tile_h chosen
   per bin count so the accumulator's row axis fills one 128-row MXU tile);
   binning is one fast ``lax.sort`` on-device (~6 ms for 800k events) or
   free on the host during ingest.
2. Every per-event scalar (tile-slot column position, row position, the two
   time-bin scales) is precomputed in ONE fused XLA pass over the flat
   event buffers — in-kernel scalar chains cost lane<->sublane relayouts
   per block that measured ~45 ms/step before this split.
3. One Pallas program per (sample, supertile of K tiles) streams its event
   blocks HBM->VMEM with 4-deep DMA buffering (all four derived fields in
   one contiguous copy).
4. The 8 trilinear corners factor separably: corner rows (t-bin, y) with
   weight pol*wt*wy, corner cols x with weight wx. Each event block builds
   TRANSPOSED tent planes — rows R^T (bins*(tile_h+1), E) and cols C^T
   (K*(128+8), E), events on lanes so the scalar broadcasts are pure
   sublane splats — and accumulates the NT matmul R^T @ C on the MXU (bf16
   operands, f32 accumulation): 8 serial updates/event become fused MACs
   at matmul speed. Events outside a program's supertile (shared border
   blocks, padding) have a column position outside its slot range or zero
   scales, so their tent column or row is identically zero and they
   contribute nothing — no masking needed in the kernel.
5. Tiles carry a +1 halo row/col (corners crossing a tile edge); a cheap
   dense XLA pass folds halos into neighbouring tiles afterwards (optionally
   emitting the space-to-depth block layout the E2VID model consumes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_W = 128
CHUNK = 1024      # events per DMA block (sweep-tuned on v5e; 512-2048 are
                  # within noise of each other now that the kernel is pure
                  # plane-construction + MXU work)
FOLDED_CHUNK = 1024   # slotted fold-free kernel block: per-(band, x-slot)
                      # groups average ~1.1k events at DSEC scale, so the
                      # tail/boundary fill loss depends on this — sweep via
                      # PipelineConfig.voxel_chunk before changing (v5e
                      # full-step: 1024/768/512 within noise, 256 regresses)
FOLDED_BAND_PACK = 4  # consecutive bands per slotted-kernel program (cap;
                      # the largest divisor of n_bands <= this is used) —
                      # amortizes per-program fixed cost over more work.
                      # v5e full-step sweep (r5): 1/2/4/5/10 -> 727.1/730.3/
                      # 732.0/731.5/731.9 w/s; 4 is the knee
K_TILES = 5       # max spatial tiles per program (sweep-tuned on v5e)
COL_SLOT = TILE_W + 8   # per-tile column slot in the accumulator (128+halo+pad)


def tile_h_for_bins(bins: int) -> int:
    """Tile height such that the accumulator rows bins*(tile_h+1) fill (but
    never exceed) one 128-row MXU tile. Even, clamped to [4, 64]."""
    th = 128 // bins - 1
    th -= th % 2
    return max(4, min(th, 64))


def _row_pad(bins: int, tile_h: int) -> int:
    rows = bins * (tile_h + 1)
    return ((rows + 7) // 8) * 8


def _pick_k(n_tiles: int, k_max: int) -> int:
    return next(k for k in range(min(k_max, n_tiles), 0, -1)
                if n_tiles % k == 0)


def tile_id(x, y, width: int, tile_h: int) -> jax.Array:
    """Spatial tile index of an event's (truncated) coordinate. Coordinates
    in (-1, 0) truncate to 0 and land in the first tile row/col — their
    out-of-frame corner has no representable column/row and drops, the
    in-frame corner deposits its bilinear weight."""
    tiles_x = width // TILE_W
    tx = jnp.clip(x.astype(jnp.int32) // TILE_W, 0, tiles_x - 1)
    ty = jnp.clip(y.astype(jnp.int32) // tile_h, 0, None)
    return ty * tiles_x + tx


def bin_events_device(
    x: jax.Array, y: jax.Array, ts: jax.Array, pol: jax.Array,
    valid: jax.Array, *, height: int, width: int, bins: int,
) -> Tuple[jax.Array, ...]:
    """Sort one sample's events by spatial tile on-device.

    Invalid events sort to the end (tile id = n_tiles). Returns sorted
    (x, y, ts, pol) and the (n_tiles + 1,) int32 offsets array.
    """
    th = tile_h_for_bins(bins)
    n_tiles = (height // th) * (width // TILE_W)
    tid = jnp.where(valid, tile_id(x, y, width, th), n_tiles)
    tid, xs, ys, tss, ps = jax.lax.sort(
        (tid, x, y, ts, pol), num_keys=1)
    offsets = jnp.searchsorted(
        tid, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return xs, ys, tss, ps, offsets


def host_tile_bin(raw_windows, valid, *, height: int, width: int,
                  bins: int = 5):
    """Host-side tile binning of (T, N, 4) raw windows for the kernel.

    Sorts each window's VALID in-frame events (coordinates in (-1, width/
    height): border events with one in-frame corner are kept) by
    ``tile_id`` on the padded
    (kernel-aligned) grid and returns (raw_sorted, valid_sorted, offsets)
    with offsets of shape (T, n_tiles + 1) int32. ``bins`` is the kernel's
    EFFECTIVE bin count (2*num_bins for separate_pol temporal grids) — it
    fixes the tile height, so it must match the device-side kernel config.
    Runs in loader worker threads, overlapped with device compute — this
    removes the on-device ``lax.sort`` (~5 ms/window-batch) from the train
    step. Uses the native C++ counting sort (native/ess_host.cpp
    tile_bin_f32, ~15x the numpy argsort loop) when available.
    """
    import numpy as np

    th = tile_h_for_bins(bins)

    from ess_tpu.data import native
    got = native.tile_bin(raw_windows, valid, height=height, width=width,
                          tile_h=th, tile_w=TILE_W)
    if got is not None:
        return got

    hp = ((height + th - 1) // th) * th
    wp = ((width + TILE_W - 1) // TILE_W) * TILE_W
    ntx = wp // TILE_W
    n_tiles = (hp // th) * ntx

    t_dim, n = raw_windows.shape[:2]
    out = np.zeros_like(raw_windows)
    out_valid = np.zeros_like(valid)
    offsets = np.zeros((t_dim, n_tiles + 1), np.int32)
    for i in range(t_dim):
        w = raw_windows[i]
        ok = (valid[i] & (w[:, 0] > -1) & (w[:, 0] < width)
              & (w[:, 1] > -1) & (w[:, 1] < height))
        ev = w[ok]
        tx = np.clip(ev[:, 0].astype(np.int64) // TILE_W, 0, ntx - 1)
        ty = ev[:, 1].astype(np.int64) // th
        tid = ty * ntx + tx
        order = np.argsort(tid, kind="stable")
        m = len(ev)
        out[i, :m] = ev[order]
        out_valid[i, :m] = True
        offsets[i] = np.searchsorted(
            tid[order], np.arange(n_tiles + 1)).astype(np.int32)
    return out, out_valid, offsets


N_BUF = 4         # DMA buffer depth (prefetch distance N_BUF - 1 hides the
                  # per-block DMA latency behind the plane construction)


INT8_SCALE = 127.0   # per-plane quantization scale of the int8 MXU path


def _row_plane(p0, s0, s1, tent_iota, *, bins: int, row_gap: int,
               rows: int, chunk: int):
    """(1, chunk) event fields -> (rows, chunk) f32 row tent plane, built
    FACTORED: one (row_gap, chunk) spatial tent + per-bin lane scales.

    p0 = c0 * row_gap + yl with the tent of yl confined to its own
    row_gap-row slab (the host pre-fold / wy_fold guarantee that nothing
    crosses a row block), so the plane is exactly ``bins`` stacked slabs:
    slab c = tent(yl) * (s0 where c == c0, s1 where c == c0 + 1, else 0).
    Identical values to the two-tent tall expression
    ``s0*max(0,1-|d0|) + s1*max(0,1-|d0-row_gap|)`` — row r = c*G + q has
    |r - p0| = |(c-c0)*G + q - yl| which is >= 1 unless c == c0 (then
    q - yl), and similarly for the second tent — but the VPU builds
    row_gap rows once instead of evaluating ~11 passes over all
    ``rows``: ~6x less plane work per chunk at the DSEC shape (G=24,
    rows=120). Requires row_gap % 8 == 0 (slab concat stays on sublane
    tile boundaries); callers fall back to the tall form otherwise.
    """
    inv_g = 1.0 / row_gap
    c0 = jnp.floor((p0 + 0.5) * inv_g)          # exact: yl <= row_gap - 1
    yl = p0 - c0 * row_gap
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(tent_iota - yl))
    slabs = []
    for c in range(bins):
        tc = (jnp.where(c0 == c, s0, 0.0)
              + (jnp.where(c0 == c - 1, s1, 0.0) if c else 0.0))
        slabs.append(tent * tc)
    if rows > bins * row_gap:
        slabs.append(jnp.zeros((rows - bins * row_gap, chunk), jnp.float32))
    return jnp.concatenate(slabs, axis=0)


def _kernel(offs_ref, ev_ref, *refs,
            bins: int, row_gap: int, rows: int, k_tiles: int,
            col_slot: int, chunk: int, oh_dtype,
            stats_rows: int = 0):
    """Shared tent-plane MXU accumulator for both kernel modes.

    Halo mode (voxelize_tiled): row_gap = tile_h + 1 (each bin's block
    carries a +1 halo row), col_slot = COL_SLOT (128 + halo + pad), k_tiles
    spatial tiles per program.

    Pre-folded mode (voxelize_folded): row_gap = tile_h (gap-free rows —
    the host rewrote boundary events so nothing ever crosses a row block),
    col_slot = padded sensor width, k_tiles = 1 (one program per row band,
    columns ARE global x) — the accumulator IS the output grid. With
    ``stats_rows`` > 0 a second output receives this program's exact
    normalization partials (sum, sum of squares, nonzero count over the
    first stats_rows rows AS THE CONSUMER SEES THEM, i.e. after the
    out-dtype cast) — the accumulator is final in this mode, so the
    post-kernel stats pass over the whole grid disappears.
    """
    if stats_rows:
        out_ref, stats_ref, buf, sems = refs
    else:
        out_ref, buf, sems = refs
    b = pl.program_id(0)
    sup = pl.program_id(1)
    tid0 = sup * k_tiles

    start = offs_ref[b, tid0]
    end = offs_ref[b, tid0 + k_tiles]
    size = end - start

    cols = k_tiles * col_slot
    acc0 = jnp.zeros((rows, cols), jnp.float32)

    # int8 path: both tent planes quantize to [-127, 127] (the ROW plane's
    # x127 rides the precomputed s0/s1 scales; the COL plane's rides the
    # iota/cx scaling below, making the tent slope 127/column), the MXU
    # runs at its double int8 rate with exact int32 accumulation, and one
    # 1/127^2 rescale folds into the f32 accumulator add.
    quant = oh_dtype == jnp.int8
    plane_scale = INT8_SCALE if quant else 1.0

    # Planes are built TRANSPOSED (events on lanes): the per-event fields
    # arrive lane-major from the DMA and broadcast down sublanes with no
    # relayout. Float iotas hoisted out of the block loop (Mosaic's
    # tpu.iota is integer-only; an in-loop convert costs a VPU pass). The
    # col iota carries the supertile's global slot base: foreign events'
    # cx falls outside [tid0*COL_SLOT, tid0*COL_SLOT + cols) so their tent
    # column is identically zero — no in-range masking anywhere.
    col_iota_s = ((jax.lax.broadcasted_iota(jnp.int32, (cols, chunk), 0)
                   + tid0 * col_slot).astype(jnp.float32) * plane_scale)
    factored = row_gap % 8 == 0
    row_iota_f = jax.lax.broadcasted_iota(
        jnp.int32, (row_gap if factored else rows, chunk), 0
    ).astype(jnp.float32)

    first_blk = start // chunk
    last_blk = jnp.maximum(end - 1, start) // chunk
    nblocks = jnp.where(size > 0, last_blk - first_blk + 1, 0)

    def dma(blk_i, slot):
        # one contiguous (4, chunk) block: derived fields interleaved at
        # chunk granularity on the device side (voxelize_tiled), so each
        # block is a single 16*chunk-byte linear DMA
        return pltpu.make_async_copy(
            ev_ref.at[b, first_blk + blk_i], buf.at[slot], sems.at[slot])

    for d in range(N_BUF - 1):
        @pl.when(d < nblocks)
        def _(d=d):
            dma(d, d).start()

    def chunk_body(ci, acc):
        slot = ci % N_BUF

        @pl.when(ci + N_BUF - 1 < nblocks)
        def _():
            dma(ci + N_BUF - 1, (ci + N_BUF - 1) % N_BUF).start()

        dma(ci, slot).wait()

        cx = buf[slot, 0][None, :]   # global slot-column position (frac=wx)
        p0 = buf[slot, 1][None, :]   # row position in bin c0 (frac=wy)
        s0 = buf[slot, 2][None, :]   # pol * (1 - wt)
        s1 = buf[slot, 3][None, :]   # pol * wt

        # Both planes are tents: weight at position q is
        # max(0, 1 - |q - p|) for the two neighbouring integer positions —
        # exactly the bilinear split. The second time bin's row block
        # starts exactly row_gap rows below the first, so one subtraction
        # feeds both row tents. A bin falling outside [0, bins) lands in
        # the padded row range (>= bins*row_gap), which the consumer
        # slices away (its scale is zero anyway).
        ohc_t = jnp.maximum(0.0, plane_scale - jnp.abs(col_iota_s - cx))
        if factored:
            ohr_t = _row_plane(p0, s0, s1, row_iota_f, bins=bins,
                               row_gap=row_gap, rows=rows, chunk=chunk)
        else:
            d0 = row_iota_f - p0
            ohr_t = (s0 * jnp.maximum(0.0, 1.0 - jnp.abs(d0))
                     + s1 * jnp.maximum(0.0, 1.0 - jnp.abs(d0 - row_gap)))

        if quant:
            prod = jax.lax.dot_general(
                jnp.round(ohr_t).astype(jnp.int8),
                jnp.round(ohc_t).astype(jnp.int8),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc + prod.astype(jnp.float32) * (
                1.0 / (INT8_SCALE * INT8_SCALE))
        return acc + jax.lax.dot_general(
            ohr_t.astype(oh_dtype), ohc_t.astype(oh_dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, nblocks, chunk_body, acc0)
    g = acc.astype(out_ref.dtype)
    out_ref[0, 0] = g
    if stats_rows:
        gv = g[:stats_rows].astype(jnp.float32)
        s_sum = jnp.sum(gv)
        s_sq = jnp.sum(gv * gv)
        s_nz = jnp.sum((gv != 0).astype(jnp.float32))
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        stats_ref[0, 0] = (s_sum * (lane == 0) + s_sq * (lane == 1)
                           + s_nz * (lane == 2)).astype(jnp.float32)


def _kernel_slotted(offs_ref, ev_ref, *refs,
                    bins: int, row_gap: int, rows: int, n_sub: int,
                    slot_w: int, width_total: int, chunk: int, oh_dtype,
                    stats_rows: int = 0, n_pack: int = 1,
                    deint: bool = False, stack_out: bool = False):
    """Pre-folded mode with per-x-slot dots (host_band_bin_folded
    x_slots=True).

    Same accumulator-is-the-grid contract as the pre-folded branch of
    :func:`_kernel`, but events arrive sub-sorted by (band, x-slot) with
    slot-boundary crossings host-ghosted, so each slot's events dot
    against ONLY its TILE_W columns: the per-chunk matmul shrinks from
    (rows, chunk) x (chunk, padded_width) to (rows, chunk) x
    (chunk, TILE_W) — 5x fewer MXU FLOPs and ~5x less column-plane VPU
    work at the DSEC shape (the dot was ~13 ms of the 26 ms kernel).
    Chunks straddling a slot boundary are DMA'd (and their row plane
    rebuilt) once per touching slot — foreign events zero out through the
    globally-unique column positions exactly as in the halo kernel.

    ``n_pack`` packs several consecutive bands into one grid program
    (output block (1, n_pack, rows, width)): the per-program fixed cost
    (grid dispatch, iota materialization, output flush) amortizes over
    n_pack bands — at the DSEC shape the grid is (160, 20) = 3200
    programs per step, so fixed overhead is a measurable slice of the
    ~19 ms kernel.

    ``stack_out``: emit the space-to-depth NCHW stack DIRECTLY — the
    output ref is (1, 4*bins, n_pack, th/2, width/2) and each slot's
    accumulator is stored as 4*bins (th/2, slot_w/2) pieces at its
    64-lane-aligned column range, using the de-interleaved iotas (so
    the pieces are contiguous slab/lane-half slices of the accumulator,
    pure register moves). The builder-side reshape/transpose/copy chain
    (~13.7 ms at DSEC step scale) never runs; normalization and the
    flip draw defer to the consumer's per-window elementwise map.
    """
    if stats_rows:
        out_ref, stats_ref, buf, sems = refs
    else:
        out_ref, buf, sems = refs
    b = pl.program_id(0)
    band0 = pl.program_id(1) * n_pack

    quant = oh_dtype == jnp.int8
    plane_scale = INT8_SCALE if quant else 1.0
    factored = row_gap % 8 == 0
    # ``deint``: permute the hoisted position iotas so the accumulator
    # comes out space-to-depth DE-INTERLEAVED — column position i holds x
    # value 2i (i < slot_w/2) or 2(i-slot_w/2)+1, row position q' in a bin
    # slab holds y value 2*(q' mod th/2) + q' div (th/2). The tent planes
    # compare VALUES, so this is a pure output permutation at zero
    # per-chunk cost; the consumer's s2d layout transform then moves only
    # coarse sublane/64-lane blocks instead of de-interleaving every other
    # lane/row (the ~10 ms reshape/transpose/copy chain at DSEC scale).
    deint = deint or stack_out
    ci = jax.lax.broadcasted_iota(jnp.int32, (slot_w, chunk), 0)
    if deint:
        assert factored and row_gap % 2 == 0, (row_gap, deint)
        ci = 2 * ci - (slot_w - 1) * (ci >= slot_w // 2).astype(jnp.int32)
    col_iota0 = ci.astype(jnp.float32) * plane_scale
    ri = jax.lax.broadcasted_iota(
        jnp.int32, (row_gap if factored else rows, chunk), 0)
    if deint:
        half = row_gap // 2
        ri = 2 * (ri % half) + ri // half
    row_iota_f = ri.astype(jnp.float32)

    # per-(band, slot) DMA state: each group owns a private 2-deep ring
    # and its FIRST chunk's DMA is issued before ANY group computes — the
    # first wait of group q then overlaps groups 0..q-1's plane/dot work
    # (a shared sequential ring stalled ~n_sub DMA latencies per program,
    # which ate most of the dot savings — measured +7 w/s vs +30 expected)
    slot_meta = []
    for q in range(n_pack * n_sub):
        start = offs_ref[b, band0 * n_sub + q]
        end = offs_ref[b, band0 * n_sub + q + 1]
        size = end - start
        first_blk = start // chunk
        last_blk = jnp.maximum(end - 1, start) // chunk
        nblocks = jnp.where(size > 0, last_blk - first_blk + 1, 0)
        slot_meta.append((first_blk, nblocks))

    def dma(q, blk_i, ring):
        first_blk = slot_meta[q][0]
        return pltpu.make_async_copy(
            ev_ref.at[b, first_blk + blk_i], buf.at[q, ring],
            sems.at[q, ring])

    for q in range(n_pack * n_sub):
        @pl.when(0 < slot_meta[q][1])
        def _(q=q):
            dma(q, 0, 0).start()

    for jb in range(n_pack):
        band = band0 + jb
        s_sum = jnp.float32(0.0)
        s_sq = jnp.float32(0.0)
        s_nz = jnp.float32(0.0)
        for xb in range(n_sub):  # static: one chunk loop + acc slab per slot
            q = jb * n_sub + xb
            nblocks = slot_meta[q][1]
            # this group's global column base (cx = band * width_total + x)
            base = ((band * width_total + xb * slot_w).astype(jnp.float32)
                    * plane_scale)
            col_iota_s = col_iota0 + base

            def chunk_body(ci, acc, q=q, nblocks=nblocks,
                           col_iota_s=col_iota_s):
                slot = ci % 2

                @pl.when(ci + 1 < nblocks)
                def _():
                    dma(q, ci + 1, (ci + 1) % 2).start()

                dma(q, ci, slot).wait()
                cx = buf[q, slot, 0][None, :]
                p0 = buf[q, slot, 1][None, :]
                s0 = buf[q, slot, 2][None, :]
                s1 = buf[q, slot, 3][None, :]
                ohc_t = jnp.maximum(0.0,
                                    plane_scale - jnp.abs(col_iota_s - cx))
                if factored:
                    ohr_t = _row_plane(p0, s0, s1, row_iota_f, bins=bins,
                                       row_gap=row_gap, rows=rows,
                                       chunk=chunk)
                else:
                    d0 = row_iota_f - p0
                    ohr_t = (s0 * jnp.maximum(0.0, 1.0 - jnp.abs(d0))
                             + s1 * jnp.maximum(
                                 0.0, 1.0 - jnp.abs(d0 - row_gap)))
                if quant:
                    prod = jax.lax.dot_general(
                        jnp.round(ohr_t).astype(jnp.int8),
                        jnp.round(ohc_t).astype(jnp.int8),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    return acc + prod.astype(jnp.float32) * (
                        1.0 / (INT8_SCALE * INT8_SCALE))
                return acc + jax.lax.dot_general(
                    ohr_t.astype(oh_dtype), ohc_t.astype(oh_dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                0, nblocks, chunk_body,
                jnp.zeros((rows, slot_w), jnp.float32))
            g = acc.astype(out_ref.dtype)
            if stack_out:
                # de-interleaved accumulator -> s2d NCHW pieces: slab
                # rows are (py, yh)-ordered and lanes (px, xh)-ordered,
                # so every channel piece is a contiguous (th/2, sw2)
                # slice stored at this slot's 64-lane-aligned range
                half = row_gap // 2
                sw2 = slot_w // 2
                for c_bin in range(bins):
                    for py in range(2):
                        sub = g[c_bin * row_gap + py * half:
                                c_bin * row_gap + (py + 1) * half]
                        for px in range(2):
                            c_idx = (py * 2 + px) * bins + c_bin
                            out_ref[0, c_idx, jb, :,
                                    xb * sw2:(xb + 1) * sw2] = (
                                sub[:, px * sw2:(px + 1) * sw2])
            else:
                out_ref[0, jb, :, xb * slot_w:(xb + 1) * slot_w] = g
            if stats_rows:
                gv = g[:stats_rows].astype(jnp.float32)
                s_sum = s_sum + jnp.sum(gv)
                s_sq = s_sq + jnp.sum(gv * gv)
                s_nz = s_nz + jnp.sum((gv != 0).astype(jnp.float32))
        if stats_rows:
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            stats_ref[0, jb] = (s_sum * (lane == 0) + s_sq * (lane == 1)
                                + s_nz * (lane == 2)).astype(jnp.float32)


def voxelize_tiled(
    x: jax.Array, y: jax.Array, ts: jax.Array, pol: jax.Array,
    offsets: jax.Array, *, bins: int, height: int, width: int,
    interpret: bool = False, oh_dtype=jnp.bfloat16, layout: str = "nchw",
    k_tiles: Optional[int] = None, chunk: int = CHUNK,
    out_dtype=jnp.float32,
) -> jax.Array:
    """(B, N) tile-sorted events + (B, n_tiles+1) offsets -> voxel grids.

    ``ts`` is the normalized time in [0, bins-1]; ``pol`` the signed value
    (+-1, zeroed for invalid events); events must be sorted by ``tile_id``
    with ``offsets`` delimiting each tile's slice.

    ``layout``: 'nchw' -> (B, bins, H, W); 'nhwc' -> (B, H, W, bins);
    's2d' -> (B, H/2, W/2, 4*bins) space-to-depth blocks (ops/conv_s2d.py
    channel order), skipping the full-resolution grid entirely.

    ``oh_dtype``: dtype of the tent-plane matmul operands. bf16 (default)
    runs the MXU at full rate; per-corner weights round to 8-bit mantissa
    (~0.4% relative) with exact f32 accumulation. Pass jnp.float32 for
    bit-parity with the scatter reference. Pass jnp.int8 for the
    DOUBLE-rate int8 MXU path: each tent factor quantizes to 1/127 steps
    (round-to-nearest; |error| per corner weight <= (w_r + w_c)/254 ~
    0.8% absolute worst-case) with exact int32 accumulation and a single
    f32 rescale per chunk — halves the kernel's dominant dot cost.

    ``out_dtype``: dtype of the tile accumulators written back to HBM (the
    in-VMEM accumulation is always f32). bf16 halves the halo-fold pass's
    HBM traffic — use it when the consumer is a bf16 model anyway.
    """
    b, n = x.shape
    tile_h = tile_h_for_bins(bins)
    assert height % tile_h == 0 and width % TILE_W == 0, (height, width)
    n_tiles = (height // tile_h) * (width // TILE_W)
    k = k_tiles if k_tiles is not None else _pick_k(n_tiles, K_TILES)
    assert n_tiles % k == 0, (n_tiles, k)
    rows = _row_pad(bins, tile_h)
    cols = k * COL_SLOT
    n_pad = ((n + chunk - 1) // chunk) * chunk
    nb = n_pad // chunk

    # One fused XLA pass computes every per-event derived quantity the
    # kernel needs (scalar chains inside the kernel cost lane<->sublane
    # relayouts per block — measured ~45 ms/step at DSEC scale):
    #   cx = global slot-column position (tile id * COL_SLOT + local x)
    #   p0 = row position in time-bin c0 (c0 * (tile_h+1) + local y)
    #   s0, s1 = the two time-bin scales pol*(1-wt), pol*wt
    # Invalid events carry pol == 0 and chunk padding is all-zero — both
    # make s0 = s1 = 0, i.e. a zero row tent: no contribution.
    n_tiles_x = width // TILE_W
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    ts = ts.astype(jnp.float32)
    tx = jnp.clip(jnp.floor(x).astype(jnp.int32) // TILE_W, 0, n_tiles_x - 1)
    ty = jnp.clip(jnp.floor(y).astype(jnp.int32) // tile_h, 0, None)
    tid = ty * n_tiles_x + tx
    c0 = jnp.floor(ts)
    wt1 = ts - c0
    # x in (-1, 0) needs no special care: its tent position sits one column
    # left of the tile slot, whose only in-range neighbour is column 0 with
    # the correct weight 1+x (the slot pad columns soak the other side).
    # y in (-1, 0) WOULD spill into the previous time-bin's halo row, so the
    # single in-frame row weight (1+y) folds into the scales instead.
    yl = y - (ty * tile_h).astype(jnp.float32)
    wy_fold = jnp.where(yl < 0, 1.0 + yl, 1.0)
    yl = jnp.maximum(yl, 0.0)
    cx = tid.astype(jnp.float32) * COL_SLOT + (x - (tx * TILE_W).astype(jnp.float32))
    p0 = c0 * (tile_h + 1) + yl
    s0 = pol.astype(jnp.float32) * (1.0 - wt1) * wy_fold
    s1 = pol.astype(jnp.float32) * wt1 * wy_fold
    if oh_dtype == jnp.int8:
        # int8 quantization scales ride the prepass for free: the kernel's
        # scaled col iota needs cx in the same x127 space, and the x127 row
        # -plane scale folds into s0/s1 (see _kernel's `quant` branch)
        cx = cx * INT8_SCALE
        s0 = s0 * INT8_SCALE
        s1 = s1 * INT8_SCALE

    # (B, n_blocks, 4, chunk): fields interleaved per block so each kernel
    # DMA is one contiguous 16*chunk-byte copy
    ev = jnp.stack([
        jnp.pad(a, ((0, 0), (0, n_pad - n))).reshape(b, nb, chunk)
        for a in (cx, p0, s0, s1)
    ], axis=2)

    grid = (b, n_tiles // k)
    out = pl.pallas_call(
        functools.partial(_kernel, bins=bins, row_gap=tile_h + 1, rows=rows,
                          k_tiles=k, col_slot=COL_SLOT, chunk=chunk,
                          oh_dtype=oh_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (1, 1, rows, cols), lambda b_, t_, offs: (b_, t_, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((N_BUF, 4, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((N_BUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_tiles // k, rows, cols), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(offsets, ev)

    if layout == "s4d":
        if k == width // TILE_W and tile_h % 4 == 0:
            return _fold_halo_s4d_mxu(out, bins=bins, tile_h=tile_h,
                                      height=height, width=width)
        from ess_tpu.ops.conv_s2d import space_to_depth4
        nhwc = _fold_halo_nhwc(out, bins=bins, tile_h=tile_h,
                               height=height, width=width)
        if height % 4:
            # the tile_h-padded kernel height need not be 4-aligned; pad
            # zero rows so s2d blocking is legal — the caller crops to the
            # (4-aligned) sensor height in block space, so pad rows never
            # surface (width is always 128-aligned, hence 4-aligned)
            nhwc = jnp.pad(nhwc, ((0, 0), (0, 4 - height % 4),
                                  (0, 0), (0, 0)))
        return space_to_depth4(nhwc)
    if layout == "s2d":
        if k == width // TILE_W and tile_h % 2 == 0:
            return _fold_halo_s2d_mxu(out, bins=bins, tile_h=tile_h,
                                      height=height, width=width)
        return _fold_halo_s2d(out, bins=bins, tile_h=tile_h,
                              height=height, width=width)
    if layout == "nhwc":
        return _fold_halo_nhwc(out, bins=bins, tile_h=tile_h,
                               height=height, width=width)
    return _fold_halo(out, bins=bins, tile_h=tile_h,
                      height=height, width=width)


def _tiles_to_blocks(tiles: jax.Array, *, bins: int, tile_h: int,
                     height: int, width: int):
    """(B, n_super, rows_pad, K*COL_SLOT) accumulators -> halo-folded
    (b, n_ty, n_tx, bins, tile_h, TILE_W) core blocks (each tile's +1 halo
    row/col added into the neighbour below/right)."""
    b = tiles.shape[0]
    th, tw = tile_h, TILE_W
    n_ty, n_tx = height // th, width // tw
    t = tiles.reshape(b, -1, tiles.shape[2], tiles.shape[3] // COL_SLOT,
                      COL_SLOT)
    t = jnp.moveaxis(t, 3, 2)                    # (b, n_super, K, rows, slot)
    t = t.reshape(b, n_ty, n_tx, tiles.shape[2], COL_SLOT)
    t = t[:, :, :, : bins * (th + 1), : tw + 1]
    t = t.reshape(b, n_ty, n_tx, bins, th + 1, tw + 1)
    core = t[..., :th, :tw]
    halo_y = t[..., th, :tw]
    halo_x = t[..., :th, tw]
    halo_yx = t[..., th, tw]
    full = core
    full = full.at[:, 1:, :, :, 0, :].add(halo_y[:, :-1])
    full = full.at[:, :, 1:, :, :, 0].add(halo_x[:, :, :-1])
    full = full.at[:, 1:, 1:, :, 0, 0].add(halo_yx[:, :-1, :-1])
    return full


def _fold_halo(tiles: jax.Array, *, bins: int, tile_h: int,
               height: int, width: int) -> jax.Array:
    """Fold tile halos and emit (B, bins, H, W).

    Each tile slot holds (tile_h+1) rows x (TILE_W+1) cols per bin; the +1
    halo row/col belongs to the neighbouring tile below/right.
    """
    full = _tiles_to_blocks(
        tiles, bins=bins, tile_h=tile_h, height=height, width=width)
    b = tiles.shape[0]
    full = jnp.moveaxis(full, 3, 1)               # (b, bins, ty, tx, th, tw)
    full = jnp.moveaxis(full, 4, 3)               # (b, bins, ty, th, tx, tw)
    return full.reshape(b, bins, height, width)


def _fold_halo_nhwc(tiles: jax.Array, *, bins: int, tile_h: int,
                    height: int, width: int) -> jax.Array:
    """Like :func:`_fold_halo` but emits (B, H, W, bins) directly — the model
    consumes NHWC, so folding straight to it saves one full-grid transpose
    pass per window."""
    full = _tiles_to_blocks(
        tiles, bins=bins, tile_h=tile_h, height=height, width=width)
    b = tiles.shape[0]
    full = jnp.transpose(full, (0, 1, 4, 2, 5, 3))  # (b, ty, th, tx, tw, bins)
    return full.reshape(b, height, width, bins)


@functools.lru_cache(maxsize=None)
def _fold_matrices(bins: int, tile_h: int, n_tx: int):
    """Constant 0/1 selection matrices expressing the halo fold as matmuls.

    Row map A: out row p = c*tile_h + yy <- core row c*(tile_h+1) + yy;
    A_h routes the UP supertile's bottom-halo rows (yy == tile_h) into
    yy == 0. Col map B: compacts each COL_SLOT to TILE_W columns AND routes
    the right-halo col of slot j into col 0 of slot j+1 — so the entire
    fold (incl. the corner term, which is A_h x halo-col of B) is
    OUT = A @ own @ B + A_h @ up @ B: two MXU matmuls instead of a chain
    of relayout copies. Measured on v5e at DSEC step-batch scale: fused
    with the normalize pass 24.7 -> 23.7 ms (fold-only it's actually
    slower, 22.7 vs 19.8 — the win only appears when XLA overlaps the
    matmuls with the normalize reduction); end-to-end bench 606 -> 613
    windows/s. The remaining ~20 ms is dominated by the lane-padded
    (..., 4*bins=20) s2d output layout, not the fold arithmetic.
    """
    import numpy as np
    th = tile_h
    rows = bins * (th + 1)
    A = np.zeros((bins * th, rows), np.float32)
    Ah = np.zeros((bins * th, rows), np.float32)
    for c in range(bins):
        for yy in range(th):
            A[c * th + yy, c * (th + 1) + yy] = 1.0
        Ah[c * th, c * (th + 1) + th] = 1.0
    B = np.zeros((n_tx * COL_SLOT, n_tx * TILE_W), np.float32)
    for j in range(n_tx):
        for xx in range(TILE_W):
            B[j * COL_SLOT + xx, j * TILE_W + xx] = 1.0
        if j + 1 < n_tx:
            B[j * COL_SLOT + TILE_W, (j + 1) * TILE_W] = 1.0
    return A, Ah, B


def _fold_halo_blocked_mxu(tiles: jax.Array, *, bins: int, tile_h: int,
                           height: int, width: int,
                           block: int) -> jax.Array:
    """Halo fold + ``block`` x ``block`` space-to-depth via batched selection
    matmuls (see _fold_matrices): the fold is linear, so the MXU applies it
    at matmul speed with exact f32 accumulation; one final transpose emits
    the blocked channel order (r*block + s)*bins + c. block=2 feeds the s2d
    head conv; block=4 is the quad-block rollout's window layout, whose
    wider 16*bins channel tail also quarters the lane-padding waste of the
    (…, 4*bins) s2d form (20 -> 128 pad vs 80 -> 128 on v5e tiling)."""
    b, n_ty = tiles.shape[:2]
    th, tw = tile_h, TILE_W
    n_tx = width // tw
    A, Ah, B = _fold_matrices(bins, tile_h, n_tx)
    dt = tiles.dtype
    A = jnp.asarray(A, dt)
    Ah = jnp.asarray(Ah, dt)
    B = jnp.asarray(B, dt)
    rows = bins * (th + 1)
    own = tiles[:, :, :rows]
    up = jnp.pad(own[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    # NOTE: the f32 accumulator stays f32 through the first transpose step
    # on purpose — XLA fuses the normalize-stats reduce into that pass;
    # casting to bf16 right here measured 621 -> 614 windows/s end-to-end
    # (it breaks the stats fusion and adds a pass).
    out = (jnp.einsum("pr,btrc,cq->btpq", A, own, B,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("pr,btrc,cq->btpq", Ah, up, B,
                        preferred_element_type=jnp.float32))
    # (b, ty, c*th + blk*hh + r, blk*(tx*tw/blk + ww) + s) -> blocked s2d
    blk = block
    out = out.reshape(b, n_ty, bins, th // blk, blk, width // blk, blk)
    out = jnp.transpose(out, (0, 1, 3, 5, 4, 6, 2))
    return out.reshape(b, height // blk, width // blk,
                       blk * blk * bins).astype(dt)


def _fold_halo_s2d_mxu(tiles, *, bins, tile_h, height, width):
    return _fold_halo_blocked_mxu(tiles, bins=bins, tile_h=tile_h,
                                  height=height, width=width, block=2)


def _fold_halo_s4d_mxu(tiles, *, bins, tile_h, height, width):
    return _fold_halo_blocked_mxu(tiles, bins=bins, tile_h=tile_h,
                                  height=height, width=width, block=4)


def _fold_halo_s2d_v2(tiles: jax.Array, *, bins: int, tile_h: int,
                      height: int, width: int) -> jax.Array:
    """XLA s2d fold, restructured: halo adds happen in the accumulator's
    NATIVE layout (shift-pad-add, no transposes), then ONE transpose emits
    the s2d blocks — vs the _tiles_to_blocks chain whose early moveaxis
    forces several full-size relayout copies."""
    b = tiles.shape[0]
    th, tw = tile_h, TILE_W
    n_ty, n_tx = height // th, width // tw
    used = bins * (th + 1)
    t = tiles[:, :, :used].reshape(b, n_ty, bins, th + 1, n_tx, COL_SLOT)

    core = t[:, :, :, :th, :, :tw]             # (b, ty, bins, th, tx, tw)
    # right-halo col of slot j -> col 0 of slot j+1 (same tile row)
    hx = t[:, :, :, :th, :-1, tw]
    core = core + jnp.pad(
        hx[..., None], ((0, 0),) * 4 + ((1, 0), (0, tw - 1)))
    # bottom-halo row of tile row ty-1 (+ its corner) -> row 0 of ty
    hy = t[:, :-1, :, th, :, :tw]              # (b, ty-1, bins, tx, tw)
    hc = t[:, :-1, :, th, :-1, tw]
    hy = hy + jnp.pad(hc[..., None], ((0, 0),) * 3 + ((1, 0), (0, tw - 1)))
    core = core + jnp.pad(
        hy[:, :, :, None], ((0, 0), (1, 0), (0, 0), (0, th - 1),
                            (0, 0), (0, 0)))

    core = core.reshape(b, n_ty, bins, th // 2, 2, n_tx, tw // 2, 2)
    core = jnp.transpose(core, (0, 1, 3, 5, 6, 4, 7, 2))
    return core.reshape(b, height // 2, width // 2, 4 * bins)


def _fold_halo_s2d(tiles: jax.Array, *, bins: int, tile_h: int,
                   height: int, width: int) -> jax.Array:
    """Fold halos straight into the space-to-depth block layout
    (B, H/2, W/2, 4*bins), channel = (r*2 + s)*bins + c — exactly
    ops.conv_s2d.space_to_depth of the NHWC grid, without ever building the
    full-resolution grid. The E2VID block-space head consumes this directly,
    removing the per-window s2d transpose from the recurrent scan (~25
    ms/step at DSEC scale, measured round 2)."""
    assert tile_h % 2 == 0 and height % 2 == 0, (tile_h, height)
    full = _tiles_to_blocks(
        tiles, bins=bins, tile_h=tile_h, height=height, width=width)
    b = tiles.shape[0]
    th, tw = tile_h, TILE_W
    n_ty, n_tx = height // th, width // tw
    # (b, ty, tx, bins, th, tw) -> (b, ty, th/2, tx, tw/2, r, s, bins)
    full = full.reshape(b, n_ty, n_tx, bins, th // 2, 2, tw // 2, 2)
    full = jnp.transpose(full, (0, 1, 4, 2, 6, 5, 7, 3))
    return full.reshape(b, height // 2, width // 2, 4 * bins)


def voxelize_trilinear_pallas(
    x: jax.Array, y: jax.Array, t: jax.Array, p: jax.Array,
    valid: jax.Array, *, num_bins: int, height: int, width: int,
    offsets: Optional[jax.Array] = None, interpret: bool = False,
    oh_dtype=jnp.bfloat16,
) -> jax.Array:
    """Drop-in trilinear voxelizer: (B, N) SoA events -> (B, bins, H, W).

    When ``offsets`` is None the events are tile-binned on-device first
    (one lax.sort). Semantics match ops.voxel.voxel_grid_trilinear.
    """
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    t = t.astype(jnp.float32)
    t0 = jnp.min(jnp.where(valid, t, big), axis=-1, keepdims=True)
    t1 = jnp.max(jnp.where(valid, t, -big), axis=-1, keepdims=True)
    delta = jnp.where(t1 - t0 <= 0, 1.0, t1 - t0)
    ts = (num_bins - 1) * (t - t0) / delta
    pol = jnp.where(p > 0, 1.0, -1.0).astype(jnp.float32)

    ok = (valid & (x >= 0) & (x < width) & (y >= 0) & (y < height))
    if offsets is None:
        xs, ys, tss, ps, offsets = jax.vmap(
            lambda a, b_, c, d, v: bin_events_device(
                a, b_, c, d, v, height=height, width=width, bins=num_bins)
        )(x.astype(jnp.float32), y.astype(jnp.float32), ts,
          jnp.where(ok, pol, 0.0), ok)
    else:
        xs, ys, tss, ps = (x.astype(jnp.float32), y.astype(jnp.float32), ts,
                           jnp.where(ok, pol, 0.0))
    return voxelize_tiled(xs, ys, tss, ps, offsets,
                          bins=num_bins, height=height, width=width,
                          interpret=interpret, oh_dtype=oh_dtype)


# ----------------------------------------------------------------------
# Pre-folded kernel mode (round 4): no halos, no fold pass.
#
# The halo machinery above exists because a trilinear event whose corner
# crosses a tile edge deposits into a neighbouring tile. Pre-folding moves
# that split to the HOST binning pass instead: every boundary-crossing
# event is rewritten to exact integer boundary coordinates with its
# crossing weight folded into a PRE-WEIGHTED polarity, and the
# across-band part becomes a "ghost" event appended to the next band
# (fractional polarity, integer row position). With nothing ever crossing
# a row block, the kernel can use a GAP-FREE row layout (bins * tile_h
# rows, no +1 halo row) and a GLOBAL column space (cx = band * W + x, one
# program per full row band, no slot padding): the accumulator written
# back to HBM IS the voxel grid up to one pure reshape/transpose — the
# halo-fold selection matmuls, slot compaction, and their relayout copies
# (~10 ms of the r3 DSEC step) disappear, and the dot itself shrinks
# (640 lanes exactly vs 5*136 padded to 768).
# ----------------------------------------------------------------------


def host_band_bin_folded(raw_windows, valid, *, height: int, width: int,
                         bins: int = 5, trilinear: bool = True,
                         capacity: Optional[int] = None,
                         x_slots: bool = False):
    """Host-side ghost-folding band binning for :func:`voxelize_folded`.

    (T, N, 4) raw (x, y, t, p) windows + validity -> (raw2 (T, N2, 4),
    valid2 (T, N2), band_offsets (T, n_bands + 1)) where N2 = ``capacity``
    (default N + N//8 + 8 — ghosts are bounded by the events in each
    band's last row, ~1/tile_h of the stream). The p column of the output
    is PRE-WEIGHTED: +-1 scaled by any folded edge/boundary fractions
    (the device kernel consumes it as-is, no sign extraction).

    Rewrites (trilinear only; integer-coordinate temporal streams have no
    spatial fractions and only get the +-1 conversion + band sort):
    - frame edges: a coordinate in (-1, 0) or (dim-1, dim) keeps only its
      in-frame corner — coordinate clamps to the exact integer edge, the
      corner's weight multiplies into p (same math the scatter reference's
      in-frame corner gets).
    - band boundaries: y in (band_end-1, band_end) splits into the
      original at exact row band_end-1 (weight folded) plus a ghost at
      exact row band_end carrying the remainder — the two-corner bilinear
      split, materialized as two single-corner events.
    """
    import numpy as np

    th = tile_h_for_bins(bins)
    hp = ((height + th - 1) // th) * th
    n_bands = hp // th
    t_dim, n = raw_windows.shape[:2]
    wp = ((width + TILE_W - 1) // TILE_W) * TILE_W
    ntx = wp // TILE_W if x_slots else 1

    if capacity is None:
        # ghosts only exist on the trilinear path (integer-coordinate
        # temporal streams never cross a row block); x-slot ghosts add
        # ~1/TILE_W of the stream
        capacity = n + n // 8 + n // 64 + 8 if trilinear else n

    from ess_tpu.data import native
    got = native.band_bin_folded(raw_windows, valid, height=height,
                                 width=width, tile_h=th,
                                 trilinear=trilinear, capacity=capacity,
                                 ntx=ntx, slot_w=TILE_W)
    if got is not None:
        return got

    n2 = capacity

    per_window = []
    for i in range(t_dim):
        w = raw_windows[i]
        x = w[:, 0].astype(np.float64)
        y = w[:, 1].astype(np.float64)
        t = w[:, 2].astype(np.float64)
        p = np.where(w[:, 3] > 0, 1.0, -1.0)
        if trilinear:
            ok = (valid[i] & (x > -1) & (x < width)
                  & (y > -1) & (y < height))
        else:
            ok = (valid[i]
                  & (np.floor(x) >= 0) & (np.floor(x) < width)
                  & (np.floor(y) >= 0) & (np.floor(y) < height))
        x, y, t, p = x[ok], y[ok], t[ok], p[ok]
        if trilinear:
            # frame-edge folds -> exact integer edge coordinates
            m = x < 0
            p[m] *= 1.0 + x[m]
            x[m] = 0.0
            m = x > width - 1
            p[m] *= width - x[m]
            x[m] = width - 1
            m = y < 0
            p[m] *= 1.0 + y[m]
            y[m] = 0.0
            m = y > height - 1
            p[m] *= height - y[m]
            y[m] = height - 1
            # band-boundary split: original clamps to the band's last row,
            # ghost lands exactly on the next band's first row
            band = (y // th).astype(np.int64)
            yl = y - band * th
            frac = yl - (th - 1)
            bm = frac > 0
            gx, gt = x[bm], t[bm]
            gp = p[bm] * frac[bm]
            gy = (band[bm] + 1) * float(th)
            p[bm] *= th - yl[bm]
            y[bm] = band[bm] * th + (th - 1)
            x = np.concatenate([x, gx])
            y = np.concatenate([y, gy])
            t = np.concatenate([t, gt])
            p = np.concatenate([p, gp])
            if x_slots:
                # x-slot boundary split (columns are the same bilinear
                # tent as rows): an event whose RIGHT corner lands exactly
                # on a TILE_W multiple splits into the left corner at the
                # exact integer column (weight folded) plus a ghost on the
                # next slot's first column — afterwards no tent crosses a
                # slot, so the kernel's per-slot dots need only TILE_W
                # columns instead of the padded sensor width
                fx = x - np.floor(x)
                xr = np.floor(x) + 1.0
                bm = (fx > 0) & (np.mod(xr, TILE_W) == 0) & (xr <= width - 1)
                gx2, gy2, gt2 = xr[bm], y[bm], t[bm]
                gp2 = p[bm] * fx[bm]
                p[bm] *= 1.0 - fx[bm]
                x[bm] = np.floor(x[bm])
                x = np.concatenate([x, gx2])
                y = np.concatenate([y, gy2])
                t = np.concatenate([t, gt2])
                p = np.concatenate([p, gp2])
        band = np.clip((y // th).astype(np.int64), 0, n_bands - 1)
        group = band
        if x_slots:
            slot = np.clip((x // TILE_W).astype(np.int64), 0, ntx - 1)
            group = band * ntx + slot
        order = np.argsort(group, kind="stable")
        per_window.append((x[order], y[order], t[order], p[order],
                           group[order]))

    # grow-and-retry semantics matching the native path: a pathological
    # window (mass on band-boundary rows) overflows the default margin ->
    # pad everything up to the next QUANTIZED capacity level so all
    # windows (and batch peers) share one shape
    needed = max((len(pw[0]) for pw in per_window), default=0)
    if needed > n2:
        from ess_tpu.data.native import quantize_folded_capacity
        n2 = quantize_folded_capacity(needed, n)

    out = np.zeros((t_dim, n2, 4), np.float32)
    out_valid = np.zeros((t_dim, n2), bool)
    offsets = np.zeros((t_dim, n_bands * ntx + 1), np.int32)
    for i, (x, y, t, p, group) in enumerate(per_window):
        m = len(x)
        out[i, :m, 0] = x
        out[i, :m, 1] = y
        out[i, :m, 2] = t
        out[i, :m, 3] = p
        out_valid[i, :m] = True
        offsets[i] = np.searchsorted(
            group, np.arange(n_bands * ntx + 1)).astype(np.int32)
    return out, out_valid, offsets


@functools.lru_cache(maxsize=None)
def _resize_w_matrix(in_w: int, out_w: int, in_pad: int, out_pad: int,
                     align_corners: bool):
    """(in_pad, out_pad) f32 width-resize matrix: column j of the output is
    the bilinear interpolation of the input columns at source position
    src(j) — torch align_corners=True (j*(in-1)/(out-1)) or half-pixel
    centers. Exact transcription of ops.resize.resize_bilinear's sampling
    for the width axis (antialias-free 2-tap)."""
    import numpy as np
    R = np.zeros((in_pad, out_pad), np.float32)
    for j in range(out_w):
        if align_corners:
            src = j * (in_w - 1) / max(out_w - 1, 1)
        else:
            src = (j + 0.5) * in_w / out_w - 0.5
        src = min(max(src, 0.0), in_w - 1)
        i0 = int(np.floor(src))
        i1 = min(i0 + 1, in_w - 1)
        f = src - i0
        R[i0, j] += 1.0 - f
        R[i1, j] += f
    return R


def voxelize_folded(
    x: jax.Array, y: jax.Array, ts: jax.Array, pol: jax.Array,
    offsets: jax.Array, *, bins: int, height: int, width: int,
    interpret: bool = False, oh_dtype=jnp.bfloat16, layout: str = "nhwc",
    chunk: Optional[int] = None, out_dtype=jnp.float32,
    with_stats: bool = False, normalize: bool = False, resize_w=None,
    deint: Optional[bool] = None,
):
    """(B, N) band-sorted PRE-FOLDED events + (B, n_bands+1) offsets ->
    voxel grids, with no post-kernel fold pass.

    Inputs must come from :func:`host_band_bin_folded` (or satisfy its
    contract): ``pol`` pre-weighted signed values, spatial coordinates
    never crossing a band row block, ``ts`` normalized to [0, bins-1].
    ``height`` % tile_h == 0 and ``width`` % 128 == 0 (callers pad and
    crop exactly like the halo path). Layouts as :func:`voxelize_tiled`.

    ``with_stats=True`` additionally returns (B, 3) f32 per-window
    normalization stats (sum, sum of squares, nonzero count) accumulated
    exactly in the kernel epilogue — valid because this mode's
    accumulators ARE the final grid (no later halo additions).

    ``normalize=True`` applies the nonzero standardization directly from
    those kernel-side stats (no grid-wide stats pass), at SENSOR
    resolution — i.e. before any resize, matching the reference's
    normalize -> crop -> resize order.

    ``resize_w``: optional (width, out_width_padded) matrix from
    :func:`_resize_w_matrix` — applies a width-only bilinear resize as a
    minor-axis matmul on the band accumulators (MXU, ~0.6 ms at DDD17
    step scale) BEFORE the layout transpose, so resize-width datasets
    (DDD17 346->352) keep the fold-free s2d path end-to-end.
    """
    if chunk is None:
        chunk = FOLDED_CHUNK
    b, n = x.shape
    th = tile_h_for_bins(bins)
    assert height % th == 0 and width % TILE_W == 0, (height, width)
    n_bands = height // th
    rows = bins * th
    rows_pad = ((rows + 7) // 8) * 8
    n_pad = ((n + chunk - 1) // chunk) * chunk
    nb = n_pad // chunk

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    ts = ts.astype(jnp.float32)
    pol = pol.astype(jnp.float32)
    band = jnp.clip(jnp.floor(y).astype(jnp.int32) // th, 0, n_bands - 1)
    yl = y - (band * th).astype(jnp.float32)
    c0 = jnp.floor(ts)
    wt1 = ts - c0
    cx = band.astype(jnp.float32) * width + x
    p0 = c0 * th + yl
    s0 = pol * (1.0 - wt1)
    s1 = pol * wt1
    if oh_dtype == jnp.int8:
        cx = cx * INT8_SCALE
        s0 = s0 * INT8_SCALE
        s1 = s1 * INT8_SCALE

    ev = jnp.stack([
        jnp.pad(a, ((0, 0), (0, n_pad - n))).reshape(b, nb, chunk)
        for a in (cx, p0, s0, s1)
    ], axis=2)

    # offsets width decides the kernel: n_bands + 1 entries = the legacy
    # full-width dot; n_bands * ntx + 1 = per-x-slot dots (x_slots binning)
    n_groups = offsets.shape[1] - 1
    ntx = n_groups // n_bands
    assert n_groups == n_bands * ntx and width % ntx == 0, (
        offsets.shape, n_bands, width)
    # pack consecutive bands into one grid program to amortize per-program
    # fixed cost (FOLDED_BAND_PACK; largest divisor of n_bands <= the cap;
    # slotted kernel only)
    n_pack = (max(p for p in range(1, FOLDED_BAND_PACK + 1)
                  if n_bands % p == 0) if ntx > 1 else 1)
    grid = (b, n_bands // n_pack)
    stack_out = layout == "stack"
    if stack_out:
        # direct s2d NCHW stack emission (see _kernel_slotted stack_out):
        # (B, 4*bins, n_bands, th/2, W/2); slotted kernel only, even tile
        # height, no in-kernel resize (the width matmul mixes columns
        # across slots)
        assert ntx > 1 and th % 2 == 0 and resize_w is None, (
            ntx, th, resize_w)
        out_specs = pl.BlockSpec(
            (1, 4 * bins, n_pack, th // 2, width // 2),
            lambda b_, t_, offs: (b_, 0, t_, 0, 0))
        out_shapes = jax.ShapeDtypeStruct(
            (b, 4 * bins, n_bands, th // 2, width // 2), out_dtype)
    else:
        out_specs = pl.BlockSpec(
            (1, n_pack, rows_pad, width), lambda b_, t_, offs: (b_, t_, 0, 0))
        out_shapes = jax.ShapeDtypeStruct(
            (b, n_bands, rows_pad, width), out_dtype)
    want_stats = with_stats or normalize
    if want_stats:
        out_specs = [out_specs, pl.BlockSpec(
            (1, n_pack, 8, 128), lambda b_, t_, offs: (b_, t_, 0, 0))]
        out_shapes = [out_shapes, jax.ShapeDtypeStruct(
            (b, n_bands, 8, 128), jnp.float32)]
    # De-interleaved s2d output (see _kernel_slotted): slotted kernel only,
    # even tile height on sublane-tile boundaries (the factored row plane).
    # MEASURED REGRESSION as the default (v5e full step, r5): the permuted
    # iotas are free and the builder-side fine reshape/transpose chain does
    # collapse to coarse block moves (13.8 -> 13.4 ms), but XLA then picks
    # a stack layout whose per-window relayout inside the recurrent scan
    # DOUBLES (4.2 -> 9.6 ms): bench 734.9 -> 719.9 w/s. Kept as a tested
    # opt-in — it becomes interesting again if the scan-side consumer ever
    # reads the stack layout directly.
    deint = (deint if deint is not None
             else False) and layout == "s2d" and ntx > 1 and th % 8 == 0
    if ntx > 1:
        assert width // ntx == TILE_W, (width, ntx)
        kern = functools.partial(
            _kernel_slotted, bins=bins, row_gap=th, rows=rows_pad,
            n_sub=ntx, slot_w=TILE_W, width_total=width, chunk=chunk,
            oh_dtype=oh_dtype, stats_rows=rows if want_stats else 0,
            n_pack=n_pack, deint=deint, stack_out=stack_out)
        scratch = [
            pltpu.VMEM((n_pack * ntx, 2, 4, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((n_pack * ntx, 2)),
        ]
    else:
        kern = functools.partial(
            _kernel, bins=bins, row_gap=th, rows=rows_pad,
            k_tiles=1, col_slot=width, chunk=chunk, oh_dtype=oh_dtype,
            stats_rows=rows if want_stats else 0)
        scratch = [
            pltpu.VMEM((N_BUF, 4, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ]
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(offsets, ev)
    stats = None
    if want_stats:
        out, raw_stats = out
        # per-(window, band) partials -> (B, 3) per-window totals
        stats = jnp.sum(raw_stats[:, :, 0, :3], axis=1)

    if stack_out:
        # (B, 4*bins, n_bands, th/2, W/2) -> (B, 4*bins, H/2, W/2): the
        # (n_bands, th/2) merge is a contiguous free reshape. Normalize
        # and flip are the CONSUMER's per-window elementwise map
        # (EventPipeline.build_all_stack) — stats returned raw.
        return out.reshape(b, 4 * bins, height // 2, width // 2), stats

    if deint:
        flat = out[:, :, :rows]                     # (b, nb, rows, width)
        if normalize:
            num = stats[:, 2]
            num_f = jnp.maximum(num, 1.0)
            mean = stats[:, 0] / num_f
            var = stats[:, 1] / num_f - mean * mean
            std = jnp.sqrt(jnp.maximum(var, 0.0))
            std = jnp.where(std > 0, std, 1.0)
            bshape = (-1, 1, 1, 1)
            shift = mean.astype(flat.dtype).reshape(bshape)
            scale = (1.0 / std).astype(flat.dtype).reshape(bshape)
            normed = jnp.where(flat != 0, (flat - shift) * scale,
                               jnp.zeros_like(flat))
            flat = jnp.where((num > 0).reshape(bshape), normed, flat)
        half = th // 2
        if resize_w is not None:
            # the resize matrix maps TRUE x order; conjugate it with the
            # kernel's column permutation (rows: slotted (slot, s, xhl) ->
            # x; cols: the output's global (s, xh) -> x) so the einsum
            # consumes and emits the de-interleaved forms directly
            in_pad, out_pad = resize_w.shape
            assert in_pad == width and out_pad % 2 == 0
            pos = np.arange(in_pad)
            perm_in = ((pos // TILE_W) * TILE_W
                       + 2 * (pos % (TILE_W // 2))
                       + (pos % TILE_W) // (TILE_W // 2))
            pos_o = np.arange(out_pad)
            perm_out = 2 * (pos_o % (out_pad // 2)) + pos_o // (out_pad // 2)
            rw = jnp.asarray(resize_w)[perm_in][:, perm_out]
            flat = jnp.einsum(
                "bnrw,wv->bnrv", flat, rw.astype(flat.dtype),
                preferred_element_type=jnp.float32).astype(flat.dtype)
            width = out_pad
            # output columns are globally (s, xh): no slot dim
            view = flat.reshape(b, n_bands, bins, 2, half, 2, width // 2)
            view = jnp.transpose(view, (0, 1, 4, 6, 3, 5, 2))
        else:
            sw2 = TILE_W // 2
            view = flat.reshape(b, n_bands, bins, 2, half, ntx, 2, sw2)
            #      b nb  c  r  yh  slot s xhl -> b nb yh slot xhl r s c
            view = jnp.transpose(view, (0, 1, 4, 5, 7, 3, 6, 2))
        grid_out = view.reshape(b, height // 2, width // 2, 4 * bins)
        return (grid_out, stats) if with_stats else grid_out

    if layout == "raw":
        # Raw-accumulator mode: return the kernel output (B, n_bands,
        # bins*th, W) UNTRANSPOSED so the recurrent scan can slice it
        # per window and fuse the fine s2d transform (+ deferred
        # normalize/flip) into ONE in-scan pass — the bulk 4-pass
        # reshape/transpose/copy chain (~10.5 ms at DSEC step scale)
        # never runs. Consumers: EventPipeline.build_all_raw ->
        # Reconstructor.rollout_raw.
        #
        # Normalization ordering: the reference normalizes at SENSOR
        # resolution before any resize (data_util.py:38-51 semantics),
        # and nonzero-masked standardization does NOT commute with the
        # resize matmul — so when a resize folds in, normalize is
        # applied here on the flat accumulator (one fused elementwise
        # pass into the einsum operand read); otherwise it is DEFERRED
        # to the consumer's per-window map (stats returned).
        flat = out[:, :, :rows]  # rows_pad -> rows (no-op when equal)
        if resize_w is not None:
            if normalize:
                num = stats[:, 2]
                num_f = jnp.maximum(num, 1.0)
                mean = stats[:, 0] / num_f
                var = stats[:, 1] / num_f - mean * mean
                std = jnp.sqrt(jnp.maximum(var, 0.0))
                std = jnp.where(std > 0, std, 1.0)
                bshape = (-1, 1, 1, 1)
                shift = mean.astype(flat.dtype).reshape(bshape)
                scale = (1.0 / std).astype(flat.dtype).reshape(bshape)
                normed = jnp.where(flat != 0, (flat - shift) * scale,
                                   jnp.zeros_like(flat))
                flat = jnp.where((num > 0).reshape(bshape), normed, flat)
            flat = jnp.einsum(
                "bnrw,wv->bnrv", flat, resize_w.astype(flat.dtype),
                preferred_element_type=jnp.float32).astype(flat.dtype)
        return flat, stats

    core = out[:, :, :rows].reshape(b, n_bands, bins, th, width)
    if normalize:
        # nonzero standardization from the kernel-side stats, applied at
        # sensor resolution (before resize/crop) — _normalize_flat math
        num = stats[:, 2]
        num_f = jnp.maximum(num, 1.0)
        mean = stats[:, 0] / num_f
        var = stats[:, 1] / num_f - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        std = jnp.where(std > 0, std, 1.0)
        bshape = (-1, 1, 1, 1, 1)
        shift = mean.astype(core.dtype).reshape(bshape)
        scale = (1.0 / std).astype(core.dtype).reshape(bshape)
        normed = jnp.where(core != 0, (core - shift) * scale,
                           jnp.zeros_like(core))
        core = jnp.where((num > 0).reshape(bshape), normed, core)
    if resize_w is not None:
        # width-only bilinear resize as one MXU matmul along the minor axis
        core = jnp.einsum(
            "bncrw,wv->bncrv", core, resize_w.astype(core.dtype),
            preferred_element_type=jnp.float32).astype(core.dtype)
        width = core.shape[-1]
    if layout == "nchw":
        grid_out = jnp.transpose(core, (0, 2, 1, 3, 4)).reshape(
            b, bins, height, width)
    elif layout == "nhwc":
        grid_out = jnp.transpose(core, (0, 1, 3, 4, 2)).reshape(
            b, height, width, bins)
    else:
        blk = {"s2d": 2, "s4d": 4}[layout]
        assert th % blk == 0 and width % blk == 0, (th, width, layout)
        core = core.reshape(b, n_bands, bins, th // blk, blk,
                            width // blk, blk)
        core = jnp.transpose(core, (0, 1, 3, 5, 4, 6, 2))
        grid_out = core.reshape(b, height // blk, width // blk,
                                blk * blk * bins)
    return (grid_out, stats) if with_stats else grid_out
