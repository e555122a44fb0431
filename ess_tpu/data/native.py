"""ctypes bindings for the native host-ingest kernels (native/ess_host.cpp).

Builds the shared library on first use (g++ -O3, cached next to the source)
and exposes numpy-friendly wrappers. Every entry point has a pure-numpy
fallback, so the framework runs even without a compiler — the native path
just makes host ingest keep up with the TPU.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "ess_host.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libess_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB_PATH)
    if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", lib, src],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return None
    cdll = ctypes.CDLL(lib)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c_i64 = ctypes.c_int64

    cdll.lower_bound_i64.argtypes = [i64p, c_i64, c_i64]
    cdll.lower_bound_i64.restype = c_i64
    cdll.searchsorted_i64.argtypes = [i64p, c_i64, i64p, c_i64, i64p]
    cdll.pad_windows_i16.argtypes = [i64p, i16p, c_i64, i64p, i64p, c_i64,
                                     c_i64, f32p, u8p]
    cdll.pad_windows_f64.argtypes = [f64p, i64p, i64p, c_i64, c_i64, f32p, u8p]
    cdll.voxelize_trilinear_f32.argtypes = [f32p, u8p, c_i64, c_i64, c_i64,
                                            c_i64, f32p]
    cdll.voxelize_temporal_f32.argtypes = [f32p, u8p, c_i64, c_i64, c_i64,
                                           c_i64, ctypes.c_int, f32p]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    cdll.tile_bin_f32.argtypes = [f32p, u8p, c_i64, c_i64, c_i64, c_i64,
                                  c_i64, c_i64, c_i64, c_i64, f32p, u8p,
                                  i32p, i64p, i32p]
    cdll.ingest_rectify_bin_f32.argtypes = [
        u16p, u16p, i64p, u8p, i64p, i64p, c_i64, c_i64,
        f32p, c_i64, c_i64, c_i64, c_i64, c_i64, c_i64,
        f32p, u8p, i32p, i64p, f32p, i32p]
    cdll.ingest_rectify_bin_packed.argtypes = [
        u16p, u16p, i64p, u8p, i64p, i64p, c_i64, c_i64,
        f32p, c_i64, c_i64, c_i64, c_i64, c_i64, c_i64,
        u16p, u16p, u16p, u8p, i32p, i64p, i32p, i32p]
    cdll.band_bin_folded_f32.argtypes = [
        f32p, u8p, c_i64, c_i64, c_i64, c_i64, c_i64, c_i64, c_i64,
        ctypes.c_int, c_i64, c_i64, f32p, u8p, i32p, i64p, f32p, i32p]
    cdll.band_bin_folded_f32.restype = c_i64
    cdll.ingest_rectify_bin_folded.argtypes = [
        u16p, u16p, i64p, u8p, i64p, i64p, c_i64, c_i64, c_i64,
        f32p, c_i64, c_i64, c_i64, c_i64, c_i64, c_i64,
        f32p, u8p, i32p, i64p, f32p, i32p]
    cdll.ingest_rectify_bin_folded.restype = c_i64
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    cdll.ingest_rectify_bin_packed_folded.argtypes = [
        u16p, u16p, i64p, u8p, i64p, i64p, c_i64, c_i64, c_i64,
        f32p, c_i64, c_i64, c_i64, c_i64, c_i64, c_i64,
        u16p, u16p, u16p, i8p, i32p, i64p, f32p, i32p]
    cdll.ingest_rectify_bin_packed_folded.restype = c_i64
    return cdll


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


def searchsorted_i64(t: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """First index with t[i] >= q for each query (t sorted int64)."""
    lib = get_lib()
    t = np.ascontiguousarray(t, np.int64)
    q = np.ascontiguousarray(queries, np.int64)
    if lib is None:
        return np.searchsorted(t, q, side="left").astype(np.int64)
    out = np.empty(len(q), np.int64)
    lib.searchsorted_i64(t, len(t), q, len(q), out)
    return out


def voxelize_host(
    raw_windows: np.ndarray, valid: np.ndarray, *, num_bins: int,
    height: int, width: int, trilinear: bool = False,
    separate_pol: bool = False,
) -> np.ndarray:
    """Host-side voxelization of (T, N, 4) raw windows -> (T, C, H, W) f32.

    Alternative ingest mode: dense grids built by the C++ kernels inside the
    loader's worker threads (overlapped with device compute). Falls back to
    the JAX-on-CPU reference kernels when the native lib is unavailable.
    """
    lib = get_lib()
    t_dim = raw_windows.shape[0]
    channels = num_bins * 2 if (separate_pol and not trilinear) else num_bins
    out = np.zeros((t_dim, channels, height, width), np.float32)
    if lib is None:
        from ess_tpu.ops.batch_voxel import voxelize_windows
        import jax.numpy as jnp
        grids = voxelize_windows(
            jnp.asarray(raw_windows)[None], jnp.asarray(valid)[None],
            num_bins=num_bins, height=height, width=width,
            trilinear=trilinear, separate_pol=separate_pol)
        return np.moveaxis(np.asarray(grids[0]), -1, 1)
    ev = np.ascontiguousarray(raw_windows, np.float32)
    vd = np.ascontiguousarray(valid, np.uint8)
    for i in range(t_dim):
        if trilinear:
            lib.voxelize_trilinear_f32(
                ev[i], vd[i], ev.shape[1], num_bins, height, width, out[i])
        else:
            lib.voxelize_temporal_f32(
                ev[i], vd[i], ev.shape[1], num_bins, height, width,
                int(separate_pol), out[i])
    return out


def tile_bin(
    raw_windows: np.ndarray, valid: np.ndarray, *, height: int, width: int,
    tile_h: int, tile_w: int = 128,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Counting-sort (T, N, 4) raw windows by Pallas tile id.

    Returns (sorted (T, N, 4) f32, valid (T, N) bool, offsets
    (T, n_tiles+1) i32) on the kernel-aligned padded grid, or None when the
    native library is unavailable (caller falls back to numpy argsort).
    """
    lib = get_lib()
    if lib is None:
        return None
    hp = -(-height // tile_h) * tile_h
    wp = -(-width // tile_w) * tile_w
    ntx = wp // tile_w
    n_tiles = (hp // tile_h) * ntx
    t_dim, n = raw_windows.shape[:2]
    ev = np.ascontiguousarray(raw_windows, np.float32)
    vd = np.ascontiguousarray(valid, np.uint8)
    out = np.empty_like(ev)
    out_valid = np.empty((t_dim, n), np.uint8)
    offsets = np.empty((t_dim, n_tiles + 1), np.int32)
    counts = np.empty(n_tiles, np.int64)
    tid_scratch = np.empty(n, np.int32)
    lib.tile_bin_f32(ev, vd, t_dim, n, height, width, tile_h, tile_w,
                     ntx, n_tiles, out, out_valid, offsets, counts,
                     tid_scratch)
    return out, out_valid.astype(bool), offsets


def ingest_rectify_bin(
    ev: dict, starts: np.ndarray, ends: np.ndarray, capacity: int,
    rectify_map: np.ndarray, *, tile_h: int, tile_w: int = 128,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Fused DSEC ingest: rectify + pad + tile-bin raw h5 event columns.

    ``ev``: {"x","y","t","p"} columns as read from events.h5;
    ``starts``/``ends``: per-window [start, end) bounds into them. Returns
    (raw (T, cap, 4) f32, valid (T, cap) bool, offsets (T, n_tiles+1) i32)
    or None without the native library.
    """
    lib = get_lib()
    if lib is None:
        return None
    mh, mw = rectify_map.shape[:2]
    hp = -(-mh // tile_h) * tile_h
    wp = -(-mw // tile_w) * tile_w
    ntx = wp // tile_w
    n_tiles = (hp // tile_h) * ntx
    t_dim = len(starts)
    x = np.ascontiguousarray(ev["x"], np.uint16)
    y = np.ascontiguousarray(ev["y"], np.uint16)
    t = np.ascontiguousarray(ev["t"], np.int64)
    p = np.ascontiguousarray(ev["p"], np.uint8)
    rmap = np.ascontiguousarray(rectify_map, np.float32)
    out = np.empty((t_dim, capacity, 4), np.float32)
    out_valid = np.empty((t_dim, capacity), np.uint8)
    offsets = np.empty((t_dim, n_tiles + 1), np.int32)
    counts = np.empty(n_tiles, np.int64)
    xy_scratch = np.empty((capacity, 2), np.float32)
    tid_scratch = np.empty(capacity, np.int32)
    lib.ingest_rectify_bin_f32(
        x, y, t, p,
        np.ascontiguousarray(starts, np.int64),
        np.ascontiguousarray(ends, np.int64),
        t_dim, capacity, rmap, mh, mw, tile_h, tile_w, ntx, n_tiles,
        out, out_valid, offsets, counts, xy_scratch, tid_scratch)
    return out, out_valid.astype(bool), offsets


COORD_SCALE = 64        # packed wire format: coords in 1/64-pixel steps
TIME_SCALE = 60000      # per-window time normalized to [0, 1] / 60000


def ingest_rectify_bin_packed(
    ev: dict, starts: np.ndarray, ends: np.ndarray, capacity: int,
    rectify_map: np.ndarray, *, tile_h: int, tile_w: int = 128,
) -> Optional[dict]:
    """Packed-wire variant of :func:`ingest_rectify_bin`: quantized SoA
    columns (x, y in 1/64 px u16; per-window-normalized t in u16; p u8) —
    7 bytes/event on the host->device wire instead of 17 (validity derives
    from the tile offsets). Tile ids are computed from the QUANTIZED
    coordinates so binning and the device kernel agree exactly. Returns
    {"ev_xq","ev_yq","ev_tq","ev_pq": (T, cap), "tile_offsets"} or None
    without the native library.
    """
    lib = get_lib()
    if lib is None:
        return None
    mh, mw = rectify_map.shape[:2]
    hp = -(-mh // tile_h) * tile_h
    wp = -(-mw // tile_w) * tile_w
    ntx = wp // tile_w
    n_tiles = (hp // tile_h) * ntx
    t_dim = len(starts)
    out_x = np.empty((t_dim, capacity), np.uint16)
    out_y = np.empty((t_dim, capacity), np.uint16)
    out_t = np.empty((t_dim, capacity), np.uint16)
    out_p = np.empty((t_dim, capacity), np.uint8)
    offsets = np.empty((t_dim, n_tiles + 1), np.int32)
    counts = np.empty(n_tiles, np.int64)
    q_scratch = np.empty((capacity, 2), np.int32)
    tid_scratch = np.empty(capacity, np.int32)
    lib.ingest_rectify_bin_packed(
        np.ascontiguousarray(ev["x"], np.uint16),
        np.ascontiguousarray(ev["y"], np.uint16),
        np.ascontiguousarray(ev["t"], np.int64),
        np.ascontiguousarray(ev["p"], np.uint8),
        np.ascontiguousarray(starts, np.int64),
        np.ascontiguousarray(ends, np.int64),
        t_dim, capacity, np.ascontiguousarray(rectify_map, np.float32),
        mh, mw, tile_h, tile_w, ntx, n_tiles,
        out_x, out_y, out_t, out_p, offsets, counts, q_scratch, tid_scratch)
    return {"ev_xq": out_x, "ev_yq": out_y, "ev_tq": out_t, "ev_pq": out_p,
            "tile_offsets": offsets}


POL_SCALE = 127         # packed-folded wire: pre-weighted polarity in i8


def ingest_rectify_bin_packed_folded(
    ev: dict, starts: np.ndarray, ends: np.ndarray, capacity: int,
    rectify_map: np.ndarray, *, tile_h: int,
    out_capacity: Optional[int] = None,
    ntx: int = 1, slot_w: int = 128,
) -> Optional[dict]:
    """Packed-wire variant of :func:`ingest_rectify_bin_folded`: the
    ghost-folded band-sorted records emitted as quantized SoA columns
    (x, y in 1/64 px u16; per-window-normalized t u16; PRE-WEIGHTED
    polarity i8 in 1/127 steps) — 7 bytes/record on the host->device wire
    instead of 16. Coordinates quantize to the 1/64 grid BEFORE folding,
    so band/slot grouping and the device tents agree exactly; validity
    derives from the band offsets. Returns
    {"ev_xq","ev_yq","ev_tq","ev_pq": (T, cap2), "band_offsets"} or None
    without the native library. Grows to the next quantized capacity
    level on pathological-skew overflow (same policy as the f32 wire).
    """
    lib = get_lib()
    if lib is None:
        return None
    mh, mw = rectify_map.shape[:2]
    hp = -(-mh // tile_h) * tile_h
    n_bands = hp // tile_h
    t_dim = len(starts)
    x = np.ascontiguousarray(ev["x"], np.uint16)
    y = np.ascontiguousarray(ev["y"], np.uint16)
    t = np.ascontiguousarray(ev["t"], np.int64)
    p = np.ascontiguousarray(ev["p"], np.uint8)
    rmap = np.ascontiguousarray(rectify_map, np.float32)
    cap2 = out_capacity if out_capacity is not None else folded_capacity(
        capacity)
    n_groups = n_bands * ntx
    while True:
        out_x = np.empty((t_dim, cap2), np.uint16)
        out_y = np.empty((t_dim, cap2), np.uint16)
        out_t = np.empty((t_dim, cap2), np.uint16)
        out_p = np.empty((t_dim, cap2), np.int8)
        offsets = np.empty((t_dim, n_groups + 1), np.int32)
        counts = np.empty(n_groups, np.int64)
        rec_scratch = np.empty((4 * capacity, 4), np.float32)
        band_scratch = np.empty(4 * capacity, np.int32)
        needed = lib.ingest_rectify_bin_packed_folded(
            x, y, t, p,
            np.ascontiguousarray(starts, np.int64),
            np.ascontiguousarray(ends, np.int64),
            t_dim, capacity, cap2, rmap, mh, mw, tile_h, n_bands, ntx,
            slot_w, out_x, out_y, out_t, out_p, offsets, counts,
            rec_scratch, band_scratch)
        if needed <= cap2:
            return {"ev_xq": out_x, "ev_yq": out_y, "ev_tq": out_t,
                    "ev_pq": out_p, "band_offsets": offsets}
        cap2 = quantize_folded_capacity(int(needed), capacity)


def pad_windows_from_bounds(
    events_f64: np.ndarray, starts: np.ndarray, ends: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.ndarray]:
    """Gather-pad (N, 4) float64 events into (T, cap, 4) f32 + (T, cap) bool
    given per-window [start, end) index bounds."""
    lib = get_lib()
    t_dim = len(starts)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    if lib is not None:
        ev = np.ascontiguousarray(events_f64, np.float64)
        out = np.empty((t_dim, capacity, 4), np.float32)
        valid = np.empty((t_dim, capacity), np.uint8)
        lib.pad_windows_f64(ev, starts, ends, t_dim, capacity, out, valid)
        return out, valid.astype(bool)
    # numpy fallback
    from ess_tpu.data.slicer import pad_windows
    chunks = [events_f64[s:e] for s, e in zip(starts, ends)]
    return pad_windows(chunks, capacity)


def pad_windows_ddd17(
    t: np.ndarray, xyp: np.ndarray, starts: np.ndarray, ends: np.ndarray,
    capacity: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Gather-pad directly from the DDD17 memmap layout (int64 t + int16
    xyp), skipping the intermediate float64 assembly entirely."""
    lib = get_lib()
    t_dim = len(starts)
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    # Materialize only the touched region of the (potentially huge) memmaps.
    lo = int(starts.min()) if t_dim else 0
    hi = int(ends.max()) if t_dim else 0
    if lib is not None:
        tt = np.ascontiguousarray(t[lo:hi], np.int64)
        xx = np.ascontiguousarray(xyp[lo:hi], np.int16)
        out = np.empty((t_dim, capacity, 4), np.float32)
        valid = np.empty((t_dim, capacity), np.uint8)
        lib.pad_windows_i16(tt, xx, hi - lo,
                            np.ascontiguousarray(starts - lo),
                            np.ascontiguousarray(ends - lo),
                            t_dim, capacity, out, valid)
        return out, valid.astype(bool)
    t_region = np.asarray(t[lo:hi], np.int64)
    xyp_region = np.asarray(xyp[lo:hi], np.int64)
    ev = np.concatenate(
        [xyp_region[:, :2].astype(np.float64),
         t_region[:, None].astype(np.float64),
         xyp_region[:, 2:3].astype(np.float64)], axis=1)
    from ess_tpu.data.slicer import pad_windows
    chunks = [ev[s - lo: e - lo] for s, e in zip(starts, ends)]
    return pad_windows(chunks, capacity)


def folded_capacity(n: int) -> int:
    """Default record capacity for ghost-folded binning: ghosts are bounded
    by the events in each band's last row (~1/tile_h of a uniform stream)
    plus the x-slot boundary columns (~1/TILE_W); the margins cover heavy
    spatial skew with room to spare."""
    return n + n // 8 + n // 64 + 8


def quantize_folded_capacity(needed: int, n: int) -> int:
    """Deterministic capacity level for a folded-binning overflow: the next
    multiple of the default margin step (n//8 + n//64 + 8) above
    ``needed``. Quantizing keeps pathological samples on a SMALL set of
    shared shapes (instead of per-sample ``needed`` values), so batch
    collation pads to one common level and jit sees at most a handful of
    record widths over a whole run (worst case is bounded: every event can
    split into at most 4 records, so levels stop at ~4n)."""
    base = max(folded_capacity(n) - n, 1)
    over = needed - n
    return n + -(-over // base) * base


def band_bin_folded(
    raw_windows: np.ndarray, valid: np.ndarray, *, height: int, width: int,
    tile_h: int, trilinear: bool = True, capacity: Optional[int] = None,
    ntx: int = 1, slot_w: int = 128,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Ghost-folded band counting sort of (T, N, 4) raw windows (the
    fold-free Pallas kernel's input contract — ops/voxel_pallas.py
    voxelize_folded). Returns (records (T, cap2, 4) f32 with PRE-WEIGHTED
    polarity, valid (T, cap2) bool, band offsets (T, n_bands+1) i32), or
    None without the native library. Retries with doubled capacity if a
    pathological window overflows the ghost margin."""
    lib = get_lib()
    if lib is None:
        return None
    hp = -(-height // tile_h) * tile_h
    n_bands = hp // tile_h
    t_dim, n = raw_windows.shape[:2]
    cap2 = capacity if capacity is not None else folded_capacity(n)
    ev = np.ascontiguousarray(raw_windows, np.float32)
    vd = np.ascontiguousarray(valid, np.uint8)
    n_groups = n_bands * ntx
    while True:
        out = np.empty((t_dim, cap2, 4), np.float32)
        out_valid = np.empty((t_dim, cap2), np.uint8)
        offsets = np.empty((t_dim, n_groups + 1), np.int32)
        counts = np.empty(n_groups, np.int64)
        rec_scratch = np.empty((4 * n, 4), np.float32)
        band_scratch = np.empty(4 * n, np.int32)
        needed = lib.band_bin_folded_f32(
            ev, vd, t_dim, n, cap2, height, width, tile_h, n_bands,
            1 if trilinear else 0, ntx, slot_w, out, out_valid, offsets,
            counts, rec_scratch, band_scratch)
        if needed <= cap2:
            return out, out_valid.astype(bool), offsets
        cap2 = quantize_folded_capacity(int(needed), n)


def ingest_rectify_bin_folded(
    ev: dict, starts: np.ndarray, ends: np.ndarray, capacity: int,
    rectify_map: np.ndarray, *, tile_h: int,
    out_capacity: Optional[int] = None,
    ntx: int = 1, slot_w: int = 128,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Fused DSEC ingest, folded variant: rectify + per-window time re-zero
    + ghost-folded band binning in ONE pass over the raw h5 columns. Same
    contract as :func:`ingest_rectify_bin` but returns band offsets and
    pre-weighted polarities (records (T, cap2, 4))."""
    lib = get_lib()
    if lib is None:
        return None
    mh, mw = rectify_map.shape[:2]
    hp = -(-mh // tile_h) * tile_h
    n_bands = hp // tile_h
    t_dim = len(starts)
    x = np.ascontiguousarray(ev["x"], np.uint16)
    y = np.ascontiguousarray(ev["y"], np.uint16)
    t = np.ascontiguousarray(ev["t"], np.int64)
    p = np.ascontiguousarray(ev["p"], np.uint8)
    rmap = np.ascontiguousarray(rectify_map, np.float32)
    cap2 = out_capacity if out_capacity is not None else folded_capacity(
        capacity)
    n_groups = n_bands * ntx
    while True:
        out = np.empty((t_dim, cap2, 4), np.float32)
        out_valid = np.empty((t_dim, cap2), np.uint8)
        offsets = np.empty((t_dim, n_groups + 1), np.int32)
        counts = np.empty(n_groups, np.int64)
        rec_scratch = np.empty((4 * capacity, 4), np.float32)
        band_scratch = np.empty(4 * capacity, np.int32)
        needed = lib.ingest_rectify_bin_folded(
            x, y, t, p,
            np.ascontiguousarray(starts, np.int64),
            np.ascontiguousarray(ends, np.int64),
            t_dim, capacity, cap2, rmap, mh, mw, tile_h, n_bands, ntx,
            slot_w, out, out_valid, offsets, counts, rec_scratch,
            band_scratch)
        if needed <= cap2:
            return out, out_valid.astype(bool), offsets
        cap2 = quantize_folded_capacity(int(needed), capacity)
