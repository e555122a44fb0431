"""Event stores and the time/count slicer (host ingest, L0).

Capability parity with the reference's three event-storage backends
(SURVEY.md section 2.2):
- DSEC ``events.h5`` with per-millisecond ``ms_to_idx`` index + ``t_offset``
  (/root/reference/DSEC/utils/eventslicer.py:10-143; index invariant
  documented at :18-31: t[ms_to_idx[ms]] >= ms*1000 > t[ms_to_idx[ms]-1])
- DDD17 ``events.dat.t`` (int64 ns) / ``events.dat.xyp`` (int16) memmaps with
  ``index/index_{10,50,250}ms.npy`` image->event maps
  (/root/reference/datasets/extract_data_tools/example_loader_ddd17.py:9-87)
- in-memory arrays (tests / synthetic data)

The reference refines coarse ms bounds with a numba-JIT linear scan
(eventslicer.py:179-237); here the refinement is a vectorized
``np.searchsorted`` over the conservatively-loaded chunk — O(log n), no JIT
warmup — with an optional C++ fast path (ess_tpu.data.native) for the
gather-pad into fixed-capacity window buffers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np


class ArrayEventStore:
    """Events held in plain arrays (sorted by t, microseconds)."""

    def __init__(self, x, y, t, p, t_offset: int = 0, ms_to_idx=None):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.t = np.asarray(t, np.int64)
        self.p = np.asarray(p)
        self.t_offset = int(t_offset)
        if ms_to_idx is None:
            last_ms = int(self.t[-1]) // 1000 + 1 if len(self.t) else 0
            ms = np.arange(last_ms + 1, dtype=np.int64) * 1000
            ms_to_idx = np.searchsorted(self.t, ms, side="left")
        self.ms_to_idx = np.asarray(ms_to_idx, np.int64)

    def __len__(self) -> int:
        return len(self.t)

    def read(self, start: int, end: int) -> Dict[str, np.ndarray]:
        return {
            "x": np.asarray(self.x[start:end]),
            "y": np.asarray(self.y[start:end]),
            "t": np.asarray(self.t[start:end]),
            "p": np.asarray(self.p[start:end]),
        }

    def read_t(self, start: int, end: int) -> np.ndarray:
        return np.asarray(self.t[start:end])


class H5EventStore(ArrayEventStore):
    """DSEC events.h5 store (lazy h5py datasets, hdf5plugin codecs)."""

    def __init__(self, path: str):
        import h5py
        try:
            import hdf5plugin  # registers blosc/zstd filters  # noqa: F401
        except ImportError:
            pass
        self._h5 = h5py.File(path, "r")
        ev = self._h5["events"]
        self.x, self.y, self.t, self.p = ev["x"], ev["y"], ev["t"], ev["p"]
        self.ms_to_idx = np.asarray(self._h5["ms_to_idx"], np.int64)
        self.t_offset = int(self._h5["t_offset"][()]) if "t_offset" in self._h5 else 0

    def __len__(self) -> int:
        return self.t.shape[0]


@dataclass
class DDD17EventStore:
    """DDD17 memmap store; timestamps in **nanoseconds**."""

    t: np.memmap
    xyp: np.memmap
    # index rows: (img_timestamp_ns, event_idx, event_idx_before)
    img_index: np.ndarray

    @staticmethod
    def open(directory: str, t_interval_ms: int = 50) -> "DDD17EventStore":
        interval = t_interval_ms if t_interval_ms in (10, 50, 250) else 50
        idx = np.load(os.path.join(directory, f"index/index_{interval}ms.npy"))
        t_file = os.path.join(directory, "events.dat.t")
        n = os.path.getsize(t_file) // 8
        t = np.memmap(t_file, dtype="int64", mode="r", shape=(n,))
        xyp = np.memmap(os.path.join(directory, "events.dat.xyp"),
                        dtype="int16", mode="r", shape=(n, 3))
        return DDD17EventStore(t=t, xyp=xyp, img_index=idx)

    def window_for_image(
        self, img_idx: int, *, fixed_duration: bool, nr_events: int
    ) -> np.ndarray:
        """(N, 4) float64 events [x, y, t_ns, p] ending at image ``img_idx``
        (extract_events_from_memmap semantics,
        example_loader_ddd17.py:70-87)."""
        row = self.img_index[img_idx]
        end = int(row[1])
        if fixed_duration:
            start = max(int(row[2]), 0)
        else:
            start = max(end - nr_events, 0)
        t = np.asarray(self.t[start:end], np.int64)
        xyp = np.asarray(self.xyp[start:end], np.int64)
        out = np.empty((end - start, 4), np.float64)
        out[:, 0] = xyp[:, 0]
        out[:, 1] = xyp[:, 1]
        out[:, 2] = t
        out[:, 3] = xyp[:, 2]
        return out


class EventSlicer:
    """Time/count window queries over an event store (microsecond times).

    Mirrors the reference EventSlicer's three modes (eventslicer.py:46-143)
    with identical boundary semantics: a window [t_start, t_end) contains
    exactly the events with t_start <= t < t_end (after t_offset removal).
    """

    def __init__(self, store):
        self.store = store

    @property
    def t_offset(self) -> int:
        return self.store.t_offset

    def start_time_us(self) -> int:
        return self.store.t_offset

    def final_time_us(self) -> int:
        return int(self.store.read_t(len(self.store) - 1, len(self.store))[0]) + self.store.t_offset

    def _ms2idx(self, ms: int) -> Optional[int]:
        if ms < 0 or ms >= len(self.store.ms_to_idx):
            return None
        return int(self.store.ms_to_idx[ms])

    def _refine(self, lo_idx: int, hi_idx: int, t_query_us: int, side: str) -> int:
        """Exact index of t_query within the conservative [lo, hi) chunk."""
        t_chunk = self.store.read_t(lo_idx, hi_idx)
        return lo_idx + int(np.searchsorted(t_chunk, t_query_us, side=side))

    def index_of_time(self, t_us: int) -> Optional[int]:
        """First event index with t >= t_us (gps time)."""
        t = t_us - self.store.t_offset
        lo_ms = t // 1000
        hi_ms = lo_ms + 1
        lo = self._ms2idx(lo_ms)
        hi = self._ms2idx(hi_ms)
        if lo is None:
            return None
        if hi is None:
            hi = len(self.store)
        return self._refine(lo, hi, t, "left")

    def get_events(self, t_start_us: int, t_end_us: int) -> Optional[Dict[str, np.ndarray]]:
        assert t_start_us < t_end_us
        i0 = self.index_of_time(t_start_us)
        i1 = self.index_of_time(t_end_us)
        if i0 is None or i1 is None:
            return None
        return self.store.read(i0, i1)

    def get_events_fixed_num(self, t_end_us: int, nr_events: int) -> Optional[Dict[str, np.ndarray]]:
        """Last ``nr_events`` events strictly before t_end_us
        (eventslicer.py:88-125)."""
        i1 = self.index_of_time(t_end_us)
        if i1 is None:
            return None
        i0 = max(i1 - nr_events, 0)
        return self.store.read(i0, i1)

    def get_events_fixed_num_recurrent(self, idx_start: int, idx_end: int) -> Dict[str, np.ndarray]:
        assert idx_start < idx_end
        return self.store.read(idx_start, idx_end)


def events_dict_to_xytp(ev: Dict[str, np.ndarray]) -> np.ndarray:
    """(N, 4) float array in (x, y, t, p) column order."""
    out = np.empty((len(ev["t"]), 4), np.float64)
    out[:, 0] = ev["x"]
    out[:, 1] = ev["y"]
    out[:, 2] = ev["t"]
    out[:, 3] = ev["p"]
    return out


def pad_windows(
    windows: list[np.ndarray], capacity: int
) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length (Ni, 4) event windows into a fixed
    (T, capacity, 4) float32 buffer + (T, capacity) validity mask.

    XLA needs static shapes; windows longer than ``capacity`` keep their
    most recent events (tail), mirroring the last-N semantics of the
    fixed-count loaders.
    """
    t_dim = len(windows)
    out = np.zeros((t_dim, capacity, 4), np.float32)
    valid = np.zeros((t_dim, capacity), bool)
    for i, w in enumerate(windows):
        n = min(len(w), capacity)
        if n > 0:
            chunk = w[-n:]
            out[i, :n] = chunk.astype(np.float32)
            # timestamps can exceed f32 integer precision (ns epochs);
            # re-zero them relative to the window start to stay exact.
            out[i, :n, 2] = (chunk[:, 2] - chunk[0, 2]).astype(np.float32)
            valid[i, :n] = True
    return out, valid
