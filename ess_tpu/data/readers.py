"""Text/zip event-stream readers for the standalone reconstruction CLI.

Capability parity with /root/reference/e2vid/utils/event_readers.py:8-88
(FixedSizeEventReader: chunked CSV with N events per window;
FixedDurationEventReader: line parsing with a duration cutoff) and the
DSEC visualization EventReader (DSEC/visualization/eventreader.py:33-56,
fixed-duration iteration over events.h5).

Files are whitespace-separated ``t x y p`` rows with a ``width height``
header line, as produced by the public E2VID datasets.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator, Optional, Tuple

import numpy as np


def read_header(path: str) -> Tuple[int, int]:
    """(width, height) from the first line."""
    with _open_text(path) as f:
        parts = f.readline().split()
    return int(parts[0]), int(parts[1])


def _open_text(path: str):
    if path.endswith(".zip"):
        zf = zipfile.ZipFile(path)
        name = zf.namelist()[0]
        return io.TextIOWrapper(zf.open(name), encoding="utf-8")
    return open(path)


class FixedSizeEventReader:
    """Yields (N, 4) [t, x, y, p] float64 windows with N events each."""

    def __init__(self, path: str, num_events: int = 10000, start_index: int = 0):
        self.path = path
        self.num_events = num_events
        self.start_index = start_index

    def __iter__(self) -> Iterator[np.ndarray]:
        buf = []
        with _open_text(self.path) as f:
            f.readline()  # header
            for _ in range(self.start_index):
                f.readline()
            for line in f:
                parts = line.split()
                if len(parts) != 4:
                    continue
                buf.append([float(parts[0]), float(parts[1]),
                            float(parts[2]), float(parts[3])])
                if len(buf) == self.num_events:
                    yield np.asarray(buf)
                    buf = []


class FixedDurationEventReader:
    """Yields windows covering ``duration_ms`` each (event_readers.py:32-88)."""

    def __init__(self, path: str, duration_ms: float = 50.0, start_index: int = 0):
        self.path = path
        self.duration_s = duration_ms / 1000.0
        self.start_index = start_index

    def __iter__(self) -> Iterator[np.ndarray]:
        buf = []
        last_stamp: Optional[float] = None
        with _open_text(self.path) as f:
            f.readline()
            for _ in range(self.start_index):
                f.readline()
            for line in f:
                parts = line.split()
                if len(parts) != 4:
                    continue
                t = float(parts[0])
                if last_stamp is None:
                    last_stamp = t
                buf.append([t, float(parts[1]), float(parts[2]), float(parts[3])])
                if t > last_stamp + self.duration_s:
                    yield np.asarray(buf)
                    buf = []
                    last_stamp = t
        if buf:
            yield np.asarray(buf)


class H5DurationReader:
    """Fixed-duration iterator over a DSEC events.h5 stream
    (DSEC/visualization/eventreader.py:33-56 capability): yields
    (N_i, 4) [x, y, t, p] arrays covering ``delta_t_ms`` each."""

    def __init__(self, h5_path: str, delta_t_ms: float = 50.0):
        from ess_tpu.data.slicer import EventSlicer, H5EventStore

        self.store = H5EventStore(h5_path)
        self.slicer = EventSlicer(self.store)
        self.delta_t_us = int(delta_t_ms * 1000)

    def __iter__(self) -> Iterator[np.ndarray]:
        from ess_tpu.data.slicer import events_dict_to_xytp

        t = self.slicer.start_time_us()
        t_final = self.slicer.final_time_us()
        while t + self.delta_t_us <= t_final:
            ev = self.slicer.get_events(t, t + self.delta_t_us)
            if ev is not None and len(ev["t"]):
                yield events_dict_to_xytp(ev)
            t += self.delta_t_us
