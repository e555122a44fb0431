"""DSEC-Semantic event dataset (host ingest).

Capability parity with the DSEC DatasetProvider / Sequence pair
(/root/reference/DSEC/dataset/provider.py:8-62, DSEC/dataset/sequence.py:23-305):
480x640 sensor, per-sequence events.h5 + rectify_map.h5 + 11/19-class label
PNGs with timestamps.txt; the fixed zurich_city train/val sequence lists;
the first ``(250//100+1)*2 = 6`` labels dropped (insufficient event history,
sequence.py:119-126); label stride 2 (:190-191, :211); fixed-count (last
20x100k events, split into equal chunks) or fixed-duration window modes
(:224-279).

TPU-first: samples carry RAW fixed-capacity windows; rectification
(rectify_map gather) and trilinear voxelization run on-device
(ess_tpu.ops.batch_voxel). The 40-bottom-row crop / resize / flip also move
on-device (ess_tpu.data.pipeline).

``SequenceRecurrent`` mirrors sequence_recurrent.py:17-291: consecutive
non-overlapping event blocks indexed by exposure timestamps for long-horizon
streaming eval, carrying recurrent state across samples.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from ess_tpu.data.slicer import EventSlicer, H5EventStore, events_dict_to_xytp, pad_windows

SENSOR_HEIGHT, SENSOR_WIDTH = 480, 640
CROP_BOTTOM = 40  # labels are provided at 440x640

TRAIN_SEQUENCES = [
    "zurich_city_00_a", "zurich_city_01_a", "zurich_city_02_a",
    "zurich_city_04_a", "zurich_city_05_a", "zurich_city_06_a",
    "zurich_city_07_a", "zurich_city_08_a",
]
VAL_SEQUENCES = ["zurich_city_13_a", "zurich_city_14_c", "zurich_city_15_a"]


class DSECSequence:
    """One recorded sequence: label-aligned raw event windows."""

    def __init__(
        self,
        seq_path: str,
        mode: str = "train",
        nr_events_data: int = 20,
        nr_events_window: int = 100000,
        fixed_duration: bool = False,
        delta_t_per_data: int = 50,
        semseg_num_classes: int = 11,
        remove_time_window: int = 250,
        tile_bin: bool = True,
        tile_bins: int = 5,
        wire_format: str = "f32",   # 'f32' | 'packed' (u16 quantized SoA)
        binning: str = "folded",    # 'folded' (ghost-folded band bins, the
                                    # fold-free kernel; r4 default, +27 w/s)
                                    # | 'tile' (halo-tile kernel)
    ):
        self.seq_path = seq_path
        self.mode = mode
        self.nr_events_data = nr_events_data
        self.nr_events_window = nr_events_window
        self.fixed_duration = fixed_duration
        self.tile_bin = tile_bin
        self.tile_bins = tile_bins  # kernel-effective bin count (tile height)
        self.wire_format = wire_format
        # packed + folded wire (r5): the ghost-folded records ship as
        # quantized SoA columns with an i8 PRE-WEIGHTED polarity
        # (native.ingest_rectify_bin_packed_folded) — no downgrade needed
        self.binning = binning
        # sticky folded-record capacity: once a pathological sample grows
        # past the default margin, every later sample in this sequence is
        # binned at the same quantized level so batch shapes stay stable
        self._folded_cap: Optional[int] = None
        self.delta_t_us = nr_events_data * delta_t_per_data * 1000

        ts_file = os.path.join(seq_path, "semantic", "timestamps.txt")
        self.timestamps = np.loadtxt(ts_file, dtype="int64")
        class_dir = {11: "11classes", 19: "19classes"}[semseg_num_classes]
        label_dir = os.path.join(seq_path, "semantic", class_dir, "data")
        self.label_files = sorted(glob.glob(os.path.join(label_dir, "*.png")))
        assert len(self.label_files) == self.timestamps.size

        # not enough event history before the first labels (sequence.py:119-126)
        skip = (remove_time_window // 100 + 1) * 2
        self.timestamps = self.timestamps[skip:]
        self.label_files = self.label_files[skip:]

        ev_dir = os.path.join(seq_path, "events", "left")
        self.store = H5EventStore(os.path.join(ev_dir, "events.h5"))
        self.slicer = EventSlicer(self.store)
        import h5py
        with h5py.File(os.path.join(ev_dir, "rectify_map.h5"), "r") as f:
            self.rectify_map = f["rectify_map"][()]  # (480, 640, 2) float32

    def __len__(self) -> int:
        return (self.timestamps.size + 1) // 2

    def _rectify(self, ev: np.ndarray) -> np.ndarray:
        """Host-side undistortion: x, y -> rectify_map[y, x] float coords
        (sequence.py:193-200). Done on the host because a per-event gather
        on TPU costs ~13 ms/window; here it overlaps with device compute."""
        xi = ev[:, 0].astype(np.int64)
        yi = ev[:, 1].astype(np.int64)
        rect = self.rectify_map[yi, xi]
        ev[:, 0] = rect[:, 0]
        ev[:, 1] = rect[:, 1]
        return ev

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import cv2

        label = cv2.imread(self.label_files[index * 2], 0).astype(np.uint8)
        ts_end = int(self.timestamps[index * 2])

        t_dim = self.nr_events_data
        if self.fixed_duration:
            ts_start = ts_end - self.delta_t_us
            per_us = self.delta_t_us / t_dim
            if self.tile_bin:
                got = self._fused_ingest_duration(ts_start, per_us, t_dim)
                if got is not None:
                    if isinstance(got, dict):   # packed wire / folded bins
                        got["label"] = label
                        return got
                    raw, valid, offsets = got
                    return {"raw_events": raw, "valid": valid,
                            "tile_offsets": offsets, "label": label}
            chunks = []
            for i in range(t_dim):
                ev = self.slicer.get_events(
                    int(ts_start + i * per_us), int(ts_start + (i + 1) * per_us))
                chunks.append(self._rectify(events_dict_to_xytp(ev))
                              if ev is not None else np.zeros((0, 4)))
        else:
            ev = self.slicer.get_events_fixed_num(
                ts_end, t_dim * self.nr_events_window)
            if self.tile_bin and self.wire_format == "packed":
                got = self._fused_ingest(ev, t_dim, packed=True)
                if got is not None:
                    got["label"] = label
                    return got
            if self.tile_bin:
                got = self._fused_ingest(ev, t_dim)
                if got is not None:
                    if isinstance(got, dict):   # folded band bins
                        got["label"] = label
                        return got
                    raw, valid, offsets = got
                    return {"raw_events": raw, "valid": valid,
                            "tile_offsets": offsets, "label": label}
            events = self._rectify(events_dict_to_xytp(ev))
            per = len(events) // t_dim
            chunks = [events[i * per: (i + 1) * per] for i in range(t_dim)]

        raw, valid = pad_windows(chunks, self.nr_events_window)
        out = {"raw_events": raw, "valid": valid, "label": label}
        if self.tile_bin:
            out.update(self._host_bin(raw, valid))
        return out

    def _host_bin(self, raw, valid) -> Dict[str, np.ndarray]:
        """Numpy-chain host binning of already-rectified padded windows:
        ghost-folded band bins (fold-free kernel) or halo tile bins,
        per ``self.binning`` — the fallback when the fused native ingest
        is unavailable (it pre-sorts so the device skips its lax.sort)."""
        from ess_tpu.ops.voxel_pallas import host_band_bin_folded, host_tile_bin

        if self.binning == "folded":
            raw, valid, offsets = host_band_bin_folded(
                raw, valid, height=SENSOR_HEIGHT, width=SENSOR_WIDTH,
                bins=self.tile_bins, trilinear=True, x_slots=True,
                capacity=self._folded_cap)
            self._folded_cap = raw.shape[1]
            return {"raw_events": raw, "valid": valid,
                    "band_offsets": offsets}
        raw, valid, offsets = host_tile_bin(
            raw, valid, height=SENSOR_HEIGHT, width=SENSOR_WIDTH,
            bins=self.tile_bins)
        return {"raw_events": raw, "valid": valid, "tile_offsets": offsets}

    def _fused_ingest_duration(self, ts_start: float, per_us: float,
                               t_dim: int):
        """Fixed-duration variant of the fused native ingest: resolve the
        T+1 window boundaries to event indices via the ms_to_idx slicer,
        read the covered columns ONCE, and run the one-pass C++ rectify +
        pad + tile-bin over per-window bounds (the numpy fallback does T
        separate slicer reads + rectify passes)."""
        from ess_tpu.data import native
        from ess_tpu.ops.voxel_pallas import tile_h_for_bins

        bounds = []
        for i in range(t_dim + 1):
            idx = self.slicer.index_of_time(int(ts_start + i * per_us))
            if idx is None:
                return None  # out-of-range: fall back to the legacy chain
            bounds.append(idx)
        lo = bounds[0]
        ev = self.slicer.get_events_fixed_num_recurrent(lo, max(bounds[-1],
                                                                lo + 1))
        starts = np.asarray(bounds[:-1], np.int64) - lo
        ends = np.asarray(bounds[1:], np.int64) - lo
        th = tile_h_for_bins(self.tile_bins)
        if self.wire_format == "packed":
            if self.binning == "folded":
                got = native.ingest_rectify_bin_packed_folded(
                    ev, starts, ends, self.nr_events_window,
                    self.rectify_map, tile_h=th,
                    ntx=-(-SENSOR_WIDTH // 128), slot_w=128,
                    out_capacity=self._folded_cap)
                if got is not None:
                    self._folded_cap = got["ev_xq"].shape[1]
                return got
            return native.ingest_rectify_bin_packed(
                ev, starts, ends, self.nr_events_window, self.rectify_map,
                tile_h=th)
        if self.binning == "folded":
            got = native.ingest_rectify_bin_folded(
                ev, starts, ends, self.nr_events_window, self.rectify_map,
                tile_h=th, ntx=-(-SENSOR_WIDTH // 128), slot_w=128,
                out_capacity=self._folded_cap)
            if got is None:
                return None
            raw, valid, offsets = got
            self._folded_cap = raw.shape[1]
            return {"raw_events": raw, "valid": valid,
                    "band_offsets": offsets}
        return native.ingest_rectify_bin(
            ev, starts, ends, self.nr_events_window, self.rectify_map,
            tile_h=th)

    def _fused_ingest(self, ev, t_dim: int, *, packed: bool = False):
        """Native one-pass rectify + pad + host binning of raw h5 columns
        (native/ess_host.cpp). ~4x the numpy chain on a single core — the
        loader-side hot path. ``packed=True`` emits the quantized u16 wire
        format (7 bytes/event host->device); otherwise ``self.binning``
        picks ghost-folded band bins (dict with "band_offsets") or halo
        tile bins (tuple)."""
        from ess_tpu.data import native
        from ess_tpu.ops.voxel_pallas import tile_h_for_bins

        n_total = len(ev["t"])
        per = n_total // t_dim
        starts = np.arange(t_dim, dtype=np.int64) * per
        ends = starts + per
        th = tile_h_for_bins(self.tile_bins)
        if packed:
            if self.binning == "folded":
                got = native.ingest_rectify_bin_packed_folded(
                    ev, starts, ends, self.nr_events_window,
                    self.rectify_map, tile_h=th,
                    ntx=-(-SENSOR_WIDTH // 128), slot_w=128,
                    out_capacity=self._folded_cap)
                if got is not None:
                    self._folded_cap = got["ev_xq"].shape[1]
                return got
            return native.ingest_rectify_bin_packed(
                ev, starts, ends, self.nr_events_window, self.rectify_map,
                tile_h=th)
        if self.binning == "folded":
            got = native.ingest_rectify_bin_folded(
                ev, starts, ends, self.nr_events_window, self.rectify_map,
                tile_h=th, ntx=-(-SENSOR_WIDTH // 128), slot_w=128,
                out_capacity=self._folded_cap)
            if got is None:
                return None
            raw, valid, offsets = got
            self._folded_cap = raw.shape[1]
            return {"raw_events": raw, "valid": valid,
                    "band_offsets": offsets}
        return native.ingest_rectify_bin(
            ev, starts, ends, self.nr_events_window, self.rectify_map,
            tile_h=th)


class DSECEvents:
    """Concatenation of the fixed train or val sequence lists
    (provider.py:22-50 and DSEC_events_loader.py:14-42)."""

    def __init__(self, dataset_path: str, mode: str = "train", **seq_kw):
        sub = "train" if mode == "train" else "test"
        names = TRAIN_SEQUENCES if mode == "train" else VAL_SEQUENCES
        base = os.path.join(dataset_path, sub)
        self.sequences: List[DSECSequence] = []
        for child in sorted(os.listdir(base)):
            if any(k in child for k in names):
                self.sequences.append(
                    DSECSequence(os.path.join(base, child), mode=mode, **seq_kw))
        assert self.sequences, f"no DSEC sequences found under {base}"
        self._offsets = np.cumsum([0] + [len(s) for s in self.sequences])

    @property
    def rectify_map(self) -> np.ndarray:
        return self.sequences[0].rectify_map

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        seq_i = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        sample = self.sequences[seq_i][idx - int(self._offsets[seq_i])]
        sample["sequence"] = np.int32(seq_i)
        return sample


class SequenceRecurrent:
    """Streaming variant: consecutive non-overlapping fixed-count event
    blocks over a whole sequence (sequence_recurrent.py:17-291 semantics) for
    long-horizon eval with carried ConvLSTM state.

    Each item is ONE window (T=1); ``is_first`` marks sequence starts where
    the consumer must reset recurrent state. Two label-alignment modes:

    - free-running (default): a label attaches to the window CONTAINING its
      exposure timestamp's event index — the fixed window grid cannot
      end-align with arbitrary label times, so the scored prediction sees up
      to one window (~50 ms) of events past the label. (The reference's
      fixed-count streaming branch loads no labels at all,
      sequence_recurrent.py:214-221 — scoring here is added capability.)
    - ``align_labels=True`` (exposure-aligned): the window grid CUTS at each
      label's event index (slicer.index_of_time), so a scored window ends
      exactly at the label's exposure time and the prediction sees no future
      events — mIoU is then comparable to the reference's exposure-aligned
      val protocol (sequence_recurrent.py:249-267 loads labels at exact
      timestamps on its fixed-duration branch). Labeled windows may be
      shorter than ``nr_events_window`` (capacity-padded, masked); the
      stream still tiles the sequence without gaps so carried state matches
      the free-running mode event-for-event.
    """

    def __init__(self, seq: DSECSequence, nr_events_window: int = 100000,
                 align_labels: bool = False):
        self.seq = seq
        self.nr_events_window = nr_events_window
        self.align_labels = align_labels
        n_events = len(seq.store)
        # event index of each labeled timestamp
        label_at = []  # (event index, label index), ascending
        for li in range(len(seq.timestamps)):
            idx = seq.slicer.index_of_time(int(seq.timestamps[li]))
            if idx is not None:
                label_at.append((int(idx), li))
        label_at.sort()
        if align_labels:
            # window plan: full-capacity windows, cut early where a label's
            # event index falls inside — that window ends AT the label
            self.bounds = [0]
            self.label_idx = {}
            pos = 0
            while self.bounds[-1] + nr_events_window <= n_events:
                cur = self.bounds[-1]
                end = cur + nr_events_window
                while pos < len(label_at) and label_at[pos][0] <= cur:
                    pos += 1  # unscoreable: label at/before the cut already
                if pos < len(label_at) and label_at[pos][0] <= end:
                    end, li = label_at[pos]
                    self.label_idx[len(self.bounds) - 1] = li
                    pos += 1
                self.bounds.append(end)
            self.n_windows = len(self.bounds) - 1
        else:
            self.n_windows = n_events // nr_events_window
            self.bounds = None
            self.label_idx = {}
            for idx, li in label_at:
                self.label_idx[idx // nr_events_window] = li

    def __len__(self) -> int:
        return self.n_windows

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        import cv2

        if not 0 <= i < self.n_windows:
            # honor the sequence protocol: iter() over this object must
            # terminate (a missing IndexError makes it loop forever on
            # empty windows)
            raise IndexError(i)
        if self.bounds is not None:
            lo, hi = self.bounds[i], self.bounds[i + 1]
        else:
            lo, hi = i * self.nr_events_window, (i + 1) * self.nr_events_window
        ev = self.seq.slicer.get_events_fixed_num_recurrent(lo, hi)
        # every streamed window is rectified exactly like the random-access
        # path (reference sequence_recurrent.py:239)
        out = {"is_first": np.bool_(i == 0)}
        done = False
        if self.seq.tile_bin and self.seq.wire_format == "packed":
            pk = self.seq._fused_ingest(ev, 1, packed=True)
            if pk is not None:
                out.update(pk)
                done = True
        if not done and self.seq.tile_bin:
            got = self.seq._fused_ingest(ev, 1)
            if got is not None:
                if isinstance(got, dict):   # folded band bins
                    out.update(got)
                else:
                    raw, valid, offsets = got
                    out.update(raw_events=raw, valid=valid,
                               tile_offsets=offsets)
                done = True
        if not done:
            events = self.seq._rectify(events_dict_to_xytp(ev))
            raw, valid = pad_windows([events], self.nr_events_window)
            out.update(raw_events=raw, valid=valid)
            if self.seq.tile_bin:
                out.update(self.seq._host_bin(raw, valid))
        li = self.label_idx.get(i)
        if li is not None:
            out["label"] = cv2.imread(self.seq.label_files[li], 0).astype(np.uint8)
            out["has_label"] = np.bool_(True)
        else:
            out["has_label"] = np.bool_(False)
        return out
