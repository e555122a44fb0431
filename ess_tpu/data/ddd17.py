"""DDD17 event dataset (host ingest).

Capability parity with DDD17Events
(/root/reference/datasets/ddd17_events_loader.py:34-214): 260x346 DAVIS
sensor, per-directory memmap event store, segmentation_masks/*.png labels
(already trainIds), fixed train/valid/test directory split (:18-23), windows
of the last ``nr_events_data * nr_events_window`` events before each label
(equal-count chunks; searchsorted boundaries in fixed-duration mode,
:139-149), label resize 346->352 wide and 60-bottom-row crop (:162-173), and
the optional paired grayscale frame at validation (:187-213).

TPU-first: instead of voxelizing per-chunk on the CPU (:150-166), samples
carry RAW fixed-capacity event windows (T, N, 4) + validity masks; the
device pipeline (ess_tpu.data.pipeline) voxelizes/resizes/crops/augments
on-chip inside the train step's jit.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ess_tpu.data import native
from ess_tpu.data.slicer import DDD17EventStore, pad_windows

SENSOR_SHAPE = (260, 346)
RESIZED_SHAPE = (200, 352)  # after 60-row crop + width resize
CROP_SHAPE = (120, 216)


def get_split_dirs(dirs: List[str], split: str) -> List[str]:
    """Fixed directory split (ddd17_events_loader.py:18-23)."""
    table = {
        "train": [0, 2, 3, 5, 6],
        "valid": [1],
        "test": [4],
    }
    return [dirs[i] for i in table[split]]


class DDD17Events:
    """Map-style dataset yielding raw event windows + labels.

    Sample dict:
      raw_events: (T, N, 4) float32 (x, y, t_rel, p) -- p in {0, 1}
      valid:      (T, N) bool
      label:      (200, 352) uint8 trainIds (resized; ignore=255)
      [image]:    (200, 352, 1) float32 in [0,1] (valid split, paired)
      [label_original]: (260, 346) uint8
    """

    def __init__(
        self,
        root: str,
        split: str = "train",
        nr_events_data: int = 20,
        nr_events_window: int = 32000,
        fixed_duration: bool = False,
        delta_t_per_data: int = 50,
        require_paired_data: bool = False,
        tile_bin: bool = True,
        tile_bins: int = 5,
        binning: str = "folded",   # 'folded' (band bins, fold-free kernel;
                                   # no ghosts for integer coords) | 'tile'
    ):
        data_dirs = sorted(glob.glob(os.path.join(root, "dir*")))
        assert len(data_dirs) > 0, f"no DDD17 'dir*' folders under {root}"
        assert split in ("train", "valid", "test")
        self.split = split
        self.nr_events_data = nr_events_data
        self.nr_events_window = nr_events_window
        self.fixed_duration = fixed_duration
        self.require_paired_data = require_paired_data
        self.tile_bin = tile_bin
        self.tile_bins = tile_bins  # kernel-effective bin count (tile height)
        self.binning = binning

        t_interval = nr_events_data * delta_t_per_data if fixed_duration else 50
        self.dirs = get_split_dirs(data_dirs, split)
        self.stores: Dict[str, DDD17EventStore] = {
            d: DDD17EventStore.open(d, t_interval) for d in self.dirs
        }
        self.files: List[str] = []
        for d in self.dirs:
            self.files += sorted(glob.glob(os.path.join(d, "segmentation_masks", "*.png")))
        assert self.files, "no segmentation masks found"

    def __len__(self) -> int:
        return len(self.files)

    def _chunk_bounds(self, store: DDD17EventStore, img_idx: int):
        """Global [start, end) event-index bounds for the T sub-windows
        (loader :139-149): equal counts by default, searchsorted over uniform
        time deltas in fixed-duration mode."""
        row = store.img_index[img_idx]
        end = int(row[1])
        t_dim = self.nr_events_data
        if self.fixed_duration:
            start = max(int(row[2]), 0)
            t_slice = np.asarray(store.t[start:end], np.int64)
            if len(t_slice) == 0:
                starts = ends = np.full(t_dim, start, np.int64)
                return starts, ends
            delta = (t_slice[-1] - t_slice[0]) / t_dim
            queries = (t_slice[0] + delta * np.arange(1, t_dim + 1)).astype(np.int64)
            bounds = np.concatenate(
                [[0], np.searchsorted(t_slice, queries, side="left")])
            bounds = np.minimum(bounds, len(t_slice))
            return start + bounds[:-1], start + bounds[1:]
        start = max(end - t_dim * self.nr_events_window, 0)
        per = (end - start) // t_dim
        starts = start + per * np.arange(t_dim, dtype=np.int64)
        ends = np.minimum(starts + per, end)
        return starts, ends

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        mask_file = self.files[idx]
        directory = os.path.dirname(os.path.dirname(mask_file))
        img_idx = int(os.path.basename(mask_file).split("_")[-1].split(".")[0]) - 1

        label_original = cv2.imread(mask_file, 0)
        # NB: the label is SQUEEZE-resized to 200 rows while event grids are
        # bottom-CROPPED 260->200 — a deliberate reproduction of the
        # reference's own geometry (ddd17_events_loader.py:120 squeezes the
        # mask, :173 crops the tensor); checkpoint accuracy parity requires
        # matching it, not fixing it
        label = cv2.resize(
            label_original, (RESIZED_SHAPE[1], RESIZED_SHAPE[0]),
            interpolation=cv2.INTER_NEAREST)

        store = self.stores[directory]
        starts, ends = self._chunk_bounds(store, img_idx)
        raw, valid = native.pad_windows_ddd17(
            store.t, store.xyp, starts, ends, self.nr_events_window)

        out = {
            "raw_events": raw,
            "valid": valid,
            "label": label.astype(np.uint8),
        }
        if self.tile_bin:
            if self.binning == "folded":
                from ess_tpu.ops.voxel_pallas import host_band_bin_folded
                raw, valid, offsets = host_band_bin_folded(
                    raw, valid, height=SENSOR_SHAPE[0],
                    width=SENSOR_SHAPE[1], bins=self.tile_bins,
                    trilinear=False, x_slots=True)
                out.update(raw_events=raw, valid=valid,
                           band_offsets=offsets)
            else:
                from ess_tpu.ops.voxel_pallas import host_tile_bin
                raw, valid, offsets = host_tile_bin(
                    raw, valid, height=SENSOR_SHAPE[0],
                    width=SENSOR_SHAPE[1], bins=self.tile_bins)
                out.update(raw_events=raw, valid=valid,
                           tile_offsets=offsets)
        if self.split == "valid" and self.require_paired_data:
            img = self._paired_frame(mask_file)
            if img is not None:
                out["image"] = img
            out["label_original"] = label_original.astype(np.uint8)
        return out

    def _paired_frame(self, mask_file: str) -> Optional[np.ndarray]:
        """Grayscale frame matching a validation mask (loader :187-213)."""
        import cv2

        parts = mask_file.split(os.sep)
        fid = parts[-1].split("_")[-1]
        for name in (f"img_{fid}", fid.zfill(14)):
            candidate = os.sep.join(parts[:-2] + ["imgs", name])
            if os.path.exists(candidate):
                img = cv2.imread(candidate, 0)
                img = cv2.resize(img, (RESIZED_SHAPE[1], 260))
                img = img[:-60]
                return (img.astype(np.float32) / 255.0)[..., None]
        return None
