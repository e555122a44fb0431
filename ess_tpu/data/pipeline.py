"""On-device event-sample pipeline: voxelize -> crop -> resize -> augment.

Replaces the reference's host-side per-sample transforms:
- DSEC: voxelize at sensor res, drop the 40 bottom rows, optional bilinear
  resize, random horizontal flip of tensor+label
  (DSEC/dataset/sequence.py:255-295)
- DDD17: voxelize, drop 60 bottom rows, bilinear resize 346->352 wide,
  optional random crop to 120x216 + flip with the ignore-label-safe shift
  trick (datasets/ddd17_events_loader.py:101-183)

All of it runs inside jit on fixed shapes: crops are static slices, the
random crop is a ``dynamic_slice`` with a traced offset, and flips are
``where``-selected reversals, so one compiled program covers the whole
augmentation space.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ess_tpu.ops.batch_voxel import voxelize_windows
from ess_tpu.ops.resize import resize_bilinear, resize_nearest


@dataclass(frozen=True)
class PipelineConfig:
    """Static geometry/augmentation spec for one dataset."""

    sensor_height: int
    sensor_width: int
    num_bins: int = 5
    representation: str = "voxel_grid"
    separate_pol: bool = False
    normalize: bool = False          # per-window nonzero normalize at build
    crop_bottom: int = 0             # rows dropped from the bottom (sensor res)
    resize_to: Optional[Tuple[int, int]] = None   # (H, W) after crop
    random_crop: Optional[Tuple[int, int]] = None  # train-time crop (H, W)
    random_flip: bool = False
    rectify: bool = False            # use rectify_map + trilinear kernel

    @property
    def channels(self) -> int:
        if self.representation == "histogram":
            return 2
        return self.num_bins * 2 if self.separate_pol else self.num_bins

    @property
    def post_crop_size(self) -> Tuple[int, int]:
        h = self.sensor_height - self.crop_bottom
        return (h, self.sensor_width)

    @property
    def output_size(self) -> Tuple[int, int]:
        if self.random_crop is not None:
            return self.random_crop
        if self.resize_to is not None:
            return self.resize_to
        return self.post_crop_size


class EventPipeline:
    """Jit-friendly transform from raw event batches to model-ready tensors.

    ``__call__(batch, rng, train)``:
      batch = {"raw_events": (B,T,N,4), "valid": (B,T,N),
               "label": (B,Hs,Ws) optional, ...}
      returns batch with "events": (B,T,H,W,C) and the label cropped/flipped
      consistently.
    """

    def __init__(self, cfg: PipelineConfig, rectify_map=None):
        self.cfg = cfg
        self.rectify_map = jnp.asarray(rectify_map) if rectify_map is not None else None
        if cfg.rectify and self.rectify_map is None:
            raise ValueError("rectify=True requires a rectify_map")

    def __call__(self, batch: dict, rng: Optional[jax.Array] = None,
                 *, train: bool = False) -> dict:
        cfg = self.cfg
        grids = voxelize_windows(
            batch["raw_events"], batch["valid"],
            num_bins=cfg.num_bins,
            height=cfg.sensor_height, width=cfg.sensor_width,
            representation=cfg.representation,
            separate_pol=cfg.separate_pol,
            rectify_map=self.rectify_map if cfg.rectify else None,
            normalize=cfg.normalize,
        )
        label = batch.get("label")

        if cfg.crop_bottom > 0:
            grids = grids[:, :, : cfg.sensor_height - cfg.crop_bottom]
            # labels are already stored at post-crop resolution by the
            # loaders (sequence.py:213-218 crops labels identically)

        if cfg.resize_to is not None:
            h, w = cfg.resize_to
            b, t = grids.shape[:2]
            grids = resize_bilinear(
                grids.reshape(b * t, *grids.shape[2:]), h, w
            ).reshape(b, t, h, w, grids.shape[-1])

        if train and cfg.random_crop is not None:
            assert rng is not None
            ch, cw = cfg.random_crop
            b = grids.shape[0]
            k1, k2, rng = jax.random.split(rng, 3)
            oy = jax.random.randint(k1, (b,), 0, grids.shape[2] - ch + 1)
            ox = jax.random.randint(k2, (b,), 0, grids.shape[3] - cw + 1)

            def crop_one(g, l, y0, x0):
                g = jax.lax.dynamic_slice(
                    g, (0, y0, x0, 0), (g.shape[0], ch, cw, g.shape[3]))
                if l is not None:
                    # label may be at a different resolution than the grid;
                    # crop proportionally only when sizes match
                    l = jax.lax.dynamic_slice(l, (y0, x0), (ch, cw))
                return g, l

            if label is not None and label.shape[1:] == grids.shape[2:4]:
                grids, label = jax.vmap(
                    lambda g, l, y0, x0: crop_one(g, l, y0, x0)
                )(grids, label, oy, ox)
            else:
                grids = jax.vmap(
                    lambda g, y0, x0: crop_one(g, None, y0, x0)[0]
                )(grids, oy, ox)

        if train and cfg.random_flip:
            assert rng is not None
            k, rng = jax.random.split(rng)
            flip = jax.random.bernoulli(k, 0.5, (grids.shape[0],))
            grids = jnp.where(flip[:, None, None, None, None],
                              grids[:, :, :, ::-1, :], grids)
            if label is not None:
                label = jnp.where(flip[:, None, None], label[:, :, ::-1], label)

        out = dict(batch)
        out["events"] = grids
        if label is not None:
            out["label"] = label
        out.pop("raw_events", None)
        out.pop("valid", None)
        return out
