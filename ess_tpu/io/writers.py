"""Metric/observability writers.

Capability parity with the reference's tensorboardX SummaryWriter + W&B
mirror (base_trainer.py:34, train.py:35-51): scalar curves (50-step-averaged
train losses, base_trainer.py:525-541), image grids, and confusion-matrix
figures. The tracking-service mirror is a pluggable
``tracker`` hook: 'wandb' mirrors scalars/images to a W&B run when the
package is importable (the reference hard-codes the author's entity,
train.py:35-51; here it is configurable and degrades gracefully), any
callable receives ``(kind, tag, value, step)`` events, and the always-on
durable record is a JSONL stream any dashboard can tail.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class MetricsWriter:
    """TensorBoard (if available) + JSONL scalar/image writer."""

    def __init__(self, log_dir: str, *, config: Optional[dict] = None,
                 flush_every: int = 50, tracker=None,
                 tracker_project: str = "ess-tpu"):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._tracker = None
        self._wandb = None
        if tracker == "wandb":
            try:
                import wandb
                self._wandb = wandb.init(
                    project=tracker_project, dir=log_dir,
                    config=config or {}, mode=os.environ.get(
                        "WANDB_MODE", "offline"))
            except Exception as e:  # degrade gracefully, but say so
                print(f"[ess-tpu] wandb tracker disabled: {e!r}")
        elif callable(tracker):
            self._tracker = tracker
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass
        self._avg: Dict[str, list] = defaultdict(list)
        self.flush_every = flush_every
        if config:
            with open(os.path.join(log_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def scalar(self, tag: str, value: float, step: int) -> None:
        v = float(value)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "step": step, tag: v}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, v, step)
        if self._wandb is not None:
            self._wandb.log({tag: v}, step=step)
        if self._tracker is not None:
            self._tracker("scalar", tag, v, step)

    def scalars(self, values: Dict[str, float], step: int, prefix: str = "") -> None:
        for k, v in values.items():
            if np.ndim(v) == 0:
                self.scalar(prefix + k, v, step)

    def averaged_scalar(self, tag: str, value: float, step: int) -> None:
        """Accumulate and emit the mean every ``flush_every`` calls
        (reference's 50-step-averaged train summaries)."""
        self._avg[tag].append(float(value))
        if len(self._avg[tag]) >= self.flush_every:
            self.scalar(tag, float(np.mean(self._avg[tag])), step)
            self._avg[tag].clear()

    def image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        """Log an HWC uint8/float image (grids built by ess_tpu.utils.viz).
        A JSONL marker records the emission for headless runs/tests."""
        arr = np.asarray(img_hwc)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "step": step, "image": tag,
             "shape": list(arr.shape)}) + "\n")
        if self._tb is not None:
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            self._tb.add_image(tag, arr, step, dataformats="HWC")

        if self._tracker is not None:
            self._tracker("image", tag, img_hwc, step)

    def figure(self, tag: str, fig, step: int) -> None:
        """Log a matplotlib figure (confusion matrices)."""
        if self._tb is not None and fig is not None:
            self._tb.add_figure(tag, fig, step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
