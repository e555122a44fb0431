"""Streaming confusion-matrix semantic-segmentation metrics.

Capability parity with /root/reference/evaluation/metrics.py:4-65
(semseg_compute_confusion bincount trick, accumulate-per-batch, mIoU x100 and
global accuracy x100 summaries).

TPU-first: the per-batch confusion matrix is computed ON DEVICE as a single
scatter-add and is psum-friendly — in data-parallel eval each replica
accumulates its shard's matrix and one ``jax.lax.psum`` (or a host-side sum
of per-device matrices) yields the global matrix. Only the final (C, C)
matrix ever crosses to the host.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred: jax.Array, label: jax.Array, *, num_classes: int, ignore_label: int = 255
) -> jax.Array:
    """(C, C) confusion matrix with rows = true label, cols = prediction.

    Same layout as the reference's ``bincount(pred + C * label)`` reshape
    (metrics.py:22-26). Ignored pixels contribute zero weight.
    """
    valid = label != ignore_label
    p = jnp.where(valid, pred, 0).astype(jnp.int32)
    l = jnp.where(valid, label, 0).astype(jnp.int32)
    idx = (l * num_classes + p).reshape(-1)
    w = valid.reshape(-1).astype(jnp.float32)
    flat = jnp.zeros((num_classes * num_classes,), jnp.float32)
    flat = flat.at[idx].add(w)
    return flat.reshape(num_classes, num_classes)


def confusion_to_iou(conf: np.ndarray) -> tuple[np.ndarray, float]:
    """Per-class IoU (x100) and mean IoU (metrics.py:30-36)."""
    conf = np.asarray(conf, np.float64)
    diag = np.diag(conf)
    denom = conf.sum(axis=1) + conf.sum(axis=0) - diag
    iou = 100.0 * diag / np.clip(denom, 1e-12, None)
    return iou, float(iou.mean())


def confusion_to_accuracy(conf: np.ndarray) -> float:
    """Global pixel accuracy x100 (metrics.py:38-43)."""
    conf = np.asarray(conf, np.float64)
    return float(100.0 * np.diag(conf).sum() / max(conf.sum(), 1e-12))


class MetricsSemseg:
    """Streaming accumulator: update with per-batch (pred, label) or with a
    precomputed on-device confusion matrix; summarize to mIoU/acc/cm
    (reference MetricsSemseg, metrics.py:45-65)."""

    def __init__(self, num_classes: int, ignore_label: int, class_names: Sequence[str]):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.class_names = list(class_names)
        self._acc: Optional[np.ndarray] = None

    def reset(self) -> None:
        self._acc = None

    def update_batch(self, pred, label) -> None:
        cm = confusion_matrix(
            jnp.asarray(pred), jnp.asarray(label),
            num_classes=self.num_classes, ignore_label=self.ignore_label,
        )
        self.update_confusion(np.asarray(cm))

    def update_confusion(self, cm: np.ndarray) -> None:
        cm = np.asarray(cm, np.float64)
        self._acc = cm if self._acc is None else self._acc + cm

    @property
    def confusion(self) -> np.ndarray:
        if self._acc is None:
            return np.zeros((self.num_classes, self.num_classes), np.float64)
        return self._acc

    def summary(self) -> Dict[str, object]:
        iou, miou = confusion_to_iou(self.confusion)
        out: Dict[str, object] = {name: iou[i] for i, name in enumerate(self.class_names)}
        out["mean_iou"] = miou
        out["acc"] = confusion_to_accuracy(self.confusion)
        out["cm"] = self.confusion
        return out
