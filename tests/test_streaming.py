"""Streaming long-horizon eval tests (carried state, per-sequence resets)."""

import numpy as np
import jax
import pytest

from ess_tpu.core.config import (
    Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
    ModelConfig, OptimConfig, TaskConfig,
)
from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
from ess_tpu.data.slicer import pad_windows
from ess_tpu.train.builder import build_modules, init_state
from ess_tpu.train.streaming import run_streaming_eval


def make_stream(rng, n_windows=6, h=16, w=16, n=128, label_every=3):
    for i in range(n_windows):
        x = rng.integers(0, w, n).astype(np.float64)
        y = rng.integers(0, h, n).astype(np.float64)
        t = np.sort(rng.uniform(i * 100, (i + 1) * 100, n))
        p = rng.integers(0, 2, n).astype(np.float64)
        raw, valid = pad_windows([np.stack([x, y, t, p], 1)], n)
        out = {
            "raw_events": raw, "valid": valid,
            "is_first": np.bool_(i == 0),
            "has_label": np.bool_(i % label_every == label_every - 1),
        }
        if out["has_label"]:
            out["label"] = rng.integers(0, 6, (h, w)).astype(np.int32)
        else:
            out["label"] = np.zeros((h, w), np.int32)
        yield out


def test_streaming_eval_accumulates(rng):
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(16, 16)),
            sensor_b=EventDatasetConfig(name="synthetic_events", shape=(16, 16),
                                        nr_events_data=1),
        ),
        model=ModelConfig(model_name="ess_supervised", e2vid_base_channels=8,
                          compute_dtype="float32"),
        task=TaskConfig(semseg_num_classes=6),
        optim=OptimConfig(),
    )
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = EventPipeline(PipelineConfig(sensor_height=16, sensor_width=16,
                                        num_bins=5, normalize=True))
    metrics = run_streaming_eval(mods, state, make_stream(rng), pipe)
    s = metrics.summary()
    # 2 labeled windows out of 6, each 16x16 pixels
    assert s["cm"].sum() == 2 * 16 * 16
    assert 0 <= s["mean_iou"] <= 100
