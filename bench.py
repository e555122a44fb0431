"""Benchmark: event-windows/sec/chip on the DSEC-shaped supervised train step.

Measures the full jitted training step — 20-window recurrent E2VID rollout
(lax.scan, bf16, encoder-only until the final window), segmentation head
forward, dice+CE loss, backward, RAdam update — at the reference's DSEC
training shape (440x640 voxel grids, 5 bins, batch 8; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no throughput numbers (BASELINE.md).
``BASELINE_WINDOWS_PER_SEC`` is our documented estimate of the PyTorch
reference's DSEC training throughput on its single-GPU setup: the reference
pipeline voxelizes on CPU inside each DataLoader worker
(~112 MB event tensor per sample, DSEC/dataset/sequence.py:255-287) and runs
a 20-iteration Python loop of E2VID forwards per batch
(ess_supervised_trainer.py:126-130); ~1 s/step for batch 8 x 20 windows
=> ~160 windows/s. Target from BASELINE.json: >= 5x => >= 800 windows/s.
"""

import json
import time

import numpy as np

BASELINE_WINDOWS_PER_SEC = 160.0

BATCH = 8
WINDOWS = 20
HEIGHT, WIDTH = 440, 640
BINS = 5
NUM_CLASSES = 11


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig,
    )
    from ess_tpu.train.builder import build_modules, init_state
    from ess_tpu.train import supervised as sup

    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(HEIGHT, WIDTH)),
            sensor_b=EventDatasetConfig(
                name="DSEC_events", shape=(HEIGHT, WIDTH),
                nr_events_data=WINDOWS, nr_temporal_bins=BINS,
                nr_events_window=100_000),
        ),
        model=ModelConfig(model_name="ess_supervised", compute_dtype="bfloat16"),
        task=TaskConfig(semseg_num_classes=NUM_CLASSES),
        optim=OptimConfig(batch_size_b=BATCH),
    )
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    step = sup.make_train_step(mods)

    rng = np.random.default_rng(0)
    batch = {
        "events": jnp.asarray(
            rng.normal(size=(BATCH, WINDOWS, HEIGHT, WIDTH, BINS)).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, NUM_CLASSES, size=(BATCH, HEIGHT, WIDTH)).astype(np.int32)),
    }

    # compile + warmup
    state, _ = step(state, batch)
    jax.block_until_ready(state)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, batch)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters

    windows_per_sec = BATCH * WINDOWS / dt
    print(json.dumps({
        "metric": "dsec_supervised_train_event_windows_per_sec_per_chip",
        "value": round(windows_per_sec, 2),
        "unit": "windows/s",
        "vs_baseline": round(windows_per_sec / BASELINE_WINDOWS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
