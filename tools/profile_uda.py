"""Profile the DSEC UDA train step (bench_extra.bench_uda_dsec's exact
program) and print the top device ops — the measurement tool behind the
UDA-throughput work (VERDICT round-2 item #2).

Usage: python tools/profile_uda.py [trace_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from profile_bench import parse_xplane  # noqa: E402 (same dir)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ess_uda_profile"
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.train import uda as uda_mod
    from ess_tpu.train.builder import build_modules, init_state
    from bench_extra import make_event_batch

    b, t, n = 8, 20, 100_000
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(440, 640), random_crop=False),
            sensor_b=EventDatasetConfig(
                name="DSEC_events", shape=(440, 640), nr_events_data=t,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess", compute_dtype="bfloat16",
                          data_augmentation_train=False,
                          lstm_impl_train="pallas_int8"),
        task=TaskConfig(semseg_num_classes=11),
        optim=OptimConfig(batch_size_a=b, batch_size_b=b))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = EventPipeline(PipelineConfig(
        sensor_height=480, sensor_width=640, num_bins=5, crop_bottom=40,
        trilinear=True, normalize=True))
    rng = np.random.default_rng(0)
    batch = make_event_batch(rng, b, t, n, 480, 640, (440, 640), 11)
    batch["image_a"] = jnp.asarray(
        rng.normal(size=(b, 440, 640, 1)), jnp.float32)
    batch["label_a"] = jnp.asarray(
        rng.integers(0, 11, (b, 440, 640)), jnp.int32)
    batch.pop("label")
    step = uda_mod.make_train_step(mods, pipe)

    state, losses = step(state, batch)
    float(losses["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, losses = step(state, batch)
        float(losses["loss"])
    print(f"trace written to {trace_dir}", flush=True)
    parse_xplane(trace_dir, top=45)


if __name__ == "__main__":
    main()
