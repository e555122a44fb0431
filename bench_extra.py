"""Extended benchmarks (not the driver metric): per-config train-step
throughput on the real TPU chip, recorded in BASELINE.md.

Scenarios (BASELINE.json configs):
- DDD17 supervised: B16 x T20 x 32k events, 260x346 -> 200x352, 6 classes
- DSEC supervised:  B8 x T20 x 100k events, 480x640 -> 440x640, 11 classes
  (the driver's bench.py metric)
- DSEC UDA: adds the Cityscapes image branch + cycle losses + both optimizers

Usage: python bench_extra.py
"""

import time

import numpy as np


def make_event_batch(rng, b, t, n, sensor_h, sensor_w, label_hw, classes,
                     int_coords=False):
    import jax.numpy as jnp
    from ess_tpu.ops.voxel_pallas import host_tile_bin

    shape = (b, t, n)
    raw = np.zeros(shape + (4,), np.float32)
    if int_coords:
        raw[..., 0] = rng.integers(0, sensor_w, shape)
        raw[..., 1] = rng.integers(0, sensor_h, shape)
    else:
        raw[..., 0] = rng.uniform(0, sensor_w - 1, shape)
        raw[..., 1] = rng.uniform(0, sensor_h - 1, shape)
    raw[..., 2] = np.sort(rng.uniform(0, 5e4, shape), axis=-1)
    raw[..., 3] = rng.integers(0, 2, shape)
    valid = np.ones(shape, bool)
    sraw = np.empty_like(raw)
    svalid = np.empty_like(valid)
    offs = []
    for i in range(b):
        sraw[i], svalid[i], o = host_tile_bin(
            raw[i], valid[i], height=sensor_h, width=sensor_w)
        offs.append(o)
    return {
        "ev_x": jnp.asarray(sraw[..., 0]), "ev_y": jnp.asarray(sraw[..., 1]),
        "ev_t": jnp.asarray(sraw[..., 2]), "ev_p": jnp.asarray(sraw[..., 3]),
        "ev_valid": jnp.asarray(svalid),
        "ev_tile_offsets": jnp.asarray(np.stack(offs)),
        "label": jnp.asarray(
            rng.integers(0, classes, (b,) + label_hw), jnp.int32),
    }


def time_step(step, state, batch, iters=5):
    state, out = step(state, batch)
    float(out["loss"])
    tl = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, out = step(state, batch)
        float(out["loss"])
        tl.append(time.perf_counter() - t0)
    return min(tl)


def bench_supervised(name, *, b, t, n, sensor, label_hw, classes, pipe_kw):
    import jax
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state

    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=label_hw),
            sensor_b=EventDatasetConfig(
                name=name, shape=label_hw, nr_events_data=t,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess_supervised", compute_dtype="bfloat16"),
        task=TaskConfig(semseg_num_classes=classes),
        optim=OptimConfig(batch_size_b=b))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = EventPipeline(PipelineConfig(
        sensor_height=sensor[0], sensor_width=sensor[1], num_bins=5,
        normalize=True, **pipe_kw))
    rng = np.random.default_rng(0)
    batch = make_event_batch(rng, b, t, n, sensor[0], sensor[1],
                             mods.recon_train.geometry.height and
                             (mods.recon_train.height, mods.recon_train.width),
                             classes, int_coords=not pipe_kw.get("trilinear"))
    # labels must match the recon output size for the supervised step
    batch["label"] = batch["label"]
    step = sup.make_train_step(mods, pipe)
    dt = time_step(step, state, batch)
    print(f"{name} supervised: {dt*1e3:.0f} ms/step -> "
          f"{b*t/dt:.0f} windows/s", flush=True)


def bench_uda_dsec():
    import jax
    import jax.numpy as jnp
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.train import uda as uda_mod
    from ess_tpu.train.builder import build_modules, init_state

    b, t, n = 8, 20, 100_000
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(440, 640), random_crop=False),
            sensor_b=EventDatasetConfig(
                name="DSEC_events", shape=(440, 640), nr_events_data=t,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess", compute_dtype="bfloat16",
                          data_augmentation_train=False),
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
    tl = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, losses = step(state, batch)
        float(losses["loss"])
        tl.append(time.perf_counter() - t0)
    dt = min(tl)
    print(f"DSEC UDA: {dt*1e3:.0f} ms/step -> {b*t/dt:.0f} event-windows/s",
          flush=True)


def main():
    bench_supervised("DDD17_events", b=16, t=20, n=32_000,
                     sensor=(260, 346), label_hw=(200, 346), classes=6,
                     pipe_kw={"crop_bottom": 60, "resize_to": (200, 352)})
    bench_supervised("DSEC_events", b=8, t=20, n=100_000,
                     sensor=(480, 640), label_hw=(440, 640), classes=11,
                     pipe_kw={"crop_bottom": 40, "trilinear": True})
    bench_uda_dsec()


if __name__ == "__main__":
    main()
