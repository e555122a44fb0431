"""Extended benchmarks (not the driver metric): per-config train-step
throughput on the real TPU chip, recorded in BASELINE.md.

Scenarios (BASELINE.json configs):
- DDD17 supervised: B16 x T20 x 32k events, 260x346 -> 200x352, 6 classes
- DSEC supervised:  B8 x T20 x 100k events, 480x640 -> 440x640, 11 classes
  (the driver's bench.py metric)
- DSEC UDA: adds the Cityscapes image branch + cycle losses + both optimizers

Usage: python bench_extra.py
"""

import json
import time

import numpy as np


def emit(metric: str, windows_per_sec: float, baseline=None) -> None:
    """One driver-style JSON line per config (VERDICT r3 #6): the >=5x
    north star is per-chip throughput on EACH workload, so every scenario
    publishes the same machine-readable record bench.py does."""
    rec = {"metric": metric, "value": round(windows_per_sec, 2),
           "unit": "windows/s"}
    if baseline:
        rec["vs_baseline"] = round(windows_per_sec / baseline, 3)
    print(json.dumps(rec), flush=True)

# Per-config reference-baseline estimates (windows/s on the reference's
# GPU-class hardware), anchored at bench.py's grounded 160 w/s DSEC
# supervised estimate and scaled by MEASURED torch-CPU full-step compute
# ratios on this host (tools/bench_torch_reference{,_uda}.py, identical
# hardware/threads/assumptions per config — BASELINE.md records each
# datum), capped at the config's ingest ceiling (the reference's
# VoxelGrid.convert is events-proportional: 40 ms/100k-event window
# single-thread => joblib-8 caps DSEC at ~200 w/s, DDD17's 32k windows at
# ~625 w/s):
#   DSEC supervised  0.19 w/s torch-CPU  -> 160 (the anchor)
#   DSEC UDA         0.15 w/s (0.79x)    -> 126
#   DDD17 supervised 1.21 w/s (6.4x)     -> min(1019, 625) = 625
#   DDD17 UDA        1.81 w/s (9.5x)     -> min(1525, 625) = 625
BASELINES = {
    "DSEC_supervised": 160.0,
    "DSEC_uda": 126.0,
    "DDD17_supervised": 625.0,
    "DDD17_uda": 625.0,
}


def make_event_batch(rng, b, t, n, sensor_h, sensor_w, label_hw, classes,
                     int_coords=False, folded=True):
    """Synthetic loader-shaped batch. ``folded=True`` (default, matching the
    r4 DSEC loader wire) emits ghost-folded band bins for the fold-free
    kernel; False keeps halo tile bins."""
    import jax.numpy as jnp
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded, host_tile_bin

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
    sraw, svalid, offs = [], [], []
    for i in range(b):
        if folded:
            r2, v2, o = host_band_bin_folded(
                raw[i], valid[i], height=sensor_h, width=sensor_w,
                trilinear=not int_coords, x_slots=True)
        else:
            r2, v2, o = host_tile_bin(
                raw[i], valid[i], height=sensor_h, width=sensor_w)
        sraw.append(r2)
        svalid.append(v2)
        offs.append(o)
    sraw, svalid = np.stack(sraw), np.stack(svalid)
    offs_key = "ev_band_offsets" if folded else "ev_tile_offsets"
    return {
        "ev_x": jnp.asarray(sraw[..., 0]), "ev_y": jnp.asarray(sraw[..., 1]),
        "ev_t": jnp.asarray(sraw[..., 2]), "ev_p": jnp.asarray(sraw[..., 3]),
        "ev_valid": jnp.asarray(svalid),
        offs_key: jnp.asarray(np.stack(offs)),
        "label": jnp.asarray(
            rng.integers(0, classes, (b,) + label_hw), jnp.int32),
    }


def time_step(step, state, batch, iters=10):
    """Queued-dispatch timing: steps chain through the donated state; one
    final scalar fetch amortizes the tunnel round-trip (per-iteration
    fetches measure RTT, not the step)."""
    state, out = step(state, batch)
    float(out["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, batch)
    float(out["loss"])
    return (time.perf_counter() - t0) / iters


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
        model=ModelConfig(model_name="ess_supervised", compute_dtype="bfloat16",
                          lstm_impl_train="pallas_int8"),
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
    base = BASELINES[name.split("_")[0] + "_supervised"]
    print(f"{name} supervised: {dt*1e3:.0f} ms/step -> "
          f"{b*t/dt:.0f} windows/s ({b*t/dt/base:.2f}x est. baseline "
          f"{base:.0f})", flush=True)
    emit(f"{name.split('_')[0].lower()}_supervised_train_event_windows_"
         "per_sec_per_chip", b * t / dt, base)


UDA_DSEC_B, UDA_DSEC_T, UDA_DSEC_N = 8, 20, 100_000


def make_uda_dsec_cfg():
    """The DSEC UDA benchmark config (shared with
    tools/bench_uda_increments.py so attribution measures the same step)."""
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)

    b, t, n = UDA_DSEC_B, UDA_DSEC_T, UDA_DSEC_N
    return Config(
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


def make_uda_dsec_inputs():
    """(pipeline, batch) for the DSEC UDA benchmark step."""
    import jax.numpy as jnp
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig

    b, t, n = UDA_DSEC_B, UDA_DSEC_T, UDA_DSEC_N
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
    return pipe, batch


def bench_uda_dsec():
    import jax
    from ess_tpu.train import uda as uda_mod
    from ess_tpu.train.builder import build_modules, init_state

    b, t = UDA_DSEC_B, UDA_DSEC_T
    cfg = make_uda_dsec_cfg()
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe, batch = make_uda_dsec_inputs()
    step = uda_mod.make_train_step(mods, pipe)

    state, losses = step(state, batch)
    float(losses["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch)
    float(losses["loss"])
    dt = (time.perf_counter() - t0) / iters
    base = BASELINES["DSEC_uda"]
    print(f"DSEC UDA: {dt*1e3:.0f} ms/step -> {b*t/dt:.0f} event-windows/s "
          f"({b*t/dt/base:.2f}x est. baseline {base:.0f})", flush=True)
    emit("dsec_uda_train_event_windows_per_sec_per_chip", b * t / dt, base)


def bench_uda_ddd17():
    """ESS UDA on DDD17 (BASELINE.json config 2): Cityscapes frames ->
    DDD17 events at the reference's 120x216 train crop, temporal-bilinear
    voxelization, cycle losses, both optimizers."""
    import jax
    import jax.numpy as jnp
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.train import uda as uda_mod
    from ess_tpu.train.builder import build_modules, init_state, make_pipeline

    b, t, n = 16, 20, 32_000
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(120, 216)),
            sensor_b=EventDatasetConfig(
                name="DDD17_events", shape=(200, 346), nr_events_data=t,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess", compute_dtype="bfloat16",
                          data_augmentation_train=True,
                          lstm_impl_train="pallas_int8"),
        task=TaskConfig(semseg_num_classes=6),
        optim=OptimConfig(batch_size_a=b, batch_size_b=b))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = make_pipeline(cfg, train=True)  # 260x346 -> resize -> 120x216 crop
    rng = np.random.default_rng(0)
    batch = make_event_batch(rng, b, t, n, 260, 346, (120, 216), 6,
                             int_coords=True)
    batch["image_a"] = jnp.asarray(
        rng.normal(size=(b, 120, 216, 1)), jnp.float32)
    batch["label_a"] = jnp.asarray(
        rng.integers(0, 6, (b, 120, 216)), jnp.int32)
    batch.pop("label")
    step = uda_mod.make_train_step(mods, pipe)

    state, losses = step(state, batch)
    float(losses["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch)
    float(losses["loss"])
    dt = (time.perf_counter() - t0) / iters
    base = BASELINES["DDD17_uda"]
    print(f"DDD17 UDA: {dt*1e3:.0f} ms/step -> {b*t/dt:.0f} event-windows/s "
          f"({b*t/dt/base:.2f}x est. baseline {base:.0f})", flush=True)
    emit("ddd17_uda_train_event_windows_per_sec_per_chip", b * t / dt, base)


def bench_streaming_eval(b=1, n=100_000, windows_per_score=20, iters=8,
                         sensor=(480, 640), label_hw=(440, 640),
                         crop_bottom=40):
    """Streaming long-horizon inference at the DSEC shape (BASELINE.json
    config 5; the reference's ImageReconstructor + SequenceRecurrent eval
    path, image_reconstructor.py:18-185 / sequence_recurrent.py:249-267):
    B=1 carried-state windows, encoder-only until a labeled window, then
    decode + head + on-device confusion matrix. Exercises the eval-side
    blocked decoder tail. Reports ms/window and windows/s (no reference
    baseline exists: the reference publishes no inference throughput)."""
    import jax
    import jax.numpy as jnp
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.train.builder import build_modules, init_state
    from ess_tpu.train.streaming import make_streaming_steps

    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=label_hw),
            sensor_b=EventDatasetConfig(
                name="DSEC_events", shape=label_hw, nr_events_data=20,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess_supervised",
                          compute_dtype="bfloat16"),
        task=TaskConfig(semseg_num_classes=11),
        optim=OptimConfig(batch_size_b=b))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = EventPipeline(PipelineConfig(
        sensor_height=sensor[0], sensor_width=sensor[1], num_bins=5,
        crop_bottom=crop_bottom, trilinear=True, normalize=True))
    encode_step, score_step = make_streaming_steps(mods, pipe)

    rng = np.random.default_rng(0)
    batch = make_event_batch(rng, b, 1, n, sensor[0], sensor[1], label_hw,
                             11)
    first = dict(batch, is_first=jnp.ones((b,), bool))
    rest = dict(batch, is_first=jnp.zeros((b,), bool))

    recon_state = mods.recon_val.init_state(b)
    recon_state = encode_step(state, recon_state, first)   # compile both
    recon_state, cm = score_step(state, recon_state, rest)
    float(cm.sum())

    t0 = time.perf_counter()
    total = 0
    for _ in range(iters):
        for _ in range(windows_per_score - 1):
            recon_state = encode_step(state, recon_state, rest)
        recon_state, cm = score_step(state, recon_state, rest)
        total += windows_per_score
    float(cm.sum())
    dt = (time.perf_counter() - t0) / total
    print(f"DSEC streaming eval (B={b}, labeled 1/{windows_per_score}): "
          f"{dt*1e3:.1f} ms/window -> {b/dt:.0f} windows/s", flush=True)
    suffix = "" if b == 1 else f"_b{b}"
    emit(f"dsec_streaming_eval{suffix}_windows_per_sec_per_chip", b / dt)


class _SyntheticDSEC:
    """DSEC-shaped dataset doing the REAL per-sample host work: rectify-map
    lookup on raw integer coords, fixed-capacity window pad, and native tile
    binning — exactly DSECSequence.__getitem__'s pipeline on synthetic
    events, so the ingest benchmark measures loader CPU cost faithfully."""

    def __init__(self, t, n, sensor_h, sensor_w, classes, length=64,
                 wire="f32"):
        self.wire = wire
        rng = np.random.default_rng(7)
        self.t, self.n = t, n
        self.h, self.w = sensor_h, sensor_w
        # identity-ish rectification map with subpixel distortion
        yy, xx = np.mgrid[0:sensor_h, 0:sensor_w].astype(np.float32)
        self.rectify_map = np.stack(
            [xx + rng.normal(0, 0.3, xx.shape).astype(np.float32),
             yy + rng.normal(0, 0.3, yy.shape).astype(np.float32)], axis=-1)
        # one shared raw recording; samples slice it at different phases
        self.xy = rng.integers(
            0, [sensor_w, sensor_h], (t * n + length, 2)).astype(np.uint16)
        self.ts = np.cumsum(rng.integers(1, 20, t * n + length)).astype(np.int64)
        self.pol = rng.integers(0, 2, t * n + length).astype(np.uint8)
        self.label = rng.integers(0, classes, (sensor_h - 40, sensor_w))
        self.length = length

    def __len__(self):
        return self.length

    def __getitem__(self, i):
        from ess_tpu.data import native
        from ess_tpu.ops.voxel_pallas import host_tile_bin, tile_h_for_bins

        t, n = self.t, self.n
        sl = slice(i, i + t * n)
        ev = {"x": self.xy[sl, 0], "y": self.xy[sl, 1],
              "t": self.ts[sl], "p": self.pol[sl]}
        starts = np.arange(t, dtype=np.int64) * n
        if self.wire == "packed_folded":
            # r5 default-capable wire: 7-byte quantized records + ghost-
            # folded band bins (fold-free kernel) in one native pass
            pk = native.ingest_rectify_bin_packed_folded(
                ev, starts, starts + n, n, self.rectify_map,
                tile_h=tile_h_for_bins(5), ntx=-(-self.w // 128), slot_w=128)
            if pk is not None:
                pk["label"] = self.label.astype(np.uint8)
                return pk
        if self.wire == "packed":
            pk = native.ingest_rectify_bin_packed(
                ev, starts, starts + n, n, self.rectify_map,
                tile_h=tile_h_for_bins(5))
            if pk is not None:
                pk["label"] = self.label.astype(np.uint8)
                return pk
        got = native.ingest_rectify_bin(
            ev, starts, starts + n, n, self.rectify_map,
            tile_h=tile_h_for_bins(5))
        if got is None:  # numpy fallback: the pre-fused loader chain
            rect = self.rectify_map[ev["y"], ev["x"]]
            raw = np.empty((t, n, 4), np.float32)
            raw[..., 0] = rect[:, 0].reshape(t, n)
            raw[..., 1] = rect[:, 1].reshape(t, n)
            tt = ev["t"].reshape(t, n)
            raw[..., 2] = tt - tt[:, :1]  # per-window re-zero (pad_windows)
            raw[..., 3] = ev["p"].reshape(t, n)
            valid = np.ones((t, n), bool)
            got = host_tile_bin(raw, valid, height=self.h, width=self.w,
                                bins=5)
        raw, valid, offsets = got
        return {"raw_events": raw, "valid": valid, "tile_offsets": offsets,
                "label": self.label.astype(np.uint8)}


def bench_ingest_dsec(num_workers=None, wire="f32"):
    """Sustained loader->device throughput (VERDICT round-1 missing #3):
    host ingest (rectify + pad + native tile binning in loader threads) ->
    SoA -> prefetch -> the jitted DSEC supervised step, fully pipelined as
    Trainer runs it. Reported next to the device-only step rate."""
    import os as _os

    import jax
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.data.loader import BatchLoader, prefetch_to_device

    if num_workers is None:
        # synthetic ingest is pure CPU (no IO to overlap): match the cores
        num_workers = max(1, min(8, _os.cpu_count() or 1))
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig, to_soa
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state

    b, t, n = 8, 20, 100_000
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(440, 640)),
            sensor_b=EventDatasetConfig(
                name="DSEC_events", shape=(440, 640), nr_events_data=t,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess_supervised", compute_dtype="bfloat16"),
        task=TaskConfig(semseg_num_classes=11),
        optim=OptimConfig(batch_size_b=b))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = EventPipeline(PipelineConfig(
        sensor_height=480, sensor_width=640, num_bins=5, crop_bottom=40,
        trilinear=True, normalize=True))
    step = sup.make_train_step(mods, pipe)
    ds = _SyntheticDSEC(t, n, 480, 640, 11, length=40, wire=wire)

    def run(n_batches):
        # collate ring is safe here: prefetch size 2, each batch is fully
        # device_put before the next three are produced
        loader = BatchLoader(ds, b, shuffle=True, num_workers=num_workers,
                             collate_buffers=4)
        it = (to_soa(bb) for bb in loader)
        count = 0
        nonlocal state
        for batch in prefetch_to_device(it):
            state, out = step(state, batch)
            count += 1
            if count >= n_batches:
                break
        float(out["loss"])
        return count

    run(6)  # compile + warm caches + fill the collate ring
    t0 = time.perf_counter()
    n_batches = run(4)
    dt = (time.perf_counter() - t0) / n_batches
    print(f"DSEC supervised incl. host ingest ({num_workers} workers, "
          f"wire={wire}): {dt*1e3:.0f} ms/batch -> {b*t/dt:.0f} windows/s "
          f"sustained", flush=True)

    # loader-only rate for the breakdown
    loader = BatchLoader(ds, b, shuffle=True, num_workers=num_workers,
                         collate_buffers=4)
    t0 = time.perf_counter()
    nb = 0
    for bb in loader:
        nb += 1
        if nb >= 4:
            break
    dt_l = (time.perf_counter() - t0) / nb
    print(f"  host ingest alone: {dt_l*1e3:.0f} ms/batch -> "
          f"{b*t/dt_l:.0f} windows/s", flush=True)


def main():
    # isolate scenarios: one toolchain/compile failure must not lose the
    # remaining datapoints (these feed BASELINE.md, not the driver metric)
    import traceback

    scenarios = [
        lambda: bench_supervised(
            "DDD17_events", b=16, t=20, n=32_000,
            sensor=(260, 346), label_hw=(200, 346), classes=6,
            pipe_kw={"crop_bottom": 60, "resize_to": (200, 352)}),
        lambda: bench_supervised(
            "DSEC_events", b=8, t=20, n=100_000,
            sensor=(480, 640), label_hw=(440, 640), classes=11,
            pipe_kw={"crop_bottom": 40, "trilinear": True}),
        bench_uda_dsec,
        bench_uda_ddd17,
        bench_streaming_eval,
        # multi-stream deployment shape: the reference's own validation
        # loader batches sequence streams (batch_size sequences in
        # parallel, sequence_recurrent.py via base_trainer dataloaders);
        # B=1 leaves XLA with T(2,128) layouts on every conv (see the
        # streaming xplane in BASELINE.md) — B=8 is the throughput shape
        lambda: bench_streaming_eval(b=8),
        lambda: bench_ingest_dsec(wire="packed_folded"),
        lambda: bench_ingest_dsec(wire="packed"),
    ]
    for s in scenarios:
        try:
            s()
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()
