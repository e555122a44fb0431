"""Profile the DSEC supervised bench step and print top device ops.

Captures a jax.profiler trace of a few train steps on the real TPU and
parses the xplane to attribute time per fused op — the measurement tool
behind the kernel/rollout optimization work (BENCH_r*.json).

Usage: python tools/profile_bench.py [trace_dir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(trace_dir: str, top: int = 45, steps: int = 3) -> None:
    """Aggregate device time per fused-op group from the xplane trace.

    (tensorboard_plugin_profile's converter is incompatible with the baked
    tensorflow, so read the XSpace proto directly.)"""
    import re
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert files, f"no xplane under {trace_dir}"
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(sorted(files)[-1], "rb").read())

    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        total = defaultdict(float)
        count = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                # strip trailing .N fusion indices to group duplicates
                key = re.sub(r"\.\d+$", "", name)
                total[key] += ev.duration_ps / 1e9  # -> ms
                count[key] += 1
        grand = sum(total.values())
        print(f"\n== {plane.name}: {grand / steps:.2f} ms/step over {steps} steps ==")
        print(f"{'ms/step':>9}  {'%':>5}  {'n':>5}  op")
        for key, ms in sorted(total.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ms / steps:9.3f}  {100 * ms / grand:5.1f}  "
                  f"{count[key]:5d}  {key[:110]}")


def ddd17_step():
    """The bench_extra DDD17 supervised step + batch (VERDICT r4 #4: the
    DDD17 shape needs its own attribution — 200x352, 6 classes, temporal-
    bilinear integer coords, resize-to-352 pipeline)."""
    import jax

    import bench_extra
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state
    import numpy as np

    b, t, n = 16, 20, 32_000
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(200, 346)),
            sensor_b=EventDatasetConfig(
                name="DDD17_events", shape=(200, 346), nr_events_data=t,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess_supervised",
                          compute_dtype="bfloat16",
                          lstm_impl_train="pallas_int8"),
        task=TaskConfig(semseg_num_classes=6),
        optim=OptimConfig(batch_size_b=b))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = EventPipeline(PipelineConfig(
        sensor_height=260, sensor_width=346, num_bins=5, normalize=True,
        crop_bottom=60, resize_to=(200, 352)))
    rng = np.random.default_rng(0)
    batch = bench_extra.make_event_batch(
        rng, b, t, n, 260, 346, (mods.recon_train.height,
                                 mods.recon_train.width), 6, int_coords=True)
    step = sup.make_train_step(mods, pipe)
    return step, state, batch


def bench_extra_streaming_cfg():
    """The streaming bench's exact Config (bench_extra.bench_streaming_eval)."""
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)

    return Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(440, 640)),
            sensor_b=EventDatasetConfig(
                name="DSEC_events", shape=(440, 640), nr_events_data=20,
                nr_temporal_bins=5, nr_events_window=100_000)),
        model=ModelConfig(model_name="ess_supervised",
                          compute_dtype="bfloat16"),
        task=TaskConfig(semseg_num_classes=11),
        optim=OptimConfig(batch_size_b=1))


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    argv = [a for a in sys.argv[1:]]
    config = "dsec"
    if "--config" in argv:
        i = argv.index("--config")
        config = argv[i + 1]
        del argv[i:i + 2]
    trace_dir = argv[0] if argv else "/tmp/ess_profile"

    import jax
    import numpy as np

    import bench

    # Build the bench step + batch exactly as bench.main does.
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state

    if config == "ddd17":
        step, state, batch = ddd17_step()
        state, out = step(state, batch)
        float(out["loss"])  # warmup/compile
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            state, out = step(state, batch)
            float(out["loss"])
        jax.profiler.stop_trace()
        print("trace written to", trace_dir)
        parse_xplane(trace_dir)
        return

    if config == "uda":
        # VERDICT r5 #2: the DSEC UDA train step has never been
        # xplane-attributed — profile the EXACT bench_extra.bench_uda_dsec
        # program (image branch + 3 head passes + cycle losses + 2 opts)
        import bench_extra
        from ess_tpu.train import uda as uda_mod

        cfg = bench_extra.make_uda_dsec_cfg()
        pipe, batch = bench_extra.make_uda_dsec_inputs()
        mods = build_modules(cfg)
        state = init_state(mods, jax.random.PRNGKey(0))
        step = uda_mod.make_train_step(mods, pipe)
        state, out = step(state, batch)
        float(out["loss"])  # warmup/compile
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            state, out = step(state, batch)
            float(out["loss"])
        jax.profiler.stop_trace()
        print("trace written to", trace_dir)
        parse_xplane(trace_dir)
        return

    if config == "streaming":
        # VERDICT r4 #8: the B=1 carried-state long-horizon eval shape
        # (bench_extra.bench_streaming_eval) — 19 encode windows + 1 scored
        # window per cycle, exactly as the streaming bench runs it.
        import jax.numpy as jnp

        import bench_extra
        from ess_tpu.train.streaming import make_streaming_steps

        cfg = bench_extra_streaming_cfg()
        mods = build_modules(cfg)
        state = init_state(mods, jax.random.PRNGKey(0))
        pipe = EventPipeline(PipelineConfig(
            sensor_height=480, sensor_width=640, num_bins=5,
            crop_bottom=40, trilinear=True, normalize=True))
        encode_step, score_step = make_streaming_steps(mods, pipe)
        rng = np.random.default_rng(0)
        batch = bench_extra.make_event_batch(
            rng, 1, 1, 100_000, 480, 640, (440, 640), 11)
        first = dict(batch, is_first=jnp.ones((1,), bool))
        rest = dict(batch, is_first=jnp.zeros((1,), bool))
        rs = mods.recon_val.init_state(1)
        rs = encode_step(state, rs, first)
        rs, cm = score_step(state, rs, rest)
        float(cm.sum())  # warmup/compile both programs
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            for _ in range(19):
                rs = encode_step(state, rs, rest)
            rs, cm = score_step(state, rs, rest)
            float(cm.sum())
        jax.profiler.stop_trace()
        print("trace written to", trace_dir)
        # 3 cycles x 20 windows: per-step numbers below are per CYCLE / 3;
        # divide by 20 for per-window
        parse_xplane(trace_dir)
        return

    # the EXACT bench.py program: shared config, pipeline, and (folded)
    # batch builders, so profiles attribute the driver metric's step.
    # --pipe key=value overrides PipelineConfig fields (bool/int parsed).
    pipe_kw = {}
    while "--pipe" in argv:
        i = argv.index("--pipe")
        k, v = argv[i + 1].split("=")
        pipe_kw[k] = {"True": True, "False": False}.get(v, v)
        del argv[i:i + 2]
    trace_dir = argv[0] if argv else trace_dir
    cfg = bench.make_cfg()
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipeline = bench.make_pipeline(**pipe_kw)
    step = sup.make_train_step(mods, pipeline)
    batch = bench.make_batch(folded=True)

    state, out = step(state, batch)
    float(out["loss"])  # warmup/compile

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, out = step(state, batch)
        float(out["loss"])
    jax.profiler.stop_trace()
    print("trace written to", trace_dir)
    parse_xplane(trace_dir)


if __name__ == "__main__":
    main()
