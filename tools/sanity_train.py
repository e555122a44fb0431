"""On-chip production-scale training sanity: DSEC-shaped supervised overfit.

Builds ONE synthetic DSEC-scale batch whose event statistics are label-
correlated (per-class event density + polarity bias over a band scene), then
runs N supervised train steps on the real TPU and reports the loss
trajectory and train-batch mIoU. Used as the end-to-end numerics regression
for kernel/precision changes (bf16 tent planes, s2d fold, fused losses):
learning must still happen and nothing may go NaN.

Usage: python tools/sanity_train.py [steps=40]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def make_scene_batch(rng, b, t, n, sensor_h, sensor_w, classes, crop_bottom):
    """Label-correlated events: class c bands get event density ∝ (c+1) and
    polarity bias c/(classes-1)."""
    import jax.numpy as jnp

    from ess_tpu.ops.voxel_pallas import host_tile_bin

    band_h = sensor_h // classes
    label_full = np.minimum(
        np.arange(sensor_h)[:, None] // band_h, classes - 1
    ) * np.ones((1, sensor_w), np.int64)

    # sample event y positions with density ∝ class+1
    weights = (label_full[:, 0] + 1).astype(np.float64)
    weights /= weights.sum()
    shape = (b, t, n)
    ys = rng.choice(sensor_h, size=shape, p=weights).astype(np.float32)
    xs = rng.uniform(0, sensor_w - 1, shape).astype(np.float32)
    cls = np.minimum(ys.astype(np.int64) // band_h, classes - 1)
    p_pos = cls / (classes - 1)
    ps = (rng.random(shape) < p_pos).astype(np.float32)
    ts = np.sort(rng.uniform(0, 5e4, shape), axis=-1).astype(np.float32)

    raw = np.stack([xs, ys, ts, ps], axis=-1)
    valid = np.ones(shape, bool)
    sraw = np.empty_like(raw)
    svalid = np.empty_like(valid)
    offs = []
    for i in range(b):
        sraw[i], svalid[i], o = host_tile_bin(
            raw[i], valid[i], height=sensor_h, width=sensor_w, bins=5)
        offs.append(o)
    label = label_full[: sensor_h - crop_bottom]
    return {
        "ev_x": jnp.asarray(sraw[..., 0]), "ev_y": jnp.asarray(sraw[..., 1]),
        "ev_t": jnp.asarray(sraw[..., 2]), "ev_p": jnp.asarray(sraw[..., 3]),
        "ev_valid": jnp.asarray(svalid),
        "ev_tile_offsets": jnp.asarray(np.stack(offs)),
        "label": jnp.asarray(np.broadcast_to(
            label, (b,) + label.shape).copy(), jnp.int32),
    }


def main(steps: int = 40) -> None:
    import jax

    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state
    from ess_tpu.train.metrics import confusion_to_iou

    b, t, n = 8, 20, 100_000
    classes = 11
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(440, 640)),
            sensor_b=EventDatasetConfig(
                name="DSEC_events", shape=(440, 640), nr_events_data=t,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess_supervised",
                          compute_dtype="bfloat16"),
        task=TaskConfig(semseg_num_classes=classes),
        optim=OptimConfig(batch_size_b=b, lr_back=1e-3))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipeline = EventPipeline(PipelineConfig(
        sensor_height=480, sensor_width=640, num_bins=5, crop_bottom=40,
        trilinear=True, normalize=True))
    train_step = sup.make_train_step(mods, pipeline)
    eval_step = sup.make_eval_step(mods, pipeline)

    rng = np.random.default_rng(0)
    batch = make_scene_batch(rng, b, t, n, 480, 640, classes, 40)

    losses = []
    for i in range(steps):
        state, out = train_step(state, batch)
        loss = float(out["loss"])
        assert np.isfinite(loss), f"non-finite loss at step {i}"
        losses.append(loss)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:3d}: loss {loss:.4f}", flush=True)

    ev = eval_step(state, batch)
    _, miou = confusion_to_iou(np.asarray(ev["cm"]))  # already x100
    miou = float(miou)
    print(f"final: loss {losses[-1]:.4f} (from {losses[0]:.4f}), "
          f"train-batch mIoU {miou:.1f}")
    assert losses[-1] < 0.7 * losses[0], "loss did not decrease enough"
    print("SANITY OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
