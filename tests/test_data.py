"""Tests for host ingest: slicer invariants, loaders, pairing, pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ess_tpu.data.slicer import (
    ArrayEventStore, EventSlicer, events_dict_to_xytp, pad_windows,
)
from ess_tpu.data.loader import BatchLoader, PairedLoader, prefetch_to_device
from ess_tpu.data.synthetic import SyntheticEvents, SyntheticImages
from ess_tpu.data.pipeline import EventPipeline, PipelineConfig


def make_store(n=5000, t_max_us=20000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.integers(0, t_max_us, n)).astype(np.int64)
    x = rng.integers(0, 64, n)
    y = rng.integers(0, 48, n)
    p = rng.integers(0, 2, n)
    return ArrayEventStore(x, y, t, p), t


def test_ms_to_idx_invariant():
    """t[ms_to_idx[ms]] >= ms*1000 > t[ms_to_idx[ms]-1]
    (eventslicer.py:18-31)."""
    store, t = make_store()
    for ms in range(1, len(store.ms_to_idx)):
        i = store.ms_to_idx[ms]
        if i < len(t):
            assert t[i] >= ms * 1000
        if i > 0:
            assert t[i - 1] < ms * 1000


def test_get_events_window():
    store, t = make_store()
    sl = EventSlicer(store)
    ev = sl.get_events(3000, 7000)
    expected = np.sum((t >= 3000) & (t < 7000))
    assert len(ev["t"]) == expected
    assert ev["t"].min() >= 3000 and ev["t"].max() < 7000


def test_get_events_with_offset():
    store, t = make_store()
    store.t_offset = 1_000_000
    sl = EventSlicer(store)
    ev = sl.get_events(1_003_000, 1_007_000)
    expected = np.sum((t >= 3000) & (t < 7000))
    assert len(ev["t"]) == expected


def test_get_events_fixed_num():
    store, t = make_store()
    sl = EventSlicer(store)
    ev = sl.get_events_fixed_num(10000, 256)
    assert len(ev["t"]) == 256
    boundary = np.searchsorted(t, 10000, side="left")
    np.testing.assert_array_equal(np.sort(ev["t"]), t[boundary - 256: boundary])


def test_fixed_num_recurrent():
    store, _ = make_store()
    sl = EventSlicer(store)
    ev = sl.get_events_fixed_num_recurrent(10, 20)
    assert len(ev["t"]) == 10


def test_pad_windows_capacity_and_relative_time():
    w1 = np.array([[1, 2, 1000.0, 1], [3, 4, 2000.0, 0]])
    w2 = np.zeros((0, 4))
    raw, valid = pad_windows([w1, w2], capacity=4)
    assert raw.shape == (2, 4, 4)
    assert valid[0].sum() == 2 and valid[1].sum() == 0
    np.testing.assert_allclose(raw[0, :2, 2], [0.0, 1000.0])  # re-zeroed times


def test_pad_windows_overflow_keeps_tail():
    w = np.stack([np.arange(10)] * 4, axis=1).astype(float)
    raw, valid = pad_windows([w], capacity=4)
    np.testing.assert_allclose(raw[0, :, 0], [6, 7, 8, 9])


def test_batch_loader_shapes():
    ds = SyntheticEvents(length=10, nr_events_data=3, nr_events_window=128)
    dl = BatchLoader(ds, batch_size=4, num_workers=2)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["raw_events"].shape == (4, 3, 128, 4)
    assert batches[0]["label"].shape == (4, 32, 32)


def test_batch_loader_sharding():
    ds = SyntheticEvents(length=16)
    a = BatchLoader(ds, batch_size=2, shuffle=False, shard_index=0, num_shards=2)
    b = BatchLoader(ds, batch_size=2, shuffle=False, shard_index=1, num_shards=2)
    assert len(a) == len(b) == 4


def test_paired_loader_restarts_shorter():
    long = BatchLoader(SyntheticEvents(length=8), batch_size=2, shuffle=False)
    short = BatchLoader(SyntheticImages(length=4), batch_size=2, shuffle=False)
    pairs = list(PairedLoader(short, long))
    assert len(pairs) == 4  # length of the longer loader
    assert all("image" in a and "raw_events" in b for a, b in pairs)


def test_prefetch_to_device():
    ds = SyntheticEvents(length=4)
    dl = BatchLoader(ds, batch_size=2, shuffle=False)
    batches = list(prefetch_to_device(iter(dl)))
    assert len(batches) == 2
    assert isinstance(batches[0]["raw_events"], jax.Array)


def test_pipeline_voxelize_and_flip(rng):
    ds = SyntheticEvents(length=4, height=24, width=32, nr_events_data=3,
                         nr_events_window=256)
    dl = BatchLoader(ds, batch_size=2, shuffle=False)
    batch = next(iter(dl))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pipe = EventPipeline(PipelineConfig(
        sensor_height=24, sensor_width=32, num_bins=5, random_flip=True))
    out = pipe(batch, jax.random.PRNGKey(0), train=True)
    assert out["events"].shape == (2, 3, 24, 32, 5)
    assert "raw_events" not in out

    # eval mode: deterministic, no flip
    out2 = pipe(batch, train=False)
    out3 = pipe(batch, train=False)
    np.testing.assert_array_equal(np.asarray(out2["events"]), np.asarray(out3["events"]))


def test_pipeline_crop_resize():
    ds = SyntheticEvents(length=2, height=26, width=34, nr_events_data=2,
                         nr_events_window=128)
    batch = next(iter(BatchLoader(ds, batch_size=2, shuffle=False)))
    batch.pop("label")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pipe = EventPipeline(PipelineConfig(
        sensor_height=26, sensor_width=34, num_bins=5,
        crop_bottom=6, resize_to=(20, 36)))
    out = pipe(batch)
    assert out["events"].shape == (2, 2, 20, 36, 5)


def test_pipeline_rectify(rng):
    """Rectify map = identity => same grids as trilinear on raw coords."""
    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w]
    ident = np.stack([xx, yy], axis=-1).astype(np.float32)
    ds = SyntheticEvents(length=2, height=h, width=w, nr_events_data=2,
                         nr_events_window=64)
    batch = next(iter(BatchLoader(ds, batch_size=2, shuffle=False)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pipe = EventPipeline(
        PipelineConfig(sensor_height=h, sensor_width=w, num_bins=5, rectify=True),
        rectify_map=ident)
    out = pipe(batch)
    assert out["events"].shape == (2, 2, h, w, 5)
    assert np.isfinite(np.asarray(out["events"])).all()


def test_make_pipeline_ddd17_uda_geometry(rng):
    """builder.make_pipeline reproduces the DDD17 train geometry: voxelize at
    260x346 -> crop 60 bottom rows -> resize 200x352 -> bottom-anchored
    120x216 crop + flip, with the label transformed consistently."""
    import jax
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, TaskConfig)
    from ess_tpu.train.builder import make_pipeline

    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(200, 352)),
            sensor_b=EventDatasetConfig(name="DDD17_events", shape=(200, 346),
                                        nr_temporal_bins=5),
        ),
        model=ModelConfig(model_name="ess", data_augmentation_train=True),
        task=TaskConfig(semseg_num_classes=6),
    )
    pipe = make_pipeline(cfg, train=True)
    assert pipe.cfg.crop_bottom == 60
    assert pipe.cfg.resize_to == (200, 352)
    assert pipe.cfg.random_crop == (120, 216)
    assert pipe.cfg.crop_anchor == "bottom"

    b, n = 2, 256
    x = jnp.asarray(rng.integers(0, 346, (b, n)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 260, (b, n)), jnp.float32)
    t = jnp.asarray(np.sort(rng.uniform(0, 1e4, (b, n)), axis=1), jnp.float32)
    p = jnp.asarray(rng.integers(0, 2, (b, n)), jnp.float32)
    valid = jnp.ones((b, n), bool)

    aug = pipe.sample_augment(jax.random.PRNGKey(0), b, train=True)
    # bottom-anchored: y offset fixed at 200 - 120 = 80
    np.testing.assert_array_equal(np.asarray(aug.crop_y), [80, 80])
    grids = pipe.make_window_fn(aug)(x, y, t, p, valid)
    assert grids.shape == (b, 120, 216, 5)

    label = jnp.asarray(rng.integers(0, 6, (b, 200, 352)), jnp.int32)
    out_label = pipe.apply_label_transform(label, aug)
    assert out_label.shape == (b, 120, 216)

    # flip consistency: where flip is set, both grid and label flip
    flips = np.asarray(aug.flip)
    grids_noflip = pipe.make_window_fn(
        type(aug)(flip=jnp.zeros((b,), bool), crop_y=aug.crop_y,
                  crop_x=aug.crop_x))(x, y, t, p, valid)
    for i in range(b):
        if flips[i]:
            np.testing.assert_allclose(
                np.asarray(grids[i]), np.asarray(grids_noflip[i][:, ::-1]),
                atol=1e-5)


def test_make_pipeline_dsec_geometry():
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, TaskConfig)
    from ess_tpu.train.builder import make_pipeline

    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(440, 640)),
            sensor_b=EventDatasetConfig(name="DSEC_events", shape=(440, 640)),
        ),
        model=ModelConfig(model_name="ess"),
        task=TaskConfig(semseg_num_classes=11),
    )
    pipe = make_pipeline(cfg, train=True)
    assert pipe.cfg.sensor_height == 480 and pipe.cfg.crop_bottom == 40
    assert pipe.cfg.trilinear and pipe.cfg.random_flip
    assert pipe.cfg.output_size(train=True) == (440, 640)


def test_h5_duration_reader(tmp_path):
    pytest.importorskip("h5py")
    import h5py
    from ess_tpu.data.readers import H5DurationReader

    rng = np.random.default_rng(0)
    n = 5000
    t = np.sort(rng.integers(0, 200_000, n)).astype(np.int64)  # 200ms
    path = str(tmp_path / "events.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("events/x", data=rng.integers(0, 64, n))
        f.create_dataset("events/y", data=rng.integers(0, 48, n))
        f.create_dataset("events/t", data=t)
        f.create_dataset("events/p", data=rng.integers(0, 2, n))
        ms = np.arange(t[-1] // 1000 + 2, dtype=np.int64) * 1000
        f.create_dataset("ms_to_idx", data=np.searchsorted(t, ms))
        f.create_dataset("t_offset", data=np.int64(0))

    windows = list(H5DurationReader(path, delta_t_ms=50.0))
    assert len(windows) >= 3
    total = sum(len(w) for w in windows)
    assert total <= n
    for w in windows:
        assert w.shape[1] == 4
        assert (np.diff(w[:, 2]) >= 0).all()


def test_resize_align_corners_matches_torch(rng):
    """The event-tensor resize reproduces torch align_corners=True
    (ddd17_events_loader.py:164)."""
    import torch
    from ess_tpu.ops.resize import resize_bilinear

    x = rng.normal(size=(2, 13, 17, 3)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(26, 35),
        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 26, 35,
                                     align_corners=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_collate_pads_mixed_folded_capacity():
    """Batch peers binned at different quantized folded-capacity levels
    (one pathological sample grew mid-epoch) collate by zero-padding the
    record axis to the batch max — for both the fresh-stack path and the
    preallocated-ring path."""
    from ess_tpu.data.loader import _alloc_like, _collate

    t_dim, small, big = 3, 100, 150
    def sample(cap):
        return {
            "raw_events": np.full((t_dim, cap, 4), 2.0, np.float32),
            "valid": np.ones((t_dim, cap), bool),
            "band_offsets": np.zeros((t_dim, 4), np.int32),
            "label": np.zeros((8, 8), np.uint8),
        }
    batch = _collate([sample(small), sample(big)])
    assert batch["raw_events"].shape == (2, t_dim, big, 4)
    assert batch["valid"].shape == (2, t_dim, big)
    assert not batch["valid"][0, :, small:].any()
    assert (batch["raw_events"][0, :, small:] == 0).all()
    assert (batch["raw_events"][1] == 2.0).all()

    out = _alloc_like([sample(small), sample(small)])
    batch2 = _collate([sample(small), sample(big)], out=out)
    assert batch2["raw_events"].shape == (2, t_dim, big, 4)
    assert batch2["valid"].shape == (2, t_dim, big)
