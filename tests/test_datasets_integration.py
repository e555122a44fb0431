"""Integration tests: DDD17 / DSEC / Cityscapes loaders over synthetic files
laid out exactly like the real datasets."""

import os

import numpy as np
import pytest

from ess_tpu.data.ddd17 import DDD17Events
from ess_tpu.data.dsec import DSECEvents, DSECSequence, SequenceRecurrent
from ess_tpu.data.cityscapes import CityscapesGray


def make_ddd17_dir(root, n_dirs=7, n_masks=3, n_events=5000, seed=0):
    """Fake DDD17 tree: dir*/events.dat.{t,xyp}, index/, segmentation_masks/."""
    import cv2

    rng = np.random.default_rng(seed)
    for d in range(n_dirs):
        ddir = os.path.join(root, f"dir{d}")
        os.makedirs(os.path.join(ddir, "index"), exist_ok=True)
        os.makedirs(os.path.join(ddir, "segmentation_masks"), exist_ok=True)
        t = np.sort(rng.integers(0, 10**9, n_events)).astype(np.int64)
        xyp = np.stack([
            rng.integers(0, 346, n_events), rng.integers(0, 260, n_events),
            rng.integers(0, 2, n_events)], axis=1).astype(np.int16)
        t.tofile(os.path.join(ddir, "events.dat.t"))
        xyp.tofile(os.path.join(ddir, "events.dat.xyp"))
        # index rows: (timestamp_ns, event_idx, event_idx_before)
        idx = []
        for m in range(n_masks):
            ei = (m + 1) * n_events // (n_masks + 1)
            idx.append((int(t[ei]), ei, max(ei - 1000, 0)))
        np.save(os.path.join(ddir, "index", "index_50ms.npy"),
                np.array(idx, np.int64))
        for m in range(n_masks):
            mask = rng.integers(0, 6, (260, 346)).astype(np.uint8)
            cv2.imwrite(
                os.path.join(ddir, "segmentation_masks", f"seg_{m + 1:05d}.png"),
                mask)


def test_ddd17_dataset(tmp_path):
    pytest.importorskip("cv2")
    make_ddd17_dir(str(tmp_path))
    ds = DDD17Events(str(tmp_path), split="train", nr_events_data=4,
                     nr_events_window=512)
    assert len(ds) == 5 * 3  # 5 train dirs x 3 masks
    s = ds[0]
    assert s["raw_events"].shape == (4, 512, 4)
    assert s["valid"].shape == (4, 512)
    assert s["label"].shape == (200, 352)
    # equal-count chunks: (event_idx // T) events per window
    ei = (0 + 1) * 5000 // 4  # first mask's event_idx in the fixture
    per = min(ei // 4, 512)
    assert (s["valid"].sum(axis=1) == per).all()
    # coordinates within sensor bounds
    ev = s["raw_events"][s["valid"]]
    assert ev[:, 0].max() < 346 and ev[:, 1].max() < 260


def test_ddd17_fixed_duration(tmp_path):
    pytest.importorskip("cv2")
    make_ddd17_dir(str(tmp_path))
    ds = DDD17Events(str(tmp_path), split="valid", nr_events_data=4,
                     nr_events_window=512, fixed_duration=True)
    s = ds[0]
    assert s["raw_events"].shape == (4, 512, 4)
    # fixed-duration windows have increasing (re-zeroed) time origins
    assert s["valid"].sum() > 0


def make_dsec_seq(seq_dir, n_events=20000, n_labels=10, seed=0):
    import cv2
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(seq_dir, "semantic", "11classes", "data"),
                exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "events", "left"), exist_ok=True)

    t = np.sort(rng.integers(0, 1_000_000, n_events)).astype(np.int64)  # 1s
    with h5py.File(os.path.join(seq_dir, "events", "left", "events.h5"), "w") as f:
        f.create_dataset("events/x", data=rng.integers(0, 640, n_events).astype(np.uint16))
        f.create_dataset("events/y", data=rng.integers(0, 480, n_events).astype(np.uint16))
        f.create_dataset("events/t", data=t)
        f.create_dataset("events/p", data=rng.integers(0, 2, n_events).astype(np.uint8))
        last_ms = t[-1] // 1000 + 1
        ms = np.arange(last_ms + 1, dtype=np.int64) * 1000
        f.create_dataset("ms_to_idx", data=np.searchsorted(t, ms))
        f.create_dataset("t_offset", data=np.int64(0))
    yy, xx = np.mgrid[0:480, 0:640]
    rect = np.stack([xx, yy], axis=-1).astype(np.float32)
    with h5py.File(os.path.join(seq_dir, "events", "left", "rectify_map.h5"), "w") as f:
        f.create_dataset("rectify_map", data=rect)

    ts = np.linspace(400_000, 990_000, n_labels).astype(np.int64)
    np.savetxt(os.path.join(seq_dir, "semantic", "timestamps.txt"), ts, fmt="%d")
    for i in range(n_labels):
        lbl = rng.integers(0, 11, (440, 640)).astype(np.uint8)
        cv2.imwrite(os.path.join(seq_dir, "semantic", "11classes", "data",
                                 f"{i:06d}.png"), lbl)


def test_dsec_sequence(tmp_path):
    pytest.importorskip("h5py")
    pytest.importorskip("cv2")
    seq = str(tmp_path / "train" / "zurich_city_00_a")
    make_dsec_seq(seq, n_labels=10)
    ds = DSECEvents(str(tmp_path), mode="train", nr_events_data=4,
                    nr_events_window=1024)
    # 10 labels - 6 skipped = 4 remaining, stride 2 -> 2 samples
    assert len(ds) == 2
    s = ds[0]
    # default r4 wire: ghost-folded band bins (capacity-padded records)
    assert "band_offsets" in s
    assert s["raw_events"].shape[0] == 4 and s["raw_events"].shape[1] >= 1024
    assert s["label"].shape == (440, 640)
    assert s["valid"].any()
    assert ds.rectify_map.shape == (480, 640, 2)
    # explicit tile mode keeps the halo-kernel contract
    tile = DSECEvents(str(tmp_path), mode="train", nr_events_data=4,
                      nr_events_window=1024, binning="tile")[0]
    assert tile["raw_events"].shape == (4, 1024, 4)
    assert "tile_offsets" in tile


def test_dsec_recurrent_stream(tmp_path):
    pytest.importorskip("h5py")
    pytest.importorskip("cv2")
    seq_dir = str(tmp_path / "train" / "zurich_city_00_a")
    make_dsec_seq(seq_dir, n_labels=10)
    seq = DSECSequence(seq_dir, nr_events_data=1, nr_events_window=1024)
    stream = SequenceRecurrent(seq, nr_events_window=1024)
    assert len(stream) > 0
    first = stream[0]
    assert first["is_first"]
    assert "band_offsets" in first  # folded default wire
    assert first["raw_events"].shape[0] == 1
    assert first["raw_events"].shape[1] >= 1024
    labels = [i for i in range(len(stream)) if stream[i]["has_label"]]
    assert labels, "no windows aligned with labels"
    assert stream[labels[0]]["label"].shape == (440, 640)


def test_dsec_recurrent_stream_rectifies(tmp_path):
    """Streamed windows must carry RECTIFIED float coords, exactly like the
    random-access path (reference sequence_recurrent.py:239)."""
    pytest.importorskip("h5py")
    pytest.importorskip("cv2")
    import h5py
    from ess_tpu.data.slicer import events_dict_to_xytp

    seq_dir = str(tmp_path / "train" / "zurich_city_00_a")
    make_dsec_seq(seq_dir, n_labels=10)
    # non-identity map: x += 0.25, y += 0.5 (clipped in-bounds)
    path = os.path.join(seq_dir, "events", "left", "rectify_map.h5")
    with h5py.File(path, "r+") as f:
        m = f["rectify_map"][()]
        m[..., 0] = np.clip(m[..., 0] + 0.25, 0, 639.0)
        m[..., 1] = np.clip(m[..., 1] + 0.5, 0, 479.0)
        f["rectify_map"][...] = m

    # tile mode: this test checks raw rectified coordinates, which the
    # folded wire intentionally rewrites at edges/band boundaries
    seq = DSECSequence(seq_dir, nr_events_data=1, nr_events_window=1024,
                       binning="tile")
    stream = SequenceRecurrent(seq, nr_events_window=1024)
    s = stream[1]
    got = s["raw_events"][0][s["valid"][0]]
    # parity with the random-access path's rectification for the same slice
    raw = seq.slicer.get_events_fixed_num_recurrent(1024, 2048)
    expect = seq._rectify(events_dict_to_xytp(raw))
    expect[:, 2] -= expect[0, 2]  # pad_windows re-zeroes t per window
    assert got.shape == expect.shape
    order = lambda a: a[np.lexsort((a[:, 3], a[:, 2], a[:, 1], a[:, 0]))]
    np.testing.assert_allclose(order(got), order(expect), rtol=0, atol=1e-5)
    # fractional coordinates prove the map gather actually happened
    frac = got[:, 0] % 1.0
    assert np.allclose(frac[got[:, 0] < 639], 0.25)


def make_cityscapes(root, n=3, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "leftImg8bit", "train", "cityA")
    lbl_dir = os.path.join(root, "gtFine", "train", "cityA")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 255, (256, 512, 3)).astype(np.uint8)
        lbl = rng.integers(0, 34, (256, 512)).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"cityA_{i:06d}_leftImg8bit.png"), img)
        cv2.imwrite(os.path.join(lbl_dir, f"cityA_{i:06d}_gtFine_labelIds.png"), lbl)


def test_cityscapes_random_crop_mode(tmp_path):
    pytest.importorskip("cv2")
    make_cityscapes(str(tmp_path))
    ds = CityscapesGray(str(tmp_path), height=200, width=352,
                        semseg_num_classes=6, augmentation=True,
                        random_crop=True)
    s = ds[0]
    assert s["image"].shape == (200, 352, 1)
    assert s["label"].shape == (200, 352)
    valid = s["label"][s["label"] != 255]
    assert valid.size == 0 or valid.max() < 6


def test_cityscapes_full_frame_mode(tmp_path):
    pytest.importorskip("cv2")
    make_cityscapes(str(tmp_path))
    ds = CityscapesGray(str(tmp_path), height=440, width=640,
                        semseg_num_classes=11, augmentation=False,
                        random_crop=False)
    s = ds[0]
    assert s["image"].shape == (440, 640, 1)
    assert s["label"].shape == (440, 640)
    assert s["image"].max() <= 1.0


def test_ddd17_gray(tmp_path):
    pytest.importorskip("cv2")
    import cv2
    make_ddd17_dir(str(tmp_path))
    # add paired frames
    for d in range(7):
        img_dir = os.path.join(str(tmp_path), f"dir{d}", "imgs")
        os.makedirs(img_dir, exist_ok=True)
        for m in range(3):
            img = (np.ones((260, 346)) * 100).astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"img_{m + 1:05d}.png"), img)

    from ess_tpu.data.ddd17_gray import ConcatImages, DDD17Gray
    ds = DDD17Gray(str(tmp_path), split="train")
    assert len(ds) == 15
    s = ds[0]
    assert s["image"].shape == (200, 352, 1)
    assert s["label"].shape == (200, 352)

    both = ConcatImages(ds, DDD17Gray(str(tmp_path), split="valid"))
    assert len(both) == 15 + 3
    assert both[16]["image"].shape == (200, 352, 1)


def test_dsec_fixed_duration_fused_matches_legacy(tmp_path):
    """Fixed-duration fused native ingest == the per-window slicer chain."""
    pytest.importorskip("h5py")
    pytest.importorskip("cv2")
    from ess_tpu.data import native as native_mod

    if not native_mod.available():
        pytest.skip("native lib unavailable")
    seq_dir = str(tmp_path / "train" / "zurich_city_00_a")
    make_dsec_seq(seq_dir, n_labels=10)
    mk = lambda **kw: DSECSequence(seq_dir, nr_events_data=4,
                              nr_events_window=600,
                              fixed_duration=True, delta_t_per_data=50, **kw)
    seq = mk(binning="tile")
    fused = seq[0]
    assert "tile_offsets" in fused

    legacy_seq = mk(binning="tile")
    legacy_seq._fused_ingest_duration = lambda *a, **k: None
    legacy = legacy_seq[0]
    np.testing.assert_array_equal(fused["valid"], legacy["valid"])
    np.testing.assert_array_equal(fused["tile_offsets"],
                                  legacy["tile_offsets"])
    np.testing.assert_allclose(fused["raw_events"], legacy["raw_events"],
                               atol=1e-4)
    np.testing.assert_array_equal(fused["label"], legacy["label"])

    # folded wire: fused native ingest == the numpy fallback chain (same
    # band offsets; same per-band record multisets — within-band order is
    # free between the two implementations)
    f_seq = mk()
    f_fused = f_seq[0]
    assert "band_offsets" in f_fused
    np_seq = mk()
    np_seq._fused_ingest_duration = lambda *a, **k: None
    f_np = np_seq[0]
    np.testing.assert_array_equal(f_fused["band_offsets"],
                                  f_np["band_offsets"])
    order = lambda a: a[np.lexsort((a[:, 3], a[:, 2], a[:, 1], a[:, 0]))]
    for w in range(4):
        a = f_fused["raw_events"][w][f_fused["valid"][w]]
        b = f_np["raw_events"][w][f_np["valid"][w]]
        np.testing.assert_allclose(order(a), order(b), atol=1e-4)
