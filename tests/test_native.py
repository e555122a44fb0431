"""Tests for the native C++ host-ingest kernels (with numpy-fallback parity)."""

import numpy as np
import pytest

from ess_tpu.data import native
from ess_tpu.data.slicer import pad_windows


def test_native_builds():
    assert native.available(), "g++ build of native/ess_host.cpp failed"


def test_searchsorted_matches_numpy(rng):
    t = np.sort(rng.integers(0, 10_000, 500)).astype(np.int64)
    q = rng.integers(-10, 10_010, 64).astype(np.int64)
    got = native.searchsorted_i64(t, q)
    np.testing.assert_array_equal(got, np.searchsorted(t, q, side="left"))


def test_pad_windows_f64_matches_python(rng):
    n = 300
    ev = np.stack([
        rng.integers(0, 64, n), rng.integers(0, 48, n),
        np.sort(rng.integers(0, 100000, n)), rng.integers(0, 2, n),
    ], axis=1).astype(np.float64)
    starts = np.array([0, 100, 250], np.int64)
    ends = np.array([100, 250, 300], np.int64)
    got, gvalid = native.pad_windows_from_bounds(ev, starts, ends, capacity=160)
    ref, rvalid = pad_windows([ev[s:e] for s, e in zip(starts, ends)], 160)
    np.testing.assert_allclose(got, ref)
    np.testing.assert_array_equal(gvalid, rvalid)


def test_pad_windows_f64_overflow_tail(rng):
    n = 50
    ev = np.stack([np.arange(n)] * 4, axis=1).astype(np.float64)
    got, valid = native.pad_windows_from_bounds(
        ev, np.array([0], np.int64), np.array([50], np.int64), capacity=8)
    np.testing.assert_allclose(got[0, :, 0], np.arange(42, 50))
    assert valid.all()


def test_pad_windows_ddd17_layout(rng):
    n = 200
    t = np.sort(rng.integers(0, 10**12, n)).astype(np.int64)
    xyp = np.stack([
        rng.integers(0, 346, n), rng.integers(0, 260, n), rng.integers(0, 2, n),
    ], axis=1).astype(np.int16)
    starts = np.array([10, 100], np.int64)
    ends = np.array([100, 200], np.int64)
    got, valid = native.pad_windows_ddd17(t, xyp, starts, ends, capacity=128)
    assert got.shape == (2, 128, 4)
    assert valid[0].sum() == 90 and valid[1].sum() == 100
    # re-zeroed timestamps stay exact in f32
    np.testing.assert_allclose(got[0, :90, 2], (t[10:100] - t[10]).astype(np.float32))
    np.testing.assert_allclose(got[1, :100, 0], xyp[100:200, 0])


def test_host_voxelize_trilinear_parity(rng):
    """C++ trilinear voxelizer matches the JAX reference kernel."""
    import jax.numpy as jnp
    from ess_tpu.ops.voxel import EventWindow, voxel_grid_trilinear

    t_dim, n, h, w, bins = 2, 300, 20, 24, 5
    ev = np.zeros((t_dim, n, 4), np.float32)
    ev[..., 0] = rng.uniform(0, w - 1, (t_dim, n))
    ev[..., 1] = rng.uniform(0, h - 1, (t_dim, n))
    ev[..., 2] = np.sort(rng.uniform(0, 1e4, (t_dim, n)), axis=-1)
    ev[..., 3] = rng.integers(0, 2, (t_dim, n))
    valid = np.ones((t_dim, n), bool)
    valid[1, 200:] = False

    got = native.voxelize_host(ev, valid, num_bins=bins, height=h, width=w,
                               trilinear=True)
    for i in range(t_dim):
        ref = voxel_grid_trilinear(
            EventWindow.from_arrays(ev[i, :, 0], ev[i, :, 1], ev[i, :, 2],
                                    ev[i, :, 3], valid[i]),
            num_bins=bins, height=h, width=w)
        np.testing.assert_allclose(got[i], np.asarray(ref), atol=1e-4)


def test_host_voxelize_temporal_parity(rng):
    import jax.numpy as jnp
    from ess_tpu.ops.voxel import EventWindow, voxel_grid_temporal

    t_dim, n, h, w, bins = 2, 300, 16, 16, 5
    ev = np.zeros((t_dim, n, 4), np.float32)
    ev[..., 0] = rng.integers(0, w, (t_dim, n))
    ev[..., 1] = rng.integers(0, h, (t_dim, n))
    ev[..., 2] = np.sort(rng.uniform(0, 1e4, (t_dim, n)), axis=-1)
    ev[..., 3] = rng.integers(0, 2, (t_dim, n))
    valid = np.ones((t_dim, n), bool)

    for sep in (False, True):
        got = native.voxelize_host(ev, valid, num_bins=bins, height=h, width=w,
                                   separate_pol=sep)
        for i in range(t_dim):
            ref = voxel_grid_temporal(
                EventWindow.from_arrays(ev[i, :, 0], ev[i, :, 1], ev[i, :, 2],
                                        ev[i, :, 3], valid[i]),
                num_bins=bins, height=h, width=w, separate_pol=sep)
            np.testing.assert_allclose(got[i], np.asarray(ref), atol=1e-4)


def test_tile_bin_matches_numpy(rng):
    """Native counting-sort tile binning == the numpy argsort fallback."""
    import ess_tpu.data.native as native
    from ess_tpu.ops.voxel_pallas import host_tile_bin

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    T, N, H, W = 3, 2000, 48, 256
    raw = np.zeros((T, N, 4), np.float32)
    raw[..., 0] = rng.uniform(-4, W + 4, (T, N))
    raw[..., 1] = rng.uniform(-4, H + 4, (T, N))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (T, N)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (T, N))
    valid = rng.random((T, N)) > 0.2

    got = host_tile_bin(raw, valid, height=H, width=W, bins=5)
    lib = native._lib
    try:
        native._lib, native._build_failed = None, True
        ref = host_tile_bin(raw, valid, height=H, width=W, bins=5)
    finally:
        native._lib, native._build_failed = lib, False
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ingest_rectify_bin_matches_chain(rng):
    """Fused native ingest == rectify -> pad_windows -> host_tile_bin."""
    import ess_tpu.data.native as native
    from ess_tpu.data.slicer import pad_windows
    from ess_tpu.ops.voxel_pallas import host_tile_bin, tile_h_for_bins

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    T, N, H, W = 4, 1500, 48, 256
    total = T * N
    ev = {
        "x": rng.integers(0, W, total).astype(np.uint16),
        "y": rng.integers(0, H, total).astype(np.uint16),
        "t": np.cumsum(rng.integers(1, 30, total)).astype(np.int64),
        "p": rng.integers(0, 2, total).astype(np.uint8),
    }
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rmap = np.stack([xx + rng.normal(0, 0.4, xx.shape).astype(np.float32),
                     yy + rng.normal(0, 0.4, yy.shape).astype(np.float32)],
                    axis=-1)
    starts = np.arange(T, dtype=np.int64) * N
    got = native.ingest_rectify_bin(ev, starts, starts + N, N, rmap,
                                    tile_h=tile_h_for_bins(5))
    assert got is not None

    # reference chain
    rect = rmap[ev["y"], ev["x"]]
    chunks = []
    for w in range(T):
        sl = slice(w * N, (w + 1) * N)
        e = np.stack([rect[sl, 0], rect[sl, 1],
                      ev["t"][sl].astype(np.float64),
                      ev["p"][sl].astype(np.float64)], axis=1)
        chunks.append(e)
    raw, valid = pad_windows(chunks, N)
    ref = host_tile_bin(raw, valid, height=H, width=W, bins=5)
    np.testing.assert_array_equal(got[1], ref[1])
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_allclose(got[0], ref[0], atol=1e-4)


def test_packed_ingest_voxel_parity(rng):
    """The packed u16 wire format (quantized coords + pre-normalized time)
    voxelizes to grids within quantization tolerance of the f32 path."""
    import jax.numpy as jnp

    import ess_tpu.data.native as native
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig, to_soa
    from ess_tpu.ops.voxel_pallas import tile_h_for_bins

    if not native.available():
        pytest.skip("native lib unavailable")
    T, N, H, W = 3, 1500, 48, 256
    total = T * N
    ev = {
        "x": rng.integers(0, W, total).astype(np.uint16),
        "y": rng.integers(0, H, total).astype(np.uint16),
        "t": np.cumsum(rng.integers(1, 30, total)).astype(np.int64),
        "p": rng.integers(0, 2, total).astype(np.uint8),
    }
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rmap = np.stack([xx + rng.normal(0, 0.4, xx.shape).astype(np.float32),
                     yy + rng.normal(0, 0.4, yy.shape).astype(np.float32)],
                    axis=-1)
    starts = np.arange(T, dtype=np.int64) * N
    th = tile_h_for_bins(5)

    f32 = native.ingest_rectify_bin(ev, starts, starts + N, N, rmap,
                                    tile_h=th)
    pk = native.ingest_rectify_bin_packed(ev, starts, starts + N, N, rmap,
                                          tile_h=th)
    assert pk is not None
    # same events kept per window (quantization may only move an event
    # BETWEEN tiles, never drop it)
    np.testing.assert_array_equal(pk["tile_offsets"][:, -1],
                                  f32[2][:, -1])
    assert pk["ev_xq"].dtype == np.uint16

    pipe = EventPipeline(PipelineConfig(
        sensor_height=H, sensor_width=W, num_bins=5, trilinear=True,
        normalize=False, use_pallas=True, pallas_interpret=True))
    batchify = lambda d: {k: jnp.asarray(np.asarray(v)[None])
                          for k, v in d.items()}
    g_pk, _ = pipe.build_all(batchify(to_soa(dict(pk))))
    raw, valid, offs = f32
    soa = to_soa({"raw_events": raw, "valid": valid, "tile_offsets": offs})
    g_f32, _ = pipe.build_all(batchify(soa))
    # coords quantized at 1/64 px shift corner weights by <= 1/64 each;
    # border events in (-1, 0) clamp to the frame edge on the packed wire
    # (full weight instead of the fractional corner weight), so isolated
    # border cells can differ by up to ~1
    diff = np.abs(np.asarray(g_pk) - np.asarray(g_f32))
    assert diff.max() <= 1.01, diff.max()
    assert np.mean(diff) < 5e-3


def test_native_band_bin_folded_matches_numpy():
    """Native ghost-folded band binning == the numpy fallback, judged by
    the voxel grids they produce (within-band record order is free)."""
    import jax.numpy as jnp
    import ess_tpu.data.native as native
    from ess_tpu.ops import voxel_pallas as vp
    from ess_tpu.ops.batch_voxel import voxelize_window_soa

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    t_dim, n, h, w = 2, 600, 24, 256
    raw = np.zeros((t_dim, n, 4), np.float32)
    raw[..., 0] = rng.uniform(-0.9, w - 0.05, (t_dim, n))  # incl. edge zone
    raw[..., 1] = rng.uniform(-0.9, h - 0.05, (t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (t_dim, n))
    valid = np.ones((t_dim, n), bool)
    valid[:, 550:] = False

    got_nat = native.band_bin_folded(
        raw, valid, height=h, width=w, tile_h=vp.tile_h_for_bins(5))
    assert got_nat is not None
    # force the numpy fallback through the public entry point
    orig = native.band_bin_folded
    native.band_bin_folded = lambda *a, **k: None
    try:
        got_np = vp.host_band_bin_folded(raw, valid, height=h, width=w,
                                         bins=5)
    finally:
        native.band_bin_folded = orig

    def grid(res):
        r, v, o = res
        return voxelize_window_soa(
            jnp.asarray(r[..., 0]), jnp.asarray(r[..., 1]),
            jnp.asarray(r[..., 2]), jnp.asarray(r[..., 3]), jnp.asarray(v),
            num_bins=5, height=h, width=w, trilinear=True, use_pallas=True,
            pallas_interpret=True, oh_dtype=jnp.float32,
            tile_offsets=jnp.asarray(o), offsets_kind="band")

    np.testing.assert_array_equal(got_nat[2], got_np[2])  # identical offsets
    np.testing.assert_allclose(np.asarray(grid(got_nat)),
                               np.asarray(grid(got_np)),
                               atol=1e-4, rtol=1e-5)


def test_folded_capacity_pathological_skew():
    """VERDICT r4 #6: event mass concentrated on band-boundary rows AND
    x-slot boundary columns makes (almost) every event split into multiple
    ghost records — way past the default ~14% margin. The binner must not
    assert: both the native path and the numpy fallback grow to the SAME
    quantized capacity level (stable batch shapes), and the voxel grid
    still matches the scatter reference exactly (zero dropped weight)."""
    import jax.numpy as jnp
    import ess_tpu.data.native as native
    from ess_tpu.ops import voxel_pallas as vp
    from ess_tpu.ops.batch_voxel import voxelize_window_soa

    rng = np.random.default_rng(5)
    t_dim, n, h, w = 2, 600, 72, 256
    th = vp.tile_h_for_bins(5)
    raw = np.zeros((t_dim, n, 4), np.float32)
    # every event straddles a band boundary (fractional y just below a
    # tile_h multiple) and an x-slot boundary (fractional x just below 128)
    raw[..., 0] = 127.0 + rng.uniform(0.05, 0.95, (t_dim, n))
    band = rng.integers(0, h // th - 1, (t_dim, n))
    raw[..., 1] = (band + 1) * th - 1 + rng.uniform(0.05, 0.95, (t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (t_dim, n))
    valid = np.ones((t_dim, n), bool)
    valid[:, 560:] = False

    orig = native.band_bin_folded
    native.band_bin_folded = lambda *a, **k: None
    try:
        got_np = vp.host_band_bin_folded(raw, valid, height=h, width=w,
                                         bins=5, x_slots=True)
    finally:
        native.band_bin_folded = orig

    cap_np = got_np[0].shape[1]
    assert cap_np > native.folded_capacity(n)          # it really overflowed
    # capacity is a quantized level, not the raw per-sample count
    assert cap_np == native.quantize_folded_capacity(cap_np, n) or \
        cap_np == native.quantize_folded_capacity(
            int(got_np[1].sum(axis=1).max()), n)

    def grid(res):
        r, v, o = res
        return voxelize_window_soa(
            jnp.asarray(r[..., 0]), jnp.asarray(r[..., 1]),
            jnp.asarray(r[..., 2]), jnp.asarray(r[..., 3]), jnp.asarray(v),
            num_bins=5, height=h, width=w, trilinear=True, use_pallas=True,
            pallas_interpret=True, oh_dtype=jnp.float32,
            tile_offsets=jnp.asarray(o), offsets_kind="band")

    ref = voxelize_window_soa(
        jnp.asarray(raw[..., 0]), jnp.asarray(raw[..., 1]),
        jnp.asarray(raw[..., 2]), jnp.asarray(raw[..., 3]),
        jnp.asarray(valid), num_bins=5, height=h, width=w, trilinear=True,
        use_pallas=False)
    np.testing.assert_allclose(np.asarray(grid(got_np)), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)

    if native.available():
        ntx = w // 128
        got_nat = native.band_bin_folded(
            raw, valid, height=h, width=w, tile_h=th, ntx=ntx, slot_w=128)
        assert got_nat[0].shape == got_np[0].shape  # same quantized level
        np.testing.assert_array_equal(got_nat[2], got_np[2])
        np.testing.assert_allclose(np.asarray(grid(got_nat)),
                                   np.asarray(ref), atol=2e-3, rtol=1e-4)


def test_packed_folded_ingest_voxel_parity(rng):
    """The packed + folded wire (VERDICT r4 #5): ghost-folded band records
    as quantized SoA columns with i8 PRE-WEIGHTED polarity. Coords quantize
    to the 1/64 grid BEFORE folding, so grouping/tents agree exactly; the
    grids match the f32 folded wire within quantization tolerance — and
    unlike the halo packed wire, edge-zone (-1, 0) events keep their exact
    folded sub-pixel weight (up to the i8 step)."""
    import jax.numpy as jnp

    import ess_tpu.data.native as native
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig, to_soa
    from ess_tpu.ops.voxel_pallas import tile_h_for_bins

    if not native.available():
        pytest.skip("native lib unavailable")
    T, N, H, W = 3, 1500, 48, 256
    total = T * N
    ev = {
        "x": rng.integers(0, W, total).astype(np.uint16),
        "y": rng.integers(0, H, total).astype(np.uint16),
        "t": np.cumsum(rng.integers(1, 30, total)).astype(np.int64),
        "p": rng.integers(0, 2, total).astype(np.uint8),
    }
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rmap = np.stack([xx + rng.normal(0, 0.4, xx.shape).astype(np.float32),
                     yy + rng.normal(0, 0.4, yy.shape).astype(np.float32)],
                    axis=-1)
    starts = np.arange(T, dtype=np.int64) * N
    th = tile_h_for_bins(5)
    ntx = W // 128

    f32 = native.ingest_rectify_bin_folded(
        ev, starts, starts + N, N, rmap, tile_h=th, ntx=ntx, slot_w=128)
    pk = native.ingest_rectify_bin_packed_folded(
        ev, starts, starts + N, N, rmap, tile_h=th, ntx=ntx, slot_w=128)
    assert pk is not None and f32 is not None
    assert pk["ev_pq"].dtype == np.int8
    assert pk["ev_xq"].shape == f32[0].shape[:2]  # same capacity policy

    pipe = EventPipeline(PipelineConfig(
        sensor_height=H, sensor_width=W, num_bins=5, trilinear=True,
        normalize=False, use_pallas=True, pallas_interpret=True))
    batchify = lambda d: {k: jnp.asarray(np.asarray(v)[None])
                          for k, v in d.items()}
    g_pk, _ = pipe.build_all(batchify(to_soa(dict(pk))))
    raw, valid, offs = f32
    soa = to_soa({"raw_events": raw, "valid": valid, "band_offsets": offs})
    # the f32 folded wire carries raw per-window times; normalize the same
    # way the packed wire did (span of the window's raw extremes)
    g_f32, _ = pipe.build_all(batchify(soa))
    diff = np.abs(np.asarray(g_pk) - np.asarray(g_f32))
    # 1/64-px coord quantization shifts corner weights <= 1/64 each; the
    # i8 weight step adds <= 1/254 per record
    assert diff.max() <= 0.25, diff.max()
    assert np.mean(diff) < 5e-3
