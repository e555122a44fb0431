"""Parity tests for the tiled Pallas voxelization kernel (interpret mode).

The kernel's MXU one-hot formulation must reproduce the scatter-based
reference voxelizers exactly — including padded sensors (DDD17 260x346),
masked events, separate-polarity channels, and the temporal-bilinear
special case.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ess_tpu.ops.batch_voxel import voxelize_window_soa


def make_soa(rng, b=2, n=700, h=24, w=256, float_coords=True, pad_from=600):
    if float_coords:
        x = rng.uniform(0, w - 1, (b, n)).astype(np.float32)
        y = rng.uniform(0, h - 1, (b, n)).astype(np.float32)
    else:
        x = rng.integers(0, w, (b, n)).astype(np.float32)
        y = rng.integers(0, h, (b, n)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e4, (b, n)), axis=1).astype(np.float32)
    p = rng.integers(0, 2, (b, n)).astype(np.float32)
    valid = np.ones((b, n), bool)
    valid[:, pad_from:] = False
    return map(jnp.asarray, (x, y, t, p, valid))


def both(args, **kw):
    ref = voxelize_window_soa(*args, use_pallas=False, **kw)
    # f32 tent planes: exact parity with the scatter reference
    got = voxelize_window_soa(*args, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)
    # bf16 tent planes (production default): 8-bit-mantissa corner weights,
    # f32 accumulation — bounded relative error
    got16 = voxelize_window_soa(*args, use_pallas=True, pallas_interpret=True,
                                **kw)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref),
                               atol=0.02, rtol=0.03)
    return got


def test_pallas_trilinear_aligned(rng):
    args = list(make_soa(rng))
    both(args, num_bins=5, height=24, width=256, trilinear=True)


def test_pallas_trilinear_unaligned_sensor(rng):
    """DDD17-like sensor (not 8/128 aligned) pads + crops."""
    args = list(make_soa(rng, h=26, w=170))
    g = both(args, num_bins=5, height=26, width=170, trilinear=True)
    assert g.shape == (2, 26, 170, 5)


def test_pallas_temporal(rng):
    args = list(make_soa(rng, float_coords=False))
    both(args, num_bins=5, height=24, width=256)


def test_pallas_temporal_separate_pol(rng):
    args = list(make_soa(rng, float_coords=False))
    g = both(args, num_bins=4, height=24, width=256, separate_pol=True)
    assert g.shape[-1] == 8


def test_pallas_normalize(rng):
    args = list(make_soa(rng))
    g = both(args, num_bins=5, height=24, width=256, trilinear=True,
             normalize=True)
    arr = np.asarray(g[0])
    nz = arr[arr != 0]
    np.testing.assert_allclose(nz.mean(), 0.0, atol=1e-3)


def test_pallas_s2d_layout(rng):
    """layout='s2d' emits exactly space_to_depth(nhwc grid)."""
    from ess_tpu.ops.conv_s2d import space_to_depth

    args = list(make_soa(rng))
    kw = dict(num_bins=5, height=24, width=256, trilinear=True,
              use_pallas=True, pallas_interpret=True, oh_dtype=jnp.float32)
    nhwc = voxelize_window_soa(*args, **kw)
    s2d = voxelize_window_soa(*args, layout="s2d", **kw)
    assert s2d.shape == (2, 12, 128, 20)
    np.testing.assert_array_equal(np.asarray(s2d),
                                  np.asarray(space_to_depth(nhwc)))


def test_pipeline_build_all_s2d(rng):
    """EventPipeline.build_all(layout='s2d') == space_to_depth(nhwc build),
    including bottom crop and horizontal flip expressed in block space."""
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.conv_s2d import space_to_depth

    b, t_dim, n, h, w = 2, 3, 500, 24, 256
    batch = {
        "ev_x": jnp.asarray(rng.uniform(0, w - 1, (b, t_dim, n)), jnp.float32),
        "ev_y": jnp.asarray(rng.uniform(0, h - 1, (b, t_dim, n)), jnp.float32),
        "ev_t": jnp.asarray(
            np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1), jnp.float32),
        "ev_p": jnp.asarray(rng.integers(0, 2, (b, t_dim, n)), jnp.float32),
        "ev_valid": jnp.ones((b, t_dim, n), bool),
        "label": jnp.asarray(rng.integers(0, 5, (b, h - 8, w)), jnp.int32),
    }
    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, crop_bottom=8, random_flip=True,
        use_pallas=True, pallas_interpret=True))
    assert pipe.s2d_capable(train=True)
    key = jax.random.PRNGKey(3)
    ref, lbl_ref = pipe.build_all(batch, key, train=True)
    got, lbl_got = pipe.build_all(batch, key, train=True, layout="s2d",
                                  out_dtype=jnp.float32)
    assert got.shape == (b, t_dim, (h - 8) // 2, w // 2, 20)
    ref_s2d = jax.vmap(space_to_depth, in_axes=1, out_axes=1)(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_s2d),
                               atol=0.03, rtol=0.03)
    np.testing.assert_array_equal(np.asarray(lbl_got), np.asarray(lbl_ref))

    # time-major build (window-major kernel grid): same grids, (T, B) axes
    got_tm, lbl_tm = pipe.build_all(batch, key, train=True, layout="s2d",
                                    out_dtype=jnp.float32, time_major=True)
    np.testing.assert_allclose(np.asarray(got_tm),
                               np.asarray(jnp.swapaxes(got, 0, 1)),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(lbl_tm), np.asarray(lbl_ref))


def test_host_tile_bin_offsets_parity(rng):
    """Host-binned events + offsets produce the same grids as device binning."""
    import numpy as np
    from ess_tpu.ops.voxel_pallas import host_tile_bin

    b, n, h, w = 2, 500, 24, 256
    raw = np.zeros((b, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, n))
    valid = np.ones((b, n), bool)
    valid[:, 400:] = False

    from ess_tpu.ops.voxel_pallas import tile_h_for_bins
    th = tile_h_for_bins(5)
    sraw, svalid, offs = host_tile_bin(raw, valid, height=h, width=w, bins=5)
    assert offs.shape[1] == (-(-24 // th)) * (256 // 128) + 1
    assert (offs[:, -1] == 400).all()

    args_ref = [jnp.asarray(raw[..., i]) for i in range(4)] + [jnp.asarray(valid)]
    ref = voxelize_window_soa(*args_ref, num_bins=5, height=h, width=w,
                              trilinear=True, use_pallas=True,
                              pallas_interpret=True)
    args_binned = [jnp.asarray(sraw[..., i]) for i in range(4)] + [jnp.asarray(svalid)]
    got = voxelize_window_soa(*args_binned, num_bins=5, height=h, width=w,
                              trilinear=True, use_pallas=True,
                              tile_offsets=jnp.asarray(offs),
                              pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("bins", [1, 2, 3, 8])
def test_pallas_bins_variants(rng, bins):
    """Tile geometry adapts per bin count; parity holds for each."""
    args = list(make_soa(rng, n=400, pad_from=350))
    g = both(args, num_bins=bins, height=24, width=256, trilinear=True)
    assert g.shape[-1] == bins


def test_pallas_edge_cases(rng):
    """Empty windows, single events, and exact-boundary coordinates."""
    h, w, bins = 24, 256, 5
    # all invalid -> zero grid
    x = jnp.zeros((1, 64)); y = jnp.zeros((1, 64))
    t = jnp.zeros((1, 64)); p = jnp.ones((1, 64))
    none_valid = jnp.zeros((1, 64), bool)
    g = voxelize_window_soa(x, y, t, p, none_valid, num_bins=bins, height=h,
                            width=w, trilinear=True, use_pallas=True,
                            pallas_interpret=True)
    assert float(jnp.abs(g).sum()) == 0.0

    # single event at the far corner with t at the last bin boundary
    x = jnp.full((1, 8), w - 1.0); y = jnp.full((1, 8), h - 1.0)
    t = jnp.full((1, 8), 123.0); p = jnp.ones((1, 8))
    valid = jnp.zeros((1, 8), bool).at[0, 0].set(True)
    kw = dict(num_bins=bins, height=h, width=w, trilinear=True)
    ref = voxelize_window_soa(x, y, t, p, valid, use_pallas=False, **kw)
    got = voxelize_window_soa(x, y, t, p, valid, use_pallas=True,
                              pallas_interpret=True, oh_dtype=jnp.float32,
                              **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # the whole polarity lands at the corner cell of the last bin
    assert abs(float(got[0, h - 1, w - 1, 0]) - 1.0) < 1e-5

    # fully out-of-frame coordinates are dropped, never wrapped
    # (coords in (-1, 0) are BORDER events — see test_pallas_border_events)
    x = jnp.asarray([[-1.5, float(w), 3.0]]); y = jnp.asarray([[2.0, 2.0, -1.5]])
    t = jnp.zeros((1, 3)); p = jnp.ones((1, 3))
    valid = jnp.ones((1, 3), bool)
    got = voxelize_window_soa(x, y, t, p, valid, use_pallas=True,
                              pallas_interpret=True, oh_dtype=jnp.float32,
                              **kw)
    assert float(jnp.abs(got).sum()) == 0.0


def test_pallas_border_events(rng):
    """Coordinates in (-1, 0) keep their single in-frame corner with the
    correct bilinear weight (the torch reference truncates and deposits a
    spurious negative weight at index 1 — representations.py:27-37; the
    kernel implements the mathematically correct clamp instead; PARITY.md
    documents the difference)."""
    h, w, bins = 24, 256, 5
    x = jnp.asarray([[-0.25, 10.0]])
    y = jnp.asarray([[-0.5, -0.25]])
    t = jnp.asarray([[0.0, 100.0]])
    p = jnp.ones((1, 2))
    valid = jnp.ones((1, 2), bool)
    g = voxelize_window_soa(x, y, t, p, valid, num_bins=bins, height=h,
                            width=w, trilinear=True, use_pallas=True,
                            pallas_interpret=True, oh_dtype=jnp.float32)
    # event 0 at (-0.25, -0.5), t -> bin 0: weight (1-0.25)*(1-0.5) at (0,0)
    np.testing.assert_allclose(float(g[0, 0, 0, 0]), 0.75 * 0.5, atol=1e-5)
    # event 1 at (10, -0.25), t -> last bin: (1-0.25) at row 0, split x 10
    np.testing.assert_allclose(float(g[0, 0, 10, bins - 1]), 0.75, atol=1e-5)

    # host binning keeps border events too
    from ess_tpu.ops.voxel_pallas import host_tile_bin
    raw = np.zeros((1, 2, 4), np.float32)
    raw[0, :, 0] = [-0.25, 10.0]
    raw[0, :, 1] = [-0.5, -0.25]
    raw[0, :, 2] = [0.0, 100.0]
    raw[0, :, 3] = 1.0
    _, v, offs = host_tile_bin(raw, np.ones((1, 2), bool), height=h, width=w,
                               bins=bins)
    assert offs[0, -1] == 2 and v.sum() == 2


def test_fold_s2d_mxu_matches_reference_fold(rng):
    """The selection-matmul halo fold (and the native-layout v2) produce
    exactly the reference XLA fold's s2d blocks (random tile accumulators,
    incl. halo rows/cols/corners and poisoned padding)."""
    import jax.numpy as jnp

    from ess_tpu.ops.voxel_pallas import (
        COL_SLOT, _fold_halo_s2d, _fold_halo_s2d_mxu, _fold_halo_s2d_v2)

    bins, th, height, width = 5, 24, 96, 256  # n_ty=4, n_tx=2
    n_ty, n_tx = height // th, width // 128
    rows = ((bins * (th + 1) + 7) // 8) * 8
    tiles = rng.normal(size=(3, n_ty, rows, n_tx * COL_SLOT)).astype(np.float32)
    # the fold must only read the used rows/cols; poison padding to prove it
    tiles[:, :, bins * (th + 1):, :] = 7e7
    for j in range(n_tx):
        tiles[:, :, :, j * COL_SLOT + 130:(j + 1) * COL_SLOT] = -9e6
    tiles = jnp.asarray(tiles)

    want = _fold_halo_s2d(tiles, bins=bins, tile_h=th,
                          height=height, width=width)
    got = _fold_halo_s2d_mxu(tiles, bins=bins, tile_h=th,
                             height=height, width=width)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    got2 = _fold_halo_s2d_v2(tiles, bins=bins, tile_h=th,
                             height=height, width=width)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pallas_int8_tent_planes(rng):
    """oh_dtype=int8 (the double-rate MXU path): corner weights quantize to
    1/127 steps with exact int32 accumulation — per-deposit error bounded
    by (w_r + w_c)/254, so cells track the scatter reference closely."""
    args = list(make_soa(rng))
    kw = dict(num_bins=5, height=24, width=256, trilinear=True)
    ref = voxelize_window_soa(*args, use_pallas=False, **kw)
    got8 = voxelize_window_soa(*args, use_pallas=True, pallas_interpret=True,
                               oh_dtype=jnp.int8, **kw)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref),
                               atol=0.04, rtol=0.05)
    # error must be strictly bounded per cell by the corner-count * 1/127
    err = np.abs(np.asarray(got8) - np.asarray(ref)).max()
    assert err < 0.04, err

    # temporal-bilinear (integer coords) path too
    args_i = list(make_soa(rng, float_coords=False))
    kw_t = dict(num_bins=5, height=24, width=256)
    ref_t = voxelize_window_soa(*args_i, use_pallas=False, **kw_t)
    got8_t = voxelize_window_soa(*args_i, use_pallas=True,
                                 pallas_interpret=True, oh_dtype=jnp.int8,
                                 **kw_t)
    np.testing.assert_allclose(np.asarray(got8_t), np.asarray(ref_t),
                               atol=0.04, rtol=0.05)


def test_pipeline_int8_voxel_dtype(rng):
    """PipelineConfig.voxel_oh_dtype='int8' routes through build_all."""
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig

    h, w, n, t_dim = 24, 256, 600, 2
    pipe8 = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        use_pallas=True, pallas_interpret=True, voxel_oh_dtype="int8"))
    pipe32 = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        use_pallas=True, pallas_interpret=True, voxel_oh_dtype="float32"))
    x = rng.uniform(0, w - 1, (1, t_dim, n)).astype(np.float32)
    y = rng.uniform(0, h - 1, (1, t_dim, n)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e4, (1, t_dim, n)), axis=-1).astype(np.float32)
    p = rng.integers(0, 2, (1, t_dim, n)).astype(np.float32)
    batch = {"ev_x": jnp.asarray(x), "ev_y": jnp.asarray(y),
             "ev_t": jnp.asarray(t), "ev_p": jnp.asarray(p),
             "ev_valid": jnp.ones((1, t_dim, n), bool)}
    g8, _ = pipe8.build_all(batch)
    g32, _ = pipe32.build_all(batch)
    assert g8.shape == g32.shape
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g32),
                               atol=0.04, rtol=0.05)


def _folded_args(rng, b=2, n=700, h=24, w=256, float_coords=True,
                 pad_from=600, bins=5, x_slots=False):
    """Raw SoA events + the host ghost-folded band binning of the same."""
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded

    args = list(make_soa(rng, b=b, n=n, h=h, w=w, float_coords=float_coords,
                         pad_from=pad_from))
    x, y, t, p, valid = [np.asarray(a) for a in args]
    raw = np.stack([x, y, t, p], axis=-1)
    fr, fv, fo = [], [], []
    for i in range(b):
        r2, v2, o2 = host_band_bin_folded(
            raw[i][None], valid[i][None], height=h, width=w, bins=bins,
            trilinear=float_coords, x_slots=x_slots)
        fr.append(r2[0]); fv.append(v2[0]); fo.append(o2[0])
    fr, fv, fo = np.stack(fr), np.stack(fv), np.stack(fo)
    folded = [jnp.asarray(fr[..., 0]), jnp.asarray(fr[..., 1]),
              jnp.asarray(fr[..., 2]), jnp.asarray(fr[..., 3]),
              jnp.asarray(fv)]
    return args, folded, jnp.asarray(fo)


def test_pallas_folded_trilinear_parity(rng):
    """Pre-folded mode (ghost events, gap-free rows, global columns) must
    reproduce the scatter reference exactly — including frame-edge events
    whose folds move to the host."""
    args, folded, offs = _folded_args(rng)
    kw = dict(num_bins=5, height=24, width=256, trilinear=True)
    ref = voxelize_window_soa(*args, use_pallas=False, **kw)
    got = voxelize_window_soa(*folded, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, tile_offsets=offs,
                              offsets_kind="band", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)
    # bf16 + int8 operand modes hold their documented bounds
    got16 = voxelize_window_soa(*folded, use_pallas=True,
                                pallas_interpret=True, tile_offsets=offs,
                                offsets_kind="band", **kw)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref),
                               atol=0.02, rtol=0.03)
    got8 = voxelize_window_soa(*folded, use_pallas=True,
                               pallas_interpret=True, oh_dtype=jnp.int8,
                               tile_offsets=offs, offsets_kind="band", **kw)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref),
                               atol=0.05, rtol=0.05)


def test_pallas_folded_unaligned_sensor(rng):
    """Padded (DDD17-like) sensor geometry through the folded kernel."""
    args, folded, offs = _folded_args(rng, h=26, w=170)
    kw = dict(num_bins=5, height=26, width=170, trilinear=True)
    ref = voxelize_window_soa(*args, use_pallas=False, **kw)
    got = voxelize_window_soa(*folded, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, tile_offsets=offs,
                              offsets_kind="band", **kw)
    assert got.shape == (2, 26, 170, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)


def test_pallas_folded_temporal(rng):
    """Integer-coordinate temporal-bilinear streams: no ghosts, band sort
    + pre-signed polarity only."""
    args, folded, offs = _folded_args(rng, float_coords=False)
    kw = dict(num_bins=5, height=24, width=256)
    ref = voxelize_window_soa(*args, use_pallas=False, **kw)
    got = voxelize_window_soa(*folded, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, tile_offsets=offs,
                              offsets_kind="band", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)
    # separate-polarity channels ride the |pre-weighted| magnitude; the
    # host binning must use the EFFECTIVE bin count (2*num_bins here, which
    # changes the band height — same contract as host_tile_bin)
    args_sp, folded_sp, offs_sp = _folded_args(rng, float_coords=False,
                                               bins=10)
    kw_sp = dict(kw, separate_pol=True)
    ref_sp = voxelize_window_soa(*args_sp, use_pallas=False, **kw_sp)
    got_sp = voxelize_window_soa(*folded_sp, use_pallas=True,
                                 pallas_interpret=True,
                                 oh_dtype=jnp.float32, tile_offsets=offs_sp,
                                 offsets_kind="band", **kw_sp)
    np.testing.assert_allclose(np.asarray(got_sp), np.asarray(ref_sp),
                               atol=2e-3, rtol=1e-4)


def test_pallas_folded_s2d_layout(rng):
    """Folded-mode s2d emission == s2d of the folded-mode NHWC grid."""
    from ess_tpu.ops.conv_s2d import space_to_depth

    args, folded, offs = _folded_args(rng)
    kw = dict(num_bins=5, height=24, width=256, trilinear=True)
    nhwc = voxelize_window_soa(*folded, use_pallas=True,
                               pallas_interpret=True,
                               oh_dtype=jnp.float32, tile_offsets=offs,
                               offsets_kind="band", **kw)
    s2d = voxelize_window_soa(*folded, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, tile_offsets=offs,
                              offsets_kind="band", layout="s2d", **kw)
    np.testing.assert_allclose(np.asarray(s2d),
                               np.asarray(space_to_depth(nhwc)),
                               atol=1e-6)


def test_pipeline_build_all_folded_band(rng):
    """build_all with a band-offset (pre-folded) batch matches the
    tile-offset halo path — same grids through the fold-free kernel,
    including the s2d time-major production form."""
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded, host_tile_bin

    b, t_dim, n, h, w = 2, 3, 500, 24, 256
    raw = np.zeros((b, t_dim, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, t_dim, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    valid = np.ones((b, t_dim, n), bool)
    label = rng.integers(0, 5, (b, h - 8, w)).astype(np.int32)

    def pack(fn, key):
        rs, vs, os_ = [], [], []
        for i in range(b):
            r2, v2, o2 = fn(raw[i], valid[i])
            rs.append(r2); vs.append(v2); os_.append(o2)
        rs, vs, os_ = np.stack(rs), np.stack(vs), np.stack(os_)
        return {
            "ev_x": jnp.asarray(rs[..., 0]), "ev_y": jnp.asarray(rs[..., 1]),
            "ev_t": jnp.asarray(rs[..., 2]), "ev_p": jnp.asarray(rs[..., 3]),
            "ev_valid": jnp.asarray(vs), key: jnp.asarray(os_),
            "label": jnp.asarray(label),
        }

    tile_batch = pack(
        lambda r, v: host_tile_bin(r, v, height=h, width=w, bins=5),
        "ev_tile_offsets")
    band_batch = pack(
        lambda r, v: host_band_bin_folded(r, v, height=h, width=w, bins=5),
        "ev_band_offsets")

    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, crop_bottom=8, random_flip=True,
        use_pallas=True, pallas_interpret=True, voxel_oh_dtype="float32"))
    key = jax.random.PRNGKey(3)
    ref, lbl_ref = pipe.build_all(tile_batch, key, train=True, layout="s2d",
                                  out_dtype=jnp.float32, time_major=True)
    got, lbl_got = pipe.build_all(band_batch, key, train=True, layout="s2d",
                                  out_dtype=jnp.float32, time_major=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(lbl_got), np.asarray(lbl_ref))


def test_supervised_step_folded_batch(rng):
    """The supervised train step runs end-to-end on a pre-folded SoA batch
    (band offsets select the fold-free kernel inside the jitted step)."""
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state
    from tests.test_train_steps import tiny_config

    h = w = 16
    cfg = tiny_config()
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, use_pallas=True, pallas_interpret=True))

    b, t_dim, n = 2, 2, 256
    raw = np.zeros((b, t_dim, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, t_dim, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    rs, vs, os_ = [], [], []
    for i in range(b):
        r2, v2, o2 = host_band_bin_folded(
            raw[i], np.ones((t_dim, n), bool), height=h, width=w, bins=5)
        rs.append(r2); vs.append(v2); os_.append(o2)
    rs, vs, os_ = np.stack(rs), np.stack(vs), np.stack(os_)
    batch = {
        "ev_x": jnp.asarray(rs[..., 0]), "ev_y": jnp.asarray(rs[..., 1]),
        "ev_t": jnp.asarray(rs[..., 2]), "ev_p": jnp.asarray(rs[..., 3]),
        "ev_valid": jnp.asarray(vs), "ev_band_offsets": jnp.asarray(os_),
        "label": jnp.asarray(rng.integers(0, 6, (b, h, w)), jnp.int32),
    }
    step = sup.make_train_step(mods, pipe)
    state, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))


def test_pipeline_build_all_folded_resize_width(rng):
    """DDD17-style width-only resize folds into the voxelizer (band mode):
    build_all(layout='s2d') == s2d(standard nhwc build with its
    normalize -> crop -> resize_bilinear chain)."""
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.conv_s2d import space_to_depth
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded

    b, t_dim, n, h, w = 2, 2, 500, 26, 170
    raw = np.zeros((b, t_dim, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, t_dim, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    valid = np.ones((b, t_dim, n), bool)
    rs, vs, os_ = [], [], []
    for i in range(b):
        r2, v2, o2 = host_band_bin_folded(raw[i], valid[i], height=h,
                                          width=w, bins=5)
        rs.append(r2); vs.append(v2); os_.append(o2)
    rs, vs = np.stack(rs), np.stack(vs)
    band_batch = {
        "ev_x": jnp.asarray(rs[..., 0]), "ev_y": jnp.asarray(rs[..., 1]),
        "ev_t": jnp.asarray(rs[..., 2]), "ev_p": jnp.asarray(rs[..., 3]),
        "ev_valid": jnp.asarray(vs),
        "ev_band_offsets": jnp.asarray(np.stack(os_)),
    }
    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, crop_bottom=6, resize_to=(20, 176),
        use_pallas=True, pallas_interpret=True, voxel_oh_dtype="float32"))
    assert pipe.s2d_capable(train=True)

    # reference: the standard chain on the same band batch (nhwc build
    # normalizes from kernel stats, then crop + resize_bilinear on device)
    ref, _ = pipe.build_all(band_batch)
    got, _ = pipe.build_all(band_batch, layout="s2d",
                            out_dtype=jnp.float32, time_major=True)
    assert got.shape == (t_dim, b, 10, 88, 20)
    ref_s2d = jax.vmap(space_to_depth, in_axes=1, out_axes=0)(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_s2d),
                               atol=1e-4, rtol=1e-4)


def test_supervised_step_folded_resize_matches_tile(rng):
    """DDD17-shaped supervised step (crop + width-only resize): the folded
    band batch (s2d build, resize in the voxelizer) and the tile batch
    (standard NHWC build + device resize) compute the same loss."""
    import dataclasses
    import jax
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded, host_tile_bin
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state

    sh, sw = 30, 170           # sensor; crop 6 -> 24 rows, resize w -> 176
    oh, ow = 24, 176
    b, t_dim, n = 2, 2, 400
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(oh, ow)),
            sensor_b=EventDatasetConfig(
                name="DDD17_events", shape=(oh, ow), nr_events_data=t_dim,
                nr_temporal_bins=5, nr_events_window=n)),
        model=ModelConfig(model_name="ess_supervised", e2vid_base_channels=8,
                          compute_dtype="float32"),
        task=TaskConfig(semseg_num_classes=6),
        optim=OptimConfig(batch_size_b=b))
    mods = build_modules(cfg)
    pipe = EventPipeline(PipelineConfig(
        sensor_height=sh, sensor_width=sw, num_bins=5, normalize=True,
        crop_bottom=6, resize_to=(oh, ow),
        use_pallas=True, pallas_interpret=True, voxel_oh_dtype="float32"))
    assert pipe.s2d_capable(train=True)

    raw = np.zeros((b, t_dim, n, 4), np.float32)
    raw[..., 0] = rng.integers(0, sw, (b, t_dim, n))
    raw[..., 1] = rng.integers(0, sh, (b, t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    valid = np.ones((b, t_dim, n), bool)
    label = rng.integers(0, 6, (b, oh, ow)).astype(np.int32)

    def pack(fn, key):
        rs, vs, os_ = [], [], []
        for i in range(b):
            r2, v2, o2 = fn(raw[i], valid[i])
            rs.append(r2); vs.append(v2); os_.append(o2)
        return {
            "ev_x": jnp.asarray(np.stack(rs)[..., 0]),
            "ev_y": jnp.asarray(np.stack(rs)[..., 1]),
            "ev_t": jnp.asarray(np.stack(rs)[..., 2]),
            "ev_p": jnp.asarray(np.stack(rs)[..., 3]),
            "ev_valid": jnp.asarray(np.stack(vs)),
            key: jnp.asarray(np.stack(os_)),
            "label": jnp.asarray(label),
        }

    band = pack(lambda r, v: host_band_bin_folded(
        r, v, height=sh, width=sw, bins=5, trilinear=False),
        "ev_band_offsets")
    tile = pack(lambda r, v: host_tile_bin(r, v, height=sh, width=sw,
                                           bins=5), "ev_tile_offsets")

    step = sup.make_train_step(mods, pipe)
    state = init_state(mods, jax.random.PRNGKey(0))
    _, out_band = step(state, band)
    state2 = init_state(mods, jax.random.PRNGKey(0))
    _, out_tile = step(state2, tile)
    lb, lt = float(out_band["loss"]), float(out_tile["loss"])
    assert np.isfinite(lb) and np.isfinite(lt)
    np.testing.assert_allclose(lb, lt, rtol=1e-4)


def test_pallas_folded_x_slots_parity(rng):
    """x-slot mode (host_band_bin_folded x_slots=True): slot-boundary
    crossings are host-ghosted and the kernel dots per TILE_W slot
    (_kernel_slotted) — must reproduce the scatter reference exactly, and
    the kernel-epilogue stats must match the legacy full-width mode."""
    args, folded, offs = _folded_args(np.random.default_rng(6), x_slots=True)
    assert offs.shape[-1] == 1 * 2 + 1  # 1 band (th=24) x 2 slots
    kw = dict(num_bins=5, height=24, width=256, trilinear=True)
    ref = voxelize_window_soa(*args, use_pallas=False, **kw)
    got = voxelize_window_soa(*folded, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, tile_offsets=offs,
                              offsets_kind="band", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)
    # the kernel-epilogue normalization stats feed the same normalized
    # grid as the legacy full-width mode (exercises the per-slot stats
    # accumulation end to end)
    _, legacy, loffs = _folded_args(np.random.default_rng(6), x_slots=False)
    kwn = dict(kw, normalize=True, oh_dtype=jnp.float32)
    gn_s = voxelize_window_soa(*folded, use_pallas=True,
                               pallas_interpret=True, tile_offsets=offs,
                               offsets_kind="band", **kwn)
    gn_l = voxelize_window_soa(*legacy, use_pallas=True,
                               pallas_interpret=True, tile_offsets=loffs,
                               offsets_kind="band", **kwn)
    np.testing.assert_allclose(np.asarray(gn_s), np.asarray(gn_l),
                               atol=2e-3, rtol=1e-3)


def test_pallas_folded_x_slots_temporal(rng):
    """Integer-coordinate streams under x-slot grouping (no ghosts, slot
    sort only) match the scatter reference."""
    args, folded, offs = _folded_args(rng, float_coords=False, x_slots=True)
    kw = dict(num_bins=5, height=24, width=256, trilinear=False)
    ref = voxelize_window_soa(*args, use_pallas=False, **kw)
    got = voxelize_window_soa(*folded, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, tile_offsets=offs,
                              offsets_kind="band", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-4)


def test_pallas_folded_x_slots_s2d_deint(rng):
    """The de-interleaved s2d emission (slotted kernel with permuted
    position iotas, voxel_pallas._kernel_slotted deint=True) must equal
    space_to_depth of the NHWC grid — and its kernel-side normalize must
    match the NHWC grid's normalize (stats are permutation-invariant)."""
    from ess_tpu.ops.conv_s2d import space_to_depth

    args, folded, offs = _folded_args(rng, x_slots=True)
    kw = dict(num_bins=5, height=24, width=256, trilinear=True)
    nhwc = voxelize_window_soa(*folded, use_pallas=True,
                               pallas_interpret=True,
                               oh_dtype=jnp.float32, tile_offsets=offs,
                               offsets_kind="band", **kw)
    s2d = voxelize_window_soa(*folded, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, tile_offsets=offs,
                              offsets_kind="band", layout="s2d", deint=True,
                              **kw)
    np.testing.assert_allclose(np.asarray(s2d),
                               np.asarray(space_to_depth(nhwc)),
                               atol=1e-6)
    kwn = dict(kw, normalize=True)
    nhwc_n = voxelize_window_soa(*folded, use_pallas=True,
                                 pallas_interpret=True,
                                 oh_dtype=jnp.float32, tile_offsets=offs,
                                 offsets_kind="band", **kwn)
    s2d_n = voxelize_window_soa(*folded, use_pallas=True,
                                pallas_interpret=True,
                                oh_dtype=jnp.float32, tile_offsets=offs,
                                offsets_kind="band", layout="s2d",
                                deint=True, **kwn)
    np.testing.assert_allclose(np.asarray(s2d_n),
                               np.asarray(space_to_depth(nhwc_n)),
                               atol=1e-5)


def test_pallas_folded_x_slots_s2d_deint_resize(rng):
    """De-interleaved s2d with the width-resize einsum: the resize matrix
    is conjugated with the kernel's column permutation, so the result must
    equal s2d(resize_w(nhwc)) exactly."""
    from ess_tpu.ops.conv_s2d import space_to_depth
    from ess_tpu.ops.voxel_pallas import _resize_w_matrix

    args, folded, offs = _folded_args(rng, x_slots=True)
    kw = dict(num_bins=5, height=24, width=256, trilinear=True)
    nhwc = voxelize_window_soa(*folded, use_pallas=True,
                               pallas_interpret=True,
                               oh_dtype=jnp.float32, tile_offsets=offs,
                               offsets_kind="band", **kw)
    s2d = voxelize_window_soa(*folded, use_pallas=True, pallas_interpret=True,
                              oh_dtype=jnp.float32, tile_offsets=offs,
                              offsets_kind="band", layout="s2d",
                              resize_width_to=192, deint=True, **kw)
    rw = _resize_w_matrix(256, 192, 256, 192, True)
    ref = jnp.einsum("bhwc,wv->bhvc", nhwc, jnp.asarray(rw))
    np.testing.assert_allclose(np.asarray(s2d),
                               np.asarray(space_to_depth(ref)),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_build_all_raw_window_map(rng):
    """Raw-window mode (build_all_raw + window_map) reproduces the s2d
    build bit-for-bit: deferred normalize, flip draw, fine s2d transform
    and crop all match build_all(layout='s2d', time_major=True)."""
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded

    b, t_dim, n, h, w = 2, 3, 500, 24, 256
    raw = np.zeros((b, t_dim, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, t_dim, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    valid = np.ones((b, t_dim, n), bool)
    rs, vs, os_ = [], [], []
    for i in range(b):
        r2, v2, o2 = host_band_bin_folded(raw[i], valid[i], height=h,
                                          width=w, bins=5)
        rs.append(r2); vs.append(v2); os_.append(o2)
    rs, vs = np.stack(rs), np.stack(vs)
    batch = {
        "ev_x": jnp.asarray(rs[..., 0]), "ev_y": jnp.asarray(rs[..., 1]),
        "ev_t": jnp.asarray(rs[..., 2]), "ev_p": jnp.asarray(rs[..., 3]),
        "ev_valid": jnp.asarray(vs),
        "ev_band_offsets": jnp.asarray(np.stack(os_)),
        "label": jnp.asarray(rng.integers(0, 5, (b, h - 8, w)), jnp.int32),
    }
    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, crop_bottom=8, random_flip=True, raw_windows=True,
        use_pallas=True, pallas_interpret=True, voxel_oh_dtype="float32"))
    assert pipe.raw_capable(train=True, batch=batch)
    key = jax.random.PRNGKey(3)
    ref, lbl_ref = pipe.build_all(batch, key, train=True, layout="s2d",
                                  out_dtype=jnp.float32, time_major=True)
    rawd, lbl_got, wmap = pipe.build_all_raw(batch, key, train=True,
                                             out_dtype=jnp.float32)
    assert rawd["stats"] is not None  # deferred normalize (no resize)
    got = np.stack([
        np.asarray(wmap(rawd["raw"][t], rawd["stats"][t]))
        for t in range(t_dim)])
    np.testing.assert_array_equal(got, np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(lbl_got), np.asarray(lbl_ref))


def test_pipeline_build_all_raw_resize_width(rng):
    """Raw-window mode with the DDD17-style width-only resize: normalize
    folds into the kernel tail (sensor-res ordering) and window_map only
    does flip + s2d transform + crop — equal to the s2d build."""
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded

    b, t_dim, n, h, w = 2, 2, 500, 26, 170
    raw = np.zeros((b, t_dim, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, t_dim, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    valid = np.ones((b, t_dim, n), bool)
    rs, vs, os_ = [], [], []
    for i in range(b):
        r2, v2, o2 = host_band_bin_folded(raw[i], valid[i], height=h,
                                          width=w, bins=5)
        rs.append(r2); vs.append(v2); os_.append(o2)
    rs, vs = np.stack(rs), np.stack(vs)
    batch = {
        "ev_x": jnp.asarray(rs[..., 0]), "ev_y": jnp.asarray(rs[..., 1]),
        "ev_t": jnp.asarray(rs[..., 2]), "ev_p": jnp.asarray(rs[..., 3]),
        "ev_valid": jnp.asarray(vs),
        "ev_band_offsets": jnp.asarray(np.stack(os_)),
    }
    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, crop_bottom=6, resize_to=(20, 176),
        random_flip=True, raw_windows=True,
        use_pallas=True, pallas_interpret=True, voxel_oh_dtype="float32"))
    assert pipe.raw_capable(train=True, batch=batch)
    key = jax.random.PRNGKey(7)
    ref, _ = pipe.build_all(batch, key, train=True, layout="s2d",
                            out_dtype=jnp.float32, time_major=True)
    rawd, _, wmap = pipe.build_all_raw(batch, key, train=True,
                                       out_dtype=jnp.float32)
    assert rawd["stats"] is None  # normalize folded into the kernel tail
    got = np.stack([np.asarray(wmap(rawd["raw"][t], None))
                    for t in range(t_dim)])
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_supervised_rollout_raw_matches_s2d(rng):
    """The full supervised train step takes the raw-window path when
    capable and computes the SAME loss/updates as the s2d stack path
    (raw_windows pin False) — end-to-end graph equivalence."""
    import dataclasses
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state
    from tests.test_train_steps import tiny_config

    h = w = 16
    cfg = tiny_config()
    mods = build_modules(cfg)
    state0 = init_state(mods, jax.random.PRNGKey(0))
    pcfg = PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, random_flip=True,
        use_pallas=True, pallas_interpret=True)

    b, t_dim, n = 2, 2, 256
    raw = np.zeros((b, t_dim, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, t_dim, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    rs, vs, os_ = [], [], []
    for i in range(b):
        r2, v2, o2 = host_band_bin_folded(
            raw[i], np.ones((t_dim, n), bool), height=h, width=w, bins=5)
        rs.append(r2); vs.append(v2); os_.append(o2)
    rs, vs, os_ = np.stack(rs), np.stack(vs), np.stack(os_)
    batch = {
        "ev_x": jnp.asarray(rs[..., 0]), "ev_y": jnp.asarray(rs[..., 1]),
        "ev_t": jnp.asarray(rs[..., 2]), "ev_p": jnp.asarray(rs[..., 3]),
        "ev_valid": jnp.asarray(vs), "ev_band_offsets": jnp.asarray(os_),
        "label": jnp.asarray(rng.integers(0, 6, (b, h, w)), jnp.int32),
    }
    losses = {}
    for name, pin in (("raw", True), ("stack", False)):
        pipe = EventPipeline(dataclasses.replace(pcfg, raw_windows=pin))
        step = sup.make_train_step(mods, pipe)
        state = jax.tree.map(jnp.copy, state0)
        _, out = step(state, batch)
        losses[name] = float(out["loss"])
    assert np.isclose(losses["raw"], losses["stack"], rtol=1e-5), losses


def _folded_slotted_batch(rng, b, t_dim, n, h, w, *, bins=5, label_classes=0):
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded

    raw = np.zeros((b, t_dim, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, t_dim, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, t_dim, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, t_dim, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    valid = np.ones((b, t_dim, n), bool)
    rs, vs, os_ = [], [], []
    for i in range(b):
        r2, v2, o2 = host_band_bin_folded(raw[i], valid[i], height=h,
                                          width=w, bins=bins, x_slots=True)
        rs.append(r2); vs.append(v2); os_.append(o2)
    rs, vs = np.stack(rs), np.stack(vs)
    batch = {
        "ev_x": jnp.asarray(rs[..., 0]), "ev_y": jnp.asarray(rs[..., 1]),
        "ev_t": jnp.asarray(rs[..., 2]), "ev_p": jnp.asarray(rs[..., 3]),
        "ev_valid": jnp.asarray(vs),
        "ev_band_offsets": jnp.asarray(np.stack(os_)),
    }
    if label_classes:
        batch["label"] = jnp.asarray(
            rng.integers(0, label_classes, (b, h - 8, w)), jnp.int32)
    return batch


def test_voxelize_stack_layout(rng):
    """layout='stack' (in-kernel s2d NCHW emission) == transpose of the
    s2d layout output — exact (f32 planes, interpret)."""
    from ess_tpu.ops.voxel_pallas import host_band_bin_folded

    b, n, h, w = 2, 600, 24, 256
    raw = np.zeros((b, n, 4), np.float32)
    raw[..., 0] = rng.uniform(0, w - 1, (b, n))
    raw[..., 1] = rng.uniform(0, h - 1, (b, n))
    raw[..., 2] = np.sort(rng.uniform(0, 1e4, (b, n)), axis=-1)
    raw[..., 3] = rng.integers(0, 2, (b, n))
    r2, v2, o2 = host_band_bin_folded(raw, np.ones((b, n), bool),
                                      height=h, width=w, bins=5,
                                      x_slots=True)
    args = [jnp.asarray(r2[..., i]) for i in range(4)] + [jnp.asarray(v2)]
    kw = dict(num_bins=5, height=h, width=w, trilinear=True,
              use_pallas=True, pallas_interpret=True,
              oh_dtype=jnp.float32, offsets_kind="band",
              tile_offsets=jnp.asarray(o2))
    s2d = voxelize_window_soa(*args, layout="s2d", **kw)
    stack, stats = voxelize_window_soa(*args, layout="stack", **kw)
    assert stack.shape == (b, 20, h // 2, w // 2)
    assert stats is None
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(stack, (0, 2, 3, 1))), np.asarray(s2d))


def test_pipeline_build_all_stack_window_map(rng):
    """Stack-window mode (build_all_stack + window_map) reproduces the
    s2d build bit-for-bit: deferred normalize, block-space flip, crop
    and NHWC transpose all match build_all(layout='s2d', time_major)."""
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig

    b, t_dim, n, h, w = 2, 3, 500, 24, 256
    batch = _folded_slotted_batch(rng, b, t_dim, n, h, w, label_classes=5)
    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, crop_bottom=8, random_flip=True, stack_windows=True,
        use_pallas=True, pallas_interpret=True, voxel_oh_dtype="float32"))
    assert pipe.stack_capable(train=True, batch=batch)
    key = jax.random.PRNGKey(3)
    ref, lbl_ref = pipe.build_all(batch, key, train=True, layout="s2d",
                                  out_dtype=jnp.float32, time_major=True)
    stackd, lbl_got, wmap = pipe.build_all_stack(batch, key, train=True,
                                                 out_dtype=jnp.float32)
    assert stackd["stats"] is not None
    got = np.stack([
        np.asarray(wmap(stackd["raw"][t], stackd["stats"][t]))
        for t in range(t_dim)])
    # the deint emission permutes the kernel's stats reduction order:
    # mean/std agree to ~1 ulp, so normalized cells differ at ~1e-7
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-6, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(lbl_got), np.asarray(lbl_ref))


def test_supervised_step_stack_matches_s2d(rng):
    """The full supervised train step takes the stack-window path when
    pinned on and computes the SAME loss as the s2d stack-chain path —
    end-to-end graph equivalence."""
    import dataclasses
    import jax
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.train import supervised as sup
    from ess_tpu.train.builder import build_modules, init_state
    from tests.test_train_steps import tiny_config

    h, w = 16, 256   # width >= 2 slots: the slotted kernel stack mode needs
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, dataset=dataclasses.replace(
        cfg.dataset,
        sensor_a=dataclasses.replace(cfg.dataset.sensor_a, shape=(h, w)),
        sensor_b=dataclasses.replace(cfg.dataset.sensor_b, shape=(h, w))))
    mods = build_modules(cfg)
    state0 = init_state(mods, jax.random.PRNGKey(0))
    pcfg = PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, random_flip=True,
        use_pallas=True, pallas_interpret=True)

    batch = _folded_slotted_batch(rng, 2, 2, 256, h, w)
    batch["label"] = jnp.asarray(rng.integers(0, 6, (2, h, w)), jnp.int32)
    assert EventPipeline(dataclasses.replace(
        pcfg, stack_windows=True)).stack_capable(train=True, batch=batch)
    losses = {}
    for name, pin in (("stack", True), ("chain", False)):
        pipe = EventPipeline(dataclasses.replace(pcfg, stack_windows=pin))
        step = sup.make_train_step(mods, pipe)
        state = jax.tree.map(jnp.copy, state0)
        _, out = step(state, batch)
        losses[name] = float(out["loss"])
    assert np.isclose(losses["stack"], losses["chain"], rtol=1e-5), losses
