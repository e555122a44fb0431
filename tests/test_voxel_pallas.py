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
