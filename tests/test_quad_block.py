"""Exact-equivalence tests for the quad-block (s4d) rollout.

The quad path evaluates the E2VID head + first encoder at quarter
resolution with 4x channel widths and runs the first ConvLSTM on
space-to-depth state — all via exact weight remaps
(ops/conv_s2d.block_kernel / gates_kernel_s2d). Same params, same math.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ess_tpu.models.e2vid import RecurrentUNet, zero_recurrent_state
from ess_tpu.ops.conv_s2d import (
    block_kernel, depth_to_space, gates_bias_s2d, gates_kernel_s2d,
    s2d_kernel, s2d_kernel_stride2, space_to_depth, space_to_depth4)


def _conv(x, k, stride=1):
    pad = k.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_block_kernel_subsumes_legacy(rng):
    k5 = jnp.asarray(rng.normal(size=(5, 5, 3, 7)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(block_kernel(k5, bi=2, bo=2, stride=1)),
        np.asarray(s2d_kernel(k5)))
    np.testing.assert_array_equal(
        np.asarray(block_kernel(k5, bi=2, bo=1, stride=2)),
        np.asarray(s2d_kernel_stride2(k5)))


def test_block_kernel_s4d_head(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)).astype(np.float32))
    k5 = jnp.asarray(rng.normal(size=(5, 5, 3, 7)).astype(np.float32))
    ref = _conv(x, k5)
    w4 = block_kernel(k5, bi=4, bo=4, stride=1)
    out = _conv(space_to_depth4(x), w4)
    b, hh, ww, _ = out.shape
    o = out.reshape(b, hh, ww, 4, 4, 7).transpose(0, 1, 3, 2, 4, 5)
    np.testing.assert_allclose(np.asarray(o.reshape(ref.shape)),
                               np.asarray(ref), atol=3e-5)


def test_block_kernel_s4d_to_s2d_stride2(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)).astype(np.float32))
    k5 = jnp.asarray(rng.normal(size=(5, 5, 3, 7)).astype(np.float32))
    ref = _conv(x, k5, stride=2)
    w = block_kernel(k5, bi=4, bo=2, stride=2)
    out = _conv(space_to_depth4(x), w)
    np.testing.assert_allclose(np.asarray(depth_to_space(out)),
                               np.asarray(ref), atol=3e-5)


def test_gates_remap_cell_parity(rng):
    from ess_tpu.ops.conv_lstm_pallas import conv_lstm_ref
    cx, ch = 3, 5
    x = jnp.asarray(rng.normal(size=(2, 16, 24, cx)).astype(np.float32))
    h = jnp.tanh(jnp.asarray(rng.normal(size=(2, 16, 24, ch))
                             .astype(np.float32)))
    c = jnp.asarray(rng.normal(size=(2, 16, 24, ch)).astype(np.float32))
    gk = jnp.asarray(rng.normal(size=(3, 3, cx + ch, 4 * ch))
                     .astype(np.float32))
    gb = jnp.asarray(rng.normal(size=(4 * ch,)).astype(np.float32))
    h_ref, c_ref = conv_lstm_ref(x, h, c, gk, gb)
    h2, c2 = conv_lstm_ref(space_to_depth(x), space_to_depth(h),
                           space_to_depth(c), gates_kernel_s2d(gk),
                           gates_bias_s2d(gb))
    np.testing.assert_allclose(np.asarray(depth_to_space(h2)),
                               np.asarray(h_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(depth_to_space(c2)),
                               np.asarray(c_ref), atol=3e-5)


def test_quad_model_matches_standard(rng):
    B, H, W, C = 2, 32, 48, 5
    m_std = RecurrentUNet(dtype=jnp.float32)
    m_q = RecurrentUNet(dtype=jnp.float32, quad_block=True)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    st1 = zero_recurrent_state(B, H, W)
    st2 = zero_recurrent_state(B, H, W, quad_block=True)
    params = m_std.init(jax.random.PRNGKey(0), x, st1)["params"]

    img1, ns1, lat1 = m_std.apply({"params": params}, space_to_depth(x),
                                  st1, decode=True, block_input=True)
    img2, ns2, lat2 = m_q.apply({"params": params}, space_to_depth4(x),
                                st2, decode=True, block_input=True)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-5)
    for k in lat1:
        assert lat1[k].shape == lat2[k].shape
        np.testing.assert_allclose(np.asarray(lat1[k]), np.asarray(lat2[k]),
                                   atol=1e-5)
    # carried state: quad stores level 0 in s2d form, same values
    np.testing.assert_allclose(np.asarray(depth_to_space(ns2[0][0])),
                               np.asarray(ns1[0][0]), atol=1e-5)
    # a second step from the carried states still matches
    img1b, _, _ = m_std.apply({"params": params}, space_to_depth(x), ns1,
                              decode=True, block_input=True)
    img2b, _, _ = m_q.apply({"params": params}, space_to_depth4(x), ns2,
                            decode=True, block_input=True)
    np.testing.assert_allclose(np.asarray(img1b), np.asarray(img2b),
                               atol=1e-5)


def test_s4d_fold_matches_s2d(rng):
    """The voxelizer's s4d fold emits exactly space_to_depth4 of the grid."""
    from ess_tpu.ops.batch_voxel import voxelize_window_soa

    b, n, hgt, wdt, bins = 2, 4000, 48, 128, 5
    x = jnp.asarray(rng.uniform(0, wdt - 1, (b, n)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, hgt - 1, (b, n)).astype(np.float32))
    t = jnp.asarray(np.sort(rng.uniform(0, 1e4, (b, n))).astype(np.float32))
    p = jnp.asarray(rng.integers(0, 2, (b, n)).astype(np.float32))
    valid = jnp.ones((b, n), bool)
    kw = dict(num_bins=bins, height=hgt, width=wdt, trilinear=True,
              use_pallas=True, pallas_interpret=True, normalize=True,
              out_dtype=jnp.float32)
    g_nhwc = voxelize_window_soa(x, y, t, p, valid, layout="nhwc", **kw)
    g_s4d = voxelize_window_soa(x, y, t, p, valid, layout="s4d", **kw)
    np.testing.assert_allclose(np.asarray(g_s4d),
                               np.asarray(space_to_depth4(g_nhwc)),
                               atol=1e-5, rtol=1e-4)


def test_block_kernel_rejects_even_block_kernel(rng):
    """SAME padding in the blocked conv assumes a centred odd block kernel;
    even-kb combos (e.g. k=5, bi=4, bo=1, stride=4) would silently shift
    every tap by one block — they must be rejected loudly."""
    k5 = jnp.asarray(rng.normal(size=(5, 5, 3, 7)).astype(np.float32))
    with pytest.raises(AssertionError, match="odd block-kernel"):
        block_kernel(k5, bi=4, bo=1, stride=4)


def test_quad_model_constructible_and_builder_never_quads():
    """The quad-block rollout is a demoted experiment (r3/r4 ladders both
    measured it a full-step regression): the builder NEVER enables it, but
    the model-level capability stays constructible directly."""
    from ess_tpu.core.config import (
        Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
        ModelConfig, OptimConfig, TaskConfig)
    from ess_tpu.models.e2vid import RecurrentUNet
    from ess_tpu.train.builder import build_modules

    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(32, 32)),
            sensor_b=EventDatasetConfig(
                name="DSEC_events", shape=(32, 32), nr_events_data=2,
                nr_temporal_bins=5, nr_events_window=64)),
        model=ModelConfig(model_name="ess_supervised"),
        task=TaskConfig(semseg_num_classes=3),
        optim=OptimConfig(batch_size_b=1))
    mods = build_modules(cfg)
    assert not mods.recon_train.model.quad_block
    assert not mods.recon_val.model.quad_block
    # direct construction (the experiment path) still works
    m = RecurrentUNet(base_channels=8, quad_block=True, dtype=jnp.float32,
                      lstm_impl="xla")
    assert m.quad_block


def test_s4d_fallback_fold_odd_padded_height(rng):
    """separate_pol temporal voxelization (bins_eff=10 -> tile_h=10) pads
    height 48 to 50 — not 4-aligned — and must still fold to the exact s4d
    blocks via the padded NHWC fallback."""
    from ess_tpu.ops.batch_voxel import voxelize_window_soa

    B, N, H, W = 1, 500, 48, 128
    x = jnp.asarray(rng.uniform(0, W - 1, (B, N)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H - 1, (B, N)), jnp.float32)
    t = jnp.asarray(np.sort(rng.uniform(0, 1, (B, N)), -1), jnp.float32)
    p = jnp.asarray(rng.integers(0, 2, (B, N)), jnp.float32)
    v = jnp.ones((B, N), bool)
    kw = dict(num_bins=5, height=H, width=W, separate_pol=True,
              trilinear=False, use_pallas=True, pallas_interpret=True)
    g4 = voxelize_window_soa(x, y, t, p, v, layout="s4d", **kw)
    ref = space_to_depth4(
        voxelize_window_soa(x, y, t, p, v, layout="nhwc", **kw))
    assert g4.shape == (B, H // 4, W // 4, 4 * 4 * 10)
    np.testing.assert_array_equal(np.asarray(g4), np.asarray(ref))
