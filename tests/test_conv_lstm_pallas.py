"""Fused Pallas ConvLSTM cell: parity vs the XLA cell + integration.

Reference semantics under test: e2vid/model/submodules.py:175-230 (ConvLSTM
gate order and update equations). The Pallas kernel must match the XLA
reference cell bit-closely (both accumulate gates in f32) across interior
tiles, edge tiles (zero halo), single-tile heights, and C=64-style sub-tile
gate widths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ess_tpu.ops.conv_lstm_pallas import (
    conv_lstm_cell,
    conv_lstm_ref,
    pick_row_tile,
    prepare_gate_weights,
)


def _mk(b, h, w, cx, ch, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (b, h, w, cx), dtype)
    hp = jnp.tanh(jax.random.normal(ks[1], (b, h, w, ch), dtype))
    cp = jax.random.normal(ks[2], (b, h, w, ch), dtype)
    kern = jax.random.normal(ks[3], (3, 3, cx + ch, 4 * ch), jnp.float32) * 0.1
    bias = jax.random.normal(ks[4], (4 * ch,), jnp.float32) * 0.1
    return x, hp, cp, kern, bias


@pytest.mark.parametrize("shape", [
    (2, 20, 18, 8, 8),    # NT > 2, odd-ish width
    (1, 8, 16, 8, 16),    # NT == 1 (th == H)
    (2, 10, 11, 16, 8),   # W not sublane-aligned
    (1, 15, 27, 8, 8),    # DDD17 deepest-encoder geometry (odd H and W)
])
def test_fused_matches_ref(shape):
    b, h, w, cx, ch = shape
    x, hp, cp, kern, bias = _mk(b, h, w, cx, ch)
    h_ref, c_ref = conv_lstm_ref(x, hp, cp, kern, bias)
    h_pl, c_pl = conv_lstm_cell(x, hp, cp, kern, bias,
                                impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_matches_ref_bf16():
    x, hp, cp, kern, bias = _mk(2, 12, 20, 8, 8, seed=3, dtype=jnp.bfloat16)
    h_ref, c_ref = conv_lstm_ref(x, hp, cp, kern, bias)
    h_pl, c_pl = conv_lstm_cell(x, hp, cp, kern, bias,
                                impl="pallas_interpret")
    assert h_pl.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(h_pl, np.float32), np.asarray(h_ref, np.float32),
        atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(c_pl, np.float32), np.asarray(c_ref, np.float32),
        atol=3e-2)


def test_ref_matches_flax_cell():
    """conv_lstm_ref == the flax ConvLSTMCell (gate order + numerics)."""
    from ess_tpu.models.layers import ConvLSTMCell

    x, hp, cp, kern, bias = _mk(1, 10, 12, 8, 8, seed=1)
    cell = ConvLSTMCell(hidden=8)
    params = {"gates": {"kernel": kern, "bias": bias}}
    h_fx, (_, c_fx) = cell.apply({"params": params}, x, (hp, cp))
    h_rf, c_rf = conv_lstm_ref(x, hp, cp, kern, bias)
    np.testing.assert_allclose(np.asarray(h_fx), np.asarray(h_rf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_fx), np.asarray(c_rf), atol=1e-5)


def test_flax_cell_pallas_impl_param_tree_interchanges():
    """ConvLSTMCell(impl='pallas_interpret') builds the same param tree as
    the XLA cell and produces matching outputs (checkpoint interchange)."""
    from ess_tpu.models.layers import ConvLSTMCell

    x, hp, cp, _, _ = _mk(1, 10, 12, 8, 8, seed=2)
    cell_x = ConvLSTMCell(hidden=8)
    cell_p = ConvLSTMCell(hidden=8, impl="pallas_interpret")
    params = cell_x.init(jax.random.PRNGKey(0), x, (hp, cp))["params"]
    params_p = cell_p.init(jax.random.PRNGKey(0), x, (hp, cp))["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_p)
    assert (params["gates"]["kernel"].shape
            == params_p["gates"]["kernel"].shape)

    h_x, (_, c_x) = cell_x.apply({"params": params}, x, (hp, cp))
    h_p, (_, c_p) = cell_p.apply({"params": params}, x, (hp, cp))
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), atol=1e-5)


def test_grad_fallback_through_custom_vjp():
    x, hp, cp, kern, bias = _mk(1, 8, 12, 8, 8, seed=4)

    def loss_pl(k):
        h, c = conv_lstm_cell(x, hp, cp, k, bias, impl="pallas_interpret")
        return jnp.sum(h ** 2) + jnp.sum(c ** 2)

    def loss_ref(k):
        h, c = conv_lstm_ref(x, hp, cp, k, bias)
        return jnp.sum(h ** 2) + jnp.sum(c ** 2)

    g_pl = jax.grad(loss_pl)(kern)
    g_rf = jax.grad(loss_ref)(kern)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_rf),
                               atol=1e-4, rtol=1e-4)


def test_pick_row_tile():
    # large tiles preferred (v5e sweep: th=22 beats th=10 by ~20% at L0)
    assert pick_row_tile(220) == 22
    assert pick_row_tile(110) == 22
    assert 55 % pick_row_tile(55) == 0
    assert pick_row_tile(15) == 15
    assert pick_row_tile(29) is None  # prime > hi: caller falls back to XLA
    assert pick_row_tile(8) == 8


def test_prepare_gate_weights_layout():
    kern = jnp.arange(3 * 3 * 4 * 8, dtype=jnp.float32).reshape(3, 3, 4, 8)
    w = prepare_gate_weights(kern, jnp.float32)
    assert w.shape == (36, 8)
    # W[(dy*3 + dx)*CIN + cin] == kernel[dy, dx, cin]
    np.testing.assert_array_equal(np.asarray(w[(2 * 3 + 1) * 4 + 3]),
                                  np.asarray(kern[2, 1, 3]))


def test_fallback_on_untileable_height():
    # H=17 prime: silently uses the XLA cell
    x, hp, cp, kern, bias = _mk(1, 17, 12, 8, 8, seed=5)
    h_pl, c_pl = conv_lstm_cell(x, hp, cp, kern, bias,
                                impl="pallas_interpret")
    h_rf, c_rf = conv_lstm_ref(x, hp, cp, kern, bias)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_rf), atol=1e-6)


def test_int8_variant_error_bound():
    """The int8 cell is lossy by design; its output must stay within a
    small bound of the f32 reference on realistic magnitudes (x ~ relu
    activations, h bounded, c ~ unit)."""
    r = jax.random.PRNGKey(11)
    ks = jax.random.split(r, 5)
    b, h, w, c = 2, 12, 20, 16
    x = jax.nn.relu(jax.random.normal(ks[0], (b, h, w, c)) * 2.0)
    hp = jnp.tanh(jax.random.normal(ks[1], (b, h, w, c)))
    cp = jax.random.normal(ks[2], (b, h, w, c))
    kern = jax.random.normal(ks[3], (3, 3, 2 * c, 4 * c)) * (1 / np.sqrt(18 * c))
    bias = jax.random.normal(ks[4], (4 * c,)) * 0.05

    h_ref, c_ref = conv_lstm_ref(x, hp, cp, kern, bias)
    h_q, c_q = conv_lstm_cell(x, hp, cp, kern, bias,
                              impl="pallas_int8_interpret")
    dh = np.abs(np.asarray(h_q) - np.asarray(h_ref))
    dc = np.abs(np.asarray(c_q) - np.asarray(c_ref))
    # h is post-sigmoid*tanh (range ~(-1,1)): measured worst case ~0.04
    # max / ~0.004 mean — the documented cost of the double-rate int8 MXU
    # path (opt-in, frozen-forward rollout only)
    assert dh.max() < 0.05, dh.max()
    assert dh.mean() < 6e-3, dh.mean()
    assert dc.max() < 0.08, dc.max()


def test_int8_20_step_rollout_drift():
    """Carried-state drift over a 20-step recurrence stays bounded (the
    production rollout length)."""
    r = jax.random.PRNGKey(13)
    ks = jax.random.split(r, 4)
    b, h, w, c = 1, 10, 16, 8
    xs = jax.nn.relu(jax.random.normal(ks[0], (20, b, h, w, c)) * 1.5)
    kern = jax.random.normal(ks[1], (3, 3, 2 * c, 4 * c)) * (1 / np.sqrt(18 * c))
    bias = jax.random.normal(ks[2], (4 * c,)) * 0.05
    hp = jnp.zeros((b, h, w, c))
    cp = jnp.zeros((b, h, w, c))

    hr, cr = hp, cp
    hq, cq = hp, cp
    for t in range(20):
        hr, cr = conv_lstm_ref(xs[t], hr, cr, kern, bias)
        hq, cq = conv_lstm_cell(xs[t], hq, cq, kern, bias,
                                impl="pallas_int8_interpret")
    dh = np.max(np.abs(np.asarray(hq) - np.asarray(hr)))
    assert dh < 0.06, dh
