"""Parity tests for the fused Pallas 3x3 conv (ops/conv3x3_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ess_tpu.ops.conv3x3_pallas import conv3x3_fused, conv3x3_ref


def _data(cin=24, cout=16, h=16, w=40, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    return x, k, b


@pytest.mark.parametrize("relu", [True, False])
def test_bf16_path_parity(relu):
    x, k, b = _data()
    ref = conv3x3_ref(x, k, b, relu=relu)
    out = conv3x3_fused(x, k, b, relu=relu, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_no_bias():
    x, k, _ = _data(seed=1)
    ref = conv3x3_ref(x, k, None, relu=True)
    out = conv3x3_fused(x, k, None, relu=True, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_int8_bounded():
    x, k, b = _data(seed=2)
    ref = conv3x3_ref(x, k, b, relu=True)
    out = conv3x3_fused(x, k, b, relu=True, impl="pallas_int8_interpret")
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-9
    assert err.max() / scale < 0.02, err.max() / scale
    assert err.mean() / scale < 2e-3, err.mean() / scale


def test_gradients_match_ref():
    x, k, b = _data(seed=3)

    def loss_fused(k, b):
        return jnp.sum(
            conv3x3_fused(x, k, b, relu=True, impl="pallas_interpret") ** 2)

    def loss_ref(k, b):
        return jnp.sum(conv3x3_ref(x, k, b, relu=True) ** 2)

    gk, gb = jax.grad(loss_fused, argnums=(0, 1))(k, b)
    gk_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(k, b)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r),
                               atol=1e-3, rtol=1e-3)


def test_xla_fallback_small_and_no_tile():
    # tiny tensor -> falls back to XLA conv; prime height with pallas also
    # falls back (no row tile divides H)
    x, k, b = _data(h=13, w=8, seed=4)
    ref = conv3x3_ref(x, k, b, relu=True)
    out = conv3x3_fused(x, k, b, relu=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
