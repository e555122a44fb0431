"""Parity tests for the space-to-depth 5x5 conv (ops/conv_s2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ess_tpu.ops.conv_s2d import (
    conv5x5_s2d, depth_to_space, s2d_kernel, space_to_depth,
)


def _ref_conv(x, kernel, bias):
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out if bias is None else out + bias


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_conv5x5_s2d_matches_xla_conv(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(5, 5, 5, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    got = conv5x5_s2d(x, k, b, dtype=jnp.float32)
    np.testing.assert_allclose(got, _ref_conv(x, k, b), rtol=1e-5, atol=1e-5)


def test_conv5x5_s2d_no_bias_big_cin(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 128, 7)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(5, 5, 7, 16)), jnp.float32)
    got = conv5x5_s2d(x, k, None, dtype=jnp.float32)
    np.testing.assert_allclose(got, _ref_conv(x, k, None), rtol=1e-5, atol=1e-5)


def test_conv5x5_s2d_gradients_match(rng):
    """The kernel remap is linear -> gradients must match the XLA conv's
    (the path is valid for TRAINABLE convs, not just the frozen head)."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(5, 5, 5, 8)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.float32)

    f_s2d = lambda x_, k_: jnp.vdot(conv5x5_s2d(x_, k_, None, dtype=jnp.float32), cot)
    f_ref = lambda x_, k_: jnp.vdot(_ref_conv(x_, k_, None), cot)
    gx1, gk1 = jax.grad(f_s2d, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(f_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gx1, gx2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gk1, gk2, rtol=1e-5, atol=1e-5)


def test_conv5x5_s2d_stride2_matches_xla_conv(rng):
    from ess_tpu.ops.conv_s2d import conv5x5_s2d_stride2

    x = jnp.asarray(rng.normal(size=(2, 16, 24, 6)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(5, 5, 6, 12)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(12,)), jnp.float32)
    got = conv5x5_s2d_stride2(space_to_depth(x), k, b, dtype=jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convlayer_s2d_impl_same_params_and_output(rng):
    """ConvLayer(conv_impl='s2d') has the identical param tree as the XLA
    impl (checkpoints interchange) and the identical output."""
    from ess_tpu.models.layers import ConvLayer

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)), jnp.float32)
    ref = ConvLayer(32, kernel_size=5, activation="relu", conv_impl="xla")
    new = ConvLayer(32, kernel_size=5, activation="relu", conv_impl="s2d")
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(
        new.init(jax.random.PRNGKey(0), x)["params"])
    np.testing.assert_allclose(
        new.apply({"params": params}, x), ref.apply({"params": params}, x),
        rtol=1e-5, atol=1e-5)
