"""Exact-equivalence tests for the blocked SegmentationHead evaluation.

models/seghead.py ``block_space=True`` evaluates the scale-2 stage in s2d
and the scale-1 stage in s4d via the block-kernel weight remaps
(ops/conv_s2d.py) — the same parameters must produce the same values (up to
layout) and the same gradients as the standard path, and the loss adapters
(train/losses.py fold_labels_s4d / s4d_logits_class_minor) must make the
task loss invariant to the layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ess_tpu.models.seghead import SegmentationHead
from ess_tpu.ops.conv_s2d import (
    space_to_depth, space_to_depth4, tile_upsample2x_s2d,
    tile_upsample2x_s2d_to_s4d)
from ess_tpu.train.losses import (
    fold_labels_s4d, s4d_logits_class_minor, task_loss)


B, H, W = 2, 32, 48
NCLS = 11


def _latent(rng):
    return {
        8: jnp.asarray(rng.normal(size=(B, H // 8, W // 8, 256)), jnp.float32),
        4: jnp.asarray(rng.normal(size=(B, H // 4, W // 4, 128)), jnp.float32),
        2: jnp.asarray(rng.normal(size=(B, H // 2, W // 2, 64)), jnp.float32),
    }


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_tile_upsample2x_s2d(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 5, 6)), jnp.float32)
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (1, 3, 2, 5, 2, 6))
    up = up.reshape(1, 6, 10, 6)
    np.testing.assert_array_equal(tile_upsample2x_s2d(x), space_to_depth(up))


def test_tile_upsample2x_s2d_to_s4d(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 12, 6)), jnp.float32)   # 2h x 2w
    x_s2d = space_to_depth(x)
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (1, 8, 2, 12, 2, 6))
    up = up.reshape(1, 16, 24, 6)
    np.testing.assert_array_equal(
        tile_upsample2x_s2d_to_s4d(x_s2d), space_to_depth4(up))


@pytest.mark.parametrize("skip_type", ["concat", "sum"])
def test_blocked_head_matches_standard(rng, skip_type):
    latent = _latent(rng)
    head = SegmentationHead(num_classes=NCLS, skip_type=skip_type,
                            dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), latent)["params"]

    std = head.apply({"params": params}, latent)
    blk = head.apply({"params": params}, latent, block_space=True)

    np.testing.assert_array_equal(std[8], blk[8])
    np.testing.assert_array_equal(std[4], blk[4])
    np.testing.assert_allclose(
        np.asarray(space_to_depth(std[2])), np.asarray(blk[2]),
        rtol=0, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(space_to_depth4(std[1])), np.asarray(blk[1]),
        rtol=0, atol=2e-5)


def test_loss_layout_invariance(rng):
    latent = _latent(rng)
    head = SegmentationHead(num_classes=NCLS, dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), latent)["params"]
    labels = jnp.asarray(rng.integers(0, NCLS + 1, (B, H, W)), jnp.int32)
    labels = jnp.where(labels == NCLS, 255, labels)   # some ignore pixels

    std = head.apply({"params": params}, latent)[1]
    blk = head.apply({"params": params}, latent, block_space=True)[1]
    l_std = task_loss(std, labels, num_classes=NCLS, ignore_label=255)
    l_blk = task_loss(
        s4d_logits_class_minor(blk, NCLS), fold_labels_s4d(labels),
        num_classes=NCLS, ignore_label=255)
    np.testing.assert_allclose(float(l_std), float(l_blk), rtol=1e-5)


def test_blocked_head_gradient_parity(rng):
    """The head is TRAINABLE — gradients through the blocked remap must
    match the standard path per parameter."""
    latent = _latent(rng)
    head = SegmentationHead(num_classes=NCLS, dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), latent)["params"]
    labels = jnp.asarray(rng.integers(0, NCLS, (B, H, W)), jnp.int32)

    def loss_std(p):
        logits = head.apply({"params": p}, latent)[1]
        return task_loss(logits, labels, num_classes=NCLS, ignore_label=255)

    def loss_blk(p):
        logits = head.apply({"params": p}, latent, block_space=True)[1]
        return task_loss(s4d_logits_class_minor(logits, NCLS),
                         fold_labels_s4d(labels),
                         num_classes=NCLS, ignore_label=255)

    g_std = jax.grad(loss_std)(params)
    g_blk = jax.grad(loss_blk)(params)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_std)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(g_blk)
    for (ks, vs), (kb, vb) in zip(flat_s, flat_b):
        assert ks == kb
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(vb), rtol=0, atol=5e-6,
            err_msg=jax.tree_util.keystr(ks))


def test_resnet_blocked_stem_matches_xla(rng):
    """The 7x7/2 C_in=1 stem evaluated in 4x4 block space (models/resnet.py
    stem_impl='auto') must match the direct lowering exactly — values and
    parameter gradients (the stem is trainable in UDA)."""
    from ess_tpu.models.resnet import ResNet18Encoder

    x = jnp.asarray(rng.normal(size=(2, 32, 48, 1)), jnp.float32)
    enc_b = ResNet18Encoder(dtype=jnp.float32, stem_impl="auto")
    enc_x = ResNet18Encoder(dtype=jnp.float32, stem_impl="xla")
    variables = enc_x.init(jax.random.PRNGKey(0), x)

    def run(enc, v):
        return enc.apply(v, x, train=True, mutable=["batch_stats"])

    (out_b, mut_b), (out_x, mut_x) = run(enc_b, variables), run(enc_x, variables)
    for s in (2, 4, 8):
        np.testing.assert_allclose(
            np.asarray(out_x[s]), np.asarray(out_b[s]), rtol=0, atol=2e-5)
    # BN running-stat updates (incl. the subpixel-pooled blocked BNs) match
    for (ks, vs), (kb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(mut_x)[0],
            jax.tree_util.tree_flatten_with_path(mut_b)[0]):
        assert ks == kb
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(vb), rtol=0, atol=1e-5,
            err_msg=jax.tree_util.keystr(ks))

    def loss(enc, params):
        out, _ = enc.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(out[s] ** 2) for s in (2, 4, 8))

    g_b = jax.grad(lambda p: loss(enc_b, p))(variables["params"])
    g_x = jax.grad(lambda p: loss(enc_x, p))(variables["params"])
    for (ks, vs), (kb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_b)[0]):
        assert ks == kb
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(vb), rtol=2e-4, atol=2e-3,
            err_msg=jax.tree_util.keystr(ks))

    # odd geometry falls back to the direct lowering
    x_odd = jnp.asarray(rng.normal(size=(1, 30, 46, 1)), jnp.float32)
    v_odd = enc_b.init(jax.random.PRNGKey(1), x_odd)
    out_odd, _ = enc_b.apply(v_odd, x_odd, train=True,
                             mutable=["batch_stats"])
    assert out_odd[2].shape == (1, 15, 23, 64)


def test_upsample_conv_blocked_matches_xla(rng):
    """UpsampleConvLayer conv_impl='auto' (s2d block conv after the bilinear
    upsample) must match the direct lowering exactly, values and grads."""
    from ess_tpu.models.layers import UpsampleConvLayer

    x = jnp.asarray(rng.normal(size=(2, 10, 14, 64)), jnp.float32)
    up_b = UpsampleConvLayer(32, conv_impl="auto", dtype=jnp.float32)
    up_x = UpsampleConvLayer(32, conv_impl="xla", dtype=jnp.float32)
    variables = up_x.init(jax.random.PRNGKey(0), x)

    out_b = up_b.apply(variables, x)
    out_x = up_x.apply(variables, x)
    assert out_b.shape == (2, 20, 28, 32)
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_b), rtol=0, atol=2e-5)

    def loss(mod, p):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    g_b = jax.grad(lambda p: loss(up_b, p))(variables["params"])
    g_x = jax.grad(lambda p: loss(up_x, p))(variables["params"])
    for (ks, vs), (kb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(g_x)[0],
            jax.tree_util.tree_flatten_with_path(g_b)[0]):
        assert ks == kb
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(vb), rtol=2e-4, atol=2e-3,
            err_msg=jax.tree_util.keystr(ks))


def test_fold_labels_s4d_roundtrip(rng):
    labels = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
    folded = fold_labels_s4d(labels)
    assert folded.shape == (B, H // 4, (W // 4) * 16)
    # spot-check the subpixel order against space_to_depth4 of the labels
    ref = space_to_depth4(labels[..., None].astype(jnp.float32))
    ref = ref.reshape(B, H // 4, (W // 4) * 16)
    np.testing.assert_array_equal(folded, ref.astype(jnp.int32))


# ----------------------------------------------------------------------
# Fused-final stage (upsample folded into the s4 conv's weights)
# ----------------------------------------------------------------------

def test_fold_up2x_into_conv_exact(rng):
    """conv_kxk(up2x_nearest(x)) == depth_to_space(conv(x, W')) for every
    odd k; k=5 folds to a 3x3 (0.36x the MACs)."""
    from ess_tpu.ops.conv_s2d import (
        depth_to_space, fold_up2x_into_conv, up2x_conv_fused)

    for k in (1, 3, 5, 7):
        x = jnp.asarray(rng.normal(size=(2, 6, 10, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, k, 8, 4)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = jax.lax.conv_general_dilated(
            up, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = depth_to_space(up2x_conv_fused(x, w, b))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-4)
        kp = fold_up2x_into_conv(w).shape[0]
        assert kp == {1: 1, 3: 3, 5: 3, 7: 5}[k]


def fold_logits_up2x(logits):
    """Standard (B, H, W, C) logits -> the fused head's (B, H/2,
    (W/2)*4, C) pseudo-pixel form (test-side reference fold)."""
    b, hh, ww, c = logits.shape
    x = logits.reshape(b, hh // 2, 2, ww // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, hh // 2, (ww // 2) * 4, c)


@pytest.mark.parametrize("skip_type", ["concat", "sum"])
def test_fused_final_head_matches_standard(rng, skip_type):
    """fused_final=True: identical out[2]/out[4], logits equal to the
    pseudo-pixel fold of the standard full-res logits, and the losses on
    folded labels match exactly — values AND gradients."""
    from ess_tpu.train.losses import fold_labels_up2x

    latent = _latent(rng)
    head = SegmentationHead(num_classes=NCLS, input_features=256,
                            skip_connect=True, skip_type=skip_type,
                            dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), latent)["params"]
    std = head.apply({"params": params}, latent)
    fused = head.apply({"params": params}, latent, fused_final=True)
    np.testing.assert_array_equal(np.asarray(std[4]), np.asarray(fused[4]))
    np.testing.assert_array_equal(np.asarray(std[2]), np.asarray(fused[2]))
    assert fused[1].shape == (B, H // 2, (W // 2) * 4, NCLS)
    np.testing.assert_allclose(
        np.asarray(fold_logits_up2x(std[1])), np.asarray(fused[1]),
        rtol=0, atol=5e-5)

    labels = jnp.asarray(rng.integers(0, NCLS, (B, H, W)), jnp.int32)
    labels = labels.at[0, 0].set(255)  # exercise the ignore mask too

    def loss_std(p):
        return task_loss(head.apply({"params": p}, latent)[1], labels,
                         num_classes=NCLS, ignore_label=255)

    def loss_fused(p):
        return task_loss(
            head.apply({"params": p}, latent, fused_final=True)[1],
            fold_labels_up2x(labels), num_classes=NCLS, ignore_label=255)

    np.testing.assert_allclose(float(loss_std(params)),
                               float(loss_fused(params)), rtol=1e-6)
    g_s = jax.grad(loss_std)(params)
    g_f = jax.grad(loss_fused)(params)
    for (ks, vs), (kf, vf) in zip(
            jax.tree_util.tree_flatten_with_path(g_s)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        assert ks == kf
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vs), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(ks))


def test_fold_labels_up2x_matches_logit_fold(rng):
    labels = jnp.asarray(rng.integers(0, NCLS, (B, H, W)), jnp.int32)
    from ess_tpu.train.losses import fold_labels_up2x
    ref = fold_logits_up2x(labels[..., None].astype(jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(fold_labels_up2x(labels)),
        np.asarray(ref[..., 0]).astype(np.int32))
