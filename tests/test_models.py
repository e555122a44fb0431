"""Shape and behavior tests for the model zoo (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ess_tpu.models import (
    ConvLSTMCell,
    RecurrentUNet,
    ResNet18Encoder,
    SegmentationHead,
    zero_recurrent_state,
)
from ess_tpu.recon import Reconstructor

KEY = jax.random.PRNGKey(0)


def test_convlstm_cell_shapes():
    cell = ConvLSTMCell(hidden=8)
    x = jnp.ones((2, 8, 8, 4))
    state = (jnp.zeros((2, 8, 8, 8)), jnp.zeros((2, 8, 8, 8)))
    params = cell.init(KEY, x, state)
    out, (h, c) = cell.apply(params, x, state)
    assert out.shape == (2, 8, 8, 8)
    assert h.shape == c.shape == (2, 8, 8, 8)
    # gates conv consumes input + hidden channels
    assert params["params"]["gates"]["kernel"].shape == (3, 3, 12, 32)


def test_recurrent_unet_latent_and_state():
    model = RecurrentUNet(base_channels=8, num_encoders=3)
    x = jnp.ones((2, 16, 16, 5))
    states = zero_recurrent_state(2, 16, 16, num_encoders=3, base_channels=8)
    params = model.init(KEY, x, states)["params"]
    img, new_states, latent = model.apply({"params": params}, x, states)
    assert img.shape == (2, 16, 16, 1)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0  # sigmoid
    # latent dict: {1: base, 2: 2*base, 4: 4*base, 8: 8*base}
    assert latent[1].shape == (2, 16, 16, 8)
    assert latent[2].shape == (2, 8, 8, 16)
    assert latent[4].shape == (2, 4, 4, 32)
    assert latent[8].shape == (2, 2, 2, 64)
    assert len(new_states) == 3

    # encoder-only mode shares the same params, skips img
    img2, states2, latent2 = model.apply({"params": params}, x, states, decode=False)
    assert img2 is None
    np.testing.assert_allclose(np.asarray(latent2[8]), np.asarray(latent[8]), atol=1e-6)


def test_recurrent_state_changes_output():
    model = RecurrentUNet(base_channels=8, num_encoders=3)
    x = jax.random.normal(KEY, (1, 16, 16, 5))
    s0 = zero_recurrent_state(1, 16, 16, num_encoders=3, base_channels=8)
    params = model.init(KEY, x, s0)["params"]
    img1, s1, _ = model.apply({"params": params}, x, s0)
    img2, _, _ = model.apply({"params": params}, x, s1)
    assert not np.allclose(np.asarray(img1), np.asarray(img2))


def test_resnet18_encoder_scales():
    enc = ResNet18Encoder()
    x = jnp.ones((2, 32, 32, 1))
    variables = enc.init(KEY, x)
    out = enc.apply(variables, x)
    assert out[1].shape == (2, 32, 32, 1)
    assert out[2].shape == (2, 16, 16, 64)
    assert out[4].shape == (2, 8, 8, 128)
    assert out[8].shape == (2, 4, 4, 256)


def test_resnet18_bn_mutation():
    enc = ResNet18Encoder()
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    variables = enc.init(KEY, x)
    _, mutated = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    stem_mean = mutated["batch_stats"]["stem_bn"]["mean"]
    assert not np.allclose(np.asarray(stem_mean), 0.0)


@pytest.mark.parametrize("skip_type", ["concat", "sum"])
def test_seghead_multiscale(skip_type):
    head = SegmentationHead(num_classes=6, input_features=64, skip_type=skip_type)
    latent = {
        1: jnp.ones((2, 16, 16, 8)),
        2: jnp.ones((2, 8, 8, 16)),
        4: jnp.ones((2, 4, 4, 32)),
        8: jnp.ones((2, 2, 2, 64)),
    }
    params = head.init(KEY, latent)
    out = head.apply(params, latent)
    assert out[1].shape == (2, 16, 16, 6)   # logits at input res
    assert out[2].shape == (2, 8, 8, 16)
    assert out[4].shape == (2, 4, 4, 16)
    assert out[8].shape == (2, 2, 2, 64)


def test_seghead_channels_match_reference_geometry():
    """input_c=256 flow: out[4] 64ch, out[2] 64ch (style_networks.py:25-33)."""
    head = SegmentationHead(num_classes=11, input_features=256)
    latent = {
        1: jnp.ones((1, 16, 16, 32)),
        2: jnp.ones((1, 8, 8, 64)),
        4: jnp.ones((1, 4, 4, 128)),
        8: jnp.ones((1, 2, 2, 256)),
    }
    params = head.init(KEY, latent)
    out = head.apply(params, latent)
    assert out[4].shape[-1] == 64
    assert out[2].shape[-1] == 64
    assert out[1].shape[-1] == 11


def test_reconstructor_rollout():
    model = RecurrentUNet(base_channels=8, num_encoders=3)
    recon = Reconstructor(model=model, height=16, width=16)
    windows = jax.random.normal(KEY, (2, 4, 16, 16, 5))
    state = recon.init_state(2)
    params = model.init(KEY, windows[:, 0], state)["params"]

    img, final_state, latent = jax.jit(recon.rollout)(params, windows)
    assert img.shape == (2, 16, 16, 1)
    assert latent[8].shape == (2, 2, 2, 64)

    # rollout == manual python loop over steps
    s = recon.init_state(2)
    for i in range(3):
        _, s, _ = recon.step(params, windows[:, i], s, decode=False)
    img_ref, _, latent_ref = recon.step(params, windows[:, 3], s)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(latent[8]), np.asarray(latent_ref[8]), atol=1e-5)


def test_reconstructor_nondivisible_shape_pads():
    model = RecurrentUNet(base_channels=8, num_encoders=3)
    recon = Reconstructor(model=model, height=14, width=18)  # not /8-divisible
    g = recon.geometry
    assert g.padded_height == 16 and g.padded_width == 24
    windows = jax.random.normal(KEY, (1, 2, 14, 18, 5))
    state = recon.init_state(1)
    params = model.init(KEY, jnp.zeros((1, 16, 24, 5)), state)["params"]
    img, _, latent = recon.rollout(params, windows)
    assert img.shape == (1, 16, 24, 1)
    assert latent[1].shape == (1, 16, 24, 8)


def test_unet_task_decoder_multiscale():
    from ess_tpu.models import UNetTaskDecoder
    dec = UNetTaskDecoder(num_classes=13, base_channels=8, num_encoders=3)
    latent = {
        1: jnp.ones((2, 16, 16, 8)),
        2: jnp.ones((2, 8, 8, 16)),
        4: jnp.ones((2, 4, 4, 32)),
        8: jnp.ones((2, 2, 2, 64)),
    }
    params = dec.init(KEY, latent)
    out = dec.apply(params, latent)
    assert out[1].shape == (2, 16, 16, 13)
    assert out[2].shape[1:3] == (8, 8)
    assert out[4].shape[1:3] == (4, 4)
    assert out[8].shape == (2, 2, 2, 64)


def test_unet_plain_forward():
    from ess_tpu.models import UNet
    model = UNet(base_channels=8, num_encoders=3)
    x = jnp.ones((1, 16, 16, 5))
    params = model.init(KEY, x)
    img = model.apply(params, x)
    assert img.shape == (1, 16, 16, 1)
    assert float(img.min()) >= 0 and float(img.max()) <= 1


def test_conv_gru_cell():
    from ess_tpu.models import ConvGRUCell
    cell = ConvGRUCell(hidden=8)
    x = jnp.ones((2, 8, 8, 4))
    h0 = jnp.zeros((2, 8, 8, 8))
    params = cell.init(KEY, x, h0)
    out, h1 = cell.apply(params, x, h0)
    assert out.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(h1))
