"""Activation-level parity: torch reference models vs converted flax models.

Builds the reference torch architectures (random weights), converts the
state_dicts with ess_tpu.io.convert, and checks forward outputs match —
the strongest guarantee that real E2VID/ResNet18 checkpoints behave
identically after conversion (SURVEY.md section 7 build step 3).
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from ess_tpu.io.convert import load_resnet18_torch, strip_module_prefix  # noqa: E402
from ess_tpu.models import RecurrentUNet, ResNet18Encoder, zero_recurrent_state  # noqa: E402


def _convert_e2vid_state_dict(sd, num_encoders=3, num_resblocks=2):
    """Run the converter's mapping on an in-memory state dict."""
    import ess_tpu.io.convert as C
    raw = {"state_dict": {f"unetrecurrent.{k}": v for k, v in sd.items()},
           "model": {"num_encoders": num_encoders,
                     "num_residual_blocks": num_resblocks}}
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.pth.tar")
        torch.save(raw, path)
        params, config = C.load_e2vid_checkpoint(path)
    return params, config


@pytest.mark.parametrize("hw", [(32, 40)])
def test_e2vid_activation_parity(hw):
    from e2vid.model.unet import UNetRecurrent

    torch.manual_seed(0)
    h, w = hw
    tmodel = UNetRecurrent(
        num_input_channels=5, num_output_channels=1, skip_type="sum",
        recurrent_block_type="convlstm", activation="sigmoid",
        num_encoders=3, base_num_channels=32, num_residual_blocks=2,
        norm=None, use_upsample_conv=True).eval()

    params, _ = _convert_e2vid_state_dict(tmodel.state_dict())

    model = RecurrentUNet(base_channels=32, num_encoders=3)
    x = np.random.default_rng(0).normal(size=(2, 5, h, w)).astype(np.float32)

    with torch.no_grad():
        timg1, tstates, tlat = tmodel(torch.from_numpy(x), None)
        timg2, _, _ = tmodel(torch.from_numpy(x), tstates)

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    states = zero_recurrent_state(2, h, w, num_encoders=3, base_channels=32)
    img1, new_states, lat = model.apply({"params": params}, x_nhwc, states)
    img2, _, _ = model.apply({"params": params}, x_nhwc, new_states)

    np.testing.assert_allclose(
        np.asarray(img1)[..., 0], timg1.numpy()[:, 0], atol=2e-5)
    # latent dict parity at every scale (NCHW vs NHWC)
    for scale in (1, 2, 4, 8):
        np.testing.assert_allclose(
            np.asarray(lat[scale]).transpose(0, 3, 1, 2),
            tlat[scale].numpy(), atol=2e-5,
            err_msg=f"latent scale {scale}")
    # recurrence parity (state carried one step)
    np.testing.assert_allclose(
        np.asarray(img2)[..., 0], timg2.numpy()[:, 0], atol=5e-5)


def _make_torch_resnet18():
    """Minimal torch resnet18 with torchvision's module/state-dict naming
    (torchvision isn't vendored here; only the state_dict layout matters)."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idn)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.layer1 = tnn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
            self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))

    net = Net()
    # randomize BN running stats so parity actually exercises them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    return net


def test_resnet18_conversion_parity():
    torch.manual_seed(0)
    tnet = _make_torch_resnet18().eval()

    enc = ResNet18Encoder()
    import jax
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    params, stats = load_resnet18_torch(
        tnet.state_dict(), variables["params"], variables["batch_stats"],
        adapt_stem=True)

    x = np.random.default_rng(1).normal(size=(2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        h = torch.nn.functional.conv2d(
            torch.from_numpy(x), tnet.conv1.weight.mean(1, keepdim=True),
            stride=2, padding=3)
        h = torch.relu(tnet.bn1(h))
        h = tnet.layer1(h)
        t2 = h
        h = tnet.layer2(h)
        t4 = h
        h = tnet.layer3(h)
        t8 = h

    out = enc.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(
        np.asarray(out[2]).transpose(0, 3, 1, 2), t2.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out[4]).transpose(0, 3, 1, 2), t4.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out[8]).transpose(0, 3, 1, 2), t8.numpy(), atol=2e-4)


def test_strip_module_prefix():
    sd = {"module.a.weight": 1, "b.bias": 2}
    out = strip_module_prefix(sd)
    assert out == {"a.weight": 1, "b.bias": 2}


@pytest.mark.parametrize("num_encoders,base", [(4, 32)])
def test_e2vid_parity_other_geometries(num_encoders, base):
    """Converter + model handle non-lightweight E2VID geometries
    (num_encoders/base from the checkpoint's embedded config,
    loading_utils.py:11-21). NOTE the reference hardcodes its latent dict to
    keys {1,2,4,8} (unet.py:172) — fewer than 3 encoders crashes it outright
    — so parity is checked on the shared keys."""
    from e2vid.model.unet import UNetRecurrent
    from ess_tpu.models import zero_recurrent_state

    torch.manual_seed(1)
    h = w = 32
    tmodel = UNetRecurrent(
        num_input_channels=5, num_output_channels=1, skip_type="sum",
        recurrent_block_type="convlstm", activation="sigmoid",
        num_encoders=num_encoders, base_num_channels=base,
        num_residual_blocks=2, norm=None, use_upsample_conv=True).eval()
    params, config = _convert_e2vid_state_dict(
        tmodel.state_dict(), num_encoders=num_encoders)

    from ess_tpu.models import RecurrentUNet
    model = RecurrentUNet(base_channels=base, num_encoders=num_encoders)
    x = np.random.default_rng(2).normal(size=(1, 5, h, w)).astype(np.float32)
    with torch.no_grad():
        timg, _, tlat = tmodel(torch.from_numpy(x), None)
    states = zero_recurrent_state(1, h, w, num_encoders=num_encoders,
                                  base_channels=base)
    img, _, lat = model.apply({"params": params},
                              jnp.asarray(x.transpose(0, 2, 3, 1)), states)
    np.testing.assert_allclose(np.asarray(img)[..., 0], timg.numpy()[:, 0],
                               atol=3e-5)
    for scale in (1, 2, 4, 8):  # the keys the reference exposes (unet.py:172)
        np.testing.assert_allclose(
            np.asarray(lat[scale]).transpose(0, 3, 1, 2),
            tlat[scale].numpy(), atol=3e-5, err_msg=f"scale {scale}")


def test_color_merge_parity_vs_reference(rng):
    """Host color-merge pipeline == the reference's merge utilities
    (inference_utils.py:341-429), bit for bit on random channels."""
    pytest.importorskip("cv2")
    from e2vid.utils import inference_utils as ref

    from ess_tpu.recon import color as ours

    h, w = 24, 32
    channels_ref = {
        ch: rng.integers(0, 256, (h, w)).astype(np.uint8)
        for ch in ("R", "G", "W", "B")
    }
    channels_ref["grayscale"] = rng.integers(
        0, 256, (2 * h, 2 * w)).astype(np.uint8)
    channels_ours = {k: v.copy() for k, v in channels_ref.items()}

    got = ours.merge_channels_into_color_image(channels_ours)
    want = ref.merge_channels_into_color_image(channels_ref)
    np.testing.assert_array_equal(got, want)

    a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    for dx, dy in ((1, 1), (1, 0), (0, 1), (-2, 3)):
        np.testing.assert_array_equal(
            ours.shift_image(a.copy(), dx, dy),
            ref.shift_image(a.copy(), dx, dy))
