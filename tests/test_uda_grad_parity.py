"""Per-parameter gradient parity: UDA routing vs the torch reference.

Runs the reference ESSModel.train_step choreography VERBATIM (the real
ess_trainer.py:103-148 freeze/detach + serialized backwards, with real
StyleEncoderE2VID / SemSegE2VID / TaskLoss / symJSDivLoss modules) on a
fixed tiny batch, converts the resulting per-parameter torch gradients
through the production checkpoint converters, and diffs them against
``jax.grad`` of ess_tpu.train.uda.uda_losses — the single combined loss our
jitted train step differentiates — with converted identical weights. Both
DDD17 and DSEC modes (the detach rules differ).

The frozen E2VID rollout contributes no gradients, so identical
(img_fake, latent_real) tensors are injected on both sides; rollout-output
parity itself is covered by tests/test_convert.py.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

BW = 64          # front-encoder base width (= 2 * e2vid_base_channels);
                 # the reference stem hard-codes 64 (style_networks.py:116)
B, H, W = 2, 32, 48
NCLS = 6
IGNORE = 255


def _fake_module(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _BasicBlock(tnn.Module):
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


class _MiniResnet18(tnn.Module):
    """torchvision-resnet18-shaped net at width BW (children order and
    state-dict naming match; torchvision itself isn't vendored here)."""

    def __init__(self, bw=BW):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, bw, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(bw)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_BasicBlock(bw, bw), _BasicBlock(bw, bw))
        self.layer2 = tnn.Sequential(_BasicBlock(bw, 2 * bw, 2),
                                     _BasicBlock(2 * bw, 2 * bw))
        self.layer3 = tnn.Sequential(_BasicBlock(2 * bw, 4 * bw, 2),
                                     _BasicBlock(4 * bw, 4 * bw))


# the reference modules import torchvision / tensorboardX / albumentations /
# its own (un-__init__ed) datasets package at module scope — provide fakes
tv = _fake_module("torchvision")
tv.models = _fake_module("torchvision.models",
                         resnet18=lambda pretrained=False: _MiniResnet18())
tv.utils = _fake_module("torchvision.utils", make_grid=lambda *a, **k: None)
tv.transforms = _fake_module("torchvision.transforms")
_fake_module("tensorboardX", SummaryWriter=object)
_fake_module("albumentations", Compose=lambda *a, **k: None)
_ds = _fake_module("datasets")
_ds.wrapper_dataloader = _fake_module("datasets.wrapper_dataloader",
                                      WrapperDataset=object)

sys.path.insert(0, "/root/reference")
import training.ess_trainer as ET  # noqa: E402

from ess_tpu.core.config import (  # noqa: E402
    Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
    ModelConfig, OptimConfig, TaskConfig)
from ess_tpu.io.convert import (  # noqa: E402
    load_semseg_head_torch, load_style_encoder_torch)
from ess_tpu.train import uda  # noqa: E402
from ess_tpu.train.builder import build_modules  # noqa: E402

WEIGHTS = dict(weight_task_loss=1.0, weight_cycle_emb_loss=0.01,
               weight_cycle_pred_loss=1.0, weight_cycle_task_loss=0.01)


def _settings(name_b):
    return types.SimpleNamespace(
        dataset_name_b=name_b,
        require_paired_data_train_a=False,
        require_paired_data_train_b=False,
        skip_connect_encoder=True,
        weight_task_loss=WEIGHTS["weight_task_loss"],
        weight_cycle_loss=WEIGHTS["weight_cycle_emb_loss"],
        weight_cycle_task_loss=WEIGHTS["weight_cycle_task_loss"],
        weight_KL_loss=WEIGHTS["weight_cycle_pred_loss"],
        train_on_event_labels=False,
        nr_events_data_b=1,
        input_channels_b=1,
    )


class _FakeReconstructor:
    """Stands in for the frozen E2VID rollout: returns the fixed
    (img_fake, latent_real) the test injects on both sides."""

    def __init__(self, img_fake, latent_real):
        self.img_fake = img_fake
        self.latent_real = latent_real
        self.last_states_for_each_channel = {}

    def update_reconstruction(self, _event_tensor):
        return self.img_fake, None, dict(self.latent_real)


def _grad_state_dict(module):
    gsd = {k: torch.zeros_like(v) for k, v in module.state_dict().items()}
    for name, p in module.named_parameters():
        if p.grad is not None:
            gsd[name] = p.grad
    return gsd


def _tree_allclose(got, want, path=""):
    import jax
    gl, gt = jax.tree_util.tree_flatten_with_path(got)[0], None
    flat_got = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    flat_want = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert flat_got.keys() == flat_want.keys(), (
        set(flat_got) ^ set(flat_want))
    for key in flat_got:
        a = np.asarray(flat_got[key])
        b = np.asarray(flat_want[key])
        # elementwise bound, loose enough for f32 reduction-order noise
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2.5e-4,
                                   err_msg=f"{path}{key}")
        # and a relative-norm bound per tensor (in f64 the same comparison
        # lands at ~5e-6 relative — the f32 headroom here is reduction-order
        # noise, verified, not a routing difference). Tensors whose true
        # gradient is ~0 (conv biases feeding instance norm: the mean
        # subtraction cancels any constant shift exactly) are noise-vs-noise
        # — the elementwise atol above is the meaningful bound there.
        denom = np.linalg.norm(b)
        if denom > 1e-4:
            rel = np.linalg.norm(a - b) / denom
            assert rel < 3e-3, f"{path}{key}: relative grad error {rel}"


@pytest.mark.parametrize("name_b", ["DDD17_events", "DSEC_events"])
def test_uda_gradient_parity(name_b, rng):
    import jax
    import jax.numpy as jnp

    torch.manual_seed(3)

    # ---------------- fixed batch ----------------
    img_a = rng.normal(size=(B, 1, H, W)).astype(np.float32)
    labels_a = rng.integers(0, NCLS, (B, H, W)).astype(np.int64)
    labels_a[0, :4] = IGNORE  # exercise ignore masking
    img_fake = rng.normal(size=(B, 1, H, W)).astype(np.float32)
    latent_real = {
        1: rng.normal(size=(B, 1, H, W)).astype(np.float32),
        2: rng.normal(size=(B, BW, H // 2, W // 2)).astype(np.float32),
        4: rng.normal(size=(B, 2 * BW, H // 4, W // 4)).astype(np.float32),
        8: rng.normal(size=(B, 4 * BW, H // 8, W // 8)).astype(np.float32),
    }

    # ---------------- torch reference side ----------------
    enc = ET.StyleEncoderE2VID(1, skip_connect=True)
    head = ET.SemSegE2VID(input_c=4 * BW, output_c=NCLS,
                          skip_connect=True, skip_type="concat")
    model = object.__new__(ET.ESSModel)
    model.settings = _settings(name_b)
    model.models_dict = {"front_sensor_a": enc, "back_end": head}
    model.optimizers_dict = {
        "optimizer_back": torch.optim.SGD(head.parameters(), lr=0.0),
        "optimizer_front_sensor_a": torch.optim.SGD(enc.parameters(), lr=0.0),
    }
    model.task_loss = ET.TaskLoss(losses=["dice", "cross_entropy"],
                                  num_classes=NCLS, ignore_index=IGNORE)
    model.cycle_content_loss = torch.nn.L1Loss()
    model.cycle_pred_loss = ET.symJSDivLoss()
    model.visualize_epoch = lambda: False
    model.reconstructor = _FakeReconstructor(
        torch.from_numpy(img_fake),
        {k: torch.from_numpy(v) for k, v in latent_real.items()})

    batch = (
        [torch.from_numpy(img_a), torch.from_numpy(labels_a)],
        [torch.zeros(B, 1, H, W), torch.from_numpy(labels_a)],
    )
    losses_ref, _, final_loss_ref = model.train_step(batch)

    # ---------------- ess-tpu side ----------------
    cfg = Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(H, W)),
            sensor_b=EventDatasetConfig(name=name_b, shape=(H, W))),
        model=ModelConfig(model_name="ess", compute_dtype="float32",
                          e2vid_base_channels=BW // 2,
                          skip_connect_encoder=True,
                          skip_connect_task=True,
                          skip_connect_task_type="concat",
                          train_on_event_labels=False),
        task=TaskConfig(semseg_num_classes=NCLS, semseg_ignore_label=IGNORE),
        optim=OptimConfig(**WEIGHTS),
    )
    mods = build_modules(cfg)

    fvars = mods.front_a.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, H, W, 1)))
    front_params, front_stats = load_style_encoder_torch(
        enc.state_dict(), fvars["params"], fvars["batch_stats"])

    nhwc = lambda a: jnp.asarray(np.moveaxis(a, 1, -1))
    latent_j = {k: nhwc(v) for k, v in latent_real.items()}
    hvars = mods.head.init(jax.random.PRNGKey(1), latent_j)
    back_params = load_semseg_head_torch(
        head.state_dict(), hvars["params"], skip_connect=True)

    def total_loss(fp, bp):
        total, (losses, _) = uda.uda_losses(
            mods, fp, bp, front_stats,
            img_a=nhwc(img_a), labels_a=jnp.asarray(labels_a),
            img_fake=nhwc(img_fake), latent_real=latent_j)
        return total, losses

    (total, losses_ours), grads = jax.value_and_grad(
        total_loss, argnums=(0, 1), has_aux=True)(front_params, back_params)
    g_front, g_back = grads

    # total losses agree
    np.testing.assert_allclose(float(total),
                               float(final_loss_ref.detach()),
                               rtol=1e-4, atol=1e-5)
    for key in ("semseg_sensor_a_loss", "cycle_latent_8x_sensor_b_to_sensor_a_loss",
                "cycle_pred_1x_sensor_b_to_sensor_a_loss"):
        np.testing.assert_allclose(
            float(losses_ours[key]), float(losses_ref[key]),
            rtol=1e-4, atol=1e-6, err_msg=key)

    # per-parameter gradients agree, routed through the SAME converters the
    # checkpoints use (zero templates; BN running stats carry no grads)
    zeros = lambda tree: jax.tree.map(np.zeros_like, tree)
    gf_ref, _ = load_style_encoder_torch(
        _grad_state_dict(enc), zeros(front_params), zeros(front_stats))
    gb_ref = load_semseg_head_torch(
        _grad_state_dict(head), zeros(back_params), skip_connect=True)

    _tree_allclose(g_back, gb_ref, path="back/")
    _tree_allclose(g_front, gf_ref, path="front/")
