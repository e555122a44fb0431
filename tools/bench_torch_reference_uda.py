"""Measured torch-reference UDA train step on THIS host.

VERDICT round-2 item 2 asked for a per-config vs_baseline: the DSEC UDA
config is the reference's flagship mode (ess_trainer.py:103-148) but the
only grounded baseline datum was the supervised step
(tools/bench_torch_reference.py). This measures the reference's FULL UDA
train step end-to-end with the real reference trainer choreography —
ESSModel.train_step verbatim: image branch forward+backward, the
20-window frozen E2VID rollout (event_train_step:277-280), both cycle
steps with their extra head passes, double backward with the
requires_grad freeze dance, and BOTH RAdam steps — on torch-CPU at a
reduced shape, and reports the linear-scaling projection to the DSEC UDA
training shape (B8 x T20 x 440x640 events + B8 440x640 images).

The image encoder runs at torchvision-resnet18 width (the harness's
resnet18-shaped net at bw=64 — identical BasicBlock compute to the real
layer1-3), so the image branch carries the reference's true FLOPs.

Scaling assumptions (same as the supervised tool, conservative in the
reference's favor): compute linear in B * H * W (and T for the rollout);
EXCLUDES voxelization and data loading.

Usage: python tools/bench_torch_reference_uda.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np
import torch

# installs the torchvision/tensorboardX/albumentations fakes and puts
# /root/reference on sys.path (same harness the gradient-parity test uses)
import test_uda_grad_parity as harness  # noqa: E402

# the image branch must carry real resnet18 compute: rebind the fake
# factory to width 64 (StyleEncoderE2VID calls models.resnet18() lazily
# at construction time, so rebinding before construction is sufficient)
sys.modules["torchvision.models"].resnet18 = (
    lambda pretrained=False: harness._MiniResnet18(bw=64))

import training.ess_trainer as ET  # noqa: E402
from e2vid.model.unet import UNetRecurrent  # noqa: E402
from utils.radam import RAdam  # noqa: E402

B_FULL, T_FULL, H_FULL, W_FULL = 8, 20, 440, 640


class _RollingReconstructor:
    """ImageReconstructor's training surface (image_reconstructor.py:
    update_reconstruction): one frozen E2VID forward per window with
    carried recurrent state. Preprocessing (normalize/pad) is a
    negligible elementwise pass and is excluded — conservative in the
    reference's favor."""

    def __init__(self, e2vid):
        self.model = e2vid
        self.last_states_for_each_channel = {"grayscale": None}

    def update_reconstruction(self, event_tensor):
        with torch.no_grad():
            img, states, latent = self.model(
                event_tensor, self.last_states_for_each_channel["grayscale"])
            self.last_states_for_each_channel["grayscale"] = states
        return img, states, latent


def build_model(nc=11, t_dim=5):
    e2vid = UNetRecurrent(
        num_input_channels=5, num_output_channels=1, skip_type="sum",
        recurrent_block_type="convlstm", activation="sigmoid",
        num_encoders=3, base_num_channels=32, num_residual_blocks=2,
        norm=None, use_upsample_conv=True)
    e2vid.eval()
    for p in e2vid.parameters():
        p.requires_grad = False

    enc = ET.StyleEncoderE2VID(1, skip_connect=True)
    head = ET.SemSegE2VID(input_c=256, output_c=nc,
                          skip_connect=True, skip_type="concat")

    model = object.__new__(ET.ESSModel)
    s = harness._settings("DSEC_events")
    s.nr_events_data_b = t_dim
    s.input_channels_b = 5
    model.settings = s
    model.models_dict = {"front_sensor_a": enc, "back_end": head}
    model.optimizers_dict = {
        "optimizer_back": RAdam(head.parameters(), lr=1e-4,
                                weight_decay=0., betas=(0., 0.999)),
        "optimizer_front_sensor_a": RAdam(enc.parameters(), lr=1e-4,
                                          weight_decay=0., betas=(0., 0.999)),
    }
    model.task_loss = ET.TaskLoss(losses=["dice", "cross_entropy"],
                                  num_classes=nc, ignore_index=255)
    model.cycle_content_loss = torch.nn.L1Loss()
    model.cycle_pred_loss = ET.symJSDivLoss()
    model.visualize_epoch = lambda: False
    model.reconstructor = _RollingReconstructor(e2vid)
    return model


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", nargs=4, type=int, default=[1, 5, 112, 160],
                    metavar=("B", "T", "H", "W"),
                    help="reduced measurement shape")
    ap.add_argument("--project", nargs=4, type=int,
                    default=[B_FULL, T_FULL, H_FULL, W_FULL],
                    metavar=("B", "T", "H", "W"),
                    help="full config shape for the linear projection")
    ap.add_argument("--classes", type=int, default=11)
    args = ap.parse_args()

    torch.set_num_threads(os.cpu_count() or 1)
    nc = args.classes
    b, t_dim, h, w = args.shape
    bf, tf, hf, wf = args.project
    model = build_model(nc, t_dim)

    rng = np.random.default_rng(0)
    img_a = torch.from_numpy(rng.normal(size=(b, 1, h, w)).astype(np.float32))
    labels = torch.from_numpy(
        rng.integers(0, nc, (b, h, w)).astype(np.int64))
    data_b = torch.from_numpy(
        rng.normal(size=(b, t_dim * 5, h, w)).astype(np.float32))
    batch = ([img_a, labels], [data_b, labels])

    model.train_step(batch)  # warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        model.train_step(batch)
    dt = (time.perf_counter() - t0) / reps

    win_rate_small = b * t_dim / dt
    scale = (bf * tf * hf * wf) / (b * t_dim * h * w)
    dt_full_proj = dt * scale
    rate_full_proj = bf * tf / dt_full_proj
    print(f"measured: {dt*1e3:.0f} ms / UDA step at B{b} T{t_dim} {h}x{w} "
          f"({win_rate_small:.1f} windows/s at the reduced shape)")
    print(f"linear projection to B{bf} T{tf} {hf}x{wf}: "
          f"{dt_full_proj:.1f} s/step = {rate_full_proj:.2f} windows/s "
          f"(torch-CPU, {torch.get_num_threads()} threads, excl. "
          "voxelization/IO)")


if __name__ == "__main__":
    main()
