"""Measured torch-reference supervised train step on THIS host.

VERDICT round-2 item 6: bench.py's 160 windows/s baseline rested on one
measured component (VoxelGrid.convert: 40 ms/window torch-CPU single-thread)
plus an assumed GPU rollout term. This script measures the reference's FULL
supervised train step end-to-end with the real reference modules
(e2vid UNetRecurrent rollout under no_grad + SemSegE2VID head + TaskLoss
backward + reference RAdam) on torch-CPU, at a reduced shape, and reports
the linear-scaling projection to the DSEC training shape.

Scaling assumptions (stated, conservative in the reference's favor):
- compute scales linearly in B * T * H * W (convs dominate; boundary
  effects at the reduced shape only make the reference look FASTER),
- the measured number EXCLUDES event voxelization and data loading (the
  separately measured 40 ms/window CPU voxelizer would only lower the
  reference's sustained rate).

Usage: python tools/bench_torch_reference.py [--full] (--full also times
one full-resolution window for a direct per-window datum)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np
import torch

# the reference imports torchvision at module scope; only resnet18 is used
# and not by this benchmark — provide the same minimal fakes the parity
# tests use (tests/test_uda_grad_parity.py)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
import test_uda_grad_parity  # noqa: F401,E402  (installs the fakes)

B_FULL, T_FULL, H_FULL, W_FULL = 8, 20, 440, 640


def build_reference(nc=11):
    from e2vid.model.unet import UNetRecurrent
    from models.style_networks import SemSegE2VID
    from utils.loss_functions import TaskLoss
    from utils.radam import RAdam

    e2vid = UNetRecurrent(
        num_input_channels=5, num_output_channels=1, skip_type="sum",
        recurrent_block_type="convlstm", activation="sigmoid",
        num_encoders=3, base_num_channels=32, num_residual_blocks=2,
        norm=None, use_upsample_conv=True)
    e2vid.eval()
    for p in e2vid.parameters():
        p.requires_grad = False
    head = SemSegE2VID(input_c=256, output_c=nc, skip_connect=True,
                       skip_type="concat")
    loss = TaskLoss(losses=["dice", "cross_entropy"], num_classes=nc,
                    ignore_index=255)
    opt = RAdam(head.parameters(), lr=1e-4, weight_decay=0., betas=(0., 0.999))
    return e2vid, head, loss, opt


def latent_from(e2vid, windows):
    """The reference rollout: T sequential forwards with carried state
    (ess_supervised_trainer.py:126-129 / image_reconstructor.py:102-123)."""
    states = None
    latent = None
    with torch.no_grad():
        for t in range(windows.shape[1]):
            _, states, latent = e2vid(windows[:, t], states)
    # detach map (trainTaskStep :145-146)
    return {k: v.detach() for k, v in latent.items()}


def train_step(e2vid, head, loss_fn, opt, windows, labels):
    latent = latent_from(e2vid, windows)
    opt.zero_grad()
    pred = head(latent)
    loss = loss_fn(pred[1], labels)
    loss.backward()
    opt.step()
    return float(loss.detach())


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", nargs=4, type=int, default=[1, 5, 112, 160],
                    metavar=("B", "T", "H", "W"))
    ap.add_argument("--project", nargs=4, type=int,
                    default=[B_FULL, T_FULL, H_FULL, W_FULL],
                    metavar=("B", "T", "H", "W"))
    ap.add_argument("--classes", type=int, default=11)
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    torch.set_num_threads(os.cpu_count() or 1)
    nc = args.classes
    e2vid, head, loss_fn, opt = build_reference(nc)

    b, t_dim, h, w = args.shape
    bf, tf, hf, wf = args.project
    rng = np.random.default_rng(0)
    windows = torch.from_numpy(
        rng.normal(size=(b, t_dim, 5, h, w)).astype(np.float32))
    labels = torch.from_numpy(
        rng.integers(0, nc, (b, h, w)).astype(np.int64))

    train_step(e2vid, head, loss_fn, opt, windows, labels)  # warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        train_step(e2vid, head, loss_fn, opt, windows, labels)
    dt = (time.perf_counter() - t0) / reps

    win_rate_small = b * t_dim / dt
    scale = (bf * tf * hf * wf) / (b * t_dim * h * w)
    dt_full_proj = dt * scale
    rate_full_proj = bf * tf / dt_full_proj
    print(f"measured: {dt*1e3:.0f} ms / step at B{b} T{t_dim} {h}x{w} "
          f"({win_rate_small:.1f} windows/s at the reduced shape)")
    print(f"linear projection to B{bf} T{tf} {hf}x{wf}: "
          f"{dt_full_proj:.1f} s/step = {rate_full_proj:.2f} windows/s "
          f"(torch-CPU, {torch.get_num_threads()} threads, excl. "
          "voxelization/IO)")

    if args.full:
        win1 = torch.from_numpy(
            rng.normal(size=(1, 1, 5, hf, wf)).astype(np.float32))
        lab1 = torch.from_numpy(
            rng.integers(0, nc, (1, hf, wf)).astype(np.int64))
        train_step(e2vid, head, loss_fn, opt, win1, lab1)
        t0 = time.perf_counter()
        train_step(e2vid, head, loss_fn, opt, win1, lab1)
        dt1 = time.perf_counter() - t0
        print(f"full-res single-window step: {dt1*1e3:.0f} ms "
              f"({1/dt1:.2f} windows/s)")


if __name__ == "__main__":
    main()
