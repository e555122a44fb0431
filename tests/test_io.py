"""Tests for io: writers, timers, and multihost helpers (single process)."""

import json
import os
import time

import numpy as np
import pytest


def test_metrics_writer(tmp_path):
    from ess_tpu.io.writers import MetricsWriter

    w = MetricsWriter(str(tmp_path / "run"), config={"a": 1}, flush_every=2)
    w.scalar("train/loss", 1.5, 1)
    w.averaged_scalar("train/avg", 1.0, 2)
    w.averaged_scalar("train/avg", 3.0, 3)  # flush at 2 -> mean 2.0
    w.image("img", np.zeros((4, 4, 3), np.float32), 1)
    w.flush()
    lines = [json.loads(l) for l in
             open(os.path.join(w.log_dir, "metrics.jsonl"))]
    assert any("train/loss" in l for l in lines)
    avg = [l for l in lines if "train/avg" in l]
    assert avg and avg[0]["train/avg"] == 2.0
    assert os.path.exists(os.path.join(w.log_dir, "config.json"))
    w.close()


def test_timers_accumulate():
    from ess_tpu.io import timers

    timers.reset_timers()
    with timers.Timer("region"):
        time.sleep(0.01)
    with timers.Timer("region"):
        time.sleep(0.01)
    rep = timers.timer_report()
    assert rep["region"] >= 0.01
    timers.reset_timers()
    assert timers.timer_report() == {}


def test_multihost_single_process():
    import jax
    from ess_tpu.parallel import multihost

    idx, count = multihost.process_shard()
    assert idx == 0 and count == 1
    cm = np.ones((3, 3))
    out = multihost.all_reduce_host(cm)
    np.testing.assert_array_equal(out, cm)


def test_reconstruct_cli_with_converted_checkpoint(tmp_path, rng):
    """Full loop: torch E2VID checkpoint -> converter -> reconstruction CLI."""
    pytest.importorskip("cv2")
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    from e2vid.model.unet import UNetRecurrent

    torch.manual_seed(0)
    tmodel = UNetRecurrent(
        num_input_channels=5, num_output_channels=1, skip_type="sum",
        recurrent_block_type="convlstm", activation="sigmoid",
        num_encoders=3, base_num_channels=32, num_residual_blocks=2,
        norm=None, use_upsample_conv=True)
    ckpt_path = str(tmp_path / "e2vid.pth.tar")
    torch.save({
        "state_dict": {f"unetrecurrent.{k}": v
                       for k, v in tmodel.state_dict().items()},
        "model": {"num_bins": 5, "num_encoders": 3, "base_num_channels": 32,
                  "num_residual_blocks": 2, "skip_type": "sum"},
    }, ckpt_path)

    events_file = str(tmp_path / "events.txt")
    n = 2000
    t = np.sort(rng.uniform(0, 1.0, n))
    with open(events_file, "w") as f:
        f.write("64 48\n")
        for i in range(n):
            f.write(f"{t[i]:.6f} {rng.integers(0, 64)} {rng.integers(0, 48)} "
                    f"{rng.integers(0, 2)}\n")

    out_dir = str(tmp_path / "frames")
    from ess_tpu.cli import reconstruct
    reconstruct.main(["-c", ckpt_path, "-i", events_file, "-o", out_dir,
                      "-N", "1000"])
    assert len(os.listdir(out_dir)) == 2


def test_metrics_writer_tracker_hook(tmp_path):
    """Pluggable tracking-service mirror (the reference's W&B sync,
    train.py:35-51, as a configurable hook)."""
    from ess_tpu.io.writers import MetricsWriter

    events = []
    w = MetricsWriter(str(tmp_path), tracker=lambda *ev: events.append(ev))
    w.scalar("loss", 1.5, 3)
    w.image("img", np.zeros((4, 4, 3), np.float32), 3)
    w.close()
    kinds = [e[0] for e in events]
    assert ("scalar", "loss", 1.5, 3) in events
    assert "image" in kinds
