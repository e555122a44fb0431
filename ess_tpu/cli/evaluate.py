"""Evaluation CLI: restore a checkpoint and run validation only.

Capability parity with the reference's eval path (README.md:104-110: set
``load_pretrained_weights`` + run train.py, which immediately validates):
``python -m ess_tpu.cli.evaluate --settings_file cfg.yaml --checkpoint dir``.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="ess-tpu evaluation")
    parser.add_argument("--settings_file", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="orbax checkpoint directory")
    parser.add_argument("--epoch", type=int, default=None)
    args = parser.parse_args(argv)

    from ess_tpu.core.config import load_config
    from ess_tpu.cli.train import build_loaders, load_pretrained_backbone
    from ess_tpu.io.checkpoint import CheckpointManager
    from ess_tpu.train.loop import Trainer

    cfg = load_config(args.settings_file)
    _, train_b, val_a, val_b, rect = build_loaders(cfg)

    # the frozen E2VID backbone is NOT in training checkpoints (they skip
    # frozen params, like the reference saver.py:50-60) — load it exactly as
    # the train CLI does or the rollout runs on random weights
    trainer = Trainer(cfg, train_b=train_b, val_b=val_b, val_a=val_a,
                      rectify_map=rect,
                      e2vid_params=load_pretrained_backbone(cfg))
    ckpt = CheckpointManager(args.checkpoint)
    trainer.state = ckpt.restore_pretrained(trainer.state, args.epoch)
    summary = trainer.validate()
    for k, v in summary.items():
        if np.ndim(v) == 0:
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
