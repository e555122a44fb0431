"""Orbax checkpointing of the full train state.

Capability parity with the reference CheckpointSaver
(/root/reference/utils/saver.py:8-60): periodic epoch checkpoints holding
every model's and optimizer's state plus epoch/step bookkeeping, resume
(models + optionally optimizers), and a pretrained-weights path that loads
task networks while skipping the frozen E2VID backbone (saver.py:50-60).

TPU-native: one Orbax PyTree checkpoint of the whole TrainState (sharding
-aware, async-capable, multi-host safe) instead of per-model torch
state_dicts.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


# Mid-epoch autosave keys live above this base so they never collide with
# epoch keys (the reference saves only per-epoch, saver.py:15-31; step
# autosaves are a preemption-safety capability added here).
AUTOSAVE_BASE = 1_000_000


class CheckpointManager:
    """Thin wrapper over orbax.checkpoint for TrainState pytrees."""

    def __init__(self, directory: str, *, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, epoch: int, state, *, metadata: Optional[dict] = None,
             wait: bool = False) -> None:
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(state),
            **({"metadata": self._ocp.args.JsonSave(metadata)} if metadata else {}),
        )
        self.manager.save(epoch, args=args)
        if wait:
            self.manager.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        """Latest completed-EPOCH save (mid-epoch autosaves excluded)."""
        steps = [s for s in self.manager.all_steps() if s < AUTOSAVE_BASE]
        return max(steps) if steps else None

    def latest(self) -> Optional[int]:
        """Latest save of ANY kind — preemption resume prefers this; keys
        >= AUTOSAVE_BASE are mid-epoch step autosaves."""
        return self.manager.latest_step()

    def restore(self, state_template, epoch: Optional[int] = None):
        """Restore a full TrainState (resume_training path)."""
        epoch = self.latest() if epoch is None else epoch
        assert epoch is not None, "no checkpoint found"
        restored = self.manager.restore(
            epoch,
            args=self._ocp.args.Composite(
                state=self._ocp.args.StandardRestore(state_template)),
        )
        return restored["state"]

    def restore_metadata(self, key: int) -> Optional[dict]:
        """The JSON metadata saved alongside a checkpoint (epoch/step
        bookkeeping — the reference stores the same in its .pt dicts,
        saver.py:15-31), or None for checkpoints saved without it."""
        try:
            restored = self.manager.restore(
                key,
                args=self._ocp.args.Composite(
                    metadata=self._ocp.args.JsonRestore()),
            )
            return restored.get("metadata")
        except BaseException:
            return None

    def restore_pretrained(self, state_template, epoch: Optional[int] = None,
                           *, skip_frozen: bool = True):
        """Load trainable nets from a checkpoint but keep the template's
        frozen E2VID params and optimizer states (saver.py:50-60 semantics:
        ``front_sensor_b``/``e2vid_decoder`` skipped)."""
        full = self.restore(state_template, epoch)
        replace = {
            "front_params": full.front_params,
            "front_batch_stats": full.front_batch_stats,
            "back_params": full.back_params,
        }
        if not skip_frozen:
            replace["e2vid_params"] = full.e2vid_params
        return state_template.replace(
            **{k: v for k, v in replace.items() if v is not None})

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()
