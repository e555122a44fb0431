"""Streaming long-horizon evaluation with carried recurrent state.

Capability parity with the reference's SequenceRecurrent path
(/root/reference/DSEC/dataset/sequence_recurrent.py:17-291 + SURVEY.md
section 5 "long context"): consecutive non-overlapping event windows roll
through the recurrent encoder with state carried ACROSS samples (reset only
at sequence starts), and the segmentation head is scored at the windows
aligned with labeled timestamps.

TPU-first: the per-window step is one jitted function whose carry (the
ConvLSTM state pytree) is donated and stays in HBM for the whole stream;
label-less windows run encoder-only (no decoder FLOPs), and the confusion
matrix accumulates on device.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ess_tpu.data.pipeline import AugmentParams, EventPipeline
from ess_tpu.ops.resize import resize_nearest
from ess_tpu.train.builder import ESSModules
from ess_tpu.train.metrics import MetricsSemseg, confusion_matrix
from ess_tpu.train.state import TrainState


def make_streaming_steps(mods: ESSModules, pipeline: EventPipeline,
                         *, wire: str = "f32"):
    """(encode_step, score_step) jitted fns for streaming eval.

    encode_step(state, recon_state, window, is_first) -> recon_state
      advances recurrent state over one unlabeled window (encoder-only).
    score_step(state, recon_state, window, is_first, label) ->
      (recon_state, cm) additionally decodes + scores a labeled window.
    """
    cfg = mods.cfg
    recon = mods.recon_val
    packed = wire == "packed"
    voxel_fns = {
        kind: pipeline.make_window_fn(AugmentParams(), t_prenormalized=packed,
                                      offsets_kind=kind)
        for kind in ("tile", "band")
    }

    def _reset_where(is_first, recon_state, b):
        fresh = recon.init_state(b)
        flag = is_first.reshape((-1,) + (1,) * 3)

        def pick(new, old):
            return jnp.where(flag.astype(bool), new, old)

        return jax.tree.map(pick, fresh, recon_state)

    def _window(batch_soa):
        if packed:
            # dequantize INSIDE the jit — one fused pass, no per-window
            # eager dispatches in the streaming hot loop
            batch_soa = dict(pipeline.decode_packed(batch_soa))
            batch_soa.pop("ev_t_prenormalized", None)
        take = lambda a: a[:, 0] if a.ndim == 3 else a
        # key PRESENCE (jit-static) picks the kernel mode: pre-folded band
        # offsets -> fold-free kernel, tile offsets -> halo kernel
        if "ev_band_offsets" in batch_soa:
            voxel_fn, offs = voxel_fns["band"], batch_soa["ev_band_offsets"]
        else:
            voxel_fn = voxel_fns["tile"]
            offs = batch_soa.get("ev_tile_offsets")
        return voxel_fn(take(batch_soa["ev_x"]), take(batch_soa["ev_y"]),
                        take(batch_soa["ev_t"]), take(batch_soa["ev_p"]),
                        take(batch_soa["ev_valid"]),
                        tile_offsets=take(offs) if offs is not None else None)

    def encode_step(state: TrainState, recon_state, batch):
        b = batch["ev_xq" if packed else "ev_x"].shape[0]
        recon_state = _reset_where(batch["is_first"], recon_state, b)
        grids = _window(batch)
        _, new_state, _ = recon.step(state.e2vid_params, grids, recon_state,
                                     decode=False)
        return new_state

    def score_step(state: TrainState, recon_state, batch):
        b = batch["ev_xq" if packed else "ev_x"].shape[0]
        recon_state = _reset_where(batch["is_first"], recon_state, b)
        grids = _window(batch)
        _, new_state, latent = recon.step(state.e2vid_params, grids,
                                          recon_state, decode=True)
        preds = mods.head.apply({"params": state.back_params}, latent)
        labels = batch["label"]
        logits = preds[1]
        if logits.shape[1:3] != labels.shape[1:3]:
            logits = resize_nearest(logits, labels.shape[1], labels.shape[2])
        cm = confusion_matrix(
            jnp.argmax(logits, axis=-1), labels,
            num_classes=cfg.task.semseg_num_classes,
            ignore_label=cfg.task.semseg_ignore_label)
        return new_state, cm

    return (jax.jit(encode_step, donate_argnums=(1,)),
            jax.jit(score_step, donate_argnums=(1,)))


def run_streaming_eval(
    mods: ESSModules,
    state: TrainState,
    stream: Iterator[dict],
    pipeline: EventPipeline,
) -> MetricsSemseg:
    """Drive a window stream (e.g. ess_tpu.data.dsec.SequenceRecurrent
    samples, batch dim added) through the streaming steps and return the
    accumulated metrics."""
    from ess_tpu.data.pipeline import to_soa

    cfg = mods.cfg
    encode_step = score_step = None
    metrics = MetricsSemseg(cfg.task.semseg_num_classes,
                            cfg.task.semseg_ignore_label,
                            cfg.task.class_names)
    recon_state = None
    for sample in stream:
        if "raw_events" in sample or "ev_xq" in sample:
            sample = to_soa(sample)   # also renames packed tile_offsets
        packed = "ev_xq" in sample
        if encode_step is None:
            # the steps are specialized on the wire format (packed windows
            # dequantize inside the jit)
            encode_step, score_step = make_streaming_steps(
                mods, pipeline, wire="packed" if packed else "f32")
        batch = {k: (np.asarray(v)[None] if np.ndim(v) != 0 else
                     np.asarray([v])) for k, v in sample.items()}
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if recon_state is None:
            key = "ev_xq" if packed else "ev_x"
            recon_state = mods.recon_val.init_state(batch[key].shape[0])
        if bool(np.asarray(sample["has_label"])):
            recon_state, cm = score_step(state, recon_state, batch)
            metrics.update_confusion(np.asarray(cm))
        else:
            batch.pop("label", None)
            recon_state = encode_step(state, recon_state, batch)
    return metrics
