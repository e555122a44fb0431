"""Supervised ESS training: frozen E2VID front-end + trainable seg head.

Capability parity with ESSSupervisedModel
(/root/reference/training/ess_supervised_trainer.py:21-336): a 20-window
recurrent rollout through the frozen E2VID (task_train_step :111-152 with the
latent detach at :145-146), dice+CE task loss on event labels, a single RAdam
on the head (:63-75), and confusion-matrix validation on sensor B (:172-292).

TPU-first: the whole step — on-device voxelization fused into the rollout
(lax.scan), head forward, loss, backward, RAdam update — is ONE jitted
function with a donated TrainState; the frozen backbone runs under
stop_gradient so XLA stores no rollout activations.

Batches come in two forms:
- fused (production): SoA raw events {"ev_x","ev_y","ev_t","ev_p","ev_valid"
  : (B, T, N)} + "label"; requires a ``pipeline`` (EventPipeline) that
  voxelizes per window inside the scan.
- dense (tests/small scale): prebuilt {"events": (B, T, H, W, C)} grids.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ess_tpu.data.pipeline import AugmentParams, EventPipeline
from ess_tpu.ops.resize import resize_nearest
from ess_tpu.train.builder import ESSModules
from ess_tpu.train.losses import fold_labels_up2x, task_loss
from ess_tpu.train.metrics import confusion_matrix
from ess_tpu.train.state import TrainState, apply_updates


def _rollout(mods, recon, state, batch, pipeline, *, train, rng=None,
             precompute: bool = True):
    """Dispatch dense vs fused-SoA rollout; returns (img, latent, labels).

    ``precompute=True`` (default) voxelizes all T windows in one batched
    kernel call before the recurrent scan — ~9% faster on v5e;
    ``precompute=False`` fuses voxelization inside the scan so the dense
    (B, T, H, W, C) stack never materializes (HBM-lean).
    """
    labels = batch.get("label")
    if "ev_x" in batch or "ev_xq" in batch:
        assert pipeline is not None, "SoA batch requires an EventPipeline"
        if "ev_xq" in batch and not precompute:
            batch = pipeline.decode_packed(batch)
        if precompute:
            g = recon.geometry
            cfg = pipeline.cfg
            quad = recon.model.quad_block
            use_s2d = (
                pipeline.s2d_capable(train=train) and recon._use_blocks
                and not recon.flip
                and (not quad or pipeline.s4d_capable(train=train))
                # a width-only resize folds into the voxelizer, but only
                # the pre-folded (band-offset) kernel mode supports it
                and (cfg.resize_to is None or "ev_band_offsets" in batch)
                and (g.padded_height, g.padded_width)
                == (recon.height, recon.width)
                and cfg.output_size(train) == (recon.height, recon.width))
            use_stack = (use_s2d and not quad
                         and pipeline.stack_capable(train=train,
                                                    batch=batch))
            use_raw = (use_s2d and not quad and not use_stack
                       and pipeline.raw_capable(train=train, batch=batch))
            if use_stack:
                # stack-window mode: the voxelizer kernel emits the s2d
                # NCHW window stack directly (no bulk layout chain); the
                # per-window map is elementwise normalize/flip + the
                # window relayout the scan already pays
                # (build_all_stack docstring).
                rawd, labels, wmap = pipeline.build_all_stack(
                    batch, rng, train=train, out_dtype=recon.model.dtype)
                img, _, latent = recon.rollout_raw(
                    state.e2vid_params, rawd["raw"], rawd["stats"], wmap)
            elif use_raw:
                # raw-window mode: the scan consumes the voxelizer's RAW
                # band accumulator directly; normalize/flip/s2d-transform/
                # crop all fuse into one in-scan pass per window
                # (build_all_raw docstring) — the transposed window stack
                # never materializes in HBM.
                rawd, labels, wmap = pipeline.build_all_raw(
                    batch, rng, train=train, out_dtype=recon.model.dtype)
                img, _, latent = recon.rollout_raw(
                    state.e2vid_params, rawd["raw"], rawd["stats"], wmap)
            elif use_s2d:
                # voxelizer folds straight to space-to-depth bf16 blocks
                # (4x4 quad blocks when the model rolls out quad-block);
                # the scan never pays a per-window layout transpose, and
                # time-major storage makes the window slice a contiguous
                # leading-axis block (measured +16 windows/s round 3).
                grids, labels = pipeline.build_all(
                    batch, rng, train=train,
                    layout="s4d" if quad else "s2d",
                    out_dtype=recon.model.dtype, time_major=True)
                img, _, latent = recon.rollout(
                    state.e2vid_params, grids, windows_s2d=True,
                    time_major=True)
            else:
                grids, labels = pipeline.build_all(batch, rng, train=train)
                img, _, latent = recon.rollout(state.e2vid_params, grids)
        else:
            b = batch["ev_x"].shape[0]
            aug = pipeline.sample_augment(rng, b, train=train)
            voxel_fn = pipeline.make_window_fn(
                aug, t_prenormalized=bool(
                    batch.get("ev_t_prenormalized", False)),
                offsets_kind=("band" if "ev_band_offsets" in batch
                              else "tile"))
            if labels is not None:
                labels = pipeline.apply_label_transform(labels, aug)
            img, _, latent = recon.rollout_events(
                state.e2vid_params, batch, voxel_fn)
    else:
        img, _, latent = recon.rollout(state.e2vid_params, batch["events"])
    return img, latent, labels


def make_train_step(
    mods: ESSModules,
    pipeline: Optional[EventPipeline] = None,
) -> Callable:
    """Build the jitted supervised train step."""
    cfg = mods.cfg
    base_rng = jax.random.PRNGKey(cfg.seed)

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        rng = jax.random.fold_in(base_rng, state.step)
        _, latent, labels = _rollout(
            mods, mods.recon_train, state, batch, pipeline, train=True, rng=rng)
        latent = jax.lax.stop_gradient(latent)  # frozen backbone + detach

        # Fused-final head: the scale-1 stage's nearest-2x upsample folds
        # into the s4 conv's weights (models/seghead.py _final_stage) —
        # exact math, same params, identical MACs, and the lane-padded
        # full-res conv/IN/logits tensors never exist. Unlike the demoted
        # blocked-head levers (three full-step ladder regressions, −59/−58/
        # −62 w/s — the block-kernel FLOP overhead), this remap adds NO
        # FLOPs, so it is unconditionally on where the geometry allows.
        lh, lw = labels.shape[1], labels.shape[2]
        fused = (mods.head.skip_connect and lh % 2 == 0 and lw % 2 == 0
                 and (lh // 2, lw // 2) == tuple(latent[2].shape[1:3]))
        if fused:
            labels = fold_labels_up2x(labels)

        def loss_fn(back_params):
            preds = mods.head.apply({"params": back_params}, latent,
                                    fused_final=fused)
            logits = preds[1]
            return task_loss(
                logits, labels,
                num_classes=cfg.task.semseg_num_classes,
                ignore_label=cfg.task.semseg_ignore_label,
                losses=cfg.optim.task_loss,
            ) * cfg.optim.weight_task_loss

        loss, grads = jax.value_and_grad(loss_fn)(state.back_params)
        new_back, new_opt = apply_updates(
            state.back_params, grads, mods.opt_back, state.opt_back)
        new_state = state.replace(
            step=state.step + 1, back_params=new_back, opt_back=new_opt)
        return new_state, {"loss": loss, "semseg_sensor_b_loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(
    mods: ESSModules,
    pipeline: Optional[EventPipeline] = None,
) -> Callable:
    """Jitted eval step: rollout at val resolution, head forward, nearest
    -upsample logits to label resolution, loss + on-device confusion matrix
    (ess_supervised_trainer.py:219-256 semantics)."""
    cfg = mods.cfg

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        img_fake, latent, labels = _rollout(
            mods, mods.recon_val, state, batch, pipeline, train=False)
        preds = mods.head.apply({"params": state.back_params}, latent)
        logits = preds[1]
        lh, lw = labels.shape[1], labels.shape[2]
        if (logits.shape[1], logits.shape[2]) != (lh, lw):
            logits = resize_nearest(logits, lh, lw)
        loss = task_loss(
            logits, labels,
            num_classes=cfg.task.semseg_num_classes,
            ignore_label=cfg.task.semseg_ignore_label,
            losses=cfg.optim.task_loss,
        ) * cfg.optim.weight_task_loss
        pred_lbl = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(
            pred_lbl, labels,
            num_classes=cfg.task.semseg_num_classes,
            ignore_label=cfg.task.semseg_ignore_label,
        )
        return {"loss": loss, "cm": cm, "pred": pred_lbl, "img_fake": img_fake,
                "latent8": latent[8].astype(jnp.float32)}

    return jax.jit(step)
