"""ESS UDA training: image encoder <-> event embedding alignment.

Capability parity with ESSModel (/root/reference/training/ess_trainer.py):

- ``img_train_step`` (:150-194): task loss on labeled images; on DSEC the
  image features are detached so only the head learns from images.
- ``event_train_step`` (:257-301): frozen E2VID rollout -> reconstructed
  frame through the image encoder; ``trainCycleStep`` (:211-255) aligns
  latents {2,4,8} (L1 x weight_cycle_emb) and prediction dicts (symJS at 1x —
  counted only for DSEC — plus L1 at 2x/4x x weight_cycle_task) with the head
  frozen, training ONLY the image encoder; ``TasktrainCycleStep`` (:303-330)
  trains ONLY the head on the event branch against the no-grad image branch
  (symJS x weight_cycle_pred + L1 x weight_cycle_task), plus an optional
  supervised event task loss (train_on_event_labels, :297-299).
- Both optimizers step once on the accumulated grads (:144-146).

TPU-first: the reference's freeze/unfreeze + serialized ``.backward()``
choreography (:118-126, :133-138) is replaced by ONE scalar loss whose
``stop_gradient`` placement reproduces the same per-parameter gradients
(frozen submodule == stop_gradient on its params inside that term; detached
tensor == stop_gradient on the activation), so the whole step is a single
``jax.value_and_grad`` over (front_params, back_params) inside one jit.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from typing import Optional

from ess_tpu.data.pipeline import EventPipeline
from ess_tpu.ops.resize import resize_nearest
from ess_tpu.train.builder import ESSModules
from ess_tpu.train.losses import (
    fold_labels_up2x, l1_loss, symmetric_js_divergence, task_loss)
from ess_tpu.train.metrics import confusion_matrix
from ess_tpu.train.state import TrainState, apply_updates
from ess_tpu.train.supervised import _rollout

sg = jax.lax.stop_gradient


def _cycle_latent_loss(latent_fake, latent_real, *, skip_connect_encoder, weight, losses, prefix):
    """L1 alignment of multi-scale latents (trainCycleStep :216-229)."""
    total = jnp.float32(0.0)
    scales = (2, 4, 8) if skip_connect_encoder else (8,)
    for s in scales:
        l = l1_loss(latent_fake[s], latent_real[s]) * weight
        losses[f"cycle_latent_{s}x_{prefix}_loss"] = l
        total = total + l
    return total


def uda_losses(
    mods: ESSModules, front_params, back_params, batch_stats, *,
    img_a, labels_a, img_fake, latent_real, labels_b=None,
):
    """The combined UDA loss for one batch (the core of the train step).

    ``img_fake``/``latent_real`` are the FROZEN rollout outputs (the caller
    stop-gradients them). The ``stop_gradient`` placement reproduces the
    reference's freeze/detach + serialized-backward choreography
    (ess_trainer.py:103-148, :182-194, :211-330) as one scalar loss — per
    -parameter gradient parity with the torch reference is verified by
    tests/test_uda_grad_parity.py. Returns (total, (losses, new_stats)).
    """
    cfg = mods.cfg
    is_dsec = cfg.dataset.sensor_b.name.startswith("DSEC")
    w = cfg.optim
    nc = cfg.task.semseg_num_classes

    def tloss(logits, labels):
        return task_loss(logits, labels,
                         num_classes=nc,
                         ignore_label=cfg.task.semseg_ignore_label,
                         losses=w.task_loss)

    losses: Dict[str, jax.Array] = {}

    # Fused-final head (models/seghead.py _final_stage): the scale-1
    # stage's nearest-2x upsample folds into the s4 conv's weights — exact
    # math, same params, zero added FLOPs — so none of the three head
    # passes materializes the lane-padded full-res conv/IN/logits tensors.
    # Gated per branch resolution (sensor A and the event branch can train
    # at different sizes on DDD17). Unlike the demoted blocked-head levers
    # (−58/−59/−62 w/s full-step regressions), this remap is FLOP-neutral.
    fk = mods.head.skip_connect
    f_img = (fk and img_a.shape[1] % 2 == 0 and img_a.shape[2] % 2 == 0)
    f_ev = (fk and img_fake.shape[1] % 2 == 0 and img_fake.shape[2] % 2 == 0)

    # ---------------- image branch (img_train_step) ----------------
    latent_a, mut = mods.front_a.apply(
        {"params": front_params, "batch_stats": batch_stats},
        img_a, train=True, mutable=["batch_stats"])
    content_a = jax.tree.map(sg, latent_a) if is_dsec else latent_a
    pred_a = mods.head.apply({"params": back_params}, content_a,
                             fused_final=f_img)
    t_img = tloss(pred_a[1],
                  fold_labels_up2x(labels_a) if f_img else labels_a
                  ) * w.weight_task_loss
    losses["semseg_sensor_a_loss"] = t_img

    # ---------------- event branch ----------------
    latent_fake, mut2 = mods.front_a.apply(
        {"params": front_params, "batch_stats": mut["batch_stats"]},
        img_fake, train=True, mutable=["batch_stats"])

    # e-loss: trains the image encoder only (head frozen,
    # ess_trainer.py:133-137).
    back_frozen = jax.tree.map(sg, back_params)
    e_loss = _cycle_latent_loss(
        latent_fake, latent_real,
        skip_connect_encoder=cfg.model.skip_connect_encoder,
        weight=w.weight_cycle_emb_loss, losses=losses,
        prefix="sensor_b_to_sensor_a")
    pred_fake_fr = mods.head.apply({"params": back_frozen}, latent_fake,
                                   fused_final=f_ev)
    # the event-branch prediction is computed ONCE (latent_real is already
    # stop-gradient, so gradients reach only the head); its sg'd copy is
    # the reference's torch.no_grad target (trainCycleStep :191-193) —
    # forward values are identical, one full-res head pass saved
    pred_real = mods.head.apply({"params": back_params}, latent_real,
                                fused_final=f_ev)
    pred_real_ng = jax.tree.map(sg, pred_real)
    sym_1x = symmetric_js_divergence(pred_fake_fr[1], pred_real_ng[1])
    losses["cycle_pred_1x_sensor_b_to_sensor_a_loss"] = sym_1x
    if is_dsec:  # only DSEC adds the 1x symJS to e-loss (:240-241)
        e_loss = e_loss + sym_1x
    for s in (2, 4):
        l = l1_loss(pred_fake_fr[s], pred_real_ng[s]) * w.weight_cycle_task_loss
        losses[f"cycle_pred_{s}x_sensor_b_to_sensor_a_loss"] = l
        e_loss = e_loss + l

    # t-loss: trains the head only (TasktrainCycleStep; latent_real is
    # stop-gradient so no path to the encoder).
    pred_fake_ng = jax.tree.map(sg, pred_fake_fr)
    t_ev = symmetric_js_divergence(
        pred_real[1], pred_fake_ng[1]) * w.weight_cycle_pred_loss
    for s in (2, 4):
        t_ev = t_ev + l1_loss(pred_real[s], pred_fake_ng[s]) * w.weight_cycle_task_loss
    if cfg.model.train_on_event_labels and labels_b is not None:
        t_b = tloss(pred_real[1],
                    fold_labels_up2x(labels_b) if f_ev else labels_b
                    ) * w.weight_task_loss
        losses["semseg_sensor_b_loss"] = t_b
        t_ev = t_ev + t_b

    total = t_img + e_loss + t_ev
    losses["loss"] = total
    return total, (losses, mut2["batch_stats"])


def make_train_step(
    mods: ESSModules, pipeline: Optional[EventPipeline] = None
) -> Callable:
    """Build the jitted UDA train step.

    batch: {"image_a": (B,H,W,1), "label_a": (B,H,W)} plus the sensor-B
    events as either dense "events_b": (B,T,h,w,C) or fused SoA buffers
    ("ev_x" etc. + EventPipeline), optionally "label_b": (B,h,w).
    """
    cfg = mods.cfg
    base_rng = jax.random.PRNGKey(cfg.seed + 1)

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        img_a, labels_a = batch["image_a"], batch["label_a"]

        # Frozen recurrent reconstruction (no activations kept). Assemble the
        # sensor-B sub-batch explicitly: dense grids arrive as "events_b",
        # raw SoA events under their ev_* keys, labels as "label_b".
        rng = jax.random.fold_in(base_rng, state.step)
        b_batch = {k: v for k, v in batch.items() if k.startswith("ev_")}
        if "events_b" in batch:
            b_batch["events"] = batch["events_b"]
        if batch.get("label_b") is not None:
            b_batch["label"] = batch["label_b"]
        img_fake, latent_real, labels_b = _rollout(
            mods, mods.recon_train, state, b_batch, pipeline,
            train=True, rng=rng)
        img_fake = sg(img_fake)
        latent_real = jax.tree.map(sg, latent_real)

        def loss_fn(front_params, back_params, batch_stats):
            return uda_losses(
                mods, front_params, back_params, batch_stats,
                img_a=img_a, labels_a=labels_a, img_fake=img_fake,
                latent_real=latent_real, labels_b=labels_b)

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.front_params, state.back_params, state.front_batch_stats)
        g_front, g_back = grads

        new_front, new_opt_front = apply_updates(
            state.front_params, g_front, mods.opt_front, state.opt_front)
        new_back, new_opt_back = apply_updates(
            state.back_params, g_back, mods.opt_back, state.opt_back)

        new_state = state.replace(
            step=state.step + 1,
            front_params=new_front, front_batch_stats=new_stats,
            back_params=new_back,
            opt_front=new_opt_front, opt_back=new_opt_back,
        )
        return new_state, losses

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step_a(mods: ESSModules) -> Callable:
    """Sensor-A (image) validation: encoder (BN eval) -> head -> loss + cm
    (valTaskStep, ess_trainer.py:476-493)."""
    cfg = mods.cfg

    def step(state: TrainState, batch):
        img, labels = batch["image"], batch["label"]
        latent = mods.front_a.apply(
            {"params": state.front_params, "batch_stats": state.front_batch_stats},
            img, train=False)
        preds = mods.head.apply({"params": state.back_params}, latent)
        loss = task_loss(
            preds[1], labels, num_classes=cfg.task.semseg_num_classes,
            ignore_label=cfg.task.semseg_ignore_label, losses=cfg.optim.task_loss,
        ) * cfg.optim.weight_task_loss
        pred_lbl = jnp.argmax(preds[1], axis=-1)
        cm = confusion_matrix(pred_lbl, labels,
                              num_classes=cfg.task.semseg_num_classes,
                              ignore_label=cfg.task.semseg_ignore_label)
        return {"semseg_sensor_a_loss": loss, "cm_a": cm, "pred": pred_lbl,
                "latent8": latent[8].astype(jnp.float32)}

    return jax.jit(step)


def make_eval_step_b(
    mods: ESSModules, pipeline: Optional[EventPipeline] = None
) -> Callable:
    """Sensor-B (event) validation incl. the cycle branch
    (val_step/valTaskStep/valCycleStep, ess_trainer.py:424-544):
    rollout -> head -> nearest-upsampled prediction vs event labels, plus the
    E2VID-reconstruction branch scored separately (metrics_semseg_cycle)."""
    cfg = mods.cfg
    num_classes = cfg.task.semseg_num_classes
    ignore = cfg.task.semseg_ignore_label

    def tloss(logits, labels):
        return task_loss(logits, labels, num_classes=num_classes,
                         ignore_label=ignore, losses=cfg.optim.task_loss)

    def step(state: TrainState, batch):
        out: Dict[str, jax.Array] = {}

        img_fake, latent_ev, labels = _rollout(
            mods, mods.recon_val, state, batch, pipeline, train=False)
        preds_ev = mods.head.apply({"params": state.back_params}, latent_ev)
        lh, lw = labels.shape[1], labels.shape[2]
        logits_ev = resize_nearest(preds_ev[1], lh, lw)
        out["semseg_sensor_b_loss"] = tloss(logits_ev, labels) * cfg.optim.weight_task_loss
        pred_ev = jnp.argmax(logits_ev, axis=-1)
        out["cm_b"] = confusion_matrix(pred_ev, labels,
                                       num_classes=num_classes, ignore_label=ignore)

        # cycle branch: reconstruction -> image encoder -> head
        latent_fake = mods.front_a.apply(
            {"params": state.front_params, "batch_stats": state.front_batch_stats},
            img_fake, train=False)
        scales = (2, 4, 8) if cfg.model.skip_connect_encoder else (8,)
        for s in scales:
            out[f"cycle_latent_{s}x_sensor_b_to_sensor_a_loss"] = (
                l1_loss(latent_ev[s], latent_fake[s]) * cfg.optim.weight_cycle_emb_loss)
        preds_cycle = mods.head.apply({"params": state.back_params}, latent_fake)
        logits_cycle = resize_nearest(preds_cycle[1], lh, lw)
        out["semseg_sensor_b_to_sensor_a_loss"] = (
            tloss(logits_cycle, labels) * cfg.optim.weight_task_loss)
        pred_cycle = jnp.argmax(logits_cycle, axis=-1)
        out["cm_cycle"] = confusion_matrix(pred_cycle, labels,
                                           num_classes=num_classes, ignore_label=ignore)
        out["cycle_pred_1x_sensor_b_to_sensor_a_loss"] = (
            symmetric_js_divergence(preds_cycle[1], preds_ev[1])
            * cfg.optim.weight_cycle_pred_loss)
        for s in (2, 4):
            out[f"cycle_pred_{s}x_sensor_b_to_sensor_a_loss"] = (
                l1_loss(preds_ev[s], preds_cycle[s]) * cfg.optim.weight_cycle_task_loss)
        out["pred"] = pred_ev
        out["img_fake"] = img_fake
        # deepest-scale latent for the PCA grid + embedding dump
        # (base_trainer.py:502-515, :556-583 capability — wired here, where
        # the reference's own append sites are dead code)
        out["latent8"] = latent_ev[8].astype(jnp.float32)
        return out

    return jax.jit(step)
