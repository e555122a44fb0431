"""End-to-end train-step tests on synthetic data (tiny shapes).

Covers: supervised step optimizes, UDA step runs and updates both parameter
groups, gradient routing matches the reference's freeze/detach choreography
(ess_trainer.py:103-148), and the frozen E2VID params never change.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ess_tpu.core.config import (
    Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
    ModelConfig, OptimConfig, TaskConfig,
)
from ess_tpu.train.builder import build_modules, init_state
from ess_tpu.train import supervised as sup
from ess_tpu.train import uda as uda_mod
from ess_tpu.train.losses import task_loss


def tiny_config(model_name="ess_supervised", event_name="synthetic_events",
                **optim_kw) -> Config:
    return Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(16, 16)),
            sensor_b=EventDatasetConfig(
                name=event_name, shape=(16, 16), nr_events_data=2,
                nr_temporal_bins=5),
        ),
        model=ModelConfig(
            model_name=model_name, e2vid_base_channels=8,
            compute_dtype="float32", data_augmentation_train=False),
        task=TaskConfig(semseg_num_classes=6),
        optim=OptimConfig(lr_front=1e-3, lr_back=1e-3, **optim_kw),
    )


def synthetic_batch(rng, b=2, t=2, h=16, w=16, c=5, classes=6):
    events = rng.normal(size=(b, t, h, w, c)).astype(np.float32)
    label = rng.integers(0, classes, size=(b, h, w)).astype(np.int32)
    return {"events": jnp.asarray(events), "label": jnp.asarray(label)}


def test_supervised_step_decreases_loss(rng):
    cfg = tiny_config()
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    step = sup.make_train_step(mods)
    batch = synthetic_batch(rng)
    losses = []
    for _ in range(8):
        state, out = step(state, batch)
        losses.append(float(out["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_supervised_e2vid_frozen(rng):
    cfg = tiny_config()
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    e2vid_before = jax.tree.map(np.asarray, state.e2vid_params)
    step = sup.make_train_step(mods)
    state, _ = step(state, synthetic_batch(rng))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        e2vid_before, state.e2vid_params)


def test_supervised_eval_step(rng):
    cfg = tiny_config()
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    ev = sup.make_eval_step(mods)
    out = ev(state, synthetic_batch(rng))
    assert out["cm"].shape == (6, 6)
    assert float(jnp.sum(out["cm"])) == 2 * 16 * 16
    assert out["img_fake"].shape == (2, 16, 16, 1)


def uda_batch(rng, b=2, t=2, h=16, w=16, c=5, classes=6):
    return {
        "image_a": jnp.asarray(rng.normal(size=(b, h, w, 1)).astype(np.float32)),
        "label_a": jnp.asarray(rng.integers(0, classes, size=(b, h, w)).astype(np.int32)),
        "events_b": jnp.asarray(rng.normal(size=(b, t, h, w, c)).astype(np.float32)),
    }


def test_uda_step_updates_both_groups(rng):
    cfg = tiny_config(model_name="ess")
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    front_before = np.asarray(state.front_params["stem_conv"]["kernel"])
    back_before = np.asarray(state.back_params["logits"]["kernel"])
    stats_before = np.asarray(state.front_batch_stats["stem_bn"]["mean"])
    step = uda_mod.make_train_step(mods)
    state, losses = step(state, uda_batch(rng))
    assert np.isfinite(float(losses["loss"]))
    assert not np.allclose(front_before, np.asarray(state.front_params["stem_conv"]["kernel"]))
    assert not np.allclose(back_before, np.asarray(state.back_params["logits"]["kernel"]))
    assert not np.allclose(stats_before, np.asarray(state.front_batch_stats["stem_bn"]["mean"]))
    assert "cycle_latent_8x_sensor_b_to_sensor_a_loss" in losses


def test_uda_dsec_gradient_routing(rng):
    """DSEC mode detaches image features (ess_trainer.py:187-188), and with
    the cycle-task / KL weights zeroed, the head's gradient must equal the
    gradient of the pure image task loss."""
    cfg = tiny_config(
        model_name="ess", event_name="DSEC_events",
        weight_cycle_task_loss=0.0, weight_cycle_pred_loss=0.0,
        weight_cycle_emb_loss=0.5)
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(1))
    batch = uda_batch(rng)

    # manual: grad of image-branch task loss wrt head params only
    latent_a = mods.front_a.apply(
        {"params": state.front_params, "batch_stats": state.front_batch_stats},
        batch["image_a"], train=True, mutable=["batch_stats"])[0]
    latent_a = jax.tree.map(jax.lax.stop_gradient, latent_a)

    def img_loss(back_params):
        preds = mods.head.apply({"params": back_params}, latent_a)
        return task_loss(preds[1], batch["label_a"], num_classes=6)

    g_manual = jax.grad(img_loss)(state.back_params)

    # instrument: recompute the UDA loss grad wrt back params
    img_fake, _, latent_real = mods.recon_train.rollout(
        state.e2vid_params, batch["events_b"])

    # smoke: the full DSEC-mode step runs (on a deep copy — the jitted step
    # donates its input state)
    step = uda_mod.make_train_step(mods)
    state2, losses = step(jax.tree.map(jnp.copy, state), uda_batch(rng))
    assert np.isfinite(float(losses["loss"]))

    # the actual equivalence: grads from the full combined loss
    def full_loss_back(back_params):
        sgm = jax.lax.stop_gradient
        latent_fake = mods.front_a.apply(
            {"params": state.front_params, "batch_stats": state.front_batch_stats},
            sgm(img_fake), train=True, mutable=["batch_stats"])[0]
        lr = jax.tree.map(sgm, latent_real)
        t_img = task_loss(
            mods.head.apply({"params": back_params}, latent_a)[1],
            batch["label_a"], num_classes=6)
        # e-loss uses frozen head -> contributes nothing to back grads
        bf = jax.tree.map(sgm, back_params)
        pred_fake = mods.head.apply({"params": bf}, latent_fake)
        pred_real_ng = jax.tree.map(sgm, mods.head.apply({"params": bf}, lr))
        from ess_tpu.train.losses import symmetric_js_divergence
        e_loss = symmetric_js_divergence(pred_fake[1], pred_real_ng[1])
        return t_img + e_loss

    g_full = jax.grad(full_loss_back)(state.back_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        g_manual, g_full)


def test_uda_eval_steps(rng):
    cfg = tiny_config(model_name="ess")
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    ev_a = uda_mod.make_eval_step_a(mods)
    ev_b = uda_mod.make_eval_step_b(mods)
    out_a = ev_a(state, {
        "image": jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 6, size=(2, 16, 16)).astype(np.int32)),
    })
    assert out_a["cm_a"].shape == (6, 6)
    out_b = ev_b(state, synthetic_batch(rng))
    assert out_b["cm_b"].shape == (6, 6)
    assert out_b["cm_cycle"].shape == (6, 6)
    assert "cycle_pred_1x_sensor_b_to_sensor_a_loss" in out_b


def test_supervised_step_packed_wire(rng):
    """The supervised train step consumes a packed-wire batch (u16 quantized
    SoA + offsets-derived validity) end to end."""
    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig

    import dataclasses

    cfg = tiny_config(model_name="ess_supervised", event_name="DSEC_events")
    h, w = 16, 128  # kernel-aligned toy sensor
    cfg = cfg.replace(dataset=dataclasses.replace(
        cfg.dataset,
        sensor_b=dataclasses.replace(cfg.dataset.sensor_b, shape=(h, w))))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    b, t, n = 2, 2, 512
    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, use_pallas=True, pallas_interpret=True))

    from ess_tpu.ops.voxel_pallas import tile_h_for_bins
    th = tile_h_for_bins(5)
    ntx = w // 128
    n_tiles = (-(-h // th)) * ntx
    xq = rng.integers(0, w * 64, (b, t, n)).astype(np.uint16)
    yq = rng.integers(0, h * 64, (b, t, n)).astype(np.uint16)
    # sort by tile id to honor the offsets contract
    tid = (yq // 64 // th) * ntx + np.minimum(xq // 64 // 128, ntx - 1)
    order = np.argsort(tid, axis=-1, kind="stable")
    take = lambda a: np.take_along_axis(a, order, axis=-1)
    xq, yq, tid = take(xq), take(yq), take(tid)
    offs = np.stack([
        np.searchsorted(tid[i, j], np.arange(n_tiles + 1)).astype(np.int32)
        for i in range(b) for j in range(t)
    ]).reshape(b, t, -1)
    batch = {
        "ev_xq": jnp.asarray(xq), "ev_yq": jnp.asarray(yq),
        "ev_tq": jnp.asarray(
            np.sort(rng.integers(0, 60001, (b, t, n)), axis=-1), jnp.uint16),
        "ev_pq": jnp.asarray(rng.integers(0, 2, (b, t, n)), jnp.uint8),
        "ev_tile_offsets": jnp.asarray(offs),
        "label": jnp.asarray(rng.integers(0, 6, (b, h, w)), jnp.int32),
    }
    step = sup.make_train_step(mods, pipe)
    state2, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))


def test_uda_step_packed_wire(rng):
    """The UDA train step consumes a packed-wire sensor-B batch."""
    import dataclasses

    from ess_tpu.data.pipeline import EventPipeline, PipelineConfig
    from ess_tpu.ops.voxel_pallas import tile_h_for_bins

    cfg = tiny_config(model_name="ess", event_name="DSEC_events")
    h, w = 16, 128
    cfg = cfg.replace(dataset=dataclasses.replace(
        cfg.dataset,
        sensor_a=dataclasses.replace(cfg.dataset.sensor_a, shape=(h, w)),
        sensor_b=dataclasses.replace(cfg.dataset.sensor_b, shape=(h, w))))
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    pipe = EventPipeline(PipelineConfig(
        sensor_height=h, sensor_width=w, num_bins=5, trilinear=True,
        normalize=True, use_pallas=True, pallas_interpret=True))

    b, t, n = 2, 2, 512
    th = tile_h_for_bins(5)
    ntx = w // 128
    n_tiles = (-(-h // th)) * ntx
    xq = rng.integers(0, w * 64, (b, t, n)).astype(np.uint16)
    yq = rng.integers(0, h * 64, (b, t, n)).astype(np.uint16)
    tid = (yq // 64 // th) * ntx + np.minimum(xq // 64 // 128, ntx - 1)
    order = np.argsort(tid, axis=-1, kind="stable")
    take = lambda a: np.take_along_axis(a, order, axis=-1)
    xq, yq, tid = take(xq), take(yq), take(tid)
    offs = np.stack([
        np.searchsorted(tid[i, j], np.arange(n_tiles + 1)).astype(np.int32)
        for i in range(b) for j in range(t)
    ]).reshape(b, t, -1)
    batch = {
        "ev_xq": jnp.asarray(xq), "ev_yq": jnp.asarray(yq),
        "ev_tq": jnp.asarray(
            np.sort(rng.integers(0, 60001, (b, t, n)), axis=-1), jnp.uint16),
        "ev_pq": jnp.asarray(rng.integers(0, 2, (b, t, n)), jnp.uint8),
        "ev_tile_offsets": jnp.asarray(offs),
        "image_a": jnp.asarray(rng.normal(size=(b, h, w, 1)), jnp.float32),
        "label_a": jnp.asarray(rng.integers(0, 6, (b, h, w)), jnp.int32),
    }
    step = uda_mod.make_train_step(mods, pipe)
    state2, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
    assert "cycle_latent_8x_sensor_b_to_sensor_a_loss" in losses


def test_blocked_head_experiment_matches_standard(rng):
    """The blocked SegmentationHead is a demoted experiment (three
    full-step ladder regressions on v5e) — no config surface — but the
    op-level path must stay exact: head.apply(block_space=True) folded
    through the loss adapters equals the standard evaluation."""
    import jax.numpy as jnp_

    from ess_tpu.train.losses import (
        fold_labels_s4d, s4d_logits_class_minor, task_loss)

    cfg = tiny_config()
    batch = synthetic_batch(rng)
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    _, _, latent = mods.recon_train.rollout(
        state.e2vid_params, batch["events"])
    latent = jax.tree.map(jnp_.asarray, latent)
    labels = batch["label"]
    nc = cfg.task.semseg_num_classes

    std = mods.head.apply({"params": state.back_params}, latent)
    loss_std = task_loss(std[1], labels, num_classes=nc, ignore_label=255)
    if (mods.head.skip_connect and labels.shape[1] % 4 == 0
            and labels.shape[2] % 4 == 0):
        blk = mods.head.apply({"params": state.back_params}, latent,
                              block_space=True)
        loss_blk = task_loss(
            s4d_logits_class_minor(blk[1], nc), fold_labels_s4d(labels),
            num_classes=nc, ignore_label=255)
        np.testing.assert_allclose(float(loss_blk), float(loss_std),
                                   rtol=1e-5)
