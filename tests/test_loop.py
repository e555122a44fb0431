"""End-to-end Trainer loop tests on synthetic data (supervised + UDA)."""

import os

import numpy as np
import pytest

from ess_tpu.core.config import (
    Config, DatasetConfig, EventDatasetConfig, ImageDatasetConfig,
    ModelConfig, OptimConfig, TaskConfig, CheckpointConfig,
)
from ess_tpu.data.loader import BatchLoader
from ess_tpu.data.synthetic import SyntheticEvents, SyntheticImages
from ess_tpu.train.loop import Trainer


def loop_config(model_name, tmp, **optim):
    return Config(
        dataset=DatasetConfig(
            sensor_a=ImageDatasetConfig(shape=(16, 16)),
            sensor_b=EventDatasetConfig(
                name="synthetic_events", shape=(16, 16), nr_events_data=2,
                nr_events_window=128, nr_temporal_bins=5),
        ),
        model=ModelConfig(model_name=model_name, e2vid_base_channels=8,
                          compute_dtype="float32",
                          data_augmentation_train=False),
        task=TaskConfig(semseg_num_classes=6),
        optim=OptimConfig(batch_size_a=2, batch_size_b=2, num_epochs=2,
                          val_epoch_step=1, lr_back=1e-3, lr_front=1e-3,
                          **optim),
        checkpoint=CheckpointConfig(save_checkpoint=True),
        log_dir=str(tmp),
    )


def event_loaders(n=6):
    ds = SyntheticEvents(length=n, height=16, width=16, nr_events_data=2,
                         nr_events_window=128)
    train = BatchLoader(ds, 2, shuffle=True, num_workers=2)
    val = BatchLoader(ds, 2, shuffle=False, drop_last=False, num_workers=2)
    return train, val


def test_supervised_loop_runs(tmp_path):
    cfg = loop_config("ess_supervised", tmp_path)
    train_b, val_b = event_loaders()
    tr = Trainer(cfg, train_b=train_b, val_b=val_b,
                 log_dir=str(tmp_path / "run"))
    summary = tr.run()
    assert "semseg_sensor_b_mean_iou" in summary
    assert 0 <= summary["semseg_sensor_b_mean_iou"] <= 100
    assert tr.step_count == 2 * 3  # 2 epochs x 3 batches
    # checkpoints written
    assert tr.ckpt.latest_epoch() == 1
    # metrics logged
    assert os.path.exists(os.path.join(tr.log_dir, "metrics.jsonl"))


def test_supervised_loop_resume(tmp_path):
    cfg = loop_config("ess_supervised", tmp_path)
    train_b, val_b = event_loaders()
    run_dir = str(tmp_path / "run")
    tr = Trainer(cfg, train_b=train_b, val_b=None, log_dir=run_dir)
    tr.run()
    step_after = int(np.asarray(tr.state.step))

    cfg2 = cfg.replace(
        checkpoint=CheckpointConfig(save_checkpoint=True, resume_training=True),
        optim=cfg.optim)
    tr2 = Trainer(cfg2, train_b=train_b, val_b=None, log_dir=run_dir)
    assert tr2.epoch == 2  # resumes past both epochs
    assert int(np.asarray(tr2.state.step)) == step_after
    # TB curves continue where they left off
    assert tr2.step_count == step_after


def test_resume_from_mid_epoch_autosave(tmp_path):
    """A preemption between epoch saves resumes from the step autosave:
    step_count continues, the interrupted epoch re-runs."""
    from ess_tpu.io.checkpoint import AUTOSAVE_BASE

    cfg = loop_config("ess_supervised", tmp_path)
    train_b, _ = event_loaders()
    run_dir = str(tmp_path / "run")
    tr = Trainer(cfg, train_b=train_b, val_b=None, log_dir=run_dir,
                 save_every_steps=2)
    tr.train_epoch()  # 3 steps -> one autosave at step 2, NO epoch save yet
    tr.ckpt.wait()
    assert tr.ckpt.latest_epoch() is None  # autosaves aren't epoch keys
    assert tr.ckpt.latest() == AUTOSAVE_BASE + 2

    cfg2 = cfg.replace(
        checkpoint=CheckpointConfig(save_checkpoint=True, resume_training=True))
    tr2 = Trainer(cfg2, train_b=train_b, val_b=None, log_dir=run_dir)
    assert tr2.step_count == 2
    assert int(np.asarray(tr2.state.step)) == 2
    assert tr2.epoch == 0  # the interrupted epoch re-runs


def test_uda_loop_runs(tmp_path):
    cfg = loop_config("ess", tmp_path)
    train_b, val_b = event_loaders()
    imgs = SyntheticImages(length=4, height=16, width=16)
    train_a = BatchLoader(imgs, 2, shuffle=True, num_workers=2)
    val_a = BatchLoader(imgs, 2, shuffle=False, drop_last=False, num_workers=2)
    tr = Trainer(cfg, train_b=train_b, val_b=val_b, train_a=train_a,
                 val_a=val_a, log_dir=str(tmp_path / "uda"))
    summary = tr.run()
    assert "semseg_sensor_a_mean_iou" in summary
    assert "semseg_sensor_b_mean_iou" in summary
    assert "semseg_sensor_cycle_mean_iou" in summary


def test_restore_pretrained_skips_frozen(tmp_path):
    """restore_pretrained loads trainable nets but keeps the template's
    frozen E2VID (saver.py:50-60 semantics)."""
    import jax
    from ess_tpu.io.checkpoint import CheckpointManager
    from ess_tpu.train.builder import build_modules, init_state

    cfg = loop_config("ess_supervised", tmp_path)
    mods = build_modules(cfg)
    trained = init_state(mods, jax.random.PRNGKey(1))
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(0, jax.device_get(trained), wait=True)

    template = init_state(mods, jax.random.PRNGKey(2))
    restored = ckpt.restore_pretrained(template)
    # head params come from the checkpoint
    np.testing.assert_allclose(
        np.asarray(restored.back_params["logits"]["kernel"]),
        np.asarray(trained.back_params["logits"]["kernel"]))
    # frozen backbone stays at the template's values
    np.testing.assert_allclose(
        np.asarray(restored.e2vid_params["head"]["Conv_0"]["kernel"]),
        np.asarray(template.e2vid_params["head"]["Conv_0"]["kernel"]))
    ckpt.close()


def test_observability_wiring(tmp_path):
    """Validation emits the latent-PCA grid, sensor-A image grid, embedding
    TSV dump, and (when enabled) the train-set statistics pass —
    base_trainer.py:429-431, :502-515, :546-583 capabilities."""
    import glob
    import json

    cfg = loop_config("ess", tmp_path)
    import dataclasses
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, do_val_training_epoch=True))
    train_b, val_b = event_loaders()
    imgs = SyntheticImages(length=4, height=16, width=16)
    train_a = BatchLoader(imgs, 2, shuffle=True, num_workers=2)
    val_a = BatchLoader(imgs, 2, shuffle=False, drop_last=False, num_workers=2)
    tr = Trainer(cfg, train_b=train_b, val_b=val_b, train_a=train_a,
                 val_a=val_a, log_dir=str(tmp_path / "obs"))
    summary = tr.validate()
    stats = tr.train_stats_epoch()

    assert "train_stats_sensor_a_mean_iou" in stats
    assert "train_stats_sensor_b_mean_iou" in stats

    # embedding TSV dump (projector parity)
    dumps = glob.glob(os.path.join(tr.log_dir, "embeddings", "*.tsv"))
    assert dumps, "no embedding dump written"
    rows = np.loadtxt(dumps[0], delimiter="\t")
    assert rows.shape[0] == 6  # full val_b set (drop_last=False)

    # PCA latent image + sensor-A grid recorded by the writer
    tr.writer.flush()
    logged = set()
    with open(os.path.join(tr.log_dir, "metrics.jsonl")) as f:
        for line in f:
            logged.add(json.loads(line).get("image"))
    assert "val_events/pca_latent_space" in logged
    assert "val_img/pca_latent_space" in logged
    assert "val_img/sensor_a" in logged
