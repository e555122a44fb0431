"""Training orchestration: epoch loop, validation, checkpointing, logging.

Capability parity with the reference training engine
(/root/reference/training/base_trainer.py:361-486 — ``train()`` epoch loop
with validation every ``val_epoch_step`` epochs, checkpoint save, LR decay;
ess_supervised_trainer.py:77-90 iterates only the event loader;
ess_trainer.py pairs both domains through WrapperDataset).

TPU-first: the loop is a thin host driver around jitted steps — batches are
converted to SoA, prefetched to the device (double-buffered, optionally
sharded across a data mesh), and every metric crosses to the host as a
scalar or a (C, C) confusion matrix. LR decay lives inside the optax
schedule, not the loop.
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Optional

import jax
import numpy as np

from ess_tpu.core.config import Config
from ess_tpu.data.loader import BatchLoader, PairedLoader, prefetch_to_device
from ess_tpu.data.pipeline import to_soa
from ess_tpu.io.checkpoint import CheckpointManager
from ess_tpu.io.writers import MetricsWriter
from ess_tpu.train import supervised as sup
from ess_tpu.train import uda as uda_mod
from ess_tpu.train.builder import ESSModules, build_modules, init_state, make_pipeline
from ess_tpu.train.metrics import MetricsSemseg


def _needs_soa(b: dict) -> bool:
    # packed-wire batches also pass through to_soa (tile_offsets rename)
    return "raw_events" in b or "ev_xq" in b


def _device_batches(loader, sharding=None):
    return prefetch_to_device(
        (to_soa(b) if _needs_soa(b) else b for b in loader),
        sharding=sharding)


def _merge_uda(batch_a: dict, batch_b: dict) -> dict:
    out = {"image_a": batch_a["image"], "label_a": batch_a["label"]}
    for k, v in batch_b.items():
        if k == "label":
            out["label_b"] = v
        elif k == "events":
            out["events_b"] = v
        else:
            out[k] = v
    return out


class Trainer:
    """End-to-end ESS training driver (supervised or UDA)."""

    def __init__(
        self,
        cfg: Config,
        *,
        train_b: BatchLoader,
        val_b: Optional[BatchLoader] = None,
        train_a: Optional[BatchLoader] = None,
        val_a: Optional[BatchLoader] = None,
        rectify_map=None,
        mesh=None,
        e2vid_params=None,
        front_params=None,
        front_batch_stats=None,
        log_dir: Optional[str] = None,
        save_every_steps: int = 0,
        profile_steps: Optional[tuple] = None,
    ):
        # save_every_steps > 0: preemption-safe async mid-epoch checkpoints
        # (new capability vs the reference's epoch-only saves, saver.py:15-31)
        self.save_every_steps = save_every_steps
        # profile_steps = (start, end): capture a jax.profiler trace of those
        # train steps into <log_dir>/profile (the TPU analogue of the
        # reference's CudaTimer regions, e2vid/utils/timers.py:10-26)
        self.profile_steps = profile_steps
        self.cfg = cfg
        self.is_uda = cfg.model.model_name == "ess"
        self.train_b, self.val_b = train_b, val_b
        self.train_a, self.val_a = train_a, val_a
        self.mesh = mesh

        steps_per_epoch = len(train_b) if not self.is_uda else max(
            len(train_a or train_b), len(train_b))
        self.mods: ESSModules = build_modules(cfg, steps_per_epoch=steps_per_epoch)
        self.pipe_train = make_pipeline(cfg, train=True, rectify_map=rectify_map)
        self.pipe_val = make_pipeline(cfg, train=False, rectify_map=rectify_map)

        self.state = init_state(
            self.mods, jax.random.PRNGKey(cfg.seed),
            e2vid_params=e2vid_params, front_params=front_params,
            front_batch_stats=front_batch_stats)

        if self.is_uda:
            self.train_step = uda_mod.make_train_step(self.mods, self.pipe_train)
            self.eval_step_a = uda_mod.make_eval_step_a(self.mods)
            self.eval_step_b = uda_mod.make_eval_step_b(self.mods, self.pipe_val)
        else:
            self.train_step = sup.make_train_step(self.mods, self.pipe_train)
            self.eval_step_b = sup.make_eval_step(self.mods, self.pipe_val)
            self.eval_step_a = None

        self.log_dir = log_dir or os.path.join(
            cfg.log_dir, time.strftime("%Y%m%d-%H%M%S"))
        self.writer = MetricsWriter(
            self.log_dir, config={"cfg": cfg},
            tracker=cfg.tracker if cfg.tracker != "none" else None)
        from ess_tpu.utils.viz import count_params
        counts = {"back_end": count_params(self.state.back_params),
                  "front_sensor_b(e2vid,frozen)": count_params(self.state.e2vid_params)}
        if self.state.front_params is not None:
            counts["front_sensor_a"] = count_params(self.state.front_params)
        for name, n in counts.items():
            print(f"[ess-tpu] {name}: {n / 1e6:.2f}M params")
        self.ckpt = (CheckpointManager(os.path.join(self.log_dir, "checkpoints"))
                     if cfg.checkpoint.save_checkpoint else None)
        self.step_count = 0
        self.epoch = 0

        if cfg.checkpoint.resume_training:
            from ess_tpu.io.checkpoint import AUTOSAVE_BASE
            # resume_file (reference settings_DDD17.yaml:52-54) points at a
            # previous run (its dir or its checkpoints/ subdir); without it,
            # resume from this run's own checkpoint dir.
            src = self.ckpt
            rf = cfg.checkpoint.resume_file
            if rf:
                if os.path.isdir(os.path.join(rf, "checkpoints")):
                    rf = os.path.join(rf, "checkpoints")
                src = CheckpointManager(rf)
            latest = src.latest() if src is not None else None
            if latest is not None:
                self.state = src.restore(self.state, latest)
                # continue TB curves where they left off (saver.py:15-31
                # stores step_count for the same reason)
                self.step_count = int(self.state.step)
                meta = src.restore_metadata(latest) or {}
                if latest >= AUTOSAVE_BASE:
                    # preemption save: re-run the interrupted epoch with the
                    # restored params/opt/step (data order restarts)
                    self.epoch = int(meta.get("epoch", 0))
                else:
                    self.epoch = int(meta.get("epoch", latest)) + 1
                print(f"[ess-tpu] resumed from checkpoint {latest} "
                      f"(epoch {self.epoch}, step {self.step_count})")

        if mesh is not None:
            from ess_tpu.parallel import batch_sharding, replicate
            self.state = replicate(self.state, mesh)
            self._sharding = batch_sharding(mesh)
        else:
            self._sharding = None

    # ------------------------------------------------------------------

    def _train_batches(self) -> Iterator[dict]:
        if self.is_uda:
            paired = PairedLoader(self.train_a, self.train_b)
            it = (_merge_uda(a, to_soa(b) if _needs_soa(b) else b)
                  for a, b in paired)
            yield from prefetch_to_device(it, sharding=self._sharding)
        else:
            yield from _device_batches(self.train_b, self._sharding)

    def train_epoch(self) -> None:
        from ess_tpu.io.timers import Timer

        for batch in self._train_batches():
            if self.profile_steps and self.step_count == self.profile_steps[0]:
                jax.profiler.start_trace(os.path.join(self.log_dir, "profile"))
            with Timer("train_step"):
                self.state, losses = self.train_step(self.state, batch)
                # force completion so the region timer reflects device time
                loss = float(losses["loss"])
            self.step_count += 1
            self.writer.averaged_scalar("train/loss", loss, self.step_count)
            for k, v in losses.items():
                if k != "loss":
                    self.writer.averaged_scalar(
                        f"train/{k}", float(v), self.step_count)
            if (self.save_every_steps and self.ckpt is not None
                    and self.step_count % self.save_every_steps == 0):
                # async orbax save; keys >= AUTOSAVE_BASE never collide with
                # epoch keys
                from ess_tpu.io.checkpoint import AUTOSAVE_BASE
                # the (possibly mesh-sharded) state is saved directly: orbax
                # copies device->host inside save() (multi-host coordinated,
                # every process participates) — no per-process device_get
                self.ckpt.save(AUTOSAVE_BASE + self.step_count, self.state,
                               metadata={"epoch": self.epoch,
                                         "step_count": self.step_count})
            if self.profile_steps and self.step_count == self.profile_steps[1]:
                jax.profiler.stop_trace()

    def validate(self) -> dict:
        cfg = self.cfg
        summary: dict = {}
        task = cfg.task
        if self.eval_step_a is not None and self.val_a is not None:
            m = MetricsSemseg(task.semseg_num_classes, task.semseg_ignore_label,
                              task.class_names)
            losses_a = []
            logged_a = False
            for batch in _device_batches(self.val_a, self._sharding):
                out = self.eval_step_a(self.state, batch)
                m.update_confusion(np.asarray(out["cm_a"]))
                losses_a.append(float(out["semseg_sensor_a_loss"]))
                if not logged_a:
                    # sensor-A image grid + latent PCA (ess_trainer.py
                    # :546-562, base_trainer.py:556-583 parity)
                    self._log_val_images_a(batch, out)
                    self._log_latent_pca(out, "val_img")
                    logged_a = True
            if losses_a:
                # one mean per validation pass (averaged_scalar's 50-sample
                # window would silently swallow small val sets and mix
                # losses from different parameter states)
                self.writer.scalar("val/semseg_sensor_a_loss",
                                   float(np.mean(losses_a)), self.step_count)
            s = m.summary()
            summary["semseg_sensor_a_mean_iou"] = s["mean_iou"]
            summary["semseg_sensor_a_acc"] = s["acc"]

        if self.val_b is not None:
            m_b = MetricsSemseg(task.semseg_num_classes, task.semseg_ignore_label,
                                task.class_names)
            m_cycle = MetricsSemseg(task.semseg_num_classes,
                                    task.semseg_ignore_label, task.class_names)
            logged_images = False
            embeds = []
            for batch in _device_batches(self.val_b, self._sharding):
                out = self.eval_step_b(self.state, batch)
                key = "cm_b" if "cm_b" in out else "cm"
                m_b.update_confusion(np.asarray(out[key]))
                if "cm_cycle" in out:
                    m_cycle.update_confusion(np.asarray(out["cm_cycle"]))
                if "latent8" in out:
                    # task-feature embedding space: spatially pooled deepest
                    # latent per sample (base_trainer.py:502-515 parity)
                    embeds.append(np.asarray(out["latent8"]).mean(axis=(1, 2)))
                if not logged_images:
                    self._log_val_images(batch, out)
                    self._log_latent_pca(out, "val_events")
                    logged_images = True
            if embeds:
                from ess_tpu.utils import viz
                edir = os.path.join(self.log_dir, "embeddings")
                os.makedirs(edir, exist_ok=True)
                viz.embedding_dump(
                    np.concatenate(embeds, axis=0), None,
                    os.path.join(edir,
                                 f"task_feature_space_{self.step_count}.tsv"))
            s = m_b.summary()
            summary["semseg_sensor_b_mean_iou"] = s["mean_iou"]
            summary["semseg_sensor_b_acc"] = s["acc"]
            summary["cm_b"] = s["cm"]
            for name in task.class_names:  # per-class IoU curves
                self.writer.scalar(f"val_events/iou_{name}", float(s[name]),
                                   self.step_count)
            from ess_tpu.utils import viz
            self.writer.figure(
                "val_events/semseg_cm",
                viz.confusion_matrix_figure(s["cm"], task.class_names),
                self.step_count)
            if m_cycle.confusion.sum() > 0:
                sc = m_cycle.summary()
                summary["semseg_sensor_cycle_mean_iou"] = sc["mean_iou"]
                summary["semseg_sensor_cycle_acc"] = sc["acc"]
        for k, v in summary.items():
            if np.ndim(v) == 0:
                self.writer.scalar(f"val/{k}", float(v), self.step_count)
        return summary

    def _log_val_images(self, batch: dict, out: dict) -> None:
        """Validation image grids (ess_trainer.py:546-603 parity):
        reconstruction, colorized prediction, colorized GT, cm figure."""
        from ess_tpu.utils import viz

        cmap = self.cfg.task.color_map
        ignore = self.cfg.task.semseg_ignore_label
        tiles = []
        n = 4
        if "img_fake" in out:
            imgs = np.asarray(out["img_fake"])[:n, :, :, 0]
            tiles += [np.repeat(i[..., None], 3, -1) for i in imgs]
        if "pred" in out:
            for p in np.asarray(out["pred"])[:n]:
                tiles.append(viz.colorize_semseg(p, cmap, ignore) / 255.0)
        if "label" in batch:
            for l in np.asarray(batch["label"])[:n]:
                tiles.append(viz.colorize_semseg(l, cmap, ignore) / 255.0)
        if tiles:
            self.writer.image("val/sensor_b", viz.make_grid(tiles, nrow=n),
                              self.step_count)

    def _log_val_images_a(self, batch: dict, out: dict) -> None:
        """Sensor-A validation grid: input image, colorized prediction,
        colorized GT (visualizeSensorA, ess_trainer.py:546-562)."""
        from ess_tpu.utils import viz

        cmap = self.cfg.task.color_map
        ignore = self.cfg.task.semseg_ignore_label
        n = 4
        tiles = []
        if "image" in batch:
            imgs = np.asarray(batch["image"])[:n, :, :, 0]
            lo, hi = imgs.min(), imgs.max()
            imgs = (imgs - lo) / max(hi - lo, 1e-12)
            tiles += [np.repeat(i[..., None], 3, -1) for i in imgs]
        if "pred" in out:
            for p in np.asarray(out["pred"])[:n]:
                tiles.append(viz.colorize_semseg(p, cmap, ignore) / 255.0)
        if "label" in batch:
            for l in np.asarray(batch["label"])[:n]:
                tiles.append(viz.colorize_semseg(l, cmap, ignore) / 255.0)
        if tiles:
            self.writer.image("val_img/sensor_a", viz.make_grid(tiles, nrow=n),
                              self.step_count)

    def _log_latent_pca(self, out: dict, prefix: str) -> None:
        """Top-3-PCA RGB of the deepest latent (computePCA/createRGBGrid,
        base_trainer.py:564-583)."""
        if "latent8" not in out:
            return
        from ess_tpu.utils import viz

        lat = np.asarray(out["latent8"])[:4]
        tiles = [viz.latent_pca_rgb(l) for l in lat]
        self.writer.image(f"{prefix}/pca_latent_space",
                          viz.make_grid(tiles, nrow=len(tiles)),
                          self.step_count)

    def train_stats_epoch(self) -> dict:
        """Optional eval pass over the TRAIN sets (trainDatasetStatisticsEpoch,
        base_trainer.py:473-498 / :429-431): same eval steps and metrics as
        validate(), logged under train_stats_*. Enabled by
        cfg.model.do_val_training_epoch (the reference hard-disables it in
        both ESS trainers; here it is a working, gated capability)."""
        task = self.cfg.task
        summary: dict = {}
        if self.eval_step_a is not None and self.train_a is not None:
            m = MetricsSemseg(task.semseg_num_classes, task.semseg_ignore_label,
                              task.class_names)
            for batch in _device_batches(self.train_a, self._sharding):
                out = self.eval_step_a(self.state, batch)
                m.update_confusion(np.asarray(out["cm_a"]))
            s = m.summary()
            summary["train_stats_sensor_a_mean_iou"] = s["mean_iou"]
        if self.train_b is not None:
            m = MetricsSemseg(task.semseg_num_classes, task.semseg_ignore_label,
                              task.class_names)
            for batch in _device_batches(self.train_b, self._sharding):
                out = self.eval_step_b(self.state, batch)
                m.update_confusion(np.asarray(out["cm_b" if "cm_b" in out
                                                  else "cm"]))
            s = m.summary()
            summary["train_stats_sensor_b_mean_iou"] = s["mean_iou"]
        for k, v in summary.items():
            # summary keys already carry the train_stats_ prefix; don't
            # stutter it in the scalar tag (train_stats/sensor_a_mean_iou)
            tag = k.removeprefix("train_stats_")
            self.writer.scalar(f"train_stats/{tag}", float(v),
                               self.step_count)
        return summary

    def run(self) -> dict:
        """Full training: epochs with periodic validation + checkpoints
        (base_trainer.py:361-398)."""
        cfg = self.cfg
        last_summary: dict = {}
        for epoch in range(self.epoch, cfg.optim.num_epochs):
            self.epoch = epoch
            if epoch % cfg.optim.val_epoch_step == 0 and (
                    self.val_b is not None or self.val_a is not None):
                last_summary = self.validate()
                if cfg.model.do_val_training_epoch:
                    last_summary.update(self.train_stats_epoch())
            self.train_epoch()
            if self.ckpt is not None:
                self.ckpt.save(epoch, self.state,
                               metadata={"epoch": epoch,
                                         "step_count": self.step_count})
        if self.val_b is not None or self.val_a is not None:
            last_summary = self.validate()
        if self.ckpt is not None:
            self.ckpt.wait()
        self.writer.flush()
        return last_summary
