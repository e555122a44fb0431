"""Training CLI.

Capability parity with /root/reference/train.py:16-53:
``python -m ess_tpu.cli.train --settings_file config/settings_DDD17.yaml``
accepts the reference's YAML schema unchanged, seeds everything from
``cfg.seed`` (reference pins 6, train.py:17-25), dispatches 'ess' ->
UDA / 'ess_supervised' -> supervised, and writes logs + checkpoints under a
timestamped log dir with the YAML copied in (config/settings.py:221-231).
"""

from __future__ import annotations

import argparse
import os
import shutil
import time

import numpy as np


def build_loaders(cfg, for_train=True):
    """Construct dataset loaders from the config's dataset names."""
    from ess_tpu.data.loader import BatchLoader

    ds_b = cfg.dataset.sensor_b
    rectify_map = None
    from ess_tpu.ops.batch_voxel import effective_bins
    # ghost-folded band binning pre-weights polarities with the voxel tent
    # factors — only the voxel_grid representation can consume it; other
    # representations (histogram, ev_segnet) keep tile-sorted raw events
    binning = "folded" if ds_b.event_representation == "voxel_grid" else "tile"
    if ds_b.name.startswith("DSEC"):
        from ess_tpu.data.dsec import DSECEvents
        train_set = DSECEvents(ds_b.dataset_path, mode="train",
                               nr_events_data=ds_b.nr_events_data,
                               nr_events_window=ds_b.nr_events_window,
                               fixed_duration=ds_b.fixed_duration,
                               delta_t_per_data=ds_b.delta_t_per_data,
                               semseg_num_classes=cfg.task.semseg_num_classes,
                               tile_bins=effective_bins(
                                   ds_b.nr_temporal_bins, ds_b.separate_pol,
                                   True),
                               binning=binning,
                               wire_format=ds_b.wire_format)
        val_set = DSECEvents(ds_b.dataset_path, mode="val",
                             nr_events_data=ds_b.nr_events_data,
                             nr_events_window=ds_b.nr_events_window,
                             fixed_duration=ds_b.fixed_duration,
                             delta_t_per_data=ds_b.delta_t_per_data,
                             semseg_num_classes=cfg.task.semseg_num_classes,
                             tile_bins=effective_bins(
                                 ds_b.nr_temporal_bins, ds_b.separate_pol,
                                 True),
                             binning=binning,
                             wire_format=ds_b.wire_format)
    elif ds_b.name.startswith("DDD17"):
        from ess_tpu.data.ddd17 import DDD17Events
        train_set = DDD17Events(ds_b.dataset_path, split=ds_b.split_train,
                                nr_events_data=ds_b.nr_events_data,
                                nr_events_window=ds_b.nr_events_window,
                                fixed_duration=ds_b.fixed_duration,
                                delta_t_per_data=ds_b.delta_t_per_data,
                                tile_bins=effective_bins(
                                    ds_b.nr_temporal_bins, ds_b.separate_pol,
                                    False),
                                binning=binning)
        val_set = DDD17Events(ds_b.dataset_path, split="valid",
                              nr_events_data=ds_b.nr_events_data,
                              nr_events_window=ds_b.nr_events_window,
                              fixed_duration=ds_b.fixed_duration,
                              delta_t_per_data=ds_b.delta_t_per_data,
                              require_paired_data=ds_b.require_paired_data_val,
                              tile_bins=effective_bins(
                                  ds_b.nr_temporal_bins, ds_b.separate_pol,
                                  False),
                              binning=binning)
    else:
        raise ValueError(f"unknown sensor-B dataset: {ds_b.name}")

    workers = cfg.hardware.num_cpu_workers
    if workers < 0:
        workers = os.cpu_count() or 4
    train_b = BatchLoader(train_set, cfg.optim.batch_size_b, shuffle=True,
                          num_workers=workers, seed=cfg.seed)
    val_b = BatchLoader(val_set, cfg.optim.batch_size_b, shuffle=False,
                        drop_last=False, num_workers=workers)

    train_a = val_a = None
    if cfg.model.model_name == "ess":
        ds_a = cfg.dataset.sensor_a
        h, w = ds_a.shape
        set_a, set_a_val = _image_datasets(cfg, ds_a, h, w)
        train_a = BatchLoader(set_a, cfg.optim.batch_size_a, shuffle=True,
                              num_workers=workers, seed=cfg.seed)
        val_a = BatchLoader(set_a_val, cfg.optim.batch_size_a, shuffle=False,
                            drop_last=False, num_workers=workers)

    if ds_b.name.startswith("DSEC"):
        rectify_map = None  # rectification happens on the host in the loader
    return train_a, train_b, val_a, val_b, rectify_map


def _image_datasets(cfg, ds_a, h, w):
    """Sensor-A dataset dispatch: Cityscapes_gray, DDD17_gray, or the
    DDD17_Cityscapes_gray mix (reference settings.py:62-106)."""
    def cityscapes(split, aug):
        from ess_tpu.data.cityscapes import CityscapesGray
        return CityscapesGray(ds_a.dataset_path, height=h, width=w, split=split,
                              semseg_num_classes=cfg.task.semseg_num_classes,
                              augmentation=aug, random_crop=ds_a.random_crop,
                              seed=cfg.seed)

    aug = cfg.model.data_augmentation_train
    if ds_a.name == "DDD17_gray":
        from ess_tpu.data.ddd17_gray import DDD17Gray
        return (DDD17Gray(ds_a.dataset_path, split="train", height=h, width=w),
                DDD17Gray(ds_a.dataset_path, split="valid", height=h, width=w))
    if ds_a.name == "DDD17_Cityscapes_gray":
        from ess_tpu.data.ddd17_gray import ConcatImages, DDD17Gray
        ddd17_root = getattr(ds_a, "extra_dataset_path", "") or ds_a.dataset_path
        train = ConcatImages(
            cityscapes("train", aug),
            DDD17Gray(ddd17_root, split="train", height=h, width=w))
        return train, cityscapes("val", False)
    return cityscapes("train", aug), cityscapes("val", False)


def load_pretrained_backbone(cfg):
    """Convert the E2VID .pth.tar when configured and present."""
    path = cfg.model.e2vid_checkpoint
    if path and os.path.isfile(path):
        from ess_tpu.io.convert import load_e2vid_checkpoint
        params, _ = load_e2vid_checkpoint(path)
        return params
    return None


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="ess-tpu training")
    parser.add_argument("--settings_file", required=True,
                        help="YAML config (reference schema supported)")
    parser.add_argument("--num_devices", type=int, default=0,
                        help="data-parallel devices (0 = single, -1 = all)")
    args = parser.parse_args(argv)

    from ess_tpu.core.config import load_config
    from ess_tpu.train.loop import Trainer

    cfg = load_config(args.settings_file)
    np.random.seed(cfg.seed)

    log_dir = os.path.join(cfg.log_dir, time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(log_dir, exist_ok=True)
    shutil.copyfile(args.settings_file,
                    os.path.join(log_dir, os.path.basename(args.settings_file)))

    train_a, train_b, val_a, val_b, rect = build_loaders(cfg)

    mesh = None
    if args.num_devices != 0:
        from ess_tpu.parallel import make_mesh
        mesh = make_mesh(args.num_devices)

    trainer = Trainer(
        cfg, train_b=train_b, val_b=val_b, train_a=train_a, val_a=val_a,
        rectify_map=rect, mesh=mesh, log_dir=log_dir,
        e2vid_params=load_pretrained_backbone(cfg))
    summary = trainer.run()
    for k, v in summary.items():
        if np.ndim(v) == 0:
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
