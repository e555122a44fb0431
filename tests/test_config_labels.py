"""Tests for config loading and the label taxonomy."""

import numpy as np

from ess_tpu.core import labels, load_config
from ess_tpu.core.config import Config


def test_default_config():
    cfg = Config()
    assert cfg.dataset.sensor_b.input_channels == 5
    assert cfg.dataset.sensor_b.total_channels == 100
    assert cfg.train_input_size_b == (120, 216)
    assert cfg.val_input_size_b == (200, 352)
    assert cfg.seed == 6


def test_load_reference_schema_ddd17():
    raw = {
        "dataset": {
            "name_a": "Cityscapes_gray",
            "name_b": "DDD17_events",
            "DDD17_events": {
                "dataset_path": "",
                "split_train": "train",
                "shape": [200, 346],
                "nr_events_data": 20,
                "fixed_duration": False,
                "delta_t_per_data": 50,
                "nr_events_window": 32000,
                "event_representation": "voxel_grid",
                "nr_temporal_bins": 5,
                "separate_pol": False,
                "normalize_event": False,
                "require_paired_data_val": True,
            },
            "cityscapes_img": {"dataset_path": "", "shape": [200, 352], "random_crop": True},
        },
        "task": {"semseg_num_classes": 6},
        "model": {"model_name": "ess", "skip_connect_task_type": "concat"},
        "optim": {"batch_size_a": 16, "lr_front": "1e-5", "lr_back": "1e-4",
                  "task_loss": ["dice", "cross_entropy"]},
    }
    cfg = load_config(raw)
    assert cfg.dataset.sensor_b.nr_events_window == 32000
    assert cfg.optim.lr_front == 1e-5
    assert cfg.task.semseg_num_classes == 6
    assert cfg.task.class_names == ["flat", "background", "object", "vegetation", "human", "vehicle"]
    assert cfg.model.skip_connect_task_type == "concat"


def test_load_dsec_semseg_flags():
    raw = {
        "dataset": {
            "name_a": "Cityscapes_gray",
            "name_b": "DSEC_events",
            "DSEC_events": {"shape": [440, 640], "nr_events_window": 100000},
            "cityscapes_img": {"shape": [440, 640], "random_crop": False},
        },
        "task": {"semseg_num_classes": 11},
    }
    cfg = load_config(raw)
    # DSEC has no train-split event labels (reference settings.py:128-131)
    assert not cfg.dataset.sensor_b.semseg_label_train
    assert cfg.dataset.sensor_b.semseg_label_val
    assert cfg.train_input_size_b == (440, 640)
    assert len(cfg.task.class_names) == 11


def test_label_remap_6():
    ids = np.array([[7, 8, 23], [26, 24, 0]], np.uint8)
    out = labels.id_to_train_id(ids, 6)
    np.testing.assert_array_equal(out, [[0, 0, 1], [5, 4, 255]])


def test_label_remap_11():
    ids = np.array([23, 11, 13, 24, 17, 7, 8, 21, 26, 12, 20, 3])
    out = labels.id_to_train_id(ids, 11)
    np.testing.assert_array_equal(out, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 255])


def test_shift_round_trip():
    lbl = np.array([0, 5, 254, 255], np.uint8)
    up = labels.shift_up(lbl)
    np.testing.assert_array_equal(up, [1, 6, 255, 0])  # uint8 wrap: 255 -> 0
    down = labels.shift_down(up)
    np.testing.assert_array_equal(down, lbl)
