"""CLI end-to-end smoke tests over synthetic dataset fixtures."""

import os

import numpy as np
import pytest

from tests.test_datasets_integration import make_ddd17_dir


def write_yaml(path, ddd17_root, log_dir):
    yaml_text = f"""
dataset:
  name_a: 'Cityscapes_gray'
  name_b: 'DDD17_events'
  DDD17_events:
    dataset_path: {ddd17_root}
    split_train: 'train'
    shape: [200, 346]
    nr_events_data: 2
    fixed_duration: False
    delta_t_per_data: 50
    require_paired_data_val: False
    nr_events_window: 512
    event_representation: 'voxel_grid'
    nr_temporal_bins: 5
    separate_pol: False
    normalize_event: False
  cityscapes_img:
    dataset_path: /nonexistent
    shape: [200, 352]
    random_crop: True
task:
  semseg_num_classes: 6
dir:
  log: {log_dir}
model:
  model_name: 'ess_supervised'
  skip_connect_encoder: True
  skip_connect_task: True
  skip_connect_task_type: 'concat'
  data_augmentation_train: False
  train_on_event_labels: False
  compute_dtype: 'float32'
  e2vid_base_channels: 8
optim:
  batch_size_a: 2
  batch_size_b: 2
  lr_front: 1e-4
  lr_back: 1e-3
  lr_decay: 1
  num_epochs: 1
  val_epoch_step: 1
  weight_task_loss: 1
  weight_cycle_pred_loss: 1
  weight_cycle_emb_loss: 0.01
  weight_cycle_task_loss: 0.01
  task_loss: ['dice', 'cross_entropy']
checkpoint:
  save_checkpoint: False
  resume_training: False
  load_pretrained_weights: False
  resume_file: ''
  pretrained_file: ''
hardware:
  num_cpu_workers: 2
"""
    with open(path, "w") as f:
        f.write(yaml_text)


def test_train_cli_supervised_ddd17(tmp_path, capsys):
    """The full train CLI runs one supervised epoch on a synthetic DDD17
    tree (loader -> host binning -> fused device pipeline -> metrics)."""
    pytest.importorskip("cv2")
    ddd17 = tmp_path / "ddd17"
    ddd17.mkdir()
    make_ddd17_dir(str(ddd17), n_masks=2, n_events=4000)
    yaml_path = str(tmp_path / "cfg.yaml")
    write_yaml(yaml_path, str(ddd17), str(tmp_path / "logs"))

    from ess_tpu.cli import train as train_cli
    train_cli.main(["--settings_file", yaml_path])
    out = capsys.readouterr().out
    assert "semseg_sensor_b_mean_iou" in out


def test_reconstruct_cli(tmp_path, rng):
    """The standalone reconstruction CLI converts an events.txt to frames."""
    pytest.importorskip("cv2")
    events_file = str(tmp_path / "events.txt")
    n = 3000
    t = np.sort(rng.uniform(0, 1.0, n))
    x = rng.integers(0, 64, n)
    y = rng.integers(0, 48, n)
    p = rng.integers(0, 2, n)
    with open(events_file, "w") as f:
        f.write("64 48\n")
        for i in range(n):
            f.write(f"{t[i]:.6f} {x[i]} {y[i]} {p[i]}\n")

    out_dir = str(tmp_path / "frames")
    from ess_tpu.cli import reconstruct
    reconstruct.main(["-i", events_file, "-o", out_dir, "-N", "1000"])
    frames = sorted(os.listdir(out_dir))
    assert len(frames) == 3
    import cv2
    img = cv2.imread(os.path.join(out_dir, frames[0]), 0)
    assert img.shape == (48, 64)


def test_reconstruct_cli_color(tmp_path, rng):
    """--color produces full-resolution 3-channel frames from a Bayer
    stream (reference --color, inference_options.py:55-57)."""
    pytest.importorskip("cv2")
    events_file = str(tmp_path / "events.txt")
    n = 4000
    t = np.sort(rng.uniform(0, 1.0, n))
    x = rng.integers(0, 64, n)
    y = rng.integers(0, 48, n)
    p = rng.integers(0, 2, n)
    with open(events_file, "w") as f:
        f.write("64 48\n")
        for i in range(n):
            f.write(f"{t[i]:.6f} {x[i]} {y[i]} {p[i]}\n")

    out_dir = str(tmp_path / "cframes")
    from ess_tpu.cli import reconstruct
    reconstruct.main(["-i", events_file, "-o", out_dir, "-N", "2000",
                      "--color"])
    frames = sorted(os.listdir(out_dir))
    assert len(frames) == 2
    import cv2
    img = cv2.imread(os.path.join(out_dir, frames[0]), cv2.IMREAD_UNCHANGED)
    assert img.shape == (48, 64, 3)


def test_evaluate_cli(tmp_path, capsys):
    """Train (with checkpointing) then evaluate the saved checkpoint via the
    standalone evaluation CLI (reference README.md:104-110 eval path)."""
    pytest.importorskip("cv2")
    ddd17 = tmp_path / "ddd17"
    ddd17.mkdir()
    make_ddd17_dir(str(ddd17), n_masks=2, n_events=4000)
    yaml_path = str(tmp_path / "cfg.yaml")
    write_yaml(yaml_path, str(ddd17), str(tmp_path / "logs"))
    with open(yaml_path) as f:
        text = f.read().replace("save_checkpoint: False",
                                "save_checkpoint: True")
    with open(yaml_path, "w") as f:
        f.write(text)

    from ess_tpu.cli import evaluate as eval_cli
    from ess_tpu.cli import train as train_cli
    train_cli.main(["--settings_file", yaml_path])
    capsys.readouterr()

    runs = sorted((tmp_path / "logs").iterdir())
    ckpt = str(runs[-1] / "checkpoints")
    eval_cli.main(["--settings_file", yaml_path, "--checkpoint", ckpt])
    out = capsys.readouterr().out
    assert "semseg_sensor_b_mean_iou" in out
