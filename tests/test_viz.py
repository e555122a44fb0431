"""Tests for visualization helpers."""

import numpy as np
import pytest

from ess_tpu.core import labels as labels_mod
from ess_tpu.utils import viz


def test_colorize_semseg_with_ignore():
    lbl = np.array([[0, 1], [255, 5]], np.uint8)
    rgb = viz.colorize_semseg(lbl, labels_mod.COLOR_MAP_6)
    np.testing.assert_array_equal(rgb[0, 0], [128, 64, 128])
    np.testing.assert_array_equal(rgb[0, 1], [70, 70, 70])
    np.testing.assert_array_equal(rgb[1, 1], [0, 0, 142])
    # ignore pixel gets checkerboard gray, not a class color
    assert rgb[1, 0, 0] == rgb[1, 0, 1] == rgb[1, 0, 2]


def test_event_previews(rng):
    hist = np.abs(rng.normal(size=(2, 8, 8))).astype(np.float32)
    rgb = viz.event_histogram_rgb(hist)
    assert rgb.shape == (8, 8, 3)
    grid = rng.normal(size=(5, 8, 8)).astype(np.float32)
    rgb2 = viz.voxel_grid_rgb(grid)
    assert rgb2.shape == (8, 8, 3)
    assert rgb2.max() <= 1.0


def test_make_grid():
    imgs = [np.ones((4, 6, 3), np.float32) * i for i in range(5)]
    g = viz.make_grid(imgs, nrow=3, pad=1)
    assert g.shape == (2 * 5 + 1, 3 * 7 + 1, 3)


def test_latent_pca_rgb(rng):
    lat = rng.normal(size=(8, 8, 16)).astype(np.float32)
    rgb = viz.latent_pca_rgb(lat)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_embedding_dump(tmp_path, rng):
    emb = rng.normal(size=(4, 8)).astype(np.float32)
    path = str(tmp_path / "emb.tsv")
    viz.embedding_dump(emb, np.array([0, 1, 2, 3]), path)
    loaded = np.loadtxt(path, delimiter="\t")
    assert loaded.shape == (4, 8)


def test_confusion_figure():
    fig = viz.confusion_matrix_figure(np.eye(3), ["a", "b", "c"])
    # None is acceptable when matplotlib is missing; otherwise a figure
    if fig is not None:
        assert hasattr(fig, "savefig")
