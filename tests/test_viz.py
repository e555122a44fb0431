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


def test_draw_bounding_boxes():
    from ess_tpu.utils.viz import draw_bounding_boxes

    img = np.zeros((20, 30, 3), np.float32)
    boxes = np.array([[2, 3, 5, 8], [0, 0, 0, 0], [9, 9, 4, 4]])
    out = draw_bounding_boxes(img, boxes, ground_truth=True)
    # first box drawn in cyan
    assert np.allclose(out[2, 3:11], [0, 1, 1])
    assert np.allclose(out[2:7, 3], [0, 1, 1])
    # drawing stops at the first all-zero box: the third box is NOT drawn
    assert np.allclose(out[9, 9:13], 0)
    pred = draw_bounding_boxes(img, boxes[:1], ground_truth=False)
    assert np.allclose(pred[2, 3:11], [1, 0, 1])  # magenta


def test_flow_rgb():
    from ess_tpu.utils.viz import flow_rgb

    h = w = 8
    flow = np.zeros((1, 2, h, w), np.float32)
    flow[0, 0] = 1.0  # uniform +x flow
    rgb = flow_rgb(flow)
    assert rgb.shape == (1, 3, h, w)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # opposite directions get different colors (min-max value normalization
    # needs a magnitude spread: a zero corner anchors the minimum)
    flow2 = np.zeros((1, 2, h, w), np.float32)
    flow2[0, 0, :, : w // 2] = 1.0
    flow2[0, 0, :, w // 2:] = -1.0
    flow2[0, :, 0, 0] = 0.0
    rgb2 = flow_rgb(flow2)
    assert not np.allclose(rgb2[0, :, 2, 0], rgb2[0, :, 2, -1])
    # +x maps to the red sector, -x to blue (hue = angle)
    assert rgb2[0, 0, 2, 0] > rgb2[0, 2, 2, 0]
    assert rgb2[0, 2, 2, -1] > rgb2[0, 0, 2, -1]


def test_disparity_rgb():
    from ess_tpu.utils.viz import disparity_rgb

    disp = np.zeros((6, 8), np.float32)
    disp[1, 2] = 40.0    # mid-range
    disp[3, 4] = 200.0   # clips at max_disp
    rgb = disparity_rgb(disp)
    assert rgb.shape == (6, 8, 3) and rgb.dtype == np.uint8
    # zero-disparity pixels stay black (visualization.py:7-19 masks by > 0)
    assert np.all(rgb[0, 0] == 0)
    assert rgb[1, 2].sum() > 0
    # clipped max maps to inferno's bright end (red+green heavy)
    assert rgb[3, 4, 0] > 200
    try:
        import matplotlib
        expect = (255 * np.asarray(
            matplotlib.colormaps["inferno"](np.clip(40.0 / 80.0, 0, 1))[:3]))
        assert np.allclose(rgb[1, 2], expect.astype(np.uint8))
    except (ImportError, AttributeError, KeyError):
        pass


def test_disparity_overlay():
    from ess_tpu.utils.viz import disparity_overlay

    img = np.full((4, 4), 100.0, np.float32)
    drgb = np.zeros((4, 4, 3), np.uint8)
    drgb[..., 0] = 200
    out = disparity_overlay(img, drgb)
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8
    # cv2.addWeighted(image, 0.1, disp, 0.9, 0) semantics
    assert np.all(out[..., 0] == 190)  # 0.1*100 + 0.9*200
    assert np.all(out[..., 1] == 10)   # 0.1*100
