"""Tests for reconstruction post-processing ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from ess_tpu.recon.postprocess import (
    IntensityRescaler,
    gaussian_kernel,
    rescale_intensity,
    unsharp_mask,
    zero_hot_pixels,
)


def test_rescale_intensity_range():
    img = jnp.linspace(-0.5, 1.5, 64).reshape(1, 8, 8, 1)
    out = np.asarray(rescale_intensity(img, 0.0, 1.0))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # values in range map monotonically
    mid = np.asarray(rescale_intensity(jnp.full((1, 1, 1, 1), 0.5), 0.0, 1.0))
    np.testing.assert_allclose(mid, 127 / 255, atol=1e-6)


def test_auto_hdr_smooths_bounds(rng):
    r = IntensityRescaler(auto_hdr=True, median_filter_size=3)
    imgs = [jnp.asarray(rng.uniform(0, s, (1, 8, 8, 1)).astype(np.float32))
            for s in (1.0, 2.0, 4.0)]
    outs = [np.asarray(r(i)) for i in imgs]
    for o in outs:
        assert o.min() >= 0.0 and o.max() <= 1.0


def test_gaussian_kernel_normalized():
    k = np.asarray(gaussian_kernel(5, 1.0))
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[2, 2] == k.max()


def test_unsharp_mask_sharpens_edge(rng):
    img = np.zeros((1, 16, 16, 1), np.float32)
    img[:, :, 8:, :] = 1.0
    amount = 0.5
    out = np.asarray(unsharp_mask(jnp.asarray(img), amount=amount))
    assert out.shape == img.shape
    # edge contrast boosted relative to the (1 + amount) renormalization
    raw_step = img[0, 8, 8, 0] - img[0, 8, 7, 0]
    out_step = (out[0, 8, 8, 0] - out[0, 8, 7, 0]) * (1 + amount)
    assert out_step > raw_step
    # flat zero region stays zero; flat one region scales by 1/(1+amount)
    np.testing.assert_allclose(out[0, 0, 0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 8, 15, 0], 1.0 / (1 + amount), atol=1e-3)


def test_zero_hot_pixels():
    ev = jnp.ones((2, 8, 8, 5))
    out = np.asarray(zero_hot_pixels(ev, np.array([[3, 4], [0, 0]])))
    assert out[0, 4, 3].sum() == 0  # (x=3, y=4)
    assert out[1, 0, 0].sum() == 0
    assert out[0, 1, 1].sum() == 5


def test_event_preview_and_display_compose():
    """make_event_preview + ImageDisplay.compose parity with
    inference_utils.py:18-42/:210-258 (red-blue polarity, border crop,
    hstack layout, gray->color promotion)."""
    import numpy as np

    from ess_tpu.recon.display import ImageDisplay, make_event_preview

    grid = np.zeros((5, 8, 10), np.float32)
    grid[0, 2, 3] = 1.0
    grid[4, 5, 6] = -2.0
    prev = make_event_preview(grid, mode="red-blue")
    assert prev.shape == (8, 10, 3)
    assert prev[2, 3, 0] == 255 and prev[2, 3, 2] == 0      # positive: blue
    assert prev[5, 6, 2] == 255 and prev[5, 6, 0] == 0      # negative: red
    # last-bin restriction drops the early positive event
    prev1 = make_event_preview(grid, mode="red-blue", num_bins_to_show=1)
    assert prev1[2, 3, 0] == 0 and prev1[5, 6, 2] == 255

    gray = make_event_preview(grid, mode="grayscale")
    assert gray.dtype == np.uint8 and gray.shape == (8, 10)
    assert gray[0, 0] == 127  # zero events -> midpoint of [-10, 10]

    disp = ImageDisplay(display=False, show_events=True, border=1)
    img = np.full((8, 10), 128, np.uint8)
    frame = disp.compose(img, grid)
    # border crop (8,10)->(6,8) each, color-promoted, hstacked
    assert frame.shape == (6, 16, 3)

    disp2 = ImageDisplay(display=False, border=2)
    assert disp2.compose(img).shape == (4, 6)
