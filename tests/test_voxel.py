"""Parity tests for the JAX voxelizers against independent numpy goldens.

The goldens re-derive the algorithms specified by the reference
(datasets/data_util.py:54-126, DSEC/dataset/representations.py:15-55,
datasets/data_util.py:17-35) with plain numpy loops — slow but obviously
correct — and the fixed-capacity masked JAX versions must match them exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ess_tpu.ops import (
    EventWindow,
    event_histogram,
    normalize_nonzero,
    voxel_grid_temporal,
    voxel_grid_trilinear,
)


def golden_temporal(x, y, t, p, bins, H, W, separate_pol):
    """Per-event loop golden for the temporal-bilinear voxel grid."""
    pos = np.zeros((bins, H, W), np.float64)
    neg = np.zeros((bins, H, W), np.float64)
    dt = t[-1] - t[0]
    if dt == 0:
        dt = 1.0
    ts = (bins - 1) * (t - t[0]) / dt
    for i in range(len(x)):
        xi, yi = int(x[i]), int(y[i])
        if not (0 <= xi < W and 0 <= yi < H and 0 <= ts[i] < bins):
            continue
        ti = int(ts[i])
        frac = ts[i] - ti
        grid = pos if p[i] > 0 else neg
        if ti < bins:
            grid[ti, yi, xi] += 1.0 - frac
        if ti + 1 < bins:
            grid[ti + 1, yi, xi] += frac
    if separate_pol:
        return np.concatenate([pos, neg], 0).astype(np.float32)
    return (pos - neg).astype(np.float32)


def golden_trilinear(x, y, t, p, bins, H, W):
    """Per-event, per-corner loop golden for the trilinear voxel grid."""
    grid = np.zeros((bins, H, W), np.float64)
    dt = t[-1] - t[0]
    ts = (bins - 1) * (t - t[0]) / dt
    for i in range(len(x)):
        val = 2.0 * (1.0 if p[i] > 0 else 0.0) - 1.0
        x0, y0, t0 = int(x[i]), int(y[i]), int(ts[i])
        for xl in (x0, x0 + 1):
            for yl in (y0, y0 + 1):
                for tl in (t0, t0 + 1):
                    if not (0 <= xl < W and 0 <= yl < H and 0 <= tl < bins):
                        continue
                    w = (
                        val
                        * (1 - abs(xl - x[i]))
                        * (1 - abs(yl - y[i]))
                        * (1 - abs(tl - ts[i]))
                    )
                    grid[tl, yl, xl] += w
    return grid.astype(np.float32)


def make_events(rng, n, H, W, float_coords=False):
    if float_coords:
        x = rng.uniform(0, W - 1, n).astype(np.float32)
        y = rng.uniform(0, H - 1, n).astype(np.float32)
    else:
        x = rng.integers(0, W, n).astype(np.float32)
        y = rng.integers(0, H, n).astype(np.float32)
    t = np.sort(rng.uniform(0.0, 1e5, n)).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)  # {0,1}
    return x, y, t, p


@pytest.mark.parametrize("separate_pol", [False, True])
def test_temporal_matches_golden(rng, separate_pol):
    H, W, bins, n = 24, 32, 5, 800
    x, y, t, p = make_events(rng, n, H, W)
    golden = golden_temporal(x, y, t, p, bins, H, W, separate_pol)
    got = voxel_grid_temporal(
        EventWindow.from_arrays(x, y, t, p),
        num_bins=bins, height=H, width=W, separate_pol=separate_pol,
    )
    np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-4, atol=1e-4)


def test_temporal_padding_invariance(rng):
    """Padded lanes with valid=False must not change the result."""
    H, W, bins, n = 16, 16, 5, 300
    x, y, t, p = make_events(rng, n, H, W)
    base = voxel_grid_temporal(
        EventWindow.from_arrays(x, y, t, p), num_bins=bins, height=H, width=W
    )
    pad = 100
    xp = np.concatenate([x, rng.uniform(-5, W + 5, pad).astype(np.float32)])
    yp = np.concatenate([y, rng.uniform(-5, H + 5, pad).astype(np.float32)])
    tp = np.concatenate([t, np.full(pad, t[-1] + 1e6, np.float32)])
    pp = np.concatenate([p, rng.integers(0, 2, pad).astype(np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    padded = voxel_grid_temporal(
        EventWindow.from_arrays(xp, yp, tp, pp, valid),
        num_bins=bins, height=H, width=W,
    )
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base), atol=1e-4)


def test_trilinear_matches_golden(rng):
    H, W, bins, n = 20, 28, 5, 600
    x, y, t, p = make_events(rng, n, H, W, float_coords=True)
    golden = golden_trilinear(x, y, t, p, bins, H, W)
    got = voxel_grid_trilinear(
        EventWindow.from_arrays(x, y, t, p), num_bins=bins, height=H, width=W
    )
    np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-4, atol=1e-4)


def test_trilinear_mass_conservation(rng):
    """Interior events deposit total weight = sum of signed polarities."""
    H, W, bins, n = 32, 32, 5, 500
    x = rng.uniform(1, W - 2, n).astype(np.float32)
    y = rng.uniform(1, H - 2, n).astype(np.float32)
    t = np.sort(rng.uniform(0, 1000, n)).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    grid = voxel_grid_trilinear(
        EventWindow.from_arrays(x, y, t, p), num_bins=bins, height=H, width=W
    )
    expected = np.sum(2 * p - 1)
    np.testing.assert_allclose(float(jnp.sum(grid)), expected, rtol=1e-3)


def test_histogram(rng):
    H, W, n = 16, 24, 400
    x, y, t, p = make_events(rng, n, H, W)
    hist = np.asarray(event_histogram(EventWindow.from_arrays(x, y, t, p), height=H, width=W))
    golden = np.zeros((2, H, W), np.float32)
    for i in range(n):
        golden[int(p[i] > 0), int(y[i]), int(x[i])] += 1
    np.testing.assert_array_equal(hist, golden)
    assert hist.sum() == n


def test_normalize_nonzero(rng):
    g = np.zeros((5, 8, 8), np.float32)
    g[1, 2, 3] = 4.0
    g[2, 1, 1] = -2.0
    g[4, 0, 0] = 6.0
    out = np.asarray(normalize_nonzero(jnp.asarray(g)))
    nz = out[g != 0]
    np.testing.assert_allclose(nz.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sqrt((nz ** 2).mean()), 1.0, atol=1e-4)
    assert np.all(out[g == 0] == 0)


def test_normalize_all_zero():
    g = jnp.zeros((2, 4, 4))
    np.testing.assert_array_equal(np.asarray(normalize_nonzero(g)), np.zeros((2, 4, 4)))
