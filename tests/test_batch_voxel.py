"""Parity of the flat batched voxelizer vs the per-sample reference kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ess_tpu.ops.batch_voxel import voxelize_window_soa, voxelize_windows
from ess_tpu.ops.voxel import (
    EventWindow, event_histogram, voxel_grid_temporal, voxel_grid_trilinear,
)


def make_soa(rng, b=3, n=400, h=20, w=24, float_coords=False, with_pad=True):
    if float_coords:
        x = rng.uniform(0, w - 1, (b, n)).astype(np.float32)
        y = rng.uniform(0, h - 1, (b, n)).astype(np.float32)
    else:
        x = rng.integers(0, w, (b, n)).astype(np.float32)
        y = rng.integers(0, h, (b, n)).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e4, (b, n)), axis=1).astype(np.float32)
    p = rng.integers(0, 2, (b, n)).astype(np.float32)
    valid = np.ones((b, n), bool)
    if with_pad:
        for i in range(b):
            valid[i, rng.integers(n // 2, n):] = False
    return map(jnp.asarray, (x, y, t, p, valid))


def test_flat_temporal_matches_per_sample(rng):
    h, w, bins = 20, 24, 5
    x, y, t, p, valid = make_soa(rng)
    got = voxelize_window_soa(x, y, t, p, valid, num_bins=bins, height=h, width=w)
    for i in range(x.shape[0]):
        ref = voxel_grid_temporal(
            EventWindow.from_arrays(x[i], y[i], t[i], p[i], valid[i]),
            num_bins=bins, height=h, width=w)
        np.testing.assert_allclose(
            np.asarray(got[i]), np.moveaxis(np.asarray(ref), 0, -1), atol=1e-4)


def test_flat_separate_pol(rng):
    h, w, bins = 16, 16, 4
    x, y, t, p, valid = make_soa(rng, h=h, w=w)
    got = voxelize_window_soa(x, y, t, p, valid, num_bins=bins, height=h,
                              width=w, separate_pol=True)
    assert got.shape[-1] == 2 * bins
    for i in range(x.shape[0]):
        ref = voxel_grid_temporal(
            EventWindow.from_arrays(x[i], y[i], t[i], p[i], valid[i]),
            num_bins=bins, height=h, width=w, separate_pol=True)
        np.testing.assert_allclose(
            np.asarray(got[i]), np.moveaxis(np.asarray(ref), 0, -1), atol=1e-4)


def test_flat_trilinear_matches_per_sample(rng):
    h, w, bins = 20, 24, 5
    x, y, t, p, valid = make_soa(rng, float_coords=True)
    got = voxelize_window_soa(x, y, t, p, valid, num_bins=bins, height=h,
                              width=w, trilinear=True)
    for i in range(x.shape[0]):
        ref = voxel_grid_trilinear(
            EventWindow.from_arrays(x[i], y[i], t[i], p[i], valid[i]),
            num_bins=bins, height=h, width=w)
        np.testing.assert_allclose(
            np.asarray(got[i]), np.moveaxis(np.asarray(ref), 0, -1), atol=1e-4)


def test_flat_histogram(rng):
    h, w = 16, 20
    x, y, t, p, valid = make_soa(rng, h=h, w=w)
    got = voxelize_window_soa(x, y, t, p, valid, num_bins=5, height=h, width=w,
                              representation="histogram")
    assert got.shape[-1] == 2
    for i in range(x.shape[0]):
        ref = event_histogram(
            EventWindow.from_arrays(x[i], y[i], t[i], p[i], valid[i]),
            height=h, width=w)
        np.testing.assert_array_equal(
            np.asarray(got[i]), np.moveaxis(np.asarray(ref), 0, -1))


def test_flat_normalize(rng):
    h, w, bins = 16, 16, 5
    x, y, t, p, valid = make_soa(rng, h=h, w=w)
    got = voxelize_window_soa(x, y, t, p, valid, num_bins=bins, height=h,
                              width=w, normalize=True)
    g0 = np.asarray(got[0])
    nz = g0[g0 != 0]
    np.testing.assert_allclose(nz.mean(), 0.0, atol=1e-4)


def test_dense_wrapper_shape(rng):
    b, t_dim, n, h, w = 2, 3, 100, 12, 12
    events = np.zeros((b, t_dim, n, 4), np.float32)
    events[..., 0] = rng.integers(0, w, (b, t_dim, n))
    events[..., 1] = rng.integers(0, h, (b, t_dim, n))
    events[..., 2] = np.sort(rng.uniform(0, 100, (b, t_dim, n)), axis=-1)
    events[..., 3] = rng.integers(0, 2, (b, t_dim, n))
    valid = np.ones((b, t_dim, n), bool)
    out = voxelize_windows(jnp.asarray(events), jnp.asarray(valid),
                           num_bins=5, height=h, width=w)
    assert out.shape == (b, t_dim, h, w, 5)


def test_ev_segnet_representation(rng):
    """EV-SegNet 6-channel rep: per-polarity count / mean-t / std-t."""
    h, w = 12, 16
    x, y, t, p, valid = make_soa(rng, b=2, n=300, h=h, w=w,
                                 float_coords=False, with_pad=True)
    out = voxelize_window_soa(x, y, t, p, valid, num_bins=5, height=h,
                              width=w, representation="ev_segnet")
    assert out.shape == (2, h, w, 6)
    arr = np.asarray(out)
    # golden check per pixel on sample 0
    xs, ys = np.asarray(x[0]), np.asarray(y[0])
    ts, ps, vs = np.asarray(t[0]), np.asarray(p[0]), np.asarray(valid[0])
    tn = (ts - ts[vs].min()) / max(ts[vs].max() - ts[vs].min(), 1e-9)
    for (px, py) in [(3, 4), (0, 0), (int(xs[0]), int(ys[0]))]:
        for pol_i, pol_val in ((0, 1), (1, 0)):
            sel = vs & (xs.astype(int) == px) & (ys.astype(int) == py) & (
                (ps > 0) if pol_val else (ps <= 0))
            n_sel = sel.sum()
            np.testing.assert_allclose(arr[0, py, px, pol_i], n_sel, atol=1e-4)
            if n_sel:
                np.testing.assert_allclose(
                    arr[0, py, px, 2 + pol_i], tn[sel].mean(), atol=1e-4)
                np.testing.assert_allclose(
                    arr[0, py, px, 4 + pol_i], tn[sel].std(), atol=1e-3)
