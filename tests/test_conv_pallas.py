"""Parity test for the Pallas patch-conv kernel (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl


def test_head_conv_pallas_parity(rng, monkeypatch):
    import ess_tpu.ops.conv_pallas as CP

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)

    x = jnp.asarray(rng.normal(size=(2, 24, 96, 5)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(5, 5, 5, 32)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    got = CP.head_conv_pallas(x, w, b)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
