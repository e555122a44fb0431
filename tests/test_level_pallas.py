"""Parity tests for the fused encoder-level kernel (ops/level_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ess_tpu.ops.conv_s2d import space_to_depth
from ess_tpu.ops.level_pallas import encoder_level_int8, encoder_level_ref


def _level_data(b=2, ho=8, wo=16, cin=6, ch=8, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(b, 2 * ho, 2 * wo, cin))
                    .astype(np.float32))
    h = jnp.tanh(jnp.asarray(rng.normal(size=(b, ho, wo, ch))
                             .astype(np.float32)))
    c = jnp.asarray(rng.normal(size=(b, ho, wo, ch)).astype(np.float32)) * 0.5
    ek = jnp.asarray(rng.normal(size=(5, 5, cin, ch)).astype(np.float32)
                     / np.sqrt(25 * cin))
    eb = jnp.asarray(rng.normal(size=(ch,)).astype(np.float32) * 0.1)
    gk = jnp.asarray(rng.normal(size=(3, 3, 2 * ch, 4 * ch))
                     .astype(np.float32) / np.sqrt(9 * 2 * ch))
    gb = jnp.asarray(rng.normal(size=(4 * ch,)).astype(np.float32) * 0.05)
    return u, h, c, ek, eb, gk, gb


def _check(h, c, h_ref, c_ref, tol_h=0.06, tol_c=0.12):
    dh = float(jnp.max(jnp.abs(h.astype(jnp.float32)
                               - h_ref.astype(jnp.float32))))
    dc = float(jnp.max(jnp.abs(c.astype(jnp.float32)
                               - c_ref.astype(jnp.float32))))
    assert dh < tol_h, dh
    assert dc < tol_c, dc
    mh = float(jnp.mean(jnp.abs(h.astype(jnp.float32)
                                - h_ref.astype(jnp.float32))))
    assert mh < 5e-3, mh


@pytest.mark.parametrize("seed", [0, 1])
def test_full_res_input_parity(seed):
    u, h, c, ek, eb, gk, gb = _level_data(seed=seed)
    h_ref, c_ref = encoder_level_ref(u, h, c, ek, eb, gk, gb, u_s2d=False)
    out = encoder_level_int8(u, (h, c), ek, eb, gk, gb,
                             u_s2d=False, interpret=True)
    assert out is not None
    h2, (_, c2) = out
    _check(h2, c2, h_ref, c_ref)


def test_s2d_input_parity():
    u, h, c, ek, eb, gk, gb = _level_data(seed=2)
    u2 = space_to_depth(u)
    h_ref, c_ref = encoder_level_ref(u2, h, c, ek, eb, gk, gb, u_s2d=True)
    # the s2d path must equal the full-res reference too
    h_ref2, c_ref2 = encoder_level_ref(u, h, c, ek, eb, gk, gb, u_s2d=False)
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_ref2),
                               atol=1e-5)
    out = encoder_level_int8(u2, (h, c), ek, eb, gk, gb,
                             u_s2d=True, interpret=True)
    assert out is not None
    h2, (_, c2) = out
    _check(h2, c2, h_ref, c_ref)


def test_zero_state_first_window():
    u, h, c, ek, eb, gk, gb = _level_data(seed=3)
    z = jnp.zeros_like(h)
    h_ref, c_ref = encoder_level_ref(u, z, z, ek, eb, gk, gb, u_s2d=False)
    out = encoder_level_int8(u, (z, z), ek, eb, gk, gb,
                             u_s2d=False, interpret=True)
    h2, (_, c2) = out
    _check(h2, c2, h_ref, c_ref)


def test_geometry_fallback():
    # odd input height -> kernel refuses, caller falls back
    u, h, c, ek, eb, gk, gb = _level_data(ho=7, seed=4)
    u = u[:, :13]   # 13 != 2 * 7
    assert encoder_level_int8(u, (h, c), ek, eb, gk, gb,
                              u_s2d=False, interpret=True) is None


def test_gradients_flow_via_ref():
    # the custom_vjp recomputes through the exact XLA reference chain, so
    # given the SAME upstream cotangent the vjp must match the reference's
    # (the forward outputs differ by int8 noise, which is tested above)
    u, h, c, ek, eb, gk, gb = _level_data(seed=5)

    def f_fused(ek, gk):
        h2, (_, c2) = encoder_level_int8(u, (h, c), ek, eb, gk, gb,
                                         u_s2d=False, interpret=True)
        return h2, c2

    def f_ref(ek, gk):
        return encoder_level_ref(u, h, c, ek, eb, gk, gb, u_s2d=False)

    _, vjp1 = jax.vjp(f_fused, ek, gk)
    _, vjp2 = jax.vjp(f_ref, ek, gk)
    ct = (jnp.ones_like(h), jnp.full_like(c, 0.5))
    for a, b in zip(vjp1(ct), vjp2(ct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
