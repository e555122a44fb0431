"""Data-parallel tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ess_tpu.parallel import batch_sharding, make_mesh, replicate, shard_batch
from ess_tpu.train import supervised as sup
from ess_tpu.train.builder import build_modules, init_state
from tests.test_train_steps import synthetic_batch, tiny_config, uda_batch
from ess_tpu.train import uda as uda_mod


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_supervised_dp_matches_single_device(rng):
    cfg = tiny_config()
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    batch = synthetic_batch(rng, b=8)
    step = sup.make_train_step(mods)

    # single-device result
    state_1, out_1 = step(jax.tree.map(jnp.copy, state), jax.tree.map(jnp.copy, batch))

    # 8-way DP: replicate state, shard batch — same jitted step
    mesh = make_mesh()
    state_dp = replicate(jax.tree.map(jnp.copy, state), mesh)
    batch_dp = shard_batch(batch, mesh)
    state_8, out_8 = step(state_dp, batch_dp)

    np.testing.assert_allclose(float(out_1["loss"]), float(out_8["loss"]), rtol=1e-5)
    a = np.asarray(state_1.back_params["logits"]["kernel"])
    b = np.asarray(state_8.back_params["logits"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_uda_dp_runs(rng):
    cfg = tiny_config(model_name="ess")
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    mesh = make_mesh()
    step = uda_mod.make_train_step(mods)
    state = replicate(state, mesh)
    batch = shard_batch(uda_batch(rng, b=8), mesh)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))


def test_eval_confusion_dp(rng):
    """Per-shard confusion matrices sum to the global matrix."""
    cfg = tiny_config()
    mods = build_modules(cfg)
    state = init_state(mods, jax.random.PRNGKey(0))
    ev = sup.make_eval_step(mods)
    batch = synthetic_batch(rng, b=8)

    out_1 = ev(state, batch)

    mesh = make_mesh()
    out_8 = ev(replicate(state, mesh), shard_batch(batch, mesh))
    np.testing.assert_allclose(np.asarray(out_1["cm"]), np.asarray(out_8["cm"]),
                               atol=1e-3)
