"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a fake 8-device CPU mesh
(XLA's host-platform device-count override), the JAX-native stand-in for a
TPU slice. Must be set before jax initializes.
"""

import os

# Force CPU: the surrounding environment pins JAX_PLATFORMS=axon (a tunneled
# TPU); tests must run on the virtual 8-device CPU mesh. The axon plugin
# ignores the env var, so also force it through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Compilations in this environment have high fixed latency; cache them on disk
# so test reruns only pay it once per new program shape.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(6)
