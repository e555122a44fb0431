"""Data-parallel scale-out over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.10: no
torch.distributed / NCCL anywhere); multi-chip data parallelism is a new
first-class capability of this framework.

Design (the "How to Scale Your Model" recipe): pick a 1-D ``data`` mesh over
all chips, replicate parameters/optimizer state, shard every batch leaf on
its leading axis, and let GSPMD insert the gradient all-reduce inside the
jitted train step — collectives ride ICI, nothing changes in the step
function itself. Per-batch confusion matrices are computed on-device per
shard and summed by the same mechanism (ess_tpu.train.metrics).

Multi-host: ``jax.distributed.initialize`` + per-process batch slices feed
``jax.make_array_from_process_local_data``; the helpers below take the
global mesh either way.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = -1, axis: str = DATA_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (-1 = all).

    Raises when fewer devices exist than requested — a silently truncated
    mesh would "pass" multi-chip tests on one chip.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        if len(devs) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devs)} device(s) exist "
                f"(platform={devs[0].platform if devs else '?'}); set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N + "
                "JAX_PLATFORMS=cpu before jax initializes to fake a slice")
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params, optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Shard every array leaf of a batch pytree along its leading axis."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)
