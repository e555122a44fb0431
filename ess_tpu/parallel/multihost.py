"""Multi-host / multi-slice initialization and cross-host utilities.

New capability vs the strictly single-GPU reference (SURVEY.md section
2.10): multi-controller SPMD over TPU pods. Within a slice, collectives ride
ICI; across slices, DCN — all inserted by GSPMD from the shardings set up in
ess_tpu.parallel.dp.

Usage (one process per host, e.g. under the TPU VM runtime):

    from ess_tpu.parallel import multihost
    multihost.initialize()              # jax.distributed handshake
    mesh = make_mesh()                  # global devices
    batch = multihost.global_batch_from_local(local_batch, mesh)
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-based autodetection.

    No-op on single-process setups (cloud TPU runtimes autodetect)."""
    import jax

    # NB: must not touch the backend (jax.process_count/jax.devices) before
    # the handshake — backend init pins single-process mode.
    # jax.distributed.is_initialized() probes the client without it.
    if jax.distributed.is_initialized():
        return  # already initialized
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        if explicit:
            # the caller asked for a specific topology: failing to join it
            # must not silently degrade to single-host training
            raise
        # env autodetection found nothing: proceed single-host
        pass


def process_shard() -> tuple[int, int]:
    """(shard_index, num_shards) for the host data loader — each process
    reads a disjoint slice of the dataset (ess_tpu.data.loader.BatchLoader
    shard_index/num_shards)."""
    import jax

    return jax.process_index(), jax.process_count()


def global_batch_from_local(local_batch: Any, mesh, axis: str = "data") -> Any:
    """Assemble a globally-sharded batch from per-process local arrays.

    Each process passes its local slice (global_batch / process_count rows);
    the result is one jax.Array per leaf sharded over the global mesh.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, local_batch)


def all_reduce_host(value: np.ndarray) -> np.ndarray:
    """Sum a small host-side array (e.g. a confusion matrix) across
    processes via a tiny on-device psum."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(value).sum(axis=0))
