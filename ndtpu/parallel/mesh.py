"""Mesh construction and sharding helpers.

Replaces the reference's nonexistent distributed backend (no NCCL/MPI/any —
SURVEY.md §2.3) with the TPU-native recipe: `jax.distributed.initialize`
per host, one Mesh over all chips, NamedSharding annotations, XLA
collectives over ICI/DCN. No user-visible backend code.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host init; a no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Mesh over all (or given) devices. Default: 1-D data mesh."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(tuple(shape)), tuple(axes))


def make_data_mesh(batch_size: int, axis: str = "data",
                   devices=None) -> Mesh:
    """1-D data mesh over the largest device count that divides the batch
    (a 2-cloud debug batch on an 8-chip host shouldn't crash the trainer)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_with_sharding(tree, sh: NamedSharding):
    """Place a pytree of host arrays with sharding `sh`. Multi-process:
    each leaf is this process's local shard of the global array (for a
    replicated sharding, the full array — identical on every host) and the
    global jax.Array is assembled via make_array_from_process_local_data."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree of host batches with dim 0 sharded over `axis`
    (multi-process: each host contributes its local slice)."""
    return put_with_sharding(tree, batch_sharding(mesh, axis))


def replicate(mesh: Mesh, tree):
    return put_with_sharding(tree, replicated(mesh))
