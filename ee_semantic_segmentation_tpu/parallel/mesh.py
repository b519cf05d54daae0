"""Mesh construction and sharding helpers (1-D data parallelism).

The model (~60 M params) fits comfortably in one chip's HBM, so the right
decomposition for this workload is pure DP over ICI (SURVEY.md §2); the
helpers still go through ``jax.sharding`` so wider meshes (e.g. ('data',
'model')) slot in without touching call sites.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up: ``jax.distributed.initialize`` over DCN, then a
    global 1-D mesh over every chip in the job.  Per-host input sharding is
    handled by DataLoader(shard_by_process=True).  No-op when single-host
    args are absent and no cluster env is detected."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        pass  # single-host / already initialized
    return make_mesh()


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharded, everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Host numpy batch -> device arrays sharded along the batch dim."""
    sh = data_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))
