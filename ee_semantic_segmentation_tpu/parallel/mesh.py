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
    handled by DataLoader(shard_by_process=True).

    Explicit coordinator args (or a detected cluster environment) mean the
    caller *intends* multi-host — failures then raise instead of silently
    degrading to single-host (a typo'd coordinator address must not train a
    different experiment).  With no args and no cluster env this is a
    single-host no-op."""
    import os

    explicit = any(
        a is not None for a in (coordinator_address, num_processes, process_id)
    )
    # NOTE: TPU_WORKER_HOSTNAMES deliberately NOT used as a signal — this
    # image sets it to "localhost" even for a single-host tunnel setup.
    cluster_env = any(
        k in os.environ
        for k in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
        )
    )
    if explicit or cluster_env:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            if "already initialized" not in str(e).lower():
                raise
    return make_mesh()


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharded, everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_UNEVEN_WARNED: set = set()


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Host numpy batch -> device arrays sharded along the batch dim.

    A leading dim that does not divide the mesh size cannot be batch-sharded;
    such arrays are replicated instead (correct but redundant) with a one-time
    warning telling the user to pick a divisible batch size."""
    sh = data_sharding(mesh, axis)
    n = int(mesh.shape[axis])

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        if x.shape[0] % n != 0:
            key = (x.shape[0], n)
            if key not in _UNEVEN_WARNED:
                _UNEVEN_WARNED.add(key)
                import warnings

                warnings.warn(
                    f"batch size {x.shape[0]} is not divisible by the "
                    f"{n}-device '{axis}' mesh — replicating instead of "
                    "sharding (correct but wastes devices); use a batch size "
                    f"that is a multiple of {n}",
                    stacklevel=3,
                )
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))
