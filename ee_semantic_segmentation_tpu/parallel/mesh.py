"""Mesh construction and sharding helpers (DP and DP x SP).

The model (~60 M params) fits comfortably in one chip's HBM, so the right
decomposition for batch workloads is pure DP over ICI (SURVEY.md §2).  For
full-resolution Cityscapes-shaped inputs (e.g. 2048x1024), where the
*activations* of even a single image exceed what a chip's HBM can hold at
training time, ``make_mesh_2d`` adds a 'space' axis: images are sharded
along H (PartitionSpec('data', 'space') on NHWC), and GSPMD inserts the
halo exchanges every conv/pool window needs at shard edges as
collective-permutes over ICI — no hand-written ring code, and the same
jitted step runs on any (dp, sp) factorization.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(devices=None, dp: int | None = None, sp: int = 1) -> Mesh:
    """('data', 'space') mesh: dp-way batch x sp-way image-height sharding.

    ``dp=None`` infers dp = n_devices // sp.  sp=1 degenerates to pure DP
    (with a trivial 'space' axis, so PartitionSpecs stay uniform)."""
    devices = list(devices) if devices is not None else jax.devices()
    if dp is None:
        if len(devices) % sp:
            raise ValueError(f"{len(devices)} devices not divisible by sp={sp}")
        dp = len(devices) // sp
    if dp * sp != len(devices):
        raise ValueError(f"dp*sp = {dp}*{sp} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(dp, sp), ("data", "space"))


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None, **dist_kwargs):
    """Multi-host bring-up: ``jax.distributed.initialize`` over DCN, then a
    global 1-D mesh over every chip in the job.  Per-host input sharding is
    handled by DataLoader(shard_by_process=True).

    Explicit coordinator args (or a detected cluster environment) mean the
    caller *intends* multi-host — failures then raise instead of silently
    degrading to single-host (a typo'd coordinator address must not train a
    different experiment).  With no args and no cluster env this is a
    single-host no-op.

    Extra ``dist_kwargs`` pass through to ``jax.distributed.initialize``
    (e.g. ``heartbeat_timeout_seconds`` — the 100 s default can starve on
    heavily oversubscribed hosts, see tools/multihost_smoke.py)."""
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
                **dist_kwargs,
            )
        except RuntimeError as e:
            if "already initialized" not in str(e).lower():
                raise
    return make_mesh()


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharded, everything else replicated."""
    return NamedSharding(mesh, P(axis))


def space_size(mesh: Mesh) -> int:
    """Size of the 'space' axis (1 when the mesh has no such axis)."""
    return int(mesh.shape["space"]) if "space" in mesh.shape else 1


def batch_space_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, ...) arrays: batch over 'data', image height over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


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

    n_sp = space_size(mesh)
    sp_sh = batch_space_sharding(mesh) if n_sp > 1 else None

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
        if sp_sh is not None and x.ndim >= 2 and x.shape[1] % n_sp == 0:
            return jax.device_put(x, sp_sh)
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))
