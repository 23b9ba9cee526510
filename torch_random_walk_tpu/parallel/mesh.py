"""Device-mesh helpers.

The TPU-native communication layer (SURVEY.md §2.8): no NCCL/MPI — scaling is
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives riding ICI/DCN.
Multi-host bootstrap is ``jax.distributed.initialize`` (call before mesh
creation on pods; a no-op need not be called single-host).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("data",), devices=None) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default: 1-D 'data' mesh over every addressable device — the natural
    layout for walker-parallel sampling.  Pass shape=(dp, tp),
    axis_names=('data', 'model') for trainer runs that also shard tables.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    # Auto axis types: let the partitioner propagate shardings through the
    # per-walker gathers (Explicit mode would demand out_sharding on every
    # indexing op).
    axis_types = (jax.sharding.AxisType.Auto,) * len(axis_names)
    return jax.make_mesh(shape, axis_names, devices=devices,
                         axis_types=axis_types)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bootstrap (SURVEY.md §2.8: the TPU-native replacement for
    the reference's absent NCCL/MPI layer).  On TPU pods with default env
    configuration all arguments auto-detect; call before building a mesh.
    No-op if the distributed runtime is already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as err:
        if "already" not in str(err).lower():
            raise


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (walker/batch) dimension along ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
