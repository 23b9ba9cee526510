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


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (walker/batch) dimension along ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
