"""Pallas remote-DMA walker exchange (SURVEY.md §2.8's "async remote copy").

``pallas_all_to_all`` is a drop-in for ``lax.all_to_all`` on the routed
walker-exchange buffers of parallel/partition_v2.py: each shard's
per-destination outbox chunks are written *directly into the destination
shard's inbox* with ``pltpu.make_async_remote_copy`` — one RDMA per
destination, all in flight concurrently over ICI, no XLA collective
scheduling in between.  This is the hook for overlapping the exchange with
on-shard sampling (start the RDMAs, sample the local arrivals, then wait):
the kernel exposes the start/wait structure that XLA's all_to_all hides.

Validated in Pallas interpret mode on the virtual CPU mesh
(tests/test_pallas_exchange.py) and gated behind
``exchange="pallas"`` in the routed walk engines until multi-chip TPU
hardware is available to measure it (a single-chip dev environment cannot
exercise real ICI).

Reference context: the reference has no distributed layer at all
(SURVEY.md §2.8); this is the TPU-native equivalent of what NCCL alltoallv
would be in a CUDA port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _exchange_kernel(axis_name, num_shards, in_ref, out_ref, local_sem,
                     send_sems, recv_sems):
    my = jax.lax.axis_index(axis_name)

    # Local chunk: plain async copy outbox[my] -> inbox[my].
    local = pltpu.make_async_copy(in_ref.at[my], out_ref.at[my], local_sem)
    local.start()

    # Remote chunks: outbox[dst] -> (device dst) inbox[my].  All started
    # before any wait — the DMAs ride ICI concurrently; compute could be
    # inserted here to overlap (the routed engine's local sampling).
    rdmas = []
    for s in range(1, num_shards):
        dst = jax.lax.rem(my + s, num_shards)
        rdma = pltpu.make_async_remote_copy(
            src_ref=in_ref.at[dst],
            dst_ref=out_ref.at[my],
            send_sem=send_sems.at[s],
            recv_sem=recv_sems.at[s],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdmas.append(rdma)

    local.wait()
    for rdma in rdmas:
        # Waits our send completion AND the symmetric incoming copy (every
        # shard runs the same program, so recv_sems[s] is signalled by the
        # shard at distance -s writing into our inbox).
        rdma.wait()


def pallas_all_to_all(x, axis_name: str, num_shards: int,
                      interpret: bool = False):
    """All-to-all of per-destination chunks via direct remote DMA.

    x: per-shard (num_shards, C, R) array inside shard_map; chunk d goes to
    shard d.  Returns (num_shards, C, R) where row s holds what shard s
    sent here — identical semantics to
    ``lax.all_to_all(x, axis, split_axis=0, concat_axis=0, tiled=False)``.
    """
    kernel = functools.partial(_exchange_kernel, axis_name, num_shards)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       vma=frozenset({axis_name})),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((num_shards,)),
            pltpu.SemaphoreType.DMA((num_shards,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=0),
        interpret=interpret,
    )(x)
