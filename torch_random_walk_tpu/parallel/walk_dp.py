"""Data-parallel walks: walkers sharded across the mesh, graph replicated.

The first of the two scale-out strategies (SURVEY.md §2.8).  Because every
random draw is keyed on the *global* walker id (ops/common.walker_ids), the
sharded run produces bit-identical walks to the single-device run — XLA SPMD
partitions the per-walker gathers and no walker exchange is needed (each
device holds the whole graph).  Use this while the graph fits per-device HBM;
use parallel.partition for edge-partitioned graphs beyond that.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr


def walk_data_parallel(graph: CSRGraph, target_nodes, mesh, p=1.0, q=1.0,
                       walk_length=10, seed=0, axis="data"):
    """Batched walks with walkers sharded along ``axis``; returns walks with
    the same sharding (leading dim over ``axis``)."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    row_ptr = jax.device_put(graph.row_ptr, repl)
    col_idx = jax.device_put(graph.col_idx, repl)
    targets = jax.device_put(target_nodes, shard)

    if p == 1.0 and q == 1.0:
        fn = jax.jit(
            partial(uniform_walk_csr, walk_length=walk_length, seed=seed),
            in_shardings=(repl, repl, shard),
            out_shardings=shard,
        )
        return fn(row_ptr, col_idx, targets)

    fn = jax.jit(
        partial(node2vec_walk_csr, p=p, q=q, walk_length=walk_length,
                seed=seed, search_iters=graph.search_iters),
        in_shardings=(repl, repl, shard),
        out_shardings=shard,
    )
    return fn(row_ptr, col_idx, targets)
