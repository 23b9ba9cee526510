"""Data-parallel walks: walkers sharded across the mesh, graph replicated.

The first of the two scale-out strategies (SURVEY.md §2.8).  Because every
random draw is keyed on the *global* walker id (ops/common.walker_ids), the
sharded run produces bit-identical walks to the single-device run — XLA SPMD
partitions the per-walker gathers and no walker exchange is needed (each
device holds the whole graph).  Use this while the graph fits per-device HBM;
use parallel.partition for edge-partitioned graphs beyond that.

Routes through the fat-table engine (ops/fatwalk.py) when the graph carries
fat tables — the same hot path as single-chip walks.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.ops import fatwalk
from torch_random_walk_tpu.ops.fatwalk import FatMeta
from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr


def walk_data_parallel(graph: CSRGraph, target_nodes, mesh, p=1.0, q=1.0,
                       walk_length=10, seed=0, axis="data"):
    """Batched walks with walkers sharded along ``axis``; returns walks with
    the same sharding (leading dim over ``axis``)."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    targets = jax.device_put(target_nodes, shard)

    if graph.edge_tab is not None:
        meta = FatMeta.of(graph)
        edge_tab = jax.device_put(graph.edge_tab, repl)
        node_tab = jax.device_put(graph.node_tab, repl)
        if p == 1.0 and q == 1.0:
            fn = jax.jit(
                partial(fatwalk.uniform_walk_fat, meta=meta,
                        walk_length=walk_length, seed=seed),
                in_shardings=(repl, repl, shard),
                out_shardings=shard,
            )
            return fn(edge_tab, node_tab, targets)
        from torch_random_walk_tpu.ops.walk import edge_set_for, fat6_for

        es = edge_set_for(graph)
        hash_table = jax.device_put(es.table, repl)
        # Wide fat tables ride along (replicated) so the dp walk runs the
        # SAME freerun mixture engine — hence the same bitstream — as the
        # single-chip ops.walk.walk production path.  Passed as traced
        # arguments, never closed over (closure constants bake multi-GB
        # tables into the HLO).
        e6, n6 = fat6_for(graph)
        e6 = jax.device_put(e6, repl)
        n6 = jax.device_put(n6, repl)

        def biased(et, nt, ht, tg, f_e6, f_n6):
            return fatwalk.node2vec_walk_fat(
                et, nt, ht, tg, meta=meta, hash_log_size=es.log_size,
                hash_salt=es.salt, p=p, q=q, walk_length=walk_length,
                seed=seed, fat6=(f_e6, f_n6))

        fn = jax.jit(
            biased,
            in_shardings=(repl, repl, repl, shard, repl, repl),
            out_shardings=shard,
        )
        return fn(edge_tab, node_tab, hash_table, targets, e6, n6)

    row_ptr = jax.device_put(graph.row_ptr, repl)
    col_idx = jax.device_put(graph.col_idx, repl)
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
