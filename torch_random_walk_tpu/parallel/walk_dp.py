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


def walk_edge_list_data_parallel(graph, target_nodes, mesh, p=1.0, q=1.0,
                                 walk_length=10, seed=0, padding_idx=-1,
                                 restart=True, axis="data"):
    """Edge-list walks (padding/restart dead-end semantics) with walkers
    sharded along ``axis``; bit-identical to the single-device
    ops.walk.walk_edge_list for the same EdgeListGraph (global-walker-id
    threefry keys, same engine routing)."""
    from torch_random_walk_tpu.graph.edge_list import EdgeListGraph
    from torch_random_walk_tpu.ops.edge_list_walk import (
        biased_walk_edge_list,
        uniform_walk_edge_list,
    )

    assert isinstance(graph, EdgeListGraph)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    targets = jax.device_put(target_nodes, shard)

    if graph.edge_tab is not None:
        meta = FatMeta.of(graph)
        edge_tab = jax.device_put(graph.edge_tab, repl)
        node_tab = jax.device_put(graph.node_tab, repl)
        if p == 1.0 and q == 1.0:
            fn = jax.jit(
                partial(fatwalk.uniform_walk_edge_list_fat, meta=meta,
                        walk_length=walk_length, seed=seed,
                        padding_idx=padding_idx, restart=restart),
                in_shardings=(repl, repl, shard), out_shardings=shard,
            )
            return fn(edge_tab, node_tab, targets)
        from torch_random_walk_tpu.ops.walk import _edge_set_for_edge_list

        es = _edge_set_for_edge_list(graph)
        hash_table = jax.device_put(es.table, repl)

        def biased(et, nt, ht, tg):
            return fatwalk.node2vec_walk_edge_list_fat(
                et, nt, ht, tg, meta, es.log_size, es.salt, p, q,
                walk_length, seed, padding_idx, restart)

        fn = jax.jit(biased, in_shardings=(repl, repl, repl, shard),
                     out_shardings=shard)
        return fn(edge_tab, node_tab, hash_table, targets)

    edge_list = jax.device_put(graph.edge_list, repl)
    index = jax.device_put(graph.node_edge_index, repl)
    if p == 1.0 and q == 1.0:
        fn = jax.jit(
            partial(uniform_walk_edge_list, walk_length=walk_length,
                    seed=seed, padding_idx=padding_idx, restart=restart),
            in_shardings=(repl, repl, shard), out_shardings=shard,
        )
        return fn(edge_list, index, targets)
    fn = jax.jit(
        partial(biased_walk_edge_list, p=p, q=q, walk_length=walk_length,
                seed=seed, padding_idx=padding_idx, restart=restart,
                search_iters=graph.search_iters),
        in_shardings=(repl, repl, shard), out_shardings=shard,
    )
    return fn(edge_list, index, targets)


def walk_triples_data_parallel(graph, target_nodes, mesh, walk_length=10,
                               seed=0, padding_idx=-1, axis="data"):
    """KG-triples walks with walkers sharded along ``axis``; bit-identical
    to single-device ops.walk.walk_triples for the same TriplesGraph."""
    from torch_random_walk_tpu.graph.triples import TriplesGraph
    from torch_random_walk_tpu.ops.triples_walk import uniform_walk_triples

    assert isinstance(graph, TriplesGraph)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    targets = jax.device_put(target_nodes, shard)

    if graph.triple_tab is not None:
        tab = jax.device_put(graph.triple_tab, repl)
        meta = jax.device_put(graph.node_meta, repl)
        fn = jax.jit(
            partial(fatwalk.uniform_walk_triples_fat,
                    walk_length=walk_length, padding_idx=padding_idx,
                    seed=seed, num_entities=graph.num_entities,
                    num_triples=graph.num_triples),
            in_shardings=(repl, repl, shard), out_shardings=shard,
        )
        return fn(tab, meta, targets)
    triples = jax.device_put(graph.triples, repl)
    index = jax.device_put(graph.relation_tail_index, repl)
    fn = jax.jit(
        partial(uniform_walk_triples, walk_length=walk_length,
                padding_idx=padding_idx, restart=True, seed=seed),
        in_shardings=(repl, repl, shard), out_shardings=shard,
    )
    return fn(triples, index, targets)
