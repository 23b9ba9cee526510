"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py)."""

import networkx as nx
import numpy as np
import jax
import jax.numpy as jnp

import torch_random_walk_tpu as trw
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
from torch_random_walk_tpu.parallel import (
    PartitionedCSR,
    make_mesh,
    walk_data_parallel,
    walk_partitioned,
)


def toy_csr():
    g = nx.Graph()
    for e in [("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("D", "C"),
              ("E", "A"), ("E", "D")]:
        g.add_edge(*e)
    return trw.CSRGraph.from_networkx(g)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_bitwise_matches_single_device():
    csr = toy_csr()
    mesh = make_mesh()
    targets = jnp.tile(jnp.arange(5, dtype=jnp.int32), 16)  # 80 walkers
    dp = walk_data_parallel(csr, targets, mesh, walk_length=12, seed=42)
    single = uniform_walk_csr(csr.row_ptr, csr.col_idx, targets, 12, 42)
    np.testing.assert_array_equal(np.asarray(dp), np.asarray(single))


def test_data_parallel_biased_matches_single_device():
    """dp biased walks must equal the PRODUCTION single-chip path — the
    public walk(CSRGraph, ...), i.e. the freerun mixture engine — not just
    some engine: the claim is that sharding never changes the bitstream."""
    csr = toy_csr()
    mesh = make_mesh()
    targets = jnp.tile(jnp.arange(5, dtype=jnp.int32), 16)
    dp = walk_data_parallel(csr, targets, mesh, p=0.5, q=2.0, walk_length=8,
                            seed=7)
    single = trw.walk(csr, target_nodes=targets, p=0.5, q=2.0, walk_length=8,
                      seed=7)
    np.testing.assert_array_equal(np.asarray(dp), np.asarray(single))


def test_partitioned_graph_bitwise_matches_single_device():
    """Edge-partitioned walk (graph sharded over 8 devices) must reproduce the
    single-device bitstream exactly — SURVEY.md §7 hard part 4."""
    csr = toy_csr()
    mesh = make_mesh()
    pg = PartitionedCSR.from_csr(csr, num_shards=8)
    targets = jnp.tile(jnp.arange(5, dtype=jnp.int32), 16)  # 80 = 8 * 10
    part = walk_partitioned(pg, targets, mesh, walk_length=12, seed=42)
    single = uniform_walk_csr(csr.row_ptr, csr.col_idx, targets, 12, 42)
    np.testing.assert_array_equal(np.asarray(part), np.asarray(single))


def test_partitioned_on_larger_graph():
    rng = np.random.RandomState(0)
    n, deg = 64, 6
    src = np.repeat(np.arange(n), deg)
    dst = rng.randint(0, n, size=n * deg)
    csr = trw.CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)
    mesh = make_mesh()
    pg = PartitionedCSR.from_csr(csr, num_shards=8)
    targets = jnp.arange(64, dtype=jnp.int32)
    part = walk_partitioned(pg, targets, mesh, walk_length=10, seed=5)
    single = uniform_walk_csr(csr.row_ptr, csr.col_idx, targets, 10, 5)
    np.testing.assert_array_equal(np.asarray(part), np.asarray(single))


def test_partitioned_node2vec_bitwise_matches_single_device():
    from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
    from torch_random_walk_tpu.parallel.partition import (
        build_partition_hashes,
        walk_partitioned_node2vec,
    )

    rng = np.random.default_rng(5)
    n = 64
    src = np.concatenate([np.arange(n), rng.integers(0, n, 3 * n)])
    dst = np.concatenate([(np.arange(n) + 1) % n, rng.integers(0, n, 3 * n)])
    csr = trw.CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)
    mesh = make_mesh()
    pg = PartitionedCSR.from_csr(csr, num_shards=8)
    hashes = build_partition_hashes(pg, csr)
    targets = jnp.arange(40, dtype=jnp.int32) % n
    part = walk_partitioned_node2vec(pg, hashes, targets, mesh, p=0.5, q=2.0,
                                     walk_length=9, seed=17)
    single = node2vec_walk_csr(csr.row_ptr, csr.col_idx, targets, 0.5, 2.0, 9,
                               seed=17, search_iters=csr.search_iters)
    np.testing.assert_array_equal(np.asarray(part), np.asarray(single))


def test_dp_edge_list_bitwise_matches_single_device():
    """The edge-list family's dp walks equal the public single-device
    walk_edge_list (both engines: fat-table and jnp), uniform AND biased,
    restart AND absorbing."""
    from torch_random_walk_tpu.parallel import walk_edge_list_data_parallel

    g = nx.DiGraph()
    g.add_edges_from([(0, 1), (1, 2), (2, 3), (0, 2), (3, 0), (2, 4)])
    # Node 4 dead-ends -> exercises padding/restart.
    el = trw.to_edge_list_indexed(g)
    graph = trw.EdgeListGraph.from_arrays(el[0] if isinstance(el, tuple)
                                          else el, num_nodes=5)
    mesh = make_mesh()
    targets = jnp.tile(jnp.arange(5, dtype=jnp.int32), 16)
    for p, q in [(1.0, 1.0), (0.5, 2.0)]:
        for restart in (True, False):
            dp = walk_edge_list_data_parallel(
                graph, targets, mesh, p=p, q=q, walk_length=9, seed=13,
                padding_idx=5, restart=restart)
            single = trw.walk_edge_list(graph, target_nodes=targets, p=p,
                                        q=q, walk_length=9, seed=13,
                                        padding_idx=5, restart=restart)
            np.testing.assert_array_equal(np.asarray(dp), np.asarray(single))


def test_dp_triples_bitwise_matches_single_device():
    from torch_random_walk_tpu.parallel import walk_triples_data_parallel

    triples = np.array([(0, 5, 1), (1, 6, 3), (0, 5, 2), (2, 6, 4),
                        (2, 7, 1), (0, 6, 3), (3, 7, 0), (3, 6, 2)])
    graph = trw.TriplesGraph.from_arrays(triples, num_entities=5)
    mesh = make_mesh()
    targets = jnp.tile(jnp.arange(5, dtype=jnp.int32), 16)
    dp = walk_triples_data_parallel(graph, targets, mesh, walk_length=6,
                                    seed=20, padding_idx=8)
    single = trw.walk_triples(graph, target_nodes=targets, walk_length=6,
                              padding_idx=8, seed=20)
    np.testing.assert_array_equal(np.asarray(dp), np.asarray(single))
