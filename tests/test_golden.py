"""Golden-value regression tests (the reference's test style, SURVEY.md §4).

These pin the framework's OWN deterministic bitstreams — fixed seed, fixed
tiny graphs, hard-coded expected tensors — so refactors of the engines (fat
paths, compaction, native builders) cannot silently change outputs.  The
values were captured from the verified round-1 implementation, whose
distributions are oracle-checked in the test_walks_* suites and whose
engines are cross-checked bit-identical (CPU == TPU == sharded ==
partitioned).
"""

import networkx as nx
import numpy as np
import jax.numpy as jnp

import torch_random_walk_tpu as trw


def toy_csr():
    g = nx.Graph()
    for e in [("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("D", "C"),
              ("E", "A"), ("E", "D")]:
        g.add_edge(*e)
    return trw.CSRGraph.from_networkx(g)


def test_golden_uniform_walk():
    walks = trw.walk(toy_csr(), target_nodes=jnp.arange(5, dtype=jnp.int32),
                     walk_length=6, seed=10)
    expected = [[0, 1, 2, 0, 1, 0, 4], [1, 0, 4, 3, 4, 0, 2],
                [2, 0, 1, 0, 2, 1, 0], [3, 1, 2, 3, 1, 0, 2],
                [4, 0, 4, 0, 1, 0, 4]]
    np.testing.assert_array_equal(np.asarray(walks), expected)


def test_golden_node2vec_walk():
    """Pins the CSRGraph-path bitstream: the freerun MIXTURE sampler at
    every batch size (regenerated when dispatch unified the graph entry
    point on one sampler family; verified equal to the jnp
    node2vec_walk_csr_mixture reference, whose law is oracle-checked in
    test_fatwalk.TestMixtureSampler)."""
    walks = trw.walk(toy_csr(), target_nodes=jnp.arange(5, dtype=jnp.int32),
                     p=0.5, q=2.0, walk_length=6, seed=10)
    expected = [[0, 1, 0, 1, 0, 1, 0], [1, 3, 2, 0, 2, 1, 2],
                [2, 3, 2, 3, 2, 3, 4], [3, 4, 3, 4, 3, 4, 3],
                [4, 0, 4, 3, 4, 3, 2]]
    np.testing.assert_array_equal(np.asarray(walks), expected)


def test_golden_node2vec_walk_raw_arrays():
    """Pins the raw-array-path bitstream: the reference-shaped rejection
    sampler (unchanged from round 1 — these are the values the round-1
    graph path produced)."""
    g = toy_csr()
    walks = trw.walk(g.row_ptr, g.col_idx, jnp.arange(5, dtype=jnp.int32),
                     p=0.5, q=2.0, walk_length=6, seed=10)
    expected = [[0, 1, 0, 1, 0, 2, 1], [1, 3, 2, 3, 1, 2, 1],
                [2, 3, 1, 3, 1, 3, 1], [3, 4, 3, 4, 0, 4, 0],
                [4, 0, 1, 0, 2, 0, 2]]
    np.testing.assert_array_equal(np.asarray(walks), expected)


def test_golden_edge_list_walks():
    el = trw.EdgeListGraph.from_arrays(
        np.array([[0, 1], [1, 2], [2, 3], [3, 0], [1, 3]]), num_nodes=5)
    targets = jnp.asarray([0, 4], jnp.int32)
    restart = trw.walk_edge_list(el, target_nodes=targets, walk_length=5,
                                 seed=2, padding_idx=-1, restart=True)
    np.testing.assert_array_equal(
        np.asarray(restart),
        [[0, 1, 3, 0, 1, 3], [4, -1, 4, -1, 4, -1]])
    absorbing = trw.walk_edge_list(el, target_nodes=targets, walk_length=5,
                                   seed=2, padding_idx=-1, restart=False)
    np.testing.assert_array_equal(
        np.asarray(absorbing),
        [[0, 1, 3, 0, 1, 3], [4, -1, -1, -1, -1, -1]])


def test_golden_triples_walk():
    tg = trw.TriplesGraph.from_arrays(
        np.array([[0, 7, 1], [1, 8, 2], [2, 9, 0], [0, 7, 2]]),
        num_entities=4)
    walks = trw.walk_triples(tg, target_nodes=jnp.asarray([0, 1, 3], jnp.int32),
                             walk_length=3, seed=5, padding_idx=-1)
    np.testing.assert_array_equal(
        np.asarray(walks),
        [[0, 7, 2, 9, 0, 7, 2], [1, 8, 2, 9, 0, 7, 2],
         [3, -1, -1, -1, -1, -1, -1]])


def test_golden_windows():
    walks = jnp.asarray(np.arange(12).reshape(2, 6) % 9, jnp.int32)
    tgt, pos, neg = trw.to_windows(walks, 3, 9, seed=4)
    np.testing.assert_array_equal(np.asarray(tgt), [1, 2, 3, 4, 7, 8, 0, 1])
    np.testing.assert_array_equal(
        np.asarray(pos),
        [[0, 2], [1, 3], [2, 4], [3, 5], [6, 8], [7, 0], [8, 1], [0, 2]])
    np.testing.assert_array_equal(
        np.asarray(neg),
        [[2, 5], [5, 4], [0, 8], [6, 8], [3, 0], [2, 4], [5, 0], [7, 3]])
