import networkx as nx
import numpy as np
import jax.numpy as jnp

import torch_random_walk_tpu as trw
from torch_random_walk_tpu.graph import oracle


def toy_directed_graph():
    g = nx.DiGraph()
    for e in [("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("D", "C"),
              ("E", "A"), ("E", "D")]:
        g.add_edge(*e)
    return trw.EdgeListGraph.from_networkx(g)


PAD = 5  # max node index + 1, as the reference tests pick it


def test_restart_walk_deterministic_deadend_pattern():
    """Node C (2) has no out-edges: with restart the walk must alternate
    C, pad, C, pad... exactly (rw_cpu_edge_list.cpp:100-122 semantics;
    matches the reference golden row test_rw_edge_list.py:53-57)."""
    g = toy_directed_graph()
    walks = trw.walk_edge_list(g, target_nodes=jnp.array([2], jnp.int32),
                               walk_length=6, seed=10, padding_idx=PAD,
                               restart=True)
    np.testing.assert_array_equal(np.asarray(walks), [[2, 5, 2, 5, 2, 5, 2]])


def test_no_restart_absorbs_into_padding():
    g = toy_directed_graph()
    walks = trw.walk_edge_list(g, target_nodes=jnp.array([2], jnp.int32),
                               walk_length=6, seed=10, padding_idx=PAD,
                               restart=False)
    np.testing.assert_array_equal(np.asarray(walks), [[2, 5, 5, 5, 5, 5, 5]])


def out_edges(g, v):
    idx = np.asarray(g.node_edge_index)
    el = np.asarray(g.edge_list)
    s, e = idx[v]
    if s == -1:
        return set()
    return set(el[s:e + 1, 1].tolist())


def test_transitions_valid_with_padding():
    g = toy_directed_graph()
    targets = jnp.tile(jnp.arange(5, dtype=jnp.int32), 50)
    walks = np.asarray(
        trw.walk_edge_list(g, target_nodes=targets, walk_length=8, seed=4,
                           padding_idx=PAD, restart=True)
    )
    for row in walks:
        start = row[0]
        for a, b in zip(row[:-1], row[1:]):
            if a == PAD:
                assert b == start  # restart at source
            elif len(out_edges(g, a)) == 0:
                assert b == PAD
            else:
                assert b in out_edges(g, a)


def test_uniform_edge_distribution_matches_oracle():
    g = toy_directed_graph()
    el = np.asarray(g.edge_list)
    idx = np.asarray(g.node_edge_index)
    num = 20000
    walks = np.asarray(
        trw.walk_edge_list(g, target_nodes=jnp.zeros(num, jnp.int32),
                           walk_length=6, seed=11, padding_idx=PAD,
                           restart=True)
    )
    for v in range(5):
        probs = oracle.uniform_edge_probs(el, idx, v, jump=0, padding_idx=PAD,
                                          num_nodes=5)
        mask = walks[:, :-1] == v
        nxt = walks[:, 1:][mask]
        if nxt.size < 1500:
            continue
        emp = np.bincount(nxt, minlength=6) / nxt.size
        np.testing.assert_allclose(emp, probs, atol=0.02)


def test_biased_edge_distribution_matches_oracle():
    g = toy_directed_graph()
    el = np.asarray(g.edge_list)
    idx = np.asarray(g.node_edge_index)
    p, q = 0.5, 2.0
    num = 30000
    walks = np.asarray(
        trw.walk_edge_list(g, target_nodes=jnp.zeros(num, jnp.int32), p=p,
                           q=q, walk_length=5, seed=21, padding_idx=PAD,
                           restart=True)
    )
    pooled: dict = {}
    for s in range(2, walks.shape[1]):
        for t, v, x in zip(walks[:, s - 2], walks[:, s - 1], walks[:, s]):
            pooled.setdefault((t, v), []).append(x)
    checked = 0
    for (t, v), nxts in pooled.items():
        if len(nxts) < 3000:
            continue
        emp = np.bincount(nxts, minlength=6) / len(nxts)
        # jump is the walk's start node (0 for every walker here).
        probs = oracle.biased_edge_probs(el, idx, t, v, p, q, jump=0,
                                         padding_idx=PAD, num_nodes=5)
        np.testing.assert_allclose(emp, probs, atol=0.03)
        checked += 1
    assert checked >= 3


def test_biased_restart_false_shape():
    g = toy_directed_graph()
    walks = trw.walk_edge_list(g, target_nodes=jnp.arange(5, dtype=jnp.int32),
                               p=2.0, q=0.5, walk_length=6, seed=1,
                               padding_idx=PAD, restart=False)
    assert walks.shape == (5, 7)
