import networkx as nx
import numpy as np
import jax.numpy as jnp

import torch_random_walk_tpu as trw
from torch_random_walk_tpu.graph import oracle


def toy_csr():
    g = nx.Graph()
    for e in [("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("D", "C"),
              ("E", "A"), ("E", "D")]:
        g.add_edge(*e)
    return trw.CSRGraph.from_networkx(g)


def neighbors(csr, v):
    rp, ci = np.asarray(csr.row_ptr), np.asarray(csr.col_idx)
    return set(ci[rp[v]:rp[v + 1]].tolist())


def test_shape_and_start_nodes():
    csr = toy_csr()
    targets = jnp.arange(5, dtype=jnp.int32)
    walks = trw.walk(csr, target_nodes=targets, p=1.0, q=1.0, walk_length=6,
                     seed=10)
    assert walks.shape == (5, 7)  # (N, L+1) contract, rw_cpu.cpp:216-217
    np.testing.assert_array_equal(np.asarray(walks[:, 0]), np.arange(5))


def test_transitions_are_edges():
    csr = toy_csr()
    targets = jnp.tile(jnp.arange(5, dtype=jnp.int32), 20)
    walks = np.asarray(trw.walk(csr, target_nodes=targets, walk_length=10,
                                seed=3))
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            assert b in neighbors(csr, a), f"{a}->{b} is not an edge"


def test_deterministic_per_seed():
    csr = toy_csr()
    targets = jnp.arange(5, dtype=jnp.int32)
    w1 = trw.walk(csr, target_nodes=targets, walk_length=6, seed=10)
    w2 = trw.walk(csr, target_nodes=targets, walk_length=6, seed=10)
    w3 = trw.walk(csr, target_nodes=targets, walk_length=6, seed=11)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert np.any(np.asarray(w1) != np.asarray(w3))


def test_degree_zero_stays_put():
    # Node 2 has no edges at all.
    csr = trw.CSRGraph.from_edges(np.array([0]), np.array([1]), num_nodes=3,
                                  symmetrize=True)
    walks = trw.walk(csr, target_nodes=jnp.array([2], jnp.int32),
                     walk_length=4, seed=0)
    np.testing.assert_array_equal(np.asarray(walks), [[2, 2, 2, 2, 2]])


def test_uniform_distribution_matches_oracle():
    """Per-step transition distributions allclose vs the exact oracle — the
    north-star parity criterion (BASELINE.json)."""
    csr = toy_csr()
    rp, ci = np.asarray(csr.row_ptr), np.asarray(csr.col_idx)
    num = 20000
    targets = jnp.zeros(num, jnp.int32)
    walks = np.asarray(trw.walk(csr, target_nodes=targets, walk_length=6,
                                seed=123))
    # Pool transitions by current node; compare to uniform over neighbors.
    for v in range(5):
        probs = oracle.uniform_csr_probs(rp, ci, v, 5)
        mask = walks[:, :-1] == v
        nxt = walks[:, 1:][mask]
        assert nxt.size > 1000
        emp = np.bincount(nxt, minlength=5) / nxt.size
        np.testing.assert_allclose(emp, probs, atol=0.02)


def test_parallel_edges_weight_transitions():
    """Multigraph semantics (reference samples edge SLOTS uniformly, so a
    doubled edge doubles its transition probability — rw_cpu.cpp:7-30)."""
    # Node 0 has edges: 0->1 (x3), 0->2 (x1).
    src = np.array([0, 0, 0, 0, 1, 2])
    dst = np.array([1, 1, 1, 2, 0, 0])
    csr = trw.CSRGraph.from_edges(src, dst, num_nodes=3)
    targets = jnp.zeros(4000, jnp.int32)
    walks = np.asarray(trw.walk(csr, target_nodes=targets, walk_length=1,
                                seed=123))
    frac_to_1 = (walks[:, 1] == 1).mean()
    assert 0.70 < frac_to_1 < 0.80, f"expected ~0.75, got {frac_to_1}"
