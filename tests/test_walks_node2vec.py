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


def test_shape_and_validity():
    csr = toy_csr()
    targets = jnp.arange(5, dtype=jnp.int32)
    walks = trw.walk(csr, target_nodes=targets, p=0.5, q=2.0, walk_length=8,
                     seed=7)
    assert walks.shape == (5, 9)
    w = np.asarray(walks)
    np.testing.assert_array_equal(w[:, 0], np.arange(5))
    for row in w:
        for a, b in zip(row[:-1], row[1:]):
            assert b in neighbors(csr, a)


def test_node2vec_distribution_matches_oracle():
    """Empirical P(next | t, v) must match the exact node2vec law for every
    observed state pair — SURVEY.md §7 hard part 1's correctness criterion."""
    csr = toy_csr()
    rp, ci = np.asarray(csr.row_ptr), np.asarray(csr.col_idx)
    p, q = 0.5, 2.0
    num = 30000
    walks = np.asarray(
        trw.walk(csr, target_nodes=jnp.zeros(num, jnp.int32), p=p, q=q,
                 walk_length=5, seed=99)
    )
    # Pool transitions keyed by (t, v) across steps >= 2.
    pooled: dict = {}
    for s in range(2, walks.shape[1]):
        for t, v, x in zip(walks[:, s - 2], walks[:, s - 1], walks[:, s]):
            pooled.setdefault((t, v), []).append(x)
    checked = 0
    for (t, v), nxts in pooled.items():
        if len(nxts) < 2000:
            continue
        emp = np.bincount(nxts, minlength=5) / len(nxts)
        probs = oracle.node2vec_csr_probs(rp, ci, t, v, p, q, 5)
        np.testing.assert_allclose(emp, probs, atol=0.03)
        checked += 1
    assert checked >= 5, f"only {checked} state pairs had enough samples"


def test_p_q_one_equals_uniform_dispatch():
    """walk() dispatch contract: p==q==1.0 routes to the uniform kernel
    (rw_init.cpp:20-24 / rw_cpu.cpp:220-224)."""
    csr = toy_csr()
    targets = jnp.arange(5, dtype=jnp.int32)
    w_uni = trw.walk(csr, target_nodes=targets, p=1.0, q=1.0, walk_length=6,
                     seed=10)
    w_direct = trw.ops.uniform_walk_csr(csr.row_ptr, csr.col_idx, targets, 6,
                                        10)
    np.testing.assert_array_equal(np.asarray(w_uni), np.asarray(w_direct))


def test_extreme_pq_biases_behaviour():
    """p -> 0 makes the walk bounce back; q -> 0 pushes it outward."""
    csr = toy_csr()
    num = 4000
    wb = np.asarray(
        trw.walk(csr, target_nodes=jnp.zeros(num, jnp.int32), p=0.01, q=100.0,
                 walk_length=4, seed=5)
    )
    # With p tiny and q huge, step 2 should overwhelmingly return to start.
    back = (wb[:, 2] == wb[:, 0]).mean()
    assert back > 0.9, f"expected bounce-back, got {back}"
