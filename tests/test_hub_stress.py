"""Hub-node stress tests (VERDICT r1 item 8).

node2vec on a graph with a >= 2^14-degree hub — the regime the cuckoo edge
set (O(1) degree-independent distance-1 test) and banded acceptance were
built for.  Checks two things the toy-graph suites cannot:

1. fat engine == jnp reference bit-for-bit at a batch size that engages the
   hierarchical / speculative production branches, on a hub graph;
2. the empirical transition law out of hub states matches the exact node2vec
   law (class-aggregated: return-to-t / neighbor-of-t / distance-2), computed
   directly from the reference's acceptance weights
   (/root/reference/csrc/cpu/rw_cpu.cpp:129-134).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.ops import fatwalk
from torch_random_walk_tpu.ops.fatwalk import FatMeta
from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
from torch_random_walk_tpu.ops.walk import edge_set_for

HUB = 0
HUB_DEG = 1 << 14


def hub_graph(n=20_000, seed=0):
    """Undirected: hub 0 -- {1..2^14}, plus a ring and random background
    edges so non-hub nodes have degree ~6 and no dead ends exist."""
    rng = np.random.default_rng(seed)
    spokes = np.arange(1, HUB_DEG + 1, dtype=np.int64)
    hub_src = np.concatenate([np.zeros(HUB_DEG, np.int64), spokes])
    hub_dst = np.concatenate([spokes, np.zeros(HUB_DEG, np.int64)])
    ring = np.arange(1, n, dtype=np.int64)
    ring_next = np.where(ring + 1 < n, ring + 1, 1)
    bg_src = rng.integers(1, n, 2 * n)
    bg_dst = rng.integers(1, n, 2 * n)
    src = np.concatenate([hub_src, ring, ring_next, bg_src, bg_dst])
    dst = np.concatenate([hub_dst, ring_next, ring, bg_dst, bg_src])
    return CSRGraph.from_edges(src, dst, num_nodes=n)


@pytest.fixture(scope="module")
def graph():
    return hub_graph()


def test_hub_degree_engages_wide_deg_bits(graph):
    assert graph.max_degree >= HUB_DEG
    assert graph.layout is not None and graph.layout.deg_bits >= 15


@pytest.mark.parametrize("p,q,branch", [(0.5, 2.0, "hierarchical"),
                                        (0.5, 1.0, "speculative")])
def test_fat_bit_identical_on_hub_graph(graph, p, q, branch):
    num_walkers = 4096
    assert fatwalk.rejection_branch(p, q, num_walkers) == branch
    # Half the walkers start ON the hub, half on spokes (so states with
    # t == hub and v == hub both occur).
    idx = np.arange(num_walkers)
    starts = np.where(idx % 2 == 0, 0, idx % HUB_DEG + 1)
    targets = jnp.asarray(starts, jnp.int32)
    ref = node2vec_walk_csr(graph.row_ptr, graph.col_idx, targets, p, q, 8,
                            seed=17, search_iters=graph.search_iters)
    es = edge_set_for(graph)
    fat = fatwalk.node2vec_walk_fat(graph.edge_tab, graph.node_tab, es.table,
                                    targets, FatMeta.of(graph), es.log_size,
                                    es.salt, p, q, 8, seed=17)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))


def _class_law_from_hub(graph, p, q):
    """Exact aggregated law of step 2 for walks started at the hub:
    P(next == hub), P(next in N(hub) \\ {hub}), P(else), marginalized over
    the uniform first hop.  Direct from the node2vec weights."""
    rp = np.asarray(graph.row_ptr)
    ci = np.asarray(graph.col_idx)
    hub_nbrs = ci[rp[HUB]:rp[HUB + 1]]
    max_prob = max(1.0 / p, 1.0, 1.0 / q)
    w0, w1, w2 = 1.0 / p / max_prob, 1.0 / max_prob, 1.0 / q / max_prob
    agg = np.zeros(3)
    uniq, counts = np.unique(hub_nbrs, return_counts=True)
    for v, mult in zip(uniq, counts):
        nbrs = ci[rp[v]:rp[v + 1]]
        in_hub = np.isin(nbrs, uniq)
        cls = np.where(nbrs == HUB, 0, np.where(in_hub, 1, 2))
        w = np.choose(cls, [w0, w1, w2])
        z = w.sum()
        for c in range(3):
            agg[c] += (mult / hub_nbrs.size) * w[cls == c].sum() / z
    return agg


def test_hub_transition_law_through_fat_engine(graph):
    """Empirical 3-class law of the step out of (t=hub, v=spoke) states vs
    the exact law, through the production fat engine at hierarchical batch
    size."""
    p, q = 0.5, 2.0
    num_walkers = 16_384
    assert fatwalk.rejection_branch(p, q, num_walkers) == "hierarchical"
    targets = jnp.zeros(num_walkers, jnp.int32)  # all start at the hub
    es = edge_set_for(graph)
    walks = np.asarray(fatwalk.node2vec_walk_fat(
        graph.edge_tab, graph.node_tab, es.table, targets, FatMeta.of(graph),
        es.log_size, es.salt, p, q, 2, seed=23))
    rp = np.asarray(graph.row_ptr)
    ci = np.asarray(graph.col_idx)
    hub_set = set(ci[rp[HUB]:rp[HUB + 1]].tolist())
    nxt = walks[:, 2]
    emp = np.array([
        (nxt == HUB).mean(),
        np.mean([(x in hub_set) and x != HUB for x in nxt]),
        np.mean([(x not in hub_set) and x != HUB for x in nxt]),
    ])
    exact = _class_law_from_hub(graph, p, q)
    np.testing.assert_allclose(emp, exact, atol=0.015)
