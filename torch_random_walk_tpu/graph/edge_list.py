"""Indexed edge-list graph container and builders.

Replaces the reference's ``to_edge_list_indexed`` / ``build_node_edge_index``
(torch_rw/utils.py:21-89) — which use quadratic ``list.index`` loops and a
pandas sort — with vectorized NumPy.

Contracts kept from the reference:
- edge list is (E, 2) [head, tail]; undirected graphs get reversed edges
  appended (torch_rw/utils.py:52-54);
- ``node_edge_index`` is (N, 2) [start, end] with *end inclusive*
  (csrc/cpu/cpu_utils.cpp:7 samples start..end inclusive), and (-1, -1) for
  nodes with no out-edges (torch_rw/utils.py:70).

Documented deviation: within one head's range we sort edges by tail (the
reference's pandas sort is head-only, preserving insertion order).  This
changes which edge a given random index picks — never the uniform
distribution over out-edges — and enables the O(log deg) binary-search
membership test that replaces the reference's linear scan
(csrc/cpu/rw_cpu_edge_list.cpp:37-62).  The reference's scan also has an
off-by-one (end exclusive, SURVEY.md §2.4 note) that we fix rather than
replicate.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from torch_random_walk_tpu.graph.csr import PackedLayout, _bits_for


@dataclasses.dataclass(frozen=True)
class EdgeListGraph:
    """Sorted indexed edge list + per-node edge-range index.

    Fat tables (TPU hot path, ops/fatwalk.py): ``edge_tab[e]`` packs
    (tail, start_tail, cnt_tail) — everything the next uniform step needs in
    ONE row gather; ``node_tab[v]`` packs the same per node.  ``cnt`` is the
    out-edge count (0 encodes the reference's (-1, -1) dead-end sentinel).
    """

    edge_list: jnp.ndarray  # (E, 2) [head, tail], sorted by (head, tail)
    node_edge_index: jnp.ndarray  # (N, 2) [start, end-inclusive], -1 sentinel
    num_nodes: int
    num_edges: int
    max_degree: int
    layout: PackedLayout | None = None
    edge_tab: jnp.ndarray | None = None  # (E, 2) uint32
    node_tab: jnp.ndarray | None = None  # (N, 2) uint32

    @property
    def search_iters(self) -> int:
        return max(1, int(math.ceil(math.log2(max(self.max_degree, 2)))) + 1)

    @classmethod
    def from_arrays(cls, edge_list, num_nodes: int | None = None) -> "EdgeListGraph":
        edges = np.asarray(edge_list, np.int64).reshape(-1, 2)
        if num_nodes is None:
            num_nodes = int(edges.max()) + 1 if edges.size else 0
        order = np.lexsort((edges[:, 1], edges[:, 0]))
        edges = edges[order]
        heads = edges[:, 0]
        counts = np.bincount(heads, minlength=num_nodes)
        starts = np.zeros(num_nodes, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ends = starts + counts - 1  # inclusive
        node_edge_index = np.stack([starts, ends], axis=1)
        node_edge_index[counts == 0] = -1
        dtype = np.int32 if edges.size == 0 or edges.max() < 2**31 else np.int64
        num_edges = int(edges.shape[0])
        max_degree = int(counts.max()) if num_nodes else 0

        layout = edge_tab = node_tab = None
        if num_nodes and num_edges:
            layout = PackedLayout(
                node_bits=_bits_for(num_nodes),
                start_bits=_bits_for(num_edges + 1),
                deg_bits=_bits_for(max_degree + 1),
            )
            if layout.fits:
                tails = edges[:, 1]
                edge_tab = jnp.asarray(layout.pack_np(
                    tails, starts[tails], counts[tails]))
                node_tab = jnp.asarray(layout.pack_np(
                    np.arange(num_nodes), starts, counts))
            else:
                layout = None
        return cls(
            edge_list=jnp.asarray(edges.astype(dtype)),
            node_edge_index=jnp.asarray(node_edge_index.astype(dtype)),
            num_nodes=num_nodes,
            num_edges=num_edges,
            max_degree=max_degree,
            layout=layout,
            edge_tab=edge_tab,
            node_tab=node_tab,
        )

    @classmethod
    def from_networkx(cls, graph) -> "EdgeListGraph":
        edges, mapping = to_edge_list_indexed(graph)
        n = len(mapping)
        return cls.from_arrays(np.asarray(edges), num_nodes=n)


def to_edge_list_indexed(graph):
    """Reference-parity (torch_rw/utils.py:21): graph -> ((E,2) indexed edge
    list, node->index mapping).  Nodes are indexed by *sorted* node order
    (matching ``nodes.index`` over ``sorted(graph.nodes())``,
    torch_rw/utils.py:23); undirected graphs get reversed edges appended."""
    import networkx as nx

    nodes = sorted(graph.nodes())
    mapping = {n: i for i, n in enumerate(nodes)}
    edges = np.array(
        [[mapping[h], mapping[t]] for h, t in graph.edges()], np.int64
    ).reshape(-1, 2)
    if not nx.is_directed(graph):
        edges = np.concatenate([edges, edges[:, ::-1]], axis=0)
    return jnp.asarray(edges.astype(np.int32)), mapping


def build_node_edge_index(edge_list_indexed, nodes=None):
    """Reference-parity (torch_rw/utils.py:58): sort the edge list by head and
    build the (N, 2) [start, end-inclusive] range table (-1,-1 for nodes with
    no out-edges).  Returns (node_edge_index, sorted_edge_list)."""
    edges = np.asarray(edge_list_indexed)
    if nodes is not None:
        num_nodes = int(np.asarray(nodes).max()) + 1
    else:
        num_nodes = int(edges.max()) + 1 if edges.size else 0
    g = EdgeListGraph.from_arrays(edges, num_nodes=num_nodes)
    return g.node_edge_index, g.edge_list
