"""torch_random_walk_tpu — a TPU-native random-walk sampling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``Sachinx0e/torch_random_walk`` (``torch_rw``): batched uniform and node2vec
p/q-biased random walks over CSR graphs, indexed edge lists and KG triples,
plus skip-gram / CBOW window generation — extended with a JAX skip-gram
trainer and multi-chip scaling (sharded walkers + edge-partitioned graphs)
that the reference lacks.

Public API mirrors the reference's surface (torch_rw/rw.py, torch_rw/utils.py)
with TPU-idiomatic internals: step-synchronous walker-major batches, stateless
threefry PRNG, vectorized masked rejection sampling, and binary-search
neighbor tests over sorted CSR rows.
"""

from torch_random_walk_tpu import graph, models, ops, parallel, utils
from torch_random_walk_tpu.graph.csr import CSRGraph, to_csr, nodes_tensor
from torch_random_walk_tpu.graph.edge_list import (
    EdgeListGraph,
    to_edge_list_indexed,
    build_node_edge_index,
)
from torch_random_walk_tpu.graph.triples import (
    TriplesGraph,
    build_relation_tail_index,
)
from torch_random_walk_tpu.ops.walk import walk, walk_edge_list, walk_triples
from torch_random_walk_tpu.ops.windows import (
    to_windows,
    to_windows_cbow,
    to_windows_triples,
    to_windows_triples_cbow,
)

__version__ = "0.1.0"

__all__ = [
    "CSRGraph",
    "EdgeListGraph",
    "TriplesGraph",
    "to_csr",
    "nodes_tensor",
    "to_edge_list_indexed",
    "build_node_edge_index",
    "build_relation_tail_index",
    "walk",
    "walk_edge_list",
    "walk_triples",
    "to_windows",
    "to_windows_cbow",
    "to_windows_triples",
    "to_windows_triples_cbow",
    "graph",
    "models",
    "ops",
    "parallel",
    "utils",
]
