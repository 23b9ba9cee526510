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
from torch_random_walk_tpu.graph import datasets, oracle

__all__ = [
    "CSRGraph",
    "EdgeListGraph",
    "TriplesGraph",
    "to_csr",
    "nodes_tensor",
    "to_edge_list_indexed",
    "build_node_edge_index",
    "build_relation_tail_index",
    "datasets",
    "oracle",
]
