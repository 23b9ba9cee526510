from torch_random_walk_tpu.ops import common
from torch_random_walk_tpu.ops.walk import walk, walk_edge_list, walk_triples
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
from torch_random_walk_tpu.ops.edge_list_walk import (
    uniform_walk_edge_list,
    biased_walk_edge_list,
)
from torch_random_walk_tpu.ops.triples_walk import uniform_walk_triples
from torch_random_walk_tpu.ops.windows import (
    to_windows,
    to_windows_cbow,
    to_windows_triples,
    to_windows_triples_cbow,
)

__all__ = [
    "common",
    "walk",
    "walk_edge_list",
    "walk_triples",
    "uniform_walk_csr",
    "node2vec_walk_csr",
    "uniform_walk_edge_list",
    "biased_walk_edge_list",
    "uniform_walk_triples",
    "to_windows",
    "to_windows_cbow",
    "to_windows_triples",
    "to_windows_triples_cbow",
]
