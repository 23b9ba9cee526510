from torch_random_walk_tpu.parallel.mesh import make_mesh, data_sharding
from torch_random_walk_tpu.parallel.walk_dp import (
    walk_data_parallel,
    walk_edge_list_data_parallel,
    walk_triples_data_parallel,
)
from torch_random_walk_tpu.parallel.partition import (
    PartitionedCSR,
    build_partition_hashes,
    walk_partitioned,
    walk_partitioned_node2vec,
)
from torch_random_walk_tpu.parallel.partition_v2 import (
    PartitionedEdgeList,
    PartitionedTriples,
    RoutedConfig,
    walk_partitioned_routed,
    walk_partitioned_node2vec_routed,
    build_edge_list_partition_blooms,
    build_edge_list_partition_hashes,
    walk_edge_list_node2vec_partitioned_routed,
    walk_edge_list_partitioned_routed,
    walk_triples_partitioned_routed,
)
from torch_random_walk_tpu.parallel.trainer import (
    ShardedNode2Vec,
    ShardedNode2VecConfig,
)
from torch_random_walk_tpu.parallel.kge_trainer import (
    ShardedKGEmbedding,
    ShardedKGEmbeddingConfig,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "walk_data_parallel",
    "walk_edge_list_data_parallel",
    "walk_triples_data_parallel",
    "PartitionedCSR",
    "build_partition_hashes",
    "walk_partitioned",
    "walk_partitioned_node2vec",
    "PartitionedEdgeList",
    "PartitionedTriples",
    "RoutedConfig",
    "build_edge_list_partition_blooms",
    "build_edge_list_partition_hashes",
    "walk_edge_list_node2vec_partitioned_routed",
    "walk_edge_list_partitioned_routed",
    "walk_partitioned_routed",
    "walk_partitioned_node2vec_routed",
    "walk_triples_partitioned_routed",
    "ShardedNode2Vec",
    "ShardedNode2VecConfig",
    "ShardedKGEmbedding",
    "ShardedKGEmbeddingConfig",
]
