from torch_random_walk_tpu.parallel.mesh import make_mesh, data_sharding
from torch_random_walk_tpu.parallel.walk_dp import walk_data_parallel
from torch_random_walk_tpu.parallel.partition import (
    PartitionedCSR,
    walk_partitioned,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "walk_data_parallel",
    "PartitionedCSR",
    "walk_partitioned",
]
