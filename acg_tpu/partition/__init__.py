from .graph import (PartitionedMatrix, build_partitioned_matrix,
                    gather_vector, scatter_vector)
from .ordering import bandwidth, nd_order, permute_csr, rcm_order
from .partitioner import (edge_cut, partition, partition_bfs_recursive,
                          partition_contiguous)

__all__ = [
    "PartitionedMatrix", "bandwidth", "build_partitioned_matrix",
    "edge_cut", "nd_order", "permute_csr", "rcm_order",
    "gather_vector", "partition", "partition_bfs_recursive",
    "partition_contiguous", "scatter_vector",
]
