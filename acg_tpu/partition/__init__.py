from .graph import (PartitionedMatrix, build_partitioned_matrix,
                    gather_vector, scatter_vector)
from .partitioner import (edge_cut, partition, partition_bfs_recursive,
                          partition_contiguous)

__all__ = [
    "PartitionedMatrix", "build_partitioned_matrix", "edge_cut",
    "gather_vector", "partition", "partition_bfs_recursive",
    "partition_contiguous", "scatter_vector",
]
