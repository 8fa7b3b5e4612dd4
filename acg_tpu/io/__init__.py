from .mtxfile import (MtxFile, partition_to_mtx, read_mtx, read_partition,
                      vector_to_mtx, write_mtx)
from .generators import (dia_to_coo, poisson2d_dia, poisson2d_mtx,
                         poisson3d_dia, poisson3d_mtx)

__all__ = [
    "MtxFile", "dia_to_coo", "partition_to_mtx", "poisson2d_dia",
    "poisson2d_mtx", "poisson3d_dia", "poisson3d_mtx", "read_mtx",
    "read_partition", "vector_to_mtx", "write_mtx",
]
