"""`mtxpartition` — offline graph partitioner CLI (mtxpartition/mtxpartition.c
analogue): read a matrix, partition its sparsity graph, write the partition
vector as an integer Matrix Market array compatible with
``acg-tpu --partition=FILE`` (mtxpartition.c:258-294 output format)."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="mtxpartition",
        description="Partition a matrix from a Matrix Market file.")
    p.add_argument("A", help="path to Matrix Market file for a matrix A")
    p.add_argument("-z", "--gzip", action="store_true", help="filter through gzip")
    p.add_argument("--binary", action="store_true", help="binary Matrix Market input")
    p.add_argument("--parts", type=int, default=2, metavar="N",
                   help="number of parts [2]")
    p.add_argument("--method", default="bfs",
                   choices=("contiguous", "bfs", "metis-like"),
                   help="partitioner [bfs]")
    p.add_argument("--seed", type=int, default=0, help="random number seed [0]")
    p.add_argument("-o", "--output", default=None,
                   help="output file (default: stdout)")
    p.add_argument("--verbose", "-v", action="store_true")
    args = p.parse_args(argv)

    import acg_tpu  # noqa: F401
    from ..core.csr import SymCSRMatrix
    from ..io.mtxfile import partition_to_mtx, read_mtx, write_mtx
    from ..partition.partitioner import edge_cut, partition

    mtx = read_mtx(args.A, gzip=args.gzip or None, binary=args.binary)
    A = SymCSRMatrix.from_mtx(mtx).to_scipy_full()
    part = partition(A.indptr, A.indices, args.parts, method=args.method,
                     seed=args.seed)
    if args.verbose:
        sizes = np.bincount(part, minlength=args.parts)
        print(f"parts: {args.parts}, sizes: {sizes.tolist()}, "
              f"edge cut: {edge_cut(A.indptr, A.indices, part)}",
              file=sys.stderr)
    out = args.output if args.output else sys.stdout.buffer
    write_mtx(out, partition_to_mtx(part),
              comments=[f"% partition vector ({args.parts} parts, "
                        f"method={args.method}, seed={args.seed})"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
