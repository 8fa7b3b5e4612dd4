"""`acg-tpu-poisson` — Poisson model-problem generator CLI
(matrices_generator/poisson.py analogue, extended to the 3-D 7/27-point
configurations of BASELINE.md)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="acg-tpu-poisson", description="Generate Poisson model matrices.")
    p.add_argument("-n", type=int, default=2048,
                   help="grid points per dimension [2048]")
    p.add_argument("--dim", type=int, default=2, choices=(2, 3),
                   help="spatial dimensions [2]")
    p.add_argument("--stencil", type=int, default=None, choices=(5, 7, 27),
                   help="stencil points (2-D: 5; 3-D: 7 or 27)")
    p.add_argument("--symmetric", action="store_true",
                   help="write symmetric (lower-triangle) storage")
    p.add_argument("--binary", action="store_true", help="write binary format")
    p.add_argument("-z", "--gzip", action="store_true", help="gzip output")
    p.add_argument("-o", "--output", default=None,
                   help="output file (default: poisson{dim}d_n{n}.mtx)")
    args = p.parse_args(argv)

    import acg_tpu  # noqa: F401
    from ..io.generators import poisson2d_mtx, poisson3d_mtx
    from ..io.mtxfile import write_mtx

    if args.dim == 2:
        if args.stencil not in (None, 5):
            print("error: 2-D supports the 5-point stencil", file=sys.stderr)
            return 1
        m = poisson2d_mtx(args.n, symmetric=args.symmetric)
    else:
        m = poisson3d_mtx(args.n, stencil=args.stencil or 7,
                          symmetric=args.symmetric)
    ext = ".mtx.gz" if args.gzip else (".bin" if args.binary else ".mtx")
    out = args.output or f"poisson{args.dim}d_n{args.n}{ext}"
    write_mtx(out, m, gzip=args.gzip, binary=args.binary)
    print(f"wrote {out}: {m.nrows}x{m.ncols}, {m.nnz} nonzeros", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
