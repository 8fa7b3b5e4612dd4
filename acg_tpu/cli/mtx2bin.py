"""`mtx2bin` — convert Matrix Market text files to the aCG binary format for
fast re-reads (mtx2bin/mtx2bin.c analogue; format mtxfile.c:1460-1500)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="mtx2bin", description="Convert mtx files to binary format.")
    p.add_argument("input", help="input Matrix Market file")
    p.add_argument("output", nargs="?", default=None,
                   help="output file (default: stdout)")
    p.add_argument("-z", "--gzip", action="store_true",
                   help="filter input through gzip")
    p.add_argument("--double", action="store_true",
                   help="force double-precision values (default)")
    p.add_argument("--integer", action="store_true", help="integer values")
    p.add_argument("--idx-size", type=int, default=64, choices=(32, 64),
                   help="index width in bits (ACG_IDX_SIZE analogue) [64]")
    args = p.parse_args(argv)

    import acg_tpu  # noqa: F401
    from ..io.mtxfile import read_mtx, write_mtx

    m = read_mtx(args.input, gzip=args.gzip or None)
    if args.integer:
        m.field = "integer"
    out = args.output if args.output else sys.stdout.buffer
    write_mtx(out, m, binary=True, idx_size=args.idx_size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
