"""Sweep cluster_order ball size vs SELL layout fill (host-only).

Builds the bench_unstructured 600k-row mesh solid once, then for each
ball size builds the SELL layout and prints the fill — picking the
default ball for scripts/bench_unstructured.py.  No TPU needed: layout
build is host/native.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from bench_unstructured import build_matrix  # noqa: E402

from acg_tpu.partition.ordering import cluster_order  # noqa: E402


def layout_fill(A):
    """Fill of the SELL layout without building device slabs."""
    from acg_tpu.core.sell import SellOperator
    op = SellOperator.from_csr(A, dtype=np.float32)
    return op.fill, op.S


def main():
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    A0 = build_matrix(nodes)
    f0, S0 = layout_fill(A0)
    print(f"rcm     : fill={f0:.3f} S={S0}", flush=True)
    for ball in (64, 128, 192, 256, 384, 512):
        t0 = time.perf_counter()
        perm = cluster_order(A0.indptr, A0.indices, ball=ball)
        A = A0[perm][:, perm].tocsr()
        f, S = layout_fill(A)
        print(f"ball={ball:4d}: fill={f:.3f} S={S} "
              f"({time.perf_counter() - t0:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
