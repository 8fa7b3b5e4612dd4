"""Packed-lidx SELL kernel validation + throughput on the real chip.

Checks the 4:1 lidx packing (ops/pallas_sell.py) lowers through Mosaic
and measures the bandwidth gain (8 -> 5 bytes/slot) on the mesh-solid
matrices of scripts/bench_unstructured.py.

Usage: python scripts/bench_sell_packed.py [nodes ...] (default 60000 200000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ACG_BENCH_CPU") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bench_unstructured import build_matrix, bench_spmv  # noqa: E402


def main():
    import jax.numpy as jnp
    from acg_tpu.core.sell import SellOperator

    sizes = [int(a) for a in sys.argv[1:]] or [60000, 200000]
    for nodes in sizes:
        A = build_matrix(nodes)
        N = A.shape[0]
        rng = np.random.default_rng(0)
        xh = rng.standard_normal(N).astype(np.float32)
        ref = A @ xh
        t0 = time.perf_counter()
        op = SellOperator.from_csr(A, dtype=np.float32)
        tb = time.perf_counter() - t0
        xp = jnp.zeros((op.Np,), jnp.float32).at[:N].set(jnp.asarray(xh))
        y = np.asarray(op.spmv(xp))[:N]
        err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        slot_bytes = op.nnz * (op.dtype.itemsize + 1)
        print(f"N={N:,}: fill={op.fill:.3f} slabs "
              f"{slot_bytes / 1e9:.2f} GB (layout {tb:.1f} s) "
              f"rel-err {err:.1e}", flush=True)
        assert err < 1e-4
        per = bench_spmv("sell-packed", op, xp, A.nnz)
        gbs = slot_bytes / per / 1e9
        print(f"    {gbs:.0f} GB/s of slab traffic "
              f"({gbs / 693 * 100:.0f}% of achievable peak)", flush=True)
        del op, xp


if __name__ == "__main__":
    main()
