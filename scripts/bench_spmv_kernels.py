"""A/B benchmark of the pallas DIA SpMV kernels on the real TPU.

Times raw SpMV applications (differenced fixed-iteration compiled loops,
device-sync timing — the bench.py protocol) for the windowed kernel
(dia_spmv_pallas_np: per-block (B+2hw) window DMA, x read (1+2hw/B)×)
versus the ring kernel (dia_spmv_ring: x streamed exactly once), plus a
correctness check of each against the XLA shifted-slice SpMV.

Usage:  python scripts/bench_spmv_kernels.py [2d|3d|both]
Env:    ACG_BENCH_CPU=1 to smoke-test on the CPU backend (interpret mode).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ACG_BENCH_CPU") == "1":
    # the container's sitecustomize pins JAX_PLATFORMS=axon; override both
    # the env var and the already-parsed config (conftest.py trick)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

K1, K2 = 20, 120
HBM_GBPS = float(os.environ.get("ACG_BENCH_HBM_GBPS", "819"))


def bench_case(name, offsets, vals):
    import jax
    import jax.numpy as jnp

    from acg_tpu.core.dia import DiaOperator
    from acg_tpu.ops.pallas_dia import (dia_spmv_pallas_np, dia_spmv_ring,
                                        pallas_halo_width, pick_block,
                                        pick_block_ring)

    op = DiaOperator.from_arrays(offsets, vals, dtype=np.float32,
                                 pad_to=1024, backend="xla")
    K, Np, N = len(op.offsets), op.Np, op.N
    hw = op.halo_width
    isz = 4
    hw_p = pallas_halo_width(hw)
    block_np = pick_block(Np, K, hw_p, isz)
    block_r = pick_block_ring(Np, K, hw, isz)
    if os.environ.get("ACG_RING_BLOCK"):
        block_r = int(os.environ["ACG_RING_BLOCK"])
    print(f"== {name}: N={N} K={K} hw={hw} | windowed block={block_np} "
          f"(hw_p={hw_p}) | ring block={block_r} "
          f"m={-(-hw // block_r) if block_r else '-'}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(Np).astype(np.float32))

    y_ref = np.asarray(op.spmv(x))

    kernels = {
        "windowed": lambda v, xx: dia_spmv_pallas_np(
            v, xx, op.offsets, hw_p, block_np),
    }
    if block_r is not None:
        kernels["ring"] = lambda v, xx: dia_spmv_ring(
            v, xx, op.offsets, block_r)

    bytes_spmv = (K * Np + 2 * Np) * isz
    roof = bytes_spmv / (HBM_GBPS * 1e9)

    # The timed loop iterates y = A_s y with A_s = A / (max row 1-norm + 1)
    # — spectral radius < 1, so the power iteration stays bounded WITHOUT
    # an elementwise scale pass inside the loop (which would add 2N
    # uncounted f32 streams per iteration: +29% traffic on K=5, +7% on
    # K=27, deflating the reported kernel efficiency).
    rowsum = float(np.abs(np.asarray(op.vals)).sum(axis=0).max())
    vals_s = (op.vals * np.float32(1.0 / (rowsum + 1.0))).block_until_ready()

    for kname, fn in kernels.items():
        y = np.asarray(fn(op.vals, x))
        err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert err < 1e-6, (kname, err)

        def make_loop(iters, fn=fn):
            @jax.jit
            def run(v, x0):
                def body(_, xx):
                    return fn(v, xx)
                return jax.lax.fori_loop(0, iters, body, x0)[0]
            return run

        def timed(run, reps=5):
            r = run(vals_s, x)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                r = run(vals_s, x)
                jax.block_until_ready(r)
                best = min(best, time.perf_counter() - t0)
            return best

        t1 = timed(make_loop(K1))
        t2 = timed(make_loop(K2))
        per = (t2 - t1) / (K2 - K1)
        gbs = bytes_spmv / per / 1e9
        gnnz = K * N / per / 1e9
        print(f"   {kname:9s}: {per * 1e6:8.1f} us/spmv  {gbs:6.1f} GB/s "
              f"({100 * roof / per:4.1f}% roofline, {gnnz:.1f} Gnnz/s)  "
              f"rel-err vs xla {err:.2e}", flush=True)


def main():
    from acg_tpu.io.generators import poisson2d_dia, poisson3d_dia

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    small = os.environ.get("ACG_BENCH_CPU") == "1"
    if which in ("2d", "both"):
        n = 64 if small else 2048
        bench_case(f"poisson2d n={n}", *poisson2d_dia(n, dtype=np.float64))
    if which in ("3d", "both"):
        n = 16 if small else 256
        bench_case(f"poisson3d n={n} 27pt",
                   *poisson3d_dia(n, 27, dtype=np.float64))


if __name__ == "__main__":
    main()
