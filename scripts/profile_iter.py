"""Component-level timing of the pipelined-CG iteration on the attached TPU.

Methodology: each candidate op is iterated inside one jitted fori_loop with
a dependency chain; two different trip counts are differenced to cancel
constant dispatch/fetch overhead (the tunnel adds seconds of fixed cost).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import acg_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import poisson2d_dia
from acg_tpu.ops.blas1 import dot2

N_GRID = int(os.environ.get("ACG_BENCH_N", "2048"))
DTYPE = os.environ.get("ACG_BENCH_DTYPE", "float64")
K1, K2 = 20, 120


def diff_time(make_loop):
    def timed(iters):
        run = make_loop(iters)
        r = run()
        jax.block_until_ready(r)
        _ = float(np.asarray(jax.device_get(r)).ravel()[0])
        t0 = time.perf_counter()
        r = run()
        _ = float(np.asarray(jax.device_get(r)).ravel()[0])
        return time.perf_counter() - t0

    t1 = timed(K1)
    t2 = timed(K2)
    return (t2 - t1) / (K2 - K1)


def main():
    offsets, vals = poisson2d_dia(N_GRID, dtype=np.dtype(DTYPE))
    op = DiaOperator.from_arrays(offsets, vals, pad_to=1024)
    Np = op.Np
    vdt = jnp.dtype(DTYPE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(Np) * 1e-3, vdt)

    # 1. SpMV alone (chained)
    def mk_spmv(iters):
        @jax.jit
        def run():
            def body(i, v):
                return op.spmv(v) * jnp.array(0.05, vdt)
            return jax.lax.fori_loop(0, iters, body, x)[0]
        return run
    t = diff_time(mk_spmv)
    gb = op.bytes_per_spmv() / t / 1e9
    print(f"spmv: {t*1e6:.1f} us/iter  ({gb:.0f} GB/s, {op.nnz/t/1e9:.2f} Gnnz/s)")

    # 2. fused 6-vector update block alone
    def mk_update(iters):
        @jax.jit
        def run():
            def body(i, s):
                xx, r, w, z, t_, p = s
                ab = jnp.array(0.001, vdt)
                bb = jnp.array(0.5, vdt)
                z2 = xx + bb * z
                t2 = w + bb * t_
                p2 = r + bb * p
                x2 = xx + ab * p2
                r2 = r - ab * t2
                w2 = w - ab * z2
                return (x2, r2, w2, z2, t2, p2)
            s = jax.lax.fori_loop(0, iters, body, (x, x, x, x, x, x))
            return s[0][0]
        return run
    t = diff_time(mk_update)
    print(f"6-vector fused update: {t*1e6:.1f} us/iter "
          f"({13*Np*np.dtype(DTYPE).itemsize/t/1e9:.0f} GB/s)")

    # 3. stacked double-dot alone
    def mk_dot(iters):
        @jax.jit
        def run():
            def body(i, s):
                v, acc = s
                gd = dot2(v, v, v, v)
                return (v * (jnp.array(1.0, vdt) + 0 * gd[0].astype(vdt)), acc + gd[0])
            return jax.lax.fori_loop(0, iters, body, (x, jnp.array(0.0, jnp.float64)))[1]
        return run
    t = diff_time(mk_dot)
    print(f"double-dot (f64 acc): {t*1e6:.1f} us/iter "
          f"({2*Np*np.dtype(DTYPE).itemsize/t/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
