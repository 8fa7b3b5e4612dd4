"""Experiment A: full pipelined data path with constant scalars in a
fori_loop — measures pure composition cost without recurrences/conv check."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import acg_tpu  # noqa: F401
import jax, jax.numpy as jnp
from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import poisson2d_dia
from acg_tpu.ops.blas1 import dot2

offsets, vals = poisson2d_dia(2048, dtype=np.float64)
op = DiaOperator.from_arrays(offsets, vals, pad_to=1024)
vdt = jnp.float64
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal(op.Np) * 1e-3, vdt)
b = op.spmv(x0)
K1, K2 = 20, 100

def mk(iters):
    @jax.jit
    def run():
        ab = jnp.array(1e-7, vdt); bb = jnp.array(0.5, vdt)
        def body(i, s):
            x, r, w, z, t, p, acc = s
            q = op.spmv(w)
            z2 = q + bb * z; t2 = w + bb * t; p2 = r + bb * p
            x2 = x + ab * p2; r2 = r - ab * t2; w2 = w - ab * z2
            gd = dot2(r2, r2, w2, r2)
            return (x2, r2, w2, z2, t2, p2, acc + gd[0])
        s = jax.lax.fori_loop(0, iters, body,
                              (x0, b, x0, x0, x0, x0, jnp.array(0.0, jnp.float64)))
        return s[6]
    return run

def one(iters):
    run = mk(iters)
    t0 = time.perf_counter()
    r = run(); jax.block_until_ready(r)
    print(f"  compile+first({iters}): {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = run(); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best

t1, t2 = one(K1), one(K2)
print(f"A fori constant-scalars full iter: {(t2-t1)/(K2-K1)*1e6:.1f} us/iter", flush=True)
