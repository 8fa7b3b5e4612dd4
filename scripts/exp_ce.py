"""Measure check_every impact on the real pipelined while_loop (TPU)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import acg_tpu  # noqa: F401
import jax, jax.numpy as jnp
from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import poisson2d_dia
from acg_tpu.solvers.cg import CGOptions, pipelined_cg_loop

CE = int(os.environ.get("ACG_CE", "25"))
offsets, vals = poisson2d_dia(2048, dtype=np.float64)
op = DiaOperator.from_arrays(offsets, vals, pad_to=1024)
vdt = jnp.float64
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal(op.Np) * 1e-3, vdt)
b = op.spmv(x0)
K1, K2 = 50, 250


def one(iters, ce):
    opt = CGOptions(max_iterations=iters, residual_rtol=0.0, check_every=ce)

    @jax.jit
    def run():
        x, scalars = pipelined_cg_loop(op.spmv, b, x0, opt)
        return scalars["rnrm2sqr"]

    t0 = time.perf_counter()
    r = run(); jax.block_until_ready(r)
    print(f"  compile+first(iters={iters},ce={ce}): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = run(); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


for ce in (CE,):
    t1, t2 = one(K1, ce), one(K2, ce)
    print(f"while_loop check_every={ce}: {(t2-t1)/(K2-K1)*1e6:.1f} us/iter",
          flush=True)
