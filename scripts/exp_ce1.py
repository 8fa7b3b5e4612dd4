"""One (iters, check_every) pipelined while_loop timing; env ACG_ITERS/ACG_CE."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import acg_tpu  # noqa: F401
import jax, jax.numpy as jnp
from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import poisson2d_dia
from acg_tpu.solvers.cg import CGOptions, pipelined_cg_loop

ITERS = int(os.environ.get("ACG_ITERS", "50"))
CE = int(os.environ.get("ACG_CE", "25"))

offsets, vals = poisson2d_dia(2048, dtype=np.float64)
op = DiaOperator.from_arrays(offsets, vals, pad_to=1024)
vdt = jnp.float64
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal(op.Np) * 1e-3, vdt)
b = op.spmv(x0)

opt = CGOptions(max_iterations=ITERS, residual_rtol=0.0, check_every=CE)

@jax.jit
def run():
    x, scalars = pipelined_cg_loop(op.spmv, b, x0, opt)
    return scalars["rnrm2sqr"]

t0 = time.perf_counter()
r = run(); jax.block_until_ready(r)
print(f"compile+first(iters={ITERS},ce={CE}): {time.perf_counter()-t0:.1f}s",
      flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    r = run(); jax.block_until_ready(r)
    best = min(best, time.perf_counter() - t0)
print(f"RESULT iters={ITERS} ce={CE} best_total={best:.4f}s", flush=True)
