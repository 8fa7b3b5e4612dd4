"""Feasibility probe: dense run-tail SpMV for contiguous heavy-row runs.

The ACG_HEAVY=2 cap-and-tail measurement (BENCHMARKS.md) showed the
SELL-format tail is scatter-regime by construction: each heavy row's
contiguous run sits in its own column window, so compaction gives every
tail tile ~128 disjoint chunk windows.  The natural format for such rows
is DENSE per-row windows: y[r] = dot(vals[r], x[start[r] : start[r]+W]).
This probes two TPU lowerings of that contraction before committing to
an operator:

  a) vmap(lax.dynamic_slice) + row-wise dot  — XLA slice-gather;
  b) padded block windows: round start down to W and take a 2W window
     (start alignment folded into the values at build time) — turns the
     gather into ONE gather of aligned 2W slices.

Reference anchor: merge-CSR load balance (cg-kernels-cuda.cu:312-441)
handles such rows by construction; this is the TPU-format answer.

Usage: python scripts/exp_runtail.py [ntail] [run]  (real TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    ntail = int(sys.argv[1]) if len(sys.argv) > 1 else 4688
    run = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    N = 600_000
    rng = np.random.default_rng(0)
    starts = rng.integers(0, N - run, size=ntail).astype(np.int32)
    vals = rng.standard_normal((ntail, run)).astype(np.float32)
    x = rng.standard_normal(N).astype(np.float32)
    ref = np.einsum("ij,ij->i", vals,
                    np.stack([x[s:s + run] for s in starts]))

    xd = jnp.asarray(x)
    vd = jnp.asarray(vals)
    sd = jnp.asarray(starts)

    # (a) vmap dynamic_slice
    @jax.jit
    def spmv_a(vd, sd, xd):
        def one(v, s):
            return jnp.dot(v, jax.lax.dynamic_slice(xd, (s,), (run,)))
        return jax.vmap(one)(vd, sd)

    # (b) aligned 2W windows: W = run rounded to 512; window = 2W slices
    W = -(-run // 512) * 512
    base = (starts // W).astype(np.int32)            # aligned block id
    off = starts - base * W                          # in-window offset
    v2 = np.zeros((ntail, 2 * W), np.float32)
    for i in range(ntail):
        v2[i, off[i]:off[i] + run] = vals[i]
    xpad = jnp.pad(xd, (0, 2 * W))
    v2d = jnp.asarray(v2)
    bd = jnp.asarray(base)

    @jax.jit
    def spmv_b(v2d, bd, xpad):
        # gather of ntail aligned 2W slices, then a batched dot
        win = jax.vmap(lambda b: jax.lax.dynamic_slice(
            xpad, (b * W,), (2 * W,)))(bd)
        return jnp.einsum("ij,ij->i", v2d, win)

    for name, fn, args in (("a: vmap-dynslice dot", spmv_a, (vd, sd, xd)),
                           ("b: aligned-2W windows", spmv_b,
                            (v2d, bd, xpad))):
        y = fn(*args)
        jax.block_until_ready(y)
        err = np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(*args)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / reps
        nnz = ntail * run
        gb = (nnz * 4 * (2 if "2W" in name else 1) + nnz * 4) / 1e9
        print(f"{name}: {dt*1e6:9.1f} us  {nnz/dt/1e9:6.2f} Gnnz/s  "
              f"~{gb/dt:6.0f} GB/s  rel-err {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
