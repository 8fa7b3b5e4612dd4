"""Headline benchmark: pipelined CG on the reference's benchmark matrix.

Protocol parity (BASELINE.md): 2-D 5-point Poisson on an n=2048 grid
(N=4,194,304 — matrices_generator/poisson.py; scripts/mpi_combined.sh:41),
pipelined CG.

Default configuration is the TPU fast path: float32 storage, pallas
streaming SpMV, mixed dot accumulation (blockwise f32 + f64 across
blocks; scalar recurrences f64).  Correctness of this path against the
f64 oracles is covered by tests/.  The reference-parity f64 configuration
runs with ACG_BENCH_DTYPE=float64 ACG_BENCH_BACKEND=xla
ACG_BENCH_DOT=float64 (the TPU emulates f64 — no native f64 ALUs — so it
is ~8x slower; measured progression on this benchmark: f64/XLA 4214,
f32/XLA 1365, f32/pallas 624, f32/pallas/mixed 513 us/iter).

Measurement: the attached TPU is reached through a tunnel with large fixed
dispatch/sync overhead, so per-iteration time is obtained by differencing
two fixed-iteration-count compiled solves (K2 − K1 iterations), which
cancels launch/fetch constants exactly — both runs are a single XLA
program each (no host in the loop).  Timing syncs on device completion
(block_until_ready), never on value fetches (seconds-scale variance).

Protocol of record (round-4 change, tightened round 5): the differencing
is repeated ``ACG_BENCH_ESTIMATES`` (default 5) times, each estimate
min-of-2 inner timings per iteration count; estimates slower than 1.25x
the running median are chip contention and are discarded-and-retried
(bounded budget), and the reported ``value`` is the MEDIAN estimate with
``spread_pct`` = (max − min)/median.  Two rounds running, a
best-observed single number drifted 3-6% from the driver's capture
(chip contention); the median-with-spread is reproducible: docs must
quote the driver-run median and may footnote best-observed.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline",
"spread_pct", "estimates", "retries"}.  ``vs_baseline`` is the fraction
of the memory-roofline iteration time achieved (1.0 = speed of light),
since the reference repo publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

N_GRID = int(os.environ.get("ACG_BENCH_N", "2048"))
K1, K2 = 50, 250
DTYPE = os.environ.get("ACG_BENCH_DTYPE", "float32")
HBM_GBPS = float(os.environ.get("ACG_BENCH_HBM_GBPS", "819"))  # v5e HBM
# Convergence-check block size: identical numerics to checking every
# iteration (frozen steps), amortizes the while_loop predicate evaluation.
CHECK_EVERY = int(os.environ.get("ACG_BENCH_CE", "25"))


DIM = int(os.environ.get("ACG_BENCH_DIM", "2"))         # 2 or 3
STENCIL = int(os.environ.get("ACG_BENCH_STENCIL", "0"))  # 0=default (5 / 7)
BACKEND = os.environ.get("ACG_BENCH_BACKEND", "pallas")  # xla | pallas
DOT = os.environ.get("ACG_BENCH_DOT", "mixed")           # float64|float32|mixed
# one-pass fused iteration kernel: "auto" (default) picks it for narrow
# stencils where it wins (measured round 2, ring kernels: 2-D K=5 fused
# 495.6 vs unfused 528 us/iter; 3-D K=27 fused 5087 vs unfused 4977 —
# at wide K the kernel is VPU-bound and the fused extra vector work
# costs more than the saved traffic)
FUSED_ENV = os.environ.get("ACG_BENCH_FUSED", "auto")    # auto | 0 | 1
DF64 = os.environ.get("ACG_BENCH_DF64", "0") == "1"      # double-f32 (f64-parity) path
if DF64:
    DTYPE = "float64"   # the df64 path consumes an f64 operator/vectors
    BACKEND = "xla"     # setup-path SpMV (b = A x*) runs in plain f64 XLA


def main() -> None:
    import jax
    import jax.numpy as jnp

    import acg_tpu  # noqa: F401
    from acg_tpu.core.dia import DiaOperator
    from acg_tpu.io.generators import poisson2d_dia, poisson3d_dia
    from acg_tpu.solvers.cg import (CGOptions, pipelined_cg_loop,
                                    pipelined_cg_loop_df64,
                                    pipelined_cg_loop_fused)

    if DIM == 2:
        offsets, vals = poisson2d_dia(N_GRID, dtype=np.dtype(DTYPE))
        name = f"poisson2d_n{N_GRID}"
    else:
        offsets, vals = poisson3d_dia(N_GRID, STENCIL or 7,
                                      dtype=np.dtype(DTYPE))
        name = f"poisson3d_n{N_GRID}_{STENCIL or 7}pt"
    op = DiaOperator.from_arrays(offsets, vals, pad_to=1024, backend=BACKEND)
    N, Np, K = op.N, op.Np, len(op.offsets)
    FUSED = (K <= 12) if FUSED_ENV == "auto" else FUSED_ENV == "1"
    rng = np.random.default_rng(0)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)

    vdt = jnp.dtype(DTYPE)
    xs = jnp.zeros((Np,), vdt).at[:N].set(jnp.asarray(xstar, vdt))
    b = op.spmv(xs)                      # manufactured RHS on device
    x0 = jnp.zeros((Np,), vdt)

    def make_run(iters):
        opt = CGOptions(max_iterations=iters, residual_rtol=0.0,
                        residual_atol=0.0, check_every=CHECK_EVERY,
                        dot_dtype=DOT)

        @jax.jit
        def run(op_, b_, x0_):
            if DF64:
                x, scalars = pipelined_cg_loop_df64(op_, b_, x0_, opt)
            elif FUSED:
                x, scalars = pipelined_cg_loop_fused(op_, b_, x0_, opt)
            else:
                x, scalars = pipelined_cg_loop(op_.spmv, b_, x0_, opt)
            return x[0], scalars["rnrm2sqr"]

        return run

    def timed_once(run, inner=2):
        # min over ``inner`` timings (rejects single dispatch hiccups).
        # Timing syncs with block_until_ready (device completion) rather
        # than fetching values: tunnel data fetches have seconds-scale
        # variance that survives min-of-reps and corrupts the differencing.
        best = float("inf")
        for _i in range(inner):
            t0 = time.perf_counter()
            r = run(op, b, x0)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best

    run1, run2 = make_run(K1), make_run(K2)
    for run in (run1, run2):      # compile + warm caches; one real fetch
        r = run(op, b, x0)
        jax.block_until_ready(r)
        _ = float(r[1])

    # Round-5 protocol tightening: 5 estimates (was 3) + discard-and-
    # retry of contended outliers — one slow estimate out of three left
    # spread_pct at 30% in the round-4 capture.  An estimate worse than
    # 1.25x the median is chip contention (the tail is one-sided: the
    # other tenant can only make us slower), so it is replaced, up to a
    # bounded retry budget.  The MEDIAN stays the value of record.
    #
    # LOW-side guard (measured hazard, 2026-08-20): after a tunnel
    # remote_compile failure, block_until_ready can return WITHOUT
    # waiting — min-of-reps then measures bare dispatch and reports
    # physically impossible speeds.  Any estimate below half the
    # analytic roofline time is invalid by construction and is
    # discarded-and-retried the same way.
    s = np.dtype(DTYPE).itemsize
    bytes_iter_guard = (K * N + 2 * N + 13 * N + 2 * N) * s
    floor = 0.5 * bytes_iter_guard / (HBM_GBPS * 1e9)
    n_est = max(int(os.environ.get("ACG_BENCH_ESTIMATES", "5")), 1)

    def one_estimate():
        for _t in range(8):
            t1 = timed_once(run1)
            t2 = timed_once(run2)
            e = (t2 - t1) / (K2 - K1)
            if e >= floor:
                return e
        raise RuntimeError(
            f"8 consecutive sub-roofline estimates ({e * 1e6:.2f} us/iter "
            f"< floor {floor * 1e6:.2f}) — the device sync is not "
            "awaiting; re-run when the tunnel recovers")

    def med(v):
        s = sorted(v)
        m = len(s)
        return s[m // 2] if m % 2 else 0.5 * (s[m // 2 - 1] + s[m // 2])

    estimates = [one_estimate() for _j in range(n_est)]
    retries = 0
    while retries < 2 * n_est:
        worst = max(estimates)
        if worst <= 1.25 * med(estimates):
            break
        estimates.remove(worst)
        estimates.append(one_estimate())
        retries += 1
    estimates.sort()
    per_iter = med(estimates)
    spread_pct = 100.0 * (estimates[-1] - estimates[0]) / per_iter \
        if per_iter > 0 else 0.0

    # Memory roofline per pipelined-CG iteration (f64 streams):
    #   SpMV:  vals K·N + x_ext read N + y write N
    #   fused updates: reads r,w,z,t,p,x,q (7N) + writes z,t,p,x,r,w (6N)
    #   dots: reads r,w (2N, r reused)
    s = np.dtype(DTYPE).itemsize
    bytes_iter = (K * N + 2 * N + 13 * N + 2 * N) * s
    roofline = bytes_iter / (HBM_GBPS * 1e9)
    vs = roofline / per_iter if per_iter > 0 else 0.0

    print(json.dumps({
        "metric": f"{name}_pipelined_cg_iteration_time",
        "value": per_iter * 1e6,
        "unit": "us/iteration",
        "vs_baseline": round(vs, 4),
        "spread_pct": round(spread_pct, 2),
        "estimates": [round(e * 1e6, 2) for e in estimates],
        "retries": retries,
    }))


if __name__ == "__main__":
    main()
