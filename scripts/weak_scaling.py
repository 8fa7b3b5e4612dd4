"""Weak-scaling harness (BASELINE.md: >=80% efficiency target).

Grows the 3-D Poisson problem with the device count (constant rows per
device) and measures time per pipelined-CG iteration at each scale point
via fixed-iteration differencing.  On a host-simulated mesh this validates
the scaling *structure* (collective counts, halo volume); wall-clock
efficiency numbers are meaningful only on a real multi-chip slice
(run there with ACG_REAL=1).

Usage:
  # simulated (CPU, 8 virtual devices):
  python scripts/weak_scaling.py
  # real slice:
  ACG_REAL=1 python scripts/weak_scaling.py --base-n 128
"""

from __future__ import annotations

import argparse
import os
import sys
import time

if os.environ.get("ACG_REAL") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import acg_tpu  # noqa: F401,E402
import jax  # noqa: E402

if os.environ.get("ACG_REAL") != "1":
    jax.config.update("jax_platforms", "cpu")

from acg_tpu.io.generators import poisson3d_dia  # noqa: E402
from acg_tpu.solvers.cg import CGOptions  # noqa: E402
from acg_tpu.solvers.dist_cg import solve_dist_stencil  # noqa: E402


def time_solve(offsets, vals, b, nparts, iters, dtype, reps=2):
    opt = CGOptions(max_iterations=iters, residual_rtol=0.0)
    best = float("inf")
    # first call compiles; time subsequent
    for i in range(reps + 1):
        t0 = time.perf_counter()
        x, info = solve_dist_stencil(offsets, vals, b, nparts=nparts,
                                     opt=opt, method="pipelined",
                                     dtype=dtype, pad_to=128)
        dt = time.perf_counter() - t0
        if i > 0:
            best = min(best, dt)
    return best


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base-n", type=int, default=32,
                   help="grid n at 1 device; N grows as n * p^(1/3) [32]")
    p.add_argument("--stencil", type=int, default=7, choices=(7, 27))
    p.add_argument("--dtype", default="float64")
    p.add_argument("--k1", type=int, default=10)
    p.add_argument("--k2", type=int, default=50)
    args = p.parse_args(argv)

    ndev = len(jax.devices())
    points = [p_ for p_ in (1, 2, 4, 8, 16, 32) if p_ <= ndev]
    print(f"devices: {ndev} ({jax.devices()[0].platform})", file=sys.stderr)

    t1_base = None
    for nparts in points:
        # constant work per device: scale total rows linearly with parts
        n = int(round(args.base_n * nparts ** (1 / 3)))
        offsets, vals = poisson3d_dia(n, args.stencil,
                                      dtype=np.dtype(args.dtype))
        N = vals.shape[1]
        rng = np.random.default_rng(0)
        b = rng.standard_normal(N)
        ta = time_solve(offsets, vals, b, nparts, args.k1, args.dtype)
        tb = time_solve(offsets, vals, b, nparts, args.k2, args.dtype)
        per_iter = (tb - ta) / (args.k2 - args.k1)
        if t1_base is None:
            t1_base = per_iter
        eff = t1_base / per_iter if per_iter > 0 else 0.0
        print(f"np={nparts:3d} n={n:4d} N={N:>10d} "
              f"{per_iter*1e6:10.1f} us/iter  efficiency={eff:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
