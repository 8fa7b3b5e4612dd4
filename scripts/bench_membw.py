"""Empirical HBM bandwidth ceiling for the attached chip.

The roofline fractions in BENCHMARKS.md use the nominal v5e figure
(819 GB/s).  Real streams never reach nominal; this measures what the
chip actually sustains on the simplest possible access patterns so
kernel efficiencies can also be stated against the *achievable* peak
(the speed-of-light the BASELINE target intends).

Patterns (all f32, differenced fixed-iteration loops, bench.py protocol):
  copy   y = x + c        (read N, write N)
  triad  y = a*x + y      (read 2N, write N)
  sum    s += sum(x)      (read N)   — reduction read bandwidth
  spmv5  handwritten 5-stream multiply-add (read 5N+N, write N) in XLA

Usage: python scripts/bench_membw.py [MiB_per_stream]   (default 256)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

K1, K2 = 20, 120
NOMINAL = 819.0


def main():
    import jax
    import jax.numpy as jnp

    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = mib * 1024 * 1024 // 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    c = jnp.float32(1e-6)

    def timed(make, *args):
        def loop(iters):
            @jax.jit
            def run(*a):
                def body(_, carry):
                    return make(*a[1:], carry)
                return jax.lax.fori_loop(0, iters, body, a[0])
            return run
        r1, r2 = loop(K1), loop(K2)
        jax.block_until_ready(r1(*args)); jax.block_until_ready(r2(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter(); jax.block_until_ready(r1(*args))
            t1 = time.perf_counter(); jax.block_until_ready(r2(*args))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (K2 - K1))
        return best

    cases = []
    # copy: carry = x + c  (read 1, write 1)
    t = timed(lambda carry: carry + c, x)
    cases.append(("copy  (r1 w1)", 2 * n * 4, t))
    # triad: carry = 0.999*x + carry (read 2, write 1)
    t = timed(lambda xx, carry: jnp.float32(0.999) * xx + carry, x, x)
    cases.append(("triad (r2 w1)", 3 * n * 4, t))
    # sum: carry = carry + sum(x)*tiny  → scalar carry, read 1
    t = timed(lambda xx, carry: carry + jnp.sum(xx) * c, x, jnp.float32(0.0))
    cases.append(("sum   (r1)   ", 1 * n * 4, t))
    # 5-stream fma: carry = (x*x + x*carry + ...) emulating a 5-pt row
    t = timed(lambda xx, carry: xx * carry + jnp.float32(0.2) * (xx + carry)
              * (carry - xx) + c, x, x)
    cases.append(("fma3  (r2 w1)", 3 * n * 4, t))

    print(f"stream length {n:,} f32 ({mib} MiB)")
    peak = 0.0
    for name, bytes_, per in cases:
        gbs = bytes_ / per / 1e9
        peak = max(peak, gbs)
        print(f"  {name}: {per * 1e6:9.1f} us  {gbs:7.1f} GB/s "
              f"({100 * gbs / NOMINAL:5.1f}% of nominal {NOMINAL:.0f})",
              flush=True)
    print(f"achievable peak ≈ {peak:.1f} GB/s "
          f"({100 * peak / NOMINAL:.1f}% of nominal)")


if __name__ == "__main__":
    main()
