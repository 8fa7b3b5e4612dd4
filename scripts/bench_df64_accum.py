"""A/B the df64 SpMV fold shapes on the real TPU (VERDICT round-1 #7).

Runs bench.py's df64 configuration (2-D 2048² Poisson pipelined-df64)
once per ACG_DF64_ACCUM strategy in a fresh subprocess (the compiled-
program cache is keyed by the strategy, but fresh processes keep the
comparison clean), and prints the per-iteration times side by side.

Usage: python scripts/bench_df64_accum.py [chain split2 tree]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    strategies = sys.argv[1:] or ["chain", "split2", "tree"]
    results = {}
    for acc in strategies:
        env = dict(os.environ, ACG_BENCH_DF64="1", ACG_DF64_ACCUM=acc)
        print(f"== accum={acc} ...", flush=True)
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=env, capture_output=True, text=True, timeout=3600)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"   FAILED: {out.stdout[-400:]} {out.stderr[-400:]}",
                  flush=True)
            continue
        results[acc] = rec
        print(f"   {rec['value']:.1f} us/iter "
              f"(vs_baseline {rec['vs_baseline']})", flush=True)
    if "chain" in results:
        base = results["chain"]["value"]
        for acc, rec in results.items():
            print(f"{acc:7s}: {rec['value']:8.1f} us/iter "
                  f"({base / rec['value']:.3f}x vs chain)", flush=True)


if __name__ == "__main__":
    main()
