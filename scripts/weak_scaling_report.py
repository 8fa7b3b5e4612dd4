"""Weak-scaling STRUCTURAL report for BASELINE configs 3/4.

Real multi-chip hardware is unavailable in this container (one tunneled
chip), so the multi-chip story is made auditable the way the compiler
guarantees it: per-iteration collective counts are read from the HLO the
8-virtual-device mesh compiles (the same program a real slice runs, pinned
by tests/test_collectives.py), and halo wire volumes come from the actual
partition plans at the full Config-3/4 sizes.  Wall-clock efficiency is
the only thing this cannot measure — the structure (what rides ICI, how
often, how many bytes) is exact.

  * Config 3: 3-D Poisson 256^3, classic CG, METIS-style (BFS) row
    partition, 8 devices, allgather/alltoall halo (general path).
  * Config 4: 3-D Poisson 512^3, pipelined CG, contiguous-slab stencil
    partition, 8 devices, ring (ppermute) halo.

Emits a markdown table; paste into BENCHMARKS.md.

Usage: python scripts/weak_scaling_report.py [--verify-counts]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import acg_tpu  # noqa: F401,E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def hlo_counts(method: str, general: bool) -> dict:
    """Compile the distributed program on a tiny system, count the
    collectives in its while body (per iteration, check_every=1)."""
    import scipy.sparse as sp

    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    from acg_tpu.partition.graph import build_partitioned_matrix
    from acg_tpu.partition.partitioner import partition_bfs_recursive
    from acg_tpu.solvers.cg import CGOptions, _LAST_COMPILED
    from acg_tpu.solvers.dist_cg import (solve_dist_general,
                                         solve_dist_stencil)

    offsets, vals = poisson2d_dia(16)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    b = np.ones(N)
    opt = CGOptions(max_iterations=4, residual_rtol=0.0, check_every=1)
    if general:
        part = partition_bfs_recursive(A.indptr, A.indices, 8, seed=0)
        pm = build_partitioned_matrix(A, part, pad_to=8)
        solve_dist_general(pm, b, opt=opt, method=method)
    else:
        solve_dist_stencil(offsets, vals, b, nparts=8, opt=opt,
                           method=method, pad_to=128)
    hlo = _LAST_COMPILED[0].as_text()
    names = re.findall(r"body=%?([\w.\-]+)", hlo)
    best = {}
    for name in names:
        m = re.search(rf"^%?{re.escape(name)}[^\n]*\{{(.*?)^\}}", hlo,
                      re.S | re.M)
        if not m:
            continue
        body = m.group(1)
        c = {op: len(re.findall(rf"= \S+ {op}(?:-start)?\(", body))
             for op in ("all-reduce", "collective-permute", "all-gather",
                        "all-to-all")}
        if sum(c.values()) > sum(best.values() or [0]):
            best = c
    return best


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n3", type=int, default=256, help="Config-3 grid [256]")
    p.add_argument("--n4", type=int, default=512, help="Config-4 grid [512]")
    p.add_argument("--stencil", type=int, default=7)
    p.add_argument("--skip-counts", action="store_true")
    args = p.parse_args(argv)

    print("## Weak-scaling structural report (virtual 8-device mesh)\n")

    if not args.skip_counts:
        c3 = hlo_counts("cg", general=True)
        c4 = hlo_counts("pipelined", general=False)
        print("Per-iteration collectives from the compiled HLO "
              "(tests/test_collectives.py pins these):\n")
        print("| config | method | all-reduce | halo collectives |")
        print("|---|---|---:|---|")
        print(f"| 3 (general) | cg | {c3['all-reduce']} | "
              f"{c3['all-gather']} all-gather |")
        print(f"| 4 (stencil) | pipelined | {c4['all-reduce']} | "
              f"{c4['collective-permute']} collective-permute |")
        print()

    # ---- Config 4: stencil slabs at 512^3 -------------------------------
    n = args.n4
    N = n ** 3
    # halo width = max |offset| scaled to the full grid: for the n^3
    # grid the 7-pt stencil couples rows +-n^2
    hw_rows = n * n if args.stencil == 7 else n * n + n + 1
    P = 8
    L = -(-N // P)
    for dt, dname in ((4, "f32"), (8, "f64")):
        halo_bytes = 2 * hw_rows * dt                   # both directions
        print(f"Config 4 (n={n}, {args.stencil}-pt, P={P}, {dname}): "
              f"rows/device {L:,}; ring halo {halo_bytes / 1e6:.2f} MB/"
              f"device/iter; allreduce payload 16 B "
              f"(surface/volume = {2 * hw_rows / L:.4%})")
    print()

    # ---- Config 3: general partition at 256^3 ----------------------------
    n = args.n3
    N = n ** 3
    print(f"Config 3 (n={n}, {args.stencil}-pt, P=8): building the "
          f"partition plan ({N:,} rows)...", file=sys.stderr, flush=True)
    from acg_tpu.io.generators import dia_to_csr, poisson3d_dia
    t0 = time.perf_counter()
    A = dia_to_csr(*poisson3d_dia(n, args.stencil))
    tA = time.perf_counter() - t0
    from acg_tpu.partition.graph import build_partitioned_matrix
    from acg_tpu.partition.partitioner import partition
    t0 = time.perf_counter()
    part = partition(A.indptr, A.indices, 8, method="metis-like")
    tP = time.perf_counter() - t0
    t0 = time.perf_counter()
    pm = build_partitioned_matrix(A, part, pad_to=128)
    tB = time.perf_counter() - t0
    cm = pm.comm_matrix
    tot = int(cm.sum())
    mx = int(cm.sum(axis=1).max())
    print(f"matrix {tA:.1f} s, partition {tP:.1f} s, plan {tB:.1f} s",
          file=sys.stderr)
    for dt, dname in ((4, "f32"), (8, "f64")):
        print(f"Config 3 (n={n}, {args.stencil}-pt, P=8, {dname}): "
              f"rows/device {pm.L:,}; halo total {tot * dt / 1e6:.2f} MB/"
              f"iter, max/device {mx * dt / 1e6:.2f} MB "
              f"(surface/volume = {mx / pm.L:.4%}); ghost slots/device "
              f"{pm.G:,}")
    slab = 2 * 7 * n * n      # contiguous slabs: 2 faces x (P-1) cuts
    print(f"\nhalo rows (edge-cut proxy): {tot:,} vs contiguous-slab "
          f"partition {slab:,} — {tot / slab:.2f}x the slab cut "
          f"(the multilevel partitioner's quality on this mesh).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
