"""Collective-count pins: the compiled distributed programs must contain
exactly the communication the algorithm model predicts (SURVEY.md §2.4,
BASELINE.md weak-scaling model; the reference's per-iteration comm is one
halo exchange + the dot allreduces, cgcuda.c:855-1054).

The counts are read from the compiled HLO of the 8-virtual-device
programs, so a regression that silently adds a collective (e.g. a
resharding XLA inserts because an in-loop sharding annotation changed)
fails here before it ever reaches hardware, where it would be an ICI
bandwidth bug rather than a wrong answer.

Model, per compiled while-loop body with check_every=1 (one iteration):

  * pipelined CG (stencil): ONE all-reduce — the stacked (γ, δ) pair —
    and one ring halo exchange = 2 collective-permutes (left + right
    shift).  This is the Chronopoulos/Gear single-reduction property.
  * classic CG (general partition): TWO all-reduces (p·t, then r'·r')
    plus 1 all-gather halo.
  * setup (outside the loop): b/x0 norms and γ0/δ0 — not counted here.
"""

import re

import numpy as np
import pytest
import scipy.sparse as sp

from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
from acg_tpu.partition.graph import build_partitioned_matrix
from acg_tpu.partition.partitioner import partition_bfs_recursive
from acg_tpu.solvers.cg import CGOptions, _LAST_COMPILED
from acg_tpu.solvers.dist_cg import solve_dist_general, solve_dist_stencil


def _counts(hlo: str) -> dict:
    ops = ("all-reduce", "collective-permute", "all-gather", "all-to-all",
           "ragged-all-to-all")
    out = {}
    for op in ops:
        # start/done pairs (async) count once; plain sync ops count once
        n_sync = len(re.findall(rf"= \S+ {op}\(", hlo))
        n_async = len(re.findall(rf"= \S+ {op}-start\(", hlo))
        out[op] = n_sync + n_async
    return out


def _while_bodies(hlo: str) -> list[str]:
    """Extract the computations used as while-loop bodies."""
    names = re.findall(r"body=%?([\w.\-]+)", hlo)
    bodies = []
    for name in names:
        m = re.search(rf"^%?{re.escape(name)}[^\n]*\{{(.*?)^\}}", hlo,
                      re.S | re.M)
        if m:
            bodies.append(m.group(1))
    return bodies


def _system(rng, n=16):
    offsets, vals = poisson2d_dia(n)
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    b = rng.standard_normal(N)
    return offsets, vals, A, b


def test_pipelined_stencil_single_allreduce_per_iteration(rng):
    """Pipelined CG body: exactly 1 all-reduce (the stacked 2-element
    (γ, δ) reduction) and 2 collective-permutes (ring halo) — the comm
    volume the weak-scaling model assumes."""
    offsets, vals, A, b = _system(rng)
    opt = CGOptions(max_iterations=4, residual_rtol=0.0, check_every=1)
    solve_dist_stencil(offsets, vals, b, nparts=8, opt=opt,
                       method="pipelined", pad_to=128)
    hlo = _LAST_COMPILED[0].as_text()
    bodies = _while_bodies(hlo)
    assert bodies, "no while body found in compiled HLO"
    per_iter = max((_counts(bd) for bd in bodies),
                   key=lambda c: sum(c.values()))
    assert per_iter["all-reduce"] == 1, per_iter
    assert per_iter["collective-permute"] == 2, per_iter
    assert per_iter["all-gather"] == 0, per_iter


def test_cg_general_two_allreduces_one_allgather(rng):
    """Classic CG on a general partition: 2 all-reduces + 1 all-gather
    halo per iteration, nothing else."""
    offsets, vals, A, b = _system(rng)
    part = partition_bfs_recursive(A.indptr, A.indices, 8, seed=0)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    opt = CGOptions(max_iterations=4, residual_rtol=0.0, check_every=1)
    solve_dist_general(pm, b, opt=opt, method="cg")
    hlo = _LAST_COMPILED[0].as_text()
    bodies = _while_bodies(hlo)
    assert bodies
    per_iter = max((_counts(bd) for bd in bodies),
                   key=lambda c: sum(c.values()))
    assert per_iter["all-reduce"] == 2, per_iter
    assert per_iter["all-gather"] == 1, per_iter
    assert per_iter["collective-permute"] == 0, per_iter


def test_check_every_keeps_per_iteration_collectives(rng):
    """check_every=4 wraps 4 iterations in an inner fori_loop (its own
    while body in HLO): the per-iteration comm count must stay exactly
    1 all-reduce + 2 collective-permutes — amortizing the convergence
    predicate must not change the wire traffic per iteration."""
    offsets, vals, A, b = _system(rng)
    opt = CGOptions(max_iterations=8, residual_rtol=0.0, check_every=4)
    solve_dist_stencil(offsets, vals, b, nparts=8, opt=opt,
                       method="pipelined", pad_to=128)
    hlo = _LAST_COMPILED[0].as_text()
    bodies = _while_bodies(hlo)
    assert len(bodies) >= 2           # outer predicate loop + inner block
    per_iter = max((_counts(bd) for bd in bodies),
                   key=lambda c: sum(c.values()))
    assert per_iter["all-reduce"] == 1, per_iter
    assert per_iter["collective-permute"] == 2, per_iter


def test_sell_fused_general_one_allreduce_one_allgather(rng):
    """Fused SELL pipelined CG on a general partition: ONE all-reduce
    (the fused update pass emits the stacked (γ, δ) pair) plus 1
    all-gather halo per iteration — the chunked-gather fast path keeps
    the Chronopoulos/Gear single-reduction property."""
    offsets, vals, A, b = _system(rng)
    part = partition_bfs_recursive(A.indptr, A.indices, 8, seed=0)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    opt = CGOptions(max_iterations=4, residual_rtol=0.0, check_every=1,
                    dot_dtype="mixed")
    solve_dist_general(pm, b.astype(np.float32), opt=opt,
                       method="pipelined-fused", operator="sell",
                       dtype=np.float32)
    hlo = _LAST_COMPILED[0].as_text()
    bodies = _while_bodies(hlo)
    assert bodies
    per_iter = max((_counts(bd) for bd in bodies),
                   key=lambda c: sum(c.values()))
    assert per_iter["all-reduce"] == 1, per_iter
    assert per_iter["all-gather"] == 1, per_iter
    assert per_iter["collective-permute"] == 0, per_iter


def test_sell_df64_general_one_allreduce_two_allgathers(rng):
    """df64 SELL pipelined CG: the (hi, lo) halo costs TWO all-gathers
    (one per component) and still one all-reduce per iteration — the
    f64-parity path's comm volume is exactly 2x the f32 halo bytes."""
    offsets, vals, A, b = _system(rng)
    part = partition_bfs_recursive(A.indptr, A.indices, 8, seed=0)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    opt = CGOptions(max_iterations=4, residual_rtol=0.0, check_every=1)
    solve_dist_general(pm, b, opt=opt, method="pipelined-df64",
                       operator="sell")
    hlo = _LAST_COMPILED[0].as_text()
    bodies = _while_bodies(hlo)
    assert bodies
    per_iter = max((_counts(bd) for bd in bodies),
                   key=lambda c: sum(c.values()))
    assert per_iter["all-reduce"] == 1, per_iter
    assert per_iter["all-gather"] == 2, per_iter
    assert per_iter["collective-permute"] == 0, per_iter
