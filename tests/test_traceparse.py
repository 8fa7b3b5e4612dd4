"""Measured per-op times from profiler traces (the reference's CUDA-event
profiling, cgcuda.c:585-610/1057-1095, re-expressed as trace-join):
profiler events keyed by hlo_op joined against the executed program's
optimized HLO metadata (named scopes acg.spmv/acg.dot/...)."""

import numpy as np
import pytest

from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import poisson2d_dia
from acg_tpu.solvers.cg import CGOptions, last_compiled_text, solve
from acg_tpu.solvers.stats import format_report
from acg_tpu.utils.traceparse import (hlo_scope_map, measured_op_times,
                                      parse_trace_events)


@pytest.fixture(scope="module")
def traced_solve(tmp_path_factory):
    import jax
    tdir = str(tmp_path_factory.mktemp("trace"))
    offsets, vals = poisson2d_dia(32)
    op = DiaOperator.from_arrays(offsets, vals, pad_to=128)
    b = np.random.default_rng(0).standard_normal(op.N)
    opt = CGOptions(max_iterations=40, residual_rtol=0.0)
    solve(op, b, opt=opt, method="pipelined")          # compile outside
    with jax.profiler.trace(tdir):
        x, info = solve(op, b, opt=opt, method="pipelined")
    return tdir, op, info, opt


def test_scope_map_from_compiled_text(traced_solve):
    text = last_compiled_text()
    assert text is not None
    m = hlo_scope_map(text)
    rows = set(m.values())
    assert "gemv" in rows    # acg.spmv scope survived into optimized HLO
    assert "dot" in rows or "axpy" in rows


def test_trace_events_parse(traced_solve):
    tdir, *_ = traced_solve
    ev = parse_trace_events(tdir)
    assert ev, "no hlo_op events found in trace"
    total = sum(d for d, _ in ev.values())
    assert total > 0


def test_measured_rows_and_report(traced_solve):
    tdir, op, info, opt = traced_solve
    text = last_compiled_text()
    measured = measured_op_times(tdir, text)
    assert "gemv" in measured
    t, n = measured["gemv"]
    assert t > 0 and n >= info.niterations   # one SpMV event per iteration
    report = format_report(op, info, opt, "acg-pipelined", tsolve=1.0,
                           measured=measured)
    assert "MEASURED" in report
    assert "(measured)" in report


# --- distributed trace join (the per-rank breakdown of cgcuda.c:1927-2120:
# there per-rank CUDA events around halo pack/send/waitall; here profiler
# events joined against the AOT-compiled shard_map program, which adds
# measured allreduce/halo rows classified by collective opcode) -----------

@pytest.fixture(scope="module")
def traced_dist_solve(tmp_path_factory):
    import jax

    from acg_tpu.solvers.dist_cg import solve_dist_stencil
    tdir = str(tmp_path_factory.mktemp("trace_dist"))
    offsets, vals = poisson2d_dia(32)
    b = np.random.default_rng(1).standard_normal(vals.shape[1])
    opt = CGOptions(max_iterations=40, residual_rtol=0.0)
    kw = dict(nparts=8, opt=opt, method="pipelined")
    solve_dist_stencil(offsets, vals, b, **kw)     # compile outside
    with jax.profiler.trace(tdir):
        x, info = solve_dist_stencil(offsets, vals, b, **kw)
    return tdir, info


def test_distributed_program_published(traced_dist_solve):
    # the dist solvers AOT-compile and publish the same last-compiled
    # slot as the single-device path, so --trace has one lookup
    text = last_compiled_text()
    assert text is not None
    assert "all-reduce" in text                    # it IS the shard_map prog
    rows = set(hlo_scope_map(text).values())
    assert "allreduce" in rows
    assert "gemv" in rows                          # shared iteration body


def test_distributed_measured_rows(traced_dist_solve):
    tdir, info = traced_dist_solve
    measured = measured_op_times(tdir, last_compiled_text())
    assert "allreduce" in measured and measured["allreduce"][0] > 0
    assert "gemv" in measured and measured["gemv"][0] > 0
