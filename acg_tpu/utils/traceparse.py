"""Measured per-op times from jax.profiler traces.

The reference measures per-op times with CUDA events recorded around every
operation each iteration (cgcuda.c:585-610, accumulated at 1057-1095).
The XLA analogue: the solver's named scopes (acg.spmv / acg.dot /
acg.update, solvers/cg.py) survive into the optimized HLO as instruction
``metadata={op_name=...}``; jax.profiler records one timed event per
executed HLO instruction, keyed by the instruction name (``hlo_op``).
Joining the two gives true measured per-op durations:

    trace event (hlo_op, dur) ──join── HLO text (instr name → acg scope)

Collective instructions (all-reduce / collective-permute / all-gather /
all-to-all) are classified by opcode so the allreduce/halo rows are
measured even though they carry no acg scope.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re

# instruction-definition lines of optimized HLO text
_HLO_LINE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+(\S+?)\(")
_SCOPE = re.compile(r"op_name=\"[^\"]*?(acg\.[\w]+)")

# HLO opcodes mapped to report rows regardless of scope
_COLLECTIVES = {
    "all-reduce": "allreduce",
    "all-reduce-start": "allreduce",
    "all-reduce-done": "allreduce",
    "collective-permute": "halo",
    "collective-permute-start": "halo",
    "collective-permute-done": "halo",
    "all-gather": "halo",
    "all-gather-start": "halo",
    "all-gather-done": "halo",
    "all-to-all": "halo",
}

# acg named scopes mapped to the acgsolver_fwrite rows
SCOPE_TO_ROW = {
    "acg.spmv": "gemv",
    "acg.dot": "dot",
    "acg.dot2": "dot",
    "acg.nrm2": "nrm2",
    "acg.update": "axpy",
    "acg.fused_update": "axpy",
    "acg.fused_iter": "fused_iter",
    "acg.df64_iter": "fused_iter",
}


def hlo_scope_map(compiled_text: str) -> dict[str, str]:
    """instruction name → report row, from optimized HLO text."""
    out: dict[str, str] = {}
    for line in compiled_text.splitlines():
        m = _HLO_LINE.match(line)
        if not m:
            continue
        name, opcode = m.group(1), m.group(2)
        row = _COLLECTIVES.get(opcode)
        if row is None:
            s = _SCOPE.search(line)
            if s:
                row = SCOPE_TO_ROW.get(s.group(1))
        if row:
            out[name] = row
    return out


def parse_trace_events(trace_dir: str) -> dict[str, tuple[float, int]]:
    """hlo_op → (total duration in seconds, event count) from the newest
    trace.json.gz under ``trace_dir``."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    acc: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        # XLA:CPU labels events with args.hlo_op; the TPU runtime puts
        # the HLO instruction name directly in the event name (host
        # python events also land here, but they never match an HLO
        # instruction in the join, so they are harmless)
        op = args.get("hlo_op") or e.get("name")
        if not op:
            continue
        a = acc[op]
        a[0] += e.get("dur", 0.0) * 1e-6   # trace durations are in us
        a[1] += 1
    return {k: (v[0], v[1]) for k, v in acc.items()}


def measured_op_times(trace_dir: str,
                      compiled_text: str) -> dict[str, tuple[float, int]]:
    """report row → (measured seconds, executed instruction count)."""
    rows: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])
    scope_of = hlo_scope_map(compiled_text)
    for op, (dur, n) in parse_trace_events(trace_dir).items():
        row = scope_of.get(op)
        if row is None:
            # fusions are sometimes renamed with numeric suffixes between
            # text and trace; retry without the trailing ".N"
            row = scope_of.get(op.rsplit(".", 1)[0])
        if row is None:
            continue
        rows[row][0] += dur
        rows[row][1] += n
    return {k: (v[0], v[1]) for k, v in rows.items()}
