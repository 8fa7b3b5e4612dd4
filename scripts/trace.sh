#!/usr/bin/env bash
# Profiler-trace runs (scripts/trace_{mpi,nvshmem}.sh analogue): the same
# benchmark solves wrapped in a jax.profiler trace instead of nsys.  The
# named scopes inside the solver loops (acg.spmv / acg.dot / acg.update /
# acg.fused_update) play the role of the reference's NVTX ranges.
#
# Output: Perfetto/TensorBoard-compatible trace directories under
# ${ACG_TRACE_DIR:-/tmp/acg_traces}.
#
# Usage: scripts/trace.sh [N]    (grid size, default 256)

set -u
cd "$(dirname "$0")/.."

N="${1:-256}"
MTX="/tmp/acg_poisson2d_n${N}.mtx"
TRACES="${ACG_TRACE_DIR:-/tmp/acg_traces}"

if [ ! -f "$MTX" ]; then
    python -m acg_tpu.cli.poisson -n "$N" -o "$MTX"
fi
mkdir -p "$TRACES"

COMMON=(--manufactured-solution --max-iterations 200 --residual-rtol 1e-6 -q -v)

for SOLVER in acg acg-pipelined; do
    OUT="$TRACES/${SOLVER}_n${N}"
    echo "== tracing $SOLVER -> $OUT" >&2
    python -m acg_tpu.cli.main "$MTX" --solver "$SOLVER" \
        --trace "$OUT" "${COMMON[@]}"
done
echo "traces in $TRACES (open with TensorBoard or ui.perfetto.dev)" >&2
