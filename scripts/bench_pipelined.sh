#!/usr/bin/env bash
# Pipelined-only benchmark sweep (scripts/*_pipelined.sh analogue):
# the single-reduction Gear/Chronopoulos solver across scale points.
#
# Usage: scripts/bench_pipelined.sh [N]    (grid size, default 256)

set -u
cd "$(dirname "$0")/.."

N="${1:-256}"
MTX="/tmp/acg_poisson2d_n${N}.mtx"

if [ ! -f "$MTX" ]; then
    python -m acg_tpu.cli.poisson -n "$N" -o "$MTX"
fi

run() {
    echo "== $*" >&2
    if [ "${ACG_BENCH_CPU:-0}" = "1" ]; then
        PYTHONPATH="$PWD" JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
            python -m acg_tpu.cli.main "$@"
    else
        python -m acg_tpu.cli.main "$@"
    fi
}

COMMON=(--solver acg-pipelined --manufactured-solution
        --max-iterations 1000 --residual-rtol 1e-6 -q -v)

run "$MTX" "${COMMON[@]}"
for NP in 2 4 8; do
    run "$MTX" --comm xla --nparts "$NP" "${COMMON[@]}"
done
