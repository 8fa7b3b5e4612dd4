#!/usr/bin/env bash
# Combined benchmark sweep — the analogue of the reference's
# scripts/{mpi,nccl,nvshmem}_combined.sh job scripts: run every solver
# variant at every scale point on the standard Poisson benchmark matrix
# with the reference's convergence protocol (max 1000 iterations,
# residual rtol 1e-6, manufactured solution).
#
# On TPU there is one comm backend (XLA collectives), so the sweep axes
# are solver ∈ {acg, acg-pipelined} × halo ∈ {allgather, alltoall} ×
# np ∈ {1, 2, 4, 8}.  Multi-part runs without a multi-chip slice use the
# host-simulated device mesh (ACG_BENCH_CPU=1); on a real slice leave
# ACG_BENCH_CPU unset.
#
# Usage: scripts/bench_combined.sh [N]     (grid size, default 256)

set -u
cd "$(dirname "$0")/.."

N="${1:-256}"
MTX="/tmp/acg_poisson2d_n${N}.mtx"
PY=(python)

if [ ! -f "$MTX" ]; then
    echo "== generating 2-D Poisson n=$N -> $MTX" >&2
    "${PY[@]}" -m acg_tpu.cli.poisson -n "$N" -o "$MTX"
fi

run() {
    echo "== $*" >&2
    if [ "${ACG_BENCH_CPU:-0}" = "1" ]; then
        PYTHONPATH="$PWD" JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
            "${PY[@]}" -m acg_tpu.cli.main "$@"
    else
        "${PY[@]}" -m acg_tpu.cli.main "$@"
    fi
}

COMMON=(--manufactured-solution --max-iterations 1000 --residual-rtol 1e-6 -q -v)

for SOLVER in acg acg-pipelined; do
    run "$MTX" --solver "$SOLVER" "${COMMON[@]}"
    for NP in 2 4 8; do
        for HALO in allgather alltoall; do
            run "$MTX" --solver "$SOLVER" --comm xla --nparts "$NP" \
                --partition-method bfs --halo "$HALO" "${COMMON[@]}"
        done
    done
done

# single-device kernel solvers: fused one-pass (f32) and df64 (f64-parity)
run "$MTX" --solver acg-fused --dtype float32 "${COMMON[@]}"
run "$MTX" --solver acg-df64 "${COMMON[@]}" 
