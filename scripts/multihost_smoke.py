"""Two-process distributed smoke test (VERDICT round-1 weak #5).

Launches TWO OS processes that form one JAX distributed runtime over the
CPU backend (2 virtual devices each → a 4-device global mesh spanning
processes — the DCN-analogue boundary), then runs a distributed pipelined
CG through the library's real multi-process plumbing:

    multihost.init_multihost (ACG_* env contract, parallel/multihost.py)
    → make_mesh over the GLOBAL device list
    → shard_map(pipelined_cg_loop + stencil_spmv_local halo/psum)

and checks convergence + the manufactured-solution error on process 0.
The reference's equivalent capability is mpirun-launched multi-node
operation (scripts/mpi_combined.sh).

Usage:  python scripts/multihost_smoke.py           # parent: spawns both
        (exit 0 and prints MULTIHOST-OK on success)
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child() -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from acg_tpu.parallel.multihost import init_multihost, process_info

    assert init_multihost(), "ACG_* env not picked up"
    pid, nproc = process_info()
    assert nproc == 2, nproc

    import jax.numpy as jnp
    import numpy as np
    from jax import lax, shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
    from acg_tpu.parallel.dist import (make_stencil_plan,
                                       pad_stencil_operand,
                                       pad_stencil_vector,
                                       stencil_spmv_local)
    from acg_tpu.parallel.mesh import AXIS, make_mesh
    from acg_tpu.solvers.cg import CGOptions, pipelined_cg_loop

    nparts = len(jax.devices())           # global devices across processes
    assert nparts == 4, jax.devices()

    offsets, vals = poisson2d_dia(32)     # N=1024
    import scipy.sparse as sp
    ri, ci, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (ri, ci)), shape=(N, N)).tocsr()
    rng = np.random.default_rng(0)        # same seed on both processes
    xstar = rng.standard_normal(N)
    b = A @ xstar

    mesh = make_mesh(nparts)
    plan = make_stencil_plan(offsets, N, nparts, pad_to=128)
    vals_g = pad_stencil_operand(plan, vals)
    b_g = pad_stencil_vector(plan, b)
    x0_g = np.zeros(plan.Ng)

    def put(host_arr, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            host_arr.shape, sharding, lambda idx: host_arr[idx])

    vals_sh = put(vals_g, P(None, AXIS))
    b_sh = put(b_g, P(AXIS))
    x0_sh = put(x0_g, P(AXIS))

    opt = CGOptions(max_iterations=400, residual_rtol=1e-10)

    def local(vals_l, b_l, x0_l):
        spmv = lambda xx: stencil_spmv_local(plan, vals_l, xx, AXIS, "xla")
        red = lambda v: lax.psum(v, AXIS)
        return pipelined_cg_loop(spmv, b_l, x0_l, opt, red)

    scalar_spec = dict(niterations=P(), converged=P(), stalled=P(),
                       bnrm2sqr=P(),
                       r0nrm2sqr=P(), rnrm2sqr=P(), x0nrm2sqr=P(),
                       dxnrm2sqr=P())
    run = jax.jit(shard_map(local, mesh=mesh,
                            in_specs=(P(None, AXIS), P(AXIS), P(AXIS)),
                            out_specs=(P(AXIS), scalar_spec),
                            check_vma=False))
    x, scalars = run(vals_sh, b_sh, x0_sh)
    conv = bool(jax.device_get(scalars["converged"]))
    iters = int(jax.device_get(scalars["niterations"]))
    # gather the distributed solution to every process for the error check
    x_rep = jax.device_get(
        jax.jit(lambda v: v, out_shardings=NamedSharding(mesh, P()))(x))
    err = float(np.linalg.norm(np.asarray(x_rep)[:N] - xstar))
    assert conv, "did not converge"
    assert err < 1e-6, err
    if pid == 0:
        print(f"MULTIHOST-OK iters={iters} err={err:.2e} "
              f"procs={nproc} devices={nparts}", flush=True)
    return 0


def parent() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env_common = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2",
        ACG_COORDINATOR=f"127.0.0.1:{port}",
        ACG_NUM_PROCESSES="2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = []
    for rank in (0, 1):
        env = dict(env_common, ACG_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    ok = True
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0:
            ok = False
            print(f"--- rank {rank} failed (rc={p.returncode}) ---\n{out}")
        elif "MULTIHOST-OK" in out:
            print(out.strip().splitlines()[-1])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(child() if "--child" in sys.argv else parent())
