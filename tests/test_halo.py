"""Halo-exchange strategies and the communicator abstraction.

The all-to-all halo (neighbour-alltoallv analogue) must deliver exactly
the same ghosts as the all-gather strategy, and distributed solves must be
bit-comparable between the two (the exchange is exact, not approximate).
"""

import jax
import numpy as np
import pytest
import scipy.sparse as sp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from acg_tpu.core.dia import DiaOperator
from acg_tpu.io.generators import dia_to_coo, poisson2d_dia
from acg_tpu.parallel.comm import Comm, CommType, make_comm
from acg_tpu.parallel.halo import allgather_halo, alltoall_halo
from acg_tpu.parallel.mesh import AXIS, make_mesh
from acg_tpu.partition.graph import build_partitioned_matrix
from acg_tpu.partition.partitioner import partition_bfs_recursive
from acg_tpu.solvers.cg import CGOptions, solve
from acg_tpu.solvers.dist_cg import solve_dist_general


def _system(n, rng, nparts, seed=0):
    offsets, vals = poisson2d_dia(n)
    rowidx, colidx, a, N = dia_to_coo(offsets, vals)
    A = sp.coo_matrix((a, (rowidx, colidx)), shape=(N, N)).tocsr()
    part = partition_bfs_recursive(A.indptr, A.indices, nparts, seed=seed)
    pm = build_partitioned_matrix(A, part, pad_to=8)
    xstar = rng.standard_normal(N)
    xstar /= np.linalg.norm(xstar)
    return A, pm, xstar, A @ xstar


def test_alltoall_ghosts_match_allgather(rng):
    """Both strategies must fill identical ghost buffers for the same x."""
    A, pm, _, _ = _system(10, rng, 8, seed=3)
    mesh = make_mesh(pm.P)
    x_l = rng.standard_normal((pm.P, pm.L))

    def run_ag(si, gd, gs, xl):
        return allgather_halo(xl[0], si[0], gd[0], gs[0], AXIS)[None]

    def run_a2a(si, gd, gs, xl):
        return alltoall_halo(xl[0], si[0], gd[0], gs[0], AXIS)[None]

    specs = dict(in_specs=(P(AXIS),) * 4, out_specs=P(AXIS))
    g_ag = jax.jit(shard_map(run_ag, mesh=mesh, **specs))(
        pm.send_idx, pm.ghost_src_dev, pm.ghost_src_slot, x_l)
    g_a2a = jax.jit(shard_map(run_a2a, mesh=mesh, **specs))(
        pm.pair_send_idx, pm.ghost_src_dev, pm.ghost_src_pair_slot, x_l)
    # valid ghost slots must agree exactly (padding slots are inert: their
    # interface-block values are zero, so their contents are unspecified)
    for p in range(pm.P):
        ng = pm.n_ghost[p]
        np.testing.assert_array_equal(np.asarray(g_ag)[p, :ng],
                                      np.asarray(g_a2a)[p, :ng])
    # and the ghosts are the true remote values
    for p in range(pm.P):
        for i in range(pm.n_ghost[p]):
            g = pm.ghost_global[p, i]
            q = pm.part[g]
            slot = pm.global_to_local[g]
            assert np.asarray(g_ag)[p, i] == x_l[q, slot]


@pytest.mark.parametrize("method", ["cg", "pipelined"])
def test_dist_general_alltoall_solve(method, rng):
    A, pm, xstar, b = _system(12, rng, 4)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-10)
    x, info = solve_dist_general(pm, b, opt=opt, method=method,
                                 halo="alltoall")
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8


def test_halo_strategies_identical_history(rng):
    """The exchange is exact, so residual histories must agree to roundoff
    between strategies (regression oracle, SURVEY.md §4.2)."""
    A, pm, _, b = _system(10, rng, 8, seed=1)
    opt = CGOptions(max_iterations=25, residual_rtol=1e-30)
    _, i_ag = solve_dist_general(pm, b, opt=opt, history=True)
    _, i_a2a = solve_dist_general(pm, b, opt=opt, history=True,
                                  halo="alltoall")
    np.testing.assert_allclose(i_ag.residual_history, i_a2a.residual_history,
                               rtol=1e-12)


def test_pair_plan_covers_comm_matrix(rng):
    """Every p→q word in the comm matrix has a pair-buffer slot and M bounds
    the max edge."""
    A, pm, _, _ = _system(10, rng, 8, seed=2)
    assert pm.M >= pm.comm_matrix.max()
    assert pm.pair_send_idx.shape == (pm.P, pm.P, pm.M)
    # ghosts from q occupy slots [0, comm_matrix[q, p])
    for p in range(pm.P):
        gsd = pm.ghost_src_dev[p, : pm.n_ghost[p]]
        gps = pm.ghost_src_pair_slot[p, : pm.n_ghost[p]]
        for q in range(pm.P):
            sel = gsd == q
            assert sel.sum() == pm.comm_matrix[q, p]
            if sel.any():
                assert gps[sel].max() == sel.sum() - 1


# ---------------------------------------------------------------------------
# Comm abstraction (acgcomm analogue)


def test_commtype_parse_aliases():
    for name in ("mpi", "nccl", "nvshmem", "rccl", "rocshmem", "xla"):
        assert CommType.parse(name) == CommType.XLA
    assert CommType.parse("none") == CommType.NULL
    with pytest.raises(ValueError):
        CommType.parse("smoke-signals")


def test_comm_null_is_identity():
    c = make_comm("none", 1)
    assert c.is_null
    v = np.float64(3.5)
    assert c.allreduce(v) == v


def test_comm_allreduce_under_shard_map():
    mesh = make_mesh(8)
    c = make_comm("xla", 8)

    def f(x):
        return c.allreduce(x[0])[None]

    x = np.arange(8, dtype=np.float64).reshape(8, 1)
    out = jax.jit(shard_map(f, mesh=mesh, in_specs=(P(AXIS),),
                            out_specs=P(AXIS)))(x)
    np.testing.assert_array_equal(np.asarray(out).ravel(), np.full(8, 28.0))


def test_multihost_helper_noop_and_info():
    """Without coordinator env vars init_multihost is a no-op; process
    info reports single-process."""
    from acg_tpu.parallel.multihost import init_multihost, process_info
    assert init_multihost() is False
    pid, n = process_info()
    assert (pid, n) == (0, 1)


def test_alltoall_two_parts(rng):
    """P=2 edge case of the pairwise halo (single neighbour each side)."""
    A, pm, xstar, b = _system(10, rng, 2, seed=4)
    opt = CGOptions(max_iterations=1000, residual_rtol=1e-10)
    x, info = solve_dist_general(pm, b, opt=opt, method="pipelined",
                                 halo="alltoall")
    assert info.converged
    assert np.linalg.norm(x - xstar) < 1e-8


def _simulate_ragged(pm, x_l):
    """Host-side execution of the ragged plan: what lax.ragged_all_to_all
    would deliver on hardware (XLA:CPU has no thunk, so the plan is
    verified by simulation; the dryrun reports the hardware path as
    skipped on CPU)."""
    P_ = pm.P
    ghosts = np.zeros((P_, pm.G), dtype=x_l.dtype)
    for p in range(P_):                       # sender
        sendbuf = x_l[p][pm.ragged_send_idx[p]]
        for q in range(P_):                   # receiver
            n = pm.ragged_send_sizes[p, q]
            if n == 0:
                continue
            src = pm.ragged_input_offsets[p, q]
            dst = pm.ragged_output_offsets[p, q]
            ghosts[q, dst:dst + n] = sendbuf[src:src + n]
    return ghosts


def test_ragged_plan_matches_allgather_ghosts(rng):
    """The ragged plan, executed per its offset/size contract, must fill
    the exact ghost buffers the all-gather strategy produces — and with
    exact wire volume (sum of send_sizes == comm_matrix total)."""
    A, pm, _, _ = _system(10, rng, 8, seed=3)
    mesh = make_mesh(pm.P)
    x_l = rng.standard_normal((pm.P, pm.L))

    def run_ag(si, gd, gs, xl):
        return allgather_halo(xl[0], si[0], gd[0], gs[0], AXIS)[None]

    g_ag = jax.jit(shard_map(run_ag, mesh=mesh, in_specs=(P(AXIS),) * 4,
                             out_specs=P(AXIS)))(
        pm.send_idx, pm.ghost_src_dev, pm.ghost_src_slot, x_l)
    g_rg = _simulate_ragged(pm, x_l)
    for p in range(pm.P):
        ng = pm.n_ghost[p]
        np.testing.assert_array_equal(g_rg[p, :ng], np.asarray(g_ag)[p, :ng])
    # exact wire volume: every p→q edge ships exactly comm_matrix[p, q]
    assert pm.ragged_send_sizes.sum() == pm.comm_matrix.sum()
    np.testing.assert_array_equal(pm.ragged_recv_sizes, pm.comm_matrix.T)
    # offsets are consistent prefix sums
    np.testing.assert_array_equal(
        pm.ragged_input_offsets[:, -1] + pm.ragged_send_sizes[:, -1],
        pm.comm_matrix.sum(axis=1))
    np.testing.assert_array_equal(
        pm.ragged_output_offsets[-1, :] + pm.ragged_send_sizes[-1, :],
        pm.n_ghost)


def test_ragged_halo_cpu_reports_no_thunk(rng):
    """halo='ragged' compiles everywhere; on XLA:CPU it must surface the
    backend's UNIMPLEMENTED at run time (hardware-gated path — the dryrun
    catches exactly this and reports 'skipped')."""
    A, pm, xstar, b = _system(8, rng, 4, seed=1)
    with pytest.raises(Exception, match="(?i)unimplemented|ragged"):
        solve_dist_general(pm, b, opt=CGOptions(max_iterations=50),
                           method="pipelined", halo="ragged")


def test_ragged_halo_program_lowers(rng):
    """The ragged-all-to-all halo program LOWERS on the virtual mesh with
    the ragged collective in it — so the TPU-only path's program
    construction (plan shapes, sharding specs, dtypes) is regression-
    checked without hardware; XLA:CPU then refuses only at thunk
    emission (pinned below).  Execution-level checks are the host
    simulation in test_ragged_plan_matches_allgather_ghosts."""
    from acg_tpu.parallel.halo import ragged_halo

    A, pm, _, _ = _system(10, rng, 8, seed=3)
    mesh = make_mesh(pm.P)
    x_l = rng.standard_normal((pm.P, pm.L))

    def exchange_local(x, si, io, ss, oo, rs):
        ghosts = ragged_halo(x[0], si[0], io[0], ss[0], oo[0], rs[0],
                             pm.G, AXIS)
        return ghosts[None]

    exchange = jax.jit(shard_map(
        exchange_local, mesh=mesh, in_specs=(P(AXIS),) * 6,
        out_specs=P(AXIS), check_vma=False))
    args = (x_l, pm.ragged_send_idx, pm.ragged_input_offsets,
            pm.ragged_send_sizes, pm.ragged_output_offsets,
            pm.ragged_recv_sizes)
    hlo = exchange.lower(*args).as_text()
    assert "ragged_all_to_all" in hlo or "ragged-all-to-all" in hlo, \
        hlo[:500]
    # XLA:CPU has no thunk — execution must fail loudly (UNIMPLEMENTED),
    # never silently fall back to a different collective
    with pytest.raises(Exception, match="ragged"):
        jax.block_until_ready(exchange(*args))
