"""Distributed CG solvers over a device mesh.

The reference's multi-GPU drivers (acgsolver[cuda]_solvempi and friends)
partition rows via METIS, halo-exchange ghost entries before every SpMV,
and all-reduce the dot products (cg.c:490-614, cgcuda.c:855-1054).  Here
the *same* iteration bodies as the single-device solvers (solvers/cg.py)
run inside one `shard_map` over a 1-D mesh:

  * SpMV → per-device owned-rows SpMV with the halo exchange fused in
    (parallel/dist.py), interior compute overlappable with the collective;
  * scalar reductions → `lax.psum` over the mesh axis (classic CG: two
    per iteration; pipelined: ONE stacked 2-element psum);
  * the entire while_loop compiles into a single XLA program — collectives
    scheduled on-chip with zero host round-trips, the device-initiated
    execution model of cg-kernels-cuda.cu:627-970 as a compiler artifact.

Two operator paths:
  * stencil/banded (contiguous partition): DIA slabs + two-ppermute halo;
  * general (any partition vector, e.g. METIS-style): ELL owned+interface
    blocks + all-gather halo.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.dist import (general_spmv_with_ghosts, make_stencil_plan,
                             pad_stencil_operand, pad_stencil_vector,
                             stencil_spmv_local)
from ..parallel.halo import allgather_halo, alltoall_halo, ragged_halo
from ..parallel.mesh import AXIS, make_mesh
from ..partition.graph import PartitionedMatrix, gather_vector, scatter_vector
from .cg import (CGOptions, SolveInfo, cg_history_scan, cg_loop,
                 pipelined_cg_history_scan, pipelined_cg_loop)


def _info_from_scalars(scalars, hist=None) -> SolveInfo:
    scalars = jax.device_get(scalars)
    dx = scalars["dxnrm2sqr"]
    return SolveInfo(
        niterations=int(scalars["niterations"]),
        converged=bool(scalars["converged"]),
        bnrm2=float(np.sqrt(scalars["bnrm2sqr"])),
        r0nrm2=float(np.sqrt(scalars["r0nrm2sqr"])),
        rnrm2=float(np.sqrt(scalars["rnrm2sqr"])),
        x0nrm2=float(np.sqrt(scalars["x0nrm2sqr"])),
        dxnrm2=float(np.sqrt(dx)) if np.isfinite(dx) else 0.0,
        residual_history=None if hist is None else np.asarray(hist),
        stalled=bool(np.asarray(scalars.get("stalled", False)).reshape(-1)[0]),
    )


def _loop_fns(method: str, history: bool):
    if method == "cg":
        return cg_history_scan if history else cg_loop
    if method == "pipelined":
        return pipelined_cg_history_scan if history else pipelined_cg_loop
    raise ValueError(f"unknown method {method!r}")


# Compiled-program cache: repeated solves with the same static
# configuration (mesh, plan, options, method) reuse the compiled shard_map
# program instead of re-tracing — the init/solve split of the reference
# (acgsolvercuda_init once, then many solves, cgcuda.c:143-332/403).
# Programs are AOT-lowered (jit(...).lower(args).compile()) so the
# optimized HLO text of the exact executed program is retrievable: the
# CLI --trace report joins profiler events against it at nparts>1 too —
# the distributed per-op breakdown of cgcuda.c:1927-2120.
_RUN_CACHE: dict = {}


def _compile_and_record(jitted, *example_args):
    """AOT-compile and publish as the most recent solve program (shared
    slot with the single-device path so cli --trace has ONE lookup)."""
    from .cg import _LAST_COMPILED
    compiled = jitted.lower(*example_args).compile()
    _LAST_COMPILED[0] = compiled
    return compiled


def _mesh_key(mesh):
    return (mesh.axis_names, tuple(d.id for d in mesh.devices.flat))


# ---------------------------------------------------------------------------
# Stencil / banded path (contiguous partition)


def build_stencil_dist(offsets, vals: np.ndarray, nparts: int | None = None,
                       dtype=None, pad_to: int = 256, devices=None):
    """Prepare mesh + plan + sharded operand for a banded operator.

    Returns (mesh, plan, vals_sharded)."""
    mesh = make_mesh(nparts, devices)
    nparts = mesh.shape[AXIS]
    K, N = np.asarray(vals).shape
    plan = make_stencil_plan(offsets, N, nparts, pad_to)
    vals_g = pad_stencil_operand(plan, np.asarray(vals))
    if dtype is not None:
        vals_g = vals_g.astype(dtype)
    vals_sh = jax.device_put(vals_g, NamedSharding(mesh, P(None, AXIS)))
    return mesh, plan, vals_sh


def solve_dist_stencil(offsets, vals: np.ndarray, b: np.ndarray,
                       nparts: int | None = None, x0: np.ndarray | None = None,
                       opt: CGOptions = CGOptions(), method: str = "cg",
                       history: bool = False, dtype=None, pad_to: int = 256,
                       devices=None, backend: str = "xla"):
    """Distributed solve of a banded system (Config 3/4 of BASELINE.md).

    ``backend="pallas"`` uses the streaming SpMV kernel per device.
    Returns (x (N,) numpy, SolveInfo)."""
    mesh, plan, vals_sh = build_stencil_dist(offsets, vals, nparts, dtype,
                                             pad_to, devices)
    vdtype = vals_sh.dtype
    b_g = pad_stencil_vector(plan, np.asarray(b)).astype(vdtype)
    x0_g = (np.zeros(plan.Ng, dtype=vdtype) if x0 is None
            else pad_stencil_vector(plan, np.asarray(x0)).astype(vdtype))
    vsh = NamedSharding(mesh, P(AXIS))
    b_sh = jax.device_put(b_g, vsh)
    x0_sh = jax.device_put(x0_g, vsh)

    key = ("stencil", _mesh_key(mesh), plan, opt, method, history, backend)
    run = _RUN_CACHE.get(key)
    if run is None:
        if method in ("pipelined-fused", "pipelined-df64"):
            if history:
                raise ValueError(f"{method} has no history variant")
            from ..ops.pallas_dia import pallas_halo_width
            from ..parallel.halo import stencil_halo
            from .cg import pipelined_cg_loop_df64, pipelined_cg_loop_fused
            hw_p = pallas_halo_width(plan.hw)

            def local(vals_l, b_l, x0_l):
                def extend_fn(v):
                    left, right = stencil_halo(v, plan.hw, plan.nparts, AXIS)
                    pad = jnp.zeros((hw_p - plan.hw,), v.dtype)
                    return jnp.concatenate([pad, left, v, right, pad])

                red = lambda v: lax.psum(v, AXIS)
                if method == "pipelined-df64":
                    spmv = lambda xx: stencil_spmv_local(plan, vals_l, xx,
                                                         AXIS, "xla")
                    return pipelined_cg_loop_df64(
                        None, b_l, x0_l, opt, red, spmv=spmv, vals=vals_l,
                        offsets=plan.offsets, hw=hw_p,
                        ext2=lambda wh, wl: (extend_fn(wh), extend_fn(wl)))
                spmv = lambda xx: stencil_spmv_local(plan, vals_l, xx, AXIS,
                                                     "pallas")
                return pipelined_cg_loop_fused(
                    None, b_l, x0_l, opt, red, extend_fn=extend_fn,
                    spmv=spmv, vals=vals_l, offsets=plan.offsets, hw=hw_p)
        else:
            fn = _loop_fns(method, history)

            def local(vals_l, b_l, x0_l):
                spmv = lambda xx: stencil_spmv_local(plan, vals_l, xx, AXIS,
                                                     backend)
                red = lambda v: lax.psum(v, AXIS)
                return fn(spmv, b_l, x0_l, opt, red)

        scalar_spec = dict(niterations=P(), converged=P(), stalled=P(),
                           bnrm2sqr=P(),
                           r0nrm2sqr=P(), rnrm2sqr=P(), x0nrm2sqr=P(),
                           dxnrm2sqr=P())
        out_specs = (P(AXIS), scalar_spec) if not history else \
            (P(AXIS), scalar_spec, P())
        run = _compile_and_record(
            jax.jit(shard_map(local, mesh=mesh,
                              in_specs=(P(None, AXIS), P(AXIS), P(AXIS)),
                              out_specs=out_specs, check_vma=False)),
            vals_sh, b_sh, x0_sh)
        _RUN_CACHE[key] = run
    else:
        from .cg import _LAST_COMPILED
        _LAST_COMPILED[0] = run
    out = run(vals_sh, b_sh, x0_sh)
    if history:
        x, scalars, hist = out
        info = _info_from_scalars(scalars, hist)
    else:
        x, scalars = out
        info = _info_from_scalars(scalars)
    return np.asarray(x)[: plan.N], info


# ---------------------------------------------------------------------------
# General partitioned path (any partition vector)


HALO_METHODS = ("allgather", "alltoall", "ragged")


def _halo_plan(pm: PartitionedMatrix, halo: str):
    """(host-side halo-plan arrays, exchange fn) for the chosen strategy
    (SURVEY.md §5.8)."""
    if halo == "alltoall":
        hargs_h = [pm.pair_send_idx.astype(np.int32),
                   pm.ghost_src_dev.astype(np.int32),
                   pm.ghost_src_pair_slot.astype(np.int32)]
        halo_fn = alltoall_halo
    elif halo == "ragged":
        # exact wire volume; XLA:CPU has no thunk — callers on the
        # virtual mesh get a runtime UNIMPLEMENTED (see dryrun skip)
        G = pm.G
        hargs_h = [pm.ragged_send_idx.astype(np.int32),
                   pm.ragged_input_offsets.astype(np.int32),
                   pm.ragged_send_sizes.astype(np.int32),
                   pm.ragged_output_offsets.astype(np.int32),
                   pm.ragged_recv_sizes.astype(np.int32)]
        halo_fn = lambda xx, si, io, ss, oo, rs, axis: \
            ragged_halo(xx, si, io, ss, oo, rs, G, axis)
    else:
        hargs_h = [pm.send_idx.astype(np.int32),
                   pm.ghost_src_dev.astype(np.int32),
                   pm.ghost_src_slot.astype(np.int32)]
        halo_fn = allgather_halo
    return hargs_h, halo_fn


OPERATORS = ("ell", "sell")


def solve_dist_general(pm: PartitionedMatrix, b: np.ndarray,
                       x0: np.ndarray | None = None,
                       opt: CGOptions = CGOptions(), method: str = "cg",
                       history: bool = False, dtype=None, devices=None,
                       halo: str = "allgather", operator: str = "ell",
                       sell_op=None):
    """Distributed solve with a general row partition (METIS-style).

    ``pm`` comes from partition.graph.build_partitioned_matrix; ``b``/``x0``
    are global (N,) vectors.  ``halo`` selects the exchange strategy
    (SURVEY.md §5.8): "allgather" broadcasts each device's packed border
    buffer; "alltoall" is the neighbour-alltoallv analogue (point-to-point
    pair buffers, lower wire volume).  ``operator`` selects the per-device
    SpMV: "sell" runs the chunked-gather kernel on the owned + interface
    blocks (the fast path, float32 storage; parallel/dist_sell.py) —
    "ell" is the gather-based reference fallback (any dtype).  A prebuilt
    ``sell_op`` (parallel.dist_sell.build_dist_sell) skips the layout
    build.  Returns (x (N,) numpy, SolveInfo)."""
    if halo not in HALO_METHODS:
        raise ValueError(f"unknown halo {halo!r}; expected one of {HALO_METHODS}")
    if operator not in OPERATORS:
        raise ValueError(
            f"unknown operator {operator!r}; expected one of {OPERATORS}")
    mesh = make_mesh(pm.P, devices)
    df = method == "pipelined-df64"
    if df and operator != "sell":
        raise ValueError(
            "pipelined-df64 on general partitions needs operator='sell' "
            "(the df64 chunked-gather kernel); operator='ell' can store "
            "f64 directly — use method='pipelined' there")
    if operator == "sell":
        vdtype = np.dtype(dtype) if dtype is not None else np.dtype(np.float32)
        if vdtype != np.float32:
            raise ValueError(
                "operator='sell' stores float32 slabs (Mosaic kernels are "
                "f32-only on TPU); use dot_dtype='mixed' or 'float64' for "
                "f64-quality reductions, or operator='ell' for f64 storage")
        if df:
            # slabs stay f32 (+ lo residuals); the loop's b/x0 and scalar
            # recurrences are f64 (solvers/cg.pipelined_cg_loop_df64_spmv)
            vdtype = np.dtype(np.float64)
    else:
        vdtype = np.dtype(dtype) if dtype is not None else np.float64

    stk = NamedSharding(mesh, P(AXIS))
    if operator == "sell":
        from ..parallel.dist_sell import (build_dist_sell,
                                          dist_sell_spmv_with_ghosts,
                                          dist_sell_spmv_with_ghosts_df64)
        dso = sell_op if sell_op is not None else build_dist_sell(
            pm, keep_lo=df)
        own_tree = dso.own.tree()
        if dso.tail is not None:
            # per-part dense run-tails ride in the owned dict (stacked on
            # the same leading part axis; parallel/dist_sell.py heavy)
            own_tree.update(dso.tail)
        own_t = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), stk), own_tree)
        gst_t = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), stk), dso.gst.tree())
        op_args = (own_t, gst_t)
        tail_K = dso.tail_K
        op_shapes = tuple(v.shape for v in dso.own.vals) \
            + tuple(v.shape for v in dso.gst.vals) \
            + (dso.own.vals_lo is not None, dso.gst.vals_lo is not None,
               None if dso.tail is None
               else tuple(dso.tail["tvals"].shape), tail_K,
               dso.tail is not None and "svals" in dso.tail)
        own_ncols, gst_ncols = dso.own.ncols, dso.gst.ncols

        if df and not dso.df64_ready:
            raise ValueError(
                "pipelined-df64 needs a sell_op built with "
                "build_dist_sell(pm, keep_lo=True) (rounding-residual "
                "slabs, or the keep_lo build's proof that the matrix is "
                "f32-exact and needs none)")

        def make_spmv(op_local, h, halo_fn):
            own_l, gst_l = op_local

            if df:
                def spmv(wh, wl):
                    gh = halo_fn(wh, *h, AXIS)
                    gl = halo_fn(wl, *h, AXIS)
                    return dist_sell_spmv_with_ghosts_df64(
                        own_l, gst_l, wh, wl, gh, gl, own_ncols,
                        gst_ncols, tail_K)
                return spmv

            def spmv(xx):
                ghosts = halo_fn(xx, *h, AXIS)
                return dist_sell_spmv_with_ghosts(own_l, gst_l, xx, ghosts,
                                                  own_ncols, gst_ncols)
            return spmv
    else:
        op_args = (jax.device_put(pm.own_colidx, stk),
                   jax.device_put(pm.own_vals.astype(vdtype), stk),
                   jax.device_put(pm.ghost_colidx, stk),
                   jax.device_put(pm.ghost_vals.astype(vdtype), stk))
        op_shapes = (pm.own_vals.shape, pm.ghost_vals.shape)

        def make_spmv(op_local, h, halo_fn):
            oc, ov, gc, gv = op_local

            def spmv(xx):
                ghosts = halo_fn(xx, *h, AXIS)
                return general_spmv_with_ghosts(oc, ov, gc, gv, xx, ghosts)
            return spmv

    hargs_h, halo_fn = _halo_plan(pm, halo)
    hargs = [jax.device_put(h, stk) for h in hargs_h]

    b_l = jax.device_put(scatter_vector(pm, np.asarray(b)).astype(vdtype), stk)
    x0_l = jax.device_put(
        (np.zeros((pm.P, pm.L), vdtype) if x0 is None
         else scatter_vector(pm, np.asarray(x0)).astype(vdtype)), stk)

    # L/G in the key: the spmv closure bakes in the column-space lengths,
    # which the slab shapes alone do not determine
    key = ("general", _mesh_key(mesh), opt, method, history, halo,
           operator, op_shapes, pm.L, pm.G, str(vdtype))
    run = _RUN_CACHE.get(key)
    if run is None:
        if method == "pipelined-fused":
            if history:
                raise ValueError("pipelined-fused has no history variant")
            from .cg import pipelined_cg_loop_fused_spmv
            fn = pipelined_cg_loop_fused_spmv
        elif method == "pipelined-df64":
            if history:
                raise ValueError("pipelined-df64 has no history variant")
            from .cg import pipelined_cg_loop_df64_spmv
            fn = pipelined_cg_loop_df64_spmv   # spmv closure is spmv2(wh, wl)
        else:
            fn = _loop_fns(method, history)
        nop = len(op_args)

        def local(*a):
            # squeeze the per-device leading axis of every stacked array
            sq = lambda t: jax.tree_util.tree_map(lambda v: v[0], t)
            op_local = tuple(sq(t) for t in a[:nop])
            b_, x0_ = a[nop][0], a[nop + 1][0]
            h = tuple(v[0] for v in a[nop + 2:])
            spmv = make_spmv(op_local, h, halo_fn)
            red = lambda v: lax.psum(v, AXIS)
            out = fn(spmv, b_, x0_, opt, red)
            if history:
                x, scalars, hist = out
                return x[None], scalars, hist
            x, scalars = out
            return x[None], scalars

        scalar_spec = dict(niterations=P(), converged=P(), stalled=P(),
                           bnrm2sqr=P(),
                           r0nrm2sqr=P(), rnrm2sqr=P(), x0nrm2sqr=P(),
                           dxnrm2sqr=P())
        in_specs = tuple([P(AXIS)] * (nop + 2 + len(hargs)))
        out_specs = (P(AXIS), scalar_spec) if not history else \
            (P(AXIS), scalar_spec, P())
        run = _compile_and_record(
            jax.jit(shard_map(local, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)),
            *op_args, b_l, x0_l, *hargs)
        _RUN_CACHE[key] = run
    else:
        from .cg import _LAST_COMPILED
        _LAST_COMPILED[0] = run
    out = run(*op_args, b_l, x0_l, *hargs)
    if history:
        xl, scalars, hist = out
        info = _info_from_scalars(scalars, hist)
    else:
        xl, scalars = out
        info = _info_from_scalars(scalars)
    x = gather_vector(pm, np.asarray(xl))
    return x, info
