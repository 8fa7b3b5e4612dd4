"""Dense run-tail SpMV kernel: heavy rows with LOCAL column spans.

The load-balance tail the reference's merge-CSR split handles by
construction (cg-kernels-cuda.cu:312-441): a few rows with hundreds-to-
thousands of entries whose columns sit in one contiguous-ish window
(constraint/arrow rows after reordering).  Such rows poison the SELL
chunked-gather layout — one heavy row forces ~run/8 slot groups on all
128 rows of its tile (measured: fill 0.121 → 0.039 and 8.0 → 2.67
Gnnz/s with 7% heavy nnz, BENCHMARKS.md ACG_HEAVY=2) — and a SELL-format
tail is scatter-regime after compaction because every heavy row's window
is different.

The TPU-format answer is DENSE per-row windows with dynamic DMA:

  * each tail row i stores a dense (WSUB*1024,)-window of values
    (zeros at gaps), positioned at offset start[i] - 1024*base[i]
    inside the window;
  * x stays in HBM; the kernel DMAs each row's (WSUB, 8, 128) window
    from x3 = x.reshape(-1, 8, 128) at the dynamic row offset base[i]
    (HBM memrefs are untiled, so traced dim-0 slice offsets are legal —
    same rule the SELL chunk-table pipeline relies on);
  * y[i] = full reduce of vals_window * x_window — pure VPU elementwise
    + reduction, no gathers, no slot padding at all;
  * R=8 rows per grid step; the 8 window DMAs are all in flight before
    the first wait, and the vals slabs stream through the BlockSpec
    pipeline (double-buffered) as the dominant traffic.

Scalar outputs go to a full-array SMEM output (house rule for small
outputs); the caller scatter-adds them into the global row space.

XLA alternatives measured first (scripts/exp_runtail.py, real chip,
4688 rows x 2048-entry runs): vmap(dynamic_slice)+dot 1.26 Gnnz/s,
aligned-2W-window gather 1.28 Gnnz/s — slice-gathers lower to ~10-15
GB/s effective, hence this kernel.

STATUS: Mosaic-lowered and validated on the real chip (2026-08-20):
f32 kernel max rel err 1.2e-6 (f32-level), df64 twin 2.0e-14 (full EFT
accuracy survives Mosaic).  Two hardware lessons encoded below: (1)
unrolled-loop indices into `.at[]` scratch slices must be materialized
as int32 (Python ints trace to i64 under jax_enable_x64 and
tpu.memref_slice rejects them); (2) SMEM BlockSpecs need explicit
full-array blocks + int32 index maps (the synthesized default map
returns Python ints → "failed to legalize func.return (i64)").
Throughput: scripts/bench_runtail.py / BENCHMARKS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64

R = 8          # tail rows per grid step
WSUB = 4       # window = WSUB (8, 128) subrows = WSUB*1024 elements

# x-residency cap for the fast variant (elements): below this, x lives
# in one VMEM scratch for the whole kernel (a single big DMA at step 0,
# the SELL kernel's trick) and each row's window is a dynamic leading-
# dim read — no per-row DMAs at all.  Measured motivation: the windowed
# variant is DMA-ISSUE-bound, not bandwidth-bound (8 × 16 KB window
# copies per grid step ≈ 1.2 us/step = 215 GB/s vs 693 achievable).
# Same ~12 MB VMEM class as core.sell.MAX_VMEM_ROWS.
RESIDENT_X_MAX = 3_000_000


def _runtail_kernel(x_hbm, base_ref, vals_ref, y_ref, xw, sems):
    i = pl.program_id(0).astype(jnp.int32)

    def copy(k):
        # unrolled-loop indices MUST be materialized as int32: a Python
        # int traces to i64 under jax_enable_x64 and Mosaic rejects the
        # memref slice ('tpu.memref_slice' wants i32 — same rule as
        # BlockSpec index maps, CLAUDE.md)
        k32 = jnp.int32(k)
        b = base_ref[i * R + k32]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b, WSUB)], xw.at[k32], sems.at[k32])

    for k in range(R):
        copy(k).start()
    for k in range(R):
        copy(k).wait()
        y_ref[i * R + jnp.int32(k)] = jnp.sum(vals_ref[0, k] * xw[k])


def _runtail_kernel_resident(x_hbm, base_ref, vals_ref, y_ref, xv, sem):
    """Resident-x variant: one whole-x DMA at step 0, then each row's
    window is WSUB dynamic leading-dim reads of the VMEM scratch (the
    traced-index pattern the SELL kernel's xv[c >> 3, c & 7] proves on
    hardware) — zero per-row DMAs, so the pass streams vals at the
    BlockSpec pipeline's speed instead of DMA-issue latency.

    Outputs are PER-LANE partials (R, 128) per grid step to a VMEM
    block (like the df64 twin); the cheap 128-lane fold happens outside
    the kernel.  The first cut stored scalars to a full-array SMEM
    output instead and compiled ~10 min vs ~1 min for this shape —
    scalar SMEM stores combined with the dynamic VMEM reads are a
    Mosaic compile-time cliff."""
    i = pl.program_id(0).astype(jnp.int32)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm, xv, sem)
        cp.start()
        cp.wait()

    for k in range(R):
        b = base_ref[i * R + jnp.int32(k)]
        v = vals_ref[0, k]                       # (WSUB, 8, 128)
        tot = v[0] * xv[b]
        for w in range(1, WSUB):
            tot = tot + v[w] * xv[b + jnp.int32(w)]
        y_ref[0, k] = jnp.sum(tot, axis=0)       # (128,) lane partials


@functools.partial(jax.jit, static_argnames=("Nx",))
def runtail_spmv(vals: jnp.ndarray, base: jnp.ndarray, x: jnp.ndarray,
                 Nx: int) -> jnp.ndarray:
    """y[i] = dot(vals[i], x[1024*base[i] : 1024*base[i] + WSUB*1024]).

    vals: (nsteps, R, WSUB, 8, 128) f32 dense window slabs;
    base: (nsteps*R,) int32 window row offsets into x3 (units of 1024
    elements; padded rows point at 0 with zero vals);
    x: the column-space vector, padded here to Nx + the window overhang
    so every in-bounds base reads real memory.
    Returns (nsteps*R,) f32 per-tail-row results.
    """
    if vals.dtype != jnp.float32:
        raise NotImplementedError(
            f"runtail_spmv is f32-only (Mosaic has no f64 tiling); "
            f"got {vals.dtype}")
    nsteps = vals.shape[0]
    assert vals.shape[1:] == (R, WSUB, 8, 128), vals.shape
    assert base.shape == (nsteps * R,) and base.dtype == jnp.int32
    Nxp = Nx + WSUB * 1024
    if x.shape[0] < Nxp:
        x = jnp.concatenate([x, jnp.zeros((Nxp - x.shape[0],), x.dtype)])
    elif x.shape[0] > Nxp:
        x = x[:Nxp]
    x3 = x.reshape(Nxp // 1024, 8, 128)
    z32 = np.int32(0)
    resident = Nxp <= RESIDENT_X_MAX
    cost = pl.CostEstimate(
        flops=2 * nsteps * R * WSUB * 1024,
        bytes_accessed=2 * nsteps * R * WSUB * 1024 * 4,
        transcendentals=0,
    )
    # SMEM specs carry explicit full-array blocks + int32 index maps:
    # the synthesized default map returns Python ints, which trace to
    # i64 under jax_enable_x64 and Mosaic dies with "failed to legalize
    # func.return (i64)" (measured on hardware; CLAUDE.md rule)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                  # x3 in HBM
        pl.BlockSpec((nsteps * R,), lambda i: (z32,),
                     memory_space=pltpu.SMEM),              # base
        pl.BlockSpec((1, R, WSUB, 8, 128),
                     lambda i: (i, z32, z32, z32, z32),
                     memory_space=pltpu.VMEM),              # vals
    ]
    interp = jax.default_backend() == "cpu"
    if resident:
        lanes = pl.pallas_call(
            _runtail_kernel_resident,
            grid=(nsteps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, z32, z32),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nsteps, R, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((Nxp // 1024, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=cost,
            interpret=interp,
        )(x3, base, vals)
        return jnp.sum(lanes.reshape(nsteps * R, 128), axis=1)
    y = pl.pallas_call(
        _runtail_kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nsteps * R,), lambda i: (z32,),
                               memory_space=pltpu.SMEM),        # y full
        out_shape=jax.ShapeDtypeStruct((nsteps * R,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((R, WSUB, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((R,)),
        ],
        cost_estimate=cost,
        interpret=interp,
    )(x3, base, vals)
    return y


def _rt_df64_row(vals_ref, vlo_ref, has_lo, k, xwh_k, xwl_k,
                 yh_ref, yl_ref):
    """One tail row's EFT window dot → per-lane (128,) pair stores.

    ``xwh_k``/``xwl_k`` are the row's (WSUB, 8, 128) window views (from
    the per-row DMA scratch or the resident-x scratch)."""
    vh = vals_ref[0, k]                           # (WSUB, 8, 128)
    with df64.no_barriers():
        p, e = df64.two_prod(vh, xwh_k)
        e = e + vh * xwl_k
        if has_lo:
            e = e + vlo_ref[0, k] * xwh_k
        # compensated sublane fold: WSUB*8 sub-rows -> one (128,) pair
        pr = p.reshape(WSUB * 8, 128)
        s = pr[0]
        err = jnp.sum(e.reshape(WSUB * 8, 128), axis=0)
        for q in range(1, WSUB * 8):
            s, c2 = df64.two_sum(s, pr[q])
            err = err + c2
    yh_ref[0, k] = s
    yl_ref[0, k] = err


def _runtail_scatter_kernel(base_ref, xr_ref, vals_ref, y_ref):
    """Transpose-side tail: y[window_i] += vals_i * x[row_i].

    The symmetric mirror of the run-tail gather — a heavy SYMMETRIC row
    (r, [c0, c0+run)) implies a dense COLUMN whose contribution to y is
    the stored value window scaled by the scalar x[r].  The y image is
    a full-array VMEM output with a constant index map (resident across
    the SEQUENTIAL TPU grid, so overlapping windows accumulate without
    races); vals stream through the BlockSpec pipeline; x[row] scalars
    arrive pre-gathered in SMEM."""
    i = pl.program_id(0).astype(jnp.int32)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    for k in range(R):
        k32 = jnp.int32(k)
        b = base_ref[i * R + k32]
        s = xr_ref[i * R + k32]
        v = vals_ref[0, k]                        # (WSUB, 8, 128)
        for w in range(WSUB):
            w32 = jnp.int32(w)
            y_ref[b + w32] = y_ref[b + w32] + v[w] * s


def runtail_scatter(vals: jnp.ndarray, base: jnp.ndarray,
                    xr: jnp.ndarray, Nx: int) -> jnp.ndarray:
    """y[1024*base[i] : 1024*base[i] + WSUB*1024] += vals[i] * xr[i].

    ``xr`` is the (nsteps*R,) f32 vector of x values at each segment's
    owning row (pads must carry 0.0).  Returns the accumulated (Nx +
    WSUB*1024,) image; the caller slices/adds into its own y.  Requires
    the window space within the VMEM residency budget (callers fall
    back to keeping mirror entries in the SELL main block beyond it)."""
    if vals.dtype != jnp.float32:
        raise NotImplementedError(
            f"runtail_scatter is f32-only; got {vals.dtype}")
    nsteps = vals.shape[0]
    assert vals.shape[1:] == (R, WSUB, 8, 128), vals.shape
    assert base.shape == (nsteps * R,) and base.dtype == jnp.int32
    assert xr.shape == (nsteps * R,) and xr.dtype == jnp.float32
    Nxp = Nx + WSUB * 1024
    if Nxp > RESIDENT_X_MAX:
        raise NotImplementedError(
            f"runtail_scatter needs the y image resident in VMEM "
            f"({Nxp:,} > {RESIDENT_X_MAX:,}); keep mirror entries in "
            "the main block instead")
    z32 = np.int32(0)
    y3 = pl.pallas_call(
        _runtail_scatter_kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((nsteps * R,), lambda i: (z32,),
                         memory_space=pltpu.SMEM),              # base
            pl.BlockSpec((nsteps * R,), lambda i: (z32,),
                         memory_space=pltpu.SMEM),              # xr
            pl.BlockSpec((1, R, WSUB, 8, 128),
                         lambda i: (i, z32, z32, z32, z32),
                         memory_space=pltpu.VMEM),              # vals
        ],
        out_specs=pl.BlockSpec((Nxp // 1024, 8, 128),
                               lambda i: (z32, z32, z32),
                               memory_space=pltpu.VMEM),        # y resident
        out_shape=jax.ShapeDtypeStruct((Nxp // 1024, 8, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * R * WSUB * 1024,
            bytes_accessed=(nsteps * R * WSUB * 1024 + Nxp) * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(base, xr, vals)
    return y3.reshape(-1)


def _runtail_kernel_df64(has_lo, xh_hbm, xl_hbm, base_ref, vals_refs,
                         yh_ref, yl_ref, xwh, xwl, sems):
    """df64 twin of _runtail_kernel: x is an explicit (hi, lo) pair,
    matrix values carry an optional low-residual slab, and the window
    dot is an error-free-transform reduction.  Outputs are PER-LANE
    partial pairs (R, 128) per grid step — the final 128-lane fold
    happens outside the kernel (runtail_spmv_df64), where a log2(128)
    df_add tree is a handful of vectorized XLA ops."""
    i = pl.program_id(0).astype(jnp.int32)
    if has_lo:
        vals_ref, vlo_ref = vals_refs
    else:
        (vals_ref,), vlo_ref = vals_refs, None

    def copy(k, src, dst, s):
        # int32-materialized unrolled indices (Mosaic memref_slice rule,
        # see _runtail_kernel)
        k32 = jnp.int32(k)
        b = base_ref[i * R + k32]
        return pltpu.make_async_copy(
            src.at[pl.ds(b, WSUB)], dst.at[k32], sems.at[k32, jnp.int32(s)])

    for k in range(R):
        copy(k, xh_hbm, xwh, 0).start()
        copy(k, xl_hbm, xwl, 1).start()
    for k in range(R):
        copy(k, xh_hbm, xwh, 0).wait()
        copy(k, xl_hbm, xwl, 1).wait()
        _rt_df64_row(vals_ref, vlo_ref, has_lo, k, xwh[k], xwl[k],
                     yh_ref, yl_ref)


def _runtail_kernel_df64_resident(has_lo, xh_hbm, xl_hbm, base_ref,
                                  vals_refs, yh_ref, yl_ref, xvh, xvl,
                                  sems):
    """Resident-x df64 variant: both (hi, lo) components DMA'd whole to
    VMEM once at step 0; windows are dynamic leading-dim slices (see
    _runtail_kernel_resident for the measured motivation)."""
    i = pl.program_id(0).astype(jnp.int32)
    if has_lo:
        vals_ref, vlo_ref = vals_refs
    else:
        (vals_ref,), vlo_ref = vals_refs, None

    @pl.when(i == 0)
    def _():
        cph = pltpu.make_async_copy(xh_hbm, xvh, sems.at[jnp.int32(0)])
        cpl = pltpu.make_async_copy(xl_hbm, xvl, sems.at[jnp.int32(1)])
        cph.start()
        cpl.start()
        cph.wait()
        cpl.wait()

    for k in range(R):
        b = base_ref[i * R + jnp.int32(k)]
        xwh_k = jnp.stack([xvh[b + jnp.int32(w)] for w in range(WSUB)])
        xwl_k = jnp.stack([xvl[b + jnp.int32(w)] for w in range(WSUB)])
        _rt_df64_row(vals_ref, vlo_ref, has_lo, k, xwh_k, xwl_k,
                     yh_ref, yl_ref)


def _runtail_df64_xla(vals, vals_lo, base, xh, xl, Nxp):
    """Eager-XLA twin of the df64 run-tail kernel for the CPU backend.

    The pallas INTERPRETER compiles the kernel body as one XLA:CPU unit
    whose excess-precision evaluation destroys the EFTs — and unlike the
    SELL kernel (whose gathers fragment the fused regions and keep the
    rounding), this kernel is pure elementwise math, so the loss is
    structural (measured: 1 ulp of the hi sum, ~1.7e-8 relative; the
    barriers do NOT help, same finding as the fori_loop case in
    CLAUDE.md).  Eagerly-dispatched ops round exactly per op, so this
    twin is df64-exact in eager CPU calls (accuracy tests); under an
    outer jit it is as weak as every other XLA-land df64 path on CPU."""
    nrows = base.shape[0]
    W = WSUB * 1024
    x3h = xh.reshape(-1)
    x3l = xl.reshape(-1)
    idx = base.astype(jnp.int32)[:, None] * 1024 \
        + jnp.arange(W, dtype=jnp.int32)[None, :]
    xwh = jnp.take(x3h, idx)
    xwl = jnp.take(x3l, idx)
    v2 = vals.reshape(nrows, W)
    p, e = df64.two_prod(v2, xwh)
    e = e + v2 * xwl
    if vals_lo is not None:
        e = e + vals_lo.reshape(nrows, W) * xwh
    # exact pairwise df_add tree over the window axis
    w = W
    while w > 1:
        w //= 2
        p, e = df64.df_add(p[:, :w], e[:, :w], p[:, w:2 * w], e[:, w:2 * w])
    return p[:, 0], e[:, 0]


# NOT @jax.jit: solver callers trace it inside their own jit anyway, and
# an eager call (CPU accuracy tests) must dispatch op-by-op — XLA:CPU's
# excess-precision jit evaluation weakens EFTs (CLAUDE.md).
def runtail_spmv_df64(vals: jnp.ndarray, vals_lo, base: jnp.ndarray,
                      xh: jnp.ndarray, xl: jnp.ndarray, Nx: int):
    """(yh, yl)[i] ≈ dot(vals[i] + vals_lo[i], (xh + xl) window) to df64
    accuracy — the f64-parity run-tail the reference's f64 merge kernel
    provides with no special casing (cg-kernels-cuda.cu:358-441).

    ``vals_lo`` is None when the matrix is exactly f32-representable.
    Same layout contract as runtail_spmv; xh/xl are the (hi, lo) column-
    space pair.  Returns two (nsteps*R,) f32 arrays."""
    if vals.dtype != jnp.float32:
        raise NotImplementedError(
            f"runtail_spmv_df64 is f32-pair-only; got {vals.dtype}")
    has_lo = vals_lo is not None
    nsteps = vals.shape[0]
    assert vals.shape[1:] == (R, WSUB, 8, 128), vals.shape
    assert base.shape == (nsteps * R,) and base.dtype == jnp.int32
    Nxp = Nx + WSUB * 1024

    def prep(x):
        if x.shape[0] < Nxp:
            x = jnp.concatenate([x, jnp.zeros((Nxp - x.shape[0],), x.dtype)])
        elif x.shape[0] > Nxp:
            x = x[:Nxp]
        return x.reshape(Nxp // 1024, 8, 128)

    xh3, xl3 = prep(xh), prep(xl)
    if jax.default_backend() == "cpu":
        return _runtail_df64_xla(vals, vals_lo, base, xh3, xl3, Nxp)
    z32 = np.int32(0)
    slab_spec = pl.BlockSpec((1, R, WSUB, 8, 128),
                             lambda i: (i, z32, z32, z32, z32),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                  # xh3 in HBM
        pl.BlockSpec(memory_space=pl.ANY),                  # xl3 in HBM
        pl.BlockSpec((nsteps * R,), lambda i: (z32,),
                     memory_space=pltpu.SMEM),              # base
        slab_spec,                                          # vals hi
    ]
    args = [xh3, xl3, base, vals]
    if has_lo:
        in_specs.append(slab_spec)                          # vals lo
        args.append(vals_lo)

    # resident-x needs BOTH pair components in VMEM → half the f32 cap
    resident = Nxp <= RESIDENT_X_MAX // 2
    kern = _runtail_kernel_df64_resident if resident else \
        _runtail_kernel_df64

    def krn(xh_hbm, xl_hbm, base_ref, *rest):
        if has_lo:
            vrefs, outs = (rest[0], rest[1]), rest[2:]
        else:
            vrefs, outs = (rest[0],), rest[1:]
        kern(has_lo, xh_hbm, xl_hbm, base_ref, vrefs, *outs)

    out_spec = pl.BlockSpec((1, R, 128), lambda i: (i, z32, z32),
                            memory_space=pltpu.VMEM)
    yh, yl = pl.pallas_call(
        krn,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((nsteps, R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nsteps, R, 128), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((Nxp // 1024, 8, 128), jnp.float32),
            pltpu.VMEM((Nxp // 1024, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] if resident else [
            pltpu.VMEM((R, WSUB, 8, 128), jnp.float32),
            pltpu.VMEM((R, WSUB, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((R, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=24 * nsteps * R * WSUB * 1024,
            bytes_accessed=(3 + has_lo) * nsteps * R * WSUB * 1024 * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    # final fold: 128 lanes -> scalar per row, log2(128) df_add tree in
    # XLA-land (with optimization barriers; exact on TPU — XLA:CPU's
    # excess-precision jit caveat applies as everywhere, CLAUDE.md)
    ph = yh.reshape(nsteps * R, 128)
    pl_ = yl.reshape(nsteps * R, 128)
    w = 128
    while w > 1:
        w //= 2
        ph, pl_ = df64.df_add(ph[:, :w], pl_[:, :w], ph[:, w:2 * w],
                              pl_[:, w:2 * w])
    return ph[:, 0], pl_[:, 0]
