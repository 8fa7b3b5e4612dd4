"""Pallas TPU kernel for DIA SpMV — single-pass shifted-stream fusion.

The reference meets its SpMV goals with a merge-based CSR kernel
(cg-kernels-cuda.cu:312-441: shared-memory staging, warp segmented
reduction).  The TPU equivalent problem is different: XLA already
vectorizes the shifted-diagonal formulation, but materializes each
diagonal's term as a separate HBM pass (~26% of roofline measured).  This
kernel performs all K diagonal multiply-adds in one pass over VMEM blocks:

    y[i*B : (i+1)*B] = Σ_k vals[k, iB:iB+B] ⊙ x_win[off_k : off_k + B]

where x_win is the (B + 2·hw)-wide window of the extended vector DMA'd
into VMEM scratch per grid step.  Traffic: vals once, x once (+2·hw/B
halo overlap), y once — the memory roofline.

Offsets are compile-time constants (Python ints baked into the kernel),
so every slice is static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_halo_width(hw: int) -> int:
    """Halo width to EXTEND vectors by for the pallas kernels: rounded up
    so every DMA span AND offset (window length block + 2*hw, source
    starts blk*block − hw) stays aligned to the 1024-element 1-D VMEM
    tile (Mosaic requires provably tile-aligned slices)."""
    return max(_round_up(hw, 1024), 1024)


def _dia_kernel(offsets, hw, B, x_hbm, vals_ref, y_ref, win0, win1, sem):
    # Double-buffered x-window pipeline: while block i computes, block
    # i+1's window [iB, iB + B + 2hw) streams HBM→VMEM (the same overlap
    # Pallas provides automatically for the BlockSpec'd vals operand).
    # Two separate window buffers (not a (2, L) scratch sliced by a traced
    # index — Mosaic cannot slice the sublane-tiled leading dim), with the
    # compute predicated on the block's parity.
    # Index math stays int32: Mosaic rejects i64 indices, and with
    # jax_enable_x64 (the framework default) literals promote to i64.
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    two = jnp.int32(2)
    one = jnp.int32(1)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + one, two)

    def window_copy(blk, win, s):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(blk * jnp.int32(B), B + 2 * hw)],
            win, sem.at[jnp.int32(s)])

    @pl.when(i == 0)
    def _():
        window_copy(i, win0, 0).start()

    @pl.when((i + one < nblocks) & (nxt == 0))
    def _():
        window_copy(i + one, win0, 0).start()

    @pl.when((i + one < nblocks) & (nxt == 1))
    def _():
        window_copy(i + one, win1, 1).start()

    def compute(win):
        acc = None
        for k, off in enumerate(offsets):
            term = vals_ref[k, :] * win[pl.ds(hw + off, B)]
            acc = term if acc is None else acc + term
        y_ref[:] = acc

    @pl.when(slot == 0)
    def _():
        window_copy(i, win0, 0).wait()
        compute(win0)

    @pl.when(slot == 1)
    def _():
        window_copy(i, win1, 1).wait()
        compute(win1)


@functools.partial(jax.jit, static_argnames=("offsets", "hw", "block"))
def dia_spmv_pallas(vals: jnp.ndarray, x_ext: jnp.ndarray,
                    offsets: tuple[int, ...], hw: int,
                    block: int = 16384) -> jnp.ndarray:
    """y = A @ x for a DIA operator.

    vals: (K, Np) diagonal slabs; x_ext: (Np + 2*hw,) extended vector
    (zero or halo-filled pads); offsets: static diagonal offsets with
    |off| <= hw.  Np must be a multiple of ``block``; callers size blocks
    via `pick_block`.
    """
    K, Np = vals.shape
    assert Np % block == 0, (Np, block)
    assert x_ext.shape[0] == Np + 2 * hw
    if vals.dtype == jnp.float64 and jax.default_backend() not in ("cpu",):
        # Mosaic has no f64 tiling on TPU (XLA emulates f64 outside Pallas).
        raise NotImplementedError(
            "the pallas DIA backend requires float32 storage on TPU "
            "(use dtype=float32 with f64 dot accumulation — the fast path — "
            "or backend='xla' for float64)")
    nblocks = Np // block
    kernel = functools.partial(_dia_kernel, offsets, hw, block)
    # CPU has no Mosaic: run interpreted there (tests, CLI smoke runs).
    interpret = jax.default_backend() == "cpu"
    # Inside shard_map the output must declare which mesh axes it varies
    # over (vma); it varies exactly as the operand slabs do.
    try:
        vma = jax.typeof(vals).vma
        out_shape = jax.ShapeDtypeStruct((Np,), vals.dtype, vma=vma)
    except (AttributeError, TypeError):
        out_shape = jax.ShapeDtypeStruct((Np,), vals.dtype)
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x_ext stays in HBM
            pl.BlockSpec((K, block), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block + 2 * hw,), vals.dtype),
            pltpu.VMEM((block + 2 * hw,), vals.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Np,
            bytes_accessed=(K * Np + 2 * Np + 2 * hw * nblocks) * vals.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_ext, vals)


def _dia_kernel_np(offsets, hw, B, x_hbm, vals_ref, y_ref, win0, win1, sem):
    """Variant taking the UNPADDED x (Np,) from HBM: boundary blocks zero
    their window scratch and DMA only the in-range span, so callers do not
    materialize a zero-extended copy of x every call (saves a full
    read+write of x per SpMV inside solver loops).  hw is a multiple of
    512 and B of 1024, so every DMA span stays tile-aligned."""
    i = pl.program_id(0).astype(jnp.int32)
    nblocks = pl.num_programs(0)
    two = jnp.int32(2)
    one = jnp.int32(1)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + one, two)
    Np = nblocks * B   # static

    def window_copy(blk, win, s):
        """DMA x[clamped span] into win at the matching offset."""
        first = blk == 0
        last = blk == nblocks - one
        # interior: src [blk*B - hw, blk*B + B + hw) -> win[0:]
        # first:    src [0, B + hw)                  -> win[hw:]
        # last:     src [blk*B - hw, Np)             -> win[0:]
        src_start = pl.multiple_of(
            jax.lax.max(blk * jnp.int32(B) - jnp.int32(hw), jnp.int32(0)),
            1024)
        dst_start = pl.multiple_of(
            jnp.where(first, jnp.int32(hw), jnp.int32(0)), 1024)
        n_border = B + hw          # span at either boundary (aligned)
        n_inner = B + 2 * hw
        if nblocks == 1:
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(jnp.int32(0), B)],
                win.at[pl.ds(jnp.int32(hw), B)], sem.at[jnp.int32(s)])
        border = first | last
        # two descriptor shapes (static lengths) selected by predicate
        def cp(n):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(src_start, n)],
                win.at[pl.ds(dst_start, n)], sem.at[jnp.int32(s)])
        return border, cp(n_border), cp(n_inner)

    def start(blk, win, s):
        if nblocks == 1:
            window_copy(blk, win, s).start()
            return
        border, cb, ci_ = window_copy(blk, win, s)

        @pl.when(border)
        def _():
            cb.start()

        @pl.when(jnp.logical_not(border))
        def _():
            ci_.start()

    def wait(blk, win, s):
        if nblocks == 1:
            window_copy(blk, win, s).wait()
            return
        border, cb, ci_ = window_copy(blk, win, s)

        @pl.when(border)
        def _():
            cb.wait()

        @pl.when(jnp.logical_not(border))
        def _():
            ci_.wait()

    def prep(blk, win):
        # zero the halo margins of boundary blocks before the DMA lands
        @pl.when(blk == 0)
        def _():
            win[pl.ds(0, hw)] = jnp.zeros((hw,), win.dtype)

        @pl.when(blk == nblocks - one)
        def _():
            win[pl.ds(B + hw, hw)] = jnp.zeros((hw,), win.dtype)

    @pl.when(i == 0)
    def _():
        prep(i, win0)
        start(i, win0, 0)

    @pl.when((i + one < nblocks) & (nxt == 0))
    def _():
        prep(i + one, win0)
        start(i + one, win0, 0)

    @pl.when((i + one < nblocks) & (nxt == 1))
    def _():
        prep(i + one, win1)
        start(i + one, win1, 1)

    def compute(win):
        acc = None
        for k, off in enumerate(offsets):
            term = vals_ref[k, :] * win[pl.ds(hw + off, B)]
            acc = term if acc is None else acc + term
        y_ref[:] = acc

    @pl.when(slot == 0)
    def _():
        wait(i, win0, 0)
        compute(win0)

    @pl.when(slot == 1)
    def _():
        wait(i, win1, 1)
        compute(win1)


@functools.partial(jax.jit, static_argnames=("offsets", "hw", "block"))
def dia_spmv_pallas_np(vals: jnp.ndarray, x: jnp.ndarray,
                       offsets: tuple[int, ...], hw: int,
                       block: int = 16384) -> jnp.ndarray:
    """y = A @ x with x UNPADDED (Np,): boundary handling inside the
    kernel; saves the per-call zero-extended copy of x."""
    K, Np = vals.shape
    assert Np % block == 0, (Np, block)
    assert x.shape[0] == Np
    if hw > block:
        # The in-kernel two-descriptor boundary scheme is only valid when
        # the halo fits inside one neighbouring block: with hw > block,
        # blocks NEAR (but not at) the edges also need clamped spans, and
        # the clamped src_start pairs with the wrong dst offset (silently
        # misaligned windows).  Fall back to the zero-extended-x kernel —
        # correct for any hw at the cost of materializing x_ext per call.
        z = jnp.zeros((hw,), x.dtype)
        return dia_spmv_pallas(vals, jnp.concatenate([z, x, z]),
                               offsets, hw, block)
    assert hw % 1024 == 0 or jax.default_backend() == "cpu", hw
    # DMA spans must stay tile-aligned on hardware; tiny operators (one
    # sub-1024 block) only arise in CPU/interpret tests
    assert block % 1024 == 0 or jax.default_backend() == "cpu", block
    if vals.dtype == jnp.float64 and jax.default_backend() not in ("cpu",):
        raise NotImplementedError(
            "the pallas DIA backend requires float32 storage on TPU")
    nblocks = Np // block
    kernel = functools.partial(_dia_kernel_np, offsets, hw, block)
    interpret = jax.default_backend() == "cpu"
    try:
        vma = jax.typeof(vals).vma
        out_shape = jax.ShapeDtypeStruct((Np,), vals.dtype, vma=vma)
    except (AttributeError, TypeError):
        out_shape = jax.ShapeDtypeStruct((Np,), vals.dtype)
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((K, block), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block + 2 * hw,), vals.dtype),
            pltpu.VMEM((block + 2 * hw,), vals.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Np,
            bytes_accessed=(K * Np + 2 * Np) * vals.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, vals)


# ---------------------------------------------------------------------------
# Ring-buffer SpMV: x streamed through VMEM exactly once, any halo width.
#
# The windowed kernels above DMA a (B + 2hw)-wide window per block, so x is
# read (1 + 2hw/B)× — ruinous for wide stencils (27-pt 3-D at n=256 has
# hw ≈ n² ≈ 4B, i.e. 9× the x traffic; the measured 61%-of-roofline gap).
# Here a persistent VMEM ring of R = 2m+2 blocks (m = ceil(hw/B)) holds the
# live x span [iB − mB, iB + (m+1)B); each grid step DMAs exactly ONE new
# B-chunk (prefetched a full step ahead — R has the +2 so the prefetch
# never lands on a block the current step still reads).  One extra
# "mirror" block after the ring holds a copy of ring block 0, so slice
# windows never wrap: every read is a single static slice.  Slice starts
# depend on i only through i mod R, so the compute is unrolled over the R
# phases with all offsets static (Mosaic rejects dynamic 1-D VMEM slices).
# x HBM traffic: Np·(1 + 1/R) (the 1/R is the mirrored chunks).
# ---------------------------------------------------------------------------


class RingWindow:
    """In-kernel helper managing the ring: call ``initial_fill()`` once
    under ``pl.when(i == 0)``, then inside each phase branch p call
    ``prefetch(i, p)``, ``wait(i, p)``, and read ``slice_at(p, off)``.
    Shared by the SpMV and fused-iteration ring kernels."""

    def __init__(self, m: int, B: int, nb: int, x_hbm, ring, sem):
        self.m, self.B, self.nb = m, B, nb
        self.R = 2 * m + 2
        self.RB = self.R * B
        self.x_hbm, self.ring, self.sem = x_hbm, ring, sem

    def _chunk_dma(self, j, blk):
        # x chunk j (HBM [jB, (j+1)B)) -> ring block blk (static)
        return pltpu.make_async_copy(
            self.x_hbm.at[pl.ds(j * jnp.int32(self.B), self.B)],
            self.ring.at[pl.ds(jnp.int32(blk * self.B), self.B)],
            self.sem.at[jnp.int32(0)])

    def _mirror_dma(self, j):
        # duplicate of ring block 0 at block R: reads never wrap
        return pltpu.make_async_copy(
            self.x_hbm.at[pl.ds(j * jnp.int32(self.B), self.B)],
            self.ring.at[pl.ds(jnp.int32(self.RB), self.B)],
            self.sem.at[jnp.int32(1)])

    def _zero(self, blk):
        self.ring[pl.ds(blk * self.B, self.B)] = \
            jnp.zeros((self.B,), self.ring.dtype)

    def initial_fill(self):
        """Fill chunks −m..m (zeros outside [0, nb)).  Call at i == 0."""
        m, R, nb = self.m, self.R, self.nb
        for j in range(-m, m + 1):
            blk = j % R
            if 0 <= j < nb:
                self._chunk_dma(jnp.int32(j), blk).start()
                if blk == 0:
                    self._mirror_dma(jnp.int32(j)).start()
            else:
                self._zero(blk)
                if blk == 0:
                    self._zero(R)

    def prefetch(self, i, p: int):
        """Start the DMA for chunk i+m+1 into ring block (p+m+1) mod R
        (replacing chunk i−m−1, which step i no longer reads)."""
        m, R, nb = self.m, self.R, self.nb
        one = jnp.int32(1)
        nblk = (p + m + 1) % R

        @pl.when(i + m + one < nb)
        def _():
            self._chunk_dma(i + m + one, nblk).start()
            if nblk == 0:
                self._mirror_dma(i + m + one).start()

        @pl.when((i + one < nb) & (i + m + one >= nb))
        def _():
            # next step reads this block as zeros (past the end of x)
            self._zero(nblk)
            if nblk == 0:
                self._zero(R)

    def wait(self, i, p: int):
        """Wait for this step's newest chunk(s)."""
        m, R, nb = self.m, self.R, self.nb

        @pl.when(i == 0)
        def _():
            for j in range(0, min(m + 1, nb)):
                self._chunk_dma(jnp.int32(j), j % R).wait()
                if j % R == 0:
                    self._mirror_dma(jnp.int32(j)).wait()

        wblk = (p + m) % R

        @pl.when((i > 0) & (i + m < nb))
        def _():
            self._chunk_dma(i + m, wblk).wait()
            if wblk == 0:
                self._mirror_dma(i + m).wait()

    def slice_at(self, p: int, off: int):
        """x[iB + off : iB + off + B] as one static VMEM slice (phase p)."""
        return self.ring[pl.ds((p * self.B + off) % self.RB, self.B)]


def ring_scratch_shapes(m: int, block: int, dtype):
    """(ring VMEM buffer, 2-semaphore array) scratch for a RingWindow."""
    R = 2 * m + 2
    return [pltpu.VMEM(((R + 1) * block,), dtype),
            pltpu.SemaphoreType.DMA((2,))]


def _dia_ring_kernel(offsets, m, B, nb, x_hbm, vals_ref, y_ref, ring, sem):
    R = 2 * m + 2
    i = pl.program_id(0).astype(jnp.int32)
    win = RingWindow(m, B, nb, x_hbm, ring, sem)
    phase = jax.lax.rem(i, jnp.int32(R))

    @pl.when(i == 0)
    def _():
        win.initial_fill()

    for p in range(R):

        @pl.when(phase == p)
        def _(p=p):
            win.prefetch(i, p)
            win.wait(i, p)
            # compute: all slice starts static for this phase.  (A
            # dual-accumulator variant was measured IDENTICAL at K=27 —
            # 3038 both ways — the limiter is the misaligned-slice load
            # handling, not the add chain; the single accumulator keeps
            # bit-equality with the XLA shifted-slice order.)
            acc = None
            for k, off in enumerate(offsets):
                term = vals_ref[k, :] * win.slice_at(p, off)
                acc = term if acc is None else acc + term
            y_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "block"))
def dia_spmv_ring(vals: jnp.ndarray, x: jnp.ndarray,
                  offsets: tuple[int, ...], block: int) -> jnp.ndarray:
    """y = A @ x with x UNPADDED (Np,), x streamed through a VMEM ring
    exactly once — the wide-stencil fast path (any |offset| < Np)."""
    K, Np = vals.shape
    assert Np % block == 0, (Np, block)
    assert x.shape[0] == Np
    hw = max(max(abs(o) for o in offsets), 1)
    m = -(-hw // block)
    R = 2 * m + 2
    assert block % 1024 == 0 or jax.default_backend() == "cpu", block
    if vals.dtype == jnp.float64 and jax.default_backend() not in ("cpu",):
        raise NotImplementedError(
            "the pallas DIA backend requires float32 storage on TPU")
    nblocks = Np // block
    kernel = functools.partial(_dia_ring_kernel, offsets, m, block, nblocks)
    interpret = jax.default_backend() == "cpu"
    try:
        vma = jax.typeof(vals).vma
        out_shape = jax.ShapeDtypeStruct((Np,), vals.dtype, vma=vma)
    except (AttributeError, TypeError):
        out_shape = jax.ShapeDtypeStruct((Np,), vals.dtype)
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((K, block), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=ring_scratch_shapes(m, block, vals.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Np,
            bytes_accessed=(K * Np + 2 * Np + Np // R) * vals.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, vals)


def pick_block_ring(Np: int, K: int, hw: int, itemsize: int,
                    vmem_budget: int = 8 * 1024 * 1024,
                    max_phase_terms: int = 1024) -> int | None:
    """Block size for the ring kernel: double-buffered vals (2K·B), the
    (2m+3)-block ring (≈ 2hw + 3B), and the y block must fit VMEM, and the
    phase-unrolled compute (R·K static slice terms) must stay within a
    compile-size budget.  Returns None when no block qualifies (fall back
    to the windowed kernels)."""
    if Np <= 128:
        return None
    # start at 32768: fewer grid steps measurably help (3048 -> 3039 us
    # at K=27); VMEM-heavy configs fall through to smaller blocks
    b = 32768
    while b > Np:
        b //= 2
    while b >= 1024:
        m = -(-hw // b)
        R = 2 * m + 2
        need = ((2 * K + 3) * b + (R + 1) * b) * itemsize
        if need <= vmem_budget and Np % b == 0 and R * K <= max_phase_terms:
            return b
        b //= 2
    return None


def pick_block(Np: int, K: int, hw: int, itemsize: int,
               vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest power-of-two block ≤ Np such that the double-buffered vals
    blocks (2K·B, Pallas pipelines the BlockSpec operand), two x windows
    (2·(B+2hw)) and the y block fit the VMEM budget.  Np is always a
    multiple of the operator's pad (a power-of-two multiple of 128), so a
    dividing power of two always exists."""
    if Np <= 128:
        return Np
    b = 16384
    while b > Np:
        b //= 2
    while b > 128:
        need = ((2 * K + 3) * b + 4 * hw) * itemsize
        if need <= vmem_budget and Np % b == 0:
            return b
        b //= 2
    return b if Np % b == 0 else Np


class PallasDiaSpmv:
    """Callable SpMV closure selecting a valid block size for the operand."""

    def __init__(self, offsets, Np: int, hw: int, K: int, itemsize: int):
        self.offsets = tuple(int(o) for o in offsets)
        self.hw = hw
        self.block = pick_block(Np, K, hw, itemsize)

    def __call__(self, vals: jnp.ndarray, x_ext: jnp.ndarray) -> jnp.ndarray:
        return dia_spmv_pallas(vals, x_ext, self.offsets, self.hw, self.block)
