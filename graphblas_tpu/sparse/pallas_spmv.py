"""Pallas BSR SpMV: single-dispatch y = A (+.x) x on dense 128x128 tiles.

Why this exists (PERF.md envelope): every XLA SpMV form is bound either
by the per-lane x-gather (~0.12 G lanes/s) or, through the tunneled
runtime, by the per-dispatch tax on multi-stage kernels.  This kernel
removes both: the whole SpMV is ONE pallas_call whose grid walks the
occupied 128x128 tiles of A (sorted by row-block), keeps the y
row-block accumulator in VMEM across consecutive tiles, and performs
each tile·x_block product on the MXU.  The per-lane gather disappears
entirely — "gathering" x at a tile's column indices IS the tile matmul
(the one-hot-matmul gather trick, measured 14x faster than scalar
gathers on this machine).

Cost model: one 64 KB (f32) tile DMA per occupied tile.  HBM-bound rate
is therefore ~nnz_per_tile / 80 ns; the engine wins over the gather
kernel (8.3 ns/lane) whenever tiles average >= ~10 entries, which the
auto-select below checks (the ``GB_AxB_select.c:93-159`` analogue for
SpMV).

Semantics note (same caveat as every dense/MXU path in this framework):
absent entries participate as multiplicative zeros, so a non-finite x
entry against an absent A entry contributes 0*inf = NaN where the
reference contributes nothing.  Exact for finite data.

Reference counterpart: the generated semiring SpMV row walks
(``Source/Generator/GB_AxB.c``); the BSR decomposition replaces the
row walk with MXU tile products per SURVEY §7's design mapping.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsr import TILE

__all__ = ["bsr_spmv_plan", "bsr_spmv", "bsr_spmv_ok"]

#: engine pays one tile DMA per ~this many lanes to break even with the
#: one-gather kernel (64 KB / 800 GB/s = 80 ns vs 8.3 ns/lane)
MIN_NNZ_PER_TILE = 8
#: cap on materialized tile bytes (f32) — a memory guard, not a speed
#: model: the throughput decision is MIN_NNZ_PER_TILE (tile-DMA time vs
#: per-lane gather time); 2 GB of tiles on a 16 GB chip is a fine trade
#: for a hot iterated SpMV
MAX_TILE_BYTES = 2 << 30


def _kernel(rb_ref, cb_ref, slot_ref, valid_ref, tile_ref, x_ref, y_ref):
    t = pl.program_id(0)
    prev = rb_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, prev != rb_ref[t])

    @pl.when(first)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    @pl.when(valid_ref[t] != 0)
    def _():
        # y(rb) += A_tile(rb,cb) @ x(cb) as the row-vector product
        # x(1,128) · tile(128,128)^T — one MXU matvec; HIGHEST keeps
        # f32 operands on true-f32 passes (results must match the
        # reference within f32 roundoff, not bf16).  x/y ride (nb,1,T)
        # layouts because Mosaic blocks need (8k,128)-aligned trailing
        # dims.
        y_ref[0] += jax.lax.dot_general(
            x_ref[0], tile_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=y_ref.dtype,
            precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnums=(5, 6))
def _launch(rb, cb, slot, valid, tiles, nrb: int, interpret: bool, x2d):
    T = tiles.shape[1]
    nt = rb.shape[0]

    def tmap(t, rb, cb, slot, valid):
        z = jnp.zeros((), jnp.int32)
        return (slot[t], z, z)

    def xmap(t, rb, cb, slot, valid):
        z = jnp.zeros((), jnp.int32)
        return (cb[t], z, z)

    def ymap(t, rb, cb, slot, valid):
        z = jnp.zeros((), jnp.int32)
        return (rb[t], z, z)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, T, T), tmap),
            pl.BlockSpec((1, 1, T), xmap),
        ],
        out_specs=pl.BlockSpec((1, 1, T), ymap),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb, 1, T), tiles.dtype),
        interpret=interpret,
    )(rb, cb, slot, valid, tiles, x2d)


def bsr_spmv_plan(A, T: int = TILE, dtype=np.float32):
    """Host-side once-per-matrix BSR decomposition for the SpMV kernel
    (cached on the container like ``spmv_plan``).  Builds f32 value
    tiles straight from the CSR tuples (no dense [m,n] intermediate)
    and the row-block-sorted triple schedule, with one invalid dummy
    triple per empty row-block so every y block gets zeroed."""
    key = ("_bsr_spmv_plan", T, np.dtype(dtype).str)
    plan = A._options.get(key)
    if plan is not None:
        return plan
    host_pat = A._options.get("host_pattern")
    if host_pat is not None:
        rows, cols = host_pat
    else:
        rows = np.asarray(A.rowids)
        cols = np.asarray(A.indices)
    live = rows < A.nrows                    # drop padded lanes
    rows, cols = rows[live], cols[live]
    vals = np.asarray(jax.device_get(A.values))[: len(live)][live]
    m, n = A.nrows, A.ncols
    nrb, ncb = -(-m // T), -(-n // T)
    ti = rows // T
    tj = cols // T
    tid = ti.astype(np.int64) * ncb + tj
    order = np.argsort(tid, kind="stable")
    tid_s = tid[order]
    uniq, starts = np.unique(tid_s, return_index=True)
    ntiles = len(uniq)
    tiles = np.zeros((ntiles, T, T), dtype)
    # slot lookup via searchsorted on the sorted uniq list: O(nnz log
    # ntiles) and dimension-independent (a dense nrb*ncb table would be
    # ~34 GB for a 2^23-dim square matrix that passes the ntiles cap);
    # accumulate with add.at so duplicate (i,j) entries sum, matching
    # the additive per-lane semantics of the gather/sorted kernels
    # (both ADVICE r2 medium findings)
    slot_s = np.searchsorted(uniq, tid_s)
    np.add.at(tiles, (slot_s, (rows % T)[order], (cols % T)[order]),
              vals[order].astype(dtype))
    rb = (uniq // ncb).astype(np.int32)
    cb = (uniq % ncb).astype(np.int32)
    slot = np.arange(ntiles, dtype=np.int32)
    valid = np.ones(ntiles, np.int32)
    empty_rb = np.setdiff1d(np.arange(nrb, dtype=np.int32), rb)
    if len(empty_rb):
        rb = np.concatenate([rb, empty_rb])
        cb = np.concatenate([cb, np.zeros(len(empty_rb), np.int32)])
        slot = np.concatenate([slot, np.zeros(len(empty_rb), np.int32)])
        valid = np.concatenate([valid, np.zeros(len(empty_rb), np.int32)])
        reorder = np.argsort(rb, kind="stable")
        rb, cb, slot, valid = (rb[reorder], cb[reorder], slot[reorder],
                               valid[reorder])
    plan = (jnp.asarray(rb), jnp.asarray(cb), jnp.asarray(slot),
            jnp.asarray(valid), jnp.asarray(tiles), nrb, ncb, ntiles)
    A._options[key] = plan
    return plan


def bsr_spmv_ok(sr, A, T: int = TILE) -> bool:
    """Flop-model gate: f32 PLUS_TIMES, tiles dense enough to beat the
    one-gather kernel, tile bytes within budget, concrete (non-tracer)
    pattern."""
    if (sr.add.op.name, sr.mult.name) != ("PLUS", "TIMES"):
        return False
    if A.type.is_udt or np.dtype(sr.ztype.dtype) != np.float32:
        return False
    # per-matrix tri-state override (GxB_Matrix_Option_set scope):
    # False = opt out — dense tiles contribute 0*inf = NaN for rows
    # sharing a column block with a non-finite x entry, where the
    # gather kernel contributes nothing (ADVICE r2 low finding);
    # True = force past the backend gate (tests); None = auto.
    opt = A._options.get("bsr_spmv")
    if opt is False:
        return False
    if opt is not True and jax.default_backend() == "cpu":
        # interpret-mode Pallas is far slower than the XLA gather kernel;
        # the kernel stays reachable directly (tests pass interpret=True
        # or force with A._options['bsr_spmv'] = True)
        return False
    if isinstance(A.indices, jax.core.Tracer):
        return False
    if A.nvals == 0:
        return False
    gate_key = ("_bsr_spmv_ok", T)
    cached = A._options.get(gate_key)
    if cached is not None:
        return cached
    # tile count from the cached plan if present, else estimate cheaply
    key = ("_bsr_spmv_plan", T, np.dtype(np.float32).str)
    plan = A._options.get(key)
    if plan is not None:
        ntiles = plan[7]
    else:
        host_pat = A._options.get("host_pattern")
        if host_pat is not None:
            rows, cols = host_pat
        else:
            rows = np.asarray(A.rowids)
            cols = np.asarray(A.indices)
        live = rows < A.nrows
        ncb = -(-A.ncols // T)
        tid = (rows[live] // T).astype(np.int64) * ncb + cols[live] // T
        ntiles = len(np.unique(tid))
    ok = (ntiles * T * T * 4 <= MAX_TILE_BYTES
          and A.nvals / max(ntiles, 1) >= MIN_NNZ_PER_TILE)
    A._options[gate_key] = ok
    return ok


def bsr_spmv(sr, A, x, interpret: bool = None):
    """(yvals, ypat) = A (PLUS_TIMES f32) x as ONE pallas dispatch.
    ``x`` is the dense [ncols] value array (already cast to f32 by the
    caller); pattern comes from the row degrees as in the dense-x
    kernels."""
    from ..ops.flopcount import record_axb_method
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rb, cb, slot, valid, tiles, nrb, ncb, _ = bsr_spmv_plan(A)
    T = tiles.shape[1]
    x2d = jnp.zeros((ncb * T,), tiles.dtype).at[: A.ncols].set(
        jnp.asarray(x, tiles.dtype)).reshape(ncb, 1, T)
    y2d = _launch(rb, cb, slot, valid, tiles, nrb, interpret, x2d)
    y = y2d.reshape(nrb * T)[: A.nrows]
    deg = A.indptr[1:] - A.indptr[:-1]
    ypat = deg > 0
    y = jnp.where(ypat, y.astype(sr.ztype.dtype), 0)
    record_axb_method("pallas:bsr_spmv")
    return y, ypat
