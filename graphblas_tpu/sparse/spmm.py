"""SpMM: CSR sparse matrix x dense matrix, dense output.

The single-x SpMV kernels (:mod:`spmv`) are bound by the per-lane
x-gather (~0.1 G lanes/s on this machine) or the routing sort
(~0.4 G keys/s) — PERF.md's measured envelope.  Gathering k-wide ROWS
of a dense right operand costs roughly the same per row as a scalar
gather, so batching k vectors through one gather multiplies the useful
work per random access by k: the TPU-idiomatic answer to "SpMV faster
than the gather bound" is SpMM (VERDICT round-3 #3 names exactly this).

Engine: **bucketed ELL**.  At plan time (host, cached per matrix) rows
are grouped into power-of-two length buckets and the entries permuted
into bucket-major slot order with identity padding.  Per call, ONE
jitted program gathers X rows at the slot columns, multiplies by the
slot values, reduces each bucket with a dense axis reduce
(reshape (rows, L, k) -> monoid over axis 1), and scatters the bucket
rows into place.  No global cumsum: the widened-f64 prefix sum the
SpMV kernel uses for exactness is EMULATED on TPU and was measured 5x
slower than the gather itself at k=32; per-row native-dtype
accumulation both matches the reference's sequential fold semantics
(``Generator/GB_AxB.c`` row walks) and runs at dense-reduce bandwidth.

Reference counterpart: the reference has no dense-operand special case
— ``GB_mxm.c`` runs its saxpy workers column-by-column over a dense B
at the same per-entry cost as the sparse case.  Here the dense operand
unlocks a ~k× higher MAC rate at identical traffic per nnz.
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
import numpy as np

from ..core.semirings import Semiring
from .container import CsrMatrix
from .spmv import _mult_apply

__all__ = ["csr_spmm_dense", "spmm_plan"]


class _SpmmPlan:
    """Bucketed-ELL slot layout: perm gathers A's padded entries into
    bucket-major slots (sentinel nzmax -> padded slot); buckets is a
    tuple of (offset, nrows_in_bucket, L); rowids the concatenated
    bucket row ids (device)."""

    def __init__(self, cols_slot, perm, rowids, buckets, nslots):
        self.cols_slot = cols_slot      # (nslots,) int32, device
        self.perm = perm                # (nslots,) int32, device
        self.rowids = rowids            # (sum rows,) int32, device
        self.buckets = buckets          # tuple of (off, cnt, L)
        self.nslots = nslots


def spmm_plan(A: CsrMatrix) -> _SpmmPlan:
    plan = A._options.get("_spmm_plan")
    if plan is not None:
        return plan
    indptr = np.asarray(A.indptr)
    cols = np.asarray(A.indices)
    deg = np.diff(indptr).astype(np.int64)
    rows_live = np.nonzero(deg > 0)[0]
    # power-of-two bucket per live row
    L = np.ones_like(deg)
    np.maximum(L, 1 << np.ceil(np.log2(np.maximum(deg, 1))).astype(int),
               out=L)
    order = np.argsort(L[rows_live], kind="stable")
    rows_b = rows_live[order]
    Lb = L[rows_b]
    # slot arrays
    nslots = int(Lb.sum())
    perm = np.full(nslots, A.nzmax, np.int32)      # sentinel: padded
    cols_slot = np.full(nslots, A.ncols, np.int32)
    offs = np.concatenate([[0], np.cumsum(Lb)])
    # vectorized slot fill: entry e of row r lands at
    # offs[rank(r)] + (e - indptr[r])
    nnz = int(deg.sum())
    if nnz:
        rnk = np.zeros(len(deg), np.int64)
        rnk[rows_b] = np.arange(len(rows_b))
        row_of_e = np.repeat(np.arange(len(deg)), deg)
        e = np.arange(nnz, dtype=np.int64)
        slot_of_e = offs[rnk[row_of_e]] + (e - indptr[row_of_e])
        perm[slot_of_e] = e.astype(np.int32)
        cols_slot[slot_of_e] = cols[:nnz]
    # bucket table: contiguous runs of equal L
    buckets = []
    i = 0
    while i < len(rows_b):
        l = Lb[i]
        j = i
        while j < len(rows_b) and Lb[j] == l:
            j += 1
        buckets.append((int(offs[i]), int(j - i), int(l)))
        i = j
    plan = _SpmmPlan(jnp.asarray(cols_slot), jnp.asarray(perm),
                     jnp.asarray(rows_b.astype(np.int32)),
                     tuple(buckets), nslots)
    A._options["_spmm_plan"] = plan
    return plan


def _axis_reduce(add_name: str, z, identity):
    nm = add_name.upper()
    if nm == "PLUS":
        return jnp.sum(z, axis=1)
    if nm == "TIMES":
        return jnp.prod(z, axis=1)
    if nm in ("MAX", "LOR"):
        out = jnp.max(z if z.dtype != jnp.bool_ else z.astype(jnp.int32),
                      axis=1)
        return (out > 0) if z.dtype == jnp.bool_ else out
    if nm in ("MIN", "LAND"):
        out = jnp.min(z if z.dtype != jnp.bool_ else z.astype(jnp.int32),
                      axis=1)
        return (out > 0) if z.dtype == jnp.bool_ else out
    if nm == "LXOR":
        cnt = jnp.sum((z != 0).astype(jnp.int32), axis=1)
        return (cnt % 2 != 0).astype(z.dtype)
    if nm == "EQ":
        cnt = jnp.sum((z == 0).astype(jnp.int32), axis=1)
        return (cnt % 2 == 0).astype(z.dtype)
    raise NotImplementedError(f"spmm monoid {nm}")


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _spmm_jit(add_name: str, sr: Semiring, nrows: int, zdtype,
              x_all_present: bool, buckets, avals_ext, cols_slot, perm,
              rowids, X_ext, Xp_ext, identity):
    va = jnp.take(avals_ext, perm, axis=0)                # slot values
    Xg = jnp.take(X_ext, cols_slot, axis=0)               # (S, k) gather
    k = Xg.shape[1]
    z = jnp.broadcast_to(_mult_apply(sr, va[:, None], Xg), Xg.shape)
    pad_col = cols_slot >= (X_ext.shape[0] - 1)
    if x_all_present:
        dead = pad_col[:, None]
    else:
        dead = pad_col[:, None] | ~jnp.take(Xp_ext, cols_slot, axis=0)
    z = jnp.where(dead, jnp.asarray(identity, z.dtype), z)
    outs, pats = [], []
    for off, cnt, L in buckets:
        zb = jax.lax.dynamic_slice_in_dim(z, off, cnt * L, 0) \
            .reshape(cnt, L, k)
        outs.append(_axis_reduce(add_name, zb, identity))
        if not x_all_present:
            db = jax.lax.dynamic_slice_in_dim(dead, off, cnt * L, 0) \
                .reshape(cnt, L, k)
            pats.append(jnp.any(~db, axis=1))
    yb = jnp.concatenate(outs, axis=0) if outs else \
        jnp.zeros((0, k), z.dtype)
    y = jnp.full((nrows + 1, k), identity, z.dtype) \
        .at[jnp.minimum(rowids, nrows)].set(yb, mode="drop")[:nrows]
    if x_all_present:
        ypat = jnp.zeros((nrows + 1,), bool) \
            .at[jnp.minimum(rowids, nrows)].set(True,
                                                mode="drop")[:nrows]
        ypat = jnp.broadcast_to(ypat[:, None], (nrows, k))
    else:
        pb = jnp.concatenate(pats, axis=0) if pats else \
            jnp.zeros((0, k), bool)
        ypat = jnp.zeros((nrows + 1, k), bool) \
            .at[jnp.minimum(rowids, nrows)].set(pb, mode="drop")[:nrows]
    y = jnp.where(ypat, y.astype(zdtype), jnp.zeros((), zdtype))
    return y, ypat


def csr_spmm_dense(sr: Semiring, A: CsrMatrix, Xvals, Xpat=None):
    """Dense-output SpMM through the bucketed-ELL engine.  ``Xvals`` is
    a [ncols, k] value array; ``Xpat`` an optional same-shape bool
    presence mask (None = fully present).  Returns (yvals, ypat), with
    per-column semantics matching ``_csr_mxv_jit`` (absent X entries
    contribute the add identity; output pattern = rows with >= 1 live
    contribution per column)."""
    from ..ops.flopcount import record_axb_method
    A = A.wait() if A._pending else A
    plan = spmm_plan(A)
    zdt = sr.ztype.dtype
    k = Xvals.shape[1]
    Xe = jnp.concatenate(
        [jnp.asarray(Xvals), jnp.zeros((1, k), Xvals.dtype)], axis=0)
    if Xpat is None:
        Xpe = jnp.ones((1, 1), bool)  # unused placeholder
        allp = True
    else:
        Xpe = jnp.concatenate(
            [jnp.asarray(Xpat), jnp.zeros((1, k), bool)], axis=0)
        allp = False
    avals = A.values
    if not A.type.is_udt and avals.dtype != np.dtype(sr.mult.xtype.dtype):
        avals = avals.astype(sr.mult.xtype.dtype)
    # slot-gather sentinel: identity value (washed again by `dead`)
    avals_ext = jnp.concatenate(
        [avals, jnp.zeros((1,), avals.dtype)])
    record_axb_method("spmm:ell")
    return _spmm_jit(sr.add.op.name, sr, A.nrows, zdt, allp,
                     plan.buckets, avals_ext, plan.cols_slot, plan.perm,
                     plan.rowids, Xe, Xpe, sr.add.identity)
