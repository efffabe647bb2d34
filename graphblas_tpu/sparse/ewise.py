"""Elementwise ops on the padded-CSR backend: union/intersection merges,
apply, select, and reduction — without densifying.

Reference: ``GB_add.c`` (4-case union merge), ``GB_emult.c``
(intersection), ``GB_apply_op.c``, ``GB_select.c``,
``GB_reduce_to_scalar/column``.  Merge *structure* is decided host-side
on the sorted COO duals (numpy set ops — the analogue of the reference's
symbolic phase); the *values* are combined on device in one vectorized
pass over the merged edge list, so the O(nnz) hot work stays on the VPU
and the result is again a padded CsrMatrix.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.monoids import Monoid
from ..core.ops import BinaryOp, SelectOp, UnaryOp
from ..core.types import Type
from .container import CsrMatrix, csr_from_coo
from .spmv import segment_reduce

__all__ = ["csr_ewise_add", "csr_ewise_mult", "csr_apply", "csr_select",
           "csr_reduce_rows", "csr_reduce_scalar"]


def _lin(I, J, ncols):
    return I.astype(np.int64) * ncols + J.astype(np.int64)


def csr_ewise_add(op: BinaryOp, A: CsrMatrix, B: CsrMatrix) -> CsrMatrix:
    """C = A ∪ B with op on the intersection (``GrB_eWiseAdd``)."""
    if A.shape != B.shape:
        raise ValueError(f"shape mismatch {A.shape} vs {B.shape}")
    Ia, Ja, Xa = A.extractTuples()
    Ib, Jb, Xb = B.extractTuples()
    la, lb = _lin(Ia, Ja, A.ncols), _lin(Ib, Jb, A.ncols)
    # symbolic: union + membership (sorted arrays)
    both, ia_idx, ib_idx = np.intersect1d(la, lb, assume_unique=True,
                                          return_indices=True)
    only_a = np.setdiff1d(np.arange(len(la)), ia_idx, assume_unique=True)
    only_b = np.setdiff1d(np.arange(len(lb)), ib_idx, assume_unique=True)
    # numeric: one device pass over the intersection
    zt = op.ztype
    if len(ia_idx):
        zboth = np.asarray(jax.device_get(
            op(jnp.asarray(Xa[ia_idx]), jnp.asarray(Xb[ib_idx]))))
    else:
        zboth = np.zeros(0, zt.dtype)
    I = np.concatenate([Ia[ia_idx], Ia[only_a], Ib[only_b]])
    J = np.concatenate([Ja[ia_idx], Ja[only_a], Jb[only_b]])
    X = np.concatenate([zboth.astype(zt.dtype),
                        Xa[only_a].astype(zt.dtype),
                        Xb[only_b].astype(zt.dtype)])
    return csr_from_coo(I, J, X, A.nrows, A.ncols, type=zt,
                        sum_duplicates=False)


def csr_ewise_mult(op: BinaryOp, A: CsrMatrix, B: CsrMatrix) -> CsrMatrix:
    """C = A ∩ B with op (``GrB_eWiseMult``)."""
    if A.shape != B.shape:
        raise ValueError(f"shape mismatch {A.shape} vs {B.shape}")
    Ia, Ja, Xa = A.extractTuples()
    Ib, Jb, Xb = B.extractTuples()
    la, lb = _lin(Ia, Ja, A.ncols), _lin(Ib, Jb, A.ncols)
    both, ia_idx, ib_idx = np.intersect1d(la, lb, assume_unique=True,
                                          return_indices=True)
    zt = op.ztype
    if len(ia_idx):
        z = np.asarray(jax.device_get(
            op(jnp.asarray(Xa[ia_idx]), jnp.asarray(Xb[ib_idx]))))
    else:
        z = np.zeros(0, zt.dtype)
    return csr_from_coo(Ia[ia_idx], Ja[ia_idx], z.astype(zt.dtype),
                        A.nrows, A.ncols, type=zt, sum_duplicates=False)


def csr_apply(op: UnaryOp, A: CsrMatrix) -> CsrMatrix:
    """C = op(A): pattern shared, one vectorized device pass over the
    padded value array (the ``GB_shallow_op`` trick — structure arrays
    are reused by reference)."""
    vals = op(jnp.asarray(A.values))
    # keep padded slots at zero
    k = jnp.arange(A.nzmax) < A.nvals
    vals = jnp.where(k, vals, jnp.zeros((), vals.dtype))
    return CsrMatrix(A.indptr, A.indices, A.rowids, vals, A.nvals,
                     A.nrows, A.ncols, op.ztype)


def csr_select(op: SelectOp, A: CsrMatrix, thunk=0) -> CsrMatrix:
    """C = select(A, thunk): one vectorized predicate over the edge
    list, then compaction (``GxB_select`` / GB_select.c)."""
    I, J, X = A.extractTuples()
    keep = np.asarray(jax.device_get(op(
        jnp.asarray(I), jnp.asarray(J), jnp.asarray(X), thunk)),
        dtype=bool)
    return csr_from_coo(I[keep], J[keep], X[keep], A.nrows, A.ncols,
                        type=A.type, sum_duplicates=False,
                        nzmax=A.nzmax)


def csr_reduce_rows(mon: Monoid, A: CsrMatrix):
    """(vals, pattern) of the per-row monoid reduction
    (``GB_reduce_to_column``); one segment-reduce on device."""
    vals = jnp.asarray(A.values)
    rows = jnp.minimum(A.rowids, A.nrows)
    red = segment_reduce(mon.op.name, jnp.where(
        jnp.arange(A.nzmax) < A.nvals, vals,
        jnp.asarray(mon.identity, vals.dtype)),
        rows, A.nrows + 1, mon.identity)[:A.nrows]
    deg = A.row_degrees()
    return red, deg > 0


def csr_reduce_scalar(mon: Monoid, A: CsrMatrix):
    """Full reduction to a host scalar (``GB_reduce_to_scalar``)."""
    vals = np.asarray(A.values)[:A.nvals]
    if not len(vals):
        return mon.identity
    r = mon.reduce(jnp.asarray(vals), axis=None)
    return np.asarray(jax.device_get(r))[()]
