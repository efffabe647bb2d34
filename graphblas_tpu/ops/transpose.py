"""Transpose and Kronecker product.

Reference: ``Source/GB_transpose.c`` (bucket transpose, optionally fused
with a unary op + typecast) and ``GB_kron.c`` / ``GB_kron_kernel.c``.
On the bitmap backend transpose is a free layout permutation that XLA
folds into consumers; kron is a reshape-broadcast.  Sparse containers
transpose by pair re-sort (the bucket transpose of
``GB_transpose_bucket.c`` is a counting sort too) and kron by direct
tuple arithmetic — the output's (i, j) list is the outer sum of the
operand tuple lists, exactly ``GB_kron_kernel.c:9-17``'s loop, computed
vectorized.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.descriptor import Descriptor, desc_of
from ..core.mask import accum_mask
from ..core.matrix import Matrix
from ..core.ops import BinaryOp, UnaryOp
from ..core.types import cast
from ..utils import counters
from .containers import (UnsupportedContainer, to_bitmap_operand,
                         to_csr_operand, to_hyper_operand)

__all__ = ["transpose", "kron"]

_tmap = jax.tree_util.tree_map


@counters.counted("transpose")
def transpose(C: Matrix, M: Optional[Matrix], accum: Optional[BinaryOp],
              A: Matrix, desc: Optional[Descriptor] = None,
              op: Optional[UnaryOp] = None) -> Matrix:
    """C<M> = accum(C, A').  With INP0=TRAN this is C<M> = accum(C, A)
    (the double-transpose shortcut, ``GrB_transpose.c``)."""
    from .containers import require_container
    require_container(C, "transpose output C")
    require_container(M, "transpose mask", none_ok=True)
    require_container(A, "transpose input A")
    from ..core.resolve import resolve_accum, resolve_unary
    accum = resolve_accum(accum, "transpose accum", None, C, A)
    if op is not None:
        op = resolve_unary(op, "transpose op", None, A, C)
    d = desc_of(desc)
    from ..sparse.container import CsrMatrix, CscMatrix
    from ..sparse.hyper import HyperMatrix
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(C, HyperCscMatrix):
        from ..sparse.hyper import hyper_accum_mask, hyper_apply
        # C = A' by-col  <=>  C.tr = A (by-row frame)
        T = to_hyper_operand(A, d.tran0, "transpose input")
        if op is not None:
            T = hyper_apply(op, T, ztype=op.ztype)
        Mw = to_hyper_operand(M, True, "mask") if M is not None else None
        if T.shape != C.tr.shape:
            from ..core.errors import DimensionMismatch
            raise DimensionMismatch(
                f"A' is {T.shape[::-1]}, C is {C.shape}")
        return HyperCscMatrix(hyper_accum_mask(
            C.tr.wait(), Mw, T, accum, replace=d.replace,
            complement=d.mask_scmp, structural=d.mask_structure))
    if isinstance(C, HyperMatrix):
        from ..sparse.hyper import hyper_accum_mask, hyper_apply
        T = to_hyper_operand(A, not d.tran0, "transpose input")
        if op is not None:
            T = hyper_apply(op, T, ztype=op.ztype)
        Mw = to_hyper_operand(M, False, "mask") if M is not None else None
        if T.shape != C.shape:
            from ..core.errors import DimensionMismatch
            raise DimensionMismatch(f"A' is {T.shape}, C is {C.shape}")
        return hyper_accum_mask(C, Mw, T, accum, replace=d.replace,
                                complement=d.mask_scmp,
                                structural=d.mask_structure)
    if isinstance(C, (CsrMatrix, CscMatrix)):
        from ..sparse.ewise import csr_apply
        from ..sparse.mask import csr_accum_mask
        csc = isinstance(C, CscMatrix)
        Cw = C.tr if csc else C
        T = to_csr_operand(A, csc ^ (not d.tran0), "transpose input")
        if op is not None:
            T = csr_apply(op, T)
        Mw = to_csr_operand(M, csc, "mask") if M is not None else None
        if T.shape != Cw.shape:
            from ..core.errors import DimensionMismatch
            raise DimensionMismatch(f"A' is {T.shape}, C is {C.shape}")
        out = csr_accum_mask(Cw, Mw, T, accum, d)
        return CscMatrix(out) if csc else out
    A = to_bitmap_operand(A, "transpose input")
    M = to_bitmap_operand(M, "mask") if M is not None else None
    A = A.wait()
    vals, pat, t = A.values, A.pattern, A.type
    if not d.tran0:
        vals = _tmap(lambda a: a.T, vals)
        pat = pat.T
    if op is not None:
        vals = op(vals if t.is_udt else cast(vals, op.xtype))
        t = op.ztype
    T = Matrix(vals, pat, t).canonical()
    return accum_mask(C, M, T, accum, d)


def _kron_tuples(op: BinaryOp, A, B):
    """(I, J, X) of kron(A, B) from the operand tuple lists — the
    vectorized ``GB_kron_kernel.c`` loop.  Output nnz = nnzA * nnzB
    exactly (pairs are unique when the inputs are)."""
    IA, JA, XA = A.extractTuples()
    IB, JB, XB = B.extractTuples()
    bm, bn = B.shape
    I = (np.asarray(IA, np.int64)[:, None] * bm
         + np.asarray(IB, np.int64)[None, :]).ravel()
    J = (np.asarray(JA, np.int64)[:, None] * bn
         + np.asarray(JB, np.int64)[None, :]).ravel()
    xa = XA if A.type.is_udt else np.asarray(
        jax.device_get(cast(jnp.asarray(XA), op.xtype)))
    xb = XB if B.type.is_udt else np.asarray(
        jax.device_get(cast(jnp.asarray(XB), op.ytype)))
    Z = np.asarray(jax.device_get(
        op(jnp.asarray(xa)[:, None], jnp.asarray(xb)[None, :]))).ravel()
    return I, J, Z


@counters.counted("kron")
def kron(C: Matrix, M: Optional[Matrix], accum: Optional[BinaryOp],
         op: BinaryOp, A: Matrix, B: Matrix,
         desc: Optional[Descriptor] = None) -> Matrix:
    """C<M> = accum(C, kron(A,B)) with multiply op (``GxB_kron``)."""
    from .containers import require_container
    require_container(C, "kron output C")
    require_container(M, "kron mask", none_ok=True)
    require_container(A, "kron input A")
    require_container(B, "kron input B")
    from ..core.resolve import resolve_accum, resolve_binary
    op = resolve_binary(op, "kron op", None, A, B, C)
    accum = resolve_accum(accum, "kron accum", None, C, A)
    d = desc_of(desc)
    from ..sparse.container import CsrMatrix, CscMatrix
    from ..sparse.hyper import HyperMatrix
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(C, HyperCscMatrix):
        from ..sparse.hyper import hyper_accum_mask, hyper_from_coo
        # kron(A,B)' = kron(A',B'): transposed frame on the wrapper
        Aw = to_hyper_operand(A, not d.tran0, "kron input A")
        Bw = to_hyper_operand(B, not d.tran1, "kron input B")
        if op.ztype.is_udt or Aw.type.is_udt or Bw.type.is_udt:
            raise UnsupportedContainer(
                "UDT kron on the hypersparse container is not "
                "supported; use the CSR or bitmap container")
        I, J, Z = _kron_tuples(op, Aw, Bw)
        T = hyper_from_coo(I, J, Z, Aw.nrows * Bw.nrows,
                           Aw.ncols * Bw.ncols, type=op.ztype, dup=None)
        Mw = to_hyper_operand(M, True, "mask") if M is not None else None
        return HyperCscMatrix(hyper_accum_mask(
            C.tr.wait(), Mw, T, accum, replace=d.replace,
            complement=d.mask_scmp, structural=d.mask_structure))
    if isinstance(C, HyperMatrix):
        from ..sparse.hyper import (hyper_accum_mask, hyper_from_coo)
        Aw = to_hyper_operand(A, d.tran0, "kron input A")
        Bw = to_hyper_operand(B, d.tran1, "kron input B")
        if op.ztype.is_udt or Aw.type.is_udt or Bw.type.is_udt:
            raise UnsupportedContainer(
                "UDT kron on the hypersparse container is not "
                "supported; use the CSR or bitmap container")
        I, J, Z = _kron_tuples(op, Aw, Bw)
        T = hyper_from_coo(I, J, Z, Aw.nrows * Bw.nrows,
                           Aw.ncols * Bw.ncols, type=op.ztype, dup=None)
        Mw = to_hyper_operand(M, False, "mask") if M is not None else None
        return hyper_accum_mask(C, Mw, T, accum, replace=d.replace,
                                complement=d.mask_scmp,
                                structural=d.mask_structure)
    if isinstance(C, (CsrMatrix, CscMatrix)):
        from ..sparse.container import csr_from_coo
        from ..sparse.mask import csr_accum_mask
        csc = isinstance(C, CscMatrix)
        Cw = C.tr if csc else C
        # kron(A,B)' = kron(A',B'): the by-col frame transposes operands
        Aw = to_csr_operand(A, csc ^ d.tran0, "kron input A")
        Bw = to_csr_operand(B, csc ^ d.tran1, "kron input B")
        I, J, Z = _kron_tuples(op, Aw, Bw)
        T = csr_from_coo(I, J, Z, Aw.nrows * Bw.nrows,
                         Aw.ncols * Bw.ncols, type=op.ztype,
                         sum_duplicates=False)
        Mw = to_csr_operand(M, csc, "mask") if M is not None else None
        out = csr_accum_mask(Cw, Mw, T, accum, d)
        return CscMatrix(out) if csc else out
    A = to_bitmap_operand(A, "kron input A")
    B = to_bitmap_operand(B, "kron input B")
    M = to_bitmap_operand(M, "mask") if M is not None else None
    A = A.wait()
    B = B.wait()
    Av, Ap = A.values, A.pattern
    Bv, Bp = B.values, B.pattern
    if d.tran0:
        Av, Ap = _tmap(lambda a: a.T, Av), Ap.T
    if d.tran1:
        Bv, Bp = _tmap(lambda a: a.T, Bv), Bp.T
    am, an = Ap.shape
    bm, bn = Bp.shape
    a = cast(Av, op.xtype) if not A.type.is_udt else Av
    b = cast(Bv, op.ytype) if not B.type.is_udt else Bv

    def expand(x, y):
        z = op(_tmap(lambda u: u[:, None, :, None], x) if isinstance(x, dict)
               else x[:, None, :, None],
               _tmap(lambda v: v[None, :, None, :], y) if isinstance(y, dict)
               else y[None, :, None, :])
        return _tmap(lambda u: jnp.broadcast_to(
            u, (am, bm, an, bn)).reshape(am * bm, an * bn), z)

    vals = expand(a, b)
    pat = (Ap[:, None, :, None] & Bp[None, :, None, :]).reshape(
        am * bm, an * bn)
    T = Matrix(vals, pat, op.ztype).canonical()
    return accum_mask(C, M, T, accum, d)
