"""Elementwise operations: eWiseAdd (set union), eWiseMult (intersection),
apply, and select.

Reference: ``Source/GB_add.c`` (4-case per-vector union merge),
``GB_emult.c`` (intersection merge), ``GB_eWise.c`` (orchestrator),
``GB_apply.c``, ``GB_select.c``.  The reference runs every storage
format through the same orchestration (``GB_eWise.c``); here the OUTPUT
container picks the engine — bitmap (vectorized selects, one fused XLA
kernel), padded CSR / by-col CSC (sort-merge engines in
:mod:`graphblas_tpu.sparse.ewise` + the ``csr_accum_mask`` epilogue),
or hypersparse (pair-key merges + ``hyper_accum_mask``) — and operands
convert toward it.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.descriptor import Descriptor, desc_of
from ..core.errors import DimensionMismatch
from ..core.mask import accum_mask
from ..core.matrix import Matrix, Vector
from ..core.ops import BinaryOp, SelectOp, UnaryOp
from ..core.types import Type, cast
from ..utils import counters
from .containers import (UnsupportedContainer, to_bitmap_operand,
                         to_csr_operand, to_hyper_operand)

__all__ = ["eWiseAdd", "eWiseMult", "apply", "select"]

_tmap = jax.tree_util.tree_map


def _cast_vals(vals, src: Type, dst: Type):
    if src.is_udt or dst.is_udt:
        return vals
    return cast(vals, dst)


def _transposed(X, tran: bool):
    if not tran:
        return X
    X = X.wait()
    return X._replace(values=_tmap(lambda a: a.T, X.values),
                      pattern=X.pattern.T)


def _ewise_T(op: BinaryOp, A, B, union: bool):
    if A.shape != B.shape:
        raise DimensionMismatch(f"eWise shapes {A.shape} vs {B.shape}")
    zt = op.ztype
    a = _cast_vals(A.values, A.type, op.xtype)
    b = _cast_vals(B.values, B.type, op.ytype)
    both = A.pattern & B.pattern
    zboth = _cast_vals(op(a, b), op.ztype, zt)
    if union:
        # entries only in A (or only B) are cast directly, no op applied
        za = _cast_vals(A.values, A.type, zt)
        zb = _cast_vals(B.values, B.type, zt)
        pat = A.pattern | B.pattern
        vals = _tmap(lambda zz, xa, xb: jnp.where(
            both, zz, jnp.where(A.pattern, xa, xb)), zboth, za, zb)
    else:
        pat = both
        vals = zboth
    cls = A.__class__
    out = cls(vals, pat, zt) if not isinstance(vals, dict) else \
        cls(vals, pat, zt)
    return out.canonical()


# ---------------------------------------------------------------------------
# container dispatch (the GB_eWise orchestration for sparse outputs)
# ---------------------------------------------------------------------------

def _hyper_guard_udt(op, *types):
    if getattr(op, "ztype", None) is not None and op.ztype.is_udt \
            or any(t.is_udt for t in types):
        raise UnsupportedContainer(
            "UDT eWise on the hypersparse container is not supported; "
            "use the CSR or bitmap container")


def _ewise_hyper(C, M, accum, op, A, B, d, union):
    from ..sparse.hyper import hyper_accum_mask, hyper_ewise
    Aw = to_hyper_operand(A, d.tran0, "eWise input A")
    Bw = to_hyper_operand(B, d.tran1, "eWise input B")
    _hyper_guard_udt(op, Aw.type, Bw.type, C.type)
    Mw = to_hyper_operand(M, False, "mask") if M is not None else None
    if Aw.shape != C.shape:
        raise DimensionMismatch(
            f"eWise shapes {Aw.shape} vs C {C.shape}")
    T = hyper_ewise(op, Aw, Bw, union=union)
    return hyper_accum_mask(C, Mw, T, accum, replace=d.replace,
                            complement=d.mask_scmp,
                            structural=d.mask_structure)


def _ewise_csr(C, M, accum, op, A, B, d, union):
    from ..sparse.container import CscMatrix
    from ..sparse.ewise import csr_ewise_add, csr_ewise_mult
    from ..sparse.mask import csr_accum_mask
    csc = isinstance(C, CscMatrix)
    # by-col output: run in the transposed frame ((A ⊕ B)' = A' ⊕ B')
    # and re-wrap — the reference's is_csc flag flip, GB_eWise.c
    Cw = C.tr if csc else C
    Aw = to_csr_operand(A, csc ^ d.tran0, "eWise input A")
    Bw = to_csr_operand(B, csc ^ d.tran1, "eWise input B")
    Mw = to_csr_operand(M, csc, "mask") if M is not None else None
    if Aw.shape != Cw.shape:
        raise DimensionMismatch(
            f"eWise shapes {Aw.shape} vs C {C.shape}")
    T = (csr_ewise_add if union else csr_ewise_mult)(op, Aw, Bw)
    out = csr_accum_mask(Cw, Mw, T, accum, d)
    return CscMatrix(out) if csc else out


def _dispatch_ewise(C, M, accum, op, A, B, d, union):
    from ..sparse.container import CsrMatrix, CscMatrix
    from ..sparse.hyper import HyperMatrix
    from ..sparse.vector import SparseVec
    if isinstance(C, SparseVec):
        from ..sparse.hyper import hyper_accum_mask, hyper_ewise
        from .containers import vec_hyper_operand
        Aw = vec_hyper_operand(A, "eWise input A")
        Bw = vec_hyper_operand(B, "eWise input B")
        _hyper_guard_udt(op, Aw.type, Bw.type, C.type)
        Mw = vec_hyper_operand(M, "mask") if M is not None else None
        T = hyper_ewise(op, Aw, Bw, union=union)
        return SparseVec(hyper_accum_mask(
            C.hm, Mw, T, accum, replace=d.replace,
            complement=d.mask_scmp, structural=d.mask_structure))
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(C, HyperCscMatrix):
        # by-col output: run in the transposed frame ((A?B)' = A'?B')
        # on the wrapped by-row container — the is_csc flag flip
        from ..sparse.hyper import hyper_accum_mask, hyper_ewise
        Aw = to_hyper_operand(A, not d.tran0, "eWise input A")
        Bw = to_hyper_operand(B, not d.tran1, "eWise input B")
        _hyper_guard_udt(op, Aw.type, Bw.type, C.type)
        Mw = to_hyper_operand(M, True, "mask") if M is not None else None
        if Aw.shape != C.tr.shape:
            raise DimensionMismatch(
                f"eWise shapes {Aw.shape[::-1]} vs C {C.shape}")
        T = hyper_ewise(op, Aw, Bw, union=union)
        return HyperCscMatrix(hyper_accum_mask(
            C.tr.wait(), Mw, T, accum, replace=d.replace,
            complement=d.mask_scmp, structural=d.mask_structure))
    if isinstance(C, HyperMatrix):
        return _ewise_hyper(C, M, accum, op, A, B, d, union)
    if isinstance(C, (CsrMatrix, CscMatrix)):
        return _ewise_csr(C, M, accum, op, A, B, d, union)
    A = to_bitmap_operand(A, "eWise input A")
    B = to_bitmap_operand(B, "eWise input B")
    M = to_bitmap_operand(M, "mask") if M is not None else None
    A = _transposed(A.wait(), d.tran0 and isinstance(A, Matrix))
    B = _transposed(B.wait(), d.tran1 and isinstance(B, Matrix))
    T = _ewise_T(op, A, B, union=union)
    return accum_mask(C, M, T, accum, d)


def _require_ewise_args(C, M, A, B, what):
    from .containers import require_container
    require_container(C, f"{what} output C")
    require_container(M, f"{what} mask", none_ok=True)
    require_container(A, f"{what} input A")
    require_container(B, f"{what} input B")


@counters.counted("eWiseAdd")
def eWiseAdd(C, M, accum: Optional[BinaryOp], op: BinaryOp,
             A, B, desc: Optional[Descriptor] = None):
    """C<M> = accum(C, A+B): set-union merge (reference ``GrB_eWiseAdd``)."""
    _require_ewise_args(C, M, A, B, "eWiseAdd")
    d = desc_of(desc)
    from ..core.resolve import resolve_accum, resolve_binary
    op = resolve_binary(op, "eWiseAdd op", None, A, B, C)
    accum = resolve_accum(accum, "eWiseAdd accum", None, C, A)
    return _dispatch_ewise(C, M, accum, op, A, B, d, union=True)


@counters.counted("eWiseMult")
def eWiseMult(C, M, accum: Optional[BinaryOp], op: BinaryOp,
              A, B, desc: Optional[Descriptor] = None):
    """C<M> = accum(C, A.*B): intersection merge (``GrB_eWiseMult``)."""
    _require_ewise_args(C, M, A, B, "eWiseMult")
    d = desc_of(desc)
    from ..core.resolve import resolve_accum, resolve_binary
    op = resolve_binary(op, "eWiseMult op", None, A, B, C)
    accum = resolve_accum(accum, "eWiseMult accum", None, C, A)
    return _dispatch_ewise(C, M, accum, op, A, B, d, union=False)


@counters.counted("apply")
def apply(C, M, accum: Optional[BinaryOp], op: UnaryOp, A,
          desc: Optional[Descriptor] = None):
    """C<M> = accum(C, op(A)) (reference ``GrB_apply`` / ``GB_apply_op``).

    The reference's shallow-copy trick (``GB_shallow_op.c``) is free here:
    the pattern array is reused by reference, only values are mapped.
    """
    from .containers import require_container
    require_container(C, "apply output C")
    require_container(M, "apply mask", none_ok=True)
    require_container(A, "apply input A")
    from ..core.resolve import resolve_accum, resolve_unary
    op = resolve_unary(op, "apply op", None, A, C)
    accum = resolve_accum(accum, "apply accum", None, C, A)
    d = desc_of(desc)
    from ..sparse.container import CsrMatrix, CscMatrix
    from ..sparse.hyper import HyperMatrix
    from ..sparse.vector import SparseVec
    if isinstance(C, SparseVec):
        from ..sparse.hyper import hyper_accum_mask, hyper_apply
        from .containers import vec_hyper_operand
        Aw = vec_hyper_operand(A, "apply input")
        Mw = vec_hyper_operand(M, "mask") if M is not None else None
        T = hyper_apply(op, Aw, ztype=op.ztype)
        return SparseVec(hyper_accum_mask(
            C.hm, Mw, T, accum, replace=d.replace,
            complement=d.mask_scmp, structural=d.mask_structure))
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(C, HyperCscMatrix):
        from ..sparse.hyper import hyper_accum_mask, hyper_apply
        Aw = to_hyper_operand(A, not d.tran0, "apply input")
        Mw = to_hyper_operand(M, True, "mask") if M is not None else None
        if Aw.shape != C.tr.shape:
            raise DimensionMismatch(
                f"apply {Aw.shape[::-1]} vs C {C.shape}")
        T = hyper_apply(op, Aw, ztype=op.ztype)
        return HyperCscMatrix(hyper_accum_mask(
            C.tr.wait(), Mw, T, accum, replace=d.replace,
            complement=d.mask_scmp, structural=d.mask_structure))
    if isinstance(C, HyperMatrix):
        from ..sparse.hyper import hyper_accum_mask, hyper_apply
        Aw = to_hyper_operand(A, d.tran0, "apply input")
        Mw = to_hyper_operand(M, False, "mask") if M is not None else None
        if Aw.shape != C.shape:
            raise DimensionMismatch(f"apply {Aw.shape} vs C {C.shape}")
        T = hyper_apply(op, Aw, ztype=op.ztype)
        return hyper_accum_mask(C, Mw, T, accum, replace=d.replace,
                                complement=d.mask_scmp,
                                structural=d.mask_structure)
    if isinstance(C, (CsrMatrix, CscMatrix)):
        from ..sparse.ewise import csr_apply
        from ..sparse.mask import csr_accum_mask
        csc = isinstance(C, CscMatrix)
        Cw = C.tr if csc else C
        Aw = to_csr_operand(A, csc ^ d.tran0, "apply input")
        Mw = to_csr_operand(M, csc, "mask") if M is not None else None
        if Aw.shape != Cw.shape:
            raise DimensionMismatch(f"apply {Aw.shape} vs C {C.shape}")
        out = csr_accum_mask(Cw, Mw, csr_apply(op, Aw), accum, d)
        return CscMatrix(out) if csc else out
    A = to_bitmap_operand(A, "apply input")
    M = to_bitmap_operand(M, "mask") if M is not None else None
    A = _transposed(A.wait(), d.tran0 and isinstance(A, Matrix))
    a = _cast_vals(A.values, A.type, op.xtype)
    vals = op(a)
    T = A.__class__(vals, A.pattern, op.ztype).canonical()
    return accum_mask(C, M, T, accum, d)


def _index_grids(shape):
    if len(shape) == 1:
        i = jax.lax.broadcasted_iota(jnp.int64, (shape[0], 1), 0)[:, 0]
        return i, jnp.zeros_like(i)
    i = jax.lax.broadcasted_iota(jnp.int64, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int64, shape, 1)
    return i, j


@counters.counted("select")
def select(C, M, accum: Optional[BinaryOp], op: SelectOp, A,
           thunk: Any = 0, desc: Optional[Descriptor] = None):
    """C<M> = accum(C, select(A, thunk)) (reference ``GxB_select``)."""
    from .containers import require_container
    require_container(C, "select output C")
    require_container(M, "select mask", none_ok=True)
    require_container(A, "select input A")
    from ..core.resolve import resolve_accum, resolve_select
    op = resolve_select(op, "select op")
    accum = resolve_accum(accum, "select accum", None, C, A)
    d = desc_of(desc)
    from ..sparse.container import CsrMatrix, CscMatrix
    from ..sparse.hyper import HyperMatrix
    from ..sparse.vector import SparseVec
    if isinstance(C, SparseVec):
        from ..sparse.hyper import hyper_accum_mask, hyper_select
        from .containers import vec_hyper_operand
        Aw = vec_hyper_operand(A, "select input")
        Mw = vec_hyper_operand(M, "mask") if M is not None else None
        T = hyper_select("USER", Aw,
                         user_fn=lambda i, j, x: op(i, j, x, thunk))
        return SparseVec(hyper_accum_mask(
            C.hm, Mw, T, accum, replace=d.replace,
            complement=d.mask_scmp, structural=d.mask_structure))
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(C, HyperCscMatrix):
        from ..sparse.hyper import hyper_accum_mask, hyper_select
        Aw = to_hyper_operand(A, not d.tran0, "select input")
        Mw = to_hyper_operand(M, True, "mask") if M is not None else None
        if Aw.shape != C.tr.shape:
            raise DimensionMismatch(
                f"select {Aw.shape[::-1]} vs C {C.shape}")
        # transposed frame: the predicate sees the ORIGINAL (i, j)
        T = hyper_select("USER", Aw,
                         user_fn=lambda i, j, x: op(j, i, x, thunk))
        return HyperCscMatrix(hyper_accum_mask(
            C.tr.wait(), Mw, T, accum, replace=d.replace,
            complement=d.mask_scmp, structural=d.mask_structure))
    if isinstance(C, HyperMatrix):
        from ..sparse.hyper import hyper_accum_mask, hyper_select
        Aw = to_hyper_operand(A, d.tran0, "select input")
        Mw = to_hyper_operand(M, False, "mask") if M is not None else None
        if Aw.shape != C.shape:
            raise DimensionMismatch(f"select {Aw.shape} vs C {C.shape}")
        T = hyper_select("USER", Aw,
                         user_fn=lambda i, j, x: op(i, j, x, thunk))
        return hyper_accum_mask(C, Mw, T, accum, replace=d.replace,
                                complement=d.mask_scmp,
                                structural=d.mask_structure)
    if isinstance(C, (CsrMatrix, CscMatrix)):
        from ..sparse.ewise import csr_select
        from ..sparse.mask import csr_accum_mask
        csc = isinstance(C, CscMatrix)
        Cw = C.tr if csc else C
        Aw = to_csr_operand(A, csc ^ d.tran0, "select input")
        Mw = to_csr_operand(M, csc, "mask") if M is not None else None
        if Aw.shape != Cw.shape:
            raise DimensionMismatch(f"select {Aw.shape} vs C {C.shape}")
        # in the by-col (transposed) frame the predicate sees swapped
        # coordinates: select_C'(i,j) = select_C(j,i)
        opw = SelectOp(op.name, lambda i, j, x, k: op(j, i, x, k)) \
            if csc else op
        out = csr_accum_mask(Cw, Mw, csr_select(opw, Aw, thunk), accum, d)
        return CscMatrix(out) if csc else out
    A = to_bitmap_operand(A, "select input")
    M = to_bitmap_operand(M, "mask") if M is not None else None
    A = _transposed(A.wait(), d.tran0 and isinstance(A, Matrix))
    i, j = _index_grids(A.pattern.shape)
    keep = op(i, j, A.values, thunk)
    T = A.__class__(A.values, A.pattern & keep, A.type).canonical()
    return accum_mask(C, M, T, accum, d)
