"""Elementwise operations: eWiseAdd (set union), eWiseMult (intersection),
apply, and select.

Reference: ``Source/GB_add.c`` (4-case per-vector union merge),
``GB_emult.c`` (intersection merge), ``GB_eWise.c`` (orchestrator),
``GB_apply.c``, ``GB_select.c``.  On the bitmap backend the merges are
single vectorized selects; the whole op (including the accum/mask
epilogue) fuses into one XLA kernel.
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


@counters.counted("eWiseAdd")
def eWiseAdd(C, M, accum: Optional[BinaryOp], op: BinaryOp,
             A, B, desc: Optional[Descriptor] = None):
    """C<M> = accum(C, A+B): set-union merge (reference ``GrB_eWiseAdd``)."""
    d = desc_of(desc)
    op = getattr(op, "mult", op)  # semiring/monoid accepted per spec
    op = getattr(op, "op", op)
    A = _transposed(A.wait(), d.tran0 and isinstance(A, Matrix))
    B = _transposed(B.wait(), d.tran1 and isinstance(B, Matrix))
    T = _ewise_T(op, A, B, union=True)
    return accum_mask(C, M, T, accum, d)


@counters.counted("eWiseMult")
def eWiseMult(C, M, accum: Optional[BinaryOp], op: BinaryOp,
              A, B, desc: Optional[Descriptor] = None):
    """C<M> = accum(C, A.*B): intersection merge (``GrB_eWiseMult``)."""
    d = desc_of(desc)
    op = getattr(op, "mult", op)
    op = getattr(op, "op", op)
    A = _transposed(A.wait(), d.tran0 and isinstance(A, Matrix))
    B = _transposed(B.wait(), d.tran1 and isinstance(B, Matrix))
    T = _ewise_T(op, A, B, union=False)
    return accum_mask(C, M, T, accum, d)


@counters.counted("apply")
def apply(C, M, accum: Optional[BinaryOp], op: UnaryOp, A,
          desc: Optional[Descriptor] = None):
    """C<M> = accum(C, op(A)) (reference ``GrB_apply`` / ``GB_apply_op``).

    The reference's shallow-copy trick (``GB_shallow_op.c``) is free here:
    the pattern array is reused by reference, only values are mapped.
    """
    d = desc_of(desc)
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
    d = desc_of(desc)
    A = _transposed(A.wait(), d.tran0 and isinstance(A, Matrix))
    i, j = _index_grids(A.pattern.shape)
    keep = op(i, j, A.values, thunk)
    T = A.__class__(A.values, A.pattern & keep, A.type).canonical()
    return accum_mask(C, M, T, accum, d)
