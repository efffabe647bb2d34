"""Transpose and Kronecker product.

Reference: ``Source/GB_transpose.c`` (bucket transpose, optionally fused
with a unary op + typecast) and ``GB_kron.c`` / ``GB_kron_kernel.c``.
On the bitmap backend transpose is a free layout permutation that XLA
folds into consumers; kron is a reshape-broadcast.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.descriptor import Descriptor, desc_of
from ..core.mask import accum_mask
from ..core.matrix import Matrix
from ..core.ops import BinaryOp, UnaryOp
from ..core.types import cast
from ..utils import counters

__all__ = ["transpose", "kron"]

_tmap = jax.tree_util.tree_map


@counters.counted("transpose")
def transpose(C: Matrix, M: Optional[Matrix], accum: Optional[BinaryOp],
              A: Matrix, desc: Optional[Descriptor] = None,
              op: Optional[UnaryOp] = None) -> Matrix:
    """C<M> = accum(C, A').  With INP0=TRAN this is C<M> = accum(C, A)
    (the double-transpose shortcut, ``GrB_transpose.c``)."""
    d = desc_of(desc)
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


@counters.counted("kron")
def kron(C: Matrix, M: Optional[Matrix], accum: Optional[BinaryOp],
         op: BinaryOp, A: Matrix, B: Matrix,
         desc: Optional[Descriptor] = None) -> Matrix:
    """C<M> = accum(C, kron(A,B)) with multiply op (``GxB_kron``)."""
    d = desc_of(desc)
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
