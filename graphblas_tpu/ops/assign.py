"""assign / subassign: the reference's largest correctness surface.

Reference: ``Source/GB_assign.c`` (1,094 LoC; GrB_assign semantics — the
mask covers ALL of C) and ``Source/GB_subassign_kernel.c`` (3,394 LoC;
GxB_subassign — the mask covers only C(I,J), 48 case combinations of
index kinds x mask x accum x scalar x C_replace).  The executable specs
are ``Test/GB_spec_assign.m`` and ``Test/GB_spec_subassign.m``, which this
module transcribes; on the bitmap backend every case collapses into
gather -> accum/mask epilogue -> scatter, so the 48-way case explosion
(and the zombie/pending machinery it manages) disappears.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.descriptor import Descriptor, desc_of
from ..core.errors import DimensionMismatch
from ..core.mask import accum_mask, accum_values, apply_mask
from ..core.matrix import Matrix, Vector
from ..core.ops import BinaryOp
from ..core.types import Type, cast_value
from ..utils.indices import normalize_indices
from ..utils import counters

__all__ = ["assign", "subassign", "assign_scalar", "subassign_scalar",
           "row_assign", "col_assign", "assign_vector", "subassign_vector"]

_tmap = jax.tree_util.tree_map


def _scalar_matrix(scalar, ni: int, nj: int, t: Type) -> Matrix:
    """Scalar expansion: an implicit ni x nj all-present matrix."""
    v = cast_value(scalar, t)
    if t.is_udt:
        vals = {k: jnp.full((ni, nj), v[k]) for k, _ in t.fields}
    else:
        vals = jnp.full((ni, nj), v, dtype=t.dtype)
    return Matrix(vals, jnp.ones((ni, nj), np.bool_), t)


def _gather(X, Ii, Jj):
    ix = np.ix_(Ii, Jj)
    return Matrix(_tmap(lambda a: a[ix], X.values), X.pattern[ix], X.type)


def _scatter(C, Ii, Jj, sub):
    ix = np.ix_(Ii, Jj)
    vals = _tmap(lambda c, s: c.at[ix].set(s), C.values, sub.values)
    pat = C.pattern.at[ix].set(sub.pattern)
    return C._replace(values=vals, pattern=pat, pending=[]).canonical()


def _as_matrix(x, col: bool = True):
    """Lift a Vector to an n x 1 (or 1 x n) Matrix view (pending deltas
    are folded first — the array view cannot carry them)."""
    if x is None or isinstance(x, Matrix):
        return x
    x = x.wait()
    ax = (slice(None), None) if col else (None, slice(None))
    return Matrix(_tmap(lambda a: a[ax], x.values), x.pattern[ax], x.type)


def _to_vector(m: Matrix, col: bool = True):
    ax = (slice(None), 0) if col else (0, slice(None))
    return Vector(_tmap(lambda a: a[ax], m.values), m.pattern[ax], m.type)


@counters.counted("assign")
def assign(C: Matrix, M: Optional[Matrix], accum: Optional[BinaryOp],
           A: Union[Matrix, Any], I: Any = None, J: Any = None,
           desc: Optional[Descriptor] = None, *,
           scalar: bool = False) -> Matrix:
    """C<M>(I,J) = accum(C(I,J), A) — GrB_assign; M is C-sized.

    Transcribes ``Test/GB_spec_assign.m`` exactly: Z = C; Z(I,J) =
    accum(C(I,J), A); then C<M> = Z with C_replace over all of C.

    A CsrMatrix ``C`` routes to the O(nnz) sparse form
    (:func:`graphblas_tpu.sparse.assign.csr_assign`); a HyperMatrix to
    the pair-key form (dimension up to 2^60); a CscMatrix runs the CSR
    form in the transposed frame (I/J swapped).
    """
    from .containers import require_container
    require_container(C, "assign output C")
    require_container(M, "assign mask", none_ok=True)
    if not scalar:
        require_container(A, "assign input A")
    from ..core.resolve import resolve_accum
    accum = resolve_accum(accum, "assign accum", None, C, A)
    from ..sparse.container import CsrMatrix, CscMatrix
    from ..sparse.hyper import HyperMatrix
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(C, HyperCscMatrix):
        from ..sparse.hyper_assign import hyper_assign
        from .containers import to_hyper_operand
        import dataclasses as _dc
        d0 = desc_of(desc)
        Aw = A if scalar else to_hyper_operand(A, not d0.tran0,
                                               "assign input")
        Mw = to_hyper_operand(M, True, "mask") if M is not None else None
        return HyperCscMatrix(hyper_assign(
            C.tr, Mw, accum, Aw, J, I,
            _dc.replace(d0, tran0=False), scalar=scalar))
    if isinstance(C, HyperMatrix):
        from ..sparse.hyper_assign import hyper_assign
        return hyper_assign(C, M, accum, A, I, J, desc, scalar=scalar)
    if isinstance(C, CscMatrix):
        from ..sparse.assign import csr_assign
        from .containers import to_csr_operand
        d0 = desc_of(desc)
        Aw = A if scalar else to_csr_operand(A, not d0.tran0,
                                             "assign input")
        Mw = to_csr_operand(M, True, "mask") if M is not None else None
        import dataclasses as _dc
        return CscMatrix(csr_assign(
            C.tr, Mw, accum, Aw, J, I,
            _dc.replace(d0, tran0=False), scalar=scalar))
    if isinstance(C, CsrMatrix):
        from ..sparse.assign import csr_assign
        return csr_assign(C, M, accum, A, I, J, desc, scalar=scalar)
    d = desc_of(desc)
    C = C.wait()
    if M is not None:
        M = M.wait()
    Ii = normalize_indices(I, C.nrows, unique=scalar)
    Jj = normalize_indices(J, C.ncols, unique=scalar)
    if scalar:
        A = _scalar_matrix(A, len(Ii), len(Jj), C.type)
    else:
        A = A.wait()
        if d.tran0:
            A = A._replace(values=_tmap(lambda a: a.T, A.values),
                           pattern=A.pattern.T)
        if A.shape != (len(Ii), len(Jj)):
            raise DimensionMismatch(
                f"A is {A.shape}, I x J is {(len(Ii), len(Jj))}")
    S = _gather(C, Ii, Jj)
    zij_vals, zij_pat = accum_values(S, A, accum)
    Z = _scatter(C, Ii, Jj, Matrix(zij_vals, zij_pat, C.type))
    return apply_mask(C, M, Z.values, Z.pattern, d)


@counters.counted("subassign")
def subassign(C: Matrix, M: Optional[Matrix], accum: Optional[BinaryOp],
              A: Union[Matrix, Any], I: Any = None, J: Any = None,
              desc: Optional[Descriptor] = None, *,
              scalar: bool = False) -> Matrix:
    """C(I,J)<M> = accum(C(I,J), A) — GxB_subassign; M is |I| x |J|;
    entries outside C(I,J) are never modified (``GB_spec_subassign.m``).

    A sparse-container ``C`` routes to the O(nnz) sparse forms."""
    from .containers import require_container
    require_container(C, "subassign output C")
    require_container(M, "subassign mask", none_ok=True)
    if not scalar:
        require_container(A, "subassign input A")
    from ..core.resolve import resolve_accum
    accum = resolve_accum(accum, "subassign accum", None, C, A)
    from ..sparse.container import CsrMatrix, CscMatrix
    from ..sparse.hyper import HyperMatrix
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(C, HyperCscMatrix):
        from ..sparse.hyper_assign import hyper_subassign
        from .containers import to_hyper_operand
        import dataclasses as _dc
        d0 = desc_of(desc)
        Aw = A if scalar else to_hyper_operand(A, not d0.tran0,
                                               "subassign input")
        Mw = to_hyper_operand(M, True, "mask") if M is not None else None
        return HyperCscMatrix(hyper_subassign(
            C.tr, Mw, accum, Aw, J, I,
            _dc.replace(d0, tran0=False), scalar=scalar))
    if isinstance(C, HyperMatrix):
        from ..sparse.hyper_assign import hyper_subassign
        return hyper_subassign(C, M, accum, A, I, J, desc,
                               scalar=scalar)
    if isinstance(C, CscMatrix):
        from ..sparse.assign import csr_subassign
        from .containers import to_csr_operand
        d0 = desc_of(desc)
        Aw = A if scalar else to_csr_operand(A, not d0.tran0,
                                             "subassign input")
        Mw = to_csr_operand(M, True, "mask") if M is not None else None
        import dataclasses as _dc
        return CscMatrix(csr_subassign(
            C.tr, Mw, accum, Aw, J, I,
            _dc.replace(d0, tran0=False), scalar=scalar))
    if isinstance(C, CsrMatrix):
        from ..sparse.assign import csr_subassign
        return csr_subassign(C, M, accum, A, I, J, desc, scalar=scalar)
    d = desc_of(desc)
    C = C.wait()
    Ii = normalize_indices(I, C.nrows)
    Jj = normalize_indices(J, C.ncols)
    if scalar:
        A = _scalar_matrix(A, len(Ii), len(Jj), C.type)
    else:
        A = A.wait()
        if d.tran0:
            A = A._replace(values=_tmap(lambda a: a.T, A.values),
                           pattern=A.pattern.T)
        if A.shape != (len(Ii), len(Jj)):
            raise DimensionMismatch(
                f"A is {A.shape}, I x J is {(len(Ii), len(Jj))}")
    if M is not None:
        M = _as_matrix(M.wait())
        if M.shape != (len(Ii), len(Jj)):
            # vector subassign lifts the mask to a column; handle row case
            if M.shape == (len(Jj), len(Ii)):
                M = M._replace(values=_tmap(lambda a: a.T, M.values),
                               pattern=M.pattern.T)
            else:
                raise DimensionMismatch(
                    f"mask is {M.shape}, I x J is {(len(Ii), len(Jj))}")
    S = _gather(C, Ii, Jj)
    Snew = accum_mask(S, M, A, accum, d)
    return _scatter(C, Ii, Jj, Snew)


# -- scalar / vector / row / col convenience wrappers (GrB_*_assign family) --

def assign_scalar(C, M, accum, x, I=None, J=None, desc=None):
    """GrB_Matrix_assign_TYPE: C<M>(I,J) = accum(C(I,J), scalar)."""
    return assign(C, M, accum, x, I, J, desc, scalar=True)


def subassign_scalar(C, M, accum, x, I=None, J=None, desc=None):
    return subassign(C, M, accum, x, I, J, desc, scalar=True)


def assign_vector(w: Vector, m: Optional[Vector], accum, u, I=None,
                  desc=None, *, scalar: bool = False) -> Vector:
    """GrB_Vector_assign: w<m>(I) = accum(w(I), u)."""
    from ..sparse.vector import SparseVec
    if isinstance(w, SparseVec):
        from ..sparse.hyper_assign import hyper_assign
        from .containers import vec_hyper_operand
        uh = u if scalar else vec_hyper_operand(u, "assign input")
        mh = vec_hyper_operand(m, "mask") if m is not None else None
        return SparseVec(hyper_assign(w.hm, mh, accum, uh, I, [0],
                                      desc, scalar=scalar))
    Cm = _as_matrix(w)
    Mm = _as_matrix(m)
    Am = u if scalar else _as_matrix(u)
    out = assign(Cm, Mm, accum, Am, I, [0], desc, scalar=scalar)
    return _to_vector(out)


def subassign_vector(w: Vector, m: Optional[Vector], accum, u, I=None,
                     desc=None, *, scalar: bool = False) -> Vector:
    from ..sparse.vector import SparseVec
    if isinstance(w, SparseVec):
        from ..sparse.hyper_assign import hyper_subassign
        from .containers import vec_hyper_operand
        uh = u if scalar else vec_hyper_operand(u, "subassign input")
        mh = vec_hyper_operand(m, "mask") if m is not None else None
        return SparseVec(hyper_subassign(w.hm, mh, accum, uh, I, [0],
                                         desc, scalar=scalar))
    Cm = _as_matrix(w)
    Mm = _as_matrix(m)
    Am = u if scalar else _as_matrix(u)
    out = subassign(Cm, Mm, accum, Am, I, [0], desc, scalar=scalar)
    return _to_vector(out)


def row_assign(C: Matrix, m: Optional[Vector], accum, u: Vector,
               i: int, J=None, desc=None) -> Matrix:
    """GrB_Row_assign: C<m'>(i,J) = accum(C(i,J), u'); the mask is a
    column vector of size ncols(C) and only row i is affected
    (``Test/GB_spec_Row_assign.m``)."""
    C = C.wait()
    X = Vector(_tmap(lambda a: a[i, :], C.values), C.pattern[i, :], C.type)
    X = assign_vector(X, m, accum, u, J, desc)
    vals = _tmap(lambda c, x: c.at[i, :].set(x), C.values, X.values)
    pat = C.pattern.at[i, :].set(X.pattern)
    return C._replace(values=vals, pattern=pat, pending=[]).canonical()


def col_assign(C: Matrix, m: Optional[Vector], accum, u: Vector,
               I=None, j: int = 0, desc=None) -> Matrix:
    """GrB_Col_assign: C<m>(I,j) = accum(C(I,j), u)."""
    C = C.wait()
    X = Vector(_tmap(lambda a: a[:, j], C.values), C.pattern[:, j], C.type)
    X = assign_vector(X, m, accum, u, I, desc)
    vals = _tmap(lambda c, x: c.at[:, j].set(x), C.values, X.values)
    pat = C.pattern.at[:, j].set(X.pattern)
    return C._replace(values=vals, pattern=pat, pending=[]).canonical()
