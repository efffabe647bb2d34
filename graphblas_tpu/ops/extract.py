"""Submatrix extraction: C<M> = accum(C, A(I,J)).

Reference: ``Source/GB_extract.c`` driving ``Template/GB_subref_template.c``
(symbolic/numeric subref with binary search, I-inverse buckets, zombie
awareness).  On the bitmap backend extraction is a single XLA gather.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.descriptor import Descriptor, desc_of
from ..core.mask import accum_mask
from ..core.matrix import Matrix, Vector
from ..core.ops import BinaryOp
from ..utils.indices import normalize_indices
from ..utils import counters

__all__ = ["extract", "extract_vector", "extract_col"]

_tmap = jax.tree_util.tree_map


@counters.counted("extract")
def extract(C: Matrix, M: Optional[Matrix], accum: Optional[BinaryOp],
            A: Matrix, I: Any = None, J: Any = None,
            desc: Optional[Descriptor] = None) -> Matrix:
    """C<M> = accum(C, A(I,J)) (reference ``GrB_Matrix_extract``).

    A CsrMatrix ``C`` routes to the O(nnz) sparse form; a CsrMatrix
    ``A`` with a bitmap ``C`` extracts sparsely then lands the
    (region-sized) result on the bitmap — A itself is never densified.
    """
    from .containers import require_container
    require_container(C, "extract output C")
    require_container(M, "extract mask", none_ok=True)
    require_container(A, "extract input A")
    from ..sparse.container import CsrMatrix, CscMatrix
    from ..sparse.hyper import HyperMatrix
    from .containers import to_csr_operand
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(C, HyperCscMatrix):
        from ..sparse.hyper_assign import hyper_extract
        from .containers import to_hyper_operand
        import dataclasses as _dc
        d0 = desc_of(desc)
        Aw = to_hyper_operand(A, not d0.tran0, "extract input")
        Mw = to_hyper_operand(M, True, "mask") if M is not None else None
        return HyperCscMatrix(hyper_extract(
            C.tr, Mw, accum, Aw, J, I, _dc.replace(d0, tran0=False)))
    if isinstance(C, HyperMatrix):
        from ..sparse.hyper_assign import hyper_extract
        return hyper_extract(C, M, accum, A, I, J, desc)
    if isinstance(C, CscMatrix):
        from ..sparse.assign import csr_extract
        d = desc_of(desc)
        Aw = to_csr_operand(A, not d.tran0, "extract input")
        Mw = to_csr_operand(M, True, "mask") if M is not None else None
        import dataclasses as _dc
        return CscMatrix(csr_extract(C.tr, Mw, accum, Aw, J, I,
                                     _dc.replace(d, tran0=False)))
    if isinstance(C, CsrMatrix):
        from ..sparse.assign import csr_extract
        return csr_extract(C, M, accum, A, I, J, desc)
    if isinstance(A, (CsrMatrix, CscMatrix, HyperMatrix)):
        from ..sparse.assign import csr_subref
        d = desc_of(desc)
        At = to_csr_operand(A, d.tran0, "extract input")
        T = csr_subref(At, I, J).to_matrix()
        return accum_mask(C, M, T, accum, d)
    d = desc_of(desc)
    A = A.wait()
    vals, pat = A.values, A.pattern
    if d.tran0:
        vals = _tmap(lambda a: a.T, vals)
        pat = pat.T
    nr, nc = pat.shape
    Ii = normalize_indices(I, nr)
    Jj = normalize_indices(J, nc)
    ix = np.ix_(Ii, Jj)
    T = Matrix(_tmap(lambda a: a[ix], vals), pat[ix], A.type)
    return accum_mask(C, M, T, accum, d)


@counters.counted("extract_vector")
def extract_vector(w: Vector, m: Optional[Vector],
                   accum: Optional[BinaryOp], u: Vector, I: Any = None,
                   desc: Optional[Descriptor] = None) -> Vector:
    """w<m> = accum(w, u(I)) (``GrB_Vector_extract``)."""
    from ..sparse.vector import SparseVec
    if isinstance(w, SparseVec):
        from ..sparse.hyper_assign import hyper_extract
        from .containers import vec_hyper_operand
        uh = vec_hyper_operand(u, "extract input")
        mh = vec_hyper_operand(m, "mask") if m is not None else None
        return SparseVec(hyper_extract(w.hm, mh, accum, uh, I, [0],
                                       desc))
    d = desc_of(desc)
    u = u.wait()
    Ii = normalize_indices(I, u.shape[0])
    T = Vector(_tmap(lambda a: a[Ii], u.values), u.pattern[Ii], u.type)
    return accum_mask(w, m, T, accum, d)


def extract_col(w: Vector, m: Optional[Vector], accum: Optional[BinaryOp],
                A: Matrix, I: Any = None, j: int = 0,
                desc: Optional[Descriptor] = None) -> Vector:
    """w<m> = accum(w, A(I,j)); TRAN0 extracts the row A(j,I)'
    (``GrB_Col_extract``)."""
    d = desc_of(desc)
    A = A.wait()
    vals, pat = A.values, A.pattern
    if d.tran0:
        vals = _tmap(lambda a: a.T, vals)
        pat = pat.T
    Ii = normalize_indices(I, pat.shape[0])
    T = Vector(_tmap(lambda a: a[Ii, j], vals), pat[Ii, j], A.type)
    return accum_mask(w, m, T, accum, d)
