"""Import / export: zero-copy handoff of raw sparse arrays.

Reference: ``GxB_Matrix_import_CSR/CSC/HyperCSR/HyperCSC`` and the
matching exports — O(1) move semantics transplanting user arrays
(``GxB_Matrix_import_CSR.c:50-80``).  Here the containers already *are*
plain arrays, so import/export is a constructor/deconstructor pair: CSR
arrays map onto :class:`graphblas_tpu.sparse.CsrMatrix` without copying
(device placement happens lazily), and the bitmap Matrix converts in
O(nnz).  Hypersparse import degenerates to CSR with an empty-row-free
indptr — hypersparsity is free in this design (SURVEY §2.2 note).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .matrix import Matrix, Vector, np_bool
from .types import Type, FP64

__all__ = ["import_csr", "import_csc", "import_hyper_csr", "export_csr",
           "export_hyper_csr",
           "export_csc", "import_vector", "export_vector"]


def import_csr(nrows: int, ncols: int, indptr, indices, values,
               type: Optional[Type] = None, jumbled: bool = False):
    """CSR arrays -> CsrMatrix, zero-copy (``GxB_Matrix_import_CSR``)."""
    from ..sparse.container import CsrMatrix, csr_from_coo
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices)
    values = np.asarray(values)
    t = type or FP64
    nvals = int(indptr[-1])
    rowids = np.repeat(np.arange(nrows, dtype=np.int64),
                       np.diff(indptr))
    if jumbled:
        return csr_from_coo(rowids, indices[:nvals], values[:nvals],
                            nrows, ncols, type=t, sum_duplicates=False)
    cap = max(((nvals + 127) // 128) * 128, 128)
    ind = np.full(cap, ncols, np.int32)
    rid = np.full(cap, nrows, np.int32)
    val = np.zeros(cap, t.dtype)
    ind[:nvals] = indices[:nvals]
    rid[:nvals] = rowids
    val[:nvals] = values[:nvals]
    return CsrMatrix(jnp.asarray(indptr.astype(np.int32)),
                     jnp.asarray(ind), jnp.asarray(rid), jnp.asarray(val),
                     nvals, nrows, ncols, t)


def import_csc(nrows: int, ncols: int, indptr, indices, values,
               type: Optional[Type] = None):
    """CSC arrays -> CscMatrix, zero-copy (``GxB_Matrix_import_CSC``):
    the arrays land unchanged as the by-col container's storage, the
    same O(1) move semantics the reference gives its CSC format."""
    from ..sparse.container import CscMatrix
    return CscMatrix(import_csr(ncols, nrows, indptr, indices, values,
                                type))


def import_hyper_csr(nrows: int, ncols: int, nvec: int, h, p, indices,
                     values, type: Optional[Type] = None):
    """Hypersparse CSR (h = present rows, p = their pointer list) ->
    CsrMatrix, or a true HyperMatrix when the dimension is too large
    for an O(nrows) indptr (``GxB_Matrix_import_HyperCSR``; the
    reference's hyper format carries dimension up to 2^60,
    ``GB.h:314-323``)."""
    h = np.asarray(h, np.int64)[:nvec]
    p = np.asarray(p, np.int64)[:nvec + 1]
    counts = np.diff(p)
    if nrows > (1 << 28) or ncols > (1 << 31):
        from ..sparse.hyper import hyper_from_coo
        I = np.repeat(h, counts)
        nnz = int(p[-1]) if len(p) else 0
        return hyper_from_coo(I, np.asarray(indices, np.int64)[:nnz],
                              np.asarray(values)[:nnz], nrows, ncols,
                              type=type, dup=None)
    indptr = np.zeros(nrows + 1, np.int64)
    indptr[h + 1] = counts
    indptr = np.cumsum(indptr)
    out = import_csr(nrows, ncols, indptr, indices, values, type)
    from ..sparse.container import CsrMatrix
    if isinstance(out, CsrMatrix):
        # conform to the hyper_ratio rule (GB_to_hyper_conform): a
        # mostly-empty row space imported as hyper should stay hyper
        from ..sparse.hyper import hyper_conform
        out = hyper_conform(out)
    return out


def export_csr(A) -> Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]:
    """Matrix/CsrMatrix -> (nrows, ncols, indptr, indices, values);
    O(1) for CsrMatrix (array views), O(nnz) from the bitmap
    (``GxB_Matrix_export_CSR``)."""
    from ..sparse.container import CsrMatrix
    if isinstance(A, CsrMatrix):
        return (A.nrows, A.ncols, np.asarray(A.indptr, np.int64),
                np.asarray(A.indices[:A.nvals], np.int64),
                np.asarray(A.values[:A.nvals]))
    I, J, X = A.extractTuples()
    indptr = np.zeros(A.nrows + 1, np.int64)
    np.add.at(indptr, I + 1, 1)
    indptr = np.cumsum(indptr)
    return A.nrows, A.ncols, indptr, J, X


def import_hyper_csc(nrows: int, ncols: int, nvec: int, h, p, indices,
                     values, type: Optional[Type] = None):
    """Hypersparse CSC (h = present COLUMNS, p = their pointer list,
    indices = row ids per column) -> HyperCscMatrix
    (``GxB_Matrix_import_HyperCSC``).  O(1) in spirit: the arrays are
    adopted as the wrapped transpose's by-row hyper form."""
    from ..sparse.hyper_csc import HyperCscMatrix
    return HyperCscMatrix(import_hyper_csr(ncols, nrows, nvec, h, p,
                                           indices, values, type=type))


def export_hyper_csr(A):
    """Matrix/CsrMatrix -> (nrows, ncols, nvec, h, p, indices, values)
    in hypersparse-CSR form: ``h`` lists the nonempty rows, ``p`` their
    compacted pointer list (``GxB_Matrix_export_HyperCSR``) — the O(nvec)
    dual of :func:`import_hyper_csr`."""
    from ..sparse.hyper import HyperMatrix
    if isinstance(A, HyperMatrix):
        # O(1): the container already stores h/hptr
        return (A.nrows, A.ncols, A.nvec,
                np.asarray(A.h[:A.nvec], np.int64),
                np.asarray(A.hptr[:A.nvec + 1], np.int64),
                np.asarray(A.indices[:A.nvals], np.int64),
                np.asarray(A.values[:A.nvals]))
    nrows, ncols, indptr, indices, values = export_csr(A)
    counts = np.diff(indptr)
    h = np.nonzero(counts)[0].astype(np.int64)
    p = np.concatenate([[0], np.cumsum(counts[h])]).astype(np.int64)
    return nrows, ncols, len(h), h, p, indices, values


def export_csc(A):
    """(nrows, ncols, col indptr, row indices, values) in CSC order.
    A CscMatrix exports its stored arrays directly (O(1) move
    semantics); CsrMatrix exports via its tuple list (O(nnz log nnz)
    re-sort), never through a dense intermediate."""
    from ..sparse.container import CscMatrix
    if isinstance(A, CscMatrix):
        tr = A.tr
        nv = tr.nvals
        return (A.nrows, A.ncols, np.asarray(tr.indptr, np.int64),
                np.asarray(tr.indices)[:nv].astype(np.int64),
                np.asarray(tr.values)[:nv])
    I, J, X = A.extractTuples()
    order = np.lexsort((I, J))
    I, J, X = I[order], J[order], X[order]
    indptr = np.zeros(A.ncols + 1, np.int64)
    np.add.at(indptr, J + 1, 1)
    indptr = np.cumsum(indptr)
    return A.nrows, A.ncols, indptr, I, X


def import_vector(n: int, indices, values, type: Optional[Type] = None
                  ) -> Vector:
    """Sparse vector import (``GxB_Vector_import``)."""
    t = type or FP64
    return Vector.from_coo(np.asarray(indices, np.int64),
                           np.asarray(values), n, type=t)


def export_vector(v: Vector):
    I, X = v.extractTuples()
    return v.size, I, X


def export_hyper_csc(A):
    """Container -> (nrows, ncols, nvec, h, p, indices, values) in
    hypersparse-CSC form (``GxB_Matrix_export_HyperCSC``): ``h`` lists
    the nonempty columns, ``indices`` the row ids per column.  Zero-copy
    for a HyperCscMatrix (the wrapped transpose IS the CSC form)."""
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(A, HyperCscMatrix):
        ncols, nrows, nvec, h, p, idx, vals = export_hyper_csr(A.tr)
        return nrows, ncols, nvec, h, p, idx, vals
    from ..ops.containers import to_hyper_operand
    from ..sparse.hyper import hyper_transpose
    At = hyper_transpose(to_hyper_operand(A, False, "export"))
    ncols, nrows, nvec, h, p, idx, vals = export_hyper_csr(At)
    return nrows, ncols, nvec, h, p, idx, vals
