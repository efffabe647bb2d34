"""Object printing and validity checking.

Reference: the ``GB_check`` family — one checker/printer per object type
at 4 verbosity levels (``GB.h:768-806``: silent/terse/summary/complete),
exposed as ``GxB_*_fprint``; plus ``Test/spok`` validating sparse-matrix
invariants.  Output format follows ``GB_matvec_check.c``'s shape
("nrows: .. ncols: ..", per-row entry listing) closely enough that eyes
used to the reference can diff it.
"""

from __future__ import annotations

import io
import sys
from typing import Any, Optional

import numpy as np

from .descriptor import Descriptor
from .matrix import Matrix, Vector
from .monoids import Monoid
from .ops import BinaryOp, SelectOp, UnaryOp
from .semirings import Semiring
from .types import Type

__all__ = ["fprint", "check", "SILENT", "SUMMARY", "SHORT", "COMPLETE"]

SILENT = 0    # GxB_SILENT
SUMMARY = 1   # GxB_SUMMARY
SHORT = 2     # GxB_SHORT
COMPLETE = 3  # GxB_COMPLETE


def check(obj: Any) -> bool:
    """Validate object invariants (GB_check / spok analogue).

    Raises ValueError on a violated invariant; returns True otherwise.
    """
    if isinstance(obj, (Matrix, Vector)):
        m = obj.wait()
        pat = np.asarray(m.pattern_np())
        vals = m.to_dense()
        leaves = vals.values() if isinstance(vals, dict) else [vals]
        for leaf in leaves:
            if leaf.shape != pat.shape:
                raise ValueError("values/pattern shape mismatch")
            absent = leaf[~pat]
            if absent.size and not np.all(
                    (absent == 0) | (absent == False)):  # noqa: E712
                raise ValueError("nonzero value at absent position "
                                 "(canonical invariant violated)")
        return True
    if isinstance(obj, Semiring):
        if not obj.add.type.is_udt and \
                obj.add.type.name != obj.mult.ztype.name:
            raise ValueError("semiring monoid/mult domain mismatch")
        return True
    if isinstance(obj, (Type, UnaryOp, BinaryOp, Monoid, SelectOp,
                        Descriptor)):
        return True
    from ..sparse.hyper import HyperMatrix
    from ..sparse.hyper_csc import HyperCscMatrix
    if isinstance(obj, HyperCscMatrix):
        return _check_hyper(obj.tr)   # stored transpose carries invariants
    if isinstance(obj, HyperMatrix):
        return _check_hyper(obj)
    csr = _as_plain_csr(obj)
    if csr is not None:
        # spok-style CSR invariants (Test/spok): monotone pointers,
        # in-range sorted indices, padding sentinels intact
        ip = np.asarray(csr.indptr)
        if ip[0] != 0 or ip[-1] != csr.nvals:
            raise ValueError("indptr endpoints violated")
        if np.any(np.diff(ip) < 0):
            raise ValueError("indptr not monotone")
        I = np.asarray(csr.rowids)
        J = np.asarray(csr.indices)
        nv = csr.nvals
        if nv and (J[:nv].min() < 0 or J[:nv].max() >= csr.ncols):
            raise ValueError("column index out of range")
        lin = I[:nv].astype(np.int64) * csr.ncols + J[:nv]
        if np.any(np.diff(lin) <= 0):
            raise ValueError("entries not strictly sorted by (i,j)")
        if np.any(J[nv:] != csr.ncols) or np.any(I[nv:] != csr.nrows):
            raise ValueError("padding sentinels corrupted")
        return True
    raise TypeError(f"not a GraphBLAS object: {type(obj)}")


def _as_plain_csr(obj):
    # CsrMatrix view of a sparse container (None if not one)
    from ..sparse.container import CsrMatrix, CscMatrix
    if isinstance(obj, CsrMatrix):
        return obj
    if isinstance(obj, CscMatrix):
        return obj.tr
    return None


def _check_hyper(H) -> bool:
    # hyper invariants: row list strictly sorted + in range, hptr
    # monotone with matching endpoints (GB_matrix.h hyper rules)
    h = np.asarray(H.h)[:H.nvec]
    if h.size and (np.any(np.diff(h) <= 0) or h[0] < 0
                   or h[-1] >= H.nrows):
        raise ValueError("hyper row list not strictly sorted in range")
    hp = np.asarray(H.hptr)
    if hp[0] != 0 or hp[H.nvec] != H.nvals or np.any(np.diff(hp) < 0):
        raise ValueError("hyper pointers violated")
    return True


def fprint(obj: Any, name: str = "", level: int = SHORT,
           file=None) -> None:
    """Pretty-print any GraphBLAS object (``GxB_*_fprint``)."""
    out = file or sys.stdout
    w = out.write
    if level <= SILENT:
        check(obj)
        return

    from ..sparse.hyper import HyperMatrix
    from ..sparse.hyper_csc import HyperCscMatrix
    if _as_plain_csr(obj) is not None or isinstance(
            obj, (HyperMatrix, HyperCscMatrix)):
        is_csc = type(obj).__name__ == "CscMatrix"
        fmt = "by_col (CSC)" if is_csc else (
            "hypersparse" if type(obj).__name__ == "HyperMatrix"
            else "hypersparse by_col (CSC)"
            if isinstance(obj, HyperCscMatrix) else "by_row (CSR)")
        w(f"\nGraphBLAS matrix: {name} \nnrows: {obj.nrows} "
          f"ncols: {obj.ncols} \nGraphBLAS type:  "
          f"{obj.type.name.lower()} format: {fmt} nvals: {obj.nvals}\n")
        if level >= SHORT and not obj.type.is_udt:
            I, J, X = obj.extractTuples()
            limit = obj.nvals if level >= COMPLETE else min(obj.nvals, 30)
            for k in range(limit):
                w(f"    ({I[k]},{J[k]})   {X[k]}\n")
            if limit < obj.nvals:
                w("    ...\n")
        check(obj)
        return
    if isinstance(obj, (Matrix, Vector)):
        m = obj.wait()
        is_vec = isinstance(obj, Vector)
        kind = "vector" if is_vec else "matrix"
        pat = m.pattern_np()
        nvals = int(pat.sum())
        if is_vec:
            w(f"\nGraphBLAS {kind}: {name} \nn: {pat.shape[0]} ")
        else:
            w(f"\nGraphBLAS {kind}: {name} \nnrows: {pat.shape[0]} "
              f"ncols: {pat.shape[1]} ")
        w(f"\nGraphBLAS type:  {m.type.name.lower()} "
          f"size: {m.type.fields and 'struct' or np.dtype(m.type.dtype).itemsize}\n")
        w(f"number of entries: {nvals} \n")
        if level >= SHORT:
            vals = m.to_dense()
            limit = None if level >= COMPLETE else 30
            shown = 0
            if is_vec:
                for i in np.nonzero(pat)[0]:
                    if limit and shown >= limit:
                        w("    ...\n")
                        break
                    w(f"    index {i}: {_val(vals, (i,), m.type)}\n")
                    shown += 1
            else:
                for i in range(pat.shape[0]):
                    cols = np.nonzero(pat[i])[0]
                    if not len(cols):
                        continue
                    if limit and shown >= limit:
                        w("    ...\n")
                        break
                    w(f"row: {i} : {len(cols)} entries\n")
                    for j in cols:
                        if limit and shown >= limit:
                            break
                        w(f"    column {j}: {_val(vals, (i, j), m.type)}\n")
                        shown += 1
        check(obj)
        return

    if isinstance(obj, Type):
        sz = "struct" if obj.is_udt else np.dtype(obj.dtype).itemsize
        w(f"\nGraphBLAS type: {name} {obj.name.lower()} size: {sz}\n")
        return
    if isinstance(obj, UnaryOp):
        w(f"\nGraphBLAS UnaryOp: {name} z={obj.name.lower()}(x) "
          f"type: {obj.ztype.name} <- {obj.xtype.name}\n")
        return
    if isinstance(obj, BinaryOp):
        w(f"\nGraphBLAS BinaryOp: {name} z={obj.name.lower()}(x,y) "
          f"type: {obj.ztype.name} <- {obj.xtype.name} x {obj.ytype.name}\n")
        return
    if isinstance(obj, SelectOp):
        w(f"\nGraphBLAS SelectOp: {name} {obj.name.lower()}(A,k)\n")
        return
    if isinstance(obj, Monoid):
        w(f"\nGraphBLAS Monoid: {name} {obj.name.lower()} "
          f"identity: {obj.identity}"
          + (f" terminal: {obj.terminal}" if obj.terminal is not None
             else "") + "\n")
        return
    if isinstance(obj, Semiring):
        w(f"\nGraphBLAS Semiring: {name} {obj.name.lower()}\n")
        if level >= SHORT:
            fprint(obj.add, "add", SUMMARY, out)
            fprint(obj.mult, "multiply", SUMMARY, out)
        return
    if isinstance(obj, Descriptor):
        w(f"\nGraphBLAS Descriptor: {name} replace={obj.replace} "
          f"scmp={obj.mask_scmp} tran0={obj.tran0} tran1={obj.tran1} "
          f"axb={obj.axb_method or 'default'}\n")
        return
    raise TypeError(f"not a GraphBLAS object: {type(obj)}")


def _val(vals, idx, t: Type) -> str:
    if t.is_udt:
        return "{" + ", ".join(f"{k}: {np.asarray(v)[idx]}"
                               for k, v in vals.items()) + "}"
    v = np.asarray(vals)[idx]
    if t.is_bool:
        return f"bool {int(v)}"
    return f"{t.name.lower()} {v}"
