"""Pending tuples + element mutation on the sparse containers.

Reference: ``GB_setElement.c:10-28`` (not-present entry -> pending
tuple), ``GB_pending_add.c`` (the in-matrix unsorted delta list),
``GB_wait.c:240-350`` (prune zombies, build the delta, disjoint merge),
``GB_resize.c`` (prune outside entries).  The reference's machinery
works on every storage format; this module gives CsrMatrix and
HyperMatrix the same surface the bitmap container already has
(``core/matrix.py:197-327``):

* ``setElement`` appends ``(i, j, scalar, accum)`` to the container's
  host-side ``_pending`` list — O(1), no device work;
* ``wait`` folds the whole buffer in batches: per same-accum run,
  duplicates fold host-side in input order (``GB_builder``'s dup
  assembly), then ONE device union-merge lands the run
  (``csr_ewise_add`` / ``hyper_ewise`` with SECOND — overwrite — or the
  run's accum on intersections, exactly ``GB_wait``'s A = A + T);
* ``removeElement`` waits then prunes the lane (the functional form of
  a zombie + immediate ``GB_wait``);
* ``resize`` remaps entries through truncated identity maps on device.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errors import IndexOutOfBounds
from ..core.matrix import _fold_duplicates
from ..core.ops import BinaryOp
from ..core.types import Type, cast_value

__all__ = ["fold_pending_csr", "fold_pending_hyper", "csr_resize",
           "hyper_resize", "check_index", "append_pending"]

_tmap = jax.tree_util.tree_map


def check_index(A, i: int, j: int):
    if not (0 <= int(i) < A.nrows and 0 <= int(j) < A.ncols):
        raise IndexOutOfBounds(
            f"index ({i}, {j}) out of range for {A.nrows}x{A.ncols}")


def append_pending(A, i: int, j: int, value, accum: Optional[BinaryOp],
                   blocking: Optional[bool]):
    """Shared setElement body: shallow-copy the container with one more
    pending tuple (``GB_pending_add``), folding immediately in blocking
    mode (``GB_block.c:34-38``)."""
    check_index(A, i, j)
    if accum is not None and not isinstance(accum, BinaryOp):
        raise TypeError(f"setElement accum must be a BinaryOp, got "
                        f"{accum!r}")
    if blocking is None:
        from ..core.options import BLOCKING, global_options
        blocking = global_options().mode == BLOCKING
    out = A._shallow()
    out._pending = list(getattr(A, "_pending", ())) + [
        (int(i), int(j), value, accum)]
    return out.wait() if blocking else out


def _runs(pending) -> List[Tuple]:
    """Group consecutive same-accum tuples (order matters: a later
    overwrite must not fold across an intervening accum run)."""
    runs: List[Tuple] = []
    for (i, j, scalar, accum) in pending:
        if runs and runs[-1][0] is accum:
            runs[-1][1].append((i, j, scalar))
        else:
            runs.append((accum, [(i, j, scalar)]))
    return runs


def _fold_run_host(tuples, accum: Optional[BinaryOp], t: Type):
    """Dedup one run host-side in input order -> sorted (I, J, X)."""
    ii = np.asarray([p[0] for p in tuples], np.int64)
    jj = np.asarray([p[1] for p in tuples], np.int64)
    if t.is_udt:
        # UDT scalars are field dicts; fold per-tuple (runs are short)
        seen = {}
        for k, (i, j, s) in enumerate(tuples):
            key = (int(i), int(j))
            sv = cast_value(s, t)
            if key in seen and accum is not None:
                prev = seen[key]
                sv = _tmap(lambda a: np.asarray(jax.device_get(a)),
                           accum(_tmap(jnp.asarray, prev),
                                 _tmap(jnp.asarray, sv)))
            seen[key] = sv
        keys = sorted(seen)
        I = np.asarray([k[0] for k in keys], np.int64)
        J = np.asarray([k[1] for k in keys], np.int64)
        X = {f: np.asarray([seen[k][f] for k in keys])
             for f, _ in t.fields}
        return I, J, X
    xs = np.asarray([cast_value(p[2], t) for p in tuples],
                    dtype=np.dtype(t.dtype))
    order = np.lexsort((np.arange(len(ii)), jj, ii))  # stable in input order
    ii, jj, xs = ii[order], jj[order], xs[order]
    first = np.ones(len(ii), bool)
    first[1:] = (ii[1:] != ii[:-1]) | (jj[1:] != jj[:-1])
    starts = np.nonzero(first)[0]
    if accum is None:
        ends = np.append(starts[1:], len(xs)) - 1
        folded = xs[ends]  # last write wins
    else:
        folded = _fold_duplicates(accum, xs, starts, t)
    return ii[starts], jj[starts], folded


def _merge_op(accum: Optional[BinaryOp], t: Type) -> BinaryOp:
    """Merge operator against existing entries: overwrite (SECOND) when
    no accum — GB_setElement's found-entry semantics."""
    if accum is not None:
        return accum
    if t.is_udt:
        return BinaryOp("SECOND", lambda x, y: y, t, t, t)
    from ..core.ops import binary
    return binary.second[t]


def fold_pending_csr(A):
    """GB_wait on CsrMatrix: one union-merge per accum run."""
    from ..utils import faultinject
    faultinject.checkpoint("csr_wait")
    from .container import CsrMatrix, csr_from_coo
    from .ewise import csr_ewise_add
    out = A
    for accum, tuples in _runs(A._pending):
        I, J, X = _fold_run_host(tuples, accum, A.type)
        D = csr_from_coo(I, J, X, A.nrows, A.ncols, type=A.type,
                         sum_duplicates=False)
        out = csr_ewise_add(_merge_op(accum, A.type), out, D)
    return out


def fold_pending_hyper(A):
    """GB_wait on HyperMatrix: pair-key union merges."""
    from ..utils import faultinject
    faultinject.checkpoint("hyper_wait")
    from .hyper import HyperMatrix, hyper_ewise, hyper_from_coo
    if A.type.is_udt:
        raise TypeError("UDT setElement on the hypersparse container "
                        "is not supported; use CSR or bitmap")
    out = A
    for accum, tuples in _runs(A._pending):
        I, J, X = _fold_run_host(tuples, accum, A.type)
        D = hyper_from_coo(I, J, X, A.nrows, A.ncols, type=A.type,
                           dup=None)
        out = hyper_ewise(_merge_op(accum, A.type), out, D, union=True,
                          ztype=A.type)
    return out


def csr_resize(A, nrows_new: int, ncols_new: int):
    """GxB_Matrix_resize on CSR: entries outside the new frame are
    pruned, the rest remap on device (``GB_resize.c``)."""
    from .assign import _map_compact
    A = A.wait()
    row_map = np.full(A.nrows + 1, -1, np.int64)
    upto = min(A.nrows, nrows_new)
    row_map[:upto] = np.arange(upto)
    col_map = np.full(A.ncols + 1, -1, np.int64)
    upto = min(A.ncols, ncols_new)
    col_map[:upto] = np.arange(upto)
    return _map_compact(A, row_map, col_map, nrows_new, ncols_new)


def hyper_resize(A, nrows_new: int, ncols_new: int):
    """Resize on the hypersparse container: host tuple filter +
    rebuild (dimension-sized maps are impossible at 2^60)."""
    from .hyper import hyper_from_coo
    A = A.wait()
    I, J, X = A.extractTuples()
    keep = (I < nrows_new) & (J < ncols_new)
    return hyper_from_coo(I[keep], J[keep], X[keep], nrows_new,
                          ncols_new, type=A.type, dup=None)
