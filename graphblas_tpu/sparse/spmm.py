"""SpMM: CSR sparse matrix x dense matrix, dense output.

The single-x SpMV kernels (:mod:`spmv`) are bound by the per-lane
x-gather (~0.1 G lanes/s on this machine) or the routing sort
(~0.4 G keys/s) — PERF.md's measured envelope.  Gathering k-wide ROWS
of a dense right operand costs the same per row as a scalar gather
(width-independent up to ~128 lanes, measured), so batching k vectors
through one gather multiplies the useful work per random access by k:
the TPU-idiomatic answer to "SpMV faster than the gather bound" is
SpMM (VERDICT round-3 #3 names exactly this).

One jitted program per call:
  * gather X rows at the CSR column ids        (the only random access)
  * broadcast-multiply by the CSR values       (any named mult op)
  * row-reduce via widened cumsum + O(nrows) boundary row-gathers
    (PLUS family) or segment reduce (other monoids)

Reference counterpart: the reference has no dense-operand special case
— ``GB_mxm.c`` runs its saxpy workers column-by-column over a dense B
at the same per-entry cost as the sparse case.  Here the dense operand
unlocks a ~k× higher MAC rate at identical traffic per nnz.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.semirings import Semiring
from .container import CsrMatrix
from .spmv import _CUMSUM_WIDE, _mult_apply, segment_reduce

__all__ = ["csr_spmm_dense", "csr_spmm_dense_jit"]


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def csr_spmm_dense_jit(add_name: str, sr: Semiring, nrows: int, zdtype,
                       x_all_present: bool, avals, cols, rows, indptr,
                       X_ext, Xp_ext, identity):
    """Y[m, k] = A (add.mult) X for a [ncols+1, k] dense operand whose
    last row is the padded-lane slot.  Returns (yvals [m,k], ypat [m,k]).

    ``x_all_present=True`` skips the per-lane presence gather (the
    common dense-operand case); otherwise absent X entries contribute
    the add identity and the output pattern tracks live contributions
    exactly, matching ``_csr_mxv_jit``'s semantics per column.
    """
    Xg = jnp.take(X_ext, cols, axis=0)                    # (E, k)
    # FIRST/PAIR mults return (E, 1) — broadcast to the lane grid
    z = jnp.broadcast_to(_mult_apply(sr, avals[:, None], Xg), Xg.shape)
    live_rows = rows < nrows                              # (E,)
    if x_all_present:
        live = live_rows[:, None]
    else:
        live = jnp.take(Xp_ext, cols, axis=0) & live_rows[:, None]
    z = jnp.where(live, z, jnp.asarray(identity, z.dtype))
    nm = add_name.upper()
    deg = indptr[1:] - indptr[:-1]
    E = z.shape[0]
    lo = jnp.minimum(indptr[:-1], E)
    hi = jnp.minimum(indptr[1:], E)
    if nm == "PLUS" and np.dtype(z.dtype) in _CUMSUM_WIDE:
        wide = _CUMSUM_WIDE[np.dtype(z.dtype)]
        cs = jnp.cumsum(z.astype(wide), axis=0)
        cs0 = jnp.concatenate(
            [jnp.zeros((1, z.shape[1]), wide), cs], axis=0)
        y = jnp.take(cs0, hi, axis=0) - jnp.take(cs0, lo, axis=0)
    else:
        seg = jnp.minimum(rows, nrows)
        y = segment_reduce(add_name, z, seg, nrows + 1, identity)[:nrows]
    if x_all_present:
        ypat = jnp.broadcast_to((deg > 0)[:, None],
                                (nrows, z.shape[1]))
    else:
        lc = jnp.cumsum(live.astype(jnp.int32), axis=0)
        lc0 = jnp.concatenate(
            [jnp.zeros((1, z.shape[1]), jnp.int32), lc], axis=0)
        ypat = (jnp.take(lc0, hi, axis=0) -
                jnp.take(lc0, lo, axis=0)) > 0
    y = jnp.where(ypat, y.astype(zdtype), jnp.zeros((), zdtype))
    return y, ypat


def csr_spmm_dense(sr: Semiring, A: CsrMatrix, Xvals, Xpat=None):
    """Dense-output SpMM through the gather kernel.  ``Xvals`` is a
    [ncols, k] value array; ``Xpat`` an optional same-shape bool
    presence mask (None = fully present).  Returns (yvals, ypat)."""
    from ..ops.flopcount import record_axb_method
    A = A.wait() if A._pending else A
    zdt = sr.ztype.dtype
    k = Xvals.shape[1]
    Xe = jnp.concatenate(
        [jnp.asarray(Xvals), jnp.zeros((1, k), Xvals.dtype)], axis=0)
    if Xpat is None:
        Xpe = jnp.ones((1, 1), bool)  # unused placeholder
        allp = True
    else:
        Xpe = jnp.concatenate(
            [jnp.asarray(Xpat), jnp.zeros((1, k), bool)], axis=0)
        allp = False
    avals = A.values
    if not A.type.is_udt and avals.dtype != np.dtype(sr.mult.xtype.dtype):
        avals = avals.astype(sr.mult.xtype.dtype)
    record_axb_method("spmm:gather")
    return csr_spmm_dense_jit(
        sr.add.op.name, sr, A.nrows, zdt, allp, avals, A.indices,
        A.rowids, A.indptr, Xe, Xpe, sr.add.identity)
