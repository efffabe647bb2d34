"""assign / subassign / extract on the hypersparse container.

Reference: ``GB_subassign_kernel.c:10-62`` (format-agnostic there) and
``GB_assign.c``; executable specs ``Test/GB_spec_assign.m`` /
``GB_spec_subassign.m``.  The CSR version (:mod:`.assign`) linearizes
keys as i*ncols+j and builds O(dim) inverse maps — both impossible at
dimension 2^60.  Here everything is pair-key (two stable sorts) and the
index maps are searchsorted probes of the sorted index lists:

* **inverse map** (``GB_I_inverse.c``): position of a global id in the
  index list I via ``searchsorted(sort(I), g)`` + a permutation gather
  — O(|I| log |I|) build, O(log |I|) per probe, never O(dim);
* **forward map**: a direct gather ``I[local]``;
* **region split**: per-lane membership of C's entries in I x J by two
  probes;
* the epilogue is the existing :func:`~.hyper.hyper_accum_mask`.

``I = None`` (GrB_ALL) short-circuits to identity maps, so whole-matrix
assign works at any dimension without materializing an index list.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.descriptor import Descriptor, desc_of
from ..core.errors import DimensionMismatch, IndexOutOfBounds, InvalidValue
from ..core.ops import BinaryOp
from ..core.types import Type, cast_value
from .esc import _bucket
from .hyper import (HyperMatrix, _build_h, _empty_hyper, _pair_argsort,
                    hyper_accum_mask, hyper_from_coo, _I64MAX)

__all__ = ["hyper_subref", "hyper_extract", "hyper_assign",
           "hyper_subassign", "hyper_filter_lanes"]

_tmap = jax.tree_util.tree_map


# ---------------------------------------------------------------------------
# index lists at huge dimension
# ---------------------------------------------------------------------------

class _IndexMap:
    """One side's index list I with sorted probe arrays.  ``ids=None``
    is GrB_ALL: identity maps over the full dimension."""

    def __init__(self, ids, dim: int, what: str):
        self.dim = dim
        if ids is None:
            self.ids = None
            self.n = dim
            return
        ids = np.asarray(ids, np.int64)
        if ids.ndim != 1:
            raise InvalidValue(f"{what} index list must be 1-D")
        if ids.size and (ids.min() < 0 or ids.max() >= dim):
            raise IndexOutOfBounds(
                f"{what} indices out of range for dimension {dim}")
        self.ids = ids
        self.n = len(ids)
        order = np.argsort(ids, kind="stable")
        srt = ids[order]
        if len(srt) > 1 and np.any(srt[1:] == srt[:-1]):
            raise InvalidValue(
                f"duplicate {what} indices are not supported on the "
                f"sparse containers (undefined for assign per the "
                f"GraphBLAS spec)")
        self.sorted = jnp.asarray(srt)
        self.order = jnp.asarray(order.astype(np.int64))
        self.fwd = jnp.asarray(ids)

    def inverse(self, g):
        """(local_position, valid) for global ids g — device probes."""
        if self.ids is None:
            return g, g < self.dim
        if self.n == 0:
            return jnp.zeros_like(g), jnp.zeros(g.shape, bool)
        k = jnp.searchsorted(self.sorted, g)
        kc = jnp.minimum(k, self.n - 1)
        valid = self.sorted[kc] == g
        return self.order[kc], valid

    def forward(self, local):
        """Global ids of local positions (gather)."""
        if self.ids is None:
            return local
        return self.fwd[jnp.clip(local, 0, max(self.n - 1, 0))]


# ---------------------------------------------------------------------------
# device compaction: (i, j, vals, keep) -> HyperMatrix arrays
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 1, 2))
def _compact_jit(hcap: int, nrows: int, ncols: int, i, j, vals, keep):
    big = jnp.asarray(_I64MAX, jnp.int64)
    E = i.shape[0]
    i = jnp.where(keep, i, big)
    j = jnp.where(keep, j, big)
    perm = _pair_argsort(i, j)
    si, sj = i[perm], j[perm]
    vs = _tmap(lambda v: v[perm], vals)
    livek = si < big
    nnz = jnp.sum(livek).astype(jnp.int32)
    out_i = jnp.where(livek, si, nrows)
    out_j = jnp.where(livek, sj, ncols)
    h, hptr, nvec = _build_h(out_i, nnz, hcap, nrows)
    return out_i, out_j, vs, nnz, h, hptr, nvec


def _compact(i, j, vals, keep, nrows: int, ncols: int, t: Type,
             hcap_hint: int) -> HyperMatrix:
    hcap = _bucket(max(hcap_hint, 8))
    out_i, out_j, vs, nnz, h, hptr, nvec = _compact_jit(
        hcap, nrows, ncols, i, j, vals, keep)
    nz = int(nnz)
    cap = min(_bucket(max(nz, 8)), int(out_i.shape[0]))
    return HyperMatrix(h, hptr, out_i[:cap], out_j[:cap],
                       _tmap(lambda v: v[:cap], vs), nz, int(nvec),
                       nrows, ncols, t)


def hyper_filter_lanes(A: HyperMatrix, keep) -> HyperMatrix:
    """Device-side entry filter on the hyper container (pair-key form
    of :func:`~.tri.csr_filter_lanes`)."""
    live = jnp.arange(A.nzmax) < A.nvals
    return _compact(A.rowids, A.indices, A.values,
                    jnp.asarray(keep, bool) & live, A.nrows, A.ncols,
                    A.type, max(A.nvec, 8))


# ---------------------------------------------------------------------------
# subref / to-global / region split
# ---------------------------------------------------------------------------

def hyper_subref(A: HyperMatrix, I: Any = None, J: Any = None
                 ) -> HyperMatrix:
    """C = A(I,J): inverse-map probes + pair-sort compact
    (``GB_subref_template.c`` with searchsorted instead of buckets)."""
    im = _IndexMap(I, A.nrows, "row")
    jm = _IndexMap(J, A.ncols, "column")
    live = jnp.arange(A.nzmax) < A.nvals
    li, vi = im.inverse(A.rowids)
    lj, vj = jm.inverse(A.indices)
    keep = live & vi & vj
    return _compact(li, lj, A.values, keep, im.n, jm.n, A.type,
                    min(A.nvec, max(im.n, 8)) if im.ids is not None
                    else A.nvec)


def _to_global(A: HyperMatrix, im: _IndexMap, jm: _IndexMap,
               m: int, n: int) -> HyperMatrix:
    """Push the region-shaped A into C's m x n frame via I/J."""
    live = jnp.arange(A.nzmax) < A.nvals
    gi = im.forward(A.rowids)
    gj = jm.forward(A.indices)
    return _compact(gi, gj, A.values, live, m, n, A.type, A.nvec)


def _region_lanes(C: HyperMatrix, im: _IndexMap, jm: _IndexMap):
    live = jnp.arange(C.nzmax) < C.nvals
    _, vi = im.inverse(C.rowids)
    _, vj = jm.inverse(C.indices)
    return live & vi & vj


def _union_disjoint(X: HyperMatrix, Y: HyperMatrix) -> HyperMatrix:
    """Merge two HyperMatrix with disjoint patterns."""
    if X.nvals == 0:
        return Y
    if Y.nvals == 0:
        return X
    i = jnp.concatenate([X.rowids, Y.rowids])
    j = jnp.concatenate([X.indices, Y.indices])
    v = _tmap(lambda a, b: jnp.concatenate([a, b]), X.values, Y.values)
    keep = jnp.concatenate([jnp.arange(X.nzmax) < X.nvals,
                            jnp.arange(Y.nzmax) < Y.nvals])
    return _compact(i, j, v, keep, X.nrows, X.ncols, X.type,
                    X.nvec + Y.nvec)


def _scalar_region(scalar, ni: int, nj: int, t: Type) -> HyperMatrix:
    """Scalar expansion: the all-present ni x nj region
    (``GB_subassign_scalar.c``'s implicit A)."""
    if t.is_udt:
        raise TypeError("UDT scalar assign on the hypersparse container "
                        "is not supported; use CSR or bitmap")
    if ni * nj > (1 << 24):
        raise InvalidValue(
            f"scalar assign would expand to {ni}x{nj} dense entries; "
            f"pass explicit index lists on the hypersparse container")
    v = cast_value(scalar, t)
    nnz = ni * nj
    I = np.repeat(np.arange(ni, dtype=np.int64), nj)
    J = np.tile(np.arange(nj, dtype=np.int64), ni)
    return hyper_from_coo(I, J, np.full(nnz, v, np.dtype(t.dtype)),
                          ni, nj, type=t, dup=None)


# ---------------------------------------------------------------------------
# the orchestrators (GB_spec_subassign.m / GB_spec_assign.m transcribed)
# ---------------------------------------------------------------------------

def _prep_operand(A, im: _IndexMap, jm: _IndexMap, ctype: Type,
                  tran: bool, scalar: bool) -> HyperMatrix:
    if scalar:
        return _scalar_region(A, im.n, jm.n, ctype)
    from ..ops.containers import to_hyper_operand
    A = to_hyper_operand(A, tran, "assign input")
    if A.shape != (im.n, jm.n):
        raise DimensionMismatch(
            f"A is {A.shape}, I x J is {(im.n, jm.n)}")
    return A


def _prep_mask(M, shape) -> Optional[HyperMatrix]:
    if M is None:
        return None
    from ..ops.containers import to_hyper_operand
    M = to_hyper_operand(M, False, "mask")
    if M.shape != shape:
        raise DimensionMismatch(f"mask is {M.shape}, expected {shape}")
    return M


def hyper_subassign(C: HyperMatrix, M, accum: Optional[BinaryOp], A,
                    I: Any = None, J: Any = None,
                    desc: Optional[Descriptor] = None, *,
                    scalar: bool = False) -> HyperMatrix:
    """C(I,J)<M> = accum(C(I,J), A) — GxB_subassign at hyper dimension.
    M is |I| x |J|; REPLACE and the mask never touch entries outside
    the region (``GB_spec_subassign.m``)."""
    d = desc_of(desc)
    C = C.wait()
    im = _IndexMap(I, C.nrows, "row")
    jm = _IndexMap(J, C.ncols, "column")
    A = _prep_operand(A, im, jm, C.type, d.tran0, scalar)
    M = _prep_mask(M, (im.n, jm.n))
    in_region = _region_lanes(C, im, jm)
    C_in = hyper_filter_lanes(C, in_region)
    C_out = hyper_filter_lanes(C, ~in_region)
    T = _to_global(A, im, jm, C.nrows, C.ncols)
    Mg = _to_global(M, im, jm, C.nrows, C.ncols) if M is not None \
        else None
    Z_in = hyper_accum_mask(C_in, Mg, T, accum, replace=d.replace,
                            complement=d.mask_scmp,
                            structural=d.mask_structure)
    return _union_disjoint(Z_in, C_out)


def hyper_assign(C: HyperMatrix, M, accum: Optional[BinaryOp], A,
                 I: Any = None, J: Any = None,
                 desc: Optional[Descriptor] = None, *,
                 scalar: bool = False) -> HyperMatrix:
    """C<M>(I,J) = accum(C(I,J), A) — GrB_assign at hyper dimension.
    M is C-sized; REPLACE acts over all of C (``GB_spec_assign.m``:
    Z = C; Z(I,J) = accum(C(I,J),A); C<M,replace> = Z)."""
    d = desc_of(desc)
    C = C.wait()
    im = _IndexMap(I, C.nrows, "row")
    jm = _IndexMap(J, C.ncols, "column")
    A = _prep_operand(A, im, jm, C.type, d.tran0, scalar)
    M = _prep_mask(M, C.shape)
    in_region = _region_lanes(C, im, jm)
    C_in = hyper_filter_lanes(C, in_region)
    C_out = hyper_filter_lanes(C, ~in_region)
    T = _to_global(A, im, jm, C.nrows, C.ncols)
    # Z(I,J) = accum(C(I,J), A): region-local, no mask, no replace
    Z_in = hyper_accum_mask(C_in, None, T, accum)
    Z = _union_disjoint(Z_in, C_out)
    # C<M,d> = Z over ALL of C
    return hyper_accum_mask(C, M, Z, None, replace=d.replace,
                            complement=d.mask_scmp,
                            structural=d.mask_structure)


def hyper_extract(C: HyperMatrix, M, accum: Optional[BinaryOp], A,
                  I: Any = None, J: Any = None,
                  desc: Optional[Descriptor] = None) -> HyperMatrix:
    """C<M> = accum(C, A(I,J)) — GrB_Matrix_extract at hyper dims."""
    d = desc_of(desc)
    from ..ops.containers import to_hyper_operand
    A = to_hyper_operand(A, d.tran0, "extract input")
    T = hyper_subref(A, I, J)
    if T.shape != C.shape:
        raise DimensionMismatch(f"C is {C.shape}, A(I,J) is {T.shape}")
    M = _prep_mask(M, C.shape)
    return hyper_accum_mask(C, M, T, accum, replace=d.replace,
                            complement=d.mask_scmp,
                            structural=d.mask_structure)
