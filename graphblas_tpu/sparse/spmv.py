"""Sparse matrix-vector multiply over semirings: gather + segment-reduce.

The reference's SpMV is a CSR row walk inside the generated semiring
workers.  The TPU-native form is edge-parallel: one gather of x at the
column indices, one vectorized multiply, one segment-reduce keyed by the
COO row ids — all static-shape, all VPU.  Padded lanes read the identity
slot appended to x (see container.py's sentinel convention) so no
masking is needed in the hot path.

Monoid -> segment-reduce mapping (the ``GB_assoc_template.c`` switch
factory analogue): PLUS/TIMES/MIN/MAX map to jax.ops segment ops;
LOR/LAND/LXOR/EQ run on int32 lanes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.semirings import Semiring
from ..core.types import Type
from .container import CsrMatrix

__all__ = ["csr_mxv", "csr_vxm", "segment_reduce",
           "segment_reduce_sorted"]


def segment_reduce_sorted(op_fn, identity, vals, seg_ids,
                          num_segments: int):
    """Segment reduction for ANY associative op (incl. UDT pytree
    values) when ``seg_ids`` is sorted ascending — which CSR entry
    order guarantees.  Log-depth segmented ``associative_scan`` +
    last-of-segment pick; the generic fallback the reference reaches
    through its function-pointer workers (``GB_assoc_template.c``
    default case).

    ``vals`` is a pytree of [E] leaves; ``identity`` a matching pytree
    of scalars.  Returns a pytree of [num_segments] leaves (segments
    with no lanes = identity).
    """
    tmap = jax.tree_util.tree_map
    E = seg_ids.shape[0]

    def combine(a, b):
        va, sa = a
        vb, sb = b
        z = op_fn(va, vb)
        same = sa == sb
        return tmap(lambda zz, yy: jnp.where(same, zz, yy), z, vb), sb

    scanned, _ = jax.lax.associative_scan(combine, (vals, seg_ids))
    is_last = jnp.concatenate([seg_ids[1:] != seg_ids[:-1],
                               jnp.ones((1,), bool)])
    tgt = jnp.where(is_last, seg_ids, num_segments)
    return tmap(
        lambda sc, idv: jnp.full((num_segments + 1,), idv, sc.dtype)
        .at[tgt].set(sc, mode="drop")[:num_segments],
        scanned, identity)


def segment_reduce(monoid_name: str, vals, seg_ids, num_segments: int,
                   identity):
    """Segment-reduce with a named monoid (jitted; static shapes)."""
    nm = monoid_name.upper()
    if nm == "PLUS":
        return jax.ops.segment_sum(vals, seg_ids,
                                   num_segments=num_segments)
    if nm == "TIMES":
        # segment_prod with identity padding: padded lanes carry 1
        return jax.ops.segment_prod(vals, seg_ids,
                                    num_segments=num_segments)
    if nm in ("MAX", "LOR"):
        out = jax.ops.segment_max(
            vals if vals.dtype != jnp.bool_ else vals.astype(jnp.int32),
            seg_ids, num_segments=num_segments)
        # empty segments yield INT32_MIN, which must read as the LOR
        # identity False — compare, don't astype (astype gives True)
        return (out > 0) if vals.dtype == jnp.bool_ else out
    if nm in ("MIN", "LAND"):
        out = jax.ops.segment_min(
            vals if vals.dtype != jnp.bool_ else vals.astype(jnp.int32),
            seg_ids, num_segments=num_segments)
        # empty segments yield INT32_MAX > 0 == the LAND identity True
        return (out > 0) if vals.dtype == jnp.bool_ else out
    if nm in ("LXOR",):
        cnt = jax.ops.segment_sum((vals != 0).astype(jnp.int32), seg_ids,
                                  num_segments=num_segments)
        return (cnt % 2 != 0).astype(vals.dtype)
    if nm == "EQ":
        cnt = jax.ops.segment_sum((vals == 0).astype(jnp.int32), seg_ids,
                                  num_segments=num_segments)
        return (cnt % 2 == 0).astype(vals.dtype)
    raise NotImplementedError(f"segment monoid {nm}")


def _mult_apply(sr: Semiring, avals, xvals):
    """z = mult(a, x) elementwise on the gathered lanes."""
    nm = sr.mult.name
    if nm == "TIMES" or nm == "LAND":
        if avals.dtype == jnp.bool_:
            return avals & (xvals != 0) if xvals.dtype != jnp.bool_ \
                else avals & xvals
        return avals * xvals.astype(avals.dtype)
    if nm == "FIRST":
        return avals
    if nm == "SECOND":
        return xvals
    if nm == "PAIR":
        return jnp.ones_like(avals)
    return sr.mult(avals, xvals.astype(avals.dtype)
                   if avals.dtype != jnp.bool_ else xvals)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _csr_mxv_jit(add_name: str, sr: Semiring, nrows: int, zdtype, avals,
                 cols, rows, x_ext, xp_ext, identity):
    xg = jnp.take(x_ext, cols, axis=0)      # padded lanes hit the slot
    xpg = jnp.take(xp_ext, cols, axis=0)    # structural presence of x
    z = _mult_apply(sr, avals, xg)
    # absent-x and padded lanes contribute the add identity (this is
    # what makes the kernel correct for ALL semirings with sparse x,
    # not just those where mult(a, 0) == identity)
    live = xpg & (rows < nrows)
    z = jnp.where(live, z, jnp.asarray(identity, z.dtype))
    seg = jnp.minimum(rows, nrows)
    y = segment_reduce(add_name, z, seg, nrows + 1, identity)[:nrows]
    # output pattern: rows with >= 1 structural contribution — fused
    # here so one dispatch covers the whole SpMV
    ypat = jax.ops.segment_max(live.astype(jnp.int32), seg,
                               num_segments=nrows + 1)[:nrows] > 0
    y = jnp.where(ypat, y.astype(zdtype), jnp.zeros((), zdtype))
    return y, ypat


_UDT_MXV_CACHE = {}


def _udt_mxv_prog(sr: Semiring, nrows: int):
    """Jitted UDT edge-parallel SpMV (cached by semiring identity —
    UDT identities are dict pytrees, unhashable as static args)."""
    key = (id(sr), nrows)
    f = _UDT_MXV_CACHE.get(key)
    if f is not None:
        return f

    def impl(avals, cols, rows, x_ext, xp_ext):
        # No casting — the caller supplies operands already in the
        # semiring's domains (the reference's UDT workers are likewise
        # cast-free, ``dpagerank2.c:83-101``).
        tmap = jax.tree_util.tree_map
        xg = tmap(lambda v: jnp.take(v, cols, axis=0), x_ext)
        z = sr.mult(avals, xg)
        ident = sr.add.identity
        xpg = jnp.take(xp_ext, cols)
        live = xpg & (rows < nrows)
        z = tmap(lambda zz, idv: jnp.where(live, zz,
                                           jnp.asarray(idv, zz.dtype)),
                 z, ident)
        seg = jnp.minimum(rows, nrows)
        y = segment_reduce_sorted(sr.add.op, ident, z, seg, nrows + 1)
        y = tmap(lambda v: v[:nrows], y)
        ypat = jax.ops.segment_max(live.astype(jnp.int32), seg,
                                   num_segments=nrows + 1)[:nrows] > 0
        y = tmap(lambda v, idv: jnp.where(ypat, v,
                                          jnp.asarray(idv, v.dtype)),
                 y, ident)
        return y, ypat

    f = jax.jit(impl)
    _UDT_MXV_CACHE[key] = f
    return f


#: widened accumulator for the cumsum-based row sum: the global prefix
#: accumulates over ALL lanes, so int32 must widen to int64 and f32 to
#: f64 (the per-row result is then exact for ints and within one
#: rounding of the sequential sum for floats)
_CUMSUM_WIDE = {np.dtype(np.int8): jnp.int64, np.dtype(np.int16): jnp.int64,
                np.dtype(np.int32): jnp.int64, np.dtype(np.uint8): jnp.int64,
                np.dtype(np.uint16): jnp.int64, np.dtype(np.uint32): jnp.int64,
                np.dtype(np.float32): jnp.float64,
                np.dtype(np.float64): jnp.float64,
                np.dtype(np.bool_): jnp.int64}


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _csr_mxv_densex_jit(add_name: str, sr: Semiring, nrows: int, zdtype,
                        avals, cols, rows, indptr, x_ext, identity):
    """Dense-x fast path tuned to the measured TPU envelope: scalar
    gathers run ~0.12 G/s and segment_sum is no faster, while cumsum
    runs ~4 G/s — so this kernel does exactly ONE per-lane gather
    (x at the column ids) and reduces rows via a widened cumulative
    sum + O(nrows) boundary gathers (PLUS monoids), or the log-depth
    segmented scan for other monoids.  The output pattern comes from
    indptr degrees — no per-lane pattern gather."""
    xg = jnp.take(x_ext, cols, axis=0)
    z = _mult_apply(sr, avals, xg)
    live = rows < nrows
    z = jnp.where(live, z, jnp.asarray(identity, z.dtype))
    nm = add_name.upper()
    deg = indptr[1:] - indptr[:-1]
    ypat = deg > 0
    if nm == "PLUS" and np.dtype(z.dtype) in _CUMSUM_WIDE:
        wide = _CUMSUM_WIDE[np.dtype(z.dtype)]
        cs = jnp.cumsum(z.astype(wide))
        cs0 = jnp.concatenate([jnp.zeros((1,), wide), cs])
        nz = z.shape[0]
        y = cs0[jnp.minimum(indptr[1:], nz)] - \
            cs0[jnp.minimum(indptr[:-1], nz)]
    else:
        seg = jnp.minimum(rows, nrows)
        y = segment_reduce_sorted(sr.add.op, identity, z, seg,
                                  nrows + 1)[:nrows]
    # off-pattern slots are zero, matching _csr_mxv_jit's convention
    y = jnp.where(ypat, y.astype(zdtype), jnp.zeros((), zdtype))
    return y, ypat


def csr_mxv(sr: Semiring, A: CsrMatrix, x, x_pattern=None):
    """(yvals, ypat) = A *.sr* x.  x: dense [ncols] value array;
    ``x_pattern`` marks present entries (None = all present).
    UDT semirings (struct x/z) route through the generic pytree kernel."""
    from ..core.types import cast as gbcast
    if sr.ztype.is_udt or sr.xtype.is_udt or sr.ytype.is_udt \
            or A.type.is_udt:
        tmap = jax.tree_util.tree_map
        x_ext = tmap(lambda v: jnp.concatenate(
            [jnp.asarray(v), jnp.zeros((1,), jnp.asarray(v).dtype)]), x)
        if x_pattern is None:
            xp = jnp.ones(A.ncols, bool)
        else:
            xp = jnp.asarray(x_pattern, bool)
        xp_ext = jnp.concatenate([xp, jnp.zeros((1,), bool)])
        return _udt_mxv_prog(sr, A.nrows)(A.values, A.indices,
                                          A.rowids, x_ext, xp_ext)
    ident = sr.add.identity
    # cast operands into the semiring's domains (the bitmap path does
    # this in _mxu_path; int-stored A with a float semiring must not
    # truncate x)
    x = gbcast(jnp.asarray(x), sr.ytype)
    avals = gbcast(A.values, sr.xtype)
    if x_pattern is None:
        xp = jnp.ones(A.ncols, bool)
    else:
        xp = jnp.asarray(x_pattern, bool)
    # identity slot for padded column indices (sentinel = ncols)
    x_ext = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
    if x_pattern is None:
        # dense x: one-gather kernel, no per-lane pattern work
        return _csr_mxv_densex_jit(sr.add.op.name, sr, A.nrows,
                                   sr.ztype.dtype, avals, A.indices,
                                   A.rowids, A.indptr, x_ext, ident)
    xp_ext0 = jnp.concatenate([xp, jnp.zeros((1,), bool)])
    return _csr_mxv_jit(sr.add.op.name, sr, A.nrows, sr.ztype.dtype,
                        avals, A.indices, A.rowids, x_ext, xp_ext0,
                        ident)


def csr_vxm(sr: Semiring, x, AT: CsrMatrix, x_pattern=None):
    """w = x' *.sr* A given AT = A.T in CSR (i.e. A in CSC).  Same
    edge-parallel kernel; the caller caches the transpose."""
    return csr_mxv(sr, AT, x, x_pattern)
