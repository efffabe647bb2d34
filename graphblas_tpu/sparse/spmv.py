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

__all__ = ["csr_mxv", "csr_vxm", "segment_reduce"]


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
        return out.astype(vals.dtype) if vals.dtype == jnp.bool_ else out
    if nm in ("MIN", "LAND"):
        out = jax.ops.segment_min(
            vals if vals.dtype != jnp.bool_ else vals.astype(jnp.int32),
            seg_ids, num_segments=num_segments)
        return out.astype(vals.dtype) if vals.dtype == jnp.bool_ else out
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


def csr_mxv(sr: Semiring, A: CsrMatrix, x, x_pattern=None):
    """(yvals, ypat) = A *.sr* x.  x: dense [ncols] value array;
    ``x_pattern`` marks present entries (None = all present)."""
    from ..core.types import cast as gbcast
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
    xp_ext0 = jnp.concatenate([xp, jnp.zeros((1,), bool)])
    return _csr_mxv_jit(sr.add.op.name, sr, A.nrows, sr.ztype.dtype,
                        avals, A.indices, A.rowids, x_ext, xp_ext0,
                        ident)


def csr_vxm(sr: Semiring, x, AT: CsrMatrix, x_pattern=None):
    """w = x' *.sr* A given AT = A.T in CSR (i.e. A in CSC).  Same
    edge-parallel kernel; the caller caches the transpose."""
    return csr_mxv(sr, AT, x, x_pattern)
