"""Sparse accumulate/mask epilogue: C<M> = accum(C, T) on CsrMatrix.

Same executable-spec semantics as :mod:`graphblas_tpu.core.mask`
(``Test/GB_spec_accum.m`` + ``Test/GB_spec_mask.m``), re-shaped for the
sparse container.  The reference runs this as two passes — ``GB_add``
(union merge) then ``GB_mask`` (mask merge, ``GB_accum_mask.c:246-318``);
here both fold into ONE stable sort over C's and T's tuples with the
per-lane case analysis applied vectorized:

  key in mask:  pair -> accum(c,t) (or cast(t) when accum is None);
                T-only -> cast(t); C-only -> c when accumulating, else
                dropped (Z=T has no entry there)
  key outside:  C entry survives unless REPLACE; T is irrelevant

Mask membership is a binary search against the mask's sorted truthy
keys — O((nnzC+nnzT)·log nnzM) device work, no n² anywhere.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.descriptor import Descriptor, desc_of
from ..core.errors import DimensionMismatch
from ..core.ops import BinaryOp
from ..core.types import Type, cast
from .container import CsrMatrix
from .esc import _bucket, _empty_csr

__all__ = ["csr_accum_mask", "csr_clear"]

_tmap = jax.tree_util.tree_map


def _key_dtype(m: int, n: int):
    if (m + 1) * n < (1 << 31):
        return jnp.int32
    if (m + 1) * n < (1 << 63):
        return jnp.int64
    raise NotImplementedError("dimension product exceeds 2^63")


def _live_keys(X: CsrMatrix, n: int, kdt, big, truthy: bool = False):
    lane = jnp.arange(X.nzmax)
    live = lane < X.nvals
    if truthy:
        if X.type.is_udt:
            raise TypeError("mask with UDT values is not valid")
        live = live & (X.values != 0)
    keys = X.rowids.astype(kdt) * n + X.indices.astype(kdt)
    return jnp.where(live, keys, big)


def _cast_fn(src: Type, dst: Type):
    if src.is_udt or dst.is_udt:
        if src.name != dst.name:
            raise TypeError(f"cannot typecast UDT {src.name} -> {dst.name}")
        return lambda v: v
    return lambda v: cast(v, dst)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _epilogue_jit(ctype: Type, ttype: Type, accum: Optional[BinaryOp],
                  replace: bool, scmp: bool, has_mask: bool,
                  m: int, n: int, kdt,
                  c_keys, c_values, t_keys, t_values, m_keys):
    big = jnp.asarray(np.iinfo(np.dtype(kdt)).max, kdt)
    sent = jnp.asarray(m * n, kdt)
    keys = jnp.concatenate([c_keys, t_keys])
    E = keys.shape[0]
    nc = c_keys.shape[0]
    tags = jnp.concatenate([jnp.zeros((nc,), bool),
                            jnp.ones((E - nc,), bool)])
    va = _tmap(lambda v: jnp.concatenate(
        [v, jnp.zeros((E - nc,), v.dtype)]), c_values)
    vb = _tmap(lambda v: jnp.concatenate(
        [jnp.zeros((nc,), v.dtype), v]), t_values)

    perm = jnp.argsort(keys)  # stable: C lanes precede T lanes per key
    ks = keys[perm]
    tg = tags[perm]
    va = _tmap(lambda v: v[perm], va)
    vb = _tmap(lambda v: v[perm], vb)
    head = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    nxt_same = jnp.concatenate([ks[1:] == ks[:-1], jnp.zeros((1,), bool)])
    live = ks < big
    is_pair = head & nxt_same & live

    def shift_down(v):
        return jnp.concatenate([v[1:], v[-1:]])

    t_raw = _tmap(lambda b, bn: jnp.where(is_pair, bn, b),
                  vb, _tmap(shift_down, vb)) if ttype.is_udt else \
        jnp.where(is_pair, shift_down(vb), vb)
    cast_t = _cast_fn(ttype, ctype)

    if has_mask:
        idx = jnp.searchsorted(m_keys, ks)
        idxc = jnp.minimum(idx, m_keys.shape[0] - 1)
        member = (m_keys[idxc] == ks) & live
        if scmp:
            member = ~member & live
    else:
        member = live if not scmp else jnp.zeros_like(live)

    c_present = is_pair | (~tg & live)
    t_present = is_pair | (tg & live)

    # value inside the mask (Z value)
    if accum is None:
        z_in = cast_t(t_raw)
        keep_in = t_present
    else:
        ca = _cast_fn(ctype, accum.xtype)(va)
        tb = _cast_fn(ttype, accum.ytype)(t_raw)
        z_acc = _cast_fn(accum.ztype, ctype)(accum(ca, tb))
        if ctype.is_udt:
            z_in = _tmap(lambda zz, a, t: jnp.where(
                is_pair, zz, jnp.where(tg, t, a)), z_acc, va, cast_t(t_raw))
        else:
            z_in = jnp.where(is_pair, z_acc,
                             jnp.where(tg, cast_t(t_raw), va))
        keep_in = c_present | t_present

    # outside the mask: C survives unless REPLACE
    keep_out = c_present & (not replace)
    if ctype.is_udt:
        out_v = _tmap(lambda zi, a: jnp.where(member, zi, a), z_in, va)
    else:
        out_v = jnp.where(member, z_in, va)
    keep = head & jnp.where(member, keep_in, keep_out)

    r = (jnp.cumsum(keep) - 1).astype(jnp.int32)
    nnz = jnp.sum(keep).astype(jnp.int32)
    tgt = jnp.where(keep, r, E + 1)
    out_keys = jnp.full((E + 2,), sent, kdt).at[tgt].set(
        ks, mode="drop")[:E + 1]
    if ctype.is_udt:
        out_vals = _tmap(lambda v: jnp.zeros((E + 2,), v.dtype).at[tgt].set(
            v, mode="drop")[:E + 1], out_v)
    else:
        out_vals = jnp.zeros((E + 2,), out_v.dtype).at[tgt].set(
            out_v, mode="drop")[:E + 1]

    is_sent = out_keys == sent
    oi = jnp.where(is_sent, m, out_keys // n).astype(jnp.int32)
    oj = jnp.where(is_sent, n, out_keys % n).astype(jnp.int32)
    counts = jax.ops.segment_sum(
        (~is_sent).astype(jnp.int32), oi, num_segments=m + 1)
    indptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts[:m]).astype(jnp.int32)])
    return indptr, oj, oi, out_vals, nnz


def csr_clear(C: CsrMatrix) -> CsrMatrix:
    return _empty_csr(C.nrows, C.ncols, C.type)


def csr_accum_mask(C: CsrMatrix, M: Optional[CsrMatrix], T: CsrMatrix,
                   accum: Optional[BinaryOp],
                   desc: Optional[Descriptor]) -> CsrMatrix:
    """Full sparse epilogue C<M> = accum(C, T); returns a new CsrMatrix
    of C's type (reference ``GB_accum_mask.c`` semantics)."""
    d = desc_of(desc)
    C = C.wait()  # fold pending deltas (GB_WAIT at op entry)
    if M is not None:
        M = M.wait()
    if T.shape != C.shape:
        raise DimensionMismatch(f"T shape {T.shape} != C shape {C.shape}")
    if M is not None and M.shape != C.shape:
        raise DimensionMismatch(
            f"mask shape {M.shape} != output shape {C.shape}")
    if M is None and d.mask_scmp:
        return csr_clear(C) if d.replace else C
    m, n = C.shape
    kdt = _key_dtype(m, n)
    big = np.iinfo(np.dtype(kdt)).max
    c_keys = _live_keys(C, n, kdt, big)
    t_keys = _live_keys(T, n, kdt, big)
    if M is not None:
        m_keys = jnp.sort(_live_keys(M, n, kdt, big,
                                     truthy=not d.mask_structure))
    else:
        m_keys = jnp.zeros((1,), kdt)
    indptr, oj, oi, ov, nnzC = _epilogue_jit(
        C.type, T.type, accum, d.replace, d.mask_scmp, M is not None,
        m, n, kdt, c_keys, C.values, t_keys, T.values, m_keys)
    nnz = int(nnzC)
    E = c_keys.shape[0] + t_keys.shape[0]
    cap = min(_bucket(max(nnz, 8)), E + 1)
    return CsrMatrix(indptr, oj[:cap], oi[:cap],
                     _tmap(lambda v: v[:cap], ov), nnz, m, n, C.type)
