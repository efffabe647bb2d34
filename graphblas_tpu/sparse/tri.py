"""Sort-free masked structural counting on CSR: the large-graph
triangle/k-truss engine.

For counting semirings (PLUS_PAIR / PLUS_LAND on patterns), the masked
product C<M> = A·B needs only, per mask entry e=(i,j), the number of
wedges i -> k -> j.  The ESC engine would sort the expanded lanes by
output coordinate — but the mask's CSR keys are ALREADY sorted, so each
lane can locate its output slot directly by binary search and
segment-add there.  No sort, no n^2, no n^2/32 bitpack: O(flops) gathers
+ O(flops log nnz(M)) compares, chunked so peak memory is bounded.
This is what lets triangle counting run at scale-20 (10^6 nodes) on one
chip where both the bitmap and the bitpacked engines are infeasible
(VERDICT round-2 #3).

Reference counterparts: ``Template/GB_AxB_dot_mask.c`` (masked dot),
``Extras/tri/tri_main.c`` (scale ambitions), ``tricount.c`` SandiaDot.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .container import CsrMatrix
from .esc import _bucket

__all__ = ["masked_pair_counts", "tricount_esc", "ktruss_esc",
           "allktruss_esc", "csr_filter_lanes", "csr_tril", "csr_triu"]


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _counts_jit(chunk: int, n: int, ncolsA: int, kdt,
                nchunks, a_indices, a_rowids, b_indptr, b_indices,
                m_keys):
    """Chunked lane expansion + mask binary search + segment add.

    ``nchunks`` is traced, so one compilation serves every flop count
    at a given buffer geometry."""
    nzmaxA = a_indices.shape[0]
    nzmaxB = b_indices.shape[0]
    nzmaxM = m_keys.shape[0]
    big = jnp.asarray(np.iinfo(np.dtype(kdt)).max, kdt)

    degB = (b_indptr[1:] - b_indptr[:-1]).astype(jnp.int64)
    degB_ext = jnp.concatenate([degB, jnp.zeros((1,), jnp.int64)])
    acol = jnp.minimum(a_indices.astype(jnp.int64), ncolsA)
    lens = degB_ext[acol]
    csum = jnp.cumsum(lens)
    total = csum[-1]

    def body(c, counts):
        t = c * chunk + jnp.arange(chunk, dtype=jnp.int64)
        e = jnp.searchsorted(csum, t, side="right")
        live = t < total
        ec = jnp.minimum(e, nzmaxA - 1)
        start = csum[ec] - lens[ec]
        l = t - start
        kk = jnp.minimum(acol[ec], ncolsA - 1)
        pos = jnp.clip(b_indptr[kk].astype(jnp.int64) + l, 0, nzmaxB - 1)
        i = a_rowids[ec]
        j = b_indices[pos]
        key = jnp.where(live, i.astype(kdt) * n + j.astype(kdt), big)
        idx = jnp.searchsorted(m_keys, key)
        idxc = jnp.minimum(idx, nzmaxM - 1)
        member = (m_keys[idxc] == key) & (key < big)
        return counts.at[idxc].add(member.astype(jnp.int32), mode="drop")

    counts = jnp.zeros((nzmaxM,), jnp.int32)
    return jax.lax.fori_loop(0, nchunks, body, counts)


def _csr_keys_sorted(M: CsrMatrix, n: int, kdt):
    """Entry keys of M in CSR order (ascending; padded tail == max)."""
    big = np.iinfo(np.dtype(kdt)).max
    lane = jnp.arange(M.nzmax)
    keys = M.rowids.astype(kdt) * n + M.indices.astype(kdt)
    return jnp.where(lane < M.nvals, keys, jnp.asarray(big, kdt))


def masked_pair_counts(M: CsrMatrix, A: CsrMatrix, B: CsrMatrix,
                       chunk: int = 1 << 21) -> jnp.ndarray:
    """counts[e] = (A·B)[i_e, j_e] over PLUS_PAIR for every entry e of M
    (aligned with M's padded CSR entry order; padded slots 0)."""
    m, k = A.shape
    n = B.ncols
    if M.shape != (m, n):
        from ..core.errors import DimensionMismatch
        raise DimensionMismatch(f"mask {M.shape} vs product {(m, n)}")
    kdt = jnp.int32 if (m + 1) * n < (1 << 31) else jnp.int64
    m_keys = _csr_keys_sorted(M, n, kdt)
    flops = int(jnp.sum((B.indptr[1:] - B.indptr[:-1]).astype(jnp.int64)[
        jnp.minimum(A.indices, k)[:A.nzmax]]
        * (jnp.arange(A.nzmax) < A.nvals)))
    if flops == 0:
        return jnp.zeros((M.nzmax,), jnp.int32)
    chunk = min(chunk, _bucket(flops))
    nchunks = -(-flops // chunk)
    return _counts_jit(chunk, n, k, kdt, nchunks,
                       A.indices, A.rowids, B.indptr, B.indices, m_keys)


def tricount_esc(L: CsrMatrix, U: Optional[CsrMatrix] = None,
                 chunk: int = 1 << 21) -> int:
    """Sandia triangle count at CSR scale: ntri = sum over (i,j) in L of
    (L·U)[i,j]; with ``U=None`` uses the pure-Sandia form (L·L).<L."""
    B = U if U is not None else L
    counts = masked_pair_counts(L, L, B, chunk)
    return int(jnp.sum(counts.astype(jnp.int64)))


@partial(jax.jit, static_argnums=(0, 1, 2))
def _filter_jit(nzmax: int, nrows: int, ncols: int,
                indices, rowids, values, keep):
    r = (jnp.cumsum(keep) - 1).astype(jnp.int32)
    nnz = jnp.sum(keep).astype(jnp.int32)
    tgt = jnp.where(keep, r, nzmax + 1)
    ni = jnp.full((nzmax + 2,), ncols, indices.dtype).at[tgt].set(
        indices, mode="drop")[:nzmax]
    nr = jnp.full((nzmax + 2,), nrows, rowids.dtype).at[tgt].set(
        rowids, mode="drop")[:nzmax]
    nv = jax.tree_util.tree_map(
        lambda v: jnp.zeros((nzmax + 2,), v.dtype).at[tgt].set(
            v, mode="drop")[:nzmax], values)
    counts = jax.ops.segment_sum(
        keep.astype(jnp.int32), jnp.minimum(rowids, nrows),
        num_segments=nrows + 1)
    indptr = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts[:nrows]).astype(jnp.int32)])
    return indptr, ni, nr, nv, nnz


def csr_filter_lanes(A: CsrMatrix, keep) -> CsrMatrix:
    """Device-side entry filter: keep[e] over A's padded entry order ->
    compacted CsrMatrix (the in-place prune of GB_select, sparse form)."""
    keep = jnp.asarray(keep, bool) & (jnp.arange(A.nzmax) < A.nvals)
    indptr, ni, nr, nv, nnz = _filter_jit(
        A.nzmax, A.nrows, A.ncols, A.indices, A.rowids, A.values, keep)
    return CsrMatrix(indptr, ni, nr, nv, int(nnz), A.nrows, A.ncols,
                     A.type)


def csr_tril(A: CsrMatrix, k: int = -1) -> CsrMatrix:
    """Entries on/below diagonal k (GxB_TRIL at CSR scale, no densify)."""
    d = A.indices.astype(jnp.int64) - A.rowids.astype(jnp.int64)
    return csr_filter_lanes(A, d <= k)


def csr_triu(A: CsrMatrix, k: int = 1) -> CsrMatrix:
    """Entries on/above diagonal k (GxB_TRIU at CSR scale)."""
    d = A.indices.astype(jnp.int64) - A.rowids.astype(jnp.int64)
    return csr_filter_lanes(A, d >= k)


def ktruss_esc(A: CsrMatrix, k: int, chunk: int = 1 << 21,
               max_iters: int = 1000) -> Tuple[CsrMatrix, jnp.ndarray,
                                               int]:
    """Sparse k-truss at CSR scale (``ktruss_graphblas.c`` loop):
    support[e] = |N(i) ∩ N(j)| within the truss; prune support < k-2;
    repeat to fixpoint.  Returns (truss CsrMatrix, per-entry supports
    aligned to its padded order, nsteps)."""
    if k < 3:
        raise ValueError("k must be >= 3")
    last = A.nvals
    if last == 0:
        return A, jnp.zeros((A.nzmax,), jnp.int32), 0
    nsteps = 0
    counts = jnp.zeros((A.nzmax,), jnp.int32)
    while nsteps < max_iters:
        nsteps += 1
        counts = masked_pair_counts(A, A, A, chunk)
        keep = counts >= (k - 2)
        B = csr_filter_lanes(A, keep)
        if B.nvals == last:
            # nothing pruned: B's lanes coincide with A's, so the
            # supports just computed are already aligned with B
            return B, counts, nsteps
        A, last = B, B.nvals
        if last == 0:
            return A, jnp.zeros((A.nzmax,), jnp.int32), nsteps
    return A, counts, nsteps


def allktruss_esc(A: CsrMatrix, kmax: Optional[int] = None,
                  chunk: int = 1 << 21) -> dict:
    """All-k-truss sweep at CSR scale (``Extras/ktruss/allktruss.c``):
    k = 3.. until the truss is empty, reusing the (k-1)-truss as the
    next starting point.  Returns {k: {nedges, nsteps, nt}}."""
    out = {}
    C = A
    k = 3
    while kmax is None or k <= kmax:
        C, counts, nsteps = ktruss_esc(C, k, chunk)
        total = int(jnp.sum(counts.astype(jnp.int64)))
        out[k] = {"nedges": C.nvals // 2, "nsteps": nsteps,
                  "nt": total // 6}
        if C.nvals == 0:
            break
        k += 1
    return out
