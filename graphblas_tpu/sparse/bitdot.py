"""Bitpacked dot-panel masked SpGEMM: structure-independent counting
on ANY graph shape (the power-law engine).

The sort-merge engine (:mod:`tri`) costs one sorted key per wedge; on
power-law graphs the wedge count concentrates on a few thousand heavy
wedge-middle columns k (measured scale-18 R-MAT: the top 32 K of 262 K
columns carry 97% of all wedges).  This engine splits the contraction
dimension by measured wedge weight:

* **heavy k** (top ``kcut`` columns by ``indeg_A(k) * deg_B(k)``): the
  membership of each selected k in A's rows and B's columns is packed
  into per-row **bitmaps** of ``W = kcut/32`` uint32 words.  The masked
  dot for mask entry (i, j) over the heavy slab is then

      counts[i,j] = popcount( Apack[i, :] & Bpack[j, :] )

  — two W-word row gathers + AND + popcount, fused by XLA into one
  HBM-bandwidth-bound pass (measured 100-130 GB/s on v5e, i.e. 16-38 M
  mask edges/s at W=1024..128, *independent of graph structure*).

* **light k** (the residual): the remaining A entries go through the
  sort-merge engine, whose lane count is now only the uncovered wedge
  fraction (3% at scale 18).

This is the TPU answer to the reference's any-pattern masked dot
(``GB_AxB_dot.c:10-27``, ``Template/GB_AxB_dot_mask.c``): the reference
walks each mask entry's two sparse lists; here the heavy lists become
constant-width bitmap rows so the chip streams them at memory speed,
and only the provably-light residual pays per-wedge work.

Semantics: PLUS_PAIR over the pattern — identical to
:func:`tri.masked_pair_counts` (counts aligned with M's padded CSR
entry order) and exact (integer popcounts + integer lanes).
"""

from __future__ import annotations

import weakref
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .container import CsrMatrix

__all__ = ["BitdotPlan", "build_bitdot_plan", "bitdot_counts",
           "masked_pair_counts_auto"]

#: per-dispatch mask-edge chunk is sized so the two gathered (chunk, W)
#: uint32 panels stay under ~1 GB even if XLA materializes them
_CHUNK_WORDS = 1 << 27

#: peak panel memory budget (cached level-1 pair + one transient
#: extra-level pair coexist), bytes; override with GBTPU_BITDOT_BUDGET
import os as _os
_PANEL_BUDGET = int(_os.environ.get("GBTPU_BITDOT_BUDGET", 8 << 30))

#: don't bother packing unless the heavy slab covers this wedge share
_MIN_COVER = 0.30

#: below this many wedges the sort-merge engine is a single cheap
#: dispatch and the panel build isn't worth it
_MIN_LANES = 1 << 22

#: stop adding bitmap levels once the residual is below this (one
#: cheap sort dispatch)
_MIN_LEVEL_REM = 1 << 25

#: a level must cover at least this many wedges to pay for its own
#: transient build + gather pass
_MIN_LEVEL_COVER = 1 << 24


class PackLevel(NamedTuple):
    """A transient bitmap slab (levels 2+): the selected entries are
    stored compactly and the (m, W)/(n, W) panels are built, used, and
    freed inside each counts call — multi-level slabs reach deep into
    the wedge-weight tail without holding more than one panel pair in
    HBM (the level-1 pair, which IS cached)."""
    W: int
    a_rows: jnp.ndarray       # compact A entries with k in this slab
    a_slots: jnp.ndarray
    b_js: jnp.ndarray         # compact B entries with k in this slab
    b_slots: jnp.ndarray
    covered: int              # wedges this slab handles


class BitdotPlan(NamedTuple):
    Apack: jnp.ndarray        # (m, W) uint32 — bit s set iff (i, ksel[s]) in A
    Bpack: jnp.ndarray        # (n, W) uint32 — bit s set iff (ksel[s], j) in B
    A_light: CsrMatrix        # residual A entries (k in NO slab)
    W: int                    # words per row (level 1)
    kcut: int                 # selected columns, all levels
    covered_lanes: int        # wedges handled by all bitmap levels
    light_lanes: int          # wedges left for the sort-merge engine
    levels: tuple = ()        # PackLevel slabs 2+

    @property
    def panel_bytes(self) -> int:
        return self.Apack.nbytes + self.Bpack.nbytes


def _host_cols_rows(X: CsrMatrix):
    """(rowids, indices) of live entries as host arrays (host_pattern
    when present, one device pull otherwise)."""
    hp = X._options.get("host_pattern")
    if hp is not None:
        return (np.asarray(hp[0][:X.nvals]), np.asarray(hp[1][:X.nvals]))
    return (np.asarray(X.rowids[:X.nvals]), np.asarray(X.indices[:X.nvals]))


@partial(jax.jit, static_argnums=(0, 1))
def _pack_jit(nrows: int, W: int, rows, slots, live):
    """Scatter bits (1 << (slot & 31)) into word rows*W + slot>>5.
    Every live (row, slot) pair is unique, so add == bitwise-or."""
    word = (rows.astype(jnp.int64) * W
            + jnp.right_shift(slots, 5).astype(jnp.int64))
    bit = jnp.left_shift(jnp.uint32(1),
                         (slots & 31).astype(jnp.uint32))
    word = jnp.where(live & (slots >= 0), word, nrows * W)
    return (jnp.zeros((nrows * W + 1,), jnp.uint32)
            .at[word].add(jnp.where(live & (slots >= 0), bit, 0),
                          mode="drop")[:nrows * W]
            .reshape(nrows, W))


def build_bitdot_plan(M: CsrMatrix, A: CsrMatrix, B: CsrMatrix,
                      budget_bytes: Optional[int] = None,
                      cover_target: float = 0.995,
                      min_lanes: Optional[int] = None,
                      max_levels: int = 24,
                      ) -> Optional[BitdotPlan]:
    """Host-side plan for counts[e] = (A.B)[i_e, j_e] over PLUS_PAIR.

    Selects the heavy contraction columns by exact wedge weight
    ``indeg_A(k) * deg_B(k)`` (the per-column flop count of
    ``GB_AxB_flopcount.c``) into up to ``max_levels`` bitmap slabs —
    the first is packed now and cached, the rest are stored as compact
    entry lists and packed transiently per call — and compacts the
    residual A entries for the sort-merge engine.  Returns None when
    the bitmaps can't cover enough wedges to pay.
    """
    from .esc import _bucket
    # late-bind the tunables so monkeypatched module globals (tests)
    # and env overrides take effect at call time, not def time
    if budget_bytes is None:
        budget_bytes = _PANEL_BUDGET
    if min_lanes is None:
        min_lanes = _MIN_LANES
    m, kk = A.shape
    n = B.ncols
    if A.nvals == 0 or B.nvals == 0 or M.nvals == 0:
        return None
    a_rows, a_cols = _host_cols_rows(A)
    b_rows, b_cols = _host_cols_rows(B)
    indegA = np.bincount(a_cols, minlength=kk).astype(np.int64)
    degB = np.bincount(b_rows, minlength=kk).astype(np.int64)
    score = indegA * degB
    total = int(score.sum())
    if total < min_lanes:
        return None
    order = np.argsort(score)[::-1]
    csum = np.cumsum(score[order])
    nnzk = int((score > 0).sum())
    kneed = int(np.searchsorted(csum, cover_target * total)) + 1
    kneed = min(kneed, nnzk)
    # level 1 is cached across calls; extra levels are transient but
    # coexist with it at peak — split the budget between the two
    wmax_mem = (budget_bytes // 2) // (4 * (m + n))
    if wmax_mem < 8:
        return None          # even W=8 panels would blow the budget
    W = min((kneed + 31) // 32, wmax_mem)
    W = max(W, 1)
    # round W to a multiple of 8 (256-bit rows) for clean layout
    W = ((W + 7) // 8) * 8
    W = min(W, wmax_mem) if wmax_mem >= 8 else W
    kcut = min(32 * W, nnzk)

    # ---- plan ALL slabs on the host first, then gate on the TOTAL
    # coverage (at huge n the per-level W is small, but many cheap
    # levels still reach deep into the tail — round-4 scale-22 fix:
    # gating on level 1 alone refused the whole engine) ----
    wl_max = (budget_bytes - 4 * W * (m + n)) // (4 * (m + n))
    wl_max = (wl_max // 8) * 8
    level_cuts = []
    sel_end = kcut
    while (wl_max >= 8 and len(level_cuts) + 1 < max_levels
           and sel_end < nnzk):
        rem = total - int(csum[sel_end - 1])
        if rem <= max(min_lanes, _MIN_LEVEL_REM):
            break
        kcut_l = min(32 * wl_max, nnzk - sel_end)
        cov_l = int(csum[sel_end + kcut_l - 1]) - int(csum[sel_end - 1])
        # a level pays when it removes more sort work than its own
        # build+pass (absolute floor ~2^24 lanes)
        if (cov_l < max(_MIN_LEVEL_COVER, 0.05 * rem)
                and rem - cov_l > _MIN_LEVEL_REM):
            break
        level_cuts.append((sel_end, kcut_l, cov_l))
        sel_end += kcut_l
    covered_all = int(csum[sel_end - 1])
    if covered_all < _MIN_COVER * total:
        return None

    ksel = order[:kcut]
    pos = np.full(kk, -1, np.int32)
    pos[ksel] = np.arange(kcut, dtype=np.int32)
    pos_dev = jnp.asarray(pos)

    a_live = jnp.arange(A.nzmax) < A.nvals
    a_slot = pos_dev[jnp.clip(A.indices, 0, kk - 1)]
    Apack = _pack_jit(m, W, A.rowids, a_slot, a_live)
    b_live = jnp.arange(B.nzmax) < B.nvals
    b_slot = pos_dev[jnp.clip(B.rowids, 0, kk - 1)]
    Bpack = _pack_jit(n, W, B.indices, b_slot, b_live)

    levels = []
    for ls, kcut_l, cov_l in level_cuts:
        ksel_l = order[ls:ls + kcut_l]
        pos_l = np.full(kk, -1, np.int32)
        pos_l[ksel_l] = np.arange(kcut_l, dtype=np.int32)
        am = pos_l[a_cols] >= 0
        bm = pos_l[b_rows] >= 0
        na, nb = int(am.sum()), int(bm.sum())
        ca, cb = _bucket(max(na, 8), 128), _bucket(max(nb, 8), 128)
        ar = np.zeros(ca, np.int32); ar[:na] = a_rows[am]
        asl = np.full(ca, -1, np.int32); asl[:na] = pos_l[a_cols[am]]
        bj = np.zeros(cb, np.int32); bj[:nb] = b_cols[bm]
        bsl = np.full(cb, -1, np.int32); bsl[:nb] = pos_l[b_rows[bm]]
        Wl = (kcut_l + 31) // 32
        Wl = ((Wl + 7) // 8) * 8
        levels.append(PackLevel(Wl, jnp.asarray(ar), jnp.asarray(asl),
                                jnp.asarray(bj), jnp.asarray(bsl),
                                cov_l))
    kcut_all = sel_end
    sel_any = np.zeros(kk, bool)
    sel_any[order[:sel_end]] = True
    keep = np.zeros(A.nzmax, bool)
    keep[:A.nvals] = ~sel_any[a_cols]
    from .tri import csr_filter_lanes
    A_light = _shrink(csr_filter_lanes(A, jnp.asarray(keep)))
    # hand the residual its host pattern (same order as the device
    # compaction) so the sort-merge engine can row-slice the mask
    lk = keep[:A.nvals]
    A_light._options["host_pattern"] = (a_rows[lk], a_cols[lk])
    return BitdotPlan(Apack, Bpack, A_light, W, kcut_all,
                      covered_all, total - covered_all, tuple(levels))


def _shrink(X: CsrMatrix) -> CsrMatrix:
    """Cut a compacted matrix's padded capacity down to its nnz bucket
    so downstream per-entry stages don't pay for the original size."""
    from .esc import _bucket
    cap = _bucket(max(X.nvals, 8), 128)
    if cap >= X.nzmax:
        return X
    vals = jax.tree_util.tree_map(lambda v: v[:cap], X.values)
    return CsrMatrix(X.indptr, X.indices[:cap], X.rowids[:cap], vals,
                     X.nvals, X.nrows, X.ncols, X.type)


@partial(jax.jit, static_argnums=(0, 1))
def _bitdot_jit(nchunk: int, chunk: int, Apack, Bpack, rowids, indices,
                nvals):
    """popcount(Apack[i] & Bpack[j]) per mask entry, streamed in
    bounded-memory chunks via lax.map (ONE program per call)."""
    m = Apack.shape[0]
    n = Bpack.shape[0]
    E = nchunk * chunk
    t = jnp.arange(E, dtype=jnp.int32)
    live = t < nvals
    ii = jnp.where(live, jnp.pad(rowids, (0, E - rowids.shape[0]))[:E]
                   .astype(jnp.int32), 0)
    jj = jnp.where(live, jnp.pad(indices, (0, E - indices.shape[0]))[:E]
                   .astype(jnp.int32), 0)
    ii = jnp.clip(ii, 0, m - 1).reshape(nchunk, chunk)
    jj = jnp.clip(jj, 0, n - 1).reshape(nchunk, chunk)

    def body(args):
        i, j = args
        a = jnp.take(Apack, i, axis=0)
        b = jnp.take(Bpack, j, axis=0)
        c = jax.lax.population_count(a & b).astype(jnp.int32)
        return jnp.sum(c, axis=1, dtype=jnp.int32)

    out = jax.lax.map(body, (ii, jj)).reshape(E)
    return jnp.where(live, out, 0)


def _bitdot_pass(Apack, Bpack, M: CsrMatrix) -> jnp.ndarray:
    """One gather+AND+popcount pass of a packed slab pair over M."""
    from .esc import _bucket
    E = M.nzmax
    W = Apack.shape[1]
    chunk = max(1 << 12, min(_bucket(E, 1 << 12),
                             _CHUNK_WORDS // max(W, 1)))
    nchunk = (E + chunk - 1) // chunk
    return _bitdot_jit(nchunk, chunk, Apack, Bpack,
                       M.rowids, M.indices, M.nvals)[:E]


def bitdot_counts(plan: BitdotPlan, M: CsrMatrix) -> jnp.ndarray:
    """Heavy-slab counts per M padded entry: the cached level-1 panels
    plus one transient build+pass per extra slab (panels freed as soon
    as the pass is enqueued — peak HBM is one extra pair)."""
    counts = _bitdot_pass(plan.Apack, plan.Bpack, M)
    m = plan.Apack.shape[0]
    n = plan.Bpack.shape[0]
    # large transient panels must not pile up: dispatch is async, so
    # without a drain every level's pair would be live at once (OOM at
    # scale 22).  One scalar pull per level is the FIFO barrier.
    big = 4 * (m + n) * max((lv.W for lv in plan.levels), default=0)
    sync_each = big > (1 << 29)
    for lv in plan.levels:
        Ap = _pack_jit(m, lv.W, lv.a_rows, lv.a_slots, lv.a_slots >= 0)
        Bp = _pack_jit(n, lv.W, lv.b_js, lv.b_slots, lv.b_slots >= 0)
        counts = counts + _bitdot_pass(Ap, Bp, M)
        del Ap, Bp
        if sync_each:
            jax.device_get(counts[0])      # drain the pipeline
    return counts


_NO_PLAN = object()   # cached "don't pack" decision


def _ref(x):
    try:
        return weakref.ref(x)
    except TypeError:                    # buffer type not weakref-able
        return lambda: x


def _auto_budget() -> int:
    """Panel budget bounded by what the device actually has free —
    a fixed budget OOMs when containers/workspace already hold
    several GB (k-truss at scale: the symmetric mask + per-iteration
    rebuilds).  Falls back to the static budget off-TPU."""
    try:
        st = jax.local_devices()[0].memory_stats()
        free = int(st["bytes_limit"]) - int(st["bytes_in_use"])
        # leave room for the sort workspace (~2.7 GB at the lane cap)
        # and transient gather chunks
        return max(min(_PANEL_BUDGET, int(free * 0.5)), 1 << 28)
    except Exception:
        return _PANEL_BUDGET


def _cached_plan(M: CsrMatrix, A: CsrMatrix, B: CsrMatrix,
                 budget_bytes: Optional[int] = None
                 ) -> Optional[BitdotPlan]:
    """Per-(M, A, B) pattern plan cache, stored on M like the ESC plan
    cache (``esc.py``): the panels depend only on the operand patterns,
    so repeated calls (bench loops, PageRank-style iteration) skip the
    host selection + pack scatters entirely."""
    entry = M._options.get("bitdot_plan")
    if entry is not None:
        ra, rb, plan = entry
        if ra() is A.indices and rb() is B.indices:
            return None if plan is _NO_PLAN else plan
    if budget_bytes is None:
        budget_bytes = _auto_budget()
    plan = build_bitdot_plan(M, A, B, budget_bytes=budget_bytes)
    M._options["bitdot_plan"] = (_ref(A.indices), _ref(B.indices),
                                 _NO_PLAN if plan is None else plan)
    return plan


def masked_pair_counts_auto(M: CsrMatrix, A: CsrMatrix, B: CsrMatrix,
                            chunk: Optional[int] = None,
                            budget_bytes: Optional[int] = None
                            ) -> jnp.ndarray:
    """counts[e] = (A.B)[i_e, j_e] over PLUS_PAIR, with automatic
    heavy/light splitting (the GB_AxB_select analogue for counting):
    bitmaps for the heavy wedge-middle columns, sort-merge for the
    residual.  Falls back to the pure sort-merge engine when the
    bitmaps can't pay (small graphs, flat wedge profiles)."""
    from .tri import masked_pair_counts, _LANE_CAP
    from ..ops.flopcount import record_axb_method
    kw = {} if chunk is None else {"chunk": chunk}
    plan = _cached_plan(M, A, B, budget_bytes)
    if plan is None:
        counts = masked_pair_counts(M, A, B, **kw)
        record_axb_method("tri:sort_merge")
        return counts
    heavy = bitdot_counts(plan, M)
    if plan.light_lanes == 0 or plan.A_light.nvals == 0:
        record_axb_method("bitdot:full")
        return heavy
    light = masked_pair_counts(M, plan.A_light, B, **kw)
    record_axb_method("bitdot:hybrid")
    return heavy + light
