"""Block-sparse (BSR) masked SpGEMM on the MXU.

The TPU's systolic array wants 128x128 tiles; real graphs want sparsity.
BSR is the meeting point (SURVEY.md §7: "BSR tiling for the MXU"): the
pattern is cut into 128x128 tiles, empty tiles are dropped, and a masked
product C<M> = A ⊕.⊗ B' becomes a *batch of tile matmuls* — one
``int8 x int8 -> int32`` MXU contraction per (I,J,K) tile triple where
A(I,K), B(J,K) and the output mask M(I,J) are all nonempty — followed by
a segment-sum over K.  Work scales with the number of nonempty tile
triples (for banded/clustered graphs, ~linear in n) instead of n³, and
every FLOP lands on the MXU at int8 rate.

This replaces the reference's Gustavson/heap/dot saxpy variants
(``GB_AxB_Gustavson.c``, ``GB_AxB_heap.c``, ``GB_AxB_dot.c``) as the
large-graph masked-SpGEMM engine; the auto-select between this, the
dense-bitmap matmul, and the bitpacked gather path is the analogue of
``GB_AxB_select``'s flop-count heuristic.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tile_pattern", "tile_pattern_from_coo", "tile_matrix",
           "bsr_masked_count", "tricount_bsr", "TilePattern"]

TILE = 128


class TilePattern:
    """Host-built BSR decomposition of a boolean pattern.

    tiles:   [ntiles, T, T] int8 device array (stacked nonempty tiles)
    grid:    [Tm, Tn] bool  (which tiles are nonempty)
    index:   [Tm, Tn] int32 (tile id, or 0 for empty — masked by grid)
    """

    def __init__(self, tiles, grid, index, shape, T=TILE):
        self.tiles = tiles
        self.grid = grid
        self.index = index
        self.shape = shape
        self.T = T

    @property
    def ntiles(self):
        return int(self.tiles.shape[0])


def tile_pattern(pattern: np.ndarray, T: int = TILE) -> TilePattern:
    """Cut an [m, n] bool pattern into its nonempty TxT tiles."""
    pattern = np.asarray(pattern)
    m, n = pattern.shape
    Tm, Tn = -(-m // T), -(-n // T)
    padded = np.zeros((Tm * T, Tn * T), dtype=bool)
    padded[:m, :n] = pattern
    blocks = padded.reshape(Tm, T, Tn, T).transpose(0, 2, 1, 3)
    grid = blocks.any(axis=(2, 3))
    ids = np.nonzero(grid)
    tiles = blocks[ids[0], ids[1]].astype(np.int8)
    index = np.zeros((Tm, Tn), np.int32)
    index[ids] = np.arange(len(ids[0]), dtype=np.int32)
    return TilePattern(jnp.asarray(tiles), grid, index, (m, n), T)


def tile_pattern_from_coo(I, J, shape, T: int = TILE) -> TilePattern:
    """BSR decomposition straight from an edge list — no dense [m, n]
    intermediate, so it scales to graphs whose dense pattern would not
    fit host memory.  Only nonempty tiles are materialized."""
    I = np.asarray(I, np.int64)
    J = np.asarray(J, np.int64)
    m, n = shape
    Tm, Tn = -(-m // T), -(-n // T)
    ti, tj = I // T, J // T
    tid = ti * Tn + tj
    order = np.argsort(tid, kind="stable")
    tid_s = tid[order]
    uniq, starts = np.unique(tid_s, return_index=True)
    ntiles = len(uniq)
    tiles = np.zeros((ntiles, T, T), np.int8)
    # scatter each edge's (local row, local col) bit into its tile slot
    slot_of = np.zeros(Tm * Tn, np.int64)
    slot_of[uniq] = np.arange(ntiles)
    li = (I % T)[order]
    lj = (J % T)[order]
    tiles[slot_of[tid_s], li, lj] = 1
    grid = np.zeros((Tm, Tn), bool)
    grid[uniq // Tn, uniq % Tn] = True
    index = np.zeros((Tm, Tn), np.int32)
    index[uniq // Tn, uniq % Tn] = np.arange(ntiles, dtype=np.int32)
    return TilePattern(jnp.asarray(tiles), grid, index, (m, n), T)


def tile_matrix(values: np.ndarray, pattern: np.ndarray, T: int = TILE,
                dtype=np.float32) -> TilePattern:
    """Cut an [m, n] value matrix (zeros at absent positions) into its
    pattern-nonempty TxT value tiles — the BSR value form for general
    semirings on the MXU."""
    pattern = np.asarray(pattern)
    values = np.asarray(values)
    m, n = pattern.shape
    Tm, Tn = -(-m // T), -(-n // T)
    ppad = np.zeros((Tm * T, Tn * T), dtype=bool)
    ppad[:m, :n] = pattern
    vpad = np.zeros((Tm * T, Tn * T), dtype=dtype)
    vpad[:m, :n] = np.where(pattern, values, 0).astype(dtype)
    pblocks = ppad.reshape(Tm, T, Tn, T).transpose(0, 2, 1, 3)
    vblocks = vpad.reshape(Tm, T, Tn, T).transpose(0, 2, 1, 3)
    grid = pblocks.any(axis=(2, 3))
    ids = np.nonzero(grid)
    tiles = vblocks[ids[0], ids[1]]
    index = np.zeros((Tm, Tn), np.int32)
    index[ids] = np.arange(len(ids[0]), dtype=np.int32)
    return TilePattern(jnp.asarray(tiles), grid, index, (m, n), T)


@partial(jax.jit, static_argnums=(5,))
def _bsr_count_kernel(Atiles, Btiles, ta, tb, outid, nout):
    """C_out[outid[t]] += A_tile[ta[t]] @ B_tile[tb[t]]^T, int8 MXU."""
    La = jnp.take(Atiles, ta, axis=0)            # [nt, T, T] int8
    Ub = jnp.take(Btiles, tb, axis=0)
    prod = jax.lax.dot_general(
        La, Ub, (((2,), (2,)), ((0,), (0,))),     # contract k, batch t
        preferred_element_type=jnp.int32)         # [nt, T, T]
    return jax.ops.segment_sum(prod, outid, num_segments=nout)


def bsr_masked_count(Mp: TilePattern, Ap: TilePattern, Bp: TilePattern
                     ) -> Tuple[jnp.ndarray, np.ndarray]:
    """Ctiles[t] = (A · B')[tile t of M's nonempty grid], counting
    semiring (PLUS_LAND on 0/1).  Returns (Ctiles [nout,T,T] int32,
    out tile coordinates [nout, 2])."""
    ga, gb, gm = Ap.grid, Bp.grid, Mp.grid
    # triples (I,J,K): M(I,J) & A(I,K) & B(J,K)   (host, tiny arrays)
    trip = gm[:, :, None] & ga[:, None, :] & gb[None, :, :]
    I, J, K = np.nonzero(trip)
    outs = np.nonzero(gm)
    out_index = np.zeros(gm.shape, np.int32)
    out_index[outs] = np.arange(len(outs[0]), dtype=np.int32)
    nout = len(outs[0])
    if len(I) == 0:
        T = Ap.T
        return jnp.zeros((nout, T, T), jnp.int32), np.stack(outs, 1)
    ta = jnp.asarray(Ap.index[I, K], jnp.int32)
    tb = jnp.asarray(Bp.index[J, K], jnp.int32)
    oid = jnp.asarray(out_index[I, J], jnp.int32)
    C = _bsr_count_kernel(Ap.tiles, Bp.tiles, ta, tb, oid, nout)
    return C, np.stack(outs, 1)


@jax.jit
def _masked_total(Ctiles, Mtiles):
    return jnp.sum(jnp.where(Mtiles != 0, Ctiles, 0))


def tricount_bsr(Lp: np.ndarray, Up: np.ndarray, T: int = TILE) -> int:
    """SandiaDot triangle count on the BSR path:
    ntri = sum((L · U') .* L) with tile-triple MXU matmuls."""
    Lt = tile_pattern(Lp, T)
    Ut = tile_pattern(Up, T)
    C, outs = bsr_masked_count(Lt, Lt, Ut)
    # mask tiles = L's nonempty tiles in the same order as C
    Mtiles = jnp.take(Lt.tiles, jnp.asarray(
        Lt.index[outs[:, 0], outs[:, 1]], jnp.int32), axis=0)
    return int(np.asarray(_masked_total(C, Mtiles)))
