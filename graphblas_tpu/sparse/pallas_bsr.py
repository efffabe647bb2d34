"""Pallas BSR masked-SpGEMM kernel.

The jnp version in :mod:`bsr` materializes every (I,J,K) tile product in
HBM before the segment-sum.  This kernel keeps the accumulator tile in
VMEM across the K-loop — the VMEM-resident accumulator is this design's
answer to the reference's Sauna gather/scatter workspace
(``GB_AxB_Gustavson.c``; SURVEY §7 "Sauna -> Pallas VMEM scratch") — and
fuses the output mask in-register, so HBM traffic is one read per
consumed input tile + one write per output tile.

Grid: (output tile, K-slot).  Tile indices are scalar-prefetched so the
pipeline can DMA the right A/B tiles ahead of compute
(``pltpu.PrefetchScalarGridSpec``).  Accumulation dtype is int32 from
int8 0/1 tiles — the MXU's native int8 path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsr import TILE, TilePattern, tile_matrix, tile_pattern

__all__ = ["bsr_masked_mm_pallas", "bsr_masked_count_pallas",
           "tricount_bsr_pallas", "masked_mxm"]


def _kernel(starts_ref, ta_ref, tb_ref, a_ref, b_ref, m_ref, out_ref):
    o = pl.program_id(0)
    k = pl.program_id(1)
    kmax = pl.num_programs(1)
    count = starts_ref[o + 1] - starts_ref[o]

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(k < count)
    def _():
        # C(I,J) += A(I,K) @ B(J,K)^T — one MXU contraction; the
        # accumulator dtype follows the output block (int32 from int8
        # counting tiles, f32 from value tiles).  HIGHEST keeps f32
        # operands on true-f32 MXU passes instead of one bf16 pass —
        # GraphBLAS results must match the reference within f32 roundoff.
        prec = (jax.lax.Precision.HIGHEST
                if jnp.issubdtype(out_ref.dtype, jnp.floating)
                else jax.lax.Precision.DEFAULT)
        prod = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=out_ref.dtype, precision=prec)
        out_ref[0] += prod

    @pl.when(k == kmax - 1)
    def _():
        # fuse the structural mask: zero outside M's tile pattern
        out_ref[0] = out_ref[0] * (m_ref[0] != 0).astype(out_ref.dtype)


@partial(jax.jit, static_argnums=(6, 7, 8))
def _launch(starts, ta, tb, Atiles, Btiles, Mtiles, kmax: int,
            interpret: bool, acc_dtype=jnp.int32):
    nout = Mtiles.shape[0]
    T = Atiles.shape[1]

    def amap(o, k, starts, ta, tb):
        z = jnp.zeros((), jnp.int32)
        slot = jnp.minimum(starts[o] + k, jnp.int32(ta.shape[0] - 1))
        return (ta[slot], z, z)

    def bmap(o, k, starts, ta, tb):
        z = jnp.zeros((), jnp.int32)
        slot = jnp.minimum(starts[o] + k, jnp.int32(tb.shape[0] - 1))
        return (tb[slot], z, z)

    def omap(o, k, s, a, b):
        z = jnp.zeros((), jnp.int32)
        return (o, z, z)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nout, kmax),
        in_specs=[
            pl.BlockSpec((1, T, T), amap),
            pl.BlockSpec((1, T, T), bmap),
            pl.BlockSpec((1, T, T), omap),
        ],
        out_specs=pl.BlockSpec((1, T, T), omap),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nout, T, T), acc_dtype),
        interpret=interpret,
    )(starts, ta, tb, Atiles, Btiles, Mtiles)


def build_schedule(Mp: TilePattern, Ap: TilePattern, Bp: TilePattern):
    """Host-side tile-triple schedule for the kernel: returns
    (starts, ta, tb, Mtiles, kmax, outs) or None when there is no work.
    Shared by :func:`bsr_masked_mm_pallas` and kernel-only benchmarks."""
    ga, gb, gm = Ap.grid, Bp.grid, Mp.grid
    trip = gm[:, :, None] & ga[:, None, :] & gb[None, :, :]
    I, J, K = np.nonzero(trip)
    outs = np.nonzero(gm)
    nout = len(outs[0])
    if len(I) == 0 or nout == 0:
        return None
    out_index = np.zeros(gm.shape, np.int32)
    out_index[outs] = np.arange(nout, dtype=np.int32)
    oid = out_index[I, J]
    order = np.argsort(oid, kind="stable")
    oid, I, J, K = oid[order], I[order], J[order], K[order]
    counts = np.bincount(oid, minlength=nout)
    starts = np.zeros(nout + 1, np.int32)
    starts[1:] = np.cumsum(counts)
    kmax = int(counts.max())
    ta = jnp.asarray(Ap.index[I, K], jnp.int32)
    tb = jnp.asarray(Bp.index[J, K], jnp.int32)
    Mtiles = jnp.take(
        Mp.tiles, jnp.asarray(Mp.index[outs[0], outs[1]], jnp.int32),
        axis=0)
    return (jnp.asarray(starts), ta, tb, Mtiles, kmax,
            np.stack(outs, 1))


def bsr_masked_mm_pallas(Mp: Optional[TilePattern], Ap: TilePattern,
                         Bp: TilePattern, acc_dtype=jnp.int32,
                         interpret: bool = None
                         ) -> Tuple[jnp.ndarray, np.ndarray]:
    """General Pallas BSR product C<M> = A · B' over M's nonempty
    tiles.  With int8 0/1 tiles this is the counting (PLUS_LAND)
    semiring; with value tiles and ``acc_dtype=f32`` it is PLUS_TIMES —
    the general large-graph masked mxm engine.

    ``Mp=None`` computes the UNMASKED product: the output tile grid is
    the boolean product of A's and B's tile grids (a sound upper bound
    on C's structure — the symbolic phase at tile granularity), and the
    in-kernel mask multiply uses a single shared all-ones tile."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if Mp is None:
        grid_out = np.einsum("ik,jk->ij", Ap.grid, Bp.grid) > 0
        ones = jnp.ones((1, Ap.T, Ap.T), jnp.int8)
        index = np.zeros(grid_out.shape, np.int32)  # every tile -> slot 0
        Mp = TilePattern(ones, grid_out, index, (
            grid_out.shape[0] * Ap.T, grid_out.shape[1] * Ap.T), Ap.T)
    sched = build_schedule(Mp, Ap, Bp)
    if sched is None:
        outs = np.nonzero(Mp.grid)
        T = Ap.T
        return (jnp.zeros((len(outs[0]), T, T), acc_dtype),
                np.stack(outs, 1))
    starts, ta, tb, Mtiles, kmax, outs = sched
    C = _launch(starts, ta, tb, Ap.tiles, Bp.tiles, Mtiles,
                kmax, interpret, acc_dtype)
    return C, outs


def bsr_masked_count_pallas(Mp: TilePattern, Ap: TilePattern,
                            Bp: TilePattern,
                            interpret: bool = None
                            ) -> Tuple[jnp.ndarray, np.ndarray]:
    """Counting form of :func:`bsr_masked_mm_pallas` (PLUS_LAND)."""
    return bsr_masked_mm_pallas(Mp, Ap, Bp, jnp.int32, interpret)


def tricount_bsr_pallas(Lp: np.ndarray, Up: np.ndarray,
                        T: int = TILE, interpret: bool = None) -> int:
    """SandiaDot triangle count via the Pallas BSR kernel."""
    Lt = tile_pattern(Lp, T)
    Ut = tile_pattern(Up, T)
    C, _ = bsr_masked_count_pallas(Lt, Lt, Ut, interpret=interpret)
    return int(np.asarray(jnp.sum(C)))


def masked_mxm(M, A, B, semiring=None, T: int = TILE,
               interpret: bool = None):
    """High-level large-graph mxm: C<M> = A (+.x) B through the Pallas
    BSR engine, auto-selected per the flop model.

    M/A/B: bitmap Matrix or CsrMatrix; ``M=None`` computes the unmasked
    product (output structure bounded by the tile-grid product).
    PLUS_TIMES (float) uses value tiles; boolean/counting semirings use
    int8 pattern tiles.  Returns a bitmap Matrix on the exact structure
    of the product intersected with the mask.
    """
    from ..core.matrix import Matrix, np_bool
    from ..core.types import FP32, INT32
    from .container import CsrMatrix
    from ..ops.flopcount import record_axb_method

    def to_np(X):
        if isinstance(X, CsrMatrix):
            X = X.to_matrix()
        X = X.wait()
        return (np.asarray(jax.device_get(X.values)) if not X.type.is_udt
                else None), np_bool(X.pattern), X.type

    Av, Apat, At = to_np(A)
    Bv, Bpat, Bt = to_np(B)
    # dispatch: which algebra does the tile engine run?
    #   None           -> structural pair counts (INT32)
    #   PLUS_PAIR      -> structural pair counts (INT32)
    #   PLUS_LAND      -> truthy pair counts (INT32)
    #   LOR_LAND       -> truthy reachability (BOOL)
    #   PLUS_TIMES     -> float product (FP32)
    # anything else is not tile-expressible here — raise rather than
    # silently computing a different semiring (use gb.mxm instead).
    if semiring is None:
        mode = "count_structural"
    else:
        pair = (semiring.add.op.name, semiring.mult.name)
        if semiring.ztype.is_bool:
            # boolean renames (GB_boolean_rename): PLUS≡MAX≡LOR,
            # TIMES≡MIN≡LAND on bool
            ren = {"PLUS": "LOR", "MAX": "LOR", "TIMES": "LAND",
                   "MIN": "LAND"}
            pair = (ren.get(pair[0], pair[0]), ren.get(pair[1], pair[1]))
        if pair == ("PLUS", "TIMES"):
            mode = "values"
        elif pair == ("PLUS", "PAIR"):
            mode = "count_structural"
        elif pair == ("PLUS", "LAND"):
            mode = "count_truthy"
        elif pair in (("LOR", "LAND"), ("LOR", "PAIR")):
            mode = "bool"
        else:
            raise NotImplementedError(
                f"semiring {pair} is not expressible on the BSR tile "
                f"engine; use gb.mxm (bitmap backend) instead")
    # keep the structural pattern for the output (GraphBLAS: the result
    # pattern is the structural product, even when values reduce over
    # truthy pairs only)
    Apat_struct, Bpat_struct = Apat, Bpat
    if mode in ("count_truthy", "bool") and Av is not None:
        Apat = Apat & (Av != 0)
        Bpat = Bpat & (Bv != 0)
    Apt = tile_pattern(Apat, T)
    Bpt = tile_pattern(Bpat.T, T)
    Apt_s = (Apt if Apat is Apat_struct
             else tile_pattern(Apat_struct, T))
    Bpt_s = (Bpt if Bpat is Bpat_struct
             else tile_pattern(Bpat_struct.T, T))
    if M is None:
        Mpat = np.ones((Apat.shape[0], Bpat.shape[1]), bool)
        grid_out = np.einsum("ik,jk->ij", Apt_s.grid, Bpt_s.grid) > 0
        ones = jnp.ones((1, T, T), jnp.int8)
        Mt_tiles = TilePattern(
            ones, grid_out, np.zeros(grid_out.shape, np.int32),
            (grid_out.shape[0] * T, grid_out.shape[1] * T), T)
    else:
        Mv, Mpat, _ = to_np(M)
        Mt_tiles = tile_pattern(Mpat, T)
    # structural pattern of T = positions with >= 1 contributing pair of
    # PRESENT entries (keeps explicit-zero vs absent parity: the result
    # pattern is M ∩ structural-pattern(A·B'), even when the values
    # reduce over truthy pairs only)
    Cnt_s, outs = bsr_masked_mm_pallas(Mt_tiles, Apt_s, Bpt_s, jnp.int32,
                                       interpret)
    if mode == "values":
        # value tiles run at f32 on the MXU; silently computing an FP64
        # PLUS_TIMES at f32 would break the "match the reference within
        # roundoff" policy, so route f64 callers to gb.mxm (which
        # accumulates in f64) instead of degrading precision
        if any(t is not None and np.dtype(t.dtype) == np.float64
               for t in (At, Bt)) or (
                semiring is not None
                and np.dtype(semiring.ztype.dtype) == np.float64):
            raise TypeError(
                "BSR value tiles compute at f32 precision; FP64 "
                "PLUS_TIMES must go through gb.mxm (f64 accumulation)")
        Ap = tile_matrix(Av, Apat, T, np.float32)
        Bp = tile_matrix(Bv.T, Bpat.T, T, np.float32)
        C, outs = bsr_masked_mm_pallas(Mt_tiles, Ap, Bp, jnp.float32,
                                       interpret)
        out_t = FP32
        record_axb_method("pallas:bsr_values")
    elif mode == "count_structural":
        C = Cnt_s
        out_t = INT32
        record_axb_method("pallas:bsr_count")
    else:  # count_truthy / bool: counts over truthy pairs
        C, outs = bsr_masked_mm_pallas(Mt_tiles, Apt, Bpt, jnp.int32,
                                       interpret)
        out_t = INT32
        record_axb_method("pallas:bsr_count")
    # reassemble the bitmap result on M ∩ structure(A·B')
    from ..core.types import BOOL
    m, n = Mpat.shape
    Cnp = np.asarray(C)
    Cntp = np.asarray(Cnt_s)
    Tm = Mt_tiles.grid.shape[0] * T
    Tn = Mt_tiles.grid.shape[1] * T
    Cn = np.zeros((Tm, Tn), Cnp.dtype)
    Sp = np.zeros((Tm, Tn), bool)
    for t_, (I, J) in enumerate(outs):
        Cn[I * T:(I + 1) * T, J * T:(J + 1) * T] = Cnp[t_]
        Sp[I * T:(I + 1) * T, J * T:(J + 1) * T] = Cntp[t_] > 0
    Cn = Cn[:m, :n]
    pat = Mpat & Sp[:m, :n]
    if mode == "bool":
        return Matrix(jnp.asarray(pat & (Cn > 0)), jnp.asarray(pat), BOOL)
    return Matrix(jnp.asarray(np.where(pat, Cn, 0)),
                  jnp.asarray(pat), out_t)
