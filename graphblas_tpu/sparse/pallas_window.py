"""Pallas fused window-panel masked product.

One grid step per 128-row block: DMA the P/Q/M panels, ONE wide MXU
contraction (128, W*128) @ (W*128, nJ*128), in-register mask multiply,
and either a per-block masked-count partial (tricount: no dense output
ever touches HBM) or the masked tile panel (general engine).  The XLA
einsum version of the same product (:mod:`window`) round-trips the
(nI, 128, nJ*128) int32 product through HBM and runs ~250 GB/s
effective; this kernel is DMA-bound on the operand panels alone
(measured numbers in PERF.md round 3).

The VMEM-resident accumulator + fused mask is the same Sauna-analogue
design as :mod:`pallas_bsr`; the difference is the schedule: banded /
clustered graphs collapse the (I,J,K) tile-triple combinatorics into
one dense contraction per block-row (see :mod:`window` for the plan).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window import WindowPlan

__all__ = ["window_count_partials", "window_masked_mm_pallas"]


def _Z():
    # x64 mode turns literal-0 block indices into i64, which Mosaic
    # rejects at func.return — same workaround as pallas_bsr's amap
    return jnp.zeros((), jnp.int32)


def _count_kernel(p_ref, q_ref, m_ref, out_ref):
    # plain A @ B layout (Q panels pre-transposed): Mosaic's int8 dot
    # only legalizes the standard-layout contraction
    c = jax.lax.dot_general(
        p_ref[0], q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # promote_integers=False keeps the reduce in i32 (Mosaic has no
    # 64-bit; the per-block partial fits i32 — see the caller); the
    # block-mapped (1, 8, 128) output avoids dynamic scalar stores,
    # which x64 mode poisons with int64 index converts
    prod = c * m_ref[0].astype(jnp.int32)
    # axis-wise reduces lower natively in Mosaic; the full-array
    # jnp.sum proxy re-traces under x64 and injects i64 converts
    part = jnp.sum(prod, axis=0, dtype=jnp.int32,
                   promote_integers=False, keepdims=True)   # (1, nJ*T)
    part = jnp.sum(part, axis=1, dtype=jnp.int32,
                   promote_integers=False, keepdims=True)   # (1, 1)
    out_ref[0] = jnp.broadcast_to(part, (8, 128)).astype(jnp.int32)


@partial(jax.jit, static_argnums=(3,))
def _count_launch(P, Q, M, interpret: bool):
    nI, T, W = P.shape
    nJ = M.shape[2]
    out = pl.pallas_call(
        _count_kernel,
        grid=(nI,),
        in_specs=[
            pl.BlockSpec((1, T, W), lambda i: (i, _Z(), _Z())),
            pl.BlockSpec((1, W, nJ), lambda i: (i, _Z(), _Z())),
            pl.BlockSpec((1, T, nJ), lambda i: (i, _Z(), _Z())),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, _Z(), _Z())),
        out_shape=jax.ShapeDtypeStruct((nI, 8, 128), jnp.int32),
        interpret=interpret,
    )(P, Q, M)
    return out[:, 0, 0]


def window_count_partials(plan: WindowPlan, interpret: bool = None):
    """Per-block-row masked-count partials (nI,) int32 — ONE dispatch.
    Each partial is bounded by 128 * (16*128)^2 < 2^31, so int32 is
    safe; callers take the grand total in int64 on the host (the pull
    doubles as the completion barrier)."""
    from ..ops.flopcount import record_axb_method
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    record_axb_method("pallas:window_count")
    return _count_launch(plan.P, plan.Q, plan.M, interpret)


def _mm_kernel(p_ref, q_ref, m_ref, out_ref):
    c = jax.lax.dot_general(
        p_ref[0], q_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[0] = c * m_ref[0].astype(jnp.int32)


@partial(jax.jit, static_argnums=(3,))
def _mm_launch(P, Q, M, interpret: bool):
    nI, T, W = P.shape
    nJ = M.shape[2]
    return pl.pallas_call(
        _mm_kernel,
        grid=(nI,),
        in_specs=[
            pl.BlockSpec((1, T, W), lambda i: (i, _Z(), _Z())),
            pl.BlockSpec((1, W, nJ), lambda i: (i, _Z(), _Z())),
            pl.BlockSpec((1, T, nJ), lambda i: (i, _Z(), _Z())),
        ],
        out_specs=pl.BlockSpec((1, T, nJ), lambda i: (i, _Z(), _Z())),
        out_shape=jax.ShapeDtypeStruct((nI, T, nJ), jnp.int32),
        interpret=interpret,
    )(P, Q, M)


def window_masked_mm_pallas(plan: WindowPlan, interpret: bool = None):
    """Masked count panels (nI, 128, nJmax*128) int32 — the general
    window engine output (same layout as window.window_masked_mm)."""
    from ..ops.flopcount import record_axb_method
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    record_axb_method("pallas:window_mm")
    return _mm_launch(plan.P, plan.Q, plan.M, interpret)


# ---------------------------------------------------------------------------
# Band-ring tricount kernel: U streams ONCE through a VMEM ring
# ---------------------------------------------------------------------------

def _make_tri_ring_kernel(Wb: int, T: int):
    def kernel(p_ref, ub_ref, out_ref, r_ref):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, jnp.int32(Wb))
        # park this step's U band panel in its ring slot
        r_ref[slot] = ub_ref[0]
        part = jnp.zeros((1, 1), jnp.int32)
        for jj in range(Wb):
            s = Wb - 1 - jj            # J = i - s
            ov = (s + 1) * T           # overlap blocks [J, I+1)
            jslot = jax.lax.rem(i + jnp.int32(Wb - s), jnp.int32(Wb))
            q = r_ref[jslot]           # (Wb*T, T): U(J-rows)' over [J, J+Wb)
            c = jax.lax.dot_general(
                p_ref[0][:, jj * T:jj * T + ov], q[:ov, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            msk = p_ref[0][:, jj * T:(jj + 1) * T].astype(jnp.int32)
            pj = jnp.sum(c * msk, axis=0, dtype=jnp.int32,
                         promote_integers=False, keepdims=True)
            pj = jnp.sum(pj, axis=1, dtype=jnp.int32,
                         promote_integers=False, keepdims=True)
            # rows with J < 0 (warm-up steps) contribute nothing
            part = part + jnp.where(i >= s, pj, jnp.zeros_like(pj))
        out_ref[0] = jnp.broadcast_to(part, (8, T)).astype(jnp.int32)
    return kernel


@partial(jax.jit, static_argnums=(2,))
def _tri_ring_launch(P, Ut, interpret: bool):
    nI, T, W = P.shape
    Wb = W // T
    out = pl.pallas_call(
        _make_tri_ring_kernel(Wb, T),
        grid=(nI,),
        in_specs=[
            pl.BlockSpec((1, T, W), lambda i: (i, _Z(), _Z())),
            pl.BlockSpec((1, W, T), lambda i: (i, _Z(), _Z())),
        ],
        out_specs=pl.BlockSpec((1, 8, T), lambda i: (i, _Z(), _Z())),
        out_shape=jax.ShapeDtypeStruct((nI, 8, T), jnp.int32),
        scratch_shapes=[pltpu.VMEM((Wb, W, T), jnp.int8)],
        interpret=interpret,
    )(P, Ut)
    # slice to (nI,) INSIDE the jit: a separate slice program would
    # double the per-call dispatch count through the tunnel
    return out[:, 0, 0]


def tricount_band_partials(plan, interpret: bool = None):
    """Per-block-row triangle partials (nI,) int32 via the band-ring
    kernel: ntri = sum (host, int64).  The mask IS the P panel (the
    SandiaDot mask L equals the left operand), so the kernel reads
    exactly nnz-band bytes: L once + U once."""
    from ..ops.flopcount import record_axb_method
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    record_axb_method("pallas:tri_band_ring")
    return _tri_ring_launch(plan.P, plan.Ut, interpret)
