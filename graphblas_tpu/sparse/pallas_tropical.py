"""Pallas tropical-semiring matmul: C = A (min.+) B and friends.

The MXU only sums products, so tropical semirings (MIN_PLUS / MAX_PLUS
/ MIN_MAX / MAX_MIN — the shortest-path / bottleneck-path algebra) fall
off the fast path everywhere.  XLA's fallback materializes [m, kc, n]
broadcast blocks in HBM; this kernel keeps everything in VMEM: grid
(i, j, k) over 128³ tile triples, the accumulator tile lives in the
revisited output block, and each k-step streams 8 columns of A against
8 rows of B through a [T, 8, T] VMEM broadcast — pure VPU, ~HBM-free.

This is the performance backstop for the 240 predefined tropical
semirings the reference stamps C workers for.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tropical_mm", "TROPICAL_PAIRS"]

T = 128
KK = 8  # k-columns per VMEM broadcast step

# (add, mult) pairs this kernel serves, with the add identity
TROPICAL_PAIRS = {
    ("MIN", "PLUS"): "min_plus",
    ("MAX", "PLUS"): "max_plus",
    ("MIN", "MAX"): "min_max",
    ("MAX", "MIN"): "max_min",
    ("MIN", "TIMES"): "min_times",
    ("MAX", "TIMES"): "max_times",
}


def _identity(add: str, dtype):
    if np.issubdtype(dtype, np.floating):
        return np.inf if add == "MIN" else -np.inf
    info = np.iinfo(dtype)
    return info.max if add == "MIN" else info.min


def _make_kernel(add: str, mult: str):
    addf = jnp.minimum if add == "MIN" else jnp.maximum

    def multf(a, b):
        if mult == "PLUS":
            return a + b
        if mult == "TIMES":
            return a * b
        if mult == "MAX":
            return jnp.maximum(a, b)
        return jnp.minimum(a, b)

    def kernel(at_ref, b_ref, ident_ref, out_ref):
        # at_ref: A' block [k, i] — sliced along sublanes (k); slicing
        # the lane dim (128-wide) is illegal on TPU, so A arrives
        # transposed and both operands stream 8 k-rows per step.
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            out_ref[...] = jnp.full_like(out_ref, ident_ref[0, 0])

        redf = jnp.min if add == "MIN" else jnp.max

        def body(kk, acc):
            st = kk * jnp.int32(KK)         # keep index math in i32
            at = at_ref[pl.dslice(st, KK), :]           # [KK, T(i)]
            b = b_ref[pl.dslice(st, KK), :]             # [KK, T(j)]
            z = multf(at[:, :, None], b[:, None, :])    # [KK, i, j]
            return addf(acc, redf(z, axis=0))

        out_ref[...] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(T // KK), body, out_ref[...])

    return kernel


@partial(jax.jit, static_argnums=(2, 3, 4))
def _tropical_launch(a, b, add: str, mult: str, interpret: bool):
    m, k = a.shape
    n = b.shape[1]
    mt, nt, kt = -(-m // T), -(-n // T), -(-k // T)
    ident = _identity(add, a.dtype)
    ap = jnp.pad(a, ((0, mt * T - m), (0, kt * T - k)),
                 constant_values=ident if mult in ("MAX", "MIN") else 0)
    # for PLUS/TIMES mults, pad with the add identity on A and the
    # mult identity on B so padded k-lanes produce the add identity
    if mult == "PLUS":
        ap = jnp.pad(a, ((0, mt * T - m), (0, kt * T - k)),
                     constant_values=ident)
        bp = jnp.pad(b, ((0, kt * T - k), (0, nt * T - n)),
                     constant_values=0)
    elif mult == "TIMES":
        ap = jnp.pad(a, ((0, mt * T - m), (0, kt * T - k)),
                     constant_values=ident)
        bp = jnp.pad(b, ((0, kt * T - k), (0, nt * T - n)),
                     constant_values=1)
    else:
        # MIN/MAX mult: pad both with the add identity (absorbing)
        bp = jnp.pad(b, ((0, kt * T - k), (0, nt * T - n)),
                     constant_values=ident)
    identa = jnp.full((1, 1), ident, a.dtype)

    def zmap(i, j, kk):
        z = jnp.zeros((), jnp.int32)
        return (z, z)

    grid = (mt, nt, kt)
    out = pl.pallas_call(
        _make_kernel(add, mult),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, T), lambda i, j, kk: (kk, i)),   # A' block
            pl.BlockSpec((T, T), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, 1), zmap, memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((T, T), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mt * T, nt * T), a.dtype),
        interpret=interpret,
    )(ap.T, bp, identa)
    return out[:m, :n]


def tropical_mm(a, b, add: str = "MIN", mult: str = "PLUS",
                interpret: bool = None):
    """C[i,j] = add_k mult(a[i,k], b[k,j]) over a tropical pair."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if (add, mult) not in TROPICAL_PAIRS:
        raise ValueError(f"unsupported tropical pair {(add, mult)}")
    return _tropical_launch(a, b, add, mult, interpret)
