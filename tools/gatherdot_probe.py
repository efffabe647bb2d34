"""Probe (round 5, committed evidence like tools/gather_probe.py):
can a Pallas double-buffered DMA row-gather beat XLA's take() for the
valdot access pattern (random 4 KB panel rows)?

MEASURED ANSWER: no — 76.2 GB/s (Pallas, B=128 rows/step, 2 buffers,
shared per-side DMA semaphores) vs 70-104 GB/s (XLA take), outputs
matching.  131072 row-DMAs in 7.0 ms = ~53 ns per DMA issue: at 4 KB
per row the ISSUE RATE, not HBM bandwidth, is the ceiling, and XLA's
gather already sits on it.  The valdot engine therefore keeps the XLA
formulation; the residual gap to a cache-hierarchy CPU core on valued
SpGEMM is architectural (random 4 KB rows at ~75-100 GB/s vs
cache-resident scatter), not a missing kernel.

Mosaic constraints found on the way (documented for future kernels):
single-row slices of a tiled HBM memref are not DMA-able (shape rows
as whole (8,128) tiles); multi-axis vector reductions to rank-1
outputs are rejected (split the reduce, keep outputs 2-D); scalar-
prefetch operands live in the 1 MB SMEM (cap index arrays); DMA
semaphores live in a 2 KB flag space (share one per side and wait
per-copy).

Workload: acc[e] = sum(Aval[ai[e], :] * Bval[bj[e], :]) over E entries,
tables (NA, S) f32.  Compare jnp.take vs a scalar-prefetch DMA kernel.
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NA = 32768
S = 1024
E = 1 << 16            # 65536 live entries (SMEM: 2 idx arrays = 512KB of 1MB)
B = 128                # entries per grid step (out block = 128)
NBUF = 2               # buffers in flight

rng = np.random.default_rng(0)
Aval = jnp.asarray(rng.random((NA, 8, S // 8), np.float32))
Bval = jnp.asarray(rng.random((NA, 8, S // 8), np.float32))
ai = jnp.asarray(rng.integers(0, NA, E).astype(np.int32))
bj = jnp.asarray(rng.integers(0, NA, E).astype(np.int32))


@jax.jit
def xla_ref(ai, bj, Aval=None, Bval=None):
    def body(args):
        i, j = args
        a = jnp.take(Aval, i, axis=0)
        b = jnp.take(Bval, j, axis=0)
        return jnp.sum(a * b, axis=(1, 2))
    return jax.lax.map(body, (ai.reshape(64, -1), bj.reshape(64, -1))
                       ).reshape(E)


def kernel(ai_ref, bj_ref, a_hbm, b_hbm, out_ref, a_buf, b_buf, sems):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def start(slot, s):
        base = s * B
        for t in range(B):
            pltpu.make_async_copy(
                a_hbm.at[ai_ref[base + t]],
                a_buf.at[slot, t], sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                b_hbm.at[bj_ref[base + t]],
                b_buf.at[slot, t], sems.at[slot, 1]).start()

    @pl.when(step == 0)
    def _():
        for s in range(min(NBUF, 1)):
            pass  # first-step warmup handled below

    # warm-up: on step 0, start slots 0..NBUF-1
    @pl.when(step == 0)
    def _():
        for s in range(NBUF):
            @pl.when(s < nsteps)
            def _(s=s):
                start(s, s)

    slot = jax.lax.rem(step, NBUF)
    # wait for this step's DMAs (shared per-side semaphore: each wait
    # decrements by one row's bytes)
    for t in range(B):
        pltpu.make_async_copy(a_hbm.at[0], a_buf.at[slot, t],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(b_hbm.at[0], b_buf.at[slot, t],
                              sems.at[slot, 1]).wait()
    # compute
    x = a_buf[slot] * b_buf[slot]              # (B, 8, S//8)
    s1 = jnp.sum(x, axis=2)                    # (B, 8)
    s2 = jnp.sum(s1, axis=1)                   # (B,)
    out_ref[pl.ds(step, 1), :] = s2.reshape(1, B)
    # start the DMA for step + NBUF
    nxt = step + NBUF

    @pl.when(nxt < nsteps)
    def _():
        start(slot, nxt)


@jax.jit
def pallas_gatherdot(ai, bj, Aval=None, Bval=None):
    nsteps = E // B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((E // B, B), lambda i, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, B, 8, S // 8), jnp.float32),
            pltpu.VMEM((NBUF, B, 8, S // 8), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E // B, B), jnp.float32),
        grid_spec=grid_spec,
    )(ai, bj, Aval, Bval)
    return out.reshape(E)


def timeit(f, tag):
    r = f(ai, bj, Aval=Aval, Bval=Bval)
    s0 = float(jnp.sum(r))           # warm + barrier
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        K = 5
        outs = [f(ai, bj, Aval=Aval, Bval=Bval) for _ in range(K)]
        float(jnp.sum(outs[-1][:8]))
        best = min(best, (time.perf_counter() - t0) / K)
    gb = 2 * E * S * 4 / 1e9
    print(f"{tag}: {best*1e3:.1f} ms  {gb/best:.1f} GB/s  sum={s0:.1f}",
          flush=True)
    return r


r1 = timeit(xla_ref, "xla take")
r2 = timeit(pallas_gatherdot, "pallas dma")
print("match:", bool(jnp.allclose(r1, r2, rtol=1e-5)), flush=True)
