"""Gather-wall probe (VERDICT r3 next #3): what is the fastest random
x-gather ANY kernel can do on this TPU, Pallas included?

Findings this records (run on TPU v5e via the axon tunnel, honest
scalar-pull sync; see PERF.md "The single-x SpMV wall" for the
conclusions):

* Mosaic exposes exactly TWO vector gathers, both same-shape
  ``take_along_axis`` forms: a 128-lane in-register shuffle (axis=1,
  window = 128 lanes) and an 8-sublane tile gather (axis=0, 8 rows).
  Wider windows (C=512 different-shape, 64+ sublanes) fail to lower
  (``_gather_lowering_rule`` asserts / Mosaic rejects).
* The 128-lane shuffle measures ~0.22 G lane-gathers/s — only ~1.9x
  the XLA scalar-gather envelope (0.12 G/s), and it requires ALL 128
  lanes of a row to read the same 128-entry window (column locality
  an unstructured graph does not have).
* Therefore a general per-lane x[col[e]] gather cannot meaningfully
  beat 0.12 G/s on this machine from Pallas either: the wall is the
  hardware/compiler scalar-access path, not an XLA artifact.  Faster
  sparse kernels must restructure around it — k-wide rows (SpMM ELL,
  7.26 G nnz*col/s), bitmap popcount panels (bitdot), dense windows
  (band/BSR MXU engines) — which is exactly what this library does.

Usage: python tools/gather_probe.py          (takes ~2 min on TPU)
Prints one JSON line per probe.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# NOTE: deliberately NOT importing graphblas_tpu — its x64 mode makes
# jnp.take_along_axis emit int64 index converts that Mosaic rejects;
# the probe measures the primitive in its supported (32-bit) form.
import jax            # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402


def _time(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        _ = float(jnp.sum(r))           # host pull = completion barrier
        best = min(best, time.perf_counter() - t0)
    return best


def probe_lane_shuffle():
    """Same-shape axis=1 take_along_axis: the 128-lane shuffle."""
    R, BR = 1 << 15, 512

    def kern(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...],
                                         axis=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((R, 128), np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (R, 128), dtype=np.int32))
    f = pl.pallas_call(
        kern, grid=(R // BR,),
        in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0)),
                  pl.BlockSpec((BR, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))
    out = f(x, idx)
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    assert (np.asarray(out) == want).all()
    dt = _time(lambda: f(x, idx))
    print(json.dumps({"probe": "pallas_128lane_shuffle",
                      "g_per_s": round(R * 128 / dt / 1e9, 3)}))


def probe_xla_scalar_gather(n=1 << 18, E=1 << 22):
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.random(n, np.float32))
    gi = jnp.asarray(rng.integers(0, n, E, dtype=np.int32))
    g = jax.jit(lambda t, i: jnp.take(t, i))
    dt = _time(lambda: g(tbl, gi))
    print(json.dumps({"probe": "xla_scalar_gather",
                      "g_per_s": round(E / dt / 1e9, 3)}))


def probe_unsupported_forms():
    """Document which gather forms Mosaic refuses (width/sublane caps)."""
    results = {}
    cases = {
        "axis1_width512_narrow_idx": ((256, 512), (256, 128), 1),
        "axis0_64rows": ((64, 128), (64, 128), 0),
    }
    for name, (xs, ids, axis) in cases.items():
        def kern(x_ref, idx_ref, o_ref, axis=axis):
            o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...],
                                             axis=axis)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random(xs, np.float32))
        hi = xs[axis]
        idx = jnp.asarray(rng.integers(0, hi, ids, dtype=np.int32))
        try:
            pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(ids, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
            results[name] = "supported"
        except Exception:
            results[name] = "rejected"
    print(json.dumps({"probe": "mosaic_gather_support", **results}))


if __name__ == "__main__":
    probe_lane_shuffle()
    probe_xla_scalar_gather()
    probe_unsupported_forms()
