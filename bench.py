"""Benchmark: masked-SpGEMM triangle counting (the reference's headline
workload) on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference counts triangles on Wathen demo
graphs at 5.62 M edges/s kernel-only (dot method, 1 thread,
``Demo/Output/tri_demo.out:82``).  We run the same SandiaDot masked mxm
((L*U').*L + reduce) on a 190x larger Wathen instance (nx=ny=64,
~12.5 K nodes, ~100 K edges) using the BSR tile path: every tile-triple
product is an int8 MXU matmul (``graphblas_tpu/sparse/bsr.py``).

Timing note: the device is reached through a tunnel with ~35 ms RTT, so
the kernel is timed by asynchronously dispatching K iterations and
blocking once — standard RTT amortization; the correctness gate runs
first, unamortized.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu import models
    from graphblas_tpu.sparse import bsr

    # Wathen graph, same family as tri_demo (nx=ny=64 -> n=12545);
    # host-side pattern build — only the ~5 MB of BSR tiles reach the
    # device, which is the production dataflow for sharded loading too.
    nx = ny = 64
    Apn = models.wathen_pattern(nx, ny, seed=1)
    n = Apn.shape[0]
    np.fill_diagonal(Apn, False)
    nedges = int(Apn.sum()) // 2
    Lpn = np.tril(Apn, -1)
    Upn = np.triu(Apn, 1)

    # build the BSR decomposition + triple schedule (host; analogous to
    # tri_prep, untimed in the reference's kernel-only number too)
    from graphblas_tpu.sparse import pallas_bsr as pb
    Lt = bsr.tile_pattern(Lpn)
    Ut = bsr.tile_pattern(Upn)
    ga, gm = Lt.grid, Lt.grid
    gb_ = Ut.grid
    trip = gm[:, :, None] & ga[:, None, :] & gb_[None, :, :]
    I, J, K = np.nonzero(trip)
    outs = np.nonzero(gm)
    nout = len(outs[0])
    out_index = np.zeros(gm.shape, np.int32)
    out_index[outs] = np.arange(nout, dtype=np.int32)
    oid = out_index[I, J]
    order = np.argsort(oid, kind="stable")
    oid, I, J, K = oid[order], I[order], J[order], K[order]
    counts = np.bincount(oid, minlength=nout)
    starts = jnp.asarray(np.concatenate([[0], np.cumsum(counts)])
                         .astype(np.int32))
    kmax = int(counts.max())
    ta = jnp.asarray(Lt.index[I, K], jnp.int32)
    tb = jnp.asarray(Ut.index[J, K], jnp.int32)
    Mtiles = jnp.take(Lt.tiles, jnp.asarray(
        Lt.index[outs[0], outs[1]], jnp.int32), axis=0)

    @jax.jit
    def tri_kernel(Ltiles, Utiles, Mtiles):
        # Pallas BSR masked SpGEMM: int8 MXU tile products accumulated
        # in VMEM, mask fused (graphblas_tpu/sparse/pallas_bsr.py)
        C = pb._launch(starts, ta, tb, Ltiles, Utiles, Mtiles, kmax,
                       False)
        return jnp.sum(C)

    # correctness gate vs dense f64-BLAS oracle (exact below 2^53)
    ntri = int(np.asarray(tri_kernel(Lt.tiles, Ut.tiles, Mtiles)))
    Af = Apn.astype(np.float64)
    want = int(round(((Af @ Af) * Af).sum())) // 6
    assert ntri == want, f"tricount mismatch: {ntri} != {want}"

    # timed: K async dispatches, one block (amortizes tunnel RTT)
    K = 100
    tri_kernel(Lt.tiles, Ut.tiles, Mtiles).block_until_ready()
    t0 = time.perf_counter()
    results = [tri_kernel(Lt.tiles, Ut.tiles, Mtiles) for _ in range(K)]
    results[-1].block_until_ready()
    elapsed = (time.perf_counter() - t0) / K

    rate = nedges / elapsed
    baseline = 5.62e6  # edges/s, Demo/Output/tri_demo.out:82 (dot method)
    print(json.dumps({
        "metric": "masked_spgemm_tricount_edges_per_s",
        "value": rate,
        "unit": "edges/s",
        "vs_baseline": rate / baseline,
    }))


if __name__ == "__main__":
    main()
