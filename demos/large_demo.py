#!/usr/bin/env python
"""Large-graph demo: BFS + PageRank on an R-MAT power-law graph through
the sharded-CSR path — no dense intermediate anywhere; the scale the
bitmap backend cannot reach.

Usage: python demos/large_demo.py [scale] [edge_factor]
       (default scale 15: 32 K nodes, ~1 M directed edges)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import jax.numpy as jnp                                       # noqa: E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu import parallel as par                     # noqa: E402
from graphblas_tpu.models.rmat import rmat_edges              # noqa: E402


def host_bfs(indptr, indices, n, src):
    lev = np.zeros(n, np.int64)
    frontier = np.array([src])
    lev[src] = 1
    level = 2
    while len(frontier):
        nxt = np.unique(np.concatenate(
            [indices[indptr[v]:indptr[v + 1]] for v in frontier]
        )) if len(frontier) else np.array([], np.int64)
        nxt = nxt[lev[nxt] == 0]
        lev[nxt] = level
        frontier = nxt
        level += 1
    return lev


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << scale
    t0 = time.perf_counter()
    I, J = rmat_edges(scale, ef, seed=7)
    print(f"rmat scale={scale}: {n} nodes, {len(I)} directed edges "
          f"({time.perf_counter()-t0:.2f}s gen)")

    # sharded CSR (transpose slabs for the vxm-style frontier product)
    t0 = time.perf_counter()
    from graphblas_tpu.sparse.container import csr_from_coo
    A = csr_from_coo(I, J, np.ones(len(I), np.float32), n, n,
                     type=gb.FP32, sum_duplicates=False)
    print(f"csr build: {time.perf_counter()-t0:.2f}s "
          f"(nzmax {A.nzmax})")

    # device SpMV rate
    x = np.random.default_rng(0).random(n).astype(np.float32)
    from graphblas_tpu.sparse import csr_mxv
    from graphblas_tpu.core.semirings import semiring
    sr = semiring.plus_times[gb.FP32]
    xd = jnp.asarray(x)  # device-resident: time the kernel, not PCIe
    y, _ = csr_mxv(sr, A, xd)
    y.block_until_ready()
    K = 20
    t0 = time.perf_counter()
    for _ in range(K):
        y, _ = csr_mxv(sr, A, xd)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    print(f"spmv: {dt*1e3:.2f} ms -> {len(I)/dt/1e6:.0f} M nnz/s")

    # correctness: SpMV vs host oracle on a sample of rows
    indptr = np.asarray(A.indptr)
    indices = np.asarray(A.indices)[:A.nvals]
    vals = np.asarray(A.values)[:A.nvals]
    yh = np.asarray(y)
    rows = np.random.default_rng(1).integers(0, n, 64)
    for r in rows:
        want = (vals[indptr[r]:indptr[r + 1]] *
                x[indices[indptr[r]:indptr[r + 1]]]).sum()
        assert np.isclose(yh[r], want, rtol=1e-4), r
    print("spmv sample-verified")

    # BFS through the distributed CSR path vs host oracle
    t0 = time.perf_counter()
    lev = par.dist_csr_bfs(A, 0)
    print(f"bfs: {time.perf_counter()-t0:.2f}s, "
          f"{int((lev != 0).sum())} reachable, "
          f"{int(lev.max())} levels")
    want = host_bfs(indptr, indices, n, 0)
    assert np.array_equal(lev, want)
    print("bfs verified")
    print("large_demo OK")


if __name__ == "__main__":
    main()
