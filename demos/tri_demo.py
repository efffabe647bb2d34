#!/usr/bin/env python
"""Triangle-count demo (reference ``Demo/Program/tri_demo.c``): all six
methods plus the sparse/BSR fast paths, with edges/s rates.

Usage: python demos/tri_demo.py [graph.tsv]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu import io as gbio, models, sparse as sp    # noqa: E402
from graphblas_tpu.sparse.bsr import tricount_bsr             # noqa: E402


def main():
    if len(sys.argv) > 1:
        A = gbio.read_matrix(sys.argv[1], make_symmetric=True,
                             no_self_edges=True, boolean=True)
        pat = A.pattern_np()
    else:
        pat = models.wathen_pattern(4, 4)
        np.fill_diagonal(pat, False)
        A = gb.Matrix.from_dense(pat, gb.BOOL, pattern=pat)
    n = pat.shape[0]
    ne = int(pat.sum()) // 2
    print(f"nodes: {n} edges: {ne}")
    L, U = models.tricount_prep(A)
    E = models.edge_incidence(A)
    for m, name in enumerate(models.METHODS):
        t0 = time.perf_counter()
        ntri = models.tricount(m, A=A, E=E, L=L, U=U)
        dt = time.perf_counter() - t0
        print(f"triangles: {ntri}  method {name}: {dt:.6f} s "
              f"rate {ne/dt/1e6:.2f} M edges/s")
    t0 = time.perf_counter()
    ntri = sp.tricount_sparse(A)
    dt = time.perf_counter() - t0
    print(f"triangles: {ntri}  method bitpack: {dt:.6f} s")
    t0 = time.perf_counter()
    ntri = tricount_bsr(np.tril(pat, -1), np.triu(pat, 1))
    dt = time.perf_counter() - t0
    print(f"triangles: {ntri}  method bsr: {dt:.6f} s")


if __name__ == "__main__":
    main()
