#!/usr/bin/env python
"""k-truss demo (reference ``Extras/ktruss`` mains): GraphBLAS-style and
sparse fast-path k-truss + the all-k-truss sweep.

Usage: python demos/ktruss_demo.py [graph.tsv] [k]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu import io as gbio, models, sparse as sp    # noqa: E402


def main():
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if len(sys.argv) > 1:
        A = gbio.read_matrix(sys.argv[1], make_symmetric=True,
                             no_self_edges=True, boolean=True)
    else:
        pat = models.wathen_pattern(4, 4)
        np.fill_diagonal(pat, False)
        A = gb.Matrix.from_dense(pat, gb.BOOL, pattern=pat)
    C, nsteps = models.ktruss(A, k)
    ne = C.nvals() // 2
    print(f"{k}-truss: {ne} edges, {nsteps} steps (graphblas path)")
    (ei, ej, supp), nsteps2 = sp.ktruss_sparse(A, k)
    ne2 = int((supp >= k - 2).sum()) // 2
    print(f"{k}-truss: {ne2} edges, {nsteps2} steps (sparse path)")
    assert ne == ne2
    allk = models.allktruss(A)
    for kk in sorted(allk):
        st = allk[kk]
        print(f"k = {kk}: {st['nedges']} edges, {st['nsteps']} steps, "
              f"{st['nt']} triangles")


if __name__ == "__main__":
    main()
