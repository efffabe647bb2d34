#!/usr/bin/env python
"""BFS demo (reference ``Demo/Program/bfs_demo.c``): read a triplet graph
(or generate Wathen), run all BFS variants, report levels + reachability.

Usage: python demos/bfs_demo.py [graph.tsv] [source]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu import io as gbio, models                  # noqa: E402


def main():
    src = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if len(sys.argv) > 1:
        A = gbio.read_matrix(sys.argv[1], make_symmetric=True,
                             no_self_edges=True, boolean=True)
    else:
        W = models.wathen(4, 4)
        pat = W.pattern_np()
        np.fill_diagonal(pat, False)
        A = gb.Matrix.from_dense(pat, gb.BOOL, pattern=pat)
    n = A.nrows
    print(f"number of nodes: {n}")
    for name, fn in (("bfs5m", models.bfs5m), ("bfs6", models.bfs6)):
        v = fn(A, src)
        lev = np.where(v.pattern_np(), v.to_dense(), 0)
        nreach = int((lev != 0).sum())
        print(f"nodes reachable from node {src}: {nreach} out of {n} "
              f"({name})")
        print(f"max level: {int(lev.max())}")
    lev = models.bfs_jit(A, src)
    print(f"nodes reachable from node {src}: "
          f"{int((lev != 0).sum())} out of {n} (bfs_jit)")


if __name__ == "__main__":
    main()
