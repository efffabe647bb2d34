#!/usr/bin/env python
"""PageRank demo (reference ``Demo/Program/pagerank_demo.c``): runs the
fp64, scaled-integer, and UDT-semiring variants and prints the top nodes
side by side.

Usage: python demos/pagerank_demo.py [graph.tsv] [topk]
"""
import sys

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu import io as gbio, models                  # noqa: E402


def main():
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if len(sys.argv) > 1:
        A = gbio.read_matrix(sys.argv[1], boolean=True,
                             no_self_edges=True)
    else:
        A = gbio.read_matrix("/dev/stdin", boolean=True,
                             no_self_edges=True)
    n = A.nrows
    print(f"n {n} edges {A.nvals()}")
    d = models.dpagerank(A)
    i = models.ipagerank(A)
    x, iters = models.dpagerank2(A, itermax=100, tol=1e-5)
    print(f"dpagerank2 iters: {iters}")
    print(f"Top {min(topk, n)} nodes:")
    for k in range(min(topk, n)):
        print(f"  {k}: d:[{d[k][0]:6d} : {d[k][1]:.8e}] "
              f"i:[{i[k][0]:6d} : {i[k][1]}] "
              f"x:[{x[k][0]:6d} : {x[k][1]:.8e}]")


if __name__ == "__main__":
    main()
