#!/usr/bin/env python
"""Maximal-independent-set demo (reference ``Demo/Program/mis_demo.c``).

Usage: python demos/mis_demo.py [graph.tsv]
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu import io as gbio, models                  # noqa: E402


def main():
    if len(sys.argv) > 1:
        A = gbio.read_matrix(sys.argv[1], make_symmetric=True,
                             no_self_edges=True, boolean=True)
    else:
        pat = models.wathen_pattern(4, 4)
        np.fill_diagonal(pat, False)
        A = gb.Matrix.from_dense(pat, gb.BOOL, pattern=pat)
    iset = models.mis(A, seed=1)
    isize = iset.nvals()
    print(f"isize: {isize}")
    print(f"independent set found: {isize} of {A.nrows} nodes")
    if models.mis_check(A, iset):
        print("maximal independent set status verified")
    else:
        print("ERROR: not a maximal independent set")
        sys.exit(1)


if __name__ == "__main__":
    main()
