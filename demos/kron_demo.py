#!/usr/bin/env python
"""Kronecker product demo (reference ``Demo/Program/kron_demo.c`` and the
``Extras/ExactKronGen`` MPI driver): C = kron(A, B) computed in
communication-free shards, written as a triplet file.

Usage: python demos/kron_demo.py A.tsv B.tsv C.tsv [nshards]
"""
import sys
import time

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu import io as gbio, models                  # noqa: E402


def main():
    if len(sys.argv) < 4:
        print("usage: kron_demo.py A.tsv B.tsv C.tsv [nshards]")
        sys.exit(1)
    nshards = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    A = gbio.read_matrix(sys.argv[1])
    B = gbio.read_matrix(sys.argv[2])
    t0 = time.perf_counter()
    C = models.kron_generate(A, B, nshards=nshards)
    dt = time.perf_counter() - t0
    nvals = C.nvals()
    print(f"C = kron(A,B): {C.nrows} x {C.ncols}, {nvals} entries, "
          f"{dt:.3f} s ({nvals/max(dt, 1e-12)/1e6:.2f} M entries/s, "
          f"{nshards} shards)")
    gbio.write_triplets(sys.argv[3], C)


if __name__ == "__main__":
    main()
