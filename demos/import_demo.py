#!/usr/bin/env python
"""Import/export demo (reference ``Demo/Program/import_demo.c``):
round-trip a matrix through CSR/CSC import/export."""
import sys

import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402


def main():
    rng = np.random.default_rng(1)
    mask = rng.random((6, 7)) < 0.4
    dense = rng.normal(size=(6, 7)) * mask
    A = gb.Matrix.from_dense(dense, gb.FP64, pattern=mask)

    nr, nc, indptr, indices, values = gb.export_csr(A)
    print(f"exported CSR: {nr}x{nc}, nvals={len(indices)}")
    B = gb.import_csr(nr, nc, indptr, indices, values, gb.FP64)
    assert np.allclose(B.to_matrix().to_dense(), dense)

    nr, nc, cp, ri, cv = gb.export_csc(A)
    print(f"exported CSC: {nr}x{nc}, nvals={len(ri)}")
    C = gb.import_csc(nr, nc, cp, ri, cv, gb.FP64)
    assert np.allclose(C.to_matrix().to_dense(), dense)
    print("import_demo OK")


if __name__ == "__main__":
    main()
