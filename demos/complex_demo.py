#!/usr/bin/env python
"""Complex-arithmetic demo (reference ``Demo/Program/complex_demo.c`` +
``Demo/Source/usercomplex.c``: a full double-complex op set as user
objects).  Here complex is a native dtype; the demo runs C = A*B over
the user-defined complex plus-times semiring and verifies against numpy.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu.user_objects import (                      # noqa: E402
    my_complex_plus_times)


def main():
    rng = np.random.default_rng(0)
    m, k, n = 4, 5, 3
    Ad = (rng.normal(size=(m, k)) + 1j * rng.normal(size=(m, k)))
    Bd = (rng.normal(size=(k, n)) + 1j * rng.normal(size=(k, n)))
    Am = rng.random((m, k)) < 0.7
    Bm = rng.random((k, n)) < 0.7
    A = gb.Matrix.from_dense(Ad * Am, gb.FC64, pattern=Am)
    B = gb.Matrix.from_dense(Bd * Bm, gb.FC64, pattern=Bm)
    C = gb.mxm(gb.Matrix.new(gb.FC64, m, n), None, None,
               my_complex_plus_times, A, B)
    want = (Ad * Am) @ (Bd * Bm)
    assert np.allclose(C.to_dense(), want)
    gb.fprint(C, "C = A*B (complex)", gb.SUMMARY)
    print("complex_demo OK")


if __name__ == "__main__":
    main()
