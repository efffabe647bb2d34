#!/usr/bin/env python
"""Smoke-test demo (reference ``Demo/Program/simple_demo.c``): exercise
the basic API end to end with tiny objects."""
import sys

import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402


def main():
    A = gb.Matrix.from_coo([0, 1, 2], [1, 2, 0], [1.0, 2.0, 3.0], 3, 3)
    gb.fprint(A, "A", gb.SHORT)
    x = gb.Vector.from_dense(np.ones(3))
    y = gb.mxv(gb.Vector.new(gb.FP64, 3), None, None,
               gb.semiring.plus_times[gb.FP64], A, x)
    gb.fprint(y, "y = A*x", gb.SHORT)
    s = gb.reduce_to_scalar(None, gb.monoid.plus[gb.FP64], y)
    print(f"sum(y) = {s}")
    assert s == 6.0
    print("simple_demo OK")


if __name__ == "__main__":
    main()
