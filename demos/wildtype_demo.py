#!/usr/bin/env python
"""Arbitrary user-defined struct types (reference
``Demo/Program/wildtype_demo.c``: a struct containing a 4x4 float
matrix + a string-like tag, with user ops/semiring over it).

Here the "wildtype" is a UDT whose fields are themselves vector-valued —
stored struct-of-arrays, traced by jax like any other type.
"""
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import _common  # noqa: F401,E402
import graphblas_tpu as gb                                    # noqa: E402
from graphblas_tpu.core.types import Type                     # noqa: E402
from graphblas_tpu.core.ops import BinaryOp                   # noqa: E402
from graphblas_tpu.core.monoids import monoid_new             # noqa: E402
from graphblas_tpu.core.semirings import semiring_new         # noqa: E402


def main():
    # wildtype: {stuff: fp64, more: fp32}  (struct-of-arrays UDT)
    wild = Type.udt("wildtype", stuff=gb.FP64, more=gb.FP32)

    wadd = BinaryOp("WILDADD", lambda x, y: {
        "stuff": x["stuff"] + y["stuff"],
        "more": x["more"] + y["more"]}, wild, wild, wild)
    wmult = BinaryOp("WILDMULT", lambda x, y: {
        "stuff": x["stuff"] * y["stuff"],
        "more": x["more"] * y["more"]}, wild, wild, wild)
    wmonoid = monoid_new(wadd, {"stuff": 0.0, "more": 0.0})
    wsemiring = semiring_new(wmonoid, wmult)

    C = gb.Matrix.new(wild, 4, 4)
    C = C.setElement({"stuff": 4.5, "more": 3.2}, 0, 0)
    C = C.setElement({"stuff": 1.0, "more": 2.0}, 0, 3)
    C = C.setElement({"stuff": 3.0, "more": 1.0}, 3, 0)
    gb.fprint(C, "C", gb.SHORT)

    D = gb.mxm(gb.Matrix.new(wild, 4, 4), None, None, wsemiring, C, C)
    gb.fprint(D, "D = C*C", gb.SHORT)
    d00 = D.extractElement(0, 0)
    assert np.isclose(d00["stuff"], 4.5 * 4.5 + 1.0 * 3.0)
    print("wildtype_demo OK")


if __name__ == "__main__":
    main()
