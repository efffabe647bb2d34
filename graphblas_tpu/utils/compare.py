"""Object equality testing (reference ``Demo/Source/isequal.c`` and the
test suite's ``isequal_roundoff.m``)."""

from __future__ import annotations

import numpy as np

from ..core.matrix import Vector

__all__ = ["isequal"]


def isequal(A, B, typecheck: bool = True, rtol: float = 0.0) -> bool:
    """True when A and B have the same dims, pattern, and values
    (optionally same type; ``rtol`` > 0 gives roundoff-tolerant float
    comparison like ``isequal_roundoff.m``).  NaN != NaN, as in the
    reference's isequal.c."""
    if isinstance(A, Vector) != isinstance(B, Vector):
        return False
    if A.shape != B.shape:
        return False
    if typecheck and A.type.name != B.type.name:
        return False
    A = A.wait()
    B = B.wait()
    pa, pb = A.pattern_np(), B.pattern_np()
    if not np.array_equal(pa, pb):
        return False
    va, vb = A.to_dense(), B.to_dense()
    if isinstance(va, dict) != isinstance(vb, dict):
        return False
    if isinstance(va, dict):
        if set(va) != set(vb):
            return False
        return all(_val_eq(va[k][pa], vb[k][pa], rtol) for k in va)
    return _val_eq(va[pa], vb[pa], rtol)


def _val_eq(a, b, rtol):
    if rtol > 0:
        # pure relative comparison (isequal_roundoff.m has no absolute
        # term; numpy's default atol would mask small-magnitude errors)
        return bool(np.allclose(a, b, rtol=rtol, atol=0.0))
    return bool(np.array_equal(a, b))