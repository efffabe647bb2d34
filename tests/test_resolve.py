"""Typed resolution of op/semiring/monoid arguments at API entry
(VERDICT r4 next #5): strings resolve through the predefined catalogs
(type inferred from operands), junk raises UnsupportedOp naming the
argument — never a raw AttributeError (the reference checks every
operator handle at entry, Source/GrB_mxm.c:30-60).
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import sparse as sp
from graphblas_tpu.core.resolve import (UnsupportedOp, resolve_binary,
                                        resolve_monoid, resolve_semiring,
                                        resolve_unary)
from graphblas_tpu.ops.ewise import apply, eWiseAdd, eWiseMult, select
from graphblas_tpu.ops.mxm import mxm, mxv, vxm
from graphblas_tpu.ops.reduce import reduce_to_scalar, reduce_to_vector
from graphblas_tpu.ops.transpose import kron, transpose


@pytest.fixture
def abc():
    A = sp.CsrMatrix.from_coo(np.array([0, 1]), np.array([1, 0]),
                              np.array([1.5, 2.5], np.float32), 2, 2,
                              type=gb.FP32)
    B = sp.CsrMatrix.from_coo(np.array([0, 1]), np.array([0, 1]),
                              np.array([3.0, 4.0], np.float32), 2, 2,
                              type=gb.FP32)
    C = sp.CsrMatrix.from_coo(np.array([], int), np.array([], int),
                              np.array([], np.float32), 2, 2,
                              type=gb.FP32)
    return A, B, C


def test_string_op_resolves(abc):
    A, B, C = abc
    R = eWiseAdd(C, None, None, "plus", A, B)
    assert R.nvals == 4
    R = eWiseMult(C, None, None, "times", A, B)
    assert R.nvals == 0
    R = mxm(C, None, None, "plus_times", A, B)
    assert R.nvals == 2
    assert reduce_to_scalar(None, "plus", A) == pytest.approx(4.0)


def test_typed_name_resolves(abc):
    A, B, C = abc
    # fully-typed GraphBLAS names resolve without operand inference
    R = eWiseAdd(C, None, None, "GrB_PLUS_FP32", A, B)
    assert R.nvals == 4
    R = mxm(C, None, None, "GxB_PLUS_TIMES_FP32", A, B)
    assert R.nvals == 2


def test_accum_string_resolves(abc):
    A, B, C = abc
    R = eWiseAdd(C, None, "plus", "plus", A, B)
    assert R.nvals == 4


def test_junk_op_raises_typed(abc):
    A, B, C = abc
    with pytest.raises(UnsupportedOp, match="eWiseAdd op"):
        eWiseAdd(C, None, None, "nonsense", A, B)
    with pytest.raises(UnsupportedOp, match="eWiseMult op"):
        eWiseMult(C, None, None, 3.14, A, B)
    with pytest.raises(UnsupportedOp, match="mxm semiring"):
        mxm(C, None, None, "plus", A, B)       # not a semiring name
    with pytest.raises(UnsupportedOp, match="mxm semiring"):
        mxm(C, None, None, 42, A, B)
    with pytest.raises(UnsupportedOp, match="apply op"):
        apply(C, None, None, object(), A)
    with pytest.raises(UnsupportedOp, match="select op"):
        select(C, None, None, "junk", A)
    with pytest.raises(UnsupportedOp, match="reduce op"):
        reduce_to_scalar(None, "nonsense", A)
    with pytest.raises(UnsupportedOp, match="accum"):
        eWiseAdd(C, None, object(), "plus", A, B)
    with pytest.raises(UnsupportedOp, match="kron op"):
        kron(C, None, None, "zzz", A, B)
    with pytest.raises(UnsupportedOp, match="transpose accum"):
        transpose(C, None, "zzz", A)


def test_vector_entry_points(abc):
    A, B, C = abc
    w = gb.Vector.new(gb.FP32, 2)
    u = gb.Vector.from_dense(np.array([1.0, 2.0], np.float32))
    r = mxv(w, None, None, "plus_times", A, u)
    assert r.nvals() == 2
    r = vxm(w, None, None, "plus_times", u, A)
    assert r.nvals() == 2
    with pytest.raises(UnsupportedOp, match="mxv semiring"):
        mxv(w, None, None, "snake", A, u)
    with pytest.raises(UnsupportedOp, match="vxm semiring"):
        vxm(w, None, None, [], u, A)
    r = reduce_to_vector(w, None, None, "plus", A)
    assert r.nvals() == 2
    with pytest.raises(UnsupportedOp, match="reduce op"):
        reduce_to_vector(w, None, None, "snake", A)


def test_monoid_string_variants(abc):
    A, _, _ = abc
    m = resolve_monoid("GxB_PLUS_FP32_MONOID")
    assert m.identity == 0
    m = resolve_monoid("max", None, None, A)
    assert float(m.op(np.float32(2), np.float32(3))) == 3.0


def test_resolve_passthrough():
    b = gb.binary.plus[gb.FP32]
    assert resolve_binary(b) is b
    sr = gb.semiring.plus_times[gb.FP32]
    assert resolve_semiring(sr) is sr
    u = gb.unary.ainv[gb.FP32]
    assert resolve_unary(u) is u
    # semiring in a binary slot takes its mult; monoid its op (per spec)
    assert resolve_binary(sr).name == sr.mult.name
    mon = gb.monoid.plus[gb.FP32]
    assert resolve_binary(mon) is mon.op


def test_no_typed_operand_hint():
    # UDT operands give no type family to infer: clear typed error
    with pytest.raises(UnsupportedOp, match="infer"):
        resolve_binary("plus", "op", None, object())
