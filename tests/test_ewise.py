"""Differential tests: eWiseAdd / eWiseMult / apply / select vs oracle."""

import numpy as np
import pytest

import graphblas_tpu as gb
from . import oracle as orc
from .helpers import TYPES, assert_same, rand_om, to_gb

OPS = ["first", "second", "min", "max", "plus", "minus", "rminus", "times",
       "div", "rdiv", "iseq", "isne", "isgt", "islt", "isge", "isle",
       "lor", "land", "lxor", "eq", "ne", "gt", "lt", "ge", "le"]
TYPELIST = ["BOOL", "INT8", "UINT8", "INT16", "UINT16", "INT32", "UINT32",
            "INT64", "UINT64", "FP32", "FP64"]


@pytest.mark.parametrize("opname", OPS)
@pytest.mark.parametrize("tname", ["BOOL", "INT32", "UINT8", "FP64"])
def test_ewise_ops(rng, opname, tname):
    t = TYPES[tname]
    A = rand_om(rng, (4, 5), t.dtype, 0.6)
    B = rand_om(rng, (4, 5), t.dtype, 0.6)
    op = gb.binary[opname][t]
    for union in (True, False):
        want = orc.o_ewise(opname, t.dtype, A, B, union)
        fn = gb.eWiseAdd if union else gb.eWiseMult
        got = fn(gb.Matrix.new(op.ztype, 4, 5), None, None, op,
                 to_gb(A, t), to_gb(B, t))
        assert_same(got, want, tol=1e-6 if tname == "FP32" else 1e-12,
                    msg=f"{opname} {tname} union={union}")


@pytest.mark.parametrize("tname", TYPELIST)
def test_ewise_all_types_plus(rng, tname):
    t = TYPES[tname]
    A = rand_om(rng, (3, 3), t.dtype, 0.5)
    B = rand_om(rng, (3, 3), t.dtype, 0.5)
    want = orc.o_ewise("plus", t.dtype, A, B, True)
    got = gb.eWiseAdd(gb.Matrix.new(t, 3, 3), None, None,
                      gb.binary.plus[t], to_gb(A, t), to_gb(B, t))
    assert_same(got, want, msg=tname)


def test_ewise_mask_accum_vector(rng):
    t = gb.INT32
    A = rand_om(rng, (6,), t.dtype, 0.5)
    B = rand_om(rng, (6,), t.dtype, 0.5)
    C = rand_om(rng, (6,), t.dtype, 0.5)
    M = rand_om(rng, (6,), np.bool_, 0.5)
    T = orc.o_ewise("max", t.dtype, A, B, True)
    want = orc.o_accum_mask(C, M, T, "plus", t.dtype, t.dtype,
                            replace=True, scmp=False)
    got = gb.eWiseAdd(to_gb(C, t), to_gb(M, gb.BOOL), gb.binary.plus[t],
                      gb.binary.max[t], to_gb(A, t), to_gb(B, t),
                      gb.REPLACE)
    assert_same(got, want)


@pytest.mark.parametrize("opname", ["identity", "ainv", "minv", "lnot",
                                    "one", "abs"])
@pytest.mark.parametrize("tname", ["BOOL", "INT8", "UINT16", "INT64", "FP64"])
def test_apply(rng, opname, tname):
    t = TYPES[tname]
    A = rand_om(rng, (4, 4), t.dtype, 0.6)
    f = orc.unop(opname, t.dtype)
    vals = np.where(A.p, f(A.m), np.zeros((), t.dtype))
    want = orc.OM(vals, A.p.copy())
    got = gb.apply(gb.Matrix.new(t, 4, 4), None, None,
                   gb.unary[opname][t], to_gb(A, t))
    assert_same(got, want, msg=f"{opname} {tname}")


def test_apply_typecast_to_output(rng):
    # apply with accum into a different-typed C
    t = gb.FP64
    A = rand_om(rng, (3, 3), np.float64, 0.8)
    C = rand_om(rng, (3, 3), np.int32, 0.5)
    T = orc.OM(-A.m, A.p)
    want = orc.o_accum_mask(C, None, T, "plus", np.int32, np.int32)
    got = gb.apply(to_gb(C, gb.INT32), None, gb.binary.plus[gb.INT32],
                   gb.unary.ainv[t], to_gb(A, t))
    assert_same(got, want)


@pytest.mark.parametrize("selname,k", [("tril", 0), ("tril", -1),
                                       ("triu", 0), ("triu", 2),
                                       ("diag", 0), ("offdiag", 0),
                                       ("nonzero", 0)])
def test_select(rng, selname, k):
    t = gb.FP64
    A = rand_om(rng, (5, 5), t.dtype, 0.7)
    i, j = np.indices((5, 5))
    keep = {"tril": (j - i) <= k, "triu": (j - i) >= k,
            "diag": (j - i) == k, "offdiag": (j - i) != k,
            "nonzero": A.m != 0}[selname]
    want = orc.OM(np.where(A.p & keep, A.m, 0.0), A.p & keep)
    got = gb.select(gb.Matrix.new(t, 5, 5), None, None,
                    gb.selectop[selname], to_gb(A, t), k)
    assert_same(got, want, msg=f"{selname} k={k}")


def test_transpose_full(rng):
    t = gb.FP64
    A = rand_om(rng, (4, 6), t.dtype, 0.5)
    C = rand_om(rng, (6, 4), t.dtype, 0.5)
    T = orc.OM(A.m.T, A.p.T)
    want = orc.o_accum_mask(C, None, T, "plus", t.dtype, t.dtype)
    got = gb.transpose(to_gb(C, t), None, gb.binary.plus[t], to_gb(A, t))
    assert_same(got, want)


def test_kron(rng):
    t = gb.FP64
    A = rand_om(rng, (2, 3), t.dtype, 0.7)
    B = rand_om(rng, (3, 2), t.dtype, 0.7)
    want = orc.OM(np.kron(A.m, B.m), np.kron(A.p, B.p).astype(bool))
    got = gb.kron(gb.Matrix.new(t, 6, 6), None, None, gb.binary.times[t],
                  to_gb(A, t), to_gb(B, t))
    assert_same(got, want, tol=1e-12)
