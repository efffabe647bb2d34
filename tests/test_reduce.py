"""Differential tests: reduce to vector / scalar vs oracle."""

import numpy as np
import pytest

import graphblas_tpu as gb
from . import oracle as orc
from .helpers import TYPES, assert_same, rand_om, to_gb

MONOIDS = [("plus", "FP64"), ("plus", "INT32"), ("plus", "UINT8"),
           ("times", "INT32"), ("min", "FP64"), ("min", "INT16"),
           ("max", "FP32"), ("max", "UINT64"), ("lor", "BOOL"),
           ("land", "BOOL"), ("lxor", "BOOL"), ("eq", "BOOL")]


@pytest.mark.parametrize("mon,tname", MONOIDS)
def test_reduce_to_vector(rng, mon, tname):
    t = TYPES[tname]
    A = rand_om(rng, (5, 7), t.dtype, 0.5)
    want = orc.o_reduce_cols(mon, t.dtype, A)
    got = gb.reduce_to_vector(gb.Vector.new(t, 5), None, None,
                              gb.monoid[mon][t], to_gb(A, t))
    assert_same(got, want, tol=1e-6 if tname == "FP32" else 1e-12,
                msg=f"{mon} {tname}")


@pytest.mark.parametrize("mon,tname", MONOIDS)
def test_reduce_to_scalar(rng, mon, tname):
    t = TYPES[tname]
    A = rand_om(rng, (4, 6), t.dtype, 0.5)
    want = orc.o_reduce_scalar(mon, t.dtype, A)
    got = gb.reduce_to_scalar(None, gb.monoid[mon][t], to_gb(A, t))
    if t.dtype.kind == "f":
        assert np.isclose(float(got), float(want), rtol=1e-10), (mon, tname)
    else:
        assert got == want, f"{mon} {tname}: {got} != {want}"


def test_reduce_empty_gives_identity(rng):
    A = gb.Matrix.new(gb.FP64, 3, 3)
    assert gb.reduce_to_scalar(None, gb.monoid.plus[gb.FP64], A) == 0.0
    assert gb.reduce_to_scalar(None, gb.monoid.min[gb.FP64], A) == np.inf
    assert gb.reduce_to_scalar(None, gb.monoid.lor[gb.BOOL],
                               gb.Matrix.new(gb.BOOL, 2, 2)) == False


def test_reduce_cols_desc_tran(rng):
    t = gb.FP64
    A = rand_om(rng, (5, 7), t.dtype, 0.5)
    want = orc.o_reduce_cols("plus", t.dtype, orc.OM(A.m.T, A.p.T))
    got = gb.reduce_to_vector(gb.Vector.new(t, 7), None, None,
                              gb.monoid.plus[t], to_gb(A, t), gb.TRAN0)
    assert_same(got, want, tol=1e-12)


def test_reduce_with_accum_scalar(rng):
    t = gb.INT64
    A = rand_om(rng, (3, 3), t.dtype, 0.9)
    base = orc.o_reduce_scalar("plus", t.dtype, A)
    got = gb.reduce_to_scalar(gb.binary.plus[t], gb.monoid.plus[t],
                              to_gb(A, t), c=100)
    assert got == base + 100


def test_reduce_vector_mask(rng):
    t = gb.FP64
    A = rand_om(rng, (5, 4), t.dtype, 0.6)
    w = rand_om(rng, (5,), t.dtype, 0.5)
    m = rand_om(rng, (5,), np.bool_, 0.6)
    T = orc.o_reduce_cols("max", t.dtype, A)
    want = orc.o_accum_mask(w, m, T, None, t.dtype, t.dtype, replace=False,
                            scmp=True)
    got = gb.reduce_to_vector(to_gb(w, t), to_gb(m, gb.BOOL), None,
                              gb.monoid.max[t], to_gb(A, t), gb.SCMP)
    assert_same(got, want, tol=1e-12)
