"""Sparse (CsrMatrix) assign / subassign / extract vs the numpy spec
oracles — VERDICT round-2 #4 (sparse container forms of the reference's
biggest correctness surface, GB_subassign_kernel.c)."""

import numpy as np
import pytest

import graphblas_tpu as gb
import graphblas_tpu.sparse as sp
from graphblas_tpu.sparse.container import CsrMatrix

from . import oracle as orc
from .helpers import rand_om
from .test_assign import CASES, o_assign, o_subassign
from .test_esc import csr_to_om, to_csr


@pytest.mark.parametrize("accum,replace,scmp", CASES)
def test_assign_csr(rng, accum, replace, scmp):
    t = gb.FP64
    C = rand_om(rng, (6, 7), t.dtype, 0.5)
    Ii = np.array([1, 3, 4])
    Jj = np.array([0, 2, 5, 6])
    A = rand_om(rng, (3, 4), t.dtype, 0.6)
    M = rand_om(rng, (6, 7), np.bool_, 0.5)
    want = o_assign(C, M, accum, A, Ii, Jj, replace, scmp)
    d = gb.Descriptor(replace=replace, mask_scmp=scmp)
    acc = gb.binary[accum][t] if accum else None
    got = gb.assign(to_csr(C, t), to_csr(M, gb.BOOL), acc,
                    to_csr(A, t), Ii, Jj, d)
    assert isinstance(got, CsrMatrix)
    om = csr_to_om(got)
    assert np.array_equal(om.p, want.p), f"pattern {accum} {replace} {scmp}"
    assert np.allclose(om.m[om.p], want.m[want.p])


@pytest.mark.parametrize("accum,replace,scmp", CASES)
def test_subassign_csr(rng, accum, replace, scmp):
    t = gb.FP64
    C = rand_om(rng, (6, 7), t.dtype, 0.5)
    Ii = np.array([1, 3, 4])
    Jj = np.array([0, 2, 5, 6])
    A = rand_om(rng, (3, 4), t.dtype, 0.6)
    M = rand_om(rng, (3, 4), np.bool_, 0.5)
    want = o_subassign(C, M, accum, A, Ii, Jj, replace, scmp)
    d = gb.Descriptor(replace=replace, mask_scmp=scmp)
    acc = gb.binary[accum][t] if accum else None
    got = gb.subassign(to_csr(C, t), to_csr(M, gb.BOOL), acc,
                       to_csr(A, t), Ii, Jj, d)
    assert isinstance(got, CsrMatrix)
    om = csr_to_om(got)
    assert np.array_equal(om.p, want.p), f"pattern {accum} {replace} {scmp}"
    assert np.allclose(om.m[om.p], want.m[want.p])


def test_assign_csr_scalar(rng):
    t = gb.INT32
    C = rand_om(rng, (5, 5), t.dtype, 0.4)
    Ii = np.array([0, 2])
    Jj = np.array([1, 3, 4])
    Aom = orc.OM(np.full((2, 3), 9, t.dtype), np.ones((2, 3), bool))
    want = o_assign(C, None, None, Aom, Ii, Jj, dtype=t.dtype)
    got = sp.csr_assign_scalar(to_csr(C, t), None, None, 9, Ii, Jj)
    om = csr_to_om(got)
    assert np.array_equal(om.p, want.p)
    assert np.array_equal(om.m, want.m)
    want2 = o_subassign(C, None, "plus", Aom, Ii, Jj, dtype=t.dtype)
    got2 = sp.csr_subassign_scalar(to_csr(C, t), None,
                                   gb.binary.plus[t], 9, Ii, Jj)
    om2 = csr_to_om(got2)
    assert np.array_equal(om2.p, want2.p)
    assert np.array_equal(om2.m, want2.m)


def test_subref_unsorted_indices(rng):
    t = gb.FP32
    A = rand_om(rng, (8, 9), t.dtype, 0.5)
    Ii = np.array([6, 0, 3])          # out of order
    Jj = np.array([8, 2, 2 + 3, 1])   # out of order
    T = sp.csr_subref(to_csr(A, t), Ii, Jj)
    om = csr_to_om(T)
    want_p = A.p[np.ix_(Ii, Jj)]
    want_m = A.m[np.ix_(Ii, Jj)]
    assert np.array_equal(om.p, want_p)
    assert np.array_equal(om.m[om.p], want_m[want_p])
    # CSR invariants
    ip = np.asarray(T.indptr)
    assert ip[0] == 0 and ip[-1] == T.nvals and np.all(np.diff(ip) >= 0)


@pytest.mark.parametrize("accum,replace,scmp", CASES[:4])
def test_extract_csr(rng, accum, replace, scmp):
    t = gb.FP64
    C = rand_om(rng, (3, 4), t.dtype, 0.5)
    A = rand_om(rng, (8, 9), t.dtype, 0.5)
    M = rand_om(rng, (3, 4), np.bool_, 0.5)
    Ii = np.array([1, 3, 4])
    Jj = np.array([0, 2, 5, 6])
    T = orc.OM(A.m[np.ix_(Ii, Jj)], A.p[np.ix_(Ii, Jj)])
    want = orc.o_accum_mask(C, M, T, accum, t.dtype, t.dtype,
                            replace, scmp)
    d = gb.Descriptor(replace=replace, mask_scmp=scmp)
    acc = gb.binary[accum][t] if accum else None
    got = gb.extract(to_csr(C, t), to_csr(M, gb.BOOL), acc,
                     to_csr(A, t), Ii, Jj, d)
    assert isinstance(got, CsrMatrix)
    om = csr_to_om(got)
    assert np.array_equal(om.p, want.p)
    assert np.allclose(om.m[om.p], want.m[want.p])


def test_extract_csr_A_into_bitmap(rng):
    """CsrMatrix A with bitmap C: sparse subref, no global densify."""
    t = gb.FP64
    Com = rand_om(rng, (2, 3), t.dtype, 0.5)
    A = rand_om(rng, (10, 10), t.dtype, 0.4)
    Ii = np.array([4, 7])
    Jj = np.array([0, 5, 9])
    T = orc.OM(A.m[np.ix_(Ii, Jj)], A.p[np.ix_(Ii, Jj)])
    want = orc.o_accum_mask(Com, None, T, None, t.dtype, t.dtype,
                            False, False)
    from .helpers import assert_same, to_gb
    got = gb.extract(to_gb(Com, t), None, None, to_csr(A, t), Ii, Jj)
    assert_same(got, want)


def test_duplicate_indices_raise(rng):
    t = gb.FP64
    C = to_csr(rand_om(rng, (6, 6), t.dtype, 0.5), t)
    A = to_csr(rand_om(rng, (2, 2), t.dtype, 0.5), t)
    with pytest.raises(gb.InvalidValue):
        gb.assign(C, None, None, A, [1, 1], [2, 3])
    with pytest.raises(gb.InvalidValue):
        sp.csr_subref(C, [0, 0], [1, 2])


def test_assign_csr_large_dimension(rng):
    """n = 100_000 CsrMatrix C: assign and extract without any dense
    intermediate (VERDICT 'done' criterion)."""
    n = 100_000
    nnz = 5000
    I = rng.integers(0, n, nnz)
    J = rng.integers(0, n, nnz)
    X = rng.random(nnz)
    C = CsrMatrix.from_coo(I, J, X, n, n, type=gb.FP64)
    base = C.nvals
    # subassign a dense 3x3 block into distant rows
    Ii = np.array([5, 70_000, 99_999])
    Jj = np.array([0, 50_000, 99_998])
    A = CsrMatrix.from_coo(
        np.repeat(np.arange(3), 3), np.tile(np.arange(3), 3),
        np.arange(9, dtype=np.float64) + 1.0, 3, 3, type=gb.FP64)
    got = gb.subassign(C, None, None, A, Ii, Jj)
    # every region slot now holds A's value
    gI, gJ, gX = got.extractTuples()
    vals = {(int(i), int(j)): x for i, j, x in zip(gI, gJ, gX)}
    for a in range(3):
        for b in range(3):
            assert vals[(int(Ii[a]), int(Jj[b]))] == a * 3 + b + 1.0
    # entries outside the region are untouched
    cI, cJ, cX = C.extractTuples()
    region_r = set(Ii.tolist())
    region_c = set(Jj.tolist())
    for i, j, x in zip(cI, cJ, cX):
        if not (int(i) in region_r and int(j) in region_c):
            assert vals[(int(i), int(j))] == x
    # extraction of a 4-row x full-width slab
    T = sp.csr_subref(got, [5, 6, 70_000, 99_999], None)
    assert T.shape == (4, n)
    tI, tJ, tX = T.extractTuples()
    for i, j, x in zip(tI, tJ, tX):
        src = [5, 6, 70_000, 99_999][int(i)]
        assert vals.get((src, int(j))) == x
    assert base == C.nvals  # inputs immutable
