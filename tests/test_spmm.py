"""SpMM (CSR x dense bitmap, dense output) differential tests.

Oracle: the bitmap backend's semiring_mm on the densified A — the same
product the SpMM gather kernel must reproduce bit-for-bit (ints) /
within roundoff (floats, cumsum reassociation)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import sparse as sp
from graphblas_tpu.core.semirings import semiring
from graphblas_tpu.ops.flopcount import last_axb_method


def _rand_csr(m, n, density, seed, dtype=np.float64):
    rng = np.random.default_rng(seed)
    mask = rng.random((m, n)) < density
    vals = (rng.normal(size=(m, n)) * mask).astype(dtype)
    I, J = np.nonzero(mask)
    return sp.CsrMatrix.from_coo(I, J, vals[I, J], m, n,
                                 type=gb.FP64 if dtype == np.float64
                                 else gb.FP32), vals, mask


def _dense_b(n, k, seed, holes=False):
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=(n, k))
    pat = (rng.random((n, k)) < 0.7) if holes else np.ones((n, k), bool)
    M = gb.Matrix.from_dense(np.where(pat, vals, 0.0), gb.FP64)
    if holes:
        M = gb.Matrix.from_coo(*np.nonzero(pat),
                               vals[pat], n, k, type=gb.FP64)
    return M, np.where(pat, vals, 0.0), pat


@pytest.mark.parametrize("srname", ["plus_times", "min_plus",
                                    "max_first", "plus_pair"])
def test_spmm_semirings(srname):
    A, Ad, Ap = _rand_csr(60, 45, 0.15, 3)
    B, Bd, Bp = _dense_b(45, 17, 4)
    sr = getattr(semiring, srname)[gb.FP64]
    C = gb.Matrix.new(gb.FP64, 60, 17)
    got = gb.mxm(C, None, None, sr, A, B)
    assert last_axb_method() == "spmm:ell"
    # oracle through the bitmap backend
    Abm = A.to_matrix()
    want = gb.mxm(gb.Matrix.new(gb.FP64, 60, 17), None, None, sr, Abm, B)
    assert np.array_equal(got.pattern_np(), want.pattern_np())
    assert np.allclose(got.to_dense(), want.to_dense(), rtol=1e-12)


def test_spmm_holes_mask_accum_transpose():
    A, Ad, Ap = _rand_csr(40, 40, 0.2, 5)
    B, Bd, Bp = _dense_b(40, 9, 6, holes=True)
    sr = semiring.plus_times[gb.FP64]
    # mask + accum + REPLACE, plus input transpose on A
    rng = np.random.default_rng(7)
    Mpat = rng.random((40, 9)) < 0.5
    M = gb.Matrix.from_coo(*np.nonzero(Mpat),
                           np.ones(Mpat.sum()), 40, 9, type=gb.BOOL)
    C0 = gb.Matrix.from_dense(rng.normal(size=(40, 9)), gb.FP64)
    d = gb.Descriptor(tran0=True, replace=True)
    got = gb.mxm(C0, M, gb.binary.plus[gb.FP64], sr, A, B, d)
    assert last_axb_method() == "spmm:ell"
    want = gb.mxm(C0, M, gb.binary.plus[gb.FP64], sr, A.to_matrix(), B, d)
    assert np.array_equal(got.pattern_np(), want.pattern_np())
    gd, wd = got.to_dense(), want.to_dense()
    assert np.allclose(gd, wd, rtol=1e-12)


def test_spmm_bool_and_int():
    rng = np.random.default_rng(8)
    Ap = rng.random((30, 25)) < 0.2
    I, J = np.nonzero(Ap)
    A = sp.CsrMatrix.from_coo(I, J, np.ones(len(I), bool), 30, 25,
                              type=gb.BOOL)
    Bp = np.ones((25, 6), bool)
    Bv = rng.random((25, 6)) < 0.5
    B = gb.Matrix.from_dense(Bv, gb.BOOL)
    sr = semiring.lor_land[gb.BOOL]
    got = gb.mxm(gb.Matrix.new(gb.BOOL, 30, 6), None, None, sr, A, B)
    want = (Ap.astype(int) @ Bv.astype(int)) > 0
    assert np.array_equal(got.to_dense().astype(bool), want)
    # int32 exactness through the widened cumsum
    Ai = sp.CsrMatrix.from_coo(I, J, rng.integers(-9, 9, len(I)), 30, 25,
                               type=gb.INT32)
    Bi = gb.Matrix.from_dense(rng.integers(-9, 9, (25, 6)), gb.INT32)
    sri = semiring.plus_times[gb.INT32]
    goti = gb.mxm(gb.Matrix.new(gb.INT32, 30, 6), None, None, sri, Ai, Bi)
    wanti = (np.asarray(Ai.to_matrix().to_dense()).astype(np.int64) @
             np.asarray(Bi.to_dense()).astype(np.int64)).astype(np.int32)
    assert np.array_equal(goti.to_dense(), wanti)


def test_spmm_empty_rows_pattern():
    # rows with no entries must be absent from the output pattern
    A = sp.CsrMatrix.from_coo([1], [2], [3.0], 4, 5, type=gb.FP64)
    B = gb.Matrix.from_dense(np.ones((5, 3)), gb.FP64)
    sr = semiring.plus_times[gb.FP64]
    got = gb.mxm(gb.Matrix.new(gb.FP64, 4, 3), None, None, sr, A, B)
    pat = got.pattern_np()
    assert pat[1].all() and not pat[[0, 2, 3]].any()
