"""CscMatrix: the by-col orientation twin (reference GxB_BY_COL /
is_csc, GB_matrix.h:394) — zero-copy CSC import/export, free
transpose, native vxm."""

import numpy as np
import jax.numpy as jnp
import pytest

import graphblas_tpu as gb
import graphblas_tpu.sparse as sp
from graphblas_tpu.core.semirings import semiring
from graphblas_tpu.core.descriptor import Descriptor
from graphblas_tpu.sparse.container import CscMatrix, CsrMatrix


def _rand(nr, nc, nnz, seed=0):
    rng = np.random.default_rng(seed)
    I = rng.integers(0, nr, nnz)
    J = rng.integers(0, nc, nnz)
    X = rng.normal(size=nnz)
    D = np.zeros((nr, nc))
    D[I, J] = 0
    A = CscMatrix.from_coo(I, J, X, nr, nc, type=gb.FP64)
    I2, J2, X2 = A.extractTuples()
    D[I2, J2] = X2
    return A, D


def test_csc_metadata_and_roundtrip():
    A, D = _rand(9, 5, 30)
    assert A.shape == (9, 5)
    assert A.nrows == 9 and A.ncols == 5
    assert np.allclose(A.to_matrix().to_dense(), D)
    # extractTuples comes back in column order
    I, J, X = A.extractTuples()
    lin = J * 9 + I
    assert np.all(np.diff(lin) > 0)
    # CSR <-> CSC conversions agree
    assert np.allclose(A.to_csr().to_matrix().to_dense(), D)
    assert np.allclose(CscMatrix.from_csr(A.to_csr()).to_matrix()
                       .to_dense(), D)


def test_csc_free_transpose():
    A, D = _rand(7, 4, 20, seed=3)
    T = A.T()
    assert isinstance(T, CsrMatrix)
    # no resort happened: the arrays are the same objects
    assert T is A.tr
    assert np.allclose(T.to_matrix().to_dense(), D.T)


def test_csc_import_export_zero_copy():
    A, D = _rand(8, 6, 25, seed=1)
    nr, nc, p, i, x = gb.export_csc(A)
    assert nr == 8 and nc == 6
    B = gb.import_csc(nr, nc, p, i, x, gb.FP64)
    assert isinstance(B, CscMatrix)
    assert np.allclose(B.to_matrix().to_dense(), D)
    # CSC export of the CSC container is its own storage (no resort):
    # column pointers are monotone and sum to nvals
    assert p[0] == 0 and p[-1] == A.nvals


@pytest.mark.parametrize("tran", [False, True])
def test_csc_mxv(tran):
    A, D = _rand(10, 8, 40, seed=5)
    x = np.random.default_rng(9).normal(size=10 if tran else 8)
    u = gb.Vector.from_dense(x, gb.FP64)
    sr = semiring.plus_times[gb.FP64]
    d = Descriptor(tran0=True) if tran else None
    w = gb.mxv(gb.Vector.new(gb.FP64, 8 if tran else 10), None, None,
               sr, A, u, d)
    want = (D.T @ x) if tran else (D @ x)
    got = np.where(w.pattern_np(), w.to_dense(), 0)
    ref = np.where((D.T if tran else D).astype(bool).any(axis=1) != 0,
                   want, 0)
    # pattern: rows with any structural entry
    pat = (D.T != 0) if tran else (D != 0)
    ref = np.where(pat.any(axis=1), want, 0)
    assert np.allclose(got, ref)


@pytest.mark.parametrize("tran", [False, True])
def test_csc_vxm(tran):
    A, D = _rand(10, 8, 40, seed=6)
    x = np.random.default_rng(8).normal(size=8 if tran else 10)
    u = gb.Vector.from_dense(x, gb.FP64)
    sr = semiring.plus_times[gb.FP64]
    d = Descriptor(tran1=True) if tran else None
    w = gb.vxm(gb.Vector.new(gb.FP64, 10 if tran else 8), None, None,
               u, sr, A, d) if False else \
        gb.vxm(gb.Vector.new(gb.FP64, 10 if tran else 8), None, None,
               sr, u, A, d)
    want = (x @ D.T) if tran else (x @ D)
    pat = (D != 0).any(axis=1) if tran else (D != 0).any(axis=0)
    got = np.where(w.pattern_np(), w.to_dense(), 0)
    assert np.allclose(got, np.where(pat, want, 0))


def test_csc_mxm_routes_through_csr():
    A, D = _rand(6, 7, 22, seed=2)
    B, E = _rand(7, 5, 20, seed=4)
    sr = semiring.plus_times[gb.FP64]
    C = gb.mxm(gb.Matrix.new(gb.FP64, 6, 5), None, None, sr,
               A.to_csr(), B)   # mixed CSR x CSC
    want = D @ E
    pat = (D != 0).astype(np.int64) @ (E != 0).astype(np.int64) > 0
    got = np.where(C.to_matrix().pattern_np() if hasattr(C, "to_matrix")
                   else C.pattern_np(),
                   C.to_matrix().to_dense() if hasattr(C, "to_matrix")
                   else C.to_dense(), 0)
    assert np.allclose(got, np.where(pat, want, 0))
