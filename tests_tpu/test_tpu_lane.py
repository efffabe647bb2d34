"""Real-chip correctness lane (VERDICT round-2 #7): the MXU/Pallas/
bitpack paths that the CPU suite only exercises in interpret mode,
plus the np_bool staging convention and int8 exactness — each checked
against an independent numpy oracle on the device itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.semirings import semiring
from graphblas_tpu.sparse.container import CsrMatrix
import graphblas_tpu.sparse as sp


def sym_graph(rng, n, nedges):
    i = rng.integers(0, n, nedges)
    j = rng.integers(0, n, nedges)
    keep = i != j
    lin = np.unique(i[keep] * n + j[keep])
    i, j = lin // n, lin % n
    I = np.concatenate([i, j])
    J = np.concatenate([j, i])
    lin = np.unique(I * n + J)
    return lin // n, lin % n


def test_mxu_plus_times_f32(rng):
    """Dense MXU semiring matmul vs numpy (f32 tolerance)."""
    m, k, n = 160, 224, 96
    a = rng.random((m, k)).astype(np.float32)
    b = rng.random((k, n)).astype(np.float32)
    A = Matrix.from_dense(a, type=gb.FP32)
    B = Matrix.from_dense(b, type=gb.FP32)
    C = gb.mxm(Matrix.new(gb.FP32, m, n), None, None,
               semiring.plus_times[gb.FP32], A, B)
    got = np.asarray(C.wait().values)
    assert np.allclose(got, a @ b, rtol=1e-4)


def test_int8_counting_exact(rng):
    """Pattern/counting matmul exactness through the int8 MXU path:
    counts up to k=224 must be exact integers."""
    m, k, n = 96, 224, 64
    a = rng.random((m, k)) < 0.5
    b = rng.random((k, n)) < 0.5
    A = Matrix.from_dense(a.astype(np.uint32), type=gb.UINT32,
                          pattern=a)
    B = Matrix.from_dense(b.astype(np.uint32), type=gb.UINT32,
                          pattern=b)
    C = gb.mxm(Matrix.new(gb.UINT32, m, n), None, None,
               semiring.plus_times[gb.UINT32], A, B)
    got = np.asarray(C.wait().values)
    want = a.astype(np.int64) @ b.astype(np.int64)
    pat = np.asarray(gb.np_bool(C.wait().pattern)) \
        if hasattr(gb, "np_bool") else None
    assert np.array_equal(got.astype(np.int64)[want > 0], want[want > 0])


def test_tricount_engines_agree(rng):
    """BSR Pallas kernel vs CSR counting engine vs dense oracle."""
    n = 600
    I, J = sym_graph(rng, n, 6000)
    D = np.zeros((n, n), np.int64)
    D[I, J] = 1
    want = int(np.trace(D @ D @ D)) // 6
    A_csr = CsrMatrix.from_coo(I, J, np.ones(len(I), np.uint32), n, n,
                               type=gb.UINT32)
    L = sp.csr_tril(A_csr)
    U = sp.csr_triu(A_csr)
    assert sp.tricount_esc(L, U) == want
    A_bm = Matrix.from_coo(I, J, np.ones(len(I), bool), n, n,
                           type=gb.BOOL)
    assert sp.tricount_sparse(A_bm) == want


def test_tropical_minplus(rng):
    """Tropical (MIN_PLUS) engine on the chip vs numpy oracle."""
    n = 128
    a = rng.random((n, n)).astype(np.float32)
    b = rng.random((n, n)).astype(np.float32)
    A = Matrix.from_dense(a, type=gb.FP32)
    B = Matrix.from_dense(b, type=gb.FP32)
    C = gb.mxm(Matrix.new(gb.FP32, n, n), None, None,
               semiring.min_plus[gb.FP32], A, B)
    got = np.asarray(C.wait().values)
    want = np.min(a[:, :, None] + b[None, :, :], axis=1)
    assert np.allclose(got, want, rtol=1e-5)


def test_np_bool_staging(rng):
    """bool device->host transfers stage through uint8 (the tunnel's
    bool path is ~1000x slow); np_bool must round-trip exactly."""
    from graphblas_tpu.core.matrix import np_bool
    pat = jnp.asarray(rng.random((64, 64)) < 0.3)
    host = np_bool(pat)
    assert host.dtype == np.bool_
    assert np.array_equal(host, np.asarray(pat))


def test_spmv_semirings_on_chip(rng):
    """csr_mxv on TPU for a few semirings vs dense oracle."""
    n = 300
    I, J = sym_graph(rng, n, 2000)
    X = (rng.random(len(I)) + 0.5).astype(np.float32)
    A = CsrMatrix.from_coo(I, J, X, n, n, type=gb.FP32,
                           sum_duplicates=False)
    x = (rng.random(n) + 0.5).astype(np.float32)
    D = np.zeros((n, n), np.float64)
    D[I, J] = X
    y, ypat = sp.csr_mxv(semiring.plus_times[gb.FP32], A, x)
    rows = D.sum(axis=1) != 0
    assert np.allclose(np.asarray(y)[rows], (D @ x)[rows], rtol=1e-4)
    y2, _ = sp.csr_mxv(semiring.min_plus[gb.FP32], A, x)
    want2 = np.where(rows, np.min(np.where(D > 0, D + x[None, :],
                                           np.inf), axis=1), 0)
    assert np.allclose(np.asarray(y2)[rows], want2[rows], rtol=1e-5)


def test_bsr_spmv_on_chip(rng):
    """Single-dispatch Pallas BSR SpMV compiled for the real MXU."""
    from graphblas_tpu.sparse.pallas_spmv import bsr_spmv, bsr_spmv_ok
    n = 500
    I, J = sym_graph(rng, n, 6000)
    X = (rng.random(len(I)) + 0.5).astype(np.float32)
    A = CsrMatrix.from_coo(I, J, X, n, n, type=gb.FP32,
                           sum_duplicates=False)
    x = (rng.random(n) + 0.5).astype(np.float32)
    sr = semiring.plus_times[gb.FP32]
    assert bsr_spmv_ok(sr, A)
    y, ypat = bsr_spmv(sr, A, jnp.asarray(x), interpret=False)
    D = np.zeros((n, n), np.float64)
    D[I, J] = X
    rows = (D != 0).any(axis=1)
    assert np.array_equal(np.asarray(ypat), rows)
    assert np.allclose(np.asarray(y)[rows], (D @ x)[rows], rtol=1e-4)
