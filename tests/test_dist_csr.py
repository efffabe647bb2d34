"""Generalized distributed CSR: any-semiring sharded SpMV and the
ring-rotating masked SpGEMM, differential vs the single-chip sparse
engines on the 8-virtual-device CPU mesh (VERDICT round-2 #5)."""

import numpy as np
import pytest

import graphblas_tpu as gb
import graphblas_tpu.parallel as par
import graphblas_tpu.sparse as sp
from graphblas_tpu.core.semirings import semiring
from graphblas_tpu.sparse.container import CsrMatrix


def rand_csr(rng, r, c, nnz, t, valrange=(1, 9)):
    I = rng.integers(0, r, nnz)
    J = rng.integers(0, c, nnz)
    if np.dtype(t.dtype) == np.bool_:
        X = np.ones(nnz, bool)
    elif np.issubdtype(np.dtype(t.dtype), np.integer):
        X = rng.integers(*valrange, nnz).astype(t.dtype)
    else:
        X = rng.random(nnz).astype(t.dtype) + 0.5
    return CsrMatrix.from_coo(I, J, X, r, c, type=t)


MXV_CASES = [
    ("plus", "times", gb.FP32),
    ("min", "plus", gb.FP64),
    ("max", "second", gb.INT64),
    ("lor", "land", gb.BOOL),
    ("plus", "pair", gb.INT32),
]


@pytest.mark.parametrize("addn,multn,t", MXV_CASES,
                         ids=[f"{a}_{m}_{t.name}" for a, m, t in MXV_CASES])
def test_dist_csr_mxv_general(rng, addn, multn, t):
    n = 96
    A = rand_csr(rng, n, n, 400, t)
    sr = semiring[f"{addn}_{multn}"][t]
    if np.dtype(t.dtype) == np.bool_:
        x = rng.integers(0, 2, n).astype(bool)
    else:
        x = rng.integers(1, 5, n).astype(t.dtype)
    want, wpat = sp.csr_mxv(sr, A, x)
    mesh = par.make_mesh()
    D = par.dist_csr_from_matrix(A, mesh)
    got = np.asarray(par.dist_csr_mxv(D, x, sr))
    want = np.asarray(want)
    # distributed y is dense (identity where no contribution) — compare
    # on the structural pattern; off-pattern must be the identity
    wpat = np.asarray(wpat)
    assert np.allclose(got[wpat].astype(np.float64),
                       want[wpat].astype(np.float64), rtol=1e-5), \
        f"{addn}_{multn}"
    ident = sr.add.identity
    off = ~wpat
    assert np.allclose(got[off].astype(np.float64), float(ident)), \
        f"identity fill {addn}_{multn}"


SPGEMM_CASES = [
    ("plus", "times", gb.FP32),
    ("plus", "pair", gb.INT32),
    ("min", "plus", gb.FP64),
    ("max", "first", gb.INT32),
    ("lor", "land", gb.BOOL),
    ("times", "times", gb.FP64),
]


@pytest.mark.parametrize("addn,multn,t", SPGEMM_CASES,
                         ids=[f"{a}_{m}_{t.name}"
                              for a, m, t in SPGEMM_CASES])
def test_dist_masked_spgemm_vs_esc(rng, addn, multn, t):
    m, k, n = 48, 56, 40
    A = rand_csr(rng, m, k, 300, t)
    B = rand_csr(rng, k, n, 300, t)
    M = rand_csr(rng, m, n, 250, t)
    sr = semiring[f"{addn}_{multn}"][t]
    want = sp.csr_spgemm(sr, A, B, mask=M)
    got = par.dist_masked_spgemm(sr, A, B, M)
    wI, wJ, wX = want.extractTuples()
    gI, gJ, gX = got.extractTuples()
    wantd = {(int(i), int(j)): x for i, j, x in zip(wI, wJ, wX)}
    gotd = {(int(i), int(j)): x for i, j, x in zip(gI, gJ, gX)}
    assert set(gotd) == set(wantd), f"pattern {addn}_{multn}"
    for ij in wantd:
        assert np.isclose(float(gotd[ij]), float(wantd[ij]),
                          rtol=1e-5), f"value at {ij} {addn}_{multn}"


def test_dist_tricount_csr(rng):
    n = 200
    i = rng.integers(0, n, 1200)
    j = rng.integers(0, n, 1200)
    keep = i != j
    i, j = i[keep], j[keep]
    I = np.concatenate([i, j])
    J = np.concatenate([j, i])
    A = CsrMatrix.from_coo(I, J, np.ones(len(I), np.uint32), n, n,
                           type=gb.UINT32)
    want = sp.tricount_sparse(A)
    got = par.dist_tricount_csr(A)
    assert got == want


def test_dist_masked_spgemm_generic_monoid(rng):
    """LXOR has no scatter fold; round 3 added the generic sort-fold
    path, so this now computes instead of raising."""
    from graphblas_tpu.sparse.esc import csr_spgemm
    t = gb.BOOL
    n = 24
    Ap = np.zeros((n, n), bool)
    Ap[rng.integers(0, n, 60), rng.integers(0, n, 60)] = True
    I, J = np.nonzero(Ap)
    A = sp.CsrMatrix.from_coo(I, J, np.ones(len(I), bool), n, n, type=t)
    got = par.dist_masked_spgemm(semiring.lxor_land[t], A, A, A)
    want = csr_spgemm(semiring.lxor_land[t], A, A, mask=A)
    gI, gJ, gX = got.extractTuples()
    wI, wJ, wX = want.extractTuples()
    assert np.array_equal(gI, wI) and np.array_equal(gJ, wJ)
    assert np.array_equal(np.asarray(gX), np.asarray(wX))
