"""UDT values on the CSR container + the UDT PageRank semiring through
the generic pytree SpMV (VERDICT round-2 #8)."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.monoids import monoid_new
from graphblas_tpu.core.ops import BinaryOp
from graphblas_tpu.core.semirings import semiring_new
from graphblas_tpu.core.types import BOOL, FP64, Type
from graphblas_tpu.models.pagerank import (PAGERANK_TYPE, dpagerank2,
                                           dpagerank2_csr)
from graphblas_tpu.sparse.container import CsrMatrix
from graphblas_tpu.sparse.spmv import csr_mxv, segment_reduce_sorted


POINT = Type.udt("point", x=FP64, y=FP64)


def test_udt_csr_roundtrip(rng):
    n = 20
    nnz = 40
    I = rng.integers(0, n, nnz)
    J = rng.integers(0, n, nnz)
    lin = I * n + J
    _, keep = np.unique(lin, return_index=True)
    I, J = I[keep], J[keep]
    X = {"x": rng.random(len(I)), "y": rng.random(len(I))}
    A = CsrMatrix.from_coo(I, J, X, n, n, type=POINT,
                           sum_duplicates=False)
    Ig, Jg, Xg = A.extractTuples()
    order = np.lexsort((J, I))
    assert np.array_equal(Ig, I[order]) and np.array_equal(Jg, J[order])
    assert np.allclose(Xg["x"], X["x"][order])
    assert np.allclose(Xg["y"], X["y"][order])
    # to bitmap and back
    M = A.to_matrix()
    B = CsrMatrix.from_matrix(M)
    Ib, Jb, Xb = B.extractTuples()
    assert np.array_equal(Ib, Ig) and np.allclose(Xb["y"], Xg["y"])
    # transpose keeps values attached to their entries
    T = A.T()
    It, Jt, Xt = T.extractTuples()
    want = {(int(j), int(i)): (float(x), float(y))
            for i, j, x, y in zip(Ig, Jg, Xg["x"], Xg["y"])}
    got = {(int(i), int(j)): (float(x), float(y))
           for i, j, x, y in zip(It, Jt, Xt["x"], Xt["y"])}
    assert got == want


def test_udt_duplicate_rejected(rng):
    I = np.array([1, 1])
    J = np.array([2, 2])
    X = {"x": np.ones(2), "y": np.ones(2)}
    with pytest.raises(TypeError):
        CsrMatrix.from_coo(I, J, X, 4, 4, type=POINT)


def test_segment_reduce_sorted_udt():
    add = BinaryOp("PADD", lambda a, b: {"x": a["x"] + b["x"],
                                         "y": a["y"] * b["y"]},
                   POINT, POINT, POINT)
    seg = jnp.asarray(np.array([0, 0, 2, 2, 2, 5], np.int32))
    vals = {"x": jnp.arange(6, dtype=jnp.float64),
            "y": jnp.arange(1, 7, dtype=jnp.float64)}
    out = segment_reduce_sorted(add, {"x": 0.0, "y": 1.0}, vals, seg, 6)
    assert np.allclose(np.asarray(out["x"]), [1, 0, 9, 0, 0, 5])
    assert np.allclose(np.asarray(out["y"]), [2, 1, 60, 1, 1, 6])


def test_udt_csr_mxv_matches_manual(rng):
    """Generic pytree SpMV vs a dense manual computation."""
    n = 30
    nnz = 90
    I = rng.integers(0, n, nnz)
    J = rng.integers(0, n, nnz)
    A = CsrMatrix.from_coo(I, J, np.ones(nnz, bool), n, n, type=BOOL)
    x = {"x": jnp.asarray(rng.random(n)), "y": jnp.asarray(rng.random(n))}
    mult = BinaryOp("PMUL", lambda a, xx: {
        "x": jnp.where(jnp.asarray(a, bool), xx["x"], 0.0),
        "y": jnp.zeros_like(xx["y"])}, POINT, BOOL, POINT)
    add = BinaryOp("PADD", lambda a, b: {"x": a["x"] + b["x"],
                                         "y": a["y"] + b["y"]},
                   POINT, POINT, POINT)
    mon = monoid_new(add, {"x": 0.0, "y": 0.0})
    sr = semiring_new(mon, mult)
    y, ypat = csr_mxv(sr, A, x)
    D = np.zeros((n, n))
    Ig, Jg, _ = A.extractTuples()
    D[Ig, Jg] = 1.0
    want = D @ np.asarray(x["x"])
    got = np.asarray(y["x"])
    rows = D.sum(axis=1) > 0
    assert np.array_equal(np.asarray(ypat), rows)
    assert np.allclose(got[rows], want[rows])
    assert np.allclose(got[~rows], 0.0)


def _graph(rng, n, nedges):
    i = rng.integers(0, n, nedges)
    j = rng.integers(0, n, nedges)
    keep = i != j
    return i[keep], j[keep]


def test_dpagerank2_csr_matches_bitmap(rng):
    n = 60
    I, J = _graph(rng, n, 300)
    # dedup: the bitmap build folds duplicates (lor), padded CSR with
    # sum_duplicates=False would keep both copies
    lin = np.unique(I * n + J)
    I, J = lin // n, lin % n
    X = np.ones(len(I), bool)
    A_bm = Matrix.from_coo(I, J, X, n, n, type=BOOL,
                           dup=None)
    A_csr = CsrMatrix.from_coo(I, J, X, n, n, type=BOOL,
                               sum_duplicates=False)
    want, it_w = dpagerank2(A_bm, itermax=50)
    got, it_g = dpagerank2_csr(A_csr, itermax=50)
    assert it_w == it_g
    wd = {p: r for p, r in want}
    gd = {p: r for p, r in got}
    assert set(wd) == set(gd)
    for p in wd:
        assert abs(wd[p] - gd[p]) < 1e-10
