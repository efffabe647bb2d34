"""HyperCscMatrix: the by-column hypersparse orientation (the fourth
storage format, ``GB_matrix.h:41-132`` is_csc x is_hyper) as a
zero-copy transpose wrapper.  Every op runs in the transposed frame on
the wrapped by-row container and must match the by-row oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import graphblas_tpu as gb
from graphblas_tpu.sparse import CsrMatrix, HyperCscMatrix, HyperMatrix
from graphblas_tpu.sparse import hyper_from_coo

BIG = 1 << 40


def _pair(rng, n=BIG, k=40, seed=0):
    r = np.random.default_rng(seed)
    I = r.integers(0, n, k)
    J = r.integers(0, n, k)
    X = r.random(k)
    return I, J, X


def _dense_map(H):
    I, J, X = H.extractTuples()
    return {(int(i), int(j)): float(x)
            for i, j, x in zip(np.asarray(I), np.asarray(J),
                               np.asarray(X))}


def test_construct_and_metadata(rng):
    I, J, X = _pair(rng)
    A = HyperCscMatrix.from_coo(I, J, X, BIG, BIG, type=gb.FP64)
    Ar = hyper_from_coo(I, J, X, BIG, BIG, type=gb.FP64)
    assert A.shape == (BIG, BIG)
    assert A.nvals == Ar.nvals
    assert _dense_map(A) == _dense_map(Ar)
    # transpose is free and exact
    T = A.T()
    assert isinstance(T, HyperMatrix)
    assert _dense_map(T) == {(j, i): v
                             for (i, j), v in _dense_map(Ar).items()}
    # by-row conversion round-trips
    assert _dense_map(A.to_hyper()) == _dense_map(Ar)
    assert _dense_map(HyperCscMatrix.from_hyper(Ar)) == _dense_map(Ar)


def test_element_ops_2e40(rng):
    A = HyperCscMatrix.from_coo(np.array([1, BIG - 2]),
                                np.array([BIG - 1, 3]),
                                np.array([1.5, 2.5]), BIG, BIG,
                                type=gb.FP64)
    A = A.setElement(9.25, 7, BIG - 5).wait()
    assert A.extractElement(7, BIG - 5) == 9.25
    assert A.extractElement(1, BIG - 1) == 1.5
    A = A.removeElement(1, BIG - 1).wait()
    assert A.extractElement(1, BIG - 1) is None
    assert A.nvals == 2


def test_ewise_add_masked_matches_by_row(rng):
    n = 1 << 30
    I1, J1, X1 = _pair(rng, n, 30, seed=1)
    I2, J2, X2 = _pair(rng, n, 30, seed=2)
    MI, MJ = np.concatenate([I1[:15], I2[:15]]), \
        np.concatenate([J1[:15], J2[:15]])
    Ac = HyperCscMatrix.from_coo(I1, J1, X1, n, n, type=gb.FP64)
    Bc = HyperCscMatrix.from_coo(I2, J2, X2, n, n, type=gb.FP64)
    Mc = HyperCscMatrix.from_coo(MI, MJ, np.ones(len(MI), bool), n, n,
                                 type=gb.BOOL, dup="lor")
    Cc = HyperCscMatrix.from_coo(np.array([], int), np.array([], int),
                                 np.array([], float), n, n, type=gb.FP64)
    got = gb.eWiseAdd(Cc, Mc, None, gb.binary.plus[gb.FP64], Ac, Bc)
    assert isinstance(got, HyperCscMatrix)
    # by-row oracle
    Ar = hyper_from_coo(I1, J1, X1, n, n, type=gb.FP64)
    Br = hyper_from_coo(I2, J2, X2, n, n, type=gb.FP64)
    Mr = hyper_from_coo(MI, MJ, np.ones(len(MI), bool), n, n,
                        type=gb.BOOL, dup="lor")
    Cr = hyper_from_coo(np.array([], int), np.array([], int),
                        np.array([], float), n, n, type=gb.FP64)
    want = gb.eWiseAdd(Cr, Mr, None, gb.binary.plus[gb.FP64], Ar, Br)
    assert _dense_map(got) == _dense_map(want)


def test_apply_select_reduce(rng):
    n = 1 << 35
    I, J, X = _pair(rng, n, 25, seed=3)
    Ac = HyperCscMatrix.from_coo(I, J, X, n, n, type=gb.FP64)
    Ar = hyper_from_coo(I, J, X, n, n, type=gb.FP64)
    E = lambda: HyperCscMatrix.from_coo(
        np.array([], int), np.array([], int), np.array([], float),
        n, n, type=gb.FP64)
    Er = lambda: hyper_from_coo(
        np.array([], int), np.array([], int), np.array([], float),
        n, n, type=gb.FP64)
    got = gb.apply(E(), None, None, gb.unary.ainv[gb.FP64], Ac)
    want = gb.apply(Er(), None, None, gb.unary.ainv[gb.FP64], Ar)
    assert _dense_map(got) == _dense_map(want)
    # tril select is index-dependent: the transposed frame must still
    # apply it to the ORIGINAL coordinates
    got = gb.select(E(), None, None, gb.selectop.tril, Ac, 0)
    want = gb.select(Er(), None, None, gb.selectop.tril, Ar, 0)
    assert _dense_map(got) == _dense_map(want)
    # reduce-all is orientation-invariant
    s1 = gb.reduce(None, gb.monoid.plus[gb.FP64], Ac)
    s2 = gb.reduce(None, gb.monoid.plus[gb.FP64], Ar)
    assert abs(s1 - s2) < 1e-12


def test_mxm_by_col_output(rng):
    n = 200  # small enough to check against the dense oracle
    r = np.random.default_rng(5)
    I = r.integers(0, n, 150)
    J = r.integers(0, n, 150)
    X = r.random(150)
    Ac = HyperCscMatrix.from_coo(I, J, X, n, n, type=gb.FP64)
    Ar = hyper_from_coo(I, J, X, n, n, type=gb.FP64)
    Cc = HyperCscMatrix.from_coo(np.array([], int), np.array([], int),
                                 np.array([], float), n, n, type=gb.FP64)
    got = gb.mxm(Cc, None, None, gb.semiring.plus_times[gb.FP64], Ac, Ac)
    assert isinstance(got, HyperCscMatrix)
    D = np.zeros((n, n))
    D[np.asarray(hyper_from_coo(I, J, X, n, n, type=gb.FP64)
                 .extractTuples()[0], dtype=int),
      np.asarray(Ar.extractTuples()[1], dtype=int)] = \
        np.asarray(Ar.extractTuples()[2])
    want = D @ D
    gm = _dense_map(got)
    for (i, j), v in gm.items():
        assert abs(v - want[i, j]) < 1e-9
    # every nonzero of the true product with a nonzero value appears
    nz = {(i, j) for i, j in zip(*np.nonzero(want))}
    assert set(gm) <= nz | set(gm)


def test_assign_subassign_extract(rng):
    n = 1 << 30
    I, J, X = _pair(rng, n, 20, seed=7)
    Ac = HyperCscMatrix.from_coo(I, J, X, n, n, type=gb.FP64)
    Ar = hyper_from_coo(I, J, X, n, n, type=gb.FP64)
    rows = np.array([5, n - 3, 77])
    cols = np.array([n - 1, 12])
    sub = np.arange(6, dtype=float).reshape(3, 2)
    SI, SJ = np.nonzero(sub + 1)
    Sc = HyperCscMatrix.from_coo(SI, SJ, sub[SI, SJ], 3, 2, type=gb.FP64)
    Sr = hyper_from_coo(SI, SJ, sub[SI, SJ], 3, 2, type=gb.FP64)
    got = gb.subassign(Ac, None, None, Sc, rows, cols)
    want = gb.subassign(Ar, None, None, Sr, rows, cols)
    assert isinstance(got, HyperCscMatrix)
    assert _dense_map(got) == _dense_map(want)
    got = gb.assign(Ac, None, None, Sc, rows, cols)
    want = gb.assign(Ar, None, None, Sr, rows, cols)
    assert _dense_map(got) == _dense_map(want)
    # extract a region back out
    Ec = HyperCscMatrix.from_coo(np.array([], int), np.array([], int),
                                 np.array([], float), 3, 2, type=gb.FP64)
    Er = hyper_from_coo(np.array([], int), np.array([], int),
                        np.array([], float), 3, 2, type=gb.FP64)
    got = gb.extract(Ec, None, None, Ac, rows, cols)
    want = gb.extract(Er, None, None, Ar, rows, cols)
    assert _dense_map(got) == _dense_map(want)


def test_transpose_op_and_import_export(rng):
    n = 1 << 33
    I, J, X = _pair(rng, n, 15, seed=9)
    Ar = hyper_from_coo(I, J, X, n, n, type=gb.FP64)
    Ec = HyperCscMatrix.from_coo(np.array([], int), np.array([], int),
                                 np.array([], float), n, n, type=gb.FP64)
    got = gb.transpose(Ec, None, None, Ar)
    assert isinstance(got, HyperCscMatrix)
    assert _dense_map(got) == {(j, i): v
                               for (i, j), v in _dense_map(Ar).items()}
    # hyper-CSC export: h lists nonempty COLUMNS
    Ac = HyperCscMatrix.from_hyper(Ar)
    nrows, ncols, nvec, h, p, idx, vals = gb.export_hyper_csc(Ac)
    assert (nrows, ncols) == (n, n)
    back = gb.import_hyper_csc(nrows, ncols, nvec, h, p, idx, vals,
                               type=gb.FP64)
    assert _dense_map(back) == _dense_map(Ar)


def test_mxv_vxm_with_hyper_csc_input(rng):
    # hyper-CSC as an mxv/vxm INPUT at modest dimension (bitmap route)
    n = 64
    r = np.random.default_rng(11)
    I = r.integers(0, n, 200)
    J = r.integers(0, n, 200)
    lin = np.unique(I * n + J)
    I, J = lin // n, lin % n
    X = r.random(len(I))
    Ac = HyperCscMatrix.from_coo(I, J, X, n, n, type=gb.FP64)
    D = np.zeros((n, n))
    D[I, J] = X
    u = gb.Vector.from_dense(np.arange(n, dtype=float))
    w = gb.mxv(gb.Vector.new(gb.FP64, n), None, None,
               gb.semiring.plus_times[gb.FP64], Ac, u)
    want = D @ np.arange(n)
    assert np.allclose(np.asarray(w.to_dense()), want)
    w2 = gb.vxm(gb.Vector.new(gb.FP64, n), None, None,
                gb.semiring.plus_times[gb.FP64], u, Ac)
    assert np.allclose(np.asarray(w2.to_dense()), np.arange(n) @ D)
