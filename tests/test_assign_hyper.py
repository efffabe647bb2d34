"""assign / subassign / extract on HyperMatrix (pair keys, dims > 2^40)
and the by-col CscMatrix frame (VERDICT r2 missing #3).

Reference: ``GB_subassign_kernel.c:10-62`` is format-agnostic; specs
``Test/GB_spec_assign.m`` / ``GB_spec_subassign.m``.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core.errors import InvalidValue
from graphblas_tpu.sparse.container import CsrMatrix, CscMatrix
from graphblas_tpu.sparse.hyper import HyperMatrix

from . import oracle as orc
from .helpers import rand_om


def om_to(kind, o, t):
    I, J = np.nonzero(o.p)
    X = o.m[I, J]
    m, n = o.p.shape
    if kind == "csr":
        return CsrMatrix.from_coo(I, J, X, m, n, type=t,
                                  sum_duplicates=False)
    if kind == "csc":
        return CscMatrix.from_coo(I, J, X, m, n, type=t,
                                  sum_duplicates=False)
    return HyperMatrix.from_coo(I, J, X, m, n, type=t, dup=None)


def to_om(X, shape, dtype):
    I, J, V = X.extractTuples()
    m = np.zeros(shape, dtype)
    p = np.zeros(shape, bool)
    m[I, J] = np.asarray(V).astype(dtype)
    p[I, J] = True
    return orc.OM(m, p)


def o_subassign(C, M, A, Ii, Jj, accum_name, dtype, replace, scmp):
    """Dense oracle for GxB_subassign (GB_spec_subassign.m)."""
    S = orc.OM(C.m[np.ix_(Ii, Jj)], C.p[np.ix_(Ii, Jj)])
    Snew = orc.o_accum_mask(S, M, A, accum_name, dtype, dtype,
                            replace=replace, scmp=scmp)
    out = C.copy()
    out.m[np.ix_(Ii, Jj)] = Snew.m
    out.p[np.ix_(Ii, Jj)] = Snew.p
    return out


def o_assign(C, M, A, Ii, Jj, accum_name, dtype, replace, scmp):
    """Dense oracle for GrB_assign (GB_spec_assign.m)."""
    S = orc.OM(C.m[np.ix_(Ii, Jj)], C.p[np.ix_(Ii, Jj)])
    Sacc = orc.o_accum_mask(S, None, A, accum_name, dtype, dtype)
    Z = C.copy()
    Z.m[np.ix_(Ii, Jj)] = Sacc.m
    Z.p[np.ix_(Ii, Jj)] = Sacc.p
    return orc.o_mask(C, M, Z, replace=replace, scmp=scmp)


@pytest.mark.parametrize("kind", ["hyper", "csc"])
def test_subassign_sweep(rng, kind):
    t = gb.FP64
    Ii = np.array([5, 1, 3])
    Jj = np.array([0, 4, 2, 6])
    for accum_name in (None, "plus"):
        for has_mask in (False, True):
            for replace in (False, True):
                for scmp in (False, True):
                    C = rand_om(rng, (7, 8), t.dtype, 0.5)
                    A = rand_om(rng, (3, 4), t.dtype, 0.6)
                    M = rand_om(rng, (3, 4), np.bool_, 0.5) \
                        if has_mask else None
                    want = o_subassign(C, M, A, Ii, Jj, accum_name,
                                       t.dtype, replace, scmp)
                    got = gb.subassign(
                        om_to(kind, C, t),
                        om_to(kind, M, gb.BOOL) if M else None,
                        gb.binary.plus[t] if accum_name else None,
                        om_to(kind, A, t), Ii, Jj,
                        gb.Descriptor(replace=replace, mask_scmp=scmp))
                    g = to_om(got, (7, 8), t.dtype)
                    tag = (f"{kind} accum={accum_name} mask={has_mask} "
                           f"replace={replace} scmp={scmp}")
                    assert np.array_equal(g.p, want.p), tag
                    assert np.allclose(g.m, want.m), tag


@pytest.mark.parametrize("kind", ["hyper", "csc"])
def test_assign_sweep(rng, kind):
    t = gb.FP64
    Ii = np.array([2, 6])
    Jj = np.array([1, 3, 5])
    for accum_name in (None, "plus"):
        for has_mask in (False, True):
            for replace in (False, True):
                C = rand_om(rng, (7, 8), t.dtype, 0.5)
                A = rand_om(rng, (2, 3), t.dtype, 0.7)
                M = rand_om(rng, (7, 8), np.bool_, 0.5) \
                    if has_mask else None
                want = o_assign(C, M, A, Ii, Jj, accum_name, t.dtype,
                                replace, False)
                got = gb.assign(
                    om_to(kind, C, t),
                    om_to(kind, M, gb.BOOL) if M else None,
                    gb.binary.plus[t] if accum_name else None,
                    om_to(kind, A, t), Ii, Jj,
                    gb.Descriptor(replace=replace))
                g = to_om(got, (7, 8), t.dtype)
                tag = (f"{kind} accum={accum_name} mask={has_mask} "
                       f"replace={replace}")
                assert np.array_equal(g.p, want.p), tag
                assert np.allclose(g.m, want.m), tag


@pytest.mark.parametrize("kind", ["hyper", "csc"])
def test_extract_container(rng, kind):
    t = gb.FP64
    A = rand_om(rng, (8, 9), t.dtype, 0.5)
    Ii = np.array([7, 0, 3])
    Jj = np.array([2, 8, 5, 1])
    C = rand_om(rng, (3, 4), t.dtype, 0.4)
    T = orc.OM(A.m[np.ix_(Ii, Jj)], A.p[np.ix_(Ii, Jj)])
    want = orc.o_accum_mask(C, None, T, "plus", t.dtype, t.dtype)
    got = gb.extract(om_to(kind, C, t), None, gb.binary.plus[t],
                     om_to(kind, A, t), Ii, Jj)
    g = to_om(got, (3, 4), t.dtype)
    assert np.array_equal(g.p, want.p), kind
    assert np.allclose(g.m, want.m), kind


def test_scalar_assign_hyper(rng):
    t = gb.FP64
    C = rand_om(rng, (6, 6), t.dtype, 0.4)
    Ii = np.array([1, 4])
    Jj = np.array([0, 5])
    want = C.copy()
    want.m[np.ix_(Ii, Jj)] = 3.5
    want.p[np.ix_(Ii, Jj)] = True
    got = gb.subassign(om_to("hyper", C, t), None, None, 3.5, Ii, Jj,
                       scalar=True)
    g = to_om(got, (6, 6), t.dtype)
    assert np.array_equal(g.p, want.p)
    assert np.allclose(g.m, want.m)


def test_hyper_assign_2p45():
    """The VERDICT 'done' criterion: subassign/assign/extract on
    indices far beyond 2^40 (no linearized key survives this)."""
    dim = 1 << 45
    t = gb.FP64
    base = np.int64(31) << 33
    CI = base + np.array([0, 5, 9], np.int64)
    CJ = base + np.array([2, 7, 4], np.int64)
    C = HyperMatrix.from_coo(CI, CJ, np.array([1.0, 2.0, 3.0]),
                             dim, dim, type=t)
    Ii = np.array([base + 5, dim - 2], np.int64)       # rows
    Jj = np.array([base + 7, base + 100], np.int64)    # cols
    A = HyperMatrix.from_coo(np.array([0, 1], np.int64),
                             np.array([0, 1], np.int64),
                             np.array([50.0, 60.0]), 2, 2, type=t)
    got = gb.subassign(C, None, None, A, Ii, Jj)
    I, J, V = got.extractTuples()
    d = {(int(i), int(j)): float(x) for i, j, x in zip(I, J, V)}
    assert d == {(int(base + 0), int(base + 2)): 1.0,
                 (int(base + 9), int(base + 4)): 3.0,
                 (int(base + 5), int(base + 7)): 50.0,
                 (int(dim - 2), int(base + 100)): 60.0}
    # extract back
    E = HyperMatrix.from_coo(np.zeros(0, np.int64), np.zeros(0, np.int64),
                             np.zeros(0), 2, 2, type=t)
    sub = gb.extract(E, None, None, got, Ii, Jj)
    I, J, V = sub.extractTuples()
    assert {(int(i), int(j)): float(x)
            for i, j, x in zip(I, J, V)} == {(0, 0): 50.0, (1, 1): 60.0}
    # GrB_assign with a C-sized region list and REPLACE over all of C
    got2 = gb.assign(C, None, None, A, Ii, Jj)
    I, J, V = got2.extractTuples()
    d2 = {(int(i), int(j)): float(x) for i, j, x in zip(I, J, V)}
    assert d2[(int(base + 5), int(base + 7))] == 50.0
    # whole-matrix assign via GrB_ALL at 2^45 (identity index maps)
    Z = gb.assign(C, None, None, C)
    I, J, V = Z.extractTuples()
    assert {(int(i), int(j)): float(x)
            for i, j, x in zip(I, J, V)} == \
        {(int(i), int(j)): float(x) for i, j, x in zip(CI, CJ,
                                                       [1.0, 2.0, 3.0])}


def test_hyper_assign_duplicate_indices_rejected():
    dim = 1 << 45
    C = HyperMatrix.from_coo(np.array([1], np.int64),
                             np.array([1], np.int64),
                             np.array([1.0]), dim, dim, type=gb.FP64)
    A = HyperMatrix.from_coo(np.array([0, 1], np.int64),
                             np.array([0, 0], np.int64),
                             np.array([1.0, 2.0]), 2, 1, type=gb.FP64)
    with pytest.raises(InvalidValue):
        gb.subassign(C, None, None, A, np.array([3, 3]), np.array([5]))
