"""Differential tests for assign/subassign/extract — the reference's
biggest correctness surface (GB_subassign_kernel.c, 3.4 KLoC; specs
GB_spec_assign.m / GB_spec_subassign.m)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from . import oracle as orc
from .helpers import TYPES, assert_same, rand_om, to_gb


def o_assign(C, M, accum, A, Ii, Jj, replace=False, scmp=False,
             dtype=np.float64):
    """GB_spec_assign in numpy."""
    Z = C.copy()
    S = orc.OM(C.m[np.ix_(Ii, Jj)], C.p[np.ix_(Ii, Jj)])
    ZIJ = orc.o_accum(accum, dtype, S, A, dtype)
    Z.m[np.ix_(Ii, Jj)] = ZIJ.m
    Z.p[np.ix_(Ii, Jj)] = ZIJ.p
    return orc.o_mask(C, M, Z, replace, scmp)


def o_subassign(C, M, accum, A, Ii, Jj, replace=False, scmp=False,
                dtype=np.float64):
    """GB_spec_subassign in numpy."""
    S = orc.OM(C.m[np.ix_(Ii, Jj)], C.p[np.ix_(Ii, Jj)])
    Snew = orc.o_accum_mask(S, M, A, accum, dtype, dtype, replace, scmp)
    R = C.copy()
    R.m[np.ix_(Ii, Jj)] = Snew.m
    R.p[np.ix_(Ii, Jj)] = Snew.p
    return R


CASES = [(None, False, False), ("plus", False, False), (None, True, False),
         (None, False, True), ("plus", True, True), ("second", True, False)]


@pytest.mark.parametrize("accum,replace,scmp", CASES)
def test_assign_matrix(rng, accum, replace, scmp):
    t = gb.FP64
    C = rand_om(rng, (6, 7), t.dtype, 0.5)
    Ii = np.array([1, 3, 4])
    Jj = np.array([0, 2, 5, 6])
    A = rand_om(rng, (3, 4), t.dtype, 0.6)
    M = rand_om(rng, (6, 7), np.bool_, 0.5)
    want = o_assign(C, M, accum, A, Ii, Jj, replace, scmp)
    d = gb.Descriptor(replace=replace, mask_scmp=scmp)
    acc = gb.binary[accum][t] if accum else None
    got = gb.assign(to_gb(C, t), to_gb(M, gb.BOOL), acc, to_gb(A, t),
                    Ii, Jj, d)
    assert_same(got, want, msg=f"assign {accum} r={replace} s={scmp}")


@pytest.mark.parametrize("accum,replace,scmp", CASES)
def test_subassign_matrix(rng, accum, replace, scmp):
    t = gb.FP64
    C = rand_om(rng, (6, 7), t.dtype, 0.5)
    Ii = np.array([1, 3, 4])
    Jj = np.array([0, 2, 5, 6])
    A = rand_om(rng, (3, 4), t.dtype, 0.6)
    M = rand_om(rng, (3, 4), np.bool_, 0.5)  # submatrix-sized mask
    want = o_subassign(C, M, accum, A, Ii, Jj, replace, scmp)
    d = gb.Descriptor(replace=replace, mask_scmp=scmp)
    acc = gb.binary[accum][t] if accum else None
    got = gb.subassign(to_gb(C, t), to_gb(M, gb.BOOL), acc, to_gb(A, t),
                       Ii, Jj, d)
    assert_same(got, want, msg=f"subassign {accum} r={replace} s={scmp}")


def test_assign_scalar_expansion(rng):
    t = gb.INT32
    C = rand_om(rng, (5, 5), t.dtype, 0.4)
    Ii = np.array([0, 2])
    Jj = np.array([1, 3, 4])
    Aom = orc.OM(np.full((2, 3), 9, t.dtype), np.ones((2, 3), bool))
    want = o_assign(C, None, None, Aom, Ii, Jj, dtype=t.dtype)
    got = gb.assign_scalar(to_gb(C, t), None, None, 9, Ii, Jj)
    assert_same(got, want)
    # masked scalar assign of whole matrix (the BFS v<q>=level idiom)
    M = rand_om(rng, (5, 5), np.bool_, 0.5)
    IA = np.arange(5)
    Aall = orc.OM(np.full((5, 5), 7, t.dtype), np.ones((5, 5), bool))
    want2 = o_assign(C, M, None, Aall, IA, IA, dtype=t.dtype)
    got2 = gb.assign_scalar(to_gb(C, t), to_gb(M, gb.BOOL), None, 7)
    assert_same(got2, want2)


def test_assign_vector_and_scalar(rng):
    t = gb.FP64
    w = rand_om(rng, (6,), t.dtype, 0.5)
    u = rand_om(rng, (3,), t.dtype, 0.8)
    Ii = np.array([0, 2, 5])
    # via the matrix spec on column matrices
    wm = orc.OM(w.m[:, None], w.p[:, None])
    um = orc.OM(u.m[:, None], u.p[:, None])
    want = o_assign(wm, None, "plus", um, Ii, np.array([0]))
    got = gb.assign_vector(to_gb(w, t), None, gb.binary.plus[t],
                           to_gb(u, t), Ii)
    assert_same(got, orc.OM(want.m[:, 0], want.p[:, 0]))
    # scalar with mask + replace (BFS style on vectors)
    m = rand_om(rng, (6,), np.bool_, 0.5)
    mm = orc.OM(m.m[:, None], m.p[:, None])
    Aall = orc.OM(np.full((6, 1), 3.5), np.ones((6, 1), bool))
    want2 = o_assign(wm, mm, None, Aall, np.arange(6), np.array([0]),
                     replace=True)
    got2 = gb.assign_vector(to_gb(w, t), to_gb(m, gb.BOOL), None, 3.5,
                            desc=gb.REPLACE, scalar=True)
    assert_same(got2, orc.OM(want2.m[:, 0], want2.p[:, 0]))


def test_row_col_assign(rng):
    t = gb.FP64
    C = rand_om(rng, (5, 6), t.dtype, 0.5)
    u = rand_om(rng, (6,), t.dtype, 0.7)
    # row assign, no mask: row 2, all J
    Cm = C.copy()
    S = orc.OM(Cm.m[2, :], Cm.p[2, :])
    Z = orc.o_accum("plus", t.dtype, S, u, t.dtype)
    Cm.m[2, :] = Z.m
    Cm.p[2, :] = Z.p
    got = gb.row_assign(to_gb(C, t), None, gb.binary.plus[t],
                        to_gb(u, t), 2)
    assert_same(got, Cm)
    # col assign with mask
    v = rand_om(rng, (5,), t.dtype, 0.7)
    m = rand_om(rng, (5,), np.bool_, 0.6)
    Cm2 = C.copy()
    S2 = orc.OM(Cm2.m[:, 3], Cm2.p[:, 3])
    Z2 = orc.o_accum(None, t.dtype, S2, v, t.dtype)
    R2 = orc.o_mask(S2, m, Z2, False, False)
    Cm2.m[:, 3] = R2.m
    Cm2.p[:, 3] = R2.p
    got2 = gb.col_assign(to_gb(C, t), to_gb(m, gb.BOOL), None,
                         to_gb(v, t), None, 3)
    assert_same(got2, Cm2)


def test_extract(rng):
    t = gb.FP64
    A = rand_om(rng, (6, 7), t.dtype, 0.5)
    Ii = np.array([5, 0, 3])
    Jj = np.array([1, 1, 6, 2])  # duplicates allowed in extract
    want = orc.OM(A.m[np.ix_(Ii, Jj)], A.p[np.ix_(Ii, Jj)])
    got = gb.extract(gb.Matrix.new(t, 3, 4), None, None, to_gb(A, t), Ii, Jj)
    assert_same(got, want)
    # with transpose descriptor
    wantT = orc.OM(A.m.T[np.ix_(Jj, Ii)], A.p.T[np.ix_(Jj, Ii)])
    gotT = gb.extract(gb.Matrix.new(t, 4, 3), None, None, to_gb(A, t),
                      Jj, Ii, gb.TRAN0)
    assert_same(gotT, wantT)
    # column extract
    wantc = orc.OM(A.m[Ii, 2], A.p[Ii, 2])
    gotc = gb.extract_col(gb.Vector.new(t, 3), None, None, to_gb(A, t), Ii, 2)
    assert_same(gotc, wantc)


def test_setElement_pending_and_wait(rng):
    t = gb.FP64
    C = gb.Matrix.new(t, 4, 4)
    # non-blocking: queue pending tuples, assemble on wait (GB_wait analogue)
    C = C.setElement(1.5, 0, 0, blocking=False)
    C = C.setElement(2.5, 0, 0, accum=gb.binary.plus[t], blocking=False)
    C = C.setElement(7.0, 3, 2, blocking=False)
    assert len(C._pending) == 3
    C = C.wait()
    assert C.extractElement(0, 0) == 4.0
    assert C.extractElement(3, 2) == 7.0
    assert C.extractElement(1, 1) is None
    assert C.nvals() == 2
    C = C.removeElement(3, 2)
    assert C.nvals() == 1


def test_build_dup_and_extractTuples(rng):
    # duplicate tuples assemble with the dup operator (GB_builder)
    I = [0, 1, 0, 1, 0]
    J = [0, 1, 0, 1, 1]
    X = [1.0, 2.0, 10.0, 30.0, 5.0]
    A = gb.Matrix.from_coo(I, J, X, 2, 2, type=gb.FP64)
    assert A.extractElement(0, 0) == 11.0
    assert A.extractElement(1, 1) == 32.0
    assert A.extractElement(0, 1) == 5.0
    Ii, Jj, Xx = A.extractTuples()
    assert list(Ii) == [0, 0, 1] and list(Jj) == [0, 1, 1]
    assert list(Xx) == [11.0, 5.0, 32.0]
    # dup=second takes the last value
    B = gb.Matrix.from_coo(I, J, X, 2, 2, type=gb.FP64,
                           dup=gb.binary.second[gb.FP64])
    assert B.extractElement(0, 0) == 10.0


def test_resize_clear(rng):
    t = gb.INT32
    A = rand_om(rng, (4, 4), t.dtype, 0.8)
    G = to_gb(A, t)
    big = G.resize(6, 5)
    assert big.shape == (6, 5)
    assert big.nvals() == int(A.p.sum())
    small = G.resize(2, 2)
    assert small.nvals() == int(A.p[:2, :2].sum())
    assert G.clear().nvals() == 0


# ---------------------------------------------------------------------------
# randomized sweep over index kinds x types x masks x accum x descriptors
# (the testall.m-style combinatorial layer for the 48-case surface)
# ---------------------------------------------------------------------------

def _index_kinds(rng, n):
    """The reference's index forms: ALL, contiguous range, stride,
    backwards stride, explicit unsorted list (GB_ijproperties)."""
    kinds = [
        np.arange(n),                            # GrB_ALL
        np.arange(1, max(2, n - 1)),             # GxB_RANGE
        np.arange(0, n, 2),                      # GxB_STRIDE
        np.arange(n - 1, -1, -2),                # GxB_BACKWARDS
        rng.permutation(n)[:max(1, n // 2)],     # explicit list
    ]
    return kinds


@pytest.mark.parametrize("tname", ["FP64", "INT32", "BOOL", "UINT8"])
def test_assign_sweep(rng, tname):
    t = getattr(gb, tname)
    n, m = 8, 9
    for trial in range(5):
        C = rand_om(rng, (n, m), t.dtype, 0.5)
        Ii = _index_kinds(rng, n)[trial % 5]
        Jj = _index_kinds(rng, m)[(trial + 2) % 5]
        A = rand_om(rng, (len(Ii), len(Jj)), t.dtype, 0.6)
        M = rand_om(rng, (n, m), np.bool_, 0.5) if trial % 2 else None
        accum = [None, "plus", "times", "min"][trial % 4]
        if t.dtype == np.bool_ and accum in ("plus", "times", "min"):
            accum = "lor"
        replace = trial % 3 == 0
        scmp = trial % 4 == 1
        want = o_assign(C, M, accum, A, np.sort(Ii) if False else Ii,
                        Jj, replace, scmp, dtype=t.dtype)
        d = gb.Descriptor(replace=replace, mask_scmp=scmp)
        acc = gb.binary[accum][t] if accum else None
        got = gb.assign(to_gb(C, t), to_gb(M, gb.BOOL) if M is not None
                        else None, acc, to_gb(A, t), Ii, Jj, d)
        assert_same(got, want,
                    msg=f"assign sweep {tname} trial {trial}")


@pytest.mark.parametrize("tname", ["FP64", "INT32", "BOOL"])
def test_subassign_sweep(rng, tname):
    t = getattr(gb, tname)
    n, m = 8, 9
    for trial in range(5):
        C = rand_om(rng, (n, m), t.dtype, 0.5)
        Ii = _index_kinds(rng, n)[(trial + 1) % 5]
        Jj = _index_kinds(rng, m)[(trial + 3) % 5]
        A = rand_om(rng, (len(Ii), len(Jj)), t.dtype, 0.6)
        M = rand_om(rng, (len(Ii), len(Jj)), np.bool_, 0.5) \
            if trial % 2 else None
        accum = [None, "plus", "max", "second"][trial % 4]
        if t.dtype == np.bool_ and accum in ("plus", "max"):
            accum = "land"
        replace = trial % 2 == 1
        scmp = trial % 3 == 2
        want = o_subassign(C, M, accum, A, Ii, Jj, replace, scmp,
                           dtype=t.dtype)
        d = gb.Descriptor(replace=replace, mask_scmp=scmp)
        acc = gb.binary[accum][t] if accum else None
        got = gb.subassign(to_gb(C, t), to_gb(M, gb.BOOL)
                           if M is not None else None, acc, to_gb(A, t),
                           Ii, Jj, d)
        assert_same(got, want,
                    msg=f"subassign sweep {tname} trial {trial}")


def test_scalar_assign_sweep(rng):
    t = gb.FP64
    n, m = 7, 6
    for trial in range(4):
        C = rand_om(rng, (n, m), t.dtype, 0.5)
        Ii = _index_kinds(rng, n)[trial % 5]
        Jj = _index_kinds(rng, m)[(trial + 1) % 5]
        x = float(rng.normal())
        M = rand_om(rng, (n, m), np.bool_, 0.5)
        # oracle: scalar expansion = all-present A over unique(I) x unique(J)
        Iu, Ju = np.unique(Ii), np.unique(Jj)
        A = orc.OM(np.full((len(Iu), len(Ju)), x),
                   np.ones((len(Iu), len(Ju)), bool))
        want = o_assign(C, M, "plus", A, Iu, Ju, False, False)
        got = gb.assign_scalar(to_gb(C, t), to_gb(M, gb.BOOL),
                               gb.binary.plus[t], x, Ii, Jj)
        assert_same(got, want, msg=f"scalar assign trial {trial}")


def test_typecast_assign(rng):
    # cross-type assign: int32 A into fp64 C (typecast per GB_spec)
    C = rand_om(rng, (5, 5), np.float64, 0.5)
    A = rand_om(rng, (2, 3), np.int32, 0.8)
    Ii, Jj = np.array([0, 2]), np.array([1, 3, 4])
    Af = orc.OM(A.m.astype(np.float64), A.p)
    want = o_assign(C, None, None, Af, Ii, Jj)
    got = gb.assign(to_gb(C, gb.FP64), None, None, to_gb(A, gb.INT32),
                    Ii, Jj)
    assert_same(got, want, msg="typecast assign")
