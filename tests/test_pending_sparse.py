"""Element mutation + pending deltas on the sparse containers
(VERDICT r2 missing #2): setElement / extractElement / removeElement /
resize / wait on CsrMatrix, CscMatrix, and HyperMatrix.

Reference: ``GB_setElement.c:10-28``, ``GB_pending_add.c``,
``GB_wait.c:240-350``, ``GB_resize.c`` — all format-agnostic there,
now here too.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.sparse.container import CsrMatrix, CscMatrix
from graphblas_tpu.sparse.hyper import HyperMatrix
from graphblas_tpu.core.errors import IndexOutOfBounds, OutOfMemory
from graphblas_tpu.utils import faultinject


def mk(kind, I, J, X, m, n, t=gb.FP64):
    if kind == "csr":
        return CsrMatrix.from_coo(I, J, X, m, n, type=t,
                                  sum_duplicates=False)
    if kind == "csc":
        return CscMatrix.from_coo(I, J, X, m, n, type=t,
                                  sum_duplicates=False)
    return HyperMatrix.from_coo(I, J, X, m, n, type=t, dup=None)


def tuples_of(A):
    I, J, X = A.extractTuples()
    return {(int(i), int(j)): float(x) for i, j, x in zip(I, J, X)}


KINDS = ["csr", "csc", "hyper"]


@pytest.mark.parametrize("kind", KINDS)
def test_set_extract_remove_roundtrip(kind):
    A = mk(kind, [0, 2, 2], [1, 0, 3], [1.0, 2.0, 3.0], 5, 6)
    # overwrite an existing entry, insert a new one, batched in one wait
    A = A.setElement(9.0, 2, 0)
    A = A.setElement(7.0, 4, 5)
    pend = A.tr._pending if isinstance(A, CscMatrix) else A._pending
    assert pend  # lazily buffered, no device work yet
    assert A.extractElement(2, 0) == 9.0
    assert A.extractElement(4, 5) == 7.0
    assert A.extractElement(0, 1) == 1.0
    assert A.extractElement(1, 1) is None  # GrB_NO_VALUE
    assert tuples_of(A) == {(0, 1): 1.0, (2, 0): 9.0, (2, 3): 3.0,
                            (4, 5): 7.0}
    B = A.removeElement(2, 3)
    assert B.extractElement(2, 3) is None
    assert tuples_of(B) == {(0, 1): 1.0, (2, 0): 9.0, (4, 5): 7.0}
    # removing an absent entry is a no-op (reference: zombie of nothing)
    C = B.removeElement(1, 1)
    assert tuples_of(C) == tuples_of(B)
    with pytest.raises(IndexOutOfBounds):
        A.setElement(1.0, 5, 0)
    with pytest.raises(IndexOutOfBounds):
        A.extractElement(0, 6)


@pytest.mark.parametrize("kind", KINDS)
def test_setelement_accum_and_dup_fold(kind):
    t = gb.FP64
    A = mk(kind, [1], [1], [10.0], 4, 4, t)
    plus = gb.binary.plus[t]
    # accum against an existing entry; dup fold within the pending run
    A = A.setElement(1.0, 1, 1, accum=plus)
    A = A.setElement(2.0, 1, 1, accum=plus)
    A = A.setElement(5.0, 0, 0, accum=plus)  # not present: lands as-is
    assert tuples_of(A) == {(1, 1): 13.0, (0, 0): 5.0}
    # overwrite (no accum) after an accum run must not fold across runs
    B = mk(kind, [1], [1], [10.0], 4, 4, t)
    B = B.setElement(1.0, 1, 1, accum=plus)
    B = B.setElement(99.0, 1, 1)          # overwrite wins
    B = B.setElement(1.0, 1, 1, accum=plus)
    assert tuples_of(B) == {(1, 1): 100.0}
    # last-write-wins dedup within a no-accum run
    C = mk(kind, [0], [0], [1.0], 4, 4, t)
    C = C.setElement(2.0, 3, 3).setElement(4.0, 3, 3)
    assert tuples_of(C) == {(0, 0): 1.0, (3, 3): 4.0}


@pytest.mark.parametrize("kind", KINDS)
def test_ops_fold_pending_first(kind):
    """Any operation on a dirty container sees the folded state (the
    GB_WAIT-at-entry discipline)."""
    t = gb.INT64
    A = mk(kind, [0, 1], [1, 2],
           np.array([1, 2], np.int64), 3, 3, t)
    A = A.setElement(np.int64(5), 2, 0)
    B = mk(kind, [2], [0], np.array([7], np.int64), 3, 3, t)
    got = gb.eWiseAdd(mk(kind, [], [], np.zeros(0, np.int64), 3, 3, t),
                      None, None, gb.binary.plus[t], A, B)
    assert tuples_of(got) == {(0, 1): 1.0, (1, 2): 2.0, (2, 0): 12.0}
    s = gb.reduce_to_scalar(None, gb.monoid.plus[t], A)
    assert int(s) == 8


@pytest.mark.parametrize("kind", KINDS)
def test_resize(kind):
    A = mk(kind, [0, 2, 4], [1, 3, 5], [1.0, 2.0, 3.0], 6, 6)
    S = A.resize(3, 4)  # shrink: prunes (4,5); keeps (0,1),(2,3)
    assert (S.nrows, S.ncols) == (3, 4)
    assert tuples_of(S) == {(0, 1): 1.0, (2, 3): 2.0}
    G = A.resize(10, 12)  # grow: all entries survive
    assert (G.nrows, G.ncols) == (10, 12)
    assert tuples_of(G) == tuples_of(A)
    # grown frame accepts entries in the new region
    G = G.setElement(4.0, 9, 11)
    assert G.extractElement(9, 11) == 4.0


def test_setelement_scale_100k():
    """The VERDICT criterion: a scale-style graph takes incremental
    updates without a full rebuild — n=100K CSR, batched wait."""
    rng = np.random.default_rng(3)
    n = 100_000
    nnz = 50_000
    I = rng.integers(0, n, nnz)
    J = rng.integers(0, n, nnz)
    X = rng.integers(1, 100, nnz).astype(np.int64)
    A = CsrMatrix.from_coo(I, J, X, n, n, type=gb.INT64)
    want = {(int(i), int(j)): int(x)
            for i, j, x in zip(*A.extractTuples())}
    upd_i = rng.integers(0, n, 200)
    upd_j = rng.integers(0, n, 200)
    upd_x = rng.integers(1, 100, 200)
    B = A
    for i, j, x in zip(upd_i, upd_j, upd_x):
        B = B.setElement(np.int64(x), int(i), int(j))
        want[(int(i), int(j))] = int(x)
    assert len(B._pending) == 200  # all buffered, zero device work yet
    B = B.wait()
    assert not B._pending
    got = {(int(i), int(j)): int(x)
           for i, j, x in zip(*B.extractTuples())}
    assert got == want
    # spot-check extractElement pulls only a row slice
    i0, j0 = int(upd_i[0]), int(upd_j[0])
    assert B.extractElement(i0, j0) == want[(i0, j0)]


def test_setelement_hyper_2p40():
    """setElement/wait at dimension 2^40 (VERDICT 'done' criterion)."""
    dim = 1 << 40
    base = np.int64(3) << 30
    I = base + np.array([5, 9, 9], np.int64)
    J = base + np.array([7, 1, 4], np.int64)
    H = HyperMatrix.from_coo(I, J, np.array([1.0, 2.0, 3.0]), dim, dim,
                             type=gb.FP64)
    H = H.setElement(8.0, int(base + 9), int(base + 1))   # overwrite
    H = H.setElement(4.0, int(dim - 1), int(dim - 1))     # far new entry
    assert H.extractElement(int(base + 9), int(base + 1)) == 8.0
    assert H.extractElement(int(dim - 1), int(dim - 1)) == 4.0
    assert H.extractElement(int(base + 5), int(base + 1)) is None
    got = tuples_of(H)
    assert got[(int(dim - 1), int(dim - 1))] == 4.0
    assert len(got) == 4
    R = H.removeElement(int(dim - 1), int(dim - 1))
    assert len(tuples_of(R)) == 3
    S = H.resize(int(base + 10), int(base + 10))
    assert tuples_of(S) == {(int(base + 5), int(base + 7)): 1.0,
                            (int(base + 9), int(base + 1)): 8.0,
                            (int(base + 9), int(base + 4)): 3.0}


def test_udt_setelement_csr():
    """UDT struct values through the CSR pending path."""
    t = gb.Type.udt("pair2", a=gb.FP64, b=gb.INT32)
    A = CsrMatrix.from_coo(np.array([0]), np.array([1]),
                           {"a": np.array([1.5]),
                            "b": np.array([2], np.int32)}, 3, 3, type=t)
    A = A.setElement({"a": 4.5, "b": 7}, 2, 2)
    got = A.extractElement(2, 2)
    assert got["a"] == 4.5 and got["b"] == 7
    assert A.extractElement(0, 1)["a"] == 1.5


@pytest.mark.parametrize("kind", ["csr", "hyper"])
def test_wait_fault_injection(kind):
    """The malloc-debug protocol over the wait() checkpoints: every
    injected fault unwinds with inputs intact, retry succeeds, result
    matches the clean run."""
    t = gb.FP64
    A0 = mk(kind, [0, 1], [1, 0], [1.0, 2.0], 4, 4, t)
    A0 = A0.setElement(5.0, 3, 3).setElement(9.0, 0, 1,
                                             accum=gb.binary.plus[t])
    clean = tuples_of(A0._shallow())
    for k in range(1, 30):
        faultinject.set_fault_countdown(k)
        try:
            out = A0._shallow().wait()
        except OutOfMemory:
            continue
        finally:
            faultinject.clear_fault()
        assert tuples_of(out) == clean
        break
    else:
        pytest.fail("fault sweep never succeeded")
