"""SparseVec: the first-class sparse vector (VERDICT r2 missing #4).

The reference's vector IS a vlen x 1 matrix (``GB_matrix.h:18-26``);
SparseVec wraps a vlen x 1 HyperMatrix the same way, so every verb
(mxv/vxm, eWise, apply/select, reduce, assign/extract, setElement)
works at dimension up to 2^60.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.sparse import SparseVec
from graphblas_tpu.sparse.hyper import HyperMatrix


def sv(ids, vals, n, t=gb.FP64):
    return SparseVec.from_coo(np.asarray(ids, np.int64), vals, n,
                              type=t, dup=None)


def d_of(v):
    ids, vals = v.extractTuples()
    return {int(i): float(x) for i, x in zip(ids, vals)}


def test_container_basics():
    v = sv([3, 7, 1], [1.0, 2.0, 3.0], 10)
    assert v.size == 10 and v.nvals == 3
    assert d_of(v) == {1: 3.0, 3: 1.0, 7: 2.0}
    v = v.setElement(9.0, 7).setElement(5.0, 0)
    assert v.extractElement(7) == 9.0
    assert v.extractElement(5) is None
    v = v.removeElement(1)
    assert d_of(v) == {0: 5.0, 3: 1.0, 7: 9.0}
    v = v.resize(4)
    assert d_of(v) == {0: 5.0, 3: 1.0}
    # dense round-trip
    w = gb.Vector.from_dense(np.array([0., 2., 0., 4.]),
                             pattern=np.array([False, True, False, True]))
    s = SparseVec.from_vector(w)
    assert d_of(s) == {1: 2.0, 3: 4.0}
    back = s.to_vector()
    assert np.array_equal(np.asarray(back.pattern),
                          [False, True, False, True])


def test_ewise_apply_select_reduce(rng):
    t = gb.FP64
    a = sv([1, 4, 6], [1.0, 2.0, 3.0], 9, t)
    b = sv([4, 6, 8], [10.0, 20.0, 30.0], 9, t)
    z = sv([], np.zeros(0), 9, t)
    got = gb.eWiseAdd(z, None, None, gb.binary.plus[t], a, b)
    assert d_of(got) == {1: 1.0, 4: 12.0, 6: 23.0, 8: 30.0}
    got = gb.eWiseMult(z, None, None, gb.binary.times[t], a, b)
    assert d_of(got) == {4: 20.0, 6: 60.0}
    got = gb.apply(z, None, None, gb.unary.ainv[t], a)
    assert d_of(got) == {1: -1.0, 4: -2.0, 6: -3.0}
    s = gb.reduce_to_scalar(None, gb.monoid.plus[t], a)
    assert float(s) == 6.0
    # masked accum epilogue on the vector
    m = sv([4, 8], [1.0, 1.0], 9, t)
    got = gb.eWiseAdd(a, m, gb.binary.plus[t], gb.binary.plus[t], a, b,
                      gb.Descriptor(replace=True))
    assert d_of(got) == {4: 14.0, 8: 30.0}


def test_mxv_vxm_small_oracle(rng):
    t = gb.FP64
    m, n = 6, 5
    D = np.where(rng.random((m, n)) < 0.5,
                 rng.integers(1, 9, (m, n)).astype(float), 0.0)
    I, J = np.nonzero(D)
    A = HyperMatrix.from_coo(I, J, D[I, J], m, n, type=t, dup=None)
    xd = np.where(rng.random(n) < 0.6, rng.integers(1, 9, n), 0)
    x = sv(np.nonzero(xd)[0], xd[xd != 0].astype(float), n, t)
    w = sv([], np.zeros(0), m, t)
    got = gb.mxv(w, None, None, gb.semiring.plus_times[t], A, x)
    want = D @ xd
    rowp = ((D != 0) & (xd != 0)[None, :]).any(axis=1)
    assert d_of(got) == {int(i): float(want[i])
                         for i in np.nonzero(rowp)[0]}
    # vxm with a non-commutative multiply (FIRST): w_j = sum_k u_k
    # over edges (k, j) -> mult(u_k, a_kj) = u_k
    uD = np.where(rng.random(m) < 0.6, rng.integers(1, 9, m), 0)
    u = sv(np.nonzero(uD)[0], uD[uD != 0].astype(float), m, t)
    wv = sv([], np.zeros(0), n, t)
    got = gb.vxm(wv, None, None,
                 gb.Semiring(gb.monoid.plus[t], gb.binary.first[t]),
                 u, A)
    want = ((D != 0) * uD[:, None]).sum(axis=0)
    colp = ((D != 0) & (uD != 0)[:, None]).any(axis=0)
    assert d_of(got) == {int(j): float(want[j])
                         for j in np.nonzero(colp)[0]}


def test_assign_extract_vector():
    t = gb.FP64
    v = sv([2, 5, 8], [1.0, 2.0, 3.0], 10, t)
    u = sv([0, 1], [50.0, 60.0], 2, t)
    got = gb.subassign_vector(v, None, None, u, np.array([5, 9]))
    assert d_of(got) == {2: 1.0, 5: 50.0, 8: 3.0, 9: 60.0}
    w = sv([], np.zeros(0), 2, t)
    got = gb.extract_vector(w, None, None, v, np.array([5, 2]))
    assert d_of(got) == {0: 2.0, 1: 1.0}


def test_sparsevec_2p50_end_to_end():
    """Frontier-style ops at dimension 2^50 — the capability the ad-hoc
    (ids, vals) pairs could not provide."""
    t = gb.FP64
    dim = 1 << 50
    base = np.int64(999) << 31
    v = sv(base + np.array([1, 5, 9]), [1.0, 2.0, 3.0], dim, t)
    v = v.setElement(7.0, int(dim - 1))
    assert v.extractElement(int(dim - 1)) == 7.0
    b = sv(base + np.array([5, 100]), [10.0, 20.0], dim, t)
    z = sv([], np.zeros(0), dim, t)
    got = gb.eWiseAdd(z, None, None, gb.binary.plus[t], v, b)
    assert d_of(got) == {int(base + 1): 1.0, int(base + 5): 12.0,
                         int(base + 9): 3.0, int(base + 100): 20.0,
                         int(dim - 1): 7.0}
    s = gb.reduce_to_scalar(None, gb.monoid.max[t], v)
    assert float(s) == 7.0


def test_bfs_sparsevec_2p45():
    """BFS with a SparseVec frontier + complemented SparseVec visited
    mask on a graph whose vertex ids live near 2^45 — the bfs5m loop
    (vxm LOR_LAND + SCMP/REPLACE + assign + reduce) at hyper dimension.
    """
    dim = 1 << 45
    base = np.int64(77) << 33
    # path 0-1-2-3 + branch 1-4, embedded at ids base+10*k
    edges = [(0, 1), (1, 2), (2, 3), (1, 4)]
    ids = lambda k: int(base + 10 * k)
    I = np.array([ids(a) for a, b in edges] +
                 [ids(b) for a, b in edges], np.int64)
    J = np.array([ids(b) for a, b in edges] +
                 [ids(a) for a, b in edges], np.int64)
    t = gb.FP64
    A = HyperMatrix.from_coo(I, J, np.ones(len(I)), dim, dim, type=t,
                             dup="MAX")
    sr = gb.Semiring(gb.monoid.max[t],
                     gb.binary.times[t])  # OR-AND over 0/1 floats
    level = {ids(0): 1}
    frontier = SparseVec.from_coo(np.array([ids(0)], np.int64),
                                  np.array([1.0]), dim, type=t)
    visited = frontier
    depth = 1
    while frontier.nvals:
        depth += 1
        nxt = SparseVec.from_coo(np.zeros(0, np.int64), np.zeros(0),
                                 dim, type=t)
        # q<!visited> = q vxm A
        nxt = gb.vxm(nxt, visited, None, sr, frontier, A,
                     gb.Descriptor(mask_scmp=True, replace=True,
                                   mask_structure=True))
        for i in nxt.ids():
            level[int(i)] = depth
        visited = gb.eWiseAdd(visited, None, None, gb.binary.max[t],
                              visited, nxt)
        frontier = nxt
    assert level == {ids(0): 1, ids(1): 2, ids(2): 3, ids(4): 3,
                     ids(3): 4}


def test_typed_error_on_matrix_operand():
    from graphblas_tpu.ops.containers import UnsupportedContainer
    v = sv([1], [1.0], 10)
    M = gb.Matrix.new(gb.FP64, 3, 3)
    with pytest.raises(UnsupportedContainer):
        gb.eWiseAdd(v, None, None, gb.binary.plus[gb.FP64], M, M)
