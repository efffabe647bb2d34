"""Sort-free masked counting engine (sparse/tri.py): CSR-native
triangle counting and k-truss at large scale — VERDICT round-2 #3
(de-densify the sparse algorithms)."""

import numpy as np
import pytest

import graphblas_tpu.sparse as sp
from graphblas_tpu.core.matrix import Matrix
from graphblas_tpu.core.semirings import semiring
from graphblas_tpu.core.types import BOOL, INT32, UINT32
from graphblas_tpu.sparse.container import CsrMatrix


def sym_graph(rng, n, nedges):
    """Random symmetric loopless multigraph as deduped COO."""
    i = rng.integers(0, n, nedges)
    j = rng.integers(0, n, nedges)
    keep = i != j
    i, j = i[keep], j[keep]
    I = np.concatenate([i, j])
    J = np.concatenate([j, i])
    X = np.ones(len(I), np.uint32)
    return I, J, X


def dense_tricount(n, I, J):
    A = np.zeros((n, n), np.int64)
    A[I, J] = 1
    return int(np.trace(A @ A @ A)) // 6


def test_csr_tril_triu(rng):
    n = 40
    I, J, X = sym_graph(rng, n, 150)
    A = CsrMatrix.from_coo(I, J, X, n, n, type=UINT32)
    L = sp.csr_tril(A)
    U = sp.csr_triu(A)
    Il, Jl, _ = L.extractTuples()
    Iu, Ju, _ = U.extractTuples()
    assert np.all(Jl < Il) and np.all(Ju > Iu)
    assert L.nvals + U.nvals == A.nvals  # no diagonal in sym_graph
    # CSR invariants survive the filter
    ip = np.asarray(L.indptr)
    assert ip[0] == 0 and ip[-1] == L.nvals
    assert np.all(np.diff(ip) >= 0)
    # entries stay sorted by (row, col)
    lin = Il * n + Jl
    assert np.all(np.diff(lin) > 0)


def test_tricount_csr_matches_dense_and_bitpack(rng):
    n = 120
    I, J, X = sym_graph(rng, n, 900)
    want = dense_tricount(n, I, J)
    A_csr = CsrMatrix.from_coo(I, J, X, n, n, type=UINT32)
    A_bm = Matrix.from_coo(I, J, X.astype(bool), n, n, type=BOOL)
    assert sp.tricount_sparse(A_csr) == want
    assert sp.tricount_sparse(A_bm) == want
    # both Sandia forms of the ESC counter agree
    L = sp.csr_tril(A_csr)
    U = sp.csr_triu(A_csr)
    assert sp.tricount_esc(L) == want          # (L.L)<L
    assert sp.tricount_esc(L, U) == want       # (L.U)<L


def test_masked_pair_counts_vs_esc_spgemm(rng):
    """The binary-search counter must agree with the general ESC
    engine (full sort) on PLUS_PAIR — engine-vs-engine differential."""
    m, k, n = 33, 47, 29
    def rand_csr(r, c, nnz):
        I = rng.integers(0, r, nnz)
        J = rng.integers(0, c, nnz)
        return CsrMatrix.from_coo(I, J, np.ones(nnz, np.int32), r, c,
                                  type=INT32)
    A = rand_csr(m, k, 200)
    B = rand_csr(k, n, 200)
    M = rand_csr(m, n, 150)
    counts = np.asarray(sp.masked_pair_counts(M, A, B))
    sr = semiring.plus_pair[INT32]
    C = sp.csr_spgemm(sr, A, B, mask=M)
    Ic, Jc, Xc = C.extractTuples()
    got = {(int(i), int(j)): int(x) for i, j, x in zip(Ic, Jc, Xc)}
    Im, Jm, _ = M.extractTuples()
    for e in range(M.nvals):
        ij = (int(Im[e]), int(Jm[e]))
        assert counts[e] == got.get(ij, 0), f"mismatch at {ij}"
    assert np.all(counts[M.nvals:] == 0)


def test_masked_pair_counts_split_path(rng):
    """Forcing the host flop-split (chunk = the 2^14 floor) must give
    the same counts as the single-dispatch path."""
    m = k = n = 300
    def rand_csr(r, c, nnz):
        I = rng.integers(0, r, nnz)
        J = rng.integers(0, c, nnz)
        return CsrMatrix.from_coo(I, J, np.ones(nnz, np.int32), r, c,
                                  type=INT32)
    A = rand_csr(m, k, 6000)
    B = rand_csr(k, n, 6000)
    M = rand_csr(m, n, 3000)
    one = np.asarray(sp.masked_pair_counts(M, A, B))
    split = np.asarray(sp.masked_pair_counts(M, A, B, chunk=1))
    assert np.array_equal(one, split)


def test_ktruss_csr_matches_bitmap(rng):
    n = 80
    I, J, X = sym_graph(rng, n, 600)
    A_csr = CsrMatrix.from_coo(I, J, X, n, n, type=UINT32)
    A_bm = Matrix.from_coo(I, J, X.astype(bool), n, n, type=BOOL)
    for k in (3, 4, 5):
        (Ic, Jc, Sc), _ = sp.ktruss_sparse(A_csr, k)
        (Ib, Jb, Sb), _ = sp.ktruss_sparse(A_bm, k)
        got = {(int(i), int(j)): int(s) for i, j, s in zip(Ic, Jc, Sc)}
        want = {(int(i), int(j)): int(s) for i, j, s in zip(Ib, Jb, Sb)}
        assert got == want


def test_tricount_csr_large_no_densify(rng):
    """n = 300_000 (dense bitmap would need 90 GB bools): the CSR
    engine runs, and two independent formulations agree."""
    n = 300_000
    I, J, X = sym_graph(rng, n, 60_000)
    # add some triangles explicitly so the count is nonzero
    base = rng.integers(0, n - 3, 50)
    ti = np.concatenate([base, base, base + 1])
    tj = np.concatenate([base + 1, base + 2, base + 2])
    I = np.concatenate([I, ti, tj])
    J = np.concatenate([J, tj, ti])
    X = np.ones(len(I), np.uint32)
    A = CsrMatrix.from_coo(I, J, X, n, n, type=UINT32)
    L = sp.csr_tril(A)
    U = sp.csr_triu(A)
    nt1 = sp.tricount_esc(L)
    nt2 = sp.tricount_esc(L, U)
    assert nt1 == nt2
    assert nt1 >= 50  # the planted triangles are there


def test_allktruss_csr_matches_bitmap(rng):
    from graphblas_tpu.models.ktruss import allktruss
    n = 60
    I, J, X = sym_graph(rng, n, 400)
    A_csr = CsrMatrix.from_coo(I, J, X, n, n, type=UINT32)
    A_bm = Matrix.from_coo(I, J, X.astype(bool), n, n, type=BOOL)
    got = sp.allktruss_esc(A_csr)
    want = allktruss(A_bm)
    assert {k: v["nedges"] for k, v in got.items()} == \
           {k: v["nedges"] for k, v in want.items()}
    assert {k: v["nt"] for k, v in got.items()} == \
           {k: v["nt"] for k, v in want.items()}


def test_tricount_device_batching():
    """tricount_device returns a device scalar (no pull) equal to the
    host API; N submissions then one pull is the RTT-amortized form."""
    import numpy as np
    import jax.numpy as jnp
    from graphblas_tpu.sparse.tri import (tricount_device, tricount_esc,
                                          tricount_prep_csr)
    from graphblas_tpu.sparse import CsrMatrix
    import graphblas_tpu as gb
    rng = np.random.default_rng(2)
    outs, want = [], []
    for seed in (1, 2, 3):
        r = np.random.default_rng(seed)
        n = 300
        I = r.integers(0, n, 1200); J = r.integers(0, n, 1200)
        keep = I != J; I, J = I[keep], J[keep]
        lin = np.unique(np.concatenate([I * n + J, J * n + I]))
        I, J = lin // n, lin % n
        A = CsrMatrix.from_coo(I, J, np.ones(len(I), bool), n, n,
                               type=gb.BOOL, sum_duplicates=False)
        L, U = tricount_prep_csr(A)
        outs.append(tricount_device(L, U))   # submit, no pull
        want.append(tricount_esc(L, U))
    got = [int(o) for o in outs]             # one barrier drains all
    assert got == want


def test_blocked_mask_slicing_matches_single_dispatch():
    """Force the multi-block host split with a tiny lane cap: the
    row-sliced mask path must agree with the one-dispatch result."""
    import numpy as np
    import jax.numpy as jnp
    import graphblas_tpu as gb
    from graphblas_tpu.sparse import CsrMatrix
    from graphblas_tpu.sparse.tri import masked_pair_counts
    r = np.random.default_rng(17)
    n = 400
    I = r.integers(0, n, 3000); J = r.integers(0, n, 3000)
    keep = I != J; I, J = I[keep], J[keep]
    lin = np.unique(np.concatenate([I * n + J, J * n + I]))
    I, J = lin // n, lin % n
    A = CsrMatrix.from_coo(I, J, np.ones(len(I), bool), n, n,
                           type=gb.BOOL, sum_duplicates=False)
    ref = masked_pair_counts(A, A, A)                 # single dispatch
    got = masked_pair_counts(A, A, A, chunk=1 << 14)  # many blocks
    assert bool(jnp.all(got == ref))
    # the host pattern is present, so the sliced path really ran
    assert A._options.get("host_pattern") is not None
