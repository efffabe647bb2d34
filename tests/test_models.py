"""Algorithm-level tests against dense numpy oracles and the reference's
demo matrix corpus (read at runtime from the read-only reference mount;
the files are test *data*, not code)."""

import os

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import io as gbio
from graphblas_tpu import models

REF_MATRIX_DIR = "/root/reference/Demo/Matrix"
HAVE_CORPUS = os.path.isdir(REF_MATRIX_DIR)

SMALL = ["eye3", "t1", "t2", "ash219", "ibm32a", "west0067"]


def corpus(name):
    return os.path.join(REF_MATRIX_DIR, name)


def load_sym_bool(name):
    """Symmetric boolean graph, no self edges (bfs/tri demo pipeline)."""
    return gbio.read_matrix(corpus(name), make_symmetric=True,
                            no_self_edges=True, boolean=True)


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def bfs_levels_oracle(Ap, s):
    n = Ap.shape[0]
    lev = np.zeros(n, np.int64)
    frontier = np.zeros(n, bool)
    frontier[s] = True
    level = 1
    while frontier.any():
        lev[frontier] = level
        nxt = (Ap[frontier].any(axis=0)) & (lev == 0)
        frontier = nxt
        level += 1
    return lev


def tri_oracle(Ap):
    A = Ap.astype(np.int64)
    return int(np.trace(A @ A @ A)) // 6


def pagerank_oracle(Ap, n, iters=20, r0=None):
    deg = Ap.sum(axis=1).astype(np.float64)
    C = np.where(Ap, 1.0 / np.where(deg == 0, 1, deg)[:, None], 0.0)
    c, a = 0.85, 0.15 / n
    r = r0.copy()
    for _ in range(iters):
        s = a * r.sum()
        r = c * r
        r = r @ C
        r = r + s
    return r / r.sum()


# ---------------------------------------------------------------------------
# io
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
def test_read_matrix_triplets():
    A = gbio.read_matrix(corpus("ash219"))
    assert A.nrows == 219 and A.ncols == 85
    I, J, X = gbio.read_triplets(corpus("ash219"))
    assert len(I) == 438
    assert A.nvals() == len(np.unique(I * 85 + J))


@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
def test_read_matrix_symmetric_bipartite():
    # rectangular input -> bipartite [0 C; C' 0]
    A = gbio.read_matrix(corpus("ash219"), make_symmetric=True,
                         boolean=True)
    assert A.nrows == A.ncols == 219 + 85
    Ad = A.pattern_np()
    assert (Ad == Ad.T).all()


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    I = rng.integers(0, 10, 30)
    J = rng.integers(0, 10, 30)
    X = rng.normal(size=30)
    A = gb.Matrix.from_coo(I, J, X, 10, 10)
    p = tmp_path / "m.tsv"
    gbio.write_triplets(p, A)
    B = gbio.read_matrix(str(p), nrows=10, ncols=10)
    assert np.allclose(A.to_dense(), B.to_dense())


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

def test_wathen_shape_and_symmetry():
    A = models.wathen(4, 4)
    n = 3 * 16 + 8 + 8 + 1
    assert A.nrows == n
    Ad = A.to_dense()
    assert np.allclose(Ad, Ad.T)
    assert A.nvals() == 817  # golden: tri_demo.out "nz 817" for nx=ny=4


def test_wathen_rho_given():
    rho = np.ones((2, 2))
    A = models.wathen(2, 2, rho=rho)
    # with rho = 1 the diagonal should be positive, matrix symmetric
    d = np.diag(A.to_dense())
    present = d != 0
    assert (d[present] > 0).all()


def test_random_matrix():
    A = models.random_matrix(50, 50, 200, seed=7)
    assert A.nrows == 50
    assert 0 < A.nvals() <= 200


# ---------------------------------------------------------------------------
# BFS
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
@pytest.mark.parametrize("name", ["t1", "ash219", "ibm32a"])
def test_bfs_variants_match_oracle(name):
    A = load_sym_bool(name)
    Ap = A.pattern_np()
    want = bfs_levels_oracle(Ap, 0)
    for fn in (models.bfs5m, models.bfs6):
        v = fn(A, 0)
        got = np.where(v.pattern_np(), v.to_dense(), 0).astype(np.int64)
        assert (got == want).all(), fn.__name__
    assert (models.bfs_jit(A, 0) == want).all()


@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
def test_bfs_reachability_golden():
    # golden: bfs_demo.out "nodes reachable from node 0: 65 out of 65"
    # for the wathen nx=ny=4 demo graph is generated randomly; use file
    # corpora instead: ash219 bipartite is fully connected from node 0
    A = load_sym_bool("ash219")
    v = models.bfs5m(A, 0)
    reach = int((v.to_dense() != 0).sum())
    assert reach == bfs_levels_oracle(A.pattern_np(), 0).astype(bool).sum()


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
@pytest.mark.parametrize("name", ["t1", "bcsstk01", "ash219"])
def test_tricount_all_methods(name):
    A = load_sym_bool(name)
    want = tri_oracle(A.pattern_np())
    L, U = models.tricount_prep(A)
    E = models.edge_incidence(A)
    for m in range(6):
        got = models.tricount(m, A=A, E=E, L=L, U=U)
        assert got == want, f"method {models.METHODS[m]}"


def test_tricount_karate_like():
    # deterministic 2-triangle graph
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    I = np.array([e[0] for e in edges] + [e[1] for e in edges])
    J = np.array([e[1] for e in edges] + [e[0] for e in edges])
    A = gb.Matrix.from_coo(I, J, np.ones(len(I), bool), 5, 5, type=gb.BOOL,
                           dup=gb.binary.lor[gb.BOOL])
    L, U = models.tricount_prep(A)
    for m in range(6):
        assert models.tricount(m, A=A, E=None, L=L, U=U) == 2


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
def test_dpagerank_matches_oracle():
    A = gbio.read_matrix(corpus("t1"), boolean=True, no_self_edges=False)
    n = A.nrows
    from graphblas_tpu.models.pagerank import _crand_stream
    r0 = _crand_stream(n, n).astype(np.float64) / 2147483647.0
    want = pagerank_oracle(A.pattern_np(), n, r0=r0)
    ranks = models.dpagerank(A)
    got = np.zeros(n)
    for page, val in ranks:
        got[page] = val
    assert np.allclose(got, want, rtol=1e-12)
    # ranking is descending
    vals = [v for _, v in ranks]
    assert vals == sorted(vals, reverse=True)


@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
def test_ipagerank_runs_and_ranks():
    A = gbio.read_matrix(corpus("t1"), boolean=True)
    ranks = models.ipagerank(A)
    vals = [v for _, v in ranks]
    assert vals == sorted(vals, reverse=True)
    assert all(isinstance(v, int) for v in vals)


@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
def test_dpagerank2_udt_semiring():
    A = gbio.read_matrix(corpus("t1"), boolean=True)
    n = A.nrows
    ranks, iters = models.dpagerank2(A, itermax=100, tol=1e-8)
    assert 0 < iters <= 100
    got = np.zeros(n)
    for page, val in ranks:
        got[page] = val
    # power iteration oracle with same update r <- 0.85 * (r D A) + 0.15/n
    Ap = A.pattern_np()
    deg = Ap.sum(axis=1).astype(float)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = 0.85 * ((r / np.where(deg == 0, 1, deg)) @ Ap) + 0.15 / n
    r = r / r.sum()
    assert np.allclose(got, r, rtol=1e-6)


def test_pagerank_jit_close_to_reference_loop():
    rng = np.random.default_rng(3)
    Ap = rng.random((40, 40)) < 0.2
    np.fill_diagonal(Ap, False)
    A = gb.Matrix.from_dense(Ap.astype(np.float64), gb.FP64,
                             pattern=Ap)
    r = models.pagerank_jit(A, iters=50)
    # stationarity check: one more iteration changes little
    n = 40
    deg = Ap.sum(axis=1).astype(float)
    C = np.where(Ap, 1.0 / np.where(deg == 0, 1, deg)[:, None], 0.0)
    r2 = 0.85 * (r @ C) + (0.15 / n) * r.sum()
    r2 = r2 / r2.sum()
    assert np.allclose(r, r2, atol=1e-6)


# ---------------------------------------------------------------------------
# MIS
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAVE_CORPUS, reason="reference corpus unavailable")
@pytest.mark.parametrize("name", ["t1", "ash219", "bcsstk01"])
def test_mis_maximal_independent(name):
    A = load_sym_bool(name)
    iset = models.mis(A, seed=42)
    assert models.mis_check(A, iset)


# ---------------------------------------------------------------------------
# k-truss
# ---------------------------------------------------------------------------

def _clique(k, n):
    """k-clique embedded in an n-node graph plus a dangling path."""
    I, J = [], []
    for i in range(k):
        for j in range(i + 1, k):
            I += [i, j]
            J += [j, i]
    for i in range(k, n - 1):
        I += [i, i + 1]
        J += [i + 1, i]
    A = gb.Matrix.from_coo(np.array(I), np.array(J),
                           np.ones(len(I), bool), n, n, type=gb.BOOL,
                           dup=gb.binary.lor[gb.BOOL])
    return A


def test_ktruss_clique():
    A = _clique(5, 9)
    C, nsteps = models.ktruss(A, k=4)
    # 4-truss of a 5-clique + path = the 5-clique (every edge in >= 2 tris)
    pat = C.pattern_np()
    assert pat[:5, :5].sum() == 20
    assert pat[5:, :].sum() == 0
    assert nsteps >= 1


def test_allktruss():
    A = _clique(5, 9)
    out = models.allktruss(A)
    assert out[3]["nedges"] > 0
    ks = sorted(out)
    assert out[ks[-1]]["nedges"] == 0  # final truss empty
    assert 5 in out and out[5]["nedges"] == 10  # 5-clique survives k=5


# ---------------------------------------------------------------------------
# kron
# ---------------------------------------------------------------------------

def test_kron_generate_matches_dense():
    rng = np.random.default_rng(5)
    Ad = rng.random((4, 3)) * (rng.random((4, 3)) < 0.6)
    Bd = rng.random((3, 5)) * (rng.random((3, 5)) < 0.6)
    A = gb.Matrix.from_dense(Ad, gb.FP64, pattern=Ad != 0)
    B = gb.Matrix.from_dense(Bd, gb.FP64, pattern=Bd != 0)
    want = np.kron(Ad, Bd)
    for nshards in (1, 3):
        C = models.kron_generate(A, B, nshards=nshards)
        assert np.allclose(C.to_dense(), want)


def test_kron_matches_gxb_kron():
    # models.kron_generate must agree with the in-framework GxB_kron op
    rng = np.random.default_rng(6)
    Ad = (rng.random((3, 3)) < 0.5) * rng.random((3, 3))
    Bd = (rng.random((4, 4)) < 0.5) * rng.random((4, 4))
    A = gb.Matrix.from_dense(Ad, gb.FP64, pattern=Ad != 0)
    B = gb.Matrix.from_dense(Bd, gb.FP64, pattern=Bd != 0)
    C1 = models.kron_generate(A, B)
    C2 = gb.kron(gb.Matrix.new(gb.FP64, 12, 12), None, None,
                 gb.binary.times[gb.FP64], A, B)
    assert np.allclose(C1.to_dense(), C2.to_dense())
