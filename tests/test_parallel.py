"""Distributed ops/algorithms on the 8-virtual-device CPU mesh
(conftest forces JAX_PLATFORMS=cpu + 8 host devices, mirroring the
driver's multichip dryrun environment)."""

import jax
import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import parallel as par
from graphblas_tpu.core.semirings import semiring


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should give 8 cpu devices"
    return par.make_mesh(8)


@pytest.fixture(scope="module")
def mesh2d():
    return par.make_mesh(8, shape=(4, 2), axis_names=("i", "j"))


def _random_graph(n, p, seed, symmetric=True):
    rng = np.random.default_rng(seed)
    Ap = rng.random((n, n)) < p
    np.fill_diagonal(Ap, False)
    if symmetric:
        Ap = Ap | Ap.T
    return gb.Matrix.from_dense(Ap.astype(np.float64), gb.FP64, pattern=Ap)


def test_distribute_collect_roundtrip(mesh):
    A = _random_graph(37, 0.2, 0)  # 37 not divisible by 8: exercises pad
    D = par.distribute(A, mesh)
    B = par.collect(D)
    assert np.array_equal(A.pattern_np(), B.pattern_np())
    assert np.allclose(A.to_dense(), B.to_dense())


def test_dist_vxm_matches_local(mesh):
    A = _random_graph(40, 0.2, 1)
    u = gb.Vector.from_dense(np.arange(40, dtype=np.float64))
    want = gb.vxm(gb.Vector.new(gb.FP64, 40), None, None,
                  semiring.plus_times[gb.FP64], u, A)
    D = par.distribute(A, mesh)
    du = par.distribute(u, mesh, spec=par.P("i"))
    w = par.dist_vxm(semiring.plus_times[gb.FP64], du, D)
    got = par.collect(w)
    assert np.allclose(got.to_dense(), want.to_dense())
    assert np.array_equal(got.pattern_np(), want.pattern_np())


def test_dist_vxm_bool_lor_land(mesh):
    A = _random_graph(24, 0.3, 2)
    Ab = gb.Matrix(A.pattern, A.pattern, gb.BOOL)
    q = np.zeros(24, bool)
    q[3] = True
    u = gb.Vector.from_dense(q, gb.BOOL, pattern=q)
    want = gb.vxm(gb.Vector.new(gb.BOOL, 24), None, None,
                  semiring.lor_land[gb.BOOL], u, Ab)
    du = par.distribute(u, mesh, spec=par.P("i"))
    D = par.distribute(Ab, mesh)
    got = par.collect(par.dist_vxm(semiring.lor_land[gb.BOOL], du, D))
    assert np.array_equal(got.to_dense() != 0, want.to_dense() != 0)


def test_dist_mxm_masked(mesh):
    A = _random_graph(32, 0.25, 3)
    want = gb.mxm(gb.Matrix.new(gb.FP64, 32, 32), A, None,
                  semiring.plus_times[gb.FP64], A, A)
    D = par.distribute(A, mesh)
    C = par.dist_mxm(semiring.plus_times[gb.FP64], D, D, M=D)
    got = par.collect(C)
    assert np.allclose(got.to_dense(), want.to_dense())


def test_dist_mxm_summa(mesh2d):
    A = _random_graph(32, 0.25, 4)
    B = _random_graph(32, 0.25, 5)
    want = gb.mxm(gb.Matrix.new(gb.FP64, 32, 32), None, None,
                  semiring.plus_times[gb.FP64], A, B)
    DA = par.distribute(A, mesh2d)
    DB = par.distribute(B, mesh2d)
    got = par.collect(par.dist_mxm_summa(semiring.plus_times[gb.FP64],
                                         DA, DB))
    assert np.allclose(got.to_dense(), want.to_dense())


@pytest.fixture(scope="module")
def mesh_sq():
    return par.make_mesh(4, shape=(2, 2), axis_names=("i", "j"))


def test_dist_mxm_summa_kstep(mesh_sq):
    """Square mesh -> the k-step pipeline (block broadcasts per step)
    must match the dense product for both a ring and a plus-times
    semiring."""
    A = _random_graph(40, 0.3, 14)
    B = _random_graph(40, 0.3, 15)
    for srname in ("plus_times", "min_plus"):
        sr = semiring[srname][gb.FP64]
        want = gb.mxm(gb.Matrix.new(gb.FP64, 40, 40), None, None,
                      sr, A, B)
        DA = par.distribute(A, mesh_sq)
        DB = par.distribute(B, mesh_sq)
        got = par.collect(par.dist_mxm_summa(sr, DA, DB))
        assert np.allclose(got.to_dense(), want.to_dense()), srname
        assert np.array_equal(got.pattern_np(), want.pattern_np()), srname


def test_dist_mxm_bshard_matches_replicated(mesh):
    A = _random_graph(48, 0.2, 16)
    B = _random_graph(48, 0.2, 17)
    Mk = _random_graph(48, 0.4, 18)
    sr = semiring.plus_times[gb.FP64]
    DA = par.distribute(A, mesh)
    DB = par.distribute(B, mesh)
    DM = par.distribute(Mk, mesh)
    want = par.collect(par.dist_mxm(sr, DA, DB, M=DM))
    got = par.collect(par.dist_mxm_bshard(sr, DA, DB, M=DM))
    assert np.allclose(got.to_dense(), want.to_dense())
    assert np.array_equal(got.pattern_np(), want.pattern_np())


def test_dist_bfs(mesh):
    A = _random_graph(50, 0.08, 6)
    from graphblas_tpu import models
    want = models.bfs_jit(A, 0)
    got = par.dist_bfs(A, 0, mesh)
    assert np.array_equal(got, want)


def test_dist_pagerank(mesh):
    A = _random_graph(40, 0.15, 7)
    from graphblas_tpu import models
    want = models.pagerank_jit(A, iters=20)
    got = par.dist_pagerank(A, iters=20, mesh=mesh)
    assert np.allclose(got, want, atol=1e-10)


def test_dist_tricount(mesh):
    A = _random_graph(48, 0.2, 8)
    Ap = A.pattern_np()
    want = int(((Ap.astype(np.int64) @ Ap) * Ap).sum()) // 6
    got = par.dist_tricount(A, mesh)
    assert got == want


def test_step_functions_compile(mesh):
    # the dryrun surface: single sharded steps compile and run
    n = 16
    Ap = _random_graph(n, 0.3, 9).pattern
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    Apd = jax.device_put(Ap, NamedSharding(mesh, par.P("i", None)))
    step = par.bfs_step_sharded(mesh)
    v = jnp.zeros((n,), jnp.int32)
    q = jnp.zeros((n,), bool).at[0].set(True)
    v2, q2 = step(v, q, Apd, jnp.int32(1))
    assert bool(v2[0] == 1)
    pstep = par.pagerank_step_sharded(mesh)
    Cv = jax.device_put(jnp.asarray(np.random.default_rng(0).random(
        (n, n))), NamedSharding(mesh, par.P("i", None)))
    r = jnp.full((n,), 1.0 / n)
    r2 = pstep(Cv, r, jnp.asarray(0.15 / n))
    assert np.isfinite(np.asarray(r2)).all()


# ---------------------------------------------------------------------------
# sharded-CSR distribution (memory-scalable path)
# ---------------------------------------------------------------------------

def test_dist_csr_mxv(mesh):
    A = _random_graph(53, 0.15, 20)  # non-divisible by 8
    x = np.random.default_rng(0).random(53).astype(np.float32)
    D = par.dist_csr_from_matrix(A, mesh)
    y = np.asarray(par.dist_csr_mxv(D, x))
    want = (A.pattern_np() * A.to_dense()) @ x
    assert np.allclose(y, want, rtol=1e-5)


def test_dist_csr_pagerank(mesh):
    from graphblas_tpu import models
    A = _random_graph(40, 0.15, 21)
    want = models.pagerank_jit(A, iters=15)
    got = par.dist_csr_pagerank(A, iters=15, mesh=mesh)
    assert np.allclose(got, want, atol=1e-5)


def test_dist_csr_bfs(mesh):
    from graphblas_tpu import models
    A = _random_graph(60, 0.07, 22)
    want = models.bfs_jit(A, 0)
    got = par.dist_csr_bfs(A, 0, mesh)
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# regression tests for review findings
# ---------------------------------------------------------------------------

def test_dist_vxm_min_plus_identity_combine(mesh):
    # a column whose only contribution lives on one shard must not be
    # poisoned by other shards' zero-filled absent partials
    n = 16
    Ap = np.zeros((n, n), bool)
    Ap[0, 5] = True          # only shard 0 contributes to column 5
    Ad = np.where(Ap, 5.0, 0.0)
    A = gb.Matrix.from_dense(Ad, gb.FP64, pattern=Ap)
    u = gb.Vector.from_dense(np.full(n, 1.0))
    sr = semiring.min_plus[gb.FP64]
    want = gb.vxm(gb.Vector.new(gb.FP64, n), None, None, sr, u, A)
    du = par.distribute(u, mesh, spec=par.P("i"))
    D = par.distribute(A, mesh)
    got = par.collect(par.dist_vxm(sr, du, D))
    assert got.extractElement(5) == want.extractElement(5) == 6.0


def test_dist_pagerank_nondivisible_n(mesh):
    from graphblas_tpu import models
    A = _random_graph(37, 0.2, 30)  # 37 % 8 != 0
    want = models.pagerank_jit(A, iters=20)
    got = par.dist_pagerank(A, iters=20, mesh=mesh)
    assert np.allclose(got, want, atol=1e-10)


def test_dist_mxm_valued_mask_and_rectangular(mesh):
    # valued mask: explicit zeros in M suppress output (default path)
    n = 16
    rng = np.random.default_rng(31)
    A = _random_graph(n, 0.4, 31)
    Mv = rng.integers(0, 2, (n, n)).astype(np.float64)
    Mp = np.ones((n, n), bool)
    M = gb.Matrix.from_dense(Mv, gb.FP64, pattern=Mp)
    want = gb.mxm(gb.Matrix.new(gb.FP64, n, n), M, None,
                  semiring.plus_times[gb.FP64], A, A)
    D = par.distribute(A, mesh)
    DM = par.distribute(M, mesh)
    got = par.collect(par.dist_mxm(semiring.plus_times[gb.FP64], D, D,
                                   M=DM))
    assert np.array_equal(got.pattern_np(), want.pattern_np())
    assert np.allclose(got.to_dense(), want.to_dense())
    # rectangular unmasked product must not shape-error
    B = gb.Matrix.from_dense(np.random.default_rng(32).random((n, 24)))
    DB = par.distribute(B, mesh, spec=par.P(None, None))
    got2 = par.collect(par.dist_mxm(semiring.plus_times[gb.FP64], D, DB))
    assert got2.shape == (n, 24)
