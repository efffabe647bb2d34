"""API-surface tests: options, import/export, printing/checking,
user-defined objects, aliases, and misc GrB parity behaviors."""

import io

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import user_objects as uo


# ---------------------------------------------------------------------------
# options
# ---------------------------------------------------------------------------

def test_options_roundtrip():
    gb.init(gb.BLOCKING)
    assert gb.get_option("mode") == gb.BLOCKING
    gb.set_option("format", gb.BY_COL)
    assert gb.get_option("format") == gb.BY_COL
    with pytest.raises(KeyError):
        gb.set_option("nope", 1)
    gb.init()  # reset
    assert gb.get_option("mode") == gb.NONBLOCKING


# ---------------------------------------------------------------------------
# import / export
# ---------------------------------------------------------------------------

def _rand(m, n, seed, density=0.4):
    rng = np.random.default_rng(seed)
    mask = rng.random((m, n)) < density
    dense = rng.normal(size=(m, n)) * mask
    return gb.Matrix.from_dense(dense, gb.FP64, pattern=mask), dense, mask


def test_export_import_csr_roundtrip():
    A, dense, mask = _rand(8, 11, 0)
    nr, nc, p, j, x = gb.export_csr(A)
    assert nr == 8 and nc == 11 and p[-1] == mask.sum()
    B = gb.import_csr(nr, nc, p, j, x, gb.FP64)
    assert np.allclose(B.to_matrix().to_dense(), dense)


def test_export_import_csc_roundtrip():
    A, dense, mask = _rand(9, 5, 1)
    nr, nc, p, i, x = gb.export_csc(A)
    B = gb.import_csc(nr, nc, p, i, x, gb.FP64)
    assert np.allclose(B.to_matrix().to_dense(), dense)


def test_import_hyper_csr():
    # rows 2 and 5 present only
    h = [2, 5]
    p = [0, 2, 3]
    idx = [1, 3, 0]
    val = [1.0, 2.0, 3.0]
    A = gb.import_hyper_csr(7, 4, 2, h, p, idx, val, gb.FP64)
    M = A.to_matrix()
    assert M.extractElement(2, 1) == 1.0
    assert M.extractElement(2, 3) == 2.0
    assert M.extractElement(5, 0) == 3.0
    assert M.nvals() == 3


def test_vector_import_export():
    v = gb.import_vector(10, [1, 5, 7], [1.0, 2.0, 3.0])
    n, I, X = gb.export_vector(v)
    assert n == 10
    assert I.tolist() == [1, 5, 7]
    assert np.allclose(X, [1.0, 2.0, 3.0])


# ---------------------------------------------------------------------------
# fprint / check
# ---------------------------------------------------------------------------

def test_fprint_all_objects():
    buf = io.StringIO()
    A, _, _ = _rand(4, 4, 2)
    gb.fprint(A, "A", gb.COMPLETE, buf)
    v = gb.Vector.from_dense(np.arange(3.0))
    gb.fprint(v, "v", gb.SHORT, buf)
    gb.fprint(gb.FP64, "fp64", gb.SHORT, buf)
    gb.fprint(gb.unary.ainv[gb.FP64], "ainv", gb.SHORT, buf)
    gb.fprint(gb.binary.plus[gb.FP64], "plus", gb.SHORT, buf)
    gb.fprint(gb.monoid.plus[gb.FP64], "plusmon", gb.SHORT, buf)
    gb.fprint(gb.semiring.plus_times[gb.FP64], "sr", gb.SHORT, buf)
    gb.fprint(gb.REPLACE, "desc", gb.SHORT, buf)
    out = buf.getvalue()
    assert "nrows: 4 ncols: 4" in out
    assert "GraphBLAS Semiring" in out
    assert "number of entries" in out


def test_check_catches_corruption():
    import jax.numpy as jnp
    A, dense, mask = _rand(3, 3, 3)
    assert gb.check(A)
    # corrupt: nonzero value at absent position
    bad = gb.Matrix(jnp.ones((3, 3)), jnp.zeros((3, 3), bool), gb.FP64)
    with pytest.raises(ValueError):
        gb.check(bad)


# ---------------------------------------------------------------------------
# user objects (the m4 example set)
# ---------------------------------------------------------------------------

def test_my_complex_semiring():
    rng = np.random.default_rng(4)
    Ad = rng.normal(size=(3, 4)) + 1j * rng.normal(size=(3, 4))
    Bd = rng.normal(size=(4, 2)) + 1j * rng.normal(size=(4, 2))
    A = gb.Matrix.from_dense(Ad, gb.FC64)
    B = gb.Matrix.from_dense(Bd, gb.FC64)
    C = gb.mxm(gb.Matrix.new(gb.FC64, 3, 2), None, None,
               uo.my_complex_plus_times, A, B)
    assert np.allclose(C.to_dense(), Ad @ Bd)


def test_my_plus_rdiv_and_scale():
    A = gb.Matrix.from_dense(np.array([[2.0, 4.0]]))
    B = gb.Matrix.from_dense(np.array([[8.0, 4.0]]))
    C = gb.eWiseMult(gb.Matrix.new(gb.FP64, 1, 2), None, None,
                     uo.my_plus_rdiv, A, B)
    assert np.allclose(C.to_dense(), [[4.0, 1.0]])
    D = gb.apply(gb.Matrix.new(gb.FP64, 1, 2), None, None, uo.my_scale, A)
    assert np.allclose(D.to_dense(), [[4.0, 8.0]])


def test_my_band_select():
    A = gb.Matrix.from_dense(np.arange(16.0).reshape(4, 4))
    C = gb.select(gb.Matrix.new(gb.FP64, 4, 4), None, None, uo.my_band,
                  A, (0, 1))
    pat = C.pattern_np()
    i, j = np.nonzero(pat)
    assert ((j - i >= 0) & (j - i <= 1)).all()
    assert pat.sum() == 7


def test_my_max_terminal_monoid():
    assert uo.my_max_terminal.terminal == 1e308
    v = gb.Vector.from_dense(np.array([1.0, 99.0, 3.0]))
    assert gb.reduce_to_scalar(None, uo.my_max_terminal, v) == 99.0


# ---------------------------------------------------------------------------
# aliases (reference GB_mex_mxm_alias tests): C<C> = C*C etc.
# ---------------------------------------------------------------------------

def test_mxm_alias():
    A, dense, mask = _rand(6, 6, 5)
    sr = gb.semiring.plus_times[gb.FP64]
    C = gb.mxm(A, A, None, sr, A, A)
    want = (dense @ dense) * mask
    got = C.to_dense()
    assert np.allclose(got[mask], want[mask])


def test_assign_alias():
    A, dense, mask = _rand(5, 5, 6)
    out = gb.assign(A, A, None, A)  # C<C> = C
    assert np.allclose(out.to_dense(), dense)


def test_ewise_alias():
    A, dense, mask = _rand(4, 4, 7)
    C = gb.eWiseAdd(A, None, None, gb.binary.plus[gb.FP64], A, A)
    assert np.allclose(C.to_dense(), 2 * dense)


# ---------------------------------------------------------------------------
# struct-of-struct (wildtype) UDT
# ---------------------------------------------------------------------------

def test_nested_udt():
    from graphblas_tpu.core.types import Type
    inner = Type.udt("inner", a=gb.FP64, b=gb.FP32)
    outer = Type.udt("outer", x=inner, y=gb.INT32)
    M = gb.Matrix.new(outer, 2, 2)
    M = M.setElement({"x": {"a": 1.5, "b": 2.5}, "y": 7}, 0, 1)
    got = M.extractElement(0, 1)
    assert got["x"]["a"] == 1.5 and got["y"] == 7
    assert M.nvals() == 1


# ---------------------------------------------------------------------------
# checkpoint / timer / iterators
# ---------------------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    from graphblas_tpu import io as gbio
    A, dense, mask = _rand(7, 9, 8)
    p = tmp_path / "a.npz"
    gbio.save_matrix(p, A)
    B = gbio.load_matrix(p)
    assert np.allclose(B.to_dense(), dense)
    assert np.array_equal(B.pattern_np(), mask)
    v = gb.Vector.from_coo([1, 4], [2.0, 3.0], 6)
    pv = tmp_path / "v.npz"
    gbio.save_vector(pv, v)
    w = gbio.load_vector(pv)
    assert w.extractElement(4) == 3.0
    assert w.nvals() == 2


def test_timer():
    from graphblas_tpu.utils import timer
    timer.simple_tic()
    assert timer.simple_toc() >= 0
    with timer.device_timer() as t:
        pass
    assert "s" in t


def test_row_col_iterators():
    A, dense, mask = _rand(5, 6, 9)
    seen = {}
    for i, cols, vals in A.rows():
        seen[i] = (cols, vals)
        assert np.array_equal(cols, np.nonzero(mask[i])[0])
        assert np.allclose(vals, dense[i][cols])
    assert set(seen) == set(np.nonzero(mask.any(axis=1))[0])
    for j, rows, vals in A.cols():
        assert np.array_equal(rows, np.nonzero(mask[:, j])[0])
        assert np.allclose(vals, dense[:, j][rows])


# ---------------------------------------------------------------------------
# typecast parity: NaN/Inf -> int (GB_CAST, GB.h:2925-2948) + isequal
# ---------------------------------------------------------------------------

def test_cast_nonfinite_float_to_int():
    import jax.numpy as jnp
    from graphblas_tpu.core.types import cast, cast_value
    x = jnp.asarray([1.9, -1.9, np.nan, np.inf, -np.inf])
    got = np.asarray(cast(x, gb.INT32))
    assert got.tolist() == [1, -1, 0, 2**31 - 1, -(2**31)]
    got8 = np.asarray(cast(x, gb.INT8))
    assert got8[2] == 0 and got8[3] == 127 and got8[4] == -128
    assert cast_value(np.inf, gb.UINT8) == 255
    assert cast_value(-np.inf, gb.INT16) == -32768
    assert cast_value(np.nan, gb.INT64) == 0


def test_isequal():
    from graphblas_tpu.utils.compare import isequal
    A, dense, mask = _rand(4, 5, 10)
    B = gb.Matrix.from_dense(dense, gb.FP64, pattern=mask)
    assert isequal(A, B)
    C = B.setElement(99.0, 0, 0)
    assert not isequal(A, C)
    # same values in a different type: not equal unless typecheck off
    ints = np.round(dense * 4) * mask  # exactly representable in f32
    E64 = gb.Matrix.from_dense(ints, gb.FP64, pattern=mask)
    E32 = gb.Matrix.from_dense(ints, gb.FP32, pattern=mask)
    assert not isequal(E64, E32)          # type differs
    assert isequal(E64, E32, typecheck=False)


def test_cast_saturation_host_device_consistent():
    import jax.numpy as jnp
    from graphblas_tpu.core.types import cast, cast_value
    for v in (3e9, -3e9, 1e300, -1e300):
        dev = int(np.asarray(cast(jnp.asarray([v]), gb.INT32))[0])
        host = int(cast_value(v, gb.INT32))
        assert dev == host, (v, dev, host)
    assert cast_value(3e9, gb.INT32) == 2**31 - 1


def test_isequal_nan_and_mixed():
    from graphblas_tpu.utils.compare import isequal
    d = np.array([[np.nan, 1.0]])
    p = np.array([[True, True]])
    A = gb.Matrix.from_dense(d, gb.FP64, pattern=p)
    assert not isequal(A, A.dup())    # NaN != NaN (isequal.c)
    # small-magnitude errors not masked by an absolute term
    B = gb.Matrix.from_dense(np.array([[0.0, 1.0]]), gb.FP64, pattern=p)
    C = gb.Matrix.from_dense(np.array([[1e-9, 1.0]]), gb.FP64, pattern=p)
    assert not isequal(B, C, rtol=1e-12)
    # builtin vs UDT with typecheck off -> False, not TypeError
    from graphblas_tpu.core.types import Type
    U = Type.udt("u", a=gb.FP64)
    M = gb.Matrix.new(U, 1, 2)
    assert not isequal(B, M, typecheck=False)


def test_checkpoint_udt(tmp_path):
    from graphblas_tpu import io as gbio
    from graphblas_tpu.core.types import Type
    U = Type.udt("pt", a=gb.FP64, b=gb.INT32)
    M = gb.Matrix.new(U, 3, 3)
    M = M.setElement({"a": 1.5, "b": 2}, 0, 1)
    M = M.setElement({"a": -0.5, "b": 7}, 2, 0)
    p = tmp_path / "u.npz"
    gbio.save_matrix(p, M)
    N = gbio.load_matrix(p, type=U)
    assert N.extractElement(0, 1) == {"a": 1.5, "b": 2}
    assert N.extractElement(2, 0)["b"] == 7
    assert N.nvals() == 2


def test_masked_mxm_pattern_exactness():
    # entries of M where A*B has no structural contribution must be
    # ABSENT in the result, not explicit zeros
    from graphblas_tpu import sparse as sp
    A = np.zeros((130, 130), bool)
    A[0, 1] = A[1, 0] = True      # only one pair
    M = np.ones((130, 130), bool)
    Am = gb.Matrix.from_dense(A, gb.BOOL, pattern=A)
    Mm = gb.Matrix.from_dense(M, gb.BOOL, pattern=M)
    C = sp.masked_mxm(Mm, Am, Am)
    pat = C.pattern_np()
    # structure of A*A' here: (0,0) and (1,1) only
    want = np.zeros_like(M)
    want[0, 0] = want[1, 1] = True
    assert np.array_equal(pat, want)


# ---------------------------------------------------------------------------
# second-round review regressions
# ---------------------------------------------------------------------------

def test_cast_64bit_saturation():
    import jax.numpy as jnp
    from graphblas_tpu.core.types import cast, cast_value
    x = jnp.asarray([1e19, -1e19, 2.0**63, 5.0])
    got = np.asarray(cast(x, gb.INT64))
    assert got[0] == np.iinfo(np.int64).max
    assert got[1] == np.iinfo(np.int64).min
    assert got[2] == np.iinfo(np.int64).max
    assert got[3] == 5
    gotu = np.asarray(cast(jnp.asarray([2e19, -1.0]), gb.UINT64))
    assert gotu[0] == np.iinfo(np.uint64).max
    assert gotu[1] == 0
    # f32 source into int32: bound rounds up in f32
    y = jnp.asarray([2.14748365e9, -2.2e9, 7.0], jnp.float32)
    got32 = np.asarray(cast(y, gb.INT32))
    assert got32[0] == 2**31 - 1 and got32[1] == -(2**31)
    assert got32[2] == 7
    assert cast_value(1e19, gb.INT64) == np.iinfo(np.int64).max


def test_monoid_minmax_ignore_nan():
    v = gb.Vector.from_dense(np.array([np.nan, 5.0, 7.0]))
    assert gb.reduce_to_scalar(None, gb.monoid.min[gb.FP64], v) == 5.0
    assert gb.reduce_to_scalar(None, gb.monoid.max[gb.FP64], v) == 7.0


def test_nonblocking_mode_default():
    gb.init(gb.NONBLOCKING)
    v = gb.Vector.new(gb.FP64, 4).setElement(1.5, 2)
    assert v._pending                      # deferred under nonblocking
    assert v.extractElement(2) == 1.5      # reads force completion
    gb.init(gb.BLOCKING)
    w = gb.Vector.new(gb.FP64, 4).setElement(2.5, 1)
    assert not w._pending                  # folded immediately
    gb.init()


def test_wait_batched_many_tuples():
    gb.init(gb.NONBLOCKING)
    M = gb.Matrix.new(gb.FP64, 20, 20)
    rng = np.random.default_rng(0)
    want = np.zeros((20, 20))
    for _ in range(200):
        i, j = int(rng.integers(20)), int(rng.integers(20))
        x = float(rng.normal())
        M = M.setElement(x, i, j)          # no accum: last write wins
        want[i, j] = x
    M = M.wait()
    pat = want != 0
    assert np.allclose(M.to_dense()[pat], want[pat])
    # accum run: duplicates fold in order
    V = gb.Vector.new(gb.FP64, 5)
    for x in (1.0, 2.0, 3.0):
        V = V.setElement(x, 2, accum=gb.binary.plus[gb.FP64])
    V = V.wait()
    assert V.extractElement(2) == 6.0
    gb.init()


def test_from_coo_udt_raises():
    from graphblas_tpu.core.types import Type
    U = Type.udt("u2", a=gb.FP64)
    with pytest.raises(TypeError):
        gb.Matrix.from_coo([0], [0], [{"a": 1.0}], 2, 2, type=U)


def test_kron_custom_op():
    from graphblas_tpu import models
    Ad = np.array([[2.0, 0.0], [0.0, 5.0]])
    Bd = np.array([[3.0, 4.0]])
    A = gb.Matrix.from_dense(Ad, gb.FP64, pattern=Ad != 0)
    B = gb.Matrix.from_dense(Bd, gb.FP64, pattern=Bd != 0)
    C = models.kron_generate(A, B, op=gb.binary.min[gb.FP64])
    want = gb.kron(gb.Matrix.new(gb.FP64, 2, 4), None, None,
                   gb.binary.min[gb.FP64], A, B)
    assert np.allclose(C.to_dense(), want.to_dense())


def test_normalize_indices_forms():
    from graphblas_tpu.utils.indices import normalize_indices, ALL
    assert normalize_indices(ALL, 5).tolist() == [0, 1, 2, 3, 4]
    assert normalize_indices(None, 3).tolist() == [0, 1, 2]
    assert normalize_indices(":", 3).tolist() == [0, 1, 2]
    assert normalize_indices(2, 5).tolist() == [2]
    assert normalize_indices(slice(1, 4), 5).tolist() == [1, 2, 3]
    assert normalize_indices(slice(4, None, -2), 5).tolist() == [4, 2, 0]
    assert normalize_indices(range(1, 3), 5).tolist() == [1, 2]
    assert normalize_indices([3, 1, 1], 5, unique=True).tolist() == [1, 3]
    with pytest.raises(gb.IndexOutOfBounds):
        normalize_indices([7], 5)
    from graphblas_tpu.core.errors import InvalidValue
    with pytest.raises(InvalidValue):
        normalize_indices(np.zeros((2, 2), np.int64), 5)


def test_isequal_vectors_and_rtol():
    from graphblas_tpu.utils.compare import isequal
    v = gb.Vector.from_coo([0, 2], [1.0, 2.0], 4)
    w = gb.Vector.from_coo([0, 2], [1.0, 2.0 + 1e-13], 4)
    assert not isequal(v, w)
    assert isequal(v, w, rtol=1e-9)
    assert not isequal(v, gb.Matrix.new(gb.FP64, 4, 1))  # vector vs matrix
    u = gb.Vector.from_coo([0], [1.0], 4)
    assert not isequal(v, u)  # different pattern


def test_simple_rand_scalar_batch_agree():
    from graphblas_tpu.utils.simple_rand import SimpleRand
    a, b = SimpleRand(7), SimpleRand(7)
    xs = [a.rand_x() for _ in range(10)]
    ys = b.rand_x_batch(10)
    assert np.allclose(xs, ys, rtol=0, atol=0)
    a2, b2 = SimpleRand(3), SimpleRand(3)
    assert [a2.rand() for _ in range(5)] == b2.rand_batch(5).tolist()
    assert SimpleRand(9).rand_i() == SimpleRand(9).rand_i()
    s = SimpleRand(4)
    s.seed(11)
    t = SimpleRand(11)
    assert s.rand() == t.rand()


def test_third_review_regressions():
    import jax.numpy as jnp
    from graphblas_tpu.core.types import Type
    # bounds validation on element access
    M = gb.Matrix.new(gb.INT32, 2, 2)
    with pytest.raises(gb.IndexOutOfBounds):
        M.setElement(5, 99, 0)
    with pytest.raises(gb.IndexOutOfBounds):
        M.extractElement(99, 0)
    with pytest.raises(gb.IndexOutOfBounds):
        gb.Vector.new(gb.FP64, 3).removeElement(7)
    # to_dense(fill) for UDT
    U = Type.udt("tdr", a=gb.FP64)
    W = gb.Matrix.new(U, 2, 2).setElement({"a": 3.0}, 0, 0)
    d = W.to_dense(fill=-1.0)
    assert d["a"][0][0] == 3.0 and d["a"][1][1] == -1.0
    # string accum rejected
    v = gb.Vector.new(gb.FP64, 2).setElement(1.0, 0, accum="PLUS",
                                             blocking=False)
    with pytest.raises(TypeError):
        v.wait()
    # pattern shape validation
    with pytest.raises(gb.DimensionMismatch):
        gb.Matrix.from_dense(np.ones((3, 4)), pattern=np.ones(4, bool))


def test_vxm_csr_noncommutative_flip():
    from graphblas_tpu import sparse as sp
    from graphblas_tpu.core.semirings import semiring
    rng = np.random.default_rng(80)
    mask = rng.random((6, 6)) < 0.6
    Ad = (rng.integers(1, 9, (6, 6)) * mask).astype(np.float64)
    I, J = np.nonzero(mask)
    A = sp.CsrMatrix.from_coo(I, J, Ad[I, J], 6, 6)
    u = gb.Vector.from_dense(np.arange(1.0, 7.0))
    for srname in ("plus_first", "plus_second", "min_minus"):
        sr = semiring[srname][gb.FP64]
        got = gb.vxm(gb.Vector.new(gb.FP64, 6), None, None, sr, u, A,
                     gb.TRAN1)
        want = gb.vxm(gb.Vector.new(gb.FP64, 6), None, None, sr, u,
                      A.to_matrix(), gb.TRAN1)
        assert np.allclose(got.to_dense(), want.to_dense()), srname
        assert np.array_equal(got.pattern_np(), want.pattern_np())
    # dimension check on the fast path
    with pytest.raises(gb.DimensionMismatch):
        gb.mxv(gb.Vector.new(gb.FP64, 6), None, None,
               semiring.plus_times[gb.FP64], A,
               gb.Vector.from_dense(np.ones(5)))


def test_tropical_times_not_poisoned():
    # MIN_TIMES with absent partners must NOT take the pallas fill path
    from graphblas_tpu.core.semirings import semiring
    Av = np.array([[2.0, -1.0]], np.float32)
    Ap = np.array([[True, True]])
    Bv = np.array([[3.0], [0.0]], np.float32)
    Bp = np.array([[True], [False]])   # B[1,0] absent
    A = gb.Matrix.from_dense(Av, gb.FP32, pattern=Ap)
    B = gb.Matrix.from_dense(Bv, gb.FP32, pattern=Bp)
    C = gb.mxm(gb.Matrix.new(gb.FP32, 1, 1), None, None,
               semiring.min_times[gb.FP32], A, B)
    assert C.extractElement(0, 0) == 6.0   # only the present pair


def test_hyper_export_roundtrip(rng):
    """export_hyper_csr ∘ import_hyper_csr == identity (O(nvec) lists)."""
    import graphblas_tpu as gb
    from graphblas_tpu.sparse.container import CsrMatrix
    n = 500
    I = rng.integers(0, n, 60)
    J = rng.integers(0, n, 60)
    lin = np.unique(I * n + J)
    I, J = lin // n, lin % n
    X = rng.random(len(I))
    A = CsrMatrix.from_coo(I, J, X, n, n, type=gb.FP64,
                           sum_duplicates=False)
    nr, nc, nvec, h, p, idx, vals = gb.export_hyper_csr(A)
    assert nvec == len(np.unique(I))
    B = gb.import_hyper_csr(nr, nc, nvec, h, p, idx, vals, type=gb.FP64)
    Ib, Jb, Xb = B.extractTuples()
    assert np.array_equal(Ib, I) and np.array_equal(Jb, J)
    assert np.allclose(Xb, X[np.lexsort((J, I))])


def test_per_matrix_options():
    import graphblas_tpu as gb
    from graphblas_tpu import grb
    A = gb.Matrix.new(gb.FP64, 4, 4)
    B = gb.Matrix.new(gb.FP64, 4, 4)
    grb.GxB_set(A, "format", "by_col")
    assert grb.GxB_get(A, "format") == "by_col"
    # other objects fall back to the global scope
    assert grb.GxB_get(B, "format") == grb.GxB_Global_Option_get("format")
    # option survives wait()/setElement round
    A2 = A.setElement(1.0, 0, 0).wait()
    assert grb.GxB_get(A2, "format") == "by_col"


def test_grb_error_message():
    import graphblas_tpu as gb
    from graphblas_tpu import grb
    try:
        gb.Matrix.from_coo([99], [0], [1.0], 4, 4, type=gb.FP64)
    except gb.IndexOutOfBounds:
        pass
    msg = grb.GrB_error()
    assert "INDEX_OUT_OF_BOUNDS" in msg and "4x4" in msg


def test_fprint_check_all_sparse_containers():
    """GxB_*_fprint / GB_check across all four storage formats x all
    verbosity levels (round-4 printing coverage)."""
    import io
    import numpy as np
    from graphblas_tpu.sparse import (CsrMatrix, CscMatrix, HyperMatrix,
                                      HyperCscMatrix, hyper_from_coo)
    I = np.array([0, 1, 3]); J = np.array([2, 0, 3])
    X = np.array([1.0, 2.0, 3.0])
    objs = [
        CsrMatrix.from_coo(I, J, X, 4, 4, type=gb.FP64),
        CscMatrix.from_coo(I, J, X, 4, 4, type=gb.FP64),
        hyper_from_coo(I, J, X, 1 << 40, 1 << 40, type=gb.FP64),
        HyperCscMatrix.from_coo(I, J, X, 1 << 40, 1 << 40, type=gb.FP64),
    ]
    for obj in objs:
        for level in (gb.SILENT, gb.SUMMARY, gb.SHORT, gb.COMPLETE):
            buf = io.StringIO()
            gb.fprint(obj, type(obj).__name__, level, buf)
            if level > gb.SILENT:
                assert str(obj.nvals) in buf.getvalue() or \
                    "nvals" in buf.getvalue()
        assert gb.check(obj)
