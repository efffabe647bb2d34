"""Native C++ parser/builder tests (skipped when the .so isn't built;
CI builds it with `make -C native`)."""

import numpy as np
import pytest

from graphblas_tpu.io import native

LIB = native.native_lib()
needs_lib = pytest.mark.skipif(LIB is None, reason="native lib not built")


@needs_lib
def test_parse_triplets(tmp_path):
    p = tmp_path / "g.tsv"
    p.write_text("0 0 1.5\n1 2 -3e2\n% comment\n2 1\n\n3 3 0.25\n")
    out = native.parse_triplets_native(str(p))
    assert out is not None
    I, J, X = out
    assert I.tolist() == [0, 1, 2, 3]
    assert J.tolist() == [0, 2, 1, 3]
    assert np.allclose(X, [1.5, -300.0, 1.0, 0.25])


@needs_lib
def test_parse_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    I = rng.integers(0, 100, 500)
    J = rng.integers(0, 100, 500)
    X = rng.normal(size=500)
    p = tmp_path / "r.tsv"
    with open(p, "w") as f:
        for i, j, x in zip(I, J, X):
            f.write(f"{i} {j} {x:.17g}\n")
    In, Jn, Xn = native.parse_triplets_native(str(p))
    assert np.array_equal(In, I)
    assert np.array_equal(Jn, J)
    assert np.allclose(Xn, X, rtol=1e-12)


@needs_lib
def test_parse_edge_case_floats(tmp_path):
    """Native strtod values must match Python float() to the ULP
    (ADVICE round 1: the old hand-rolled parser was off by ULPs on
    exponent paths and turned nan/inf into 1.0)."""
    cases = ["1.7976931348623157e308", "9.999999999999999e-5",
             "2.2250738585072014e-308", "5e-324", "nan", "inf", "-inf",
             "-0.0", "123456789.123456789", "1e-45", "3.3333333333333335",
             "0.1", "6.02214076e23", "-2.718281828459045e-100"]
    p = tmp_path / "edge.tsv"
    p.write_text("".join(f"{i} 0 {c}\n" for i, c in enumerate(cases)))
    I, J, X = native.parse_triplets_native(str(p))
    expect = np.array([float(c) for c in cases])
    assert np.array_equal(X, expect, equal_nan=True), \
        [(c, x, e) for c, x, e in zip(cases, X, expect)
         if not (x == e or (np.isnan(x) and np.isnan(e)))]


@needs_lib
def test_parse_malformed_raises_both_paths(tmp_path):
    """Malformed value tokens raise in BOTH the native parser and the
    numpy fallback (no silent value=1.0)."""
    from graphblas_tpu.io.read import read_triplets
    p = tmp_path / "bad.tsv"
    p.write_text("0 0 1.5\n1 1 oops\n")
    with pytest.raises(ValueError):
        native.parse_triplets_native(str(p))
    import io as _io
    with pytest.raises(ValueError):
        read_triplets(_io.StringIO(p.read_text()))  # fallback path
    # missing index column: both raise
    p2 = tmp_path / "bad2.tsv"
    p2.write_text("0 0 1.5\n7\n")
    with pytest.raises(ValueError):
        native.parse_triplets_native(str(p2))
    with pytest.raises(ValueError):
        read_triplets(_io.StringIO(p2.read_text()))


@needs_lib
def test_parse_inline_comments_and_mixed_columns(tmp_path):
    """Inline %/# comments and mixed 2/3-column lines parse identically
    in the native path and the fallback."""
    from graphblas_tpu.io.read import read_triplets
    body = "0 0 1.5 # trailing\n1 2 % note\n2 1 -3e2\n% full line\n3 3\n"
    p = tmp_path / "mix.tsv"
    p.write_text(body)
    import io as _io
    In, Jn, Xn = native.parse_triplets_native(str(p))
    If, Jf, Xf = read_triplets(_io.StringIO(body))  # fallback path
    assert np.array_equal(In, If) and np.array_equal(Jn, Jf)
    assert np.array_equal(Xn, Xf)
    assert Xn.tolist() == [1.5, 1.0, -300.0, 1.0]


@needs_lib
@pytest.mark.parametrize("dup", ["PLUS", "FIRST", "SECOND", "MIN", "MAX",
                                 "TIMES"])
def test_sort_dedup(dup):
    rng = np.random.default_rng(1)
    I = rng.integers(0, 20, 300)
    J = rng.integers(0, 20, 300)
    X = rng.normal(size=300)
    out = native.sort_dedup_native(I, J, X, dup)
    assert out is not None
    Is, Js, Xs = out
    # sorted lexicographic, unique
    lin = Is * 20 + Js
    assert (np.diff(lin) > 0).all()
    # oracle fold
    oracle = {}
    fns = {"PLUS": lambda a, b: a + b, "FIRST": lambda a, b: a,
           "SECOND": lambda a, b: b, "MIN": min, "MAX": max,
           "TIMES": lambda a, b: a * b}
    for i, j, x in zip(I, J, X):
        k = (i, j)
        oracle[k] = fns[dup](oracle[k], x) if k in oracle else x
    assert len(oracle) == len(Is)
    for i, j, x in zip(Is, Js, Xs):
        assert np.isclose(oracle[(i, j)], x, rtol=1e-12)


@needs_lib
def test_read_matrix_uses_native(tmp_path):
    # the io.read path should produce identical results with/without lib
    from graphblas_tpu import io as gbio
    p = tmp_path / "m.tsv"
    p.write_text("0 1 2.0\n1 0 3.0\n0 1 4.0\n")
    A = gbio.read_matrix(str(p))
    assert A.extractElement(0, 1) == 6.0
    assert A.extractElement(1, 0) == 3.0


def test_native_pair_sort_matches_lexsort():
    import numpy as np
    from graphblas_tpu.io.native import sort_pairs_native
    rng = np.random.default_rng(3)
    I = rng.integers(0, 500, 20_000)
    J = rng.integers(0, 700, 20_000)
    sp = sort_pairs_native(I, J, 500, 700)
    if sp is None:
        import pytest
        pytest.skip("native library not built")
    Is, Js, perm = sp
    order = np.lexsort((J, I))
    assert np.array_equal(Is, I[order])
    assert np.array_equal(Js, J[order])
    X = rng.random(len(I))
    assert np.array_equal(X[perm], X[order])   # stable permutation


def test_native_sym_dedup_matches_numpy():
    import numpy as np
    from graphblas_tpu.io.native import sym_dedup_native
    rng = np.random.default_rng(4)
    n = 300
    I = rng.integers(0, n, 5_000)
    J = rng.integers(0, n, 5_000)
    I[::11] = J[::11]                      # self loops must be dropped
    r = sym_dedup_native(I, J, n)
    if r is None:
        import pytest
        pytest.skip("native library not built")
    k = I != J
    lin = np.unique(np.concatenate([I[k] * n + J[k], J[k] * n + I[k]]))
    assert np.array_equal(r[0], lin // n)
    assert np.array_equal(r[1], lin % n)


def test_native_sym_dedup_sentinel_tie_regression():
    """Radix passes cover only real-key bits, so the self-loop sentinel
    can tie with an all-ones real key; the output scan must skip, not
    break (round-4 review finding)."""
    import numpy as np
    from graphblas_tpu.io.native import sym_dedup_native
    r = sym_dedup_native(np.array([5, 44]), np.array([5, 23]), 46)
    if r is None:
        import pytest
        pytest.skip("native library not built")
    assert set(zip(r[0].tolist(), r[1].tolist())) == {(44, 23), (23, 44)}
