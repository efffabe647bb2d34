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
