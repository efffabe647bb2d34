"""GrB_* compatibility facade tests: reference-style call sequences."""

import numpy as np
import pytest

from graphblas_tpu import grb
from graphblas_tpu.ops.flopcount import (axb_flopcount, choose_axb_method,
                                         last_axb_method)


def test_catalog_sizes():
    semirings = [k for k in grb.__all__ if "_MONOID" not in k and
                 k.startswith("GxB_") and
                 getattr(grb, k).__class__.__name__ == "Semiring"]
    monoids = [k for k in grb.__all__ if k.endswith("_MONOID")]
    assert len(semirings) == 960
    assert len(monoids) == 44


def test_reference_style_mxm():
    grb.GrB_init()
    A = grb.GrB_Matrix_new(grb.GrB_FP64, 3, 3)
    A = grb.GrB_Matrix_build(A, [0, 1, 2], [1, 2, 0], [1.0, 2.0, 3.0])
    B = grb.GrB_Matrix_dup(A)
    C = grb.GrB_Matrix_new(grb.GrB_FP64, 3, 3)
    C = grb.GrB_mxm(C, None, None, grb.GxB_PLUS_TIMES_FP64, A, B, None)
    assert grb.GrB_Matrix_nvals(C) == 3
    assert grb.GrB_Matrix_extractElement(C, 0, 2) == 2.0
    I, J, X = grb.GrB_Matrix_extractTuples(C)
    assert len(I) == 3


def test_reference_style_bfs_fragment():
    # the bfs5m setup sequence, written as in the reference
    n = 4
    ring = [(0, 1), (1, 2), (2, 3), (3, 0)]
    A = grb.GrB_Matrix_new(grb.GrB_BOOL, n, n)
    A = grb.GrB_Matrix_build(A, [e[0] for e in ring],
                             [e[1] for e in ring], [True] * 4)
    v = grb.GrB_Vector_new(grb.GrB_INT32, n)
    v = grb.GrB_assign(v, None, None, 0, grb.GrB_ALL, None)
    q = grb.GrB_Vector_new(grb.GrB_BOOL, n)
    q = grb.GrB_Vector_setElement(q, True, 0)
    Lor = grb.GrB_Monoid_new(grb.GrB_LOR, False)
    Boolean = grb.GrB_Semiring_new(Lor, grb.GrB_LAND)
    desc = grb.GrB_Descriptor_new()
    desc = grb.GrB_Descriptor_set(desc, grb.GrB_MASK, grb.GrB_SCMP)
    desc = grb.GrB_Descriptor_set(desc, grb.GrB_OUTP, grb.GrB_REPLACE)
    level = 1
    while True:
        v = grb.GrB_assign(v, q, None, level, grb.GrB_ALL, None)
        q = grb.GrB_vxm(q, v, None, Boolean, q, A, desc)
        if not grb.GrB_reduce(None, Lor, q):
            break
        level += 1
    lev = np.where(v.pattern_np(), v.to_dense(), 0)
    assert lev.tolist() == [1, 2, 3, 4]


def test_descriptor_axb_method_hint():
    A = grb.GrB_Matrix_new(grb.GrB_FP64, 2, 2)
    A = grb.GrB_Matrix_build(A, [0, 1], [1, 0], [2.0, 3.0])
    d = grb.GrB_Descriptor_set(grb.GrB_Descriptor_new(),
                               grb.GxB_AxB_METHOD, grb.GxB_AxB_GUSTAVSON)
    C = grb.GrB_mxm(grb.GrB_Matrix_new(grb.GrB_FP64, 2, 2), None, None,
                    grb.GxB_PLUS_TIMES_FP64, A, A, d)
    assert last_axb_method() == "vpu:generic"
    C2 = grb.GrB_mxm(grb.GrB_Matrix_new(grb.GrB_FP64, 2, 2), None, None,
                     grb.GxB_PLUS_TIMES_FP64, A, A, None)
    assert last_axb_method() == "mxu:plus_times"
    assert np.allclose(C.to_dense(), C2.to_dense())


def test_flopcount_and_select():
    rng = np.random.default_rng(0)
    Ap = rng.random((20, 30)) < 0.2
    Bp = rng.random((30, 10)) < 0.2
    fl = axb_flopcount(Ap, Bp)
    want = sum(int(Ap[:, k].sum()) * int(Bp[k].sum()) for k in range(30))
    assert fl == want
    assert choose_axb_method(1000, 1000, 1000, 5000, 5000) == "dense-mxu"
    # bitmap-scale product with a sparse mask -> bitpack wins
    m = choose_axb_method(10000, 10000, 10000, 10**6, 10**6,
                          mnnz=10**4)
    assert m == "bitpack"
    # bitmap-scale banded structure -> bsr wins
    m = choose_axb_method(10000, 10000, 10000, 10**6, 10**6,
                          mnnz=None, ntile_triples=3000)
    assert m == "bsr"
    # past bitmap scale the dense engines are infeasible (n^2 arrays,
    # n^2/32 bitpack words): the sparse ESC engine takes over
    m = choose_axb_method(100000, 100000, 100000, 10**6, 10**6,
                          mnnz=10**5)
    assert m == "esc"


def test_import_export_names():
    A = grb.GrB_Matrix_new(grb.GrB_FP64, 2, 3)
    A = grb.GrB_Matrix_build(A, [0, 1], [2, 0], [5.0, 7.0])
    nr, nc, p, j, x = grb.GxB_Matrix_export_CSR(A)
    B = grb.GxB_Matrix_import_CSR(nr, nc, p, j, x, grb.GrB_FP64)
    assert np.allclose(B.to_matrix().to_dense(), A.to_dense())


def test_wait_and_nonblocking():
    v = grb.GrB_Vector_new(grb.GrB_FP64, 4)
    v = v.setElement(2.5, 1, blocking=False)
    assert v._pending
    v = grb.GrB_wait(v)
    assert not v._pending
    assert grb.GrB_Vector_extractElement(v, 1) == 2.5


# ---------------------------------------------------------------------------
# facade review regressions
# ---------------------------------------------------------------------------

def test_grb_wait_single_returns_object():
    v = grb.GrB_Vector_new(grb.GrB_FP64, 3)
    v = v.setElement(1.0, 0, blocking=False)
    v = grb.GrB_wait(v)          # NOT a tuple
    assert grb.GrB_Vector_extractElement(v, 0) == 1.0
    a, b = grb.GrB_wait(v, v)    # multiple -> tuple
    assert grb.GrB_Vector_nvals(a) == 1


def test_descriptor_reset_to_default():
    d = grb.GrB_Descriptor_set(grb.GrB_Descriptor_new(),
                               grb.GrB_OUTP, grb.GrB_REPLACE)
    assert d.replace
    d = grb.GrB_Descriptor_set(d, grb.GrB_OUTP, grb.GxB_DEFAULT)
    assert not d.replace


def test_gxb_set_global_form():
    grb.GxB_set("format", "by_col")
    assert grb.GxB_get("format") == "by_col"
    grb.GxB_set("format", "by_row")


def test_subassign_col_vector_form():
    import numpy as np
    C = grb.GrB_Matrix_new(grb.GrB_FP64, 4, 3)
    u = grb.GrB_Vector_new(grb.GrB_FP64, 2)
    u = u.setElement(5.0, 0).setElement(7.0, 1)
    # C(I, 1) = u  (GxB_Col_subassign form)
    C2 = grb.GxB_subassign(C, None, None, u, [0, 2], 1)
    assert C2.extractElement(0, 1) == 5.0
    assert C2.extractElement(2, 1) == 7.0
    # C(1, J) = u'  (GxB_Row_subassign form)
    C3 = grb.GxB_subassign(C, None, None, u, 1, [0, 2])
    assert C3.extractElement(1, 0) == 5.0
    assert C3.extractElement(1, 2) == 7.0
