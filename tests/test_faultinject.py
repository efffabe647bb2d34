"""OOM fault-injection sweeps — the reference's malloc-debug protocol.

The reference arms a countdown on its malloc wrapper so the k-th
allocation fails, asserts the operation unwinds to GrB_OUT_OF_MEMORY
with every object still valid, and retries with k+1 until the op
succeeds (``Test/README.txt:33-50``, ``GB.h:2309-2321``).  Here the
faultable unit is the container-materialization checkpoint
(``utils/faultinject.py``); the protocol is identical:

  for k = 1, 2, ...:  arm(k); run op
      -> OutOfMemory: inputs must be bit-identical and valid; retry
      -> success:     result must equal the clean (uninjected) run

Immutability makes the no-corruption claim true by construction; these
sweeps prove the unwind discipline end-to-end anyway (no partially
updated global state, no poisoned caches).
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core.errors import OutOfMemory, Info
from graphblas_tpu.core.semirings import semiring
from graphblas_tpu.core.ops import binary
from graphblas_tpu.core.monoids import monoid
from graphblas_tpu.sparse import CsrMatrix, csr_spgemm, hyper_from_coo, \
    hyper_spgemm
from graphblas_tpu.utils import faultinject
from graphblas_tpu.ops.mxm import mxm
from graphblas_tpu.ops.ewise import eWiseAdd

def rand_matrix(m, n, density, t, seed=0):
    rng = np.random.default_rng(seed)
    pat = rng.random((m, n)) < density
    vals = rng.standard_normal((m, n)).astype(t.dtype)
    return gb.Matrix.from_dense(vals, t, pattern=pat)


def _snapshot(A):
    """Bit-image of a container for the inputs-unchanged assertion."""
    if isinstance(A, gb.Matrix):
        return (np.asarray(A.values).copy(), np.asarray(A.pattern).copy())
    I, J, X = A.extractTuples()
    return (np.asarray(I).copy(), np.asarray(J).copy(),
            np.asarray(X).copy())


def _assert_same(snap, A):
    if isinstance(A, gb.Matrix):
        v, p = snap
        np.testing.assert_array_equal(v, np.asarray(A.values))
        np.testing.assert_array_equal(p, np.asarray(A.pattern))
    else:
        for s, g in zip(snap, [np.asarray(x) for x in A.extractTuples()]):
            np.testing.assert_array_equal(s, g)


def _sweep(op, inputs, compare, max_k=60):
    """The reference's loop-until-success: returns (#faults, result)."""
    clean = op()  # uninjected baseline
    snaps = [_snapshot(a) for a in inputs]
    faults = 0
    for k in range(1, max_k + 1):
        faultinject.set_fault_countdown(k)
        try:
            got = op()
        except OutOfMemory:
            faults += 1
            for s, a in zip(snaps, inputs):
                _assert_same(s, a)
            continue
        finally:
            faultinject.clear_fault()
        compare(clean, got)
        return faults, got
    raise AssertionError(f"op still failing after {max_k} checkpoints")


def _cmp_matrix(a, b):
    np.testing.assert_allclose(np.asarray(a.values), np.asarray(b.values),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.pattern),
                                  np.asarray(b.pattern))


def _cmp_tuples(a, b):
    for x, y in zip(a.extractTuples(), b.extractTuples()):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5)


def test_mxm_bitmap_oom_sweep():
    A = rand_matrix(12, 12, 0.4, gb.FP32, seed=1)
    B = rand_matrix(12, 12, 0.4, gb.FP32, seed=2)
    op = lambda: mxm(gb.Matrix.new(gb.FP32, 12, 12), None, None,
                     semiring.plus_times[gb.FP32], A, B)
    faults, _ = _sweep(op, [A, B], _cmp_matrix)
    assert faults >= 1  # the countdown actually fired at least once


def test_csr_spgemm_oom_sweep():
    rng = np.random.default_rng(3)
    n, nnz = 40, 160
    I, J = rng.integers(0, n, nnz), rng.integers(0, n, nnz)
    X = rng.standard_normal(nnz).astype(np.float32)
    A = CsrMatrix.from_coo(I, J, X, n, n)
    op = lambda: csr_spgemm(semiring.plus_times[gb.FP32], A, A)
    faults, _ = _sweep(op, [A], _cmp_tuples)
    assert faults >= 1


def test_hyper_spgemm_oom_sweep():
    rng = np.random.default_rng(4)
    big = 1 << 50
    ids = np.unique(rng.integers(0, big, 64, dtype=np.int64))[:16]
    li, lj = np.nonzero(rng.random((16, 16)) < 0.4)
    X = rng.standard_normal(len(li)).astype(np.float32)
    A = hyper_from_coo(ids[li], ids[lj], X, big, big, type=gb.FP32)
    op = lambda: hyper_spgemm(semiring.plus_times[gb.FP32], A, A)
    faults, _ = _sweep(op, [A], _cmp_tuples)
    assert faults >= 1


def test_ewise_and_wait_oom_sweep():
    A = rand_matrix(10, 10, 0.5, gb.FP64, seed=5)
    B = rand_matrix(10, 10, 0.5, gb.FP64, seed=6)

    def op():
        C = eWiseAdd(gb.Matrix.new(gb.FP64, 10, 10), None, None,
                     binary.plus[gb.FP64], A, B)
        # pending-tuple assembly path (GB_wait analogue)
        C = C.setElement(3.5, 2, 2, blocking=False)
        C = C.setElement(1.5, 2, 2, accum=binary.plus[gb.FP64],
                         blocking=False)
        return C.wait()

    faults, got = _sweep(op, [A, B], _cmp_matrix)
    assert faults >= 1
    assert np.asarray(got.values)[2, 2] == pytest.approx(5.0)


def test_from_coo_build_oom_sweep():
    rng = np.random.default_rng(7)
    I, J = rng.integers(0, 20, 50), rng.integers(0, 20, 50)
    X = rng.standard_normal(50)
    op = lambda: gb.Matrix.from_coo(I, J, X, 20, 20, type=gb.FP64)
    faults, _ = _sweep(op, [], _cmp_matrix)
    assert faults >= 1


def test_fault_error_surface():
    """The injected failure carries GrB_OUT_OF_MEMORY and lands in the
    TLS message slot read by the C facade's GrB_error()."""
    with pytest.raises(OutOfMemory) as ei:
        with faultinject.fault_countdown(1):
            gb.Matrix.new(gb.FP32, 4, 4)
    assert ei.value.info == Info.OUT_OF_MEMORY
    from graphblas_tpu.grb import GrB_error
    assert "OUT_OF_MEMORY" in GrB_error()
    # disarmed afterwards: same call succeeds
    M = gb.Matrix.new(gb.FP32, 4, 4)
    assert M.nvals() == 0


def test_countdown_is_one_shot():
    """After firing once the countdown disarms (reference semantics:
    the test harness re-arms explicitly per trial)."""
    faultinject.set_fault_countdown(1)
    with pytest.raises(OutOfMemory):
        gb.Matrix.new(gb.FP32, 2, 2)
    # no re-fire without re-arming
    gb.Matrix.new(gb.FP32, 2, 2)
    faultinject.clear_fault()


def test_countdown_validates():
    with pytest.raises(ValueError):
        faultinject.set_fault_countdown(0)
