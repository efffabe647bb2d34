"""Per-op counters (utils/counters.py): the observability surface —
op dispatch counts, AxB engine histogram, modelled flops (VERDICT
round-1 aux #69)."""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu.core.semirings import semiring
from graphblas_tpu.utils import counters


def test_counters_track_ops_and_methods():
    counters.reset()
    rng = np.random.default_rng(0)
    D = (rng.random((8, 8)) < 0.4).astype(np.float64)
    A = gb.Matrix.from_dense(D, gb.FP64, pattern=D > 0)
    sr = semiring.plus_times[gb.FP64]
    C = gb.mxm(gb.Matrix.new(gb.FP64, 8, 8), None, None, sr, A, A)
    C = gb.eWiseAdd(C, None, None, gb.binary.plus[gb.FP64], A, A)
    gb.reduce_to_scalar(None, gb.monoid.plus[gb.FP64], A)
    st = counters.stats()
    assert st["ops"].get("mxm") == 1
    assert st["ops"].get("eWiseAdd") == 1
    assert st["ops"].get("reduce_to_scalar") == 1
    assert sum(st["axb_methods"].values()) >= 1


def test_counters_disable_and_reset():
    counters.reset()
    counters.enable(False)
    counters.bump("mxm")
    assert counters.stats()["ops"] == {}
    counters.enable(True)
    counters.bump("mxm", 3)
    assert counters.stats()["ops"]["mxm"] == 3
    counters.reset()
    assert counters.stats()["ops"] == {}
    assert counters.stats()["modelled_flops"] == 0
