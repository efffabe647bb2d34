"""Shared helpers: random spec matrices, conversion, comparison
(the GB_mx_* + GB_spec_compare analogue)."""

from __future__ import annotations

import numpy as np

import graphblas_tpu as gb
from . import oracle as orc

TYPES = {
    "BOOL": gb.BOOL, "INT8": gb.INT8, "UINT8": gb.UINT8,
    "INT16": gb.INT16, "UINT16": gb.UINT16, "INT32": gb.INT32,
    "UINT32": gb.UINT32, "INT64": gb.INT64, "UINT64": gb.UINT64,
    "FP32": gb.FP32, "FP64": gb.FP64,
}


def rand_om(rng, shape, dtype, density=0.5):
    p = rng.random(shape) < density
    dt = np.dtype(dtype)
    if dt == np.bool_:
        v = rng.integers(0, 2, shape).astype(bool)
    elif np.issubdtype(dt, np.integer):
        info = np.iinfo(dt)
        lo, hi = max(info.min, -4), min(info.max, 9)
        v = rng.integers(lo, hi + 1, shape).astype(dt)
    else:
        v = np.round(rng.normal(0, 2, shape), 2).astype(dt)
    v = np.where(p, v, np.zeros_like(v))
    return orc.OM(v, p)


def to_gb(o: orc.OM, t: gb.Type):
    if o.p.ndim == 1:
        return gb.Vector.from_dense(o.m, type=t, pattern=o.p)
    return gb.Matrix.from_dense(o.m, type=t, pattern=o.p)


def assert_same(result, expected: orc.OM, tol=0.0, msg=""):
    """GB_spec_compare: exact for bool/int, roundoff-tolerant for float."""
    got_p = np.asarray(result.wait().pattern)
    got_v = np.asarray(result.wait().values)
    assert got_p.shape == expected.p.shape, (
        f"{msg}: shape {got_p.shape} vs {expected.p.shape}")
    assert np.array_equal(got_p, expected.p), (
        f"{msg}: pattern mismatch\n got:\n{got_p}\n want:\n{expected.p}")
    ev = expected.m
    if np.issubdtype(ev.dtype, np.floating) and tol:
        both = expected.p
        ok = np.allclose(got_v[both].astype(np.float64),
                         ev[both].astype(np.float64),
                         rtol=tol, atol=tol, equal_nan=True)
        assert ok, f"{msg}: value mismatch\n got:\n{got_v}\n want:\n{ev}"
    else:
        same = np.array_equal(got_v[expected.p], ev[expected.p]) or (
            np.issubdtype(ev.dtype, np.floating) and
            np.array_equal(np.nan_to_num(got_v[expected.p]),
                           np.nan_to_num(ev[expected.p])))
        assert same, f"{msg}: value mismatch\n got:\n{got_v}\n want:\n{ev}"
