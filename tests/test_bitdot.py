"""Bitpacked dot-panel engine (sparse/bitdot.py): correctness of the
heavy/light split against the sort-merge oracle, plan gating, cache.

Reference counterpart: any-pattern masked dot products
(``GB_AxB_dot.c:10-27``) — the engine must be exact on every structure,
power-law included.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import graphblas_tpu as gb
from graphblas_tpu import sparse as sp
from graphblas_tpu.sparse.bitdot import (build_bitdot_plan, bitdot_counts,
                                         masked_pair_counts_auto)
from graphblas_tpu.sparse.tri import (masked_pair_counts, tricount_esc,
                                      tricount_prep_csr, ktruss_esc)


def _powerlaw_graph(rng, n=600, alpha=1.2, mult=3):
    deg = np.minimum((rng.pareto(alpha, n) * mult).astype(int) + 1, n - 1)
    I = np.repeat(np.arange(n), deg)
    J = rng.integers(0, n, size=len(I))
    keep = I != J
    I, J = I[keep], J[keep]
    lin = np.unique(np.concatenate([I * n + J, J * n + I]))
    return lin // n, lin % n, n


def _csr(I, J, n):
    return sp.CsrMatrix.from_coo(I, J, np.ones(len(I), bool), n, n,
                                 type=gb.BOOL, sum_duplicates=False)


@pytest.mark.parametrize("seed", [3, 11])
def test_hybrid_matches_sort_merge(rng, seed):
    r = np.random.default_rng(seed)
    I, J, n = _powerlaw_graph(r)
    A = _csr(I, J, n)
    L, U = tricount_prep_csr(A)
    ref = masked_pair_counts(L, L, U)
    plan = build_bitdot_plan(L, L, U, min_lanes=1, cover_target=0.8)
    assert plan is not None
    heavy = bitdot_counts(plan, L)
    got = heavy + masked_pair_counts(L, plan.A_light, U)
    assert bool(jnp.all(got == ref))
    # covered + light lane accounting is exact
    assert plan.covered_lanes + plan.light_lanes > 0
    assert plan.A_light.nvals < A.nvals


def test_full_coverage_no_residual(rng):
    r = np.random.default_rng(5)
    I, J, n = _powerlaw_graph(r, n=300)
    A = _csr(I, J, n)
    L, U = tricount_prep_csr(A)
    plan = build_bitdot_plan(L, L, U, min_lanes=1, cover_target=1.0)
    assert plan is not None and plan.A_light.nvals == 0
    ref = masked_pair_counts(L, L, U)
    assert bool(jnp.all(bitdot_counts(plan, L) == ref))


def test_auto_small_graph_falls_back(rng):
    # tiny wedge counts: the packer refuses and the sort-merge answers
    I = np.array([1, 2, 2, 3, 3, 3])
    J = np.array([0, 0, 1, 0, 1, 2])
    L = _csr(I, J, 4)
    U = _csr(J, I, 4)
    assert build_bitdot_plan(L, L, U) is None
    ref = masked_pair_counts(L, L, U)
    got = masked_pair_counts_auto(L, L, U)
    assert bool(jnp.all(got == ref))
    assert int(jnp.sum(ref)) == 4      # K4 has 4 triangles


def test_plan_cache_reused(rng):
    r = np.random.default_rng(7)
    I, J, n = _powerlaw_graph(r, n=400)
    A = _csr(I, J, n)
    L, U = tricount_prep_csr(A)
    import graphblas_tpu.sparse.bitdot as bd
    old = bd._MIN_LANES
    bd._MIN_LANES = 1
    try:
        c1 = masked_pair_counts_auto(L, L, U)
        entry = L._options.get("bitdot_plan")
        c2 = masked_pair_counts_auto(L, L, U)
        entry2 = L._options.get("bitdot_plan")
        assert entry is not None and entry2 is entry   # no rebuild
        assert bool(jnp.all(c1 == c2))
    finally:
        bd._MIN_LANES = old


def test_tricount_and_ktruss_route_through_auto(rng):
    r = np.random.default_rng(13)
    I, J, n = _powerlaw_graph(r, n=500)
    A = _csr(I, J, n)
    L, U = tricount_prep_csr(A)
    want = int(jnp.sum(masked_pair_counts(L, L, U).astype(jnp.int64)))
    assert tricount_esc(L, U) == want
    # ktruss on the undirected pattern agrees with the pure engine
    import graphblas_tpu.sparse.bitdot as bd
    old = bd._MIN_LANES
    bd._MIN_LANES = 1
    try:
        t1, c1, n1 = ktruss_esc(A, 4)
    finally:
        bd._MIN_LANES = old
    t2, c2, n2 = ktruss_esc(A, 4)
    assert t1.nvals == t2.nvals and n1 == n2
    assert bool(jnp.all(jnp.sort(c1[:t1.nvals]) == jnp.sort(c2[:t2.nvals])))


def test_rectangular_and_empty():
    # rectangular product: A (3x5) . B (5x4), mask 3x4
    I = np.array([0, 0, 1, 2, 2])
    K = np.array([0, 3, 1, 3, 4])
    A = sp.CsrMatrix.from_coo(I, K, np.ones(5, bool), 3, 5, type=gb.BOOL,
                              sum_duplicates=False)
    KB = np.array([0, 1, 3, 3, 4])
    JB = np.array([1, 2, 1, 3, 3])
    B = sp.CsrMatrix.from_coo(KB, JB, np.ones(5, bool), 5, 4,
                              type=gb.BOOL, sum_duplicates=False)
    MI = np.array([0, 0, 1, 2])
    MJ = np.array([1, 3, 2, 3])
    M = sp.CsrMatrix.from_coo(MI, MJ, np.ones(4, bool), 3, 4,
                              type=gb.BOOL, sum_duplicates=False)
    ref = masked_pair_counts(M, A, B)
    plan = build_bitdot_plan(M, A, B, min_lanes=1, cover_target=1.0)
    got = bitdot_counts(plan, M)
    if plan.A_light.nvals:
        got = got + masked_pair_counts(M, plan.A_light, B)
    assert bool(jnp.all(got == ref))
    # empty operands refuse the plan
    E = sp.CsrMatrix.from_coo(np.array([], int), np.array([], int),
                              np.array([], bool), 3, 5, type=gb.BOOL,
                              sum_duplicates=False)
    assert build_bitdot_plan(M, E, B, min_lanes=1) is None


def test_multi_level_slabs(rng):
    # force the level machinery on a small graph by shrinking the
    # thresholds: the multi-slab counts must equal the single-engine
    # oracle exactly (slabs partition the contraction columns)
    import graphblas_tpu.sparse.bitdot as bd
    r = np.random.default_rng(21)
    I, J, n = _powerlaw_graph(r, n=800, mult=5)
    A = _csr(I, J, n)
    L, U = tricount_prep_csr(A)
    old_rem, old_lanes = bd._MIN_LEVEL_REM, bd._MIN_LANES
    old_cov = bd._MIN_LEVEL_COVER
    bd._MIN_LEVEL_REM, bd._MIN_LANES = 1, 1
    bd._MIN_LEVEL_COVER = 1
    try:
        # tiny budget -> small W -> many levels
        plan = build_bitdot_plan(L, L, U, budget_bytes=4 * (2 * n) * 24,
                                 cover_target=1.0, min_lanes=1)
        assert plan is not None and len(plan.levels) >= 1
        got = bitdot_counts(plan, L)
        if plan.A_light.nvals:
            got = got + masked_pair_counts(L, plan.A_light, U)
        ref = masked_pair_counts(L, L, U)
        assert bool(jnp.all(got == ref))
        # lane accounting: slabs + light partition the wedges
        lv_cov = sum(lv.covered for lv in plan.levels)
        assert plan.covered_lanes >= lv_cov
    finally:
        bd._MIN_LEVEL_REM, bd._MIN_LANES = old_rem, old_lanes
        bd._MIN_LEVEL_COVER = old_cov


def test_alive_repack_matches_cached(rng):
    # alive == all-live must reproduce the cached-panel counts exactly
    r = np.random.default_rng(31)
    I, J, n = _powerlaw_graph(r, n=500)
    A = _csr(I, J, n)
    L, U = tricount_prep_csr(A)
    plan = build_bitdot_plan(L, L, U, min_lanes=1, cover_target=1.0,
                             keep_entry_lists=True)
    assert plan is not None
    base = bitdot_counts(plan, L)
    alive_a = jnp.arange(L.nzmax) < L.nvals
    alive_b = jnp.arange(U.nzmax) < U.nvals
    live = bitdot_counts(plan, L, alive_a=alive_a, alive_b=alive_b)
    assert bool(jnp.all(base == live))
    # killing every A entry zeroes the heavy counts
    dead = jnp.zeros((L.nzmax,), bool)
    assert int(jnp.sum(bitdot_counts(plan, L, alive_a=dead))) == 0
    # partial liveness == counts on the filtered operands (oracle)
    kill = np.zeros(L.nzmax, bool)
    kill[: L.nvals] = r.random(L.nvals) < 0.5
    alive_p = jnp.asarray(~kill) & alive_a
    from graphblas_tpu.sparse.tri import csr_filter_lanes
    L_f = csr_filter_lanes(L, alive_p)
    ref = masked_pair_counts(L, L_f, U)
    got = bitdot_counts(plan, L, alive_a=alive_p)
    if plan.A_light.nvals:
        al = alive_p[jnp.clip(plan.light_eids, 0, L.nzmax - 1)]
        lf = csr_filter_lanes(plan.A_light,
                              al & (jnp.arange(plan.A_light.nzmax)
                                    < plan.A_light.nvals))
        if lf.nvals:
            got = got + masked_pair_counts(L, lf, U)
    assert bool(jnp.all(got == ref))


def test_alive_requires_entry_lists(rng):
    r = np.random.default_rng(33)
    I, J, n = _powerlaw_graph(r, n=400)
    A = _csr(I, J, n)
    L, U = tricount_prep_csr(A)
    plan = build_bitdot_plan(L, L, U, min_lanes=1)
    assert plan is not None
    with pytest.raises(ValueError, match="keep_entry_lists"):
        bitdot_counts(plan, L, alive_a=jnp.ones((L.nzmax,), bool))


def test_row_compacted_panels_exact(rng):
    # large row space, few live rows: the planner must compact and the
    # counts must still match the sort-merge oracle bit for bit
    r = np.random.default_rng(17)
    m = 20000                      # row space much larger than live rows
    rows = r.integers(0, 200, 4000)            # only rows < 200 live
    cols = r.integers(0, 500, 4000)
    lin = np.unique(rows.astype(np.int64) * 500 + cols)
    I, K = lin // 500, lin % 500
    A = sp.CsrMatrix.from_coo(I, K, np.ones(len(I), bool), m, 500,
                              type=gb.BOOL, sum_duplicates=False)
    KB = r.integers(0, 500, 3000)
    JB = r.integers(0, 200, 3000)
    linb = np.unique(KB.astype(np.int64) * 200 + JB)
    B = sp.CsrMatrix.from_coo(linb // 200, linb % 200,
                              np.ones(len(linb), bool), 500, 200,
                              type=gb.BOOL, sum_duplicates=False)
    MI = r.integers(0, 200, 2000)
    MJ = r.integers(0, 200, 2000)
    linm = np.unique(MI.astype(np.int64) * 200 + MJ)
    M = sp.CsrMatrix.from_coo(linm // 200, linm % 200,
                              np.ones(len(linm), bool), m, 200,
                              type=gb.BOOL, sum_duplicates=False)
    ref = masked_pair_counts(M, A, B)
    plan = build_bitdot_plan(M, A, B, min_lanes=1, cover_target=1.0)
    assert plan is not None
    # the A side must actually have compacted (live rows << m)
    assert any(lv.amap is not None for lv in plan.levels)
    got = bitdot_counts(plan, M)
    if plan.A_light.nvals:
        got = got + masked_pair_counts(M, plan.A_light, B)
    assert bool(jnp.all(got == ref))


def test_ktruss_incremental_matches_fallback(rng):
    r = np.random.default_rng(41)
    I, J, n = _powerlaw_graph(r, n=700, mult=4)
    A = _csr(I, J, n)
    import graphblas_tpu.sparse.bitdot as bd
    from graphblas_tpu.sparse.tri import _ktruss_sort_merge
    old = bd._MIN_LANES
    bd._MIN_LANES = 1
    try:
        for k in (3, 4, 6):
            t1, c1, s1 = ktruss_esc(A, k)          # incremental
            t2, c2, s2 = _ktruss_sort_merge(A, k, 1 << 26, 1000)
            assert t1.nvals == t2.nvals and s1 == s2
            I1, J1, _ = t1.extractTuples()
            I2, J2, _ = t2.extractTuples()
            assert np.array_equal(np.asarray(I1), np.asarray(I2))
            assert np.array_equal(np.asarray(J1), np.asarray(J2))
            assert bool(jnp.all(jnp.sort(c1[: t1.nvals])
                                == jnp.sort(c2[: t2.nvals])))
    finally:
        bd._MIN_LANES = old
