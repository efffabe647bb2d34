"""Slab-width (S) sweep for the valdot value-panel engine.

The committed DMA-gather probe (``tools/gatherdot_probe.py``) showed a
row gather costs ~53 ns of issue latency regardless of row size — so at
S=1024 f32 (4 KB rows) the gather wall is ISSUE-bound (~70-104 GB/s
observed, vs ~819 GB/s HBM peak).  Wider slabs amortize the issue cost
per gathered row; the price is coarser live lists (a lane live in only
part of a wide slab still gathers the whole row).  This sweep measures
the trade on the real prepped masked plus_times product and prints one
JSON line per S.

Usage: python tools/valdot_sweep.py [scale] [S...]
       (default: scale 16, S in 1024 2048 4096 8192)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import graphblas_tpu as gb                               # noqa: E402
from graphblas_tpu import sparse as sp                   # noqa: E402
from graphblas_tpu.core.semirings import semiring        # noqa: E402
from graphblas_tpu.models.rmat import (rmat_edges,       # noqa: E402
                                       symmetrize_pattern)
from graphblas_tpu.sparse import tri                     # noqa: E402
from graphblas_tpu.sparse import valdot as vd            # noqa: E402


def build(scale):
    n = 1 << scale
    I, J = rmat_edges(scale, 16, seed=7)
    I, J = symmetrize_pattern(I, J, n)
    A = sp.CsrMatrix.from_coo(I, J, np.ones(len(I), bool), n, n,
                              type=gb.BOOL, sum_duplicates=False)
    L, U = tri.tricount_prep_csr(A)
    rv = np.random.default_rng(3)

    def withvals(X):
        hp = X._options["host_pattern"]
        Iv, Jv = hp[0][:X.nvals], hp[1][:X.nvals]
        return sp.CsrMatrix.from_coo(
            Iv, Jv, rv.random(len(Iv)).astype(np.float32) + 0.5,
            X.nrows, X.ncols, type=gb.FP32, sum_duplicates=False)
    return withvals(L), withvals(U), withvals(L)


def main():
    argv = sys.argv[1:]
    scale = int(argv[0]) if argv else 16
    widths = [int(a) for a in argv[1:]] or [1024, 2048, 4096, 8192]
    Lv, Uv, Mv = build(scale)
    srv = semiring.plus_times[gb.FP32]
    key = ("valdot_plan", "FP32", "FP32")
    ref = None
    for S in widths:
        t0 = time.perf_counter()
        plan = vd.build_valdot_plan(Mv, Lv, Uv, srv, level_cols=S)
        plan_s = time.perf_counter() - t0
        if plan is None:
            print(json.dumps({"scale": scale, "S": S, "plan": None}))
            continue
        # seed the cache so the public entry uses THIS plan
        Mv._options[key] = (vd._ref(Lv.indices), vd._ref(Lv.values),
                           vd._ref(Uv.indices), vd._ref(Uv.values), plan)
        C = vd.valdot_masked_spgemm(srv, Lv, Uv, Mv)   # compile + warm
        warm = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            C2 = vd.valdot_masked_spgemm(srv, Lv, Uv, Mv)
            warm = min(warm, time.perf_counter() - t0)
        assert C2.nvals == C.nvals
        if ref is None:
            ref = (C.nvals, float(np.asarray(C.values[:C.nvals]).sum()))
        else:
            assert C.nvals == ref[0], (S, C.nvals, ref[0])
            s = float(np.asarray(C.values[:C.nvals]).sum())
            assert abs(s - ref[1]) <= 1e-4 * abs(ref[1]), (S, s, ref)
        flops = plan.covered_lanes + plan.light_lanes
        print(json.dumps({
            "scale": scale, "S": S, "levels": len(plan.levels),
            "sum_nlive": int(sum(lv.nlive for lv in plan.levels)),
            "kcut": plan.kcut,
            "cov_pct": 100.0 * plan.covered_lanes / flops,
            "light_lanes": plan.light_lanes,
            "plan_s": round(plan_s, 2), "warm_s": round(warm, 4),
            "mflops_per_s": round(flops / warm / 1e6, 1),
            "nnzC": C.nvals,
        }), flush=True)


if __name__ == "__main__":
    main()
