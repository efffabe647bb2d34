"""Benchmark: masked-SpGEMM triangle counting (the reference's headline
workload) on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference counts triangles on Wathen demo
graphs at 5.62 M edges/s kernel-only (dot method, 1 thread,
``Demo/Output/tri_demo.out:82``).  We run the same SandiaDot masked mxm
((L*U').*L + reduce) on a 760x larger Wathen instance (nx=ny=128,
~50 K nodes, ~360 K edges) through the library's auto-selected engine —
the band-ring Pallas kernel (``sparse/pallas_window.py``): U streams
once through a VMEM ring, mask fused, MXU int8 contractions, ONE
dispatch per call.

Timing note: the device is reached through a tunnel with ~32 ms RTT and
``block_until_ready()`` does not block there, so the kernel is timed by
asynchronously dispatching K iterations and pulling the final partials
(the FIFO stream drains all K; PERF.md "honest timing").  Two rates are
reported (VERDICT round-2 weak #9): the amortized kernel rate and the
single-call API rate of ``tricount_auto`` (which pays one full RTT per
call through this tunnel).
"""

import json
import time

import numpy as np


def main():
    import jax
    import graphblas_tpu as gb
    from graphblas_tpu import sparse as sp
    from graphblas_tpu.models.generate import wathen_coo
    from graphblas_tpu.sparse import window as W
    from graphblas_tpu.sparse import tri
    from graphblas_tpu.sparse.pallas_window import tricount_band_partials

    # Wathen graph, same family as tri_demo (nx=ny=128 -> n=49665),
    # assembled host-side from triplets — only the band panels reach
    # the device (the production dataflow for sharded loading too).
    nx = ny = 128
    I, J, X, n = wathen_coo(nx, ny, seed=1)
    ku = np.unique(I * n + J)
    iu, ju = ku // n, ku % n
    off = iu != ju
    iu, ju = iu[off], ju[off]
    nedges = len(iu) // 2
    lo, up = iu > ju, iu < ju
    L = sp.CsrMatrix.from_coo(iu[lo], ju[lo], np.ones(lo.sum(), bool),
                              n, n, type=gb.BOOL, sum_duplicates=False)
    U = sp.CsrMatrix.from_coo(iu[up], ju[up], np.ones(up.sum(), bool),
                              n, n, type=gb.BOOL, sum_duplicates=False)

    # library-level call (engine auto-select; includes the host pull)
    t0 = time.perf_counter()
    ntri = tri.tricount_auto(L, U)
    api_first = time.perf_counter() - t0   # includes plan build+compile
    from graphblas_tpu.ops.flopcount import last_axb_method
    engine = last_axb_method()
    t0 = time.perf_counter()
    ntri2 = tri.tricount_auto(L, U)
    api_call = time.perf_counter() - t0    # steady state: 1 dispatch+pull
    assert ntri == ntri2

    # kernel-rate: K async dispatches of the public engine entry, one
    # pull (timed FIRST relative to any large host pulls — a big
    # device->host transfer degrades later dispatch latency ~20x on
    # this tunnel)
    plan = W.build_band_plan(L, U)
    assert plan is not None, "bench graph must qualify for the band plan"
    K = 200
    np.asarray(tricount_band_partials(plan))   # warm
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [tricount_band_partials(plan) for _ in range(K)]
        np.asarray(outs[-1])                   # pull = completion barrier
        elapsed = min(elapsed, (time.perf_counter() - t0) / K)

    # correctness gates AFTER timing: (1) the independent sort-merge
    # CSR engine must agree; (2) at nx=64 a dense-BLAS oracle run is in
    # tests (test_window.py, tests_tpu) — here the cross-engine check
    # keeps the gate O(nnz) at this scale.
    want = tri.tricount_esc(L, U)
    assert ntri == want, f"tricount mismatch: {ntri} != {want}"

    # ---- the UNSTRUCTURED regime (ADVICE r3: the bench file must show
    # both): power-law R-MAT through the bitdot hybrid engine ----
    from graphblas_tpu.models.rmat import rmat_edges
    from graphblas_tpu.models.rmat import symmetrize_pattern
    rs = 16
    rn = 1 << rs
    RI, RJ = rmat_edges(rs, 16, seed=7)
    RI, RJ = symmetrize_pattern(RI, RJ, rn)
    RA = sp.CsrMatrix.from_coo(RI, RJ, np.ones(len(RI), bool), rn, rn,
                               type=gb.BOOL, sum_duplicates=False)
    RL, RU = tri.tricount_prep_csr(RA)
    rtri = tri.tricount_esc(RL, RU)          # warm the hybrid plan
    t0 = time.perf_counter()
    rtri2 = tri.tricount_esc(RL, RU)
    r_elapsed = time.perf_counter() - t0
    assert rtri == rtri2
    rmat_engine = last_axb_method()

    rate = nedges / elapsed
    baseline = 5.62e6  # edges/s, Demo/Output/tri_demo.out:82 (dot method)
    # chip-relative accounting: device work = the real tile-triple
    # schedule (ntriples * 2*T^3 MACs) vs the v5e int8 peak (394 TOPS);
    # "useful" flops are the reference-style masked-SpGEMM wedge count.
    T = 128
    device_flops = plan.ntriples * 2 * T**3
    useful = 2 * ntri
    mfu = device_flops / elapsed / 394e12
    print(json.dumps({
        "metric": "masked_spgemm_tricount_edges_per_s",
        "value": rate,
        "unit": "edges/s",
        "vs_baseline": rate / baseline,
        "engine": engine,
        "n": n,
        "nedges": nedges,
        "ntri": ntri,
        "device_gflops": device_flops / elapsed / 1e9,
        "useful_gflops": useful / elapsed / 1e9,
        "mfu_int8": mfu,
        "mfu_useful": useful / elapsed / 394e12,
        "structure_note": ("mfu_int8 counts scheduled tile MACs on the "
                           "banded Wathen graph; the rmat_* fields show "
                           "the unstructured power-law regime"),
        "api_call_s": api_call,
        "api_edges_per_s": nedges / api_call,
        "rmat_scale": rs,
        "rmat_nnz": len(RI),
        "rmat_ntri": rtri,
        "rmat_engine": rmat_engine,
        "rmat_nnz_per_s": len(RI) / r_elapsed,
        "rmat_edges_per_s": (len(RI) // 2) / r_elapsed,
        # reference CPU on its hardest power-law GraphChallenge entries:
        # 0.09-0.14 M edges/s (Extras/tri/tri_grb_results.m)
        "rmat_vs_ref_powerlaw": ((len(RI) // 2) / r_elapsed) / 0.14e6,
    }))


if __name__ == "__main__":
    # one retry: the tunneled TPU backend occasionally aborts a process
    # transiently (observed "ABORTED: TPU backend error")
    try:
        main()
    except Exception:  # pragma: no cover
        import sys
        import traceback
        traceback.print_exc()
        print("retrying after transient failure", file=sys.stderr,
              flush=True)
        main()
