"""Scaling evidence harness: WEAK scaling (per-device problem size
fixed) over 1..N devices, with schedule-level facts wall-clock can't
fake (VERDICT r3 next #2).

Why weak scaling: on a single host with virtual CPU devices, strong
scaling measures host-core contention, not the schedule — the round-3
harness's n=2048 strong-scaling default produced 0.02-0.08 "efficiency"
numbers that said nothing about the SPMD design.  This harness instead:

* fixes the per-device R-MAT scale and grows the graph with the device
  count (scale = S0 + log2(d)) — perfect weak scaling = flat per-device
  wall time;
* extracts the collective schedule from the COMPILED program
  (instruction census + payload bytes via parallel.introspect) — on a
  real pod the same program runs, so these are the contract a pod must
  confirm;
* reports the analytic ring-comm model (ring SpGEMM moves each B slab
  d-1 times: bytes/device = (d-1) * slab_bytes) checked against the
  HLO census;
* reports per-device compiled memory (argument+temp buffers) to verify
  the O(nnz/d) slab claim on the program the device actually runs.

What a real pod must confirm: that per-device wall time stays flat when
ICI replaces host-core contention (>= 0.7 weak efficiency north star),
and that the ppermute ring overlaps with local compute.  Everything
else — collective kinds/counts/bytes, per-device memory — is decided at
compile time and is measured here exactly.

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python bench_scaling.py [--scale0 13] [--strong]

Prints one JSON line per (algorithm, d) plus a summary line; the
committed results table lives in PERF.md ("Scaling evidence").
"""

import argparse
import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS"):
    import jax
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
import jax  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import graphblas_tpu as gb                       # noqa: E402
from graphblas_tpu import parallel as par        # noqa: E402
from graphblas_tpu.parallel import introspect    # noqa: E402
introspect.enable()


def rmat_graph(scale: int, seed: int = 7):
    """Symmetrized, deduped, loop-free R-MAT (ef=16) as CsrMatrix."""
    from graphblas_tpu.models.rmat import rmat_edges
    from graphblas_tpu.sparse import CsrMatrix
    from graphblas_tpu.models.rmat import symmetrize_pattern
    n = 1 << scale
    I, J = rmat_edges(scale, 16, seed=seed)
    I, J = symmetrize_pattern(I, J, n)
    A = CsrMatrix.from_coo(I, J, np.ones(len(I), bool), n, n,
                           type=gb.BOOL, sum_duplicates=False)
    return A, n, len(I)


def time_it(fn, reps=3):
    fn()                                  # warm (compile)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def slab_bytes(D) -> int:
    """Per-device bytes of one DistCsr slab (the O(nnz/d) claim)."""
    per = 0
    for a in (D.rowptr, D.indices, D.locrow):
        per += a.nbytes // a.shape[0]
    vals = jax.tree_util.tree_leaves(D.values)
    for v in vals:
        per += v.nbytes // v.shape[0]
    return per


def _dense_rows(d: int, scale0_dense: int, reps: int):
    """Whole-loop SPMD BFS + PageRank weak-scaling row (dense
    row-blocks — kept at a smaller per-device scale than the CSR rows
    so the 8-device graph's dense pattern fits host memory)."""
    from graphblas_tpu.parallel.algorithms import dist_bfs, dist_pagerank
    scale = scale0_dense + int(np.log2(d))
    A, n, nnz = rmat_graph(scale)
    mesh = par.make_mesh(d)
    Ad = A.to_matrix()
    DA = par.distribute(Ad, mesh, square=True)
    v = dist_bfs(DA, 0)
    t_bfs = time_it(lambda: dist_bfs(DA, 0), reps)
    bfs_stats = introspect.program_stats("dist_bfs")
    nlevels = int(v.max())
    from graphblas_tpu.models.pagerank import drowscale
    C = drowscale(Ad)
    DC = par.distribute(C, mesh, square=True)
    iters = 10
    dist_pagerank(DC, iters)
    t_pr = time_it(lambda: dist_pagerank(DC, iters), reps)
    pr_stats = introspect.program_stats("dist_pagerank")
    return {
        "metric": "weak_scaling_dense_loops", "devices": d,
        "scale": scale, "n": n, "nnz": nnz,
        "bfs_s": round(t_bfs, 4), "bfs_levels": nlevels,
        "bfs_agg_edgelevels_per_s": round(nnz * nlevels / t_bfs),
        "pagerank_s": round(t_pr, 4), "pagerank_iters": iters,
        "pagerank_agg_nnz_per_s": round(nnz * iters / t_pr),
        "bfs_schedule": bfs_stats,
        "pagerank_schedule": pr_stats,
    }


def run_weak(scale0: int, devices, reps: int, scale0_dense: int = 9,
             emit=print):
    from graphblas_tpu.parallel.dist_csr import (dist_csr_from_matrix,
                                                 dist_csr_mxv)
    from graphblas_tpu.sparse.tri import csr_tril
    rows = []
    for d in devices:
        scale = scale0 + int(np.log2(d))
        A, n, nnz = rmat_graph(scale)
        mesh = par.make_mesh(d)

        # --- distributed SpMV (plus_times f32), honest host sync ---
        D = dist_csr_from_matrix(A, mesh)
        x = np.random.default_rng(0).random(n).astype(np.float32)

        def spmv():
            return float(np.asarray(dist_csr_mxv(D, x)).sum())
        t_mxv = time_it(spmv, reps)
        mxv_stats = introspect.program_stats("dist_csr_mxv")

        # --- distributed masked SpGEMM triangle count (ring) ---
        def tric():
            return par.dist_tricount_csr(A, mesh)
        ntri = tric()
        t_tri = time_it(tric, reps)
        tri_stats = introspect.program_stats("dist_masked_spgemm")

        # exact masked-SpGEMM flop count (GB_AxB_flopcount): tricount
        # work is SUPERLINEAR in graph size on power-law graphs (hub
        # second moment), so weak scaling must be judged on flop RATE
        # flatness, not wall time at fixed nnz/device
        hp = A._options.get("host_pattern")
        I = np.asarray(hp[0][:A.nvals])
        J = np.asarray(hp[1][:A.nvals])
        lo = I > J
        degL = np.bincount(I[lo], minlength=n).astype(np.int64)
        indegL = np.bincount(J[lo], minlength=n).astype(np.int64)
        tri_flops = int((degL * indegL).sum())

        # analytic ring model: each device forwards its B slab d-1
        # times; payload per step = the B slab arrays
        L = csr_tril(A)
        DL = dist_csr_from_matrix(L, mesh)
        ring_payload = slab_bytes(DL)
        row = {
            "metric": "weak_scaling", "devices": d, "scale": scale,
            "n": n, "nnz": nnz, "nnz_per_device": nnz // d,
            "ntri": ntri,
            "mxv_s": round(t_mxv, 4),
            "tricount_csr_s": round(t_tri, 4),
            "tri_flops": tri_flops,
            "mxv_agg_nnz_per_s": round(nnz / t_mxv),
            "tri_agg_flops_per_s": round(tri_flops / t_tri),
            "slab_bytes_per_device": slab_bytes(D),
            "ring_bytes_per_device": ring_payload * max(d - 1, 0),
            "mxv_schedule": mxv_stats,
            "tricount_schedule": tri_stats,
        }
        rows.append(row)
        emit(json.dumps(row))
        drow = _dense_rows(d, scale0_dense, reps)
        rows.append(drow)
        emit(json.dumps(drow))

    csr_rows = [r for r in rows if r["metric"] == "weak_scaling"]
    if len(csr_rows) > 1:
        rows_all, rows = rows, csr_rows
        # On ONE host, d virtual devices share the same silicon, so the
        # best possible aggregate throughput is the 1-device rate —
        # wall-clock "efficiency" is bounded by 1/d by construction.
        # The meaningful committed number is SCHEDULE OVERHEAD: the
        # d-device aggregate rate over the 1-device rate (1.0 = the
        # ring/collective schedule costs nothing on fixed silicon);
        # judged on flops (tricount, superlinear work) / nnz (mxv).
        em = rows[-1]["mxv_agg_nnz_per_s"] / rows[0]["mxv_agg_nnz_per_s"]
        et = (rows[-1]["tri_agg_flops_per_s"]
              / rows[0]["tri_agg_flops_per_s"])
        dense = [r for r in rows_all
                 if r["metric"] == "weak_scaling_dense_loops"]
        eb = (dense[-1]["bfs_agg_edgelevels_per_s"]
              / dense[0]["bfs_agg_edgelevels_per_s"]) if len(dense) > 1 else None
        ep = (dense[-1]["pagerank_agg_nnz_per_s"]
              / dense[0]["pagerank_agg_nnz_per_s"]) if len(dense) > 1 else None
        emit(json.dumps({
            "metric": "weak_scaling_schedule_overhead",
            "devices": rows[-1]["devices"],
            "value": round(min(em, et), 3),
            "unit": ("aggregate rate(d)/rate(1) on shared silicon; "
                     "1.0 = schedule-free (true ICI weak scaling "
                     "needs a pod)"),
            "per_algorithm": {"mxv": round(em, 3),
                              "tricount_csr": round(et, 3),
                              "bfs_dense": (round(eb, 3)
                                            if eb is not None else None),
                              "pagerank_dense": (round(ep, 3)
                                                 if ep is not None else None)},
            "north_star": 0.7,
            "note": ("virtual CPU devices share host cores: wall time "
                     "here bounds schedule overhead only; the "
                     "collective/memory facts above are exact "
                     "compile-time contracts a pod run must confirm"),
        }))
    return rows if len(csr_rows) <= 1 else rows_all


def run_strong(n: int, devices, reps: int):
    """Kept for pod use; on virtual devices this measures contention."""
    A, nn, nnz = rmat_graph(int(np.log2(max(n, 2))))
    results = {}
    for d in devices:
        mesh = par.make_mesh(d)
        t_tric = time_it(lambda: par.dist_tricount_csr(A, mesh), reps)
        results[d] = t_tric
        print(json.dumps({"metric": "strong_scaling", "devices": d,
                          "n": nn, "nnz": nnz,
                          "tricount_csr_s": round(t_tric, 4)}),
              flush=True)
    if len(devices) > 1:
        d0, dN = devices[0], devices[-1]
        eff = results[d0] / (dN * results[dN])
        print(json.dumps({
            "metric": "strong_scaling_efficiency", "value": round(eff, 3),
            "unit": f"t({d0})/({dN}*t({dN}))", "north_star": 0.7,
            "caveat": "contention-bound on virtual devices"}), flush=True)


def summarize(rows):
    """Schedule-overhead summary across collected per-d rows."""
    csr = [r for r in rows if r.get("metric") == "weak_scaling"]
    dense = [r for r in rows
             if r.get("metric") == "weak_scaling_dense_loops"]
    if len(csr) < 2:
        return None
    em = csr[-1]["mxv_agg_nnz_per_s"] / csr[0]["mxv_agg_nnz_per_s"]
    et = (csr[-1]["tri_agg_flops_per_s"]
          / csr[0]["tri_agg_flops_per_s"])
    eb = (dense[-1]["bfs_agg_edgelevels_per_s"]
          / dense[0]["bfs_agg_edgelevels_per_s"]) if len(dense) > 1 else None
    ep = (dense[-1]["pagerank_agg_nnz_per_s"]
          / dense[0]["pagerank_agg_nnz_per_s"]) if len(dense) > 1 else None
    return {
        "metric": "weak_scaling_schedule_overhead",
        "devices": csr[-1]["devices"],
        "value": round(min(em, et), 3),
        "unit": ("aggregate rate(d)/rate(1) on shared silicon; "
                 "1.0 = schedule-free (true ICI weak scaling needs "
                 "a pod)"),
        "per_algorithm": {
            "mxv": round(em, 3), "tricount_csr": round(et, 3),
            "bfs_dense": round(eb, 3) if eb is not None else None,
            "pagerank_dense": round(ep, 3) if ep is not None else None},
        "north_star": 0.7,
        "note": ("each row ran in its OWN process pinned to the same "
                 "host-core set (taskset), nothing else running — the "
                 "1-device baseline and every d-device row see an "
                 "identical core budget, so rate(d)/rate(1) is "
                 "monotone-interpretable; the collective/memory facts "
                 "are exact compile-time contracts a pod run must "
                 "confirm"),
    }


def orchestrate(args, devices):
    """Run each device-count row in a fresh process pinned to a fixed
    core set (the 1-device baseline gets the SAME budget as the
    8-device row — VERDICT r4 next #6), collect the JSON rows, and
    write the summary artifact."""
    import subprocess
    ncores = os.cpu_count() or 4
    coreset = f"0-{ncores - 1}"
    rows = []
    for d in devices:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "").split(
                "--xla_force_host_platform_device_count")[0].strip()
            + f" --xla_force_host_platform_device_count={max(d, 1)}"
        ).strip()
        cmd = ["taskset", "-c", coreset, sys.executable,
               os.path.abspath(__file__), "--row", str(d),
               "--scale0", str(args.scale0), "--reps", str(args.reps)]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             env=env, timeout=3600)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"row d={d} failed")
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                row = json.loads(line)
                rows.append(row)
                print(json.dumps(row), flush=True)
    summ = summarize(rows)
    if summ:
        summ["pinned_cores"] = coreset
        rows.append(summ)
        print(json.dumps(summ), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale0", type=int,
                    default=int(os.environ.get("SCALE0", "13")),
                    help="per-device R-MAT scale (weak mode)")
    ap.add_argument("--strong", action="store_true")
    ap.add_argument("--n", type=int, default=1 << 16,
                    help="graph size for strong mode")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--row", type=int, default=0,
                    help="run ONE device-count row (used by "
                         "--orchestrate subprocesses)")
    ap.add_argument("--orchestrate", action="store_true",
                    help="spawn one core-pinned process per row "
                         "(the committed-artifact mode)")
    ap.add_argument("--out", default="",
                    help="write collected rows to this JSON file "
                         "(--orchestrate)")
    args = ap.parse_args()
    if args.orchestrate:
        devices = [1, 2, 4, 8]
        orchestrate(args, devices)
        return
    ndev = len(jax.devices())
    if args.row:
        run_weak(args.scale0, [args.row], args.reps)
        return
    devices = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    if args.strong:
        run_strong(args.n, devices, args.reps)
    else:
        run_weak(args.scale0, devices, args.reps)


if __name__ == "__main__":
    main()
