"""Scaling measurement: distributed tricount + PageRank over 1..N
devices (SURVEY §7 step 8 / BASELINE north star: >=70% scaling
efficiency measured against the 1-device run).

Strong scaling at fixed graph size: efficiency(d) = t(1) / (d * t(d)).

On a single-chip machine this runs on virtual CPU devices
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
which validates the SPMD programs and the collective schedule; efficiency
there reflects host-core contention, not ICI.  On a real pod slice the
same script measures true scaling.

Prints one JSON line per (algorithm, n_devices) plus a summary line.
"""

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


def fixed_graph(n: int, seed=0):
    rng = np.random.default_rng(seed)
    deg = 16
    I = np.repeat(np.arange(n), deg)
    J = rng.integers(0, n, n * deg)
    pat = np.zeros((n, n), dtype=bool)
    pat[I, J] = True
    pat |= pat.T
    np.fill_diagonal(pat, False)
    return gb.Matrix.from_dense(pat.astype(np.float32), gb.FP32,
                                pattern=pat)


def time_it(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ndev = len(jax.devices())
    n = int(os.environ.get("SCALE_N", "2048"))
    A = fixed_graph(n)
    results = {}
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    from graphblas_tpu.sparse.container import CsrMatrix
    Ac = CsrMatrix.from_matrix(A)
    for d in sizes:
        mesh = par.make_mesh(d)
        t_tri = time_it(lambda: par.dist_tricount(A, mesh))
        t_pr = time_it(lambda: par.dist_pagerank(A, iters=10, mesh=mesh))
        # O(nnz/d) paths: ring-rotating sharded-CSR masked SpGEMM
        t_tric = time_it(lambda: par.dist_tricount_csr(Ac, mesh))
        results[d] = (t_tri, t_pr, t_tric)
        print(json.dumps({"metric": "strong_scaling", "devices": d,
                          "n": n,
                          "tricount_s": round(t_tri, 4),
                          "pagerank10_s": round(t_pr, 4),
                          "tricount_csr_s": round(t_tric, 4)}))
    if len(sizes) > 1:
        d0, dN = sizes[0], sizes[-1]
        eff_tri = results[d0][0] / (dN * results[dN][0])
        eff_pr = results[d0][1] / (dN * results[dN][1])
        eff_tric = results[d0][2] / (dN * results[dN][2])
        print(json.dumps({
            "metric": "strong_scaling_efficiency",
            "value": round(min(eff_tri, eff_pr, eff_tric), 3),
            "unit": f"t(1)/({dN}*t({dN})), 1.0 = perfect",
            "vs_baseline": round(min(eff_tri, eff_pr, eff_tric) / 0.7, 3),
            "per_algorithm": {"tricount": round(eff_tri, 3),
                              "pagerank": round(eff_pr, 3),
                              "tricount_csr": round(eff_tric, 3)},
            "north_star": 0.7,
        }))


if __name__ == "__main__":
    main()
