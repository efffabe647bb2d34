"""parallel.introspect: compiled-program schedule facts (the scaling
harness's evidence channel) — recorded programs, HLO collective census,
memory analysis."""

import numpy as np
import pytest

import jax

import graphblas_tpu as gb
from graphblas_tpu import parallel as par
from graphblas_tpu.parallel import introspect

introspect.enable()
from graphblas_tpu.sparse import CsrMatrix


def _graph(n=256, seed=0):
    rng = np.random.default_rng(seed)
    I = np.repeat(np.arange(n), 6)
    J = rng.integers(0, n, len(I))
    keep = I != J
    I, J = I[keep], J[keep]
    lin = np.unique(np.concatenate([I * n + J, J * n + I]))
    I, J = lin // n, lin % n
    return CsrMatrix.from_coo(I, J, np.ones(len(I), bool), n, n,
                              type=gb.BOOL, sum_duplicates=False)


def test_hlo_collectives_parse():
    txt = """
  %ppermute.3 = f32[1,128]{1,0} collective-permute(%p), channel_id=1
  %psum.7 = f32[] all-reduce(%w), channel_id=2
  %ag = s32[4,64]{1,0} all-gather(%q), dimensions={0}
  %ppermute.9 = u8[256]{0} collective-permute(%r), channel_id=3
"""
    out = introspect.hlo_collectives(txt)
    assert out["collective-permute"]["instructions"] == 2
    assert out["collective-permute"]["bytes_per_exec"] == 128 * 4 + 256
    assert out["all-reduce"]["bytes_per_exec"] == 4
    assert out["all-gather"]["bytes_per_exec"] == 4 * 64 * 4


def test_program_stats_after_dist_ops():
    A = _graph()
    mesh = par.make_mesh(min(4, len(jax.devices())))
    d = int(np.prod(mesh.devices.shape))
    ntri = par.dist_tricount_csr(A, mesh)
    st = introspect.program_stats("dist_masked_spgemm")
    assert st is not None
    if d > 1:
        # the ring rotation must be visible in the compiled program
        assert "collective-permute" in st["collectives"]
    assert st["device_memory"]["temp_bytes"] > 0
    # SpMV program records too
    from graphblas_tpu.parallel.dist_csr import (dist_csr_from_matrix,
                                                 dist_csr_mxv)
    D = dist_csr_from_matrix(A, mesh)
    x = np.random.default_rng(1).random(A.nrows).astype(np.float32)
    _ = np.asarray(dist_csr_mxv(D, x))
    st2 = introspect.program_stats("dist_csr_mxv")
    assert st2 is not None and "device_memory" in st2
    # unknown name -> None
    assert introspect.program_stats("no_such_program") is None
