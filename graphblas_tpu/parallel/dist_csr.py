"""Distributed padded-CSR: memory-scalable sharding for large graphs.

The dense-block DistMatrix costs O(n²/d) HBM per device; real large
graphs need O(nnz/d).  Here each device holds a *CSR slab* of rows
(indices/values padded to the max slab nnz so shards are uniform), and
SpMV is the edge-parallel gather + segment-sum kernel run inside
``shard_map``:

* ``dist_csr_mxv``: y = A·x with A row-slabbed and x replicated — the
  output lands row-sharded with ZERO collectives (each device owns its
  rows); one ``all_gather`` republishes y when the next iteration needs
  it, which is the frontier exchange of BFS/PageRank at scale.

This is the direct realization of SURVEY §5's "row/block partitioning of
CSR across the mesh with halo exchange of frontier vectors".
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.matrix import Matrix, np_bool
from .mesh import make_mesh, pad_to_multiple

__all__ = ["DistCsr", "dist_csr_from_matrix", "dist_csr_mxv",
           "dist_csr_pagerank", "dist_csr_bfs"]


class DistCsr:
    """Row-slab CSR over a 1-D mesh: arrays lead with a device axis.

    rowptr:  [d, blk+1] int32 (per-slab indptr)
    indices: [d, nzpad] int32 (column ids; ncols = identity sentinel)
    locrow:  [d, nzpad] int32 (row id *within the slab*; blk = sentinel)
    values:  [d, nzpad] float32
    """

    def __init__(self, rowptr, indices, locrow, values, mesh: Mesh,
                 nrows: int, ncols: int, blk: int):
        self.rowptr = rowptr
        self.indices = indices
        self.locrow = locrow
        self.values = values
        self.mesh = mesh
        self.nrows = nrows
        self.ncols = ncols
        self.blk = blk

    @property
    def ndev(self) -> int:
        return int(self.rowptr.shape[0])


def dist_csr_from_matrix(A, mesh: Optional[Mesh] = None,
                         transpose: bool = False) -> DistCsr:
    """Split A's rows (or A''s, for vxm use) into per-device CSR slabs.
    Accepts a bitmap Matrix or a CsrMatrix (no densify)."""
    mesh = mesh or make_mesh()
    d = int(np.prod(mesh.devices.shape))
    if isinstance(A, Matrix):
        A = A.wait()
        I, J, X = A.extractTuples()
        nr, nc = A.nrows, A.ncols
    else:  # CsrMatrix / anything with extractTuples + shape
        I, J, X = A.extractTuples()
        nr, nc = A.shape
    nrows, ncols = (nc, nr) if transpose else (nr, nc)
    if transpose:
        I, J = J, I
        order = np.lexsort((J, I))
        I, J, X = I[order], J[order], X[order]
    m_pad = pad_to_multiple(max(nrows, 1), d)
    blk = m_pad // d
    dev = (I // blk).astype(np.int64)
    loc = (I % blk).astype(np.int32)
    nz_per_dev = np.bincount(dev, minlength=d)
    nzpad = pad_to_multiple(max(int(nz_per_dev.max()), 8), 128)

    rowptr = np.zeros((d, blk + 1), np.int32)
    indices = np.full((d, nzpad), ncols, np.int32)
    locrow = np.full((d, nzpad), blk, np.int32)
    values = np.zeros((d, nzpad), np.float32)
    for p in range(d):
        sel = dev == p
        Jp, Lp, Xp = J[sel], loc[sel], X[sel]
        k = len(Jp)
        indices[p, :k] = Jp
        locrow[p, :k] = Lp
        values[p, :k] = np.asarray(Xp, np.float32) if Xp.dtype != bool \
            else Xp.astype(np.float32)
        cnt = np.bincount(Lp, minlength=blk)
        rowptr[p, 1:] = np.cumsum(cnt)

    sh = NamedSharding(mesh, P("i", None))
    return DistCsr(jax.device_put(jnp.asarray(rowptr), sh),
                   jax.device_put(jnp.asarray(indices), sh),
                   jax.device_put(jnp.asarray(locrow), sh),
                   jax.device_put(jnp.asarray(values), sh),
                   mesh, nrows, ncols, blk)


def _local_spmv(indices, locrow, values, x_ext, blk):
    """One slab's y = A_slab @ x (plus_times): gather + segment-sum."""
    xg = jnp.take(x_ext, indices[0], axis=0)
    contrib = values[0] * xg
    y = jax.ops.segment_sum(contrib, locrow[0],
                            num_segments=blk + 1)[:blk]
    return y[None]


_PROG_CACHE = {}


def _mxv_prog(mesh: Mesh, blk: int):
    key = (id(mesh), blk)
    f = _PROG_CACHE.get(key)
    if f is not None:
        return f

    def local(rowptr, indices, locrow, values, x_ext):
        y = _local_spmv(indices, locrow, values, x_ext, blk)
        return y
    f = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("i", None),) * 4 + (P(),),
        out_specs=P("i", None)))
    _PROG_CACHE[key] = f
    return f


def dist_csr_mxv(D: DistCsr, x) -> jnp.ndarray:
    """y = A·x (plus_times); y comes back row-sharded (concatenated
    slabs, padded length), zero collectives."""
    x = jnp.asarray(x, jnp.float32)
    x_ext = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
    prog = _mxv_prog(D.mesh, D.blk)
    y = prog(D.rowptr, D.indices, D.locrow, D.values, x_ext)
    return y.reshape(-1)[:D.nrows]


def dist_csr_pagerank(A: Matrix, iters: int = 20,
                      mesh: Optional[Mesh] = None) -> np.ndarray:
    """PageRank over the sharded-CSR SpMV (one all_gather per iteration,
    implicit in the replicated x of the next step)."""
    mesh = mesh or make_mesh()
    from ..models.pagerank import drowscale
    C = drowscale(A)
    # r' = r @ C = C' r  -> shard C' (CSC of C) row-slabs
    D = dist_csr_from_matrix(C, mesh, transpose=True)
    n = A.nrows
    r = np.full(n, 1.0 / n, np.float32)
    a = (1 - 0.85) / n
    for _ in range(iters):
        s = a * float(r.sum())
        r = np.asarray(dist_csr_mxv(D, jnp.asarray(0.85 * r))) + s
    return r / r.sum()


def dist_csr_bfs(A, src: int,
                 mesh: Optional[Mesh] = None) -> np.ndarray:
    """BFS levels over the sharded-CSR frontier SpMV.  Accepts Matrix
    or CsrMatrix."""
    mesh = mesh or make_mesh()
    D = dist_csr_from_matrix(A, mesh, transpose=True)
    n = A.nrows
    lev = np.zeros(n, np.int64)
    q = np.zeros(n, np.float32)
    q[src] = 1.0
    level = 1
    while q.any() and level <= n:
        lev[q != 0] = level
        nxt = np.asarray(dist_csr_mxv(D, jnp.asarray(q)))
        q = ((nxt != 0) & (lev == 0)).astype(np.float32)
        level += 1
    return lev
