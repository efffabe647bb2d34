"""Graph algorithms built on the framework (reference ``Demo/Source`` +
``Extras``): BFS, PageRank x3, MIS, triangle counting, k-truss, Kronecker
generation, and matrix generators."""

from .bfs import (bfs, bfs5m, bfs6, bfs5m_check, bfs6_check, bfs_level,
                  bfs_jit)
from .pagerank import (dpagerank, ipagerank, dpagerank2, drowscale,
                       irowscale, pagerank_jit, PAGERANK_TYPE)
from .mis import mis, mis_check
from .tricount import tricount, tricount_prep, edge_incidence, METHODS
from .ktruss import ktruss, allktruss
from .kron import kron_generate, kron_submatrix, kron_tuples
from .generate import wathen, wathen_coo, wathen_pattern, random_matrix
from .rmat import rmat_edges, rmat_graph

__all__ = [
    "bfs", "bfs5m", "bfs6", "bfs5m_check", "bfs6_check", "bfs_level",
    "bfs_jit", "dpagerank", "ipagerank", "dpagerank2", "drowscale",
    "irowscale", "pagerank_jit", "PAGERANK_TYPE", "mis", "mis_check",
    "tricount", "tricount_prep", "edge_incidence", "METHODS", "ktruss",
    "allktruss", "kron_generate", "kron_submatrix", "kron_tuples",
    "wathen", "wathen_coo", "wathen_pattern", "random_matrix",
    "rmat_edges", "rmat_graph",
]
