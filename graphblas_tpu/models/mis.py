"""Luby's maximal independent set (reference ``Demo/Source/mis.c``,
``mis_check.c``, ``mis_score.c``).

Iteration: score candidates with a degree-weighted random probability,
select nodes whose score beats every neighbor's (max-select1st semiring),
add them to the set, then drop them and their neighbors from the
candidate pool.  Singletons join the set up front.

The random scores use the reference's portable simple_rand stream
(``mis_score.c``: 0.0001 + x/(1+2*degree)), so set sizes reproduce the
demo outputs when the stream is seeded identically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.descriptor import Descriptor
from ..core.matrix import Matrix, Vector
from ..core.monoids import monoid, monoid_new
from ..core.ops import UnaryOp, binary
from ..core.semirings import semiring, semiring_new
from ..core.types import BOOL, FP64
from ..ops.assign import assign_vector
from ..ops.ewise import apply as gb_apply, eWiseAdd
from ..ops.mxm import vxm
from ..ops.reduce import reduce_to_scalar, reduce_to_vector
from ..utils.simple_rand import SimpleRand

__all__ = ["mis", "mis_check"]

_R_DESC = Descriptor(replace=True)
_SR_DESC = Descriptor(replace=True, mask_scmp=True)


def mis(A: Matrix, seed: int = 1, rng: Optional[SimpleRand] = None) -> Vector:
    """iset[i] = True if node i is in the maximal independent set.

    A must be symmetric boolean-structural; scores follow mis_score.c.
    """
    A = A.wait()
    n = A.nrows
    rng = rng or SimpleRand(seed)

    max_select1st = semiring_new(
        monoid_new(binary.max[FP64], 0.0), binary.first[FP64])
    boolean = semiring.lor_land[BOOL]

    # degrees = reduce rows of A (as fp64)
    degrees = reduce_to_vector(Vector.new(FP64, n), None, None,
                               monoid.plus[FP64], A)
    # candidates<degrees> = true ; singletons (degree 0 / absent) -> iset
    candidates = assign_vector(Vector.new(BOOL, n), degrees, None, True,
                               None, None, scalar=True)
    iset = assign_vector(Vector.new(BOOL, n), degrees, None, True,
                         None, _SR_DESC, scalar=True)

    nvals = candidates.nvals()
    last_nvals = nvals
    while nvals > 0:
        # prob<candidates> = mis_score(degrees): host-side draw of the
        # reference's exact stream.  GrB_apply computes op(degrees) for
        # EVERY entry of degrees first and masks afterwards, so a draw
        # is consumed for non-candidates too (mis.c:109-110) — the
        # stream position only matches if we do the same.
        cand_np = candidates.pattern_np() & (candidates.to_dense() != 0)
        deg_np = np.asarray(degrees.values)
        deg_pat = degrees.pattern_np()
        scores = np.zeros(n, np.float64)
        idx = np.nonzero(deg_pat)[0]
        draws = rng.rand_x_batch(len(idx))
        scores[idx] = 0.0001 + draws / (1.0 + 2.0 * deg_np[idx])
        prob = Vector.from_dense(np.where(cand_np, scores, 0.0), FP64,
                                 pattern=jnp.asarray(cand_np))

        # neighbor_max<candidates> = prob max.select1st A
        neighbor_max = vxm(Vector.new(FP64, n), candidates, None,
                           max_select1st, prob, A, _R_DESC)
        # new_members = prob > neighbor_max  (eWiseAdd GT)
        new_members = eWiseAdd(Vector.new(BOOL, n), None, None,
                               binary.gt[FP64], prob, neighbor_max)
        # iset |= new_members
        iset = eWiseAdd(iset, None, None, binary.lor[BOOL], iset,
                        new_members)
        # candidates<!new_members> = candidates (REPLACE): drop new members
        candidates = gb_apply(candidates, new_members, None,
                              UnaryOp("ID", lambda x: x, BOOL, BOOL),
                              candidates, _SR_DESC)
        nvals = candidates.nvals()
        if nvals == 0:
            break
        # new_neighbors<candidates> = new_members lor.land A
        new_neighbors = vxm(Vector.new(BOOL, n), candidates, None,
                            boolean, new_members, A)
        candidates = gb_apply(candidates, new_neighbors, None,
                              UnaryOp("ID", lambda x: x, BOOL, BOOL),
                              candidates, _SR_DESC)
        nvals = candidates.nvals()
        if nvals == last_nvals:
            raise RuntimeError("mis stalled (corrupted input?)")
        last_nvals = nvals

    # drop explicit false values: iset<iset> = iset (REPLACE)
    iset = gb_apply(iset, iset, None, UnaryOp("ID", lambda x: x, BOOL, BOOL),
                    iset, _R_DESC)
    return iset


def mis_check(A: Matrix, iset: Vector) -> bool:
    """Verify independence + maximality (the demo's verification pass).

    Adjacency is VALUED, matching the algorithm's LAND semiring:
    explicit false entries (files with 0-valued triplets, e.g.
    fs_183_1) are not edges."""
    A = A.wait()
    Ap = A.pattern_np()
    vals = A.to_dense()
    if not isinstance(vals, dict):
        Ap = Ap & (np.asarray(vals) != 0)
    s = np.zeros(A.nrows, bool)
    I, X = iset.extractTuples()
    s[I[np.asarray(X, bool)]] = True
    # independent: no edge inside the set
    if np.any(Ap[np.ix_(s, s)]):
        return False
    # maximal: every non-member has a neighbor in the set (or no edge at all)
    nonmembers = ~s
    deg = Ap.sum(axis=1)
    covered = (Ap[:, s].sum(axis=1) > 0) | (deg == 0)
    return bool(np.all(covered[nonmembers]))
