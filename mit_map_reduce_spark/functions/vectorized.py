"""Arrow-vectorized (NumPy) embedding math — the fast path beside the
Catalyst higher-order-function forms in ``functions.columns``.

The HOF fold (``F.aggregate`` / ``F.zip_with``) is JVM-side but
INTERPRETED per element (~100 ns/element measured locally), so dot
products over millions of (corpus x query) pairs dominate the
embedding operators' runtime. Two design lessons are baked in here:

1. A per-pair pandas UDF (score one (a, b) row at a time) does NOT
   win: the broadcast join materializes every corpus vector once per
   query, so Arrow ships |corpus| * |queries| arrays to Python and
   transfer dominates (measured ~even with the HOF fold). The winning
   shape is ``mapInPandas`` over the CORPUS ONCE with the (tiny) query
   matrix captured in the closure — each Arrow batch scores against
   all queries in a handful of NumPy ops.
2. Bit-parity with the HOF fold / the DuckDB oracle requires
   SEQUENTIAL float64 accumulation (((0+p0)+p1)+...). NumPy's
   ``dot``/``sum`` use pairwise/SIMD accumulation, which can differ in
   the last ulp and flip a rounded 4-dp value across engines — so the
   scorer accumulates dimension-by-dimension in index order
   (vectorized across the batch's rows), bit-identical to the fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

#: output schema of batch_query_scorer emissions
SCORED_SCHEMA = "query_id bigint, neighbor_id bigint, c double"


def batch_query_scorer(q_ids, q_mat, q_nrm, topk=None):
    """Build a ``mapInPandas`` function scoring every corpus row
    against every query vector.

    ``q_mat`` is the (Q, D) float64 query matrix, captured in the task
    closure (~Q*D*8 bytes — the same "small side" the HOF path
    broadcast-joins; at 100 TB a fixed query set rides every executor
    identically). Self-pairs (corpus id == query id) are masked out.

    With ``topk``, each batch pre-selects per query: only candidates
    whose cosine >= the batch's k-th largest survive to the exchange.
    That is lossless for a global (c DESC, neighbor_id) top-k — a
    global winner must beat its own batch's k-th best, and boundary
    ties are kept, not cut — and it shrinks the shuffled stream from
    |corpus| * |queries| rows to ~batches * |queries| * k, which is
    what makes the vectorized path actually faster end-to-end (the
    first version emitted the full score grid and the exchange ate the
    NumPy win).
    """
    q_ids = np.asarray(q_ids, dtype=np.int64)
    q_mat = np.asarray(q_mat, dtype=np.float64)
    q_nrm = np.asarray(q_nrm, dtype=np.float64)

    #: Selection margin vs the BLAS score. The IEEE error bound for a
    #: 64-term float64 dot product is ~dim * eps ~ 7e-15 on a cosine in
    #: [-1, 1]; 1e-6 is 8 orders of magnitude above it, so a candidate
    #: below (batch kth best - margin) under BLAS is certainly below
    #: the kth best exactly.
    MARGIN = 1e-6

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            corpus = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
            ids = pdf["vec_id"].to_numpy()
            nrm = pdf["nrm"].to_numpy()
            # Phase 1 — SELECT with BLAS (pairwise/SIMD accumulation:
            # fast, ulp-level nondeterministic vs the fold, fine for
            # candidate selection under MARGIN).
            blas_cos = (corpus @ q_mat.T) / np.outer(nrm, q_nrm)
            blas_cos[ids[:, None] == q_ids[None, :]] = -np.inf  # self-pairs
            if topk is not None and n > topk:
                kth = np.partition(blas_cos, -topk, axis=0)[-topk]
                rows, cols = np.nonzero(
                    (blas_cos >= kth - MARGIN) & np.isfinite(blas_cos)
                )
            else:
                rows, cols = np.nonzero(np.isfinite(blas_cos))
            # Phase 2 — RESCORE the ~|queries| * k survivors with the
            # sequential left-to-right accumulation (cumsum): the
            # emitted values are bit-identical to the Catalyst fold /
            # the DuckDB oracle, at negligible cost on the tiny subset.
            prod = corpus[rows] * q_mat[cols]
            exact = prod.cumsum(axis=1)[:, -1] / (nrm[rows] * q_nrm[cols])
            yield pd.DataFrame(
                {"query_id": q_ids[cols], "neighbor_id": ids[rows], "c": exact}
            )

    return score


#: output schema of all_pairs_scorer emissions (raw cosine; the caller
#: applies the engine's round_half_up + threshold filter in Catalyst)
PAIR_SCHEMA = "vec_a bigint, vec_b bigint, c double"


def all_pairs_scorer(get_corpus, select_floor):
    """Build a ``mapInPandas`` function emitting candidate near-dup
    pairs (a < b) from an all-pairs cosine comparison.

    ``get_corpus`` is a zero-arg callable returning ``(ids, mat, nrm)``
    — typically ``lambda: bc.value`` over a ``sc.broadcast`` handle, so
    the corpus matrix ships to each executor ONCE via the torrent
    protocol instead of riding every task's pickled closure. This is
    the same data movement as the HOF path's ``F.broadcast(emb)``
    nested-loop join (which also materializes the build side on the
    driver first); the op stays audit-scale by design — the quadratic
    scale path is the banded LSH in ``operators/dedup.py``.

    Each Arrow batch plays the "a" side against the full corpus matrix
    "b": one BLAS matmul selects candidates with BLAS cosine >=
    ``select_floor``; the survivors are rescored with the sequential
    cumsum accumulation, so every emitted value is bit-identical to the
    Catalyst fold / DuckDB oracle. ``select_floor`` must sit below the
    caller's post-rounding threshold by at least the rounding half-step
    plus the BLAS-vs-sequential error (~1e-12): with a 4-dp
    ``round_half_up(c) >= T`` filter downstream, ``T - 1e-4`` is safe —
    a pair passing the rounded filter has exact c >= T - 0.5e-4, hence
    BLAS c >= T - 0.5e-4 - 1e-12 > select_floor.
    """

    def score(batches):
        ids, mat, nrm = get_corpus()
        ids = np.asarray(ids, dtype=np.int64)
        mat = np.asarray(mat, dtype=np.float64)
        nrm = np.asarray(nrm, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            a_mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
            a_ids = pdf["vec_id"].to_numpy()
            a_nrm = pdf["nrm"].to_numpy()
            blas_cos = (a_mat @ mat.T) / np.outer(a_nrm, nrm)
            rows, cols = np.nonzero(
                (blas_cos >= select_floor) & (a_ids[:, None] < ids[None, :])
            )
            prod = a_mat[rows] * mat[cols]
            exact = prod.cumsum(axis=1)[:, -1] / (a_nrm[rows] * nrm[cols])
            yield pd.DataFrame(
                {"vec_a": a_ids[rows], "vec_b": ids[cols], "c": exact}
            )

    return score


#: output schema of cell_assign_scorer emissions
ASSIGN_SCHEMA = "vec_id bigint, cell int"


def cell_assign_scorer(c_ids, c_mat, c_nrm, n_best=1):
    """Build a ``mapInPandas`` function assigning every vector to its
    ``n_best`` nearest centroids by cosine — the IVF coarse-quantizer
    assignment, vectorized.

    With k <= a few dozen centroids there is no select/rescore split:
    ALL k dots are computed with the exact sequential accumulation
    directly (one cumsum over a (batch, k, dim) product tensor), so
    every cosine — and therefore every assignment and tie-break — is
    bit-identical to the Catalyst fold the HOF path evaluates, at
    NumPy speed. ``c_ids`` must be ascending: ties then resolve to the
    lower centroid id via the stable argsort, the same rule as the HOF
    path's ``max_by(cent_id, struct(c, -cent_id))`` / its rank window.
    """
    c_ids = np.asarray(c_ids, dtype=np.int64)
    assert (np.diff(c_ids) > 0).all(), "centroid ids must be ascending"
    c_mat = np.asarray(c_mat, dtype=np.float64)
    c_nrm = np.asarray(c_nrm, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64, copy=False)
            ids = pdf["vec_id"].to_numpy()
            nrm = pdf["nrm"].to_numpy()
            prod = a[:, None, :] * c_mat[None, :, :]
            cos = prod.cumsum(axis=2)[:, :, -1] / (nrm[:, None] * c_nrm[None, :])
            order = np.argsort(-cos, axis=1, kind="stable")[:, :n_best]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, order.shape[1]),
                    "cell": c_ids[order].ravel().astype(np.int32),
                }
            )

    return assign


@pandas_udf("double")
def dot_product_np(a: pd.Series, b: pd.Series) -> pd.Series:
    """Pairwise vectorized dot product (two array columns -> double).

    Kept for operators whose pair set is ALREADY materialized (no
    broadcast blow-up to avoid); for query-vs-corpus scans prefer
    :func:`batch_query_scorer`. Same sequential-accumulation contract:
    ``cumsum`` along the dimension axis is left-to-right by definition.
    """
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    av = np.vstack(a.to_numpy()).astype(np.float64, copy=False)
    bv = np.vstack(b.to_numpy()).astype(np.float64, copy=False)
    prod = av * bv
    return pd.Series(prod.cumsum(axis=1)[:, -1])


def cosine_np(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from the pairwise vectorized dot and precomputed norms."""
    return dot_product_np(a, b) / (norm_a * norm_b)
