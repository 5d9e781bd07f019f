"""Dense cosine KNN (the reference's core retrieval operator).

Semantics pinned by the reference:
- distance = COSINE, declared at collection creation
  (``with_vdr-2b-multi-v1/incremental_indexing_vdr_2b_multi_v1.py:80-83``,
  ``with_jina_text_v4/jina_v4_text_indexer.py:67-71``);
- top-k with default k=5, descending score
  (``with_vdr-2b-multi-v1/query_vdr_2b_multi_v1.py:48,78-83``);
- optional payload filter (declared but unused by the reference —
  ``query_points(query_filter=...)``, SURVEY.md §2.3 F4) — here a plain
  ``WHERE`` that Catalyst pushes into the parquet scan *before* scoring;
- result projection id/score/payload with defaults
  (``format_results``, ``query_vdr_2b_multi_v1.py:91-127``).

Plan shape: ``corpus → [pushed filter] → crossJoin(broadcast(queries))
→ score (JVM zip_with/aggregate, codegen) → top-k``. The query side is
always tiny (one or a few rows), so the join is a
BroadcastNestedLoopJoin: the corpus is never shuffled; the single-query
top-k is TakeOrderedAndProject (per-partition heaps). That plan is the
one you want at 100 TB: scan-local scoring, O(k) rows to the driver.

Scores are rounded (default 6 dp) for oracle stability; ordering is
made total with the id tie-break.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import (
    cosine,
    cosine_unrolled,
    dot,
    dot_unrolled,
    euclid,
    euclid_unrolled,
    manhattan,
    manhattan_unrolled,
    operand_col,
)
from .topk import global_topk, grouped_topk

__all__ = ["dense_knn", "dense_knn_batch"]

# Distance metrics rank ascending (closer = better) and score_threshold
# is a MAX bound — Qdrant's documented semantics for Euclid/Manhattan.
_DISTANCE_METRICS = {"euclid", "manhattan"}


def _score(vec_col: Column | str | Sequence[float],
           query_col: Column | str | Sequence[float], prenormalized: bool,
           dim: int | None, metric: str = "cosine",
           duplicated: bool = False) -> Column:
    """Score by the collection's declared metric (Qdrant
    ``Distance.{COSINE,DOT,EUCLID,MANHATTAN}``). ``prenormalized``
    turns cosine into a plain dot (normalize-at-write collections).
    With ``dim`` known — collections always declare it (SURVEY.md
    §1.1) — uses the statically-unrolled form: bit-identical, ~2.6×
    faster per scan.

    ``duplicated=True`` says the caller will FILTER on this score
    (score_threshold): Catalyst pushes that filter through the
    projection, inlining the whole expression a second time into one
    whole-stage method, which overflows janino's 64 KB limit at half
    the usual width (measured: the 64-d cosine threshold scan fails
    codegen and runs interpreted after a ~300 KB failed compile).
    Past 32 dims the loop-shaped HOF forms are used instead — the
    identical left-to-right fold (each builder's documented parity),
    O(1) generated code however many times the optimizer copies it."""
    if dim is not None and duplicated and dim > 32:
        dim = None  # same bits via the loop forms below
    if dim is not None:
        # unrolled builders take names/literals directly (single-expr
        # SQL fast path) and fall back to Columns transparently
        if metric == "euclid":
            return euclid_unrolled(vec_col, query_col, dim)
        if metric == "manhattan":
            return manhattan_unrolled(vec_col, query_col, dim)
        if metric == "dot":
            prenormalized = True
        elif metric != "cosine":
            raise ValueError(f"unknown metric: {metric}")
        return (dot_unrolled(vec_col, query_col, dim) if prenormalized
                else cosine_unrolled(vec_col, query_col, dim))
    a, b = operand_col(vec_col), operand_col(query_col)
    if metric == "euclid":
        return euclid(a, b)
    if metric == "manhattan":
        return manhattan(a, b)
    if metric == "dot":
        prenormalized = True
    elif metric != "cosine":
        raise ValueError(f"unknown metric: {metric}")
    return dot(a, b) if prenormalized else cosine(a, b)


def dense_knn(
    corpus: DataFrame,
    query: DataFrame,
    k: int | None = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "query_vec",
    payload_cols: Sequence[str] = (),
    prefilter: Column | None = None,
    score_threshold: float | None = None,
    prenormalized: bool = False,
    round_digits: int | None = 6,
    dim: int | None = None,
    metric: str = "cosine",
) -> DataFrame:
    """Single-query top-k by ``metric``. ``query`` must have exactly
    one row with column ``query_vec_col``. ``k=None`` disables the
    limit (threshold-only search). Pass ``dim`` for the unrolled fast
    path. Distance metrics (euclid/manhattan) rank ascending and treat
    ``score_threshold`` as a max bound.
    """
    if prefilter is not None:
        corpus = corpus.filter(prefilter)
    asc = metric in _DISTANCE_METRICS
    score = _score(vec_col, query_vec_col, prenormalized, dim,
                   metric, duplicated=score_threshold is not None)
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = (
        corpus.join(F.broadcast(query.select(query_vec_col)))
        .withColumn("score", score)
        .select(id_col, *payload_cols, "score")
    )
    if score_threshold is not None:
        scored = scored.filter(
            F.col("score") <= score_threshold if asc
            else F.col("score") >= score_threshold
        )
    if k is None:
        return scored
    return global_topk(scored, [("score", asc), (id_col, True)], k)


def dense_knn_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    payload_cols: Sequence[str] = (),
    prefilter: Column | None = None,
    prenormalized: bool = False,
    round_digits: int | None = 6,
    local_prune: bool = False,
    dim: int | None = None,
    score_threshold: float | None = None,
    metric: str = "cosine",
    exclude_pairs: DataFrame | None = None,
    include_pairs: DataFrame | None = None,
    per_query_filter: Column | None = None,
) -> DataFrame:
    """Multi-query top-k by ``metric``: broadcast the query set, score
    each (corpus row × query), rank per query with a window (optionally
    pre-pruned map-side — see ``topk.grouped_topk``).
    ``score_threshold`` filters candidates *before* ranking (Qdrant's
    semantics: the threshold bounds the candidate set, then top-k).
    ``exclude_pairs`` (query_id, id) drops per-query exclusions before
    ranking — a tiny broadcast anti-join (recommend_batch's example
    exclusion). ``include_pairs`` (query_id, id) RESTRICTS each query
    to its own candidate set before ranking — a broadcast semi-join
    (the batched quantized-prefetch rescore: each query rescores only
    ITS shortlist, matching single-query semantics).
    ``per_query_filter`` is a predicate that may reference
    ``query_id_col`` (e.g. a CASE over per-request filters — Qdrant's
    query_batch_points per-request filter); it applies to the scored
    rows before ranking, which equals filtering each query's
    candidates first because scoring is row-local."""
    if prefilter is not None:
        corpus = corpus.filter(prefilter)
    asc = metric in _DISTANCE_METRICS
    score = _score(vec_col, query_vec_col, prenormalized, dim,
                   metric, duplicated=score_threshold is not None)
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = (
        corpus.join(F.broadcast(queries.select(query_id_col, query_vec_col)))
        .withColumn("score", score)
        .select(query_id_col, id_col, *payload_cols, "score")
    )
    if per_query_filter is not None:
        scored = scored.filter(per_query_filter)
    if exclude_pairs is not None:
        scored = scored.join(F.broadcast(exclude_pairs),
                             on=[query_id_col, id_col], how="left_anti")
    if include_pairs is not None:
        scored = scored.join(F.broadcast(include_pairs),
                             on=[query_id_col, id_col], how="left_semi")
    if score_threshold is not None:
        scored = scored.filter(
            F.col("score") <= score_threshold if asc
            else F.col("score") >= score_threshold
        )
    return grouped_topk(
        scored,
        [query_id_col],
        [("score", asc), (id_col, True)],
        k,
        local_prune=local_prune,
    )
