"""Discovery / context search (Qdrant Discovery API analog).

Qdrant's discovery search (``client.discover`` /
``query_points(query=DiscoverQuery)``) guides retrieval with *context
pairs*: each pair ``(positive, negative)`` splits the space into a
positive and a negative zone, and

- **discovery** (target + context): points are ranked first by how
  many positive zones they fall in (each pair contributes ``+1`` when
  the point is closer to the pair's positive example than to its
  negative one, else ``-1``), then by similarity to the target within
  the same rank;
- **context search** (context only): points are ranked by the context
  score ``sum(min(0, s(v, pos) - s(v, neg)))`` — ``0`` means the point
  sits inside every positive zone, more-negative values mean deeper
  inside negative zones.

The reference pipeline itself never calls discover (its client stops at
``query_points``; SURVEY.md §2.4), but the API is part of the engine
surface a Qdrant user would expect.

Plan shape: the context pairs and target are *literal* vectors folded
into the projection — no join at all, not even a broadcast. The corpus
scan evaluates ``2 × n_pairs (+1)`` codegen'd dot products per row and
feeds a ``TakeOrderedAndProject``; at 100 TB this is exactly one
scan-local pass, same as ``dense_knn``, with O(k) rows to the driver.

Oracle parity: pair comparisons use scores rounded to ``round_digits``
on both engines (the established round-match invariant), so zone
membership — and therefore ranks and context scores — is bit-stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .knn import _DISTANCE_METRICS, _score
from .topk import global_topk

__all__ = ["discovery_search", "context_search", "recommend_best_score"]


def _pair_scores(vec_col: str, context, prenormalized: bool,
                 dim: int | None, metric: str,
                 round_digits: int) -> list[tuple[Column, Column]]:
    """Rounded (pos_score, neg_score) per context pair."""
    out = []
    for pos, neg in context:
        sp = _score(vec_col, pos, prenormalized, dim, metric)
        sn = _score(vec_col, neg, prenormalized, dim, metric)
        out.append((F.round(sp, round_digits), F.round(sn, round_digits)))
    return out


def discovery_search(
    corpus: DataFrame,
    target: Sequence[float],
    context: Sequence[tuple[Sequence[float], Sequence[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    payload_cols: Sequence[str] = (),
    prefilter: Column | None = None,
    prenormalized: bool = False,
    dim: int | None = None,
    metric: str = "cosine",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k discovery: rank = Σ ±1 over context pairs (``+1`` iff the
    point is closer to the pair's positive than its negative), ties
    broken by target score. Output columns: id, payloads, ``rank``,
    ``score`` (target similarity/distance, rounded)."""
    if not context:
        raise ValueError("discovery_search requires at least one context pair")
    if prefilter is not None:
        corpus = corpus.filter(prefilter)
    asc = metric in _DISTANCE_METRICS
    rank: Column | None = None
    for sp, sn in _pair_scores(vec_col, context, prenormalized, dim, metric,
                               round_digits):
        closer = sp < sn if asc else sp > sn
        term = F.when(closer, F.lit(1)).otherwise(F.lit(-1))
        rank = term if rank is None else rank + term
    tgt = F.round(
        _score(vec_col, target, prenormalized, dim, metric),
        round_digits)
    scored = corpus.select(
        id_col, *payload_cols,
        rank.cast("int").alias("rank"), tgt.alias("score"))
    # best rank first; within a rank, best target score (metric-aware)
    return global_topk(
        scored, [("rank", False), ("score", asc), (id_col, True)], k)


def context_search(
    corpus: DataFrame,
    context: Sequence[tuple[Sequence[float], Sequence[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    payload_cols: Sequence[str] = (),
    prefilter: Column | None = None,
    prenormalized: bool = False,
    dim: int | None = None,
    metric: str = "cosine",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k context-only search: ``score = Σ min(0, s_pos - s_neg)``
    (distance metrics flip the difference so "closer to positive" is
    still the good direction). 0 is best — inside every positive zone;
    ties broken by id (Qdrant leaves intra-score order unspecified)."""
    if not context:
        raise ValueError("context_search requires at least one context pair")
    if prefilter is not None:
        corpus = corpus.filter(prefilter)
    asc = metric in _DISTANCE_METRICS
    score: Column | None = None
    for sp, sn in _pair_scores(vec_col, context, prenormalized, dim, metric,
                               round_digits):
        diff = (sn - sp) if asc else (sp - sn)
        term = F.least(F.lit(0.0).cast("double"), diff)
        score = term if score is None else score + term
    scored = corpus.select(id_col, *payload_cols, score.alias("score"))
    return global_topk(scored, [("score", False), (id_col, True)], k)


def recommend_best_score(
    corpus: DataFrame,
    positive: Sequence[Sequence[float]],
    negative: Sequence[Sequence[float]] = (),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    payload_cols: Sequence[str] = (),
    prefilter: Column | None = None,
    prenormalized: bool = False,
    dim: int | None = None,
    metric: str = "cosine",
    round_digits: int = 6,
) -> DataFrame:
    """Qdrant ``RecommendStrategy.BEST_SCORE``: per candidate,
    ``max_pos`` = best similarity to any positive example and
    ``max_neg`` to any negative; score = ``max_pos`` when it beats
    ``max_neg``, else ``-(max_neg²)`` — so points nearest a negative
    sink to the bottom but stay ordered (the documented Qdrant
    formula). Similarity metrics only (the formula compares
    similarities). Same plan shape as discovery: every example is a
    literal folded into one scan-local projection, no join, O(k) rows
    out."""
    if metric in _DISTANCE_METRICS:
        raise ValueError("best_score strategy needs a similarity metric")
    if not positive:
        raise ValueError("recommend requires at least one positive example")
    if prefilter is not None:
        corpus = corpus.filter(prefilter)

    def best(examples):
        scores = [F.round(_score(vec_col, v, prenormalized, dim, metric),
                          round_digits) for v in examples]
        return scores[0] if len(scores) == 1 else F.greatest(*scores)

    mp = best(positive)
    if negative:
        mn = best(negative)
        score = F.when(mp > mn, mp).otherwise(
            F.round(-(mn * mn), round_digits))
    else:
        score = mp
    scored = corpus.select(id_col, *payload_cols, score.alias("score"))
    return global_topk(scored, [("score", False), (id_col, True)], k)
