"""Rank/score fusion (Qdrant Query-API ``FusionQuery``: RRF and DBSF).

Both operators take *ranked branch results* — small frames of
``(id, score)``, each already truncated to its prefetch depth — so
every window here acts on ≤depth rows (the unpartitioned windows are
safe at any corpus scale; the expensive part was the per-branch
retrieval, which used the scan-local KNN plans).

- **RRF** (reciprocal rank fusion): ``Σ_b 1/(K + rank_b)`` over the
  branches where the id appears; rank-only, so score scales never
  need reconciling. K = 60 (the literature default Qdrant uses).
- **DBSF** (distribution-based score fusion): per branch, scores
  normalize to ``(s − (μ−3σ)) / 6σ`` (population σ — Qdrant's
  normalization window), then sum; absent ids contribute 0.

Ascending branches (distance metrics) are handled by negating their
scores first, which flips both the rank order and the normalized
direction without touching the math.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .topk import global_topk

__all__ = ["rrf_fuse", "dbsf_fuse"]

RRF_K = 60


def _prep(branches, id_col: str) -> list[DataFrame]:
    out = []
    for b in branches:
        df, asc = b if isinstance(b, tuple) else (b, False)
        df = df.select(id_col, "score")
        if asc:
            df = df.withColumn("score", -F.col("score"))
        out.append(df)
    return out


def rrf_fuse(branches, k: int = 10, id_col: str = "doc_id",
             rrf_k: int = RRF_K, round_digits: int | None = 6) -> DataFrame:
    """Fuse ranked branches by reciprocal rank. ``branches`` is a list
    of DataFrames with (id_col, score), or (DataFrame, ascending)
    tuples for distance-metric branches."""
    prepped = _prep(branches, id_col)
    ranked = []
    for i, df in enumerate(prepped):
        w = Window.orderBy(F.col("score").desc(), F.col(id_col))
        ranked.append(df.select(
            id_col, F.row_number().over(w).cast("long").alias(f"__r{i}")))
    joined = reduce(
        lambda a, b: a.join(b, on=id_col, how="full_outer"), ranked)
    score = None
    for i in range(len(ranked)):
        term = F.coalesce(1.0 / (rrf_k + F.col(f"__r{i}")), F.lit(0.0))
        score = term if score is None else score + term
    if round_digits is not None:
        score = F.round(score, round_digits)
    fused = joined.select(id_col, score.alias("rrf"))
    return global_topk(fused, [("rrf", False), (id_col, True)], k)


def dbsf_fuse(branches, k: int = 10, id_col: str = "doc_id",
              round_digits: int | None = 6) -> DataFrame:
    """Fuse by distribution-normalized score sum. Each branch's stats
    are a broadcast one-row frame; a zero-σ branch (all scores equal)
    contributes 0.5 per present id."""
    prepped = _prep(branches, id_col)
    normed = []
    for i, df in enumerate(prepped):
        stats = df.agg(F.avg("score").alias("__mu"),
                       F.stddev_pop("score").alias("__sigma"))
        n = df.join(F.broadcast(stats)).select(
            id_col,
            F.when(F.col("__sigma") > 0.0,
                   (F.col("score") - (F.col("__mu") - 3 * F.col("__sigma")))
                   / (6 * F.col("__sigma")))
            .otherwise(F.lit(0.5)).alias(f"__n{i}"),
        )
        normed.append(n)
    joined = reduce(
        lambda a, b: a.join(b, on=id_col, how="full_outer"), normed)
    score = None
    for i in range(len(normed)):
        term = F.coalesce(F.col(f"__n{i}"), F.lit(0.0))
        score = term if score is None else score + term
    if round_digits is not None:
        score = F.round(score, round_digits)
    fused = joined.select(id_col, score.alias("dbsf"))
    return global_topk(fused, [("dbsf", False), (id_col, True)], k)
