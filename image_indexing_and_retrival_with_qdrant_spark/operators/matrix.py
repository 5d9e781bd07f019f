"""Distance matrix (Qdrant ``search_matrix_pairs`` analog).

Qdrant's matrix API scores a small sample of stored points against
each other and returns, per sampled point, its ``k`` nearest *within
the sample* — the raw material for clustering previews and dataset
health checks. The reference pipeline never calls it (SURVEY.md §2.4),
but it completes the engine's client surface.

Sampling discipline: Qdrant samples randomly; here the caller passes
the sample (the collection wrapper uses a deterministic content-hash
sample — reproducible across engines/runs, the same idiom as
``documents_hash_sample``). The sample is bounded (Qdrant default 10,
max ~1000s), so the all-pairs self-join is a broadcast of n rows
against itself — O(n²) pairs where n is the *sample* size, never the
corpus. At 100 TB the corpus-sized analog is ``knnjoin`` (IVF
cell-localized); this operator is deliberately the small-n exact tool.

Plan shape: ``sample ⨯ broadcast(sample)`` → codegen'd score → per-row
window over ≤n rows. No corpus shuffle; the only scan is the (already
tiny) sample itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .knn import _DISTANCE_METRICS, _score
from .topk import grouped_topk

__all__ = ["distance_matrix_pairs"]


def distance_matrix_pairs(
    sample: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter: Column | None = None,
    prenormalized: bool = False,
    dim: int | None = None,
    metric: str = "cosine",
    round_digits: int | None = 6,
) -> DataFrame:
    """Per sampled point, its ``k`` nearest neighbors *within the
    sample* (self excluded). Output: ``id_a, id_b, score, rank`` with
    the usual total order (metric-aware score direction, id_b
    tie-break)."""
    if prefilter is not None:
        sample = sample.filter(prefilter)
    a = sample.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("__va"))
    b = sample.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("__vb"))
    asc = metric in _DISTANCE_METRICS
    score = _score("__va", "__vb", prenormalized, dim, metric)
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = (
        a.join(F.broadcast(b), F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", score.alias("score"))
    )
    return grouped_topk(
        scored, ["id_a"], [("score", asc), ("id_b", True)], k)
