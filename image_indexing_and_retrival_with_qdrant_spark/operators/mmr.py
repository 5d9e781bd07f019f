"""Maximal Marginal Relevance re-ranking (diversified top-k).

MMR (Carbonell & Goldstein, SIGIR'98; Qdrant ships it as the ``mmr``
option of the universal query API) picks results greedily:

    pick_1 = argmax rel(d)
    pick_i = argmax  λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)

The relevance shortlist (``fetch_k`` candidates) is the ordinary
distributed dense top-k — one scan-local corpus pass. The greedy
selection is *inherently sequential* (every pick conditions on the
previous ones), so it runs driver-side over the O(fetch_k) collected
shortlist — the same O(k)-rows-to-driver envelope as Qdrant's own
rescoring, and the right trade at 100 TB: the corpus pass is the
distributed part; the re-rank touches ≤ fetch_k ≪ N rows.

Numeric discipline for the oracle: pairwise sims use pure-Python
left-to-right double sums (bit-identical to DuckDB's
``list_dot_product``) and half-away-from-zero rounding (Spark/DuckDB
``ROUND``, NOT Python's banker's ``round``) before any comparison.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..functions.localframe import local_literal_df
from .knn import dense_knn

__all__ = ["mmr_rerank"]


def _round_half_away(x: float, digits: int = 6) -> float:
    p = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)


def _cos(a: list[float], b: list[float]) -> float:
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def mmr_rerank(
    spark: SparkSession,
    corpus: DataFrame,
    query: DataFrame,
    k: int = 5,
    lambda_: float = 0.5,
    fetch_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    prenormalized: bool = False,
) -> DataFrame:
    """Diversified top-k: dense cosine shortlist of ``fetch_k``, then
    greedy MMR selection. Returns ``(pick, id, relevance, mmr_score)``
    where ``mmr_score`` of the first pick is its relevance (no
    diversity term yet) and ties break on lowest id."""
    short = dense_knn(
        corpus, query, k=fetch_k, id_col=id_col, vec_col=vec_col,
        payload_cols=[vec_col], dim=dim, prenormalized=prenormalized,
    ).collect()
    cands = [(r[id_col], [float(x) for x in r[vec_col]], float(r["score"]))
             for r in short]

    selected: list[tuple] = []
    chosen: set = set()
    for _ in range(min(k, len(cands))):
        best = None
        for cid, vec, rel in cands:
            if cid in chosen:
                continue
            if not selected:
                score = rel
            else:
                maxsim = max(_round_half_away(_cos(vec, s[1]))
                             for s in selected)
                score = _round_half_away(
                    lambda_ * rel - (1.0 - lambda_) * maxsim)
            # total order: score desc, id asc
            if (best is None or score > best[3]
                    or (score == best[3] and cid < best[0])):
                best = (cid, vec, rel, score)
        selected.append(best)
        chosen.add(best[0])

    rows = [(i + 1, s[0], s[2], s[3]) for i, s in enumerate(selected)]
    id_type = dict(corpus.dtypes)[id_col]
    return local_literal_df(
        spark, rows, f"pick int, {id_col} {id_type}, relevance double, "
                     "mmr_score double")
