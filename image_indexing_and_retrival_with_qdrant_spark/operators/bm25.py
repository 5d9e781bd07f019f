"""BM25 lexical ranking (the keyword-retrieval complement to the
vector operators — a retrieval engine needs both for hybrid search).

Okapi BM25 with the Lucene idf form:

    idf(t)      = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    score(q, d) = Σ_{t∈q} idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))

The sum runs over query terms *with multiplicity* (a term repeated in
the query contributes once per occurrence — the standard Σ over q, not
set semantics): each distinct term's contribution is weighted by its
query-side count via a broadcast ``(term, qtf)`` frame.

Plan shape (all Catalyst built-ins): one explode over tokens filtered
to the query's terms (scan-local; the filter prunes before the
shuffle), tf per (doc, term) and df per term from the same exploded
frame, corpus stats (N, avgdl) as a broadcast one-row frame. The only
per-corpus shuffles key on doc id / term — uniform. At 100 TB the
inverted-index analog is: persist the (term, doc, tf) frame bucketed
by term; per-query cost is then a bucket-pruned scan of |q| terms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..functions.localframe import local_literal_df

from ..functions.text import tokens
from .topk import global_topk

__all__ = ["bm25_rank"]


def bm25_rank(docs: DataFrame, query_terms: Sequence[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75,
              round_digits: int | None = 6) -> DataFrame:
    """Top-k documents for a bag of query terms under BM25."""
    from collections import Counter

    qtf = Counter(query_terms)
    distinct_terms = list(qtf)

    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    lengths = toked.select(F.col(id_col), F.size("toks").alias("dl"))
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    terms = toked.select(
        F.col(id_col), F.explode("toks").alias("term")
    ).filter(F.col("term").isin(*distinct_terms))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qtf_df = local_literal_df(
        docs.sparkSession, list(qtf.items()), "term string, qtf int")

    scored_terms = (
        tf.join(F.broadcast(df_t), on="term")
        .join(F.broadcast(qtf_df), on="term")
        .join(lengths, on=id_col)
        .join(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = F.col("tf") / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    per_term = scored_terms.withColumn("contrib", F.col("qtf") * idf * tf_norm)
    score = F.sum("contrib")
    if round_digits is not None:
        score = F.round(score, round_digits)
    scores = per_term.groupBy(id_col).agg(score.alias("score"))
    return global_topk(scores, [("score", False), (id_col, True)], k)
