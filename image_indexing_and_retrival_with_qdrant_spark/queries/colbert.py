"""ColBERT-style text retrieval end-to-end (SURVEY.md §3.3 lifecycle
with a *text* corpus): per-token multivector embeddings on both sides,
MaxSim late-interaction scoring, top-k — the full multivector query
path (Q2+Q4) with a deterministic token-hash embedder so every stage,
including the ragged per-token embedding, is oracle-checked.

Mirrors ``qdrant_query_with_colpali.py:85-114`` (query → per-token
matrix → MAX_SIM search) at toy scale: one 8-d hash vector per token,
first 16 tokens per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions.localframe import local_literal_df

from ..functions.text import hash64, tokens
from ..operators.maxsim import maxsim_knn
from ..registry import register
from ..tables import load

_DIM = 8
_MAX_TOKENS = 16
_MOD = 2_000_001
_HALF = 1_000_000
_QUERY_TEXT = "hash join merge sort"
_QUERY_TOKENS = _QUERY_TEXT.split()


def _token_vec(tok: Column) -> Column:
    """One 8-d vector per token (same arithmetic as HashEmbedder)."""
    return F.array(
        *[
            (hash64(F.concat(tok, F.lit(f":{i}"))) % _MOD - _HALF)
            / F.lit(float(_HALF))
            for i in range(_DIM)
        ]
    )


def _multivector(text: Column) -> Column:
    toks = F.slice(tokens(text), 1, _MAX_TOKENS)
    return F.transform(toks, _token_vec)


def _dim_sql(term_expr: str, i: int) -> str:
    h = f"CAST(('0x' || substr(md5({term_expr} || ':{i}'), 1, 15)) AS BIGINT)"
    return f"((({h} % {_MOD}) - {_HALF}) / {float(_HALF)})"


def _build_oracle() -> str:
    # query-token vectors as SQL expressions over literal tokens (same
    # md5 arithmetic → bitwise-equal dims)
    q_rows = []
    for qi, tok in enumerate(_QUERY_TOKENS):
        dims = ", ".join(_dim_sql(f"'{tok}'", i) for i in range(_DIM))
        q_rows.append(f"SELECT {qi} AS qi, [{dims}] AS qv")
    q_cte = " UNION ALL ".join(q_rows)
    d_dims = ", ".join(_dim_sql("dt.term", i) for i in range(_DIM))
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '\\w+') AS ts FROM documents
    ),
    dt AS (
      SELECT doc_id, ts[j.j] AS term
      FROM toks CROSS JOIN generate_series(1, {_MAX_TOKENS}) AS j(j)
      WHERE j.j <= len(ts)
    ),
    dvec AS (SELECT doc_id, [{d_dims}] AS dv FROM dt),
    qvec AS ({q_cte}),
    dots AS (
      SELECT d.doc_id, q.qi, list_dot_product(d.dv, q.qv) AS dp
      FROM dvec d CROSS JOIN qvec q
    ),
    mx AS (SELECT doc_id, qi, MAX(dp) AS m FROM dots GROUP BY doc_id, qi),
    sc AS (SELECT doc_id, ROUND(SUM(m), 6) AS score FROM mx GROUP BY doc_id)
    SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 5
    """


@register("colbert_text_search_top5", _build_oracle())
def colbert_text_search_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction text retrieval: tokenize both sides, one hash
    vector per token, MaxSim top-5 via the flat pandas scorer."""
    docs = load(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id", F.flatten(_multivector(F.col("text"))).alias("mv")
    )
    query = local_literal_df(spark, [(_QUERY_TEXT,)],
                             "text string").select(
        F.flatten(_multivector(F.col("text"))).alias("query_mv")
    )
    return maxsim_knn(
        corpus, query, k=5, id_col="doc_id",
        mv_col="mv", query_mv_col="query_mv", flat_dim=_DIM,
    )
