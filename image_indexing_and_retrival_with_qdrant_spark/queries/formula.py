"""Formula score-boosting queries (Qdrant FormulaQuery analog).

The decay fragments are SQL strings valid in BOTH Spark and DuckDB
(``operators/formula.py``), so the registry formula and its oracle
share the exact same text — the oracle re-runs the same doubles, not
a re-derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.bm25 import bm25_rank
from ..operators.formula import (
    exp_decay_sql,
    formula_rescore,
    gauss_decay_sql,
    lin_decay_sql,
)
from ..operators.knn import dense_knn
from ..registry import register
from ..tables import load
from .bm25 import _BM25_ORACLE_PRE
from .knn import _COS, _query_of

_GAUSS_LABEL = gauss_decay_sql("label", target=5.0, scale=3.0)
_KNN_FORMULA = f"0.7 * score + 0.3 * {_GAUSS_LABEL}"


@register(
    "knn_formula_boost_top5",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    pre AS (
      SELECT e.vec_id, e.label,
             ROUND({_COS.format(a='e.embedding', b='q.qv')}, 6) AS score
      FROM embeddings e CROSS JOIN q
      ORDER BY score DESC, e.vec_id
      LIMIT 50
    )
    SELECT vec_id, ROUND({_KNN_FORMULA}, 6) AS boosted
    FROM pre
    ORDER BY boosted DESC, vec_id
    LIMIT 5
    """,
)
def knn_formula_boost_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-cosine prefetch (top-50) rescored by a payload-boost
    formula: ``0.7·score + 0.3·gauss_decay(label, target=5, scale=3)``
    — the Qdrant score-boosting pattern (prefetch + formula rescore)
    as one Catalyst projection over the shortlist. FULL value oracle:
    the oracle evaluates the *identical* formula SQL."""
    emb = load(spark, sf_dir, "embeddings")
    pre = dense_knn(emb, _query_of(emb, 0), k=50,
                    payload_cols=("label",), dim=64)
    return formula_rescore(pre, _KNN_FORMULA, k=5)


_LIN_LEN = lin_decay_sql("n_chars", target=800.0, scale=400.0)
_EXP_LEN = exp_decay_sql("n_chars", target=800.0, scale=600.0)
_DOCS_FORMULA = f"0.4 * score + 0.3 * {_LIN_LEN} + 0.3 * {_EXP_LEN}"


@register(
    "docs_formula_boost_top10",
    f"""
    {_BM25_ORACLE_PRE}
    pre AS (
      SELECT doc_id, ROUND(SUM(c), 6) AS score
      FROM contrib GROUP BY doc_id
      ORDER BY score DESC, doc_id
      LIMIT 50
    )
    SELECT p.doc_id, ROUND({_DOCS_FORMULA}, 6) AS boosted
    FROM pre p JOIN documents d ON p.doc_id = d.doc_id
    ORDER BY boosted DESC, p.doc_id
    LIMIT 10
    """,
)
def docs_formula_boost_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 prefetch (top-50 for {join, hash, merge}) rescored by a
    document-length preference: ``0.4·bm25 + 0.3·lin_decay(n_chars) +
    0.3·exp_decay(n_chars)`` — lexical relevance blended with a target
    length of ~800 chars. Payload joins happen on the ≤50-row
    shortlist, never the corpus."""
    docs = load(spark, sf_dir, "documents")
    pre = bm25_rank(docs, ("join", "hash", "merge"), k=50).join(
        docs.select("doc_id", "n_chars"), on="doc_id")
    return formula_rescore(pre, _DOCS_FORMULA, k=10, id_col="doc_id")
