"""BM25 lexical retrieval + hybrid (lexical ∪ vector) search queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bm25 import bm25_rank
from ..registry import register
from ..tables import load

_TERMS = ("join", "hash", "merge")
_K1, _B = 1.2, 0.75

_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _TERMS) + ")"

# CTE prefix (tokenize → tf/df → per-term contributions) shared with
# the formula-boost oracle (queries/formula.py), which re-ranks the
# same prescore.
_BM25_ORACLE_PRE = f"""
WITH toked AS (
  SELECT doc_id, regexp_extract_all(text, '\\w+') AS toks FROM documents
),
lengths AS (SELECT doc_id, len(toks) AS dl FROM toked),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM lengths),
terms AS (
  SELECT doc_id, unnest(toks) AS term FROM toked
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM terms WHERE term IN {_TERMS_SQL}
  GROUP BY doc_id, term
),
df_t AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (tf.tf / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * l.dl / s.avgdl)))
           AS c
  FROM tf JOIN df_t d ON tf.term = d.term
  JOIN lengths l ON l.doc_id = tf.doc_id
  CROSS JOIN stats s
),
"""

_BM25_ORACLE = f"""
{_BM25_ORACLE_PRE.rstrip().rstrip(',')}
SELECT doc_id, ROUND(SUM(c), 6) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT 10
"""


@register("bm25_search_top10", _BM25_ORACLE)
def bm25_search_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the query terms {join, hash, merge}."""
    docs = load(spark, sf_dir, "documents")
    return bm25_rank(docs, _TERMS, k=10, k1=_K1, b=_B)
