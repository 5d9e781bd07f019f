"""Pure-SQL-text vector search queries: the engine's SQL API.

Same semantics and oracles as the DataFrame-API KNN/MaxSim queries,
expressed as SQL strings over registered views + inlined SQL scalar
functions — proving a reference user can drive the engine entirely
from SQL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..functions.sql_functions import register_sql_functions
from ..registry import register
from ..tables import load

_COS = (
    "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))"
)


@register(
    "sql_knn_top5",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           ROUND({_COS.format(a='e.embedding', b='q.qv')}, 6) AS score
    FROM embeddings e CROSS JOIN q
    ORDER BY score DESC, e.vec_id
    LIMIT 5
    """,
)
def sql_knn_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ORDER BY cosine_sim(...) LIMIT k` in SQL text — inlined scalar
    function, planned as TakeOrderedAndProject (pinned in
    tests/test_sql_surface.py)."""
    register_sql_functions(spark)
    view = f"v_emb_{uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "embeddings").createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH q AS (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS qv
                   FROM {view} WHERE vec_id = 0)
        SELECT e.vec_id, e.label,
               ROUND(cosine_sim(CAST(e.embedding AS ARRAY<DOUBLE>), q.qv), 6) AS score
        FROM {view} e CROSS JOIN q
        ORDER BY score DESC, e.vec_id
        LIMIT 5
    """)


_MAXSIM_SQL_ORACLE = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id, qi.i, dj.j,
         list_dot_product(
           (CAST(e.embedding AS DOUBLE[]))[(dj.j - 1) * 8 + 1 : dj.j * 8],
           q.qe[(qi.i - 1) * 8 + 1 : qi.i * 8]
         ) AS dp
  FROM embeddings e
  CROSS JOIN q
  CROSS JOIN generate_series(1, 8) AS qi(i)
  CROSS JOIN generate_series(1, 8) AS dj(j)
),
mx AS (SELECT vec_id, i, MAX(dp) AS m FROM pairs GROUP BY vec_id, i),
sc AS (SELECT vec_id, ROUND(SUM(m), 6) AS score FROM mx GROUP BY vec_id)
SELECT vec_id, score FROM sc ORDER BY score DESC, vec_id LIMIT 5
"""


@register("sql_maxsim_top5", _MAXSIM_SQL_ORACLE)
def sql_maxsim_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxSim in SQL text via the inlined `max_sim` function — the
    whole late-interaction comparator runs inside codegen, no Python.
    (Per-pair dot summation is left-to-right like the oracle's slice
    dot products; SUM over the 8 maxima is order-free after round.)"""
    register_sql_functions(spark)
    view = f"v_emb_{uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "embeddings").createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH mv AS (
          SELECT vec_id,
                 transform(sequence(0, 7), j ->
                   CAST(slice(embedding, j * 8 + 1, 8) AS ARRAY<DOUBLE>)) AS vecs
          FROM {view}
        ),
        q AS (SELECT vecs AS qvecs FROM mv WHERE vec_id = 0)
        SELECT m.vec_id, ROUND(max_sim(q.qvecs, m.vecs), 6) AS score
        FROM mv m CROSS JOIN q
        ORDER BY score DESC, m.vec_id
        LIMIT 5
    """)
