"""SQL-surface vector functions (SURVEY.md §4 stretch goal, achieved
without a custom Catalyst rule).

Spark SQL scalar functions (``CREATE TEMPORARY FUNCTION ... RETURN
expr``) are **inlined into the logical plan** during resolution — they
are not UDFs. After ``register_sql_functions(spark)`` a user can write

    SELECT vec_id FROM embeddings
    ORDER BY cosine_sim(embedding, (SELECT embedding FROM embeddings
                                    WHERE vec_id = 0)) DESC
    LIMIT 5

and Catalyst plans the ordinary ``TakeOrderedAndProject`` over
codegen'd expressions — SQL-text vector search with zero Python and
zero custom rules. ``max_sim`` is the full late-interaction comparator
as one nested higher-order-function expression.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["register_sql_functions"]

_FUNCS = {
    "vec_dot": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_dot(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y),
                         CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
    """,
    "vec_norm": """
        CREATE OR REPLACE TEMPORARY FUNCTION vec_norm(a ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN sqrt(aggregate(zip_with(a, a, (x, y) -> x * y),
                              CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))
    """,
    "cosine_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y),
                         CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
               / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y),
                                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))
                  * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y),
                                   CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)))
    """,
    # MAX_SIM comparator (incremental_indexing_colpali_with_qdrant.py:128-130)
    # as one expression: Σ over query vectors of max over doc vectors of dot
    "max_sim": """
        CREATE OR REPLACE TEMPORARY FUNCTION max_sim(
            q ARRAY<ARRAY<DOUBLE>>, d ARRAY<ARRAY<DOUBLE>>) RETURNS DOUBLE
        RETURN aggregate(
            transform(q, qv -> array_max(transform(d, dv ->
                aggregate(zip_with(qv, dv, (x, y) -> x * y),
                          CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)))),
            CAST(0.0 AS DOUBLE), (acc, m) -> acc + m)
    """,
}


def register_sql_functions(spark: SparkSession) -> None:
    for ddl in _FUNCS.values():
        spark.sql(ddl)
