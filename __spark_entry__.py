"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (dense cosine top-5) on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 via the registry in
``image_indexing_and_retrival_with_qdrant_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["knn_dense_top5"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full registry in its stable declaration order — sampling
    (which subset gets checked per round) is the driver's decision,
    not ours."""
    return {name: REGISTRY[name].builder for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    # factory oracles (data-derived constants) resolve at the driver's
    # correctness SF
    return {name: e.oracle_for("/root/testdata/sf0.01")
            for name, e in REGISTRY.items() if e.oracle is not None}
