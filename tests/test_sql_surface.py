"""SQL-text vector search: correctness + plan shape (inlined SQL
functions, no Python UDFs)."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.plans.explain import formatted_plan
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare


@pytest.mark.parametrize("name", ["sql_knn_top5", "sql_maxsim_top5"])
def test_sql_surface_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_sql_knn_matches_dataframe_api(spark, sf_smoke):
    a = REGISTRY["sql_knn_top5"].builder(spark, sf_smoke).collect()
    b = REGISTRY["knn_dense_top5"].builder(spark, sf_smoke).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


@pytest.mark.parametrize("name", ["sql_knn_top5", "sql_maxsim_top5"])
def test_sql_surface_plan_is_codegen(spark, sf_smoke, name):
    plan = formatted_plan(REGISTRY[name].builder(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan  # ORDER BY+LIMIT → top-k
    assert "PythonUDF" not in plan and "ArrowEval" not in plan  # inlined, no Python
