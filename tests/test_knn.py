"""Dense cosine KNN vs DuckDB oracle (SURVEY.md §2.4 Q1/Q3)."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare

KNN_QUERIES = [
    "knn_dense_top5",
    "knn_batch_top3",
    "knn_filtered_top5",
    "knn_threshold",
    "knn_projection_top5",
    "knn_euclid_top5",
    "knn_manhattan_threshold",
    "knn_grouped_top3",
    "knn_recommend_top5",
    "knn_recommend_best_score_top5",
    "knn_wide_dense_top5",
]


@pytest.mark.parametrize("name", KNN_QUERIES)
def test_knn_oracle_smoke_sf(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


@pytest.mark.parametrize("name", ["knn_dense_top5", "knn_batch_top3"])
def test_knn_oracle_sf001(spark, sf_oracle, name):
    compare(spark, REGISTRY[name], sf_oracle, name)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert set(e.oracle_sql()) <= set(e.queries())
