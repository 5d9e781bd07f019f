"""Flat vs nested MaxSim scorers must agree exactly."""

from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.operators.maxsim import (
    as_multivector,
    maxsim_knn,
)
from image_indexing_and_retrival_with_qdrant_spark.tables import load


def test_flat_scorer_matches_nested(spark, sf_smoke):
    emb = load(spark, sf_smoke, "embeddings")
    nested_corpus = emb.select(
        "vec_id", as_multivector(F.col("embedding"), 8, 8).alias("vectors")
    )
    nested_q = emb.filter(F.col("vec_id") == 0).select(
        as_multivector(F.col("embedding"), 8, 8).alias("query_vectors")
    )
    flat_corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vectors")
    )
    flat_q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("query_vectors")
    )
    a = maxsim_knn(nested_corpus, nested_q, k=10).collect()
    b = maxsim_knn(flat_corpus, flat_q, k=10, flat_dim=8).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
