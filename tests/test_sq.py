"""Scalar quantization: closed-form int8 tier with a FULL value
oracle (unlike IVF/LSH/PQ, which are rows-only by design)."""

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.operators.knn import dense_knn
from image_indexing_and_retrival_with_qdrant_spark.operators.sq import (
    sq_encode,
    sq_search,
    sq_train,
)
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
from image_indexing_and_retrival_with_qdrant_spark.tables import load
from tests.oracle import compare


@pytest.mark.parametrize("sf", ["sf_smoke", "sf_oracle"])
def test_sq_oracle_parity(spark, sf, request):
    """The whole tier — train, encode, dequantize-dot, top-k — must
    hash-match the DuckDB recomputation at both fixture scales."""
    sf_dir = request.getfixturevalue(sf)
    compare(spark, REGISTRY["ann_sq_top5"], sf_dir, "ann_sq_top5")


def test_sq_codes_are_bytes(spark, sf_smoke):
    emb = load(spark, sf_smoke, "embeddings")
    mins, steps = sq_train(emb, dim=64)
    assert len(mins) == len(steps) == 64
    codes = codes_df = sq_encode(emb, mins, steps)
    row = codes_df.limit(1).collect()[0]
    assert len(row.codes) == 64
    assert all(0 <= c <= 255 for c in row.codes)
    assert codes.count() == emb.count()


def test_sq_accuracy_vs_exact(spark, sf_smoke):
    """int8 quantization should preserve the exact top-k almost
    perfectly (4x compression, ~1-2% score error)."""
    emb = load(spark, sf_smoke, "embeddings")
    mins, steps = sq_train(emb, dim=64)
    codes = sq_encode(emb, mins, steps)
    qvec = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)

    approx = sq_search(codes, mins, steps, qvec, k=10).collect()
    approx_ids = {r.vec_id for r in approx}

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )
    exact_ids = {r.vec_id for r in dense_knn(emb, q, k=10, dim=64).collect()}
    recall = len(approx_ids & exact_ids) / 10
    assert recall >= 0.8, f"SQ recall@10 too low: {recall}"
    # self-match survives quantization at rank ~1
    assert 0 in {r.vec_id for r in approx[:3]}


def test_sq_zero_width_dim(spark):
    """A constant dimension (min == max) must encode to 0 and
    dequantize back to the constant, not divide by zero."""
    df = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(4)],
        "vec_id int, embedding array<double>",
    )
    mins, steps = sq_train(df, dim=2)
    assert steps[0] == 0.0
    codes = sq_encode(df, mins, steps)
    assert all(r.codes[0] == 0 for r in codes.collect())
    top = sq_search(codes, mins, steps, [1.0, 1.0], k=4,
                    round_digits=None).collect()
    # scores still ordered by the varying dim
    assert [r.vec_id for r in top] == [3, 2, 1, 0]
