"""Binary quantization: packing exactness, Hamming scoring, full
oracle parity for both the raw tier and the composed rescore."""

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.operators.bq import (
    bq_encode,
    bq_query_words,
    bq_search,
)
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
from image_indexing_and_retrival_with_qdrant_spark.tables import load
from tests.oracle import compare


@pytest.mark.parametrize("name", ["ann_bq_top5", "ann_bq_rescore_top5",
                                  "ann_bq_wide_rescore_top5"])
@pytest.mark.parametrize("sf", ["sf_smoke", "sf_oracle"])
def test_bq_oracle_parity(spark, sf, name, request):
    compare(spark, REGISTRY[name], request.getfixturevalue(sf), name)


def test_packing_matches_driver_encode(spark, sf_smoke):
    """Spark-side word packing must equal the driver-side encode of
    the same vector."""
    emb = load(spark, sf_smoke, "embeddings")
    row = emb.filter(F.col("vec_id") == 7).collect()[0]
    expect = bq_query_words(list(row.embedding))
    got = bq_encode(emb, dim=64).filter(F.col("vec_id") == 7).collect()[0]
    assert list(got.bits) == expect


def test_self_hamming_zero_and_monotone(spark, sf_smoke):
    emb = load(spark, sf_smoke, "embeddings")
    codes = bq_encode(emb, dim=64)
    qvec = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)
    top = bq_search(codes, qvec, k=10).collect()
    assert top[0].vec_id == 0 and top[0].hamming == 0
    hs = [r.hamming for r in top]
    assert hs == sorted(hs)
    assert all(0 <= h <= 64 for h in hs)


def test_known_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [-1.0] * 64), (3, [1.0] * 32 + [-1.0] * 32)],
        "vec_id int, embedding array<double>",
    )
    codes = bq_encode(df, dim=64)
    rows = {r.vec_id: list(r.bits) for r in codes.collect()}
    assert rows[1] == [2**32 - 1, 2**32 - 1]
    assert rows[2] == [0, 0]
    assert rows[3] == [2**32 - 1, 0]
    out = bq_search(codes, [1.0] * 64, k=3).collect()
    assert [(r.vec_id, r.hamming) for r in out] == [(1, 0), (3, 32), (2, 64)]


def test_partial_last_word(spark):
    """32∤dim packs a partial final word; Hamming stays exact."""
    df = spark.createDataFrame(
        [(1, [1.0] * 48), (2, [1.0] * 32 + [-1.0] * 16)],
        "vec_id int, embedding array<double>",
    )
    codes = bq_encode(df, dim=48)
    rows = {r.vec_id: list(r.bits) for r in codes.collect()}
    assert rows[1] == [2**32 - 1, 2**16 - 1]
    assert rows[2] == [2**32 - 1, 0]
    assert bq_query_words([1.0] * 48) == [2**32 - 1, 2**16 - 1]
    out = bq_search(codes, [1.0] * 48, k=2).collect()
    assert [(r.vec_id, r.hamming) for r in out] == [(1, 0), (2, 16)]
