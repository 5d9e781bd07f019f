"""Collection-level quantization (Qdrant quantization_config): codes
sidecar maintained across upsert/delete, search = quantized prefetch
+ exact rescore."""

import os

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection


def _pts(spark, ids):
    # unit-ish 4-d vectors spread on distinct directions
    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5), float(i % 3), 1.0])
            for i in ids]
    return spark.createDataFrame(rows, "id int, embedding array<double>")


@pytest.mark.parametrize("q", ["sq", "bq"])
def test_quantized_search_matches_exact(spark, tmp_path, q):
    coll = create_collection(str(tmp_path), f"q_{q}", dim=4,
                             quantization=q)
    coll.upsert(spark, _pts(spark, range(40)))
    assert os.path.exists(coll._codes_path)
    qv = [2.0, 1.0, 0.0, 1.0]
    # generous oversampling => shortlist covers the true top-k
    approx = coll.search(spark, qv, k=5, oversampling=8.0).collect()
    exact = coll.search(spark, qv, k=5, exact=True).collect()
    assert [(r.id, r.score) for r in approx] == [(r.id, r.score) for r in exact]


def test_sq_params_frozen_and_incremental_append(spark, tmp_path):
    coll = create_collection(str(tmp_path), "qi", dim=4, quantization="sq")
    coll.upsert(spark, _pts(spark, range(20)))
    mins1 = list(coll.meta["sq_mins"])
    n1 = spark.read.parquet(coll._codes_path).count()
    assert n1 == 20
    coll.upsert(spark, _pts(spark, range(100, 120)))
    # train happened once; codes appended for the new batch only
    assert list(coll.meta["sq_mins"]) == mins1
    assert spark.read.parquet(coll._codes_path).count() == 40
    hits = coll.search(spark, [2.0, 1.0, 0.0, 1.0], k=3,
                       oversampling=16.0).collect()
    assert len(hits) == 3


def test_delete_refreshes_codes(spark, tmp_path):
    coll = create_collection(str(tmp_path), "qd", dim=4, quantization="bq")
    coll.upsert(spark, _pts(spark, range(30)))
    removed = coll.delete(spark, F.col("id") >= 20)
    assert removed == 10
    codes = spark.read.parquet(coll._codes_path)
    assert codes.count() == 20
    assert codes.filter(F.col("id") >= 20).count() == 0


def test_quantization_validation(tmp_path):
    with pytest.raises(ValueError, match="quantization must be"):
        create_collection(str(tmp_path), "bad", dim=4, quantization="pq9")
    with pytest.raises(ValueError, match="multivector collections support"):
        # sq is ALLOWED on multivector (round 11); the vector
        # quantizers whose codes aren't per-dim are not
        create_collection(str(tmp_path), "bad2", dim=4, multivector=True,
                          quantization="pq")
    with pytest.raises(ValueError, match="don't apply"):
        create_collection(str(tmp_path), "bad3",
                          vectors={"a": {"dim": 4}}, quantization="sq")


def test_update_collection_toggles_quantization(spark, tmp_path):
    """Qdrant update_collection: enable quantization post-create
    (sidecar trains/encodes over the current table), switch kinds,
    and disable (sidecar dropped, searches go exact)."""
    coll = create_collection(str(tmp_path), "uc", dim=4)
    coll.upsert(spark, _pts(spark, range(30)))
    assert not os.path.exists(coll._codes_path)
    coll.update_collection(spark, quantization="sq")
    assert os.path.exists(coll._codes_path)
    assert "sq_mins" in coll.meta
    qv = [2.0, 1.0, 0.0, 1.0]
    approx = coll.search(spark, qv, k=3, oversampling=10.0).collect()
    exact = coll.search(spark, qv, k=3, exact=True).collect()
    assert [r.id for r in approx] == [r.id for r in exact]
    # switch to bq: frozen sq params dropped, codes re-encoded
    coll.update_collection(spark, quantization="bq")
    assert "sq_mins" not in coll.meta
    assert len(coll.search(spark, qv, k=3, oversampling=10.0).collect()) == 3
    # disable: sidecar gone
    coll.update_collection(spark, quantization=None)
    assert not os.path.exists(coll._codes_path)
    assert len(coll.search(spark, qv, k=3).collect()) == 3


def test_update_collection_lowers_indexing_threshold(spark, tmp_path):
    """Lowering the threshold below the current count builds the IVF
    layout on the spot."""
    coll = create_collection(str(tmp_path), "ut", dim=4)
    coll.upsert(spark, _pts(spark, range(40)))
    assert not coll.has_index()
    coll.update_collection(spark, indexing_threshold=10)
    assert coll.has_index()
    hits = coll.search(spark, [2.0, 1.0, 0.0, 1.0], k=3)
    assert len(hits.collect()) == 3
