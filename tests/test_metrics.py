"""Distance-metric parity: euclid/manhattan collections rank
ascending, threshold is a max bound, and the Collection surface
dispatches on the declared metric (Qdrant Distance.{EUCLID,MANHATTAN})."""

import math

import pytest

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection


def _mk(spark, tmp_path, metric):
    coll = create_collection(str(tmp_path), f"m_{metric}", dim=3, metric=metric)
    pts = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]),
         (3, [1.0, 1.0, 0.0]), (4, [3.0, 4.0, 0.0])],
        "id int, embedding array<double>",
    )
    coll.upsert(spark, pts)
    return coll


def test_euclid_collection_not_normalized(spark, tmp_path):
    # metric != cosine => normalize defaults off; vectors stored raw
    coll = _mk(spark, tmp_path, "euclid")
    assert not coll.meta["normalize"]
    stored = {r.id: list(r.embedding) for r in coll.read(spark).collect()}
    assert stored[4] == [3.0, 4.0, 0.0]


def test_euclid_search_ranks_ascending(spark, tmp_path):
    coll = _mk(spark, tmp_path, "euclid")
    hits = coll.search(spark, [0.0, 0.0, 0.0], k=4).collect()
    assert [r.id for r in hits] == [1, 2, 3, 4]
    assert hits[0].score == 0.0
    assert hits[3].score == 5.0  # 3-4-5 triangle
    assert hits[2].score == pytest.approx(math.sqrt(2.0), abs=1e-6)


def test_euclid_threshold_is_max_bound(spark, tmp_path):
    coll = _mk(spark, tmp_path, "euclid")
    hits = coll.search(spark, [0.0, 0.0, 0.0], k=4, score_threshold=2.0)
    assert {r.id for r in hits.collect()} == {1, 2, 3}


def test_manhattan_search(spark, tmp_path):
    coll = _mk(spark, tmp_path, "manhattan")
    hits = coll.search(spark, [0.0, 0.0, 0.0], k=4).collect()
    assert [r.id for r in hits] == [1, 2, 3, 4]
    assert [r.score for r in hits] == [0.0, 1.0, 2.0, 7.0]


def test_dot_metric_skips_normalization(spark, tmp_path):
    coll = _mk(spark, tmp_path, "dot")
    hits = coll.search(spark, [1.0, 1.0, 0.0], k=4).collect()
    # raw inner products: id4 = 7, id3 = 2, id2 = 1, id1 = 0
    assert [r.id for r in hits] == [4, 3, 2, 1]
    assert hits[0].score == 7.0


def test_batch_search_euclid(spark, tmp_path):
    coll = _mk(spark, tmp_path, "euclid")
    out = coll.search_batch(spark, [[0.0, 0.0, 0.0], [3.0, 4.0, 0.0]], k=2)
    rows = {(r.query_idx, r.rank): r.id for r in out.collect()}
    assert rows[(0, 1)] == 1 and rows[(1, 1)] == 4


def test_unknown_metric_rejected(spark, tmp_path):
    from image_indexing_and_retrival_with_qdrant_spark.operators.knn import _score
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="unknown metric"):
        _score(F.col("a"), F.col("b"), False, 3, "hamming")
