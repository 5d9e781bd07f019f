"""Fusion operators (RRF / DBSF) + the universal query API."""

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import (
    Prefetch,
    create_collection,
)
from image_indexing_and_retrival_with_qdrant_spark.operators.fusion import (
    dbsf_fuse,
    rrf_fuse,
)
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
from tests.oracle import compare


@pytest.mark.parametrize("sf", ["sf_smoke", "sf_oracle"])
def test_sparse_dense_rrf_oracle(spark, sf, request):
    compare(spark, REGISTRY["hybrid_sparse_dense_rrf_top10"],
            request.getfixturevalue(sf), "hybrid_sparse_dense_rrf_top10")


def _branch(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, score double")


def test_rrf_hand_computed(spark):
    a = _branch(spark, [(1, 0.9), (2, 0.8), (3, 0.7)])
    b = _branch(spark, [(2, 5.0), (4, 4.0)])
    out = {r.doc_id: r.rrf for r in rrf_fuse([a, b], k=10).collect()}
    assert out[2] == round(1 / 62 + 1 / 61, 6)  # rank 2 in a, rank 1 in b
    assert out[1] == round(1 / 61, 6)
    assert out[4] == round(1 / 62, 6)
    assert out[3] == round(1 / 63, 6)


def test_rrf_ascending_branch(spark):
    """A distance branch (lower better) fuses via negated scores."""
    dist = _branch(spark, [(1, 0.1), (2, 5.0)])  # 1 is the best
    out = rrf_fuse([(dist, True)], k=2).collect()
    assert [r.doc_id for r in out] == [1, 2]


def test_dbsf_hand_computed(spark):
    # branch scores 1,2,3: mu=2, sigma=sqrt(2/3)
    a = _branch(spark, [(1, 1.0), (2, 2.0), (3, 3.0)])
    out = {r.doc_id: r.dbsf for r in dbsf_fuse([a], k=3).collect()}
    import math
    sig = math.sqrt(2.0 / 3.0)
    assert out[2] == pytest.approx(0.5, abs=1e-6)
    assert out[3] == pytest.approx((3 - (2 - 3 * sig)) / (6 * sig), abs=1e-6)
    # constant branch: everyone present scores 0.5
    c = _branch(spark, [(7, 1.0), (8, 1.0)])
    outc = {r.doc_id: r.dbsf for r in dbsf_fuse([c], k=2).collect()}
    assert outc == {7: 0.5, 8: 0.5}


def test_collection_query_prefetch(spark, tmp_path):
    """Universal query API over named spaces: dense + MaxSim branches
    fused with RRF; DBSF also runs; validation errors surface."""
    coll = create_collection(
        str(tmp_path), "uq",
        vectors={"dense": {"dim": 2, "metric": "dot", "normalize": False},
                 "late": {"dim": 2, "multivector": True,
                          "normalize": False}})
    pts = spark.createDataFrame(
        [(1, [1.0, 0.0], [[1.0, 0.0]]), (2, [0.8, 0.0], [[0.0, 1.0]]),
         (3, [0.0, 0.5], [[0.9, 0.1]])],
        "id int, dense array<double>, late array<array<double>>")
    coll.upsert(spark, pts)
    out = coll.query(
        spark,
        [Prefetch([1.0, 0.0], using="dense", limit=2),
         Prefetch([[1.0, 0.0]], using="late", limit=2)],
        fusion="rrf", k=3).collect()
    scores = {r.id: r.rrf for r in out}
    # dense ranks: 1,2 ; late ranks: 1,3 -> id1 in both at rank 1
    assert scores[1] == round(2 / 61, 6)
    assert scores[2] == round(1 / 62, 6)
    assert scores[3] == round(1 / 62, 6)
    dbsf = coll.query(spark, Prefetch([1.0, 0.0], using="dense"),
                      fusion="dbsf", k=3).collect()
    assert len(dbsf) >= 2
    with pytest.raises(ValueError, match="unknown fusion"):
        coll.query(spark, [Prefetch([1.0, 0.0], using="dense")],
                   fusion="mean")
    with pytest.raises(ValueError, match="at least one"):
        coll.query(spark, [], fusion="rrf")
