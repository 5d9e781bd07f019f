"""Recall-target routing (routing.py + Collection.search(recall_target=)):
the measured BASELINE.md recall curves as engine behavior — the
operational HNSW-substitution story (VERDICT r4 item 6)."""

import math

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection
from image_indexing_and_retrival_with_qdrant_spark.routing import route_for_recall


def test_route_validates_target():
    for bad in (0.0, -0.1, 1.0001, 2.0):
        with pytest.raises(ValueError):
            route_for_recall(bad, indexed=True)


def test_route_unindexed_is_exact():
    # below indexing_threshold the scan is already exact (Qdrant's
    # deferred-index behavior) — any target is satisfied
    r = route_for_recall(0.5, indexed=False)
    assert r == {"exact": True, "nprobe": None, "oversampling": None}


def test_route_indexed_nprobe_from_curve():
    # measured: nprobe=1/16 -> 0.77, 2/16 -> 0.995, 4/16 -> 1.0
    assert route_for_recall(0.7, indexed=True)["nprobe"] == 1
    assert route_for_recall(0.95, indexed=True)["nprobe"] == 2
    assert route_for_recall(0.998, indexed=True)["nprobe"] == 4
    # fractions scale with the collection's cell count
    assert route_for_recall(0.95, indexed=True,
                            k_centroids=64)["nprobe"] == 8
    assert route_for_recall(0.7, indexed=True,
                            k_centroids=4)["nprobe"] == 1


def test_route_exactness_needs_exact_scan():
    # measured 1.0 points are measurements, not proofs
    for state in (dict(indexed=True), dict(indexed=False),
                  dict(indexed=False, quantization="bq")):
        r = route_for_recall(1.0, **state)
        assert r["exact"] and r["nprobe"] is None


def test_route_quantized_oversampling():
    assert route_for_recall(0.8, indexed=False,
                            quantization="sq")["oversampling"] == 4.0
    assert route_for_recall(0.95, indexed=False,
                            quantization="bq")["oversampling"] == 10.0
    assert route_for_recall(0.9995, indexed=False,
                            quantization="bq")["exact"]


def _clustered(spark, tmp_path, **kw):
    """Two tight clusters far apart: any nprobe>=1 probe of the right
    cell retrieves the true neighbors."""
    rows = []
    for i in range(30):
        rows.append((i, [10.0 + (i % 5) * 0.01, 0.0, 0.0, 0.0]))
    for i in range(30, 60):
        rows.append((i, [0.0, 10.0 + (i % 5) * 0.01, 0.0, 0.0]))
    coll = create_collection(str(tmp_path), "rt", dim=4, metric="euclid",
                             normalize=False, **kw)
    coll.upsert(spark, spark.createDataFrame(
        rows, "id int, embedding array<double>"))
    return coll


def test_search_recall_target_unindexed_matches_exact(spark, tmp_path):
    coll = _clustered(spark, tmp_path)
    q = [10.0, 0.0, 0.0, 0.0]
    want = [(r.id, r.score) for r in coll.search(spark, q, k=5,
                                                 exact=True).collect()]
    got = [(r.id, r.score) for r in
           coll.search(spark, q, k=5, recall_target=0.95).collect()]
    assert got == want


def test_search_recall_target_routes_indexed(spark, tmp_path):
    coll = _clustered(spark, tmp_path, indexing_threshold=1, k_centroids=4)
    assert coll.has_index()
    q = [10.0, 0.0, 0.0, 0.0]
    exact = [(r.id, r.score) for r in coll.search(spark, q, k=5,
                                                  exact=True).collect()]
    # target 0.95 @ 4 cells -> nprobe=1: must equal the explicit knob
    routed = [(r.id, r.score) for r in
              coll.search(spark, q, k=5, recall_target=0.95).collect()]
    explicit = [(r.id, r.score) for r in
                coll.search(spark, q, k=5, nprobe=1).collect()]
    assert routed == explicit
    # clusters are separated, so the probed cell holds the true top-5
    assert routed == exact
    # target >= 0.999 -> exact scan
    assert [(r.id, r.score) for r in
            coll.search(spark, q, k=5, recall_target=1.0).collect()] == exact


def test_search_explicit_knobs_beat_target(spark, tmp_path):
    coll = _clustered(spark, tmp_path, indexing_threshold=1, k_centroids=4)
    q = [10.0, 0.0, 0.0, 0.0]
    # explicit nprobe=4 (exhaustive) with a low target: the explicit
    # knob wins — result identical to the exhaustive probe
    want = [(r.id, r.score) for r in
            coll.search(spark, q, k=5, nprobe=4).collect()]
    got = [(r.id, r.score) for r in
           coll.search(spark, q, k=5, nprobe=4,
                       recall_target=0.7).collect()]
    assert got == want


def test_search_batch_recall_target(spark, tmp_path):
    coll = _clustered(spark, tmp_path, indexing_threshold=1, k_centroids=4)
    qs = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]]
    want = {(r.query_idx, r.id, r.rank) for r in
            coll.search_batch(spark, qs, k=3, nprobe=1).collect()}
    got = {(r.query_idx, r.id, r.rank) for r in
           coll.search_batch(spark, qs, k=3,
                             recall_target=0.95).collect()}
    assert got == want


def test_search_recall_target_quantized(spark, tmp_path):
    coll = _clustered(spark, tmp_path, quantization="bq")
    q = [10.0, 0.0, 0.0, 0.0]
    got = coll.search(spark, q, k=3, recall_target=0.95).collect()
    assert len(got) == 3
    exact = coll.search(spark, q, k=3, exact=True).collect()
    assert {r.id for r in got} == {r.id for r in exact}
