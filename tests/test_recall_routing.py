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
    assert r == {"exact": True, "nprobe": None, "oversampling": None,
                 "rescore": None, "hnsw_ef": None}


def test_route_indexed_nprobe_from_curve():
    # measured: nprobe=1/16 -> 0.77, 2/16 -> 0.995, 4/16 -> 1.0
    assert route_for_recall(0.7, indexed=True)["nprobe"] == 1
    assert route_for_recall(0.95, indexed=True)["nprobe"] == 2
    assert route_for_recall(0.998, indexed=True)["nprobe"] == 4
    # fractions scale with the cell count, PLUS one probe per doubling
    # beyond the measured 16 cells (fragmentation margin, ADVICE r5)
    assert route_for_recall(0.95, indexed=True,
                            k_centroids=64)["nprobe"] == 8 + 2
    assert route_for_recall(0.95, indexed=True,
                            k_centroids=256)["nprobe"] == 32 + 4
    assert route_for_recall(0.7, indexed=True,
                            k_centroids=4)["nprobe"] == 1
    # the margin never pushes past the exhaustive probe
    assert route_for_recall(0.7, indexed=True,
                            k_centroids=17)["nprobe"] <= 17


def test_route_exactness_needs_exact_scan():
    # measured 1.0 points are measurements, not proofs
    for state in (dict(indexed=True), dict(indexed=False),
                  dict(indexed=False, quantization="bq"),
                  dict(indexed=False, multivector=True)):
        r = route_for_recall(1.0, **state)
        assert r["exact"] and r["nprobe"] is None and r["rescore"] is None


def test_route_quantized_oversampling():
    # 50k measured curves (recall_curve.py --quant): SQ is
    # near-lossless (0.99 at 1x, 1.0 at >=2x) so low targets route to
    # small oversampling; BQ collapses on clustered data (0.48 at 16x)
    # so anything above its trusted 0.45 ceiling routes to exact
    assert route_for_recall(0.8, indexed=False,
                            quantization="sq")["oversampling"] == 2.0
    assert route_for_recall(0.97, indexed=False,
                            quantization="sq")["oversampling"] == 4.0
    assert route_for_recall(0.995, indexed=False,
                            quantization="sq")["oversampling"] == 10.0
    assert route_for_recall(0.2, indexed=False,
                            quantization="bq")["oversampling"] == 4.0
    assert route_for_recall(0.44, indexed=False,
                            quantization="bq")["oversampling"] == 16.0
    assert route_for_recall(0.95, indexed=False,
                            quantization="bq")["exact"]
    assert route_for_recall(0.9995, indexed=False,
                            quantization="bq")["exact"]
    # pq/opq (round 9): the 32x band routes like BQ — small targets
    # get an oversampling from the measured ceilings, anything above
    # the trusted 0.50 goes exact (BASELINE.md §pq-oversampling)
    assert route_for_recall(0.25, indexed=False,
                            quantization="pq")["oversampling"] == 4.0
    assert route_for_recall(0.4, indexed=False,
                            quantization="pq")["oversampling"] == 10.0
    assert route_for_recall(0.5, indexed=False,
                            quantization="opq")["oversampling"] == 16.0
    assert route_for_recall(0.9, indexed=False,
                            quantization="pq")["exact"]


def test_route_multivector_rescore():
    # pooling-faithful measured curve (recall_curve.py --maxsim, 20k
    # docs 8x32): 50 -> 0.847, 100 -> 0.947, 200 -> 0.98, 400 -> 1.0;
    # trusted ceilings 0.84/0.94/0.97/0.998; depth scales with k
    r = route_for_recall(0.8, indexed=False, multivector=True, k=10)
    assert r["rescore"] == 50 and not r["exact"]
    assert route_for_recall(0.9, indexed=False, multivector=True,
                            k=10)["rescore"] == 100
    assert route_for_recall(0.95, indexed=False, multivector=True,
                            k=10)["rescore"] == 200
    assert route_for_recall(0.99, indexed=False, multivector=True,
                            k=10)["rescore"] == 400
    # recall@10 curves: a deeper k keeps the same cover ratio
    assert route_for_recall(0.8, indexed=False, multivector=True,
                            k=50)["rescore"] == 250
    # an INDEXED multivector collection routes the coarse stage
    r = route_for_recall(0.95, indexed=True, multivector=True, k=10)
    assert r["nprobe"] == 2 and r["rescore"] is None


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


def test_search_recall_target_routed_multivector(spark, tmp_path):
    # flat multivector collection: a recall target below the exact
    # cutover routes to two-stage at the measured depth (rescore=200
    # for target 0.95 @ k<=10) — must equal both the explicit knob
    # and (fixture is pooling-faithful) the exact scan
    rows = []
    for i in range(40):
        base = [1.0 + 0.01 * i, float(i % 7), float((i * 3) % 11), 1.0]
        rows.append((i, [base, [x * 0.5 for x in base]]))
    coll = create_collection(str(tmp_path), "mv_rt", dim=4,
                             multivector=True, normalize=True)
    coll.upsert(spark, spark.createDataFrame(
        rows, "id int, embedding array<array<double>>"))
    q = rows[17][1]
    exact = [(r.id, r.score) for r in
             coll.search(spark, q, k=5, exact=True).collect()]
    routed = [(r.id, r.score) for r in
              coll.search(spark, q, k=5, recall_target=0.95).collect()]
    explicit = [(r.id, r.score) for r in
                coll.search(spark, q, k=5, rescore=200).collect()]
    assert routed == explicit == exact
    # exactness still routes to the exact scan
    assert [(r.id, r.score) for r in
            coll.search(spark, q, k=5, recall_target=1.0).collect()] == exact
    # an explicit rescore depth beats the target's routed depth
    deep = [(r.id, r.score) for r in
            coll.search(spark, q, k=5, rescore=40,
                        recall_target=0.95).collect()]
    assert deep == [(r.id, r.score) for r in
                    coll.search(spark, q, k=5, rescore=40).collect()]


def test_search_recall_target_quantized(spark, tmp_path):
    coll = _clustered(spark, tmp_path, quantization="bq")
    q = [10.0, 0.0, 0.0, 0.0]
    got = coll.search(spark, q, k=3, recall_target=0.95).collect()
    assert len(got) == 3
    exact = coll.search(spark, q, k=3, exact=True).collect()
    assert {r.id for r in got} == {r.id for r in exact}


def test_route_hnsw_tier():
    """hnsw collections pick (nprobe, ef) from the JOINT measured
    composed curve (the per-stage union-bound split measured
    under-delivering on cluster-coherent cells — routing.py comment);
    targets above every ceiling fall through to index-only."""
    from image_indexing_and_retrival_with_qdrant_spark.routing import (
        route_for_recall,
    )

    r = route_for_recall(0.8, indexed=True, hnsw=True)
    assert (r["nprobe"], r["hnsw_ef"]) == (2, 16)
    r = route_for_recall(0.9, indexed=True, hnsw=True)
    assert (r["nprobe"], r["hnsw_ef"]) == (4, 32)
    r = route_for_recall(0.95, indexed=True, hnsw=True)
    assert (r["nprobe"], r["hnsw_ef"]) == (4, 64)
    r = route_for_recall(0.97, indexed=True, hnsw=True, k=20)
    assert (r["nprobe"], r["hnsw_ef"]) == (16, 64)
    r = route_for_recall(0.9, indexed=True, hnsw=True, k=50)
    assert r["hnsw_ef"] == 50  # beam must cover a deeper result list
    r = route_for_recall(0.98, indexed=True, hnsw=True)
    assert r["hnsw_ef"] is None and r["nprobe"] == 2  # index-only
    r = route_for_recall(0.999, indexed=True, hnsw=True)
    assert r["exact"] and r["hnsw_ef"] is None
    # beyond the measured 16 cells the margin raises EF (the measured
    # ef-bound direction, BASELINE.md §hnsw-catalog-stress grid:
    # recall flat in nprobe, moved by ef) on top of the probe bump
    r = route_for_recall(0.9, indexed=True, hnsw=True, k_centroids=64)
    assert (r["nprobe"], r["hnsw_ef"]) == (18, 64)
    r = route_for_recall(0.8, indexed=True, hnsw=True, k_centroids=64)
    assert (r["nprobe"], r["hnsw_ef"]) == (10, 32)
    # the SQ code-graph walk is MEASURED (within 0.005 of the
    # full-vector graph) and routes onto its own trusted grid
    r = route_for_recall(0.85, indexed=True, hnsw=True,
                         quantization="sq")
    assert (r["nprobe"], r["hnsw_ef"]) == (4, 32)
    r = route_for_recall(0.9, indexed=True, hnsw=True,
                         quantization="sq")
    assert (r["nprobe"], r["hnsw_ef"]) == (4, 64)
    r = route_for_recall(0.95, indexed=True, hnsw=True,
                         quantization="sq")
    assert (r["nprobe"], r["hnsw_ef"]) == (8, 128)
    r = route_for_recall(0.9, indexed=True, hnsw=True,
                         quantization="sq", k_centroids=64)
    assert (r["nprobe"], r["hnsw_ef"]) == (18, 128)  # kc margin too
    # above the graph-trusted ceilings: the composed codes-scan tier
    # (sq oversampling trusted to 0.998) takes over
    r = route_for_recall(0.97, indexed=True, hnsw=True,
                         quantization="sq")
    assert r["hnsw_ef"] is None and r["oversampling"] is not None
    # unmeasured decode geometries (pq/opq/bq) never route onto the
    # quantized walk — composed/index-only (PQ's trusted ceilings sit
    # below any halved miss budget, so this lands index-only)
    r = route_for_recall(0.45, indexed=True, hnsw=True,
                         quantization="pq")
    assert r["hnsw_ef"] is None and r["nprobe"] is not None


def test_search_recall_target_hnsw(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(3)
    pts = spark.createDataFrame(
        [(f"id{i:04d}", [float(x) for x in rng.randn(8)])
         for i in range(300)],
        "id string, embedding array<double>")
    coll = create_collection(str(tmp_path), "h_rt", dim=8,
                             normalize=False, indexing_threshold=1,
                             k_centroids=4,
                             hnsw_config={"m": 4, "ef_construct": 32})
    coll.upsert(spark, pts, mode="merge")
    qv = [float(x) for x in rng.randn(8)]
    exact = {r.id for r in coll.search(spark, qv, k=5,
                                       exact=True).collect()}
    # routed graph walk hits the exact set on this corpus
    routed = {r.id for r in coll.search(
        spark, qv, k=5, recall_target=0.9).collect()}
    assert len(routed & exact) >= 4
    # above every ef ceiling: index-only fallback is exact in cells
    hi = {r.id for r in coll.search(
        spark, qv, k=5, recall_target=0.998).collect()}
    assert len(hi) == 5
    # explicit hnsw_ef beats the routed one
    explicit = [(r.id, r.score) for r in coll.search(
        spark, qv, k=5, hnsw_ef=10 ** 6,
        recall_target=0.9).collect()]
    assert {i for i, _ in explicit} == exact
