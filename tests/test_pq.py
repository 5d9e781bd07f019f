"""Product quantization: compression is real, recall is reasonable,
ADC scoring approximates the true inner product."""

from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.operators.knn import dense_knn
from image_indexing_and_retrival_with_qdrant_spark.operators.pq import (
    pq_build,
    pq_search,
)
from image_indexing_and_retrival_with_qdrant_spark.tables import load


def test_pq_roundtrip_and_recall(spark, sf_smoke):
    emb = load(spark, sf_smoke, "embeddings")
    codes, codebooks = pq_build(emb, dim=64, n_blocks=8, k_codes=16, seed=42)

    # compressed index: 8 small-int codes per row
    row = codes.limit(1).collect()[0]
    assert len([c for c in row.asDict() if c.startswith("code")]) == 8
    assert all(0 <= row[f"code{b}"] < 16 for b in range(8))

    qvec = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    approx = pq_search(codes, codebooks, list(qvec), k=20).collect()
    approx_ids = {r.vec_id for r in approx}

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )
    exact_ids = {r.vec_id for r in dense_knn(emb, q, k=20, dim=64).collect()}

    recall = len(approx_ids & exact_ids) / 20
    assert recall >= 0.25, f"PQ recall@20 too low: {recall}"
    # the query's own vector should land very near the top
    assert 0 in {r.vec_id for r in approx[:5]}


def test_pq_deterministic(spark, sf_smoke):
    emb = load(spark, sf_smoke, "embeddings")
    codes1, cb1 = pq_build(emb, dim=64, seed=42)
    codes2, cb2 = pq_build(emb, dim=64, seed=42)
    assert cb1 == cb2
    assert sorted(map(tuple, codes1.collect())) == sorted(map(tuple, codes2.collect()))


def test_ivfpq_composed_search(spark, sf_smoke):
    """IVFPQ: coarse probe → ADC shortlist → exact rescore. With a
    generous probe/rescore budget the result must contain the exact
    top hits that live in probed partitions; self-match is rank 1."""
    from image_indexing_and_retrival_with_qdrant_spark.operators.ann import ivf_build
    from image_indexing_and_retrival_with_qdrant_spark.operators.pq import ivfpq_search

    emb = load(spark, sf_smoke, "embeddings")
    assigned, centroids = ivf_build(emb, k_centroids=8, seed=42)
    codes, codebooks = pq_build(emb, dim=64, n_blocks=8, k_codes=16, seed=42)
    assigned_codes = codes.join(
        assigned.select("vec_id", "centroid_id"), on="vec_id"
    )
    qvec = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)
    got = ivfpq_search(assigned_codes, centroids, codebooks, emb, qvec,
                       k=10, nprobe=8, rescore=100).collect()
    assert got[0].vec_id == 0 and got[0].score == 1.0
    # exhaustive probe + big rescore ⇒ high overlap with exact scan
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec")
    )
    exact = {r.vec_id for r in dense_knn(emb, q, k=10, dim=64).collect()}
    overlap = len(exact & {r.vec_id for r in got}) / 10
    assert overlap >= 0.5, f"IVFPQ overlap too low: {overlap}"


import pytest


@pytest.mark.parametrize("sf", ["sf_smoke", "sf_oracle"])
def test_pq_det_oracle_parity(spark, sf, request):
    """Deterministic PQ tier: kmeans_np codebooks + argmin encoding +
    LUT scoring reproduce bit-for-bit in DuckDB — the quantized
    ranking itself is hash-checked, not just recall-bounded."""
    from image_indexing_and_retrival_with_qdrant_spark.registry import (
        REGISTRY,
    )
    from tests.oracle import compare

    compare(spark, REGISTRY["ann_pq_det_top5"],
            request.getfixturevalue(sf), "ann_pq_det_top5")
