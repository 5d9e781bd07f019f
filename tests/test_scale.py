"""Scale-pattern queries vs oracle + sketch bounds + multivector
collection e2e."""

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection
from image_indexing_and_retrival_with_qdrant_spark.operators.maxsim import (
    as_multivector,
)
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
from image_indexing_and_retrival_with_qdrant_spark.tables import load

from .oracle import compare

NAMES = [
    "events_salted_agg",
    "documents_hash_sample",
    "orders_status_cube",
    "customers_open_not_finished",
    "events_moving_avg",
    "orders_intersect_all_statuses",
    "events_signup_purchase_funnel",
    "documents_length_histogram",
    "docs_keyset_page",
]


@pytest.mark.parametrize("name", NAMES)
def test_scale_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_approx_sketches_within_bounds(spark, sf_smoke):
    # the registry query's in-band booleans (oracle asserts them TRUE)
    for r in REGISTRY["events_approx_sketches"].builder(
            spark, sf_smoke).collect():
        assert r.hll_within_3rsd and r.median_in_band
    # tighter sketch-vs-exact assertions than the oracle's 3×rsd band
    ev = load(spark, sf_smoke, "events")
    approx = {
        r.event_type: r
        for r in ev.groupBy("event_type").agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", 0.5).alias("approx_median_value"),
        ).collect()
    }
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"),
             F.expr("percentile(value, 0.5)").alias("median"))
        .collect()
    }
    for et, ex in exact.items():
        assert abs(approx[et].approx_users - ex.users) <= max(2, 0.1 * ex.users)
        # percentile_approx returns an element of the dataset near the median
        spread = ev.filter(F.col("event_type") == et).agg(
            F.max("value") - F.min("value")
        ).collect()[0][0]
        assert abs(approx[et].approx_median_value - ex.median) <= 0.2 * spread


def test_multivector_collection_end_to_end(spark, sf_smoke, tmp_path):
    """S7→S8→Q2 on a multivector collection: create (MAX_SIM
    comparator), upsert reshaped fixture vectors, MaxSim-query it —
    the catalog analog of the ColPali flow (SURVEY.md §3.3)."""
    emb = load(spark, sf_smoke, "embeddings")
    mv = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        as_multivector(F.col("embedding"), 8, 8).alias("vectors"),
    )
    coll = create_collection(str(tmp_path), "mv", dim=8, multivector=True,
                             metric="cosine", normalize=False)
    assert coll.meta["comparator"] == "max_sim"
    coll.upsert(spark, mv, vec_col="vectors")
    assert coll.count(spark) == emb.count()

    # stored flat (array<double> + n_vecs), the high-throughput layout
    stored = coll.read(spark)
    assert not stored.schema["vectors"].dataType.elementType.typeName().startswith("array")
    assert stored.select("n_vecs").first().n_vecs == 8

    qv = [r.vectors for r in
          mv.filter(F.col("id") == "0").collect()][0]
    top = coll.search(spark, qv, k=3, id_col="id", vec_col="vectors").collect()
    assert top[0].id == "0"  # self-match first
    # matches the registry maxsim result on the same data
    want = [str(r.vec_id) for r in
            REGISTRY["maxsim_top5"].builder(spark, sf_smoke).limit(3).collect()]
    assert [r.id for r in top] == want

    # query_filter + score_threshold thread through the MaxSim branch
    filtered = coll.search(spark, qv, k=5, id_col="id", vec_col="vectors",
                           query_filter=F.col("id") != "0",
                           score_threshold=top[2].score).collect()
    assert all(r.id != "0" for r in filtered)
    assert all(r.score >= top[2].score for r in filtered)
