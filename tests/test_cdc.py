"""SCD2 + range-join queries vs oracle; plan shape of the band join."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.plans.explain import formatted_plan
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare


@pytest.mark.parametrize(
    "name", ["scd2_corpus_refresh", "events_click_purchase_band"]
)
def test_cdc_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_scd2_duplicate_update_keys_do_not_fan_out(spark):
    """A key delivered twice in one batch must close the current row
    once and emit exactly one new version (dedup on ch_keys)."""
    from pyspark.sql import functions as F

    from image_indexing_and_retrival_with_qdrant_spark.operators.cdc import scd2_apply

    current = spark.createDataFrame(
        [("k1", "old", 1, True)],
        "doc_id string, text string, version int, is_current boolean",
    )
    updates = spark.createDataFrame(
        [("k1", "new"), ("k1", "new")], "doc_id string, text string"
    )
    out = scd2_apply(current, updates, key="doc_id", compare_col="text").collect()
    closed = [r for r in out if not r.is_current]
    fresh = [r for r in out if r.is_current]
    assert len(closed) == 1 and closed[0].text == "old"
    assert len(fresh) == 2 and all(r.text == "new" for r in fresh)
    # (two update rows still emit two v2 rows; only the close is deduped)


def test_scd2_null_transitions_detected(spark):
    """value→NULL and NULL→value are changes (null-safe inequality)."""
    from image_indexing_and_retrival_with_qdrant_spark.operators.cdc import scd2_apply

    current = spark.createDataFrame(
        [("a", "x", 1, True), ("b", None, 1, True)],
        "doc_id string, text string, version int, is_current boolean",
    )
    updates = spark.createDataFrame(
        [("a", None), ("b", "y"), ("b", None)][:2],
        "doc_id string, text string",
    )
    out = scd2_apply(current, updates, key="doc_id", compare_col="text")
    fresh = {r.doc_id: r for r in out.collect() if r.is_current}
    assert fresh["a"].text is None and fresh["a"].version == 2
    assert fresh["b"].text == "y" and fresh["b"].version == 2


def test_band_join_is_not_nested_loop(spark, sf_smoke):
    plan = formatted_plan(
        REGISTRY["events_click_purchase_band"].builder(spark, sf_smoke)
    )
    assert "BroadcastNestedLoopJoin" not in plan  # bucketized equi-join
    assert "Join" in plan
