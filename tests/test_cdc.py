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


def test_band_join_is_not_nested_loop(spark, sf_smoke):
    plan = formatted_plan(
        REGISTRY["events_click_purchase_band"].builder(spark, sf_smoke)
    )
    assert "BroadcastNestedLoopJoin" not in plan  # bucketized equi-join
    assert "Join" in plan
