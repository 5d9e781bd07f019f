"""Advanced analytics queries vs DuckDB oracle."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare

NAMES = [
    "events_asof_purchase_view",
    "orders_pivot_status",
    "lineitem_price_stats",
    "text_rolling_hash",
    "knn_batch_pruned_top3",
    "maxsim_two_stage_top5",
]


@pytest.mark.parametrize("name", NAMES)
def test_advanced_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_two_stage_equals_exact_when_prefilter_covers(spark, sf_smoke):
    """With 50 candidates out of 500 the two stages may diverge from
    exhaustive MaxSim in general, but the top-1 self-match (vec_id=0,
    perfect pooled score) must always survive stage 1."""
    rows = REGISTRY["maxsim_two_stage_top5"].builder(spark, sf_smoke).collect()
    assert rows[0].vec_id == 0
