"""Relational + events queries vs DuckDB oracle (SURVEY.md §7 M6)."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare

NAMES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "nation_revenue",
    "top_customers_per_nation",
    "order_priority_rollup",
    "customers_open_and_finished",
    "customers_without_orders",
    "part_brand_volume",
    "supplier_part_distinct",
    "cheapest_part_per_brand",
    "lineitem_unpivot_measures",
    "events_tumbling_5min",
    "events_sliding_10min",
    "events_sessionization",
    "events_json_payload",
    "events_user_daily_activity",
]


@pytest.mark.parametrize("name", NAMES)
def test_relational_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


@pytest.mark.parametrize(
    "name", ["tpch_q1_pricing_summary", "events_sessionization"]
)
def test_relational_oracle_sf001(spark, sf_oracle, name):
    compare(spark, REGISTRY[name], sf_oracle, name)
