"""Bucketed co-located joins: the pre-shuffle layout for repeated
fact-fact joins (SCALE.md 'Partitioning & shuffle')."""

import uuid

from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.plans.explain import formatted_plan
from image_indexing_and_retrival_with_qdrant_spark.tables import load


def test_bucketed_join_avoids_shuffle(spark, sf_smoke, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    li_t, o_t = f"li_b_{suffix}", f"o_b_{suffix}"
    load(spark, sf_smoke, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(li_t)
    load(spark, sf_smoke, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable(o_t)
    try:
        li, o = spark.table(li_t), spark.table(o_t)
        # disable broadcast so the join strategy depends on the layout
        joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-locates both sides
        # and the result is right
        n = joined.count()
        plain = load(spark, sf_smoke, "lineitem").join(
            load(spark, sf_smoke, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).count()
        assert n == plain
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {li_t}")
        spark.sql(f"DROP TABLE IF EXISTS {o_t}")
