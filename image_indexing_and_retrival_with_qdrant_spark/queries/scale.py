"""Scale-pattern queries: skew-salted aggregation, deterministic
hash sampling, cube, set difference, moving windows, sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import hash64
from ..operators.skew import salted_agg
from ..registry import register
from ..tables import load


@register(
    "events_salted_agg",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(MIN(value), 2) AS min_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the 5 hot event types — the
    oracle is the direct single-stage aggregation, proving the salt +
    merge is exact (operators/skew.py)."""
    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "event_id"),
            "total_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("total_value", 2).alias("total_value"),
        F.round("min_value", 2).alias("min_value"),
        F.round("max_value", 2).alias("max_value"),
    )


@register(
    "documents_hash_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 10 = 0
    """,
)
def documents_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample via content hashing — reproducible
    across engines and runs (unlike TABLESAMPLE's engine-specific RNG),
    stable under repartitioning, and usable as a train/holdout split."""
    d = load(spark, sf_dir, "documents")
    bucket = hash64(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 10
    return d.filter(bucket == 0).select("doc_id", "lang")


@register(
    "orders_status_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def orders_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 marginal combinations)."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "customers_open_not_finished",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_only_open
    FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def customers_open_not_finished(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT) — customers with open but no finished
    orders."""
    o = load(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.subtract(fin_c).agg(  # EXCEPT (distinct) semantics
        F.count(F.lit(1)).alias("n_only_open")
    )


@register(
    "events_moving_avg",
    """
    WITH seq AS (
      SELECT user_id, event_id, value,
             ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               AS mov_avg_3
      FROM events
    )
    SELECT user_id, event_id, mov_avg_3 FROM seq
    """,
)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-event moving average per user (bounded-frame window)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "user_id", "event_id",
        F.round(F.avg("value").over(w), 6).alias("mov_avg_3"),
    )


@register("events_approx_sketches", None)
def events_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HLL distinct, quantile sketch) — rows-only
    in the driver (sketch internals are engine-specific); pytest bounds
    them against exact values."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median_value"),
    )
