"""Structured-Streaming operators (SURVEY.md §2.7).

The reference is batch-only; its "incremental" re-run pattern (new
files appear → re-run the script → points appended, duplicating
everything — SURVEY.md §1.4) is what Structured Streaming does
properly: file-arrival sources, checkpointed exactly-once sinks,
watermarked windows for late data.

Each batch query in ``queries/events.py`` has its streaming twin here
built on the SAME column expressions, so the oracle-checked batch
result doubles as the streaming correctness reference
(tests/test_streaming.py runs both and compares).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["stream_events", "tumbling_counts", "sliding_avg",
           "session_aggregate"]


def stream_events(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based streaming source over the events fixture (stands in
    for kafka/kinesis; ts handling shared with tables.load via
    tables.normalize_events_ts so batch and streaming cannot drift)."""
    from image_indexing_and_retrival_with_qdrant_spark.tables import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin UTC alongside (see tables.load): the NTZ→timestamp cast and
    # unix_timestamp outputs must not depend on the session timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the fixture is a single file; file streams need a directory, so
    # stream the sf_dir with a glob pinned to the events file
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_events_ts(reader.format("parquet").load(sf_dir))


def tumbling_counts(events: DataFrame, width: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of ``events_tumbling_5min``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )


def sliding_avg(events: DataFrame, width: str = "10 minutes",
                slide: str = "5 minutes",
                watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of ``events_sliding_10min``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "n_events", "avg_value",
        )
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "30 minutes") -> DataFrame:
    """Native session windows (streaming counterpart of the lag+cumsum
    batch sessionization): per (user, session) event counts + value."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events", "session_value",
        )
    )


def stream_stream_band_join(clicks: DataFrame, purchases: DataFrame,
                            window_sec: int = 600,
                            watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream interval join: purchases within ``window_sec``
    after a click by the same user (streaming twin of the batch
    ``time_band_join``). Both sides carry watermarks so Spark can
    bound the join state: a buffered click can be dropped once the
    purchase-side watermark passes click_ts + window."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"))
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"))
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window_sec} SECONDS"))
    )
    return c.join(p, cond).select(
        "click_id", "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).cast("long")
        .alias("delay_sec"),
    )
