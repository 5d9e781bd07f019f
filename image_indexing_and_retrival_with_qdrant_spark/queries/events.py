"""Event-stream analytics in batch form (SURVEY.md §2.7 / §7 M6).

The reference has no streaming surface; these queries give the engine
the windowed/sessionized/JSON-payload operators a training-data
pipeline needs. Each has a Structured-Streaming twin in
``streaming/windows.py`` (same logical plan over ``readStream``);
the batch form is the oracle-checkable one.

Epoch discipline: Spark ``unix_timestamp`` truncates to whole seconds;
the oracle uses ``CAST(floor(epoch(ts)) AS BIGINT)`` to match. Window
bucket = ``floor(sec / width) * width`` is truncation-stable (a
fractional second never changes the bucket). Session gaps compare
whole-second deltas on both sides. Window starts are emitted as epoch
BIGINT, never raw timestamps.

``events.props`` is a JSON string — the engine's analog of Qdrant's
schemaless payload (SURVEY.md §1.1): ``get_json_object`` ↔
``json_extract``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "events_tumbling_5min",
    """
    SELECT CAST(floor(floor(epoch(ts)) / 300) * 300 AS BIGINT) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows via native F.window (streaming-ready
    shape; window.start re-emitted as epoch for oracle parity)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding_10min",
    """
    SELECT CAST(floor(floor(epoch(e.ts)) / 300) * 300 - s.i * 300 AS BIGINT) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR(AVG(e.value) * 1000000 + 0.5) / 1000000 AS avg_value
    FROM events e CROSS JOIN generate_series(0, 1) AS s(i)
    GROUP BY 1
    """,
)
def events_sliding_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min size, 5 min slide): every event lands in
    two buckets; F.window handles replication natively.

    Rounding note: avg_value rounds via ``floor(x·10⁶ + 0.5)/10⁶`` on
    BOTH sides — pure double math, bit-identical across engines.
    ``ROUND`` is not: Spark's F.round converts the double's shortest
    decimal repr to BigDecimal then HALF_UPs, DuckDB rounds the binary
    value, and a shortest-repr ending in an exact 7th-digit 5 (one
    sf0.1 window hits 48.3478125) splits them."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6)
            .alias("avg_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


@register(
    "events_sessionization",
    """
    WITH seq AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
                     THEN 1 ELSE 0 END AS is_new
      FROM seq
    ),
    sess AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(sec) - MIN(sec) AS BIGINT) AS duration_sec,
           ROUND(SUM(value), 2) AS session_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative-sum —
    the classic batch formulation; streaming twin uses
    ``session_window`` (streaming/windows.py). Deterministic order:
    (ts, event_id)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp("ts")
    )
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_sec", F.lag("sec").over(w_order)).withColumn(
        "is_new",
        F.when(
            F.col("prev_sec").isNull() | (F.col("sec") - F.col("prev_sec") > 1800), 1
        ).otherwise(0),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = flagged.withColumn(
        "session_id", F.sum("is_new").over(w_cum).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("sec") - F.min("sec")).cast("long").alias("duration_sec"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@register(
    "events_json_payload",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract(props, '$.k') AS INTEGER)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless-payload access (Qdrant payload analog, SURVEY.md
    §1.1): JSON string column → typed field → aggregate."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("long").alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


@register(
    "events_user_daily_activity",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS BIGINT) AS purchasers
    FROM events
    GROUP BY 1
    """,
)
def events_user_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + conditional distinct (purchasers/day)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.countDistinct("user_id").alias("active_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("purchasers"),
    )


# ---- DatetimeRange filter (round 7) --------------------------------
# Qdrant's DatetimeRange condition (ISO-8601 bounds) as a DSL filter
# over the events timestamp. Whole-microsecond bounds are safe across
# the NANOS fixture: floor-truncation to micros preserves >= / <
# against any whole-microsecond boundary (tables.normalize_events_ts).
from ..filters import FieldCondition, Filter  # noqa: E402

_DT_DSL = Filter(
    must=[FieldCondition("ts", datetime_range={
        "gte": "2024-01-10 00:00:00", "lt": "2024-01-20 00:00:00"}),
          FieldCondition("event_type", match_except=["error"])],
)


@register(
    "events_datetime_filter_dsl",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE {_DT_DSL.to_sql()}
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_datetime_filter_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type activity inside a ``DatetimeRange`` DSL window (plus a
    ``MatchExcept`` on the type). The compiled predicate is a plain
    timestamp comparison — on date-partitioned event logs it prunes
    partitions statically, which is the whole point of the condition
    at 100 TB."""
    ev = load(spark, sf_dir, "events")
    return (ev.filter(_DT_DSL.to_column())
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                   F.countDistinct("user_id").cast("long").alias("n_users"))
              .orderBy("event_type"))
