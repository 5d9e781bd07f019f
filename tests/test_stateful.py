"""Custom stateful streaming ops (applyInPandasWithState)."""

import uuid

from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.streaming.stateful import (
    streaming_dedup,
    streaming_running_totals,
)
from image_indexing_and_retrival_with_qdrant_spark.tables import load


def _dup_stream(spark, sf_smoke, tmp_path):
    """events written twice (two files) → a stream with every row
    duplicated across micro-batches."""
    src = str(tmp_path / "dup_events")
    ev = load(spark, sf_smoke, "events").limit(300)
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    ), ev


def test_streaming_dedup_drops_redelivered(spark, sf_smoke, tmp_path):
    stream, ev = _dup_stream(spark, sf_smoke, tmp_path)
    name = f"d_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(f"SELECT COUNT(*) n, COUNT(DISTINCT event_id) d FROM {name}").collect()[0]
    assert got.n == got.d == ev.count()  # every id exactly once


def test_streaming_running_totals(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "ev")
    ev = load(spark, sf_smoke, "events").limit(200)
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    name = f"r_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_running_totals(stream)
        .writeStream.outputMode("update").format("memory").queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # final state per user == batch aggregation
    want = {
        (r.user_id, r.n): round(r.s, 2)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got_rows = spark.sql(
        f"SELECT user_id, n_events, total_value FROM {name}"
    ).collect()
    got = {(r.user_id, r.n_events): r.total_value for r in got_rows}
    for k, v in want.items():
        assert got.get(k) == v
