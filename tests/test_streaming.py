"""Streaming twins equal their oracle-checked batch counterparts."""

import uuid

from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
from image_indexing_and_retrival_with_qdrant_spark.sources.embedder import HashEmbedder
from image_indexing_and_retrival_with_qdrant_spark.streaming.incremental import (
    incremental_index_stream,
)
from image_indexing_and_retrival_with_qdrant_spark.streaming.windows import (
    session_aggregate,
    stream_events,
    tumbling_counts,
)
from image_indexing_and_retrival_with_qdrant_spark.tables import load


def _run_to_memory(stream_df, name, mode="complete"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory").queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_tumbling_matches_batch(spark, sf_smoke):
    name = f"t_{uuid.uuid4().hex[:8]}"
    _run_to_memory(tumbling_counts(stream_events(spark, sf_smoke)), name)
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {
        tuple(r)
        for r in REGISTRY["events_tumbling_5min"].builder(spark, sf_smoke).collect()
    }
    assert got == want


def test_streaming_sessions_cover_all_events(spark, sf_smoke):
    name = f"s_{uuid.uuid4().hex[:8]}"
    _run_to_memory(session_aggregate(stream_events(spark, sf_smoke)), name)
    total = spark.sql(f"SELECT CAST(SUM(n_events) AS BIGINT) n FROM {name}").collect()[0].n
    assert total == load(spark, sf_smoke, "events").count()
    # session count matches the oracle-checked batch sessionization
    batch_sessions = REGISTRY["events_sessionization"].builder(spark, sf_smoke).count()
    stream_sessions = spark.sql(f"SELECT COUNT(*) n FROM {name}").collect()[0].n
    assert stream_sessions == batch_sessions


def test_incremental_index_exactly_once(spark, sf_smoke, tmp_path):
    """Streaming MERGE ingest: restarts and re-runs never duplicate
    (the honest fix for SURVEY.md §1.4)."""
    docs_path = str(tmp_path / "docs_in")
    load(spark, sf_smoke, "documents").limit(100).write.parquet(docs_path)
    schema = spark.read.parquet(docs_path).schema

    coll = create_collection(str(tmp_path / "colls"), "docs", dim=8)
    ckpt = str(tmp_path / "ckpt")

    for _ in range(2):  # second run = restart from checkpoint, no new files
        stream = spark.readStream.schema(schema).parquet(docs_path)
        q = incremental_index_stream(
            spark, stream, coll, HashEmbedder(dim=8), ckpt
        )
        q.awaitTermination(120)
    assert coll.count(spark) == 100

    # re-deliver the same content under a fresh checkpoint: merge-dedup
    stream = spark.readStream.schema(schema).parquet(docs_path)
    q = incremental_index_stream(
        spark, stream, coll, HashEmbedder(dim=8), str(tmp_path / "ckpt2")
    )
    q.awaitTermination(120)
    assert coll.count(spark) == 100
