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


def test_streaming_registry_queries_match_oracle(spark, sf_smoke):
    """The registered streaming twins (drained to a memory sink) are
    oracle-checked like any batch query — the driver-facing contract
    for SURVEY §2.7."""
    from tests.oracle import compare

    for name in ["stream_tumbling_5min", "stream_click_purchase_band",
                 "stream_session_windows", "stream_stateful_dedup",
                 "stream_incremental_index"]:
        compare(spark, REGISTRY[name], sf_smoke, name)


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


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a 10-min watermark: rows arriving
    after the watermark passed their window are dropped; closed
    windows emit exactly once."""
    import datetime as dt
    import os
    import time
    import uuid

    base = dt.datetime(2024, 6, 1, 0, 0, 0)

    def rows(*minutes):
        return [(base + dt.timedelta(minutes=m), "click", 1.0) for m in minutes]

    schema = "ts timestamp, event_type string, value double"
    src = str(tmp_path / "late_src")
    # batch A: 3 rows in window [00:00,00:05) + one at 01:00 that
    # advances the watermark far past that window
    spark.createDataFrame(rows(0, 1, 2, 60), schema).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    # batch B: one LATE row for the closed window + one at 02:00
    b_dir = str(tmp_path / "late_b")
    spark.createDataFrame(rows(1, 120), schema).coalesce(1).write.parquet(b_dir)

    from image_indexing_and_retrival_with_qdrant_spark.streaming.windows import (
        tumbling_counts,
    )

    stream = spark.readStream.schema(schema).parquet(src)
    name = f"w_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_counts(stream, width="5 minutes", watermark="10 minutes")
        .writeStream.outputMode("append").format("memory").queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: only A visible; watermark → 00:50
        for f in os.listdir(b_dir):  # now deliver the late batch
            if f.endswith(".parquet"):
                os.rename(os.path.join(b_dir, f), os.path.join(src, f"b_{f}"))
        q.processAllAvailable()  # batch 2: late 00:01 row vs closed window
    finally:
        q.stop()

    out = {r.window_start: r.n_events
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    w0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    # the 00:00 window closed with batch A's 3 rows; batch B's late
    # row (00:01) arrived after the watermark and was dropped
    assert out.get(w0) == 3


def test_stream_stream_band_join_matches_batch(spark, sf_smoke):
    """Stream-stream interval join equals the oracle-checked batch
    range join on the same data."""
    import uuid

    from image_indexing_and_retrival_with_qdrant_spark.streaming.windows import (
        stream_stream_band_join,
    )

    ev = stream_events(spark, sf_smoke)
    clicks = ev.filter(ev.event_type == "click")
    purchases = ev.filter(ev.event_type == "purchase")
    name = f"ss_{uuid.uuid4().hex[:8]}"
    q = (
        stream_stream_band_join(clicks, purchases)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {
        tuple(r)
        for r in REGISTRY["events_click_purchase_band"].builder(spark, sf_smoke).collect()
    }
    assert got == want


def test_streaming_ingest_triggers_auto_index(spark, sf_smoke, tmp_path):
    """The streaming MERGE path composes with indexing_threshold: a
    micro-batch that crosses the threshold builds the IVF layout, the
    next batch extends it incrementally (no retrain), and routed
    search works over streamed points."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_smoke, "documents").dropDuplicates(["text"])
    batch1 = str(tmp_path / "in1")
    docs.limit(60).write.parquet(batch1)
    schema = spark.read.parquet(batch1).schema

    coll = create_collection(str(tmp_path / "colls"), "docs", dim=8,
                             normalize=False, indexing_threshold=50,
                             k_centroids=4)
    q = incremental_index_stream(
        spark, spark.readStream.schema(schema).parquet(batch1), coll,
        HashEmbedder(dim=8), str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert coll.has_index()  # 60 > threshold=50
    cents = coll._centroids(spark)

    # stream a second disjoint batch into the same collection
    docs.filter(~docs.text.isin(
        [r.text for r in docs.limit(60).collect()]
    )).limit(40).write.mode("overwrite").parquet(str(tmp_path / "in2"))
    q = incremental_index_stream(
        spark, spark.readStream.schema(schema).parquet(str(tmp_path / "in2")),
        coll, HashEmbedder(dim=8), str(tmp_path / "ck2"))
    q.awaitTermination(120)

    coll._centroid_cache = None
    assert coll._centroids(spark) == cents  # incremental, no retrain
    layout = spark.read.parquet(coll._ivf_points)
    assert layout.count() == coll.count(spark)

    qv = list(coll.read(spark).limit(1).collect()[0].embedding)
    hits = coll.search(spark, qv, k=3, nprobe=2).collect()
    assert 0 < len(hits) <= 3


def test_streaming_ingest_maintains_quant_codes(spark, sf_smoke, tmp_path):
    """The streaming MERGE path composes with quantization_config: each
    micro-batch's points land in the codes sidecar (SQ params frozen
    after the first build), and quantized search works over streamed
    points."""
    docs = load(spark, sf_smoke, "documents").dropDuplicates(["text"])
    batch1 = str(tmp_path / "in1")
    docs.limit(50).write.parquet(batch1)
    schema = spark.read.parquet(batch1).schema

    coll = create_collection(str(tmp_path / "colls"), "qdocs", dim=8,
                             normalize=False, quantization="sq")
    q = incremental_index_stream(
        spark, spark.readStream.schema(schema).parquet(batch1), coll,
        HashEmbedder(dim=8), str(tmp_path / "ck1"))
    q.awaitTermination(120)
    codes = spark.read.parquet(coll._codes_path)
    assert codes.count() == coll.count(spark) == 50
    mins1 = list(coll.meta["sq_mins"])

    docs.filter(~docs.text.isin(
        [r.text for r in docs.limit(50).collect()]
    )).limit(30).write.parquet(str(tmp_path / "in2"))
    q = incremental_index_stream(
        spark, spark.readStream.schema(schema).parquet(str(tmp_path / "in2")),
        coll, HashEmbedder(dim=8), str(tmp_path / "ck2"))
    q.awaitTermination(120)

    assert list(coll.meta["sq_mins"]) == mins1  # params frozen
    assert spark.read.parquet(coll._codes_path).count() == coll.count(spark) == 80

    qv = list(coll.read(spark).limit(1).collect()[0].embedding)
    approx = coll.search(spark, qv, k=3, oversampling=30.0).collect()
    exact = coll.search(spark, qv, k=3, exact=True).collect()
    assert [(r.id, r.score) for r in approx] == [(r.id, r.score) for r in exact]
