"""CDC/SCD2 + range-join queries (corpus-refresh and time-band
patterns for training-data pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import scd2_apply
from ..operators.rangejoin import time_band_join
from ..registry import register
from ..tables import load


@register(
    "scd2_corpus_refresh",
    """
    WITH cur AS (
      SELECT doc_id, text, CAST(1 AS INTEGER) AS version, TRUE AS is_current
      FROM documents
    ),
    upd AS (
      SELECT doc_id, text || ' (rev2)' AS text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 1  -- unchanged
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, 'fresh crawl ' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id % 100 = 2
    ),
    live AS (SELECT doc_id AS lk, text AS lc, version AS lv FROM cur WHERE is_current),
    changed AS (
      SELECT u.doc_id, u.text, COALESCE(l.lv, 0) AS prev_v
      FROM upd u LEFT JOIN live l ON u.doc_id = l.lk
      WHERE u.text IS DISTINCT FROM l.lc
    ),
    closed AS (
      SELECT c.doc_id, c.text, c.version,
             (c.is_current AND ch.doc_id IS NULL) AS is_current
      FROM cur c LEFT JOIN (SELECT DISTINCT doc_id FROM changed) ch
        ON c.doc_id = ch.doc_id
    ),
    new_rows AS (
      SELECT doc_id, text, CAST(prev_v + 1 AS INTEGER) AS version, TRUE AS is_current
      FROM changed
    ),
    final AS (
      SELECT * FROM closed UNION ALL SELECT * FROM new_rows
    )
    SELECT doc_id, md5(text) AS content_hash, version, is_current FROM final
    """,
)
def scd2_corpus_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 corpus refresh: 10% of docs re-crawled with changed text,
    10% re-crawled unchanged (no-op), 1% brand new. History rows keep
    version 1 with is_current=false; changes/new get version+1."""
    docs = load(spark, sf_dir, "documents")
    current = docs.select(
        "doc_id", "text",
        F.lit(1).cast("int").alias("version"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.concat(F.col("text"), F.lit(" (rev2)")).alias("text"))
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).select("doc_id", "text")
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 100 == 2).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.lit("fresh crawl "),
                         F.col("doc_id").cast("string")).alias("text"),
            )
        )
    )
    out = scd2_apply(current, updates, key="doc_id", compare_col="text")
    return out.select(
        "doc_id", F.md5("text").alias("content_hash"), "version", "is_current"
    )


@register(
    "events_click_purchase_band",
    """
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, CAST(floor(epoch(ts)) AS BIGINT) AS c_sec
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_sec
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.click_id, p.purchase_id,
           CAST(p.p_sec - c.c_sec AS BIGINT) AS delay_sec
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id
     AND p.p_sec - c.c_sec > 0 AND p.p_sec - c.c_sec <= 600
    """,
)
def events_click_purchase_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: purchases within 10 minutes after a click by the
    same user — bucketized equi-join (operators/rangejoin.py), not the
    O(n·m) nested loop the raw inequality predicate would plan. The
    oracle is the plain inequality join, proving the bucketization
    finds exactly the same pairs."""
    ev = load(spark, sf_dir, "events").withColumn("sec", F.unix_timestamp("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("sec").alias("c_sec")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("sec").alias("p_sec"),
    )
    joined = time_band_join(clicks, purchases, key="user_id",
                            left_ts="c_sec", right_ts="p_sec", window_sec=600)
    return joined.select(
        "click_id", "purchase_id",
        (F.col("p_sec") - F.col("c_sec")).cast("long").alias("delay_sec"),
    )
