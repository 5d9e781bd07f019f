"""Exactly-once incremental indexing (SURVEY.md §2.7).

Fixes the reference's duplicate-on-rerun behavior (append-only with
fresh uuid4 ids, SURVEY.md §1.4): a checkpointed file-arrival stream
feeds the embed→point-build pipeline, and ``foreachBatch`` upserts
with content-keyed MERGE semantics — re-delivered or re-appearing
documents never duplicate points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Collection
from ..sources.ingest import index_documents

__all__ = ["incremental_index_stream"]


def incremental_index_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    collection: Collection,
    embedder,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Start a streaming indexing job: every micro-batch is embedded,
    point-built, and MERGE-upserted into the collection. Returns the
    StreamingQuery (caller stops it)."""

    def upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        points = index_documents(
            batch_df, embedder, text_col=text_col,
            deterministic_ids=True, with_timestamp=True,
        )
        collection.upsert(spark, points, mode="merge")

    return (
        docs_stream.writeStream
        .foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
