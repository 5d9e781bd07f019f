"""Point construction + indexing pipeline (SURVEY.md §2.2 P1–P5, §3.1).

The reference's indexing run is: scan → decode → embed → build
PointStruct (uuid4 id + payload) → batched upsert
(``incremental_indexing_colpali_with_qdrant.py:250-274``). Spark-first
this is a single lazy plan: scan → embed UDF → ``select`` of point
columns → collection write. Everything below is native column
functions — zero Python in point construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["point_id", "build_points", "index_documents"]


def point_id(deterministic_key: Column | None = None) -> Column:
    """P1: point identity. Reference behavior is ``uuid4()`` per row
    (append-duplicates, ``incremental_indexing_colpali_with_qdrant.py:258``);
    the honest default derives the id from content/path so re-runs
    merge (SURVEY.md §1.4)."""
    if deterministic_key is None:
        return F.expr("uuid()")
    return F.sha2(deterministic_key, 256)


def build_points(
    df: DataFrame,
    id_key: Column | None,
    embedding_col: str = "embedding",
    payload: dict[str, Column] | None = None,
    source_tag: str = "document",
    with_timestamp: bool = True,
) -> DataFrame:
    """P1+P3+P4+P5: id, payload merge, constant tags, ingest
    timestamp — mirrors the reference payload fields
    (``incremental_indexing_colpali_with_qdrant.py:256-269``)."""
    cols = [point_id(id_key).alias("id"), F.col(embedding_col)]
    for name, col in (payload or {}).items():
        cols.append(col.alias(name))
    cols.append(F.lit(source_tag).alias("source_tag"))
    if with_timestamp:
        cols.append(F.current_timestamp().alias("indexed_at"))
    return df.select(*cols)


def index_documents(docs: DataFrame, embedder, text_col: str = "text",
                    deterministic_ids: bool = True,
                    with_timestamp: bool = True) -> DataFrame:
    """Text-indexing pipeline (S6→E5→P1-P5 analog of
    ``jina_v4_text_indexer.py:86-142``): embed passages, build points
    with the document payload."""
    embedded = embedder.embed(docs, text_col=text_col, mode="passage")
    return build_points(
        embedded,
        id_key=F.col(text_col) if deterministic_ids else None,
        payload={
            "content": F.col(text_col),
            "doc_id": F.col("doc_id"),
        },
        source_tag="document",
        with_timestamp=with_timestamp,
    )
