"""CDC / SCD2 emulation without a MERGE-capable table format
(pyspark guide 'CDC / SCD2': anti-join + union + window).

``scd2_apply`` takes the current dimension state and an update batch
and produces the next state: changed/new keys get a fresh
``version`` row flagged current, superseded rows keep their history
with ``is_current = false``. With Delta/Iceberg this is MERGE INTO;
the plain-parquet formulation is two joins on the key — at scale the
update batch is usually the small side, so the whole pass is one scan
of the current table with broadcast hash joins.

This is the corpus-refresh pattern for training-data pipelines:
re-crawled documents supersede old versions while dedup/lineage keeps
pointing at stable keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(current: DataFrame, updates: DataFrame, key: str,
               compare_col: str, version_col: str = "version",
               current_col: str = "is_current") -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``current``: (key, compare_col, version, is_current);
    ``updates``: (key, compare_col). A key is *changed* if absent from
    the live state or its compare_col differs from the live row.
    """
    live = current.filter(F.col(current_col)).select(
        F.col(key).alias("__lk"),
        F.col(compare_col).alias("__lc"),
        F.col(version_col).alias("__lv"),
    )
    changed = (
        updates.join(live, updates[key] == F.col("__lk"), "left")
        # null-safe inequality: x→NULL and NULL→x are changes too
        # (plain != would silently drop them)
        .filter(~F.col("__lc").eqNullSafe(updates[compare_col]))
        .select(
            updates[key].alias(key),
            updates[compare_col].alias(compare_col),
            F.coalesce(F.col("__lv"), F.lit(0)).alias("__prev_v"),
        )
    )
    # distinct: duplicate keys in one batch must not fan out current rows
    ch_keys = changed.select(F.col(key).alias("__ck")).distinct()
    closed = (
        current.join(F.broadcast(ch_keys), current[key] == F.col("__ck"), "left")
        .select(
            *[current[c] for c in current.columns if c != current_col],
            (current[current_col] & F.col("__ck").isNull()).alias(current_col),
        )
    )
    new_rows = changed.select(
        F.col(key),
        F.col(compare_col),
        (F.col("__prev_v") + 1).cast("int").alias(version_col),
        F.lit(True).alias(current_col),
    )
    return closed.unionByName(new_rows)
