"""Top-k operators.

The reference's ``limit=top_k`` on ``query_points``
(``with_colpali_v1.3/qdrant_query_with_colpali.py:95,109-114``) maps to:

- global top-k: ``ORDER BY score DESC LIMIT k`` — Spark plans this as
  ``TakeOrderedAndProject`` (per-partition heap + driver merge, no full
  sort, no shuffle of the corpus). This is the single-query path and is
  scale-safe: O(k) rows per partition regardless of corpus size.
- per-group top-k (batched queries): exact window
  ``row_number() OVER (PARTITION BY group ORDER BY ...) <= k``, with an
  optional *narrow* pre-prune: a ``mapInPandas`` stage that keeps only
  the k best rows per group **within each Arrow batch** before the
  shuffle. The prune is a no-shuffle map stage, so at 1000 executors ×
  Q queries the window's shuffle moves ≤ ``batches·Q·k`` rows instead
  of ``N·Q``. The final window re-ranks exactly, so results are
  identical with or without the prune.

Determinism: callers must supply a total order (tie-break keys), else
top-k content at rank boundaries is engine-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_topk", "grouped_topk", "top_groups"]

OrderSpec = Sequence[tuple[str, bool]]  # (column name, ascending)


def _order_cols(order: OrderSpec) -> list[Column]:
    return [F.col(name) if asc else F.col(name).desc() for name, asc in order]


def global_topk(df: DataFrame, order: OrderSpec, k: int) -> DataFrame:
    """ORDER BY ... LIMIT k → TakeOrderedAndProject (no full sort)."""
    return df.orderBy(*_order_cols(order)).limit(k)


def grouped_topk(
    df: DataFrame,
    group: Sequence[str],
    order: OrderSpec,
    k: int,
    rank_col: str | None = "rank",
    local_prune: bool = False,
) -> DataFrame:
    """Exact top-k per group; optional narrow per-batch pre-prune."""
    if local_prune:
        names = [name for name, _ in order]
        asc = [a for _, a in order]
        group = list(group)
        schema = df.schema

        def prune(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf
                    continue
                yield (
                    pdf.sort_values(names, ascending=asc)
                    .groupby(group, sort=False)
                    .head(k)
                )

        df = df.mapInPandas(prune, schema=schema)

    w = Window.partitionBy(*group).orderBy(*_order_cols(order))
    ranked = df.withColumn("__rank", F.row_number().over(w)).filter(F.col("__rank") <= k)
    if rank_col:
        return ranked.withColumnRenamed("__rank", rank_col)
    return ranked.drop("__rank")


def top_groups(
    df: DataFrame,
    group: str,
    order: OrderSpec,
    limit: int,
    group_size: int,
    local_prune: bool = False,
) -> DataFrame:
    """Qdrant ``query_points_groups`` shape: keep the best
    ``group_size`` rows per group, rank groups by their best row under
    the same order, return the top ``limit`` groups' hits with a
    ``group_rank`` column.

    Two stages: (1) per-group top-``group_size`` (window shuffle on the
    group key — a skewed payload key salts via ``local_prune``'s
    map-side cap, which bounds shuffle input at ``batches·G·size``
    rows); (2) group ranking over the rank-1 representatives. Only the
    best ``limit`` reps can rank, so a ``TakeOrderedAndProject``
    (per-partition heap, no shuffle) prunes the rep frame to ``limit``
    rows FIRST — the unpartitioned row_number window then sees a
    bounded input even at millions of groups. The ≤``limit``-row
    verdict broadcasts back onto the kept hits."""
    hits = grouped_topk(df, [group], order, group_size,
                        rank_col="rank", local_prune=local_prune)
    reps = hits.filter(F.col("rank") == 1)
    pruned = reps.orderBy(*_order_cols(order)).limit(limit)
    w = Window.orderBy(*_order_cols(order))
    granked = (
        pruned.withColumn("group_rank", F.row_number().over(w))
        .select(group, "group_rank")
    )
    return hits.join(F.broadcast(granked), on=group)
