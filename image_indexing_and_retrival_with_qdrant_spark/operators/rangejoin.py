"""Bucketized range join (pyspark guide 'As-of / range join').

Spark plans a raw inequality join as a BroadcastNestedLoopJoin —
O(n·m) comparisons. For time-band joins (``0 < r.t - l.t ≤ W``) the
standard fix is bucketization: bucket both sides by ``t div W``; a
right-side match for a left row in bucket ``b`` can only live in
buckets ``b`` or ``b+1``, so an equi-join on (key, bucket) over the
left side duplicated into its two candidate buckets finds every pair,
and the exact band predicate filters the rest. The O(n·m) nested loop
becomes one hash shuffle on (key, bucket) with ~2× left duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_band_join"]


def time_band_join(left: DataFrame, right: DataFrame, key: str,
                   left_ts: str, right_ts: str, window_sec: int) -> DataFrame:
    """Pairs (l, r) with the same ``key`` and
    ``0 < r[right_ts] - l[left_ts] <= window_sec`` (seconds columns).

    Returns the joined frame with both sides' columns (left prefixed
    ``l_``, right prefixed ``r_`` where names collide is the caller's
    concern — select before joining)."""
    lb = left.withColumn(
        "__b", F.explode(
            F.array(
                (F.col(left_ts) / window_sec).cast("long"),
                (F.col(left_ts) / window_sec).cast("long") + 1,
            )
        )
    )
    rb = right.withColumn("__b", (F.col(right_ts) / window_sec).cast("long"))
    dt = rb[right_ts] - lb[left_ts]
    return (
        lb.join(rb, (lb[key] == rb[key]) & (lb["__b"] == rb["__b"]))
        .filter((dt > 0) & (dt <= window_sec))
        .drop(rb[key])
        .drop("__b")
    )
