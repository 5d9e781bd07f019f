"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.7 upgrade path; guide: 'custom stateful operators').

``streaming_dedup``: exactly-once *semantic* dedup inside the stream —
emits only the first occurrence of each id per key group, holding the
seen-id set as typed group state. This is the streaming analog of the
MERGE ingest mode: where foreachBatch dedups against the *sink*,
this dedups in-flight (useful when the sink is append-only, e.g. a
message bus or immutable object store).

State growth: the seen-id set is unbounded by design here (exact
dedup); production variants bound it with event-time TTL
(ProcessingTimeTimeout + watermark) or swap the set for a Bloom
filter column once the per-key cardinality passes a threshold.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_dedup", "streaming_running_totals"]


def streaming_dedup(events: DataFrame, key_col: str = "user_id",
                    id_col: str = "event_id") -> DataFrame:
    """Keep the first occurrence of each ``id_col`` per ``key_col``."""
    out_schema = events.schema
    cols = [f.name for f in events.schema.fields]

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen)].drop_duplicates([id_col])
            seen.update(fresh[id_col].tolist())
            if len(fresh):
                yield fresh[cols]
        state.update((sorted(seen),))

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="ids array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_running_totals(events: DataFrame, key_col: str = "user_id",
                             value_col: str = "value") -> DataFrame:
    """Per-key running totals across micro-batches (typed state:
    count + sum), emitted once per batch per active key."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(s, 2)]}
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
