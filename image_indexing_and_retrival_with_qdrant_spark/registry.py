"""Query registry: name → (Spark builder, DuckDB oracle SQL).

Every implemented operator from SURVEY.md §2 gets an entry here; the
driver runs the Spark builder and the oracle SQL side-by-side at
sf=0.01 and compares row-count + schema + order-insensitive value
hashes. Conventions (FIXTURES.md §4):

- scores/ratios are computed in double precision and rounded (6 dp)
  on BOTH sides, so value hashes are stable;
- where a ratio can land on an exact 7th-digit 5 (cume_dist,
  averages of 2-decimal fixtures), round via ``floor(x*1e6+0.5)/1e6``
  on both sides instead of ROUND — Spark's F.round HALF_UPs the
  shortest decimal repr while DuckDB rounds the binary value, and
  they split exactly on those halves (first hit at sf0.1);
- every top-k has a total order: ``(score DESC, id ASC)``;
- aggregate/computed columns carry identical aliases on both sides;
- DuckDB integer aggregates are cast to BIGINT (DuckDB SUM(int) is
  HUGEINT, Spark's is long); row_number is cast to INTEGER;
- timestamps never appear raw in outputs — epoch seconds (BIGINT) do.

Since round 6 EVERY entry is oracle-backed (``oracle=None`` is
reserved for genuinely non-deterministic results, of which there are
currently none): approximate-by-construction outputs (the HLL/quantile
sketches) return exact values plus deterministic within-documented-
bounds booleans the oracle asserts TRUE — sketches are hash-based and
deterministic for fixed data, so the contract is value-checkable even
where the sketch internals are engine-specific; every registered ANN
tier probes deterministic kmeans_np layouts and carries a full value
oracle (the Spark-ML-KMeans-trained variants are pytest-only); pytest
holds the stronger recall/behavior assertions. Streaming twins
ARE oracle-backed — they drain a bounded stream to a memory sink and
return its rows (queries/streaming.py). An oracle may also be a
FACTORY ``Callable[[sf_dir], str]`` for SQL that embeds data-derived
constants (the deterministic kmeans_np centroids/codebooks): resolved
per checked sf via ``Entry.oracle_for`` — the driver's
``oracle_sql()`` resolves at sf0.01.

Query builders live in the ``queries/`` subpackage, one module per
operator family; importing this module populates the registry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Entry:
    builder: Callable[[SparkSession, str], DataFrame]
    # str: static SQL. Callable[[sf_dir], str]: an ORACLE FACTORY for
    # oracles that embed data-derived constants (e.g. the
    # deterministically-trained IVF centroids) — resolved with the
    # sf_dir being checked (__spark_entry__.oracle_sql resolves at the
    # driver's sf0.01; tests/oracle.compare at its own sf).
    oracle: Optional[str | Callable[[str], str]]

    def oracle_for(self, sf_dir: str) -> Optional[str]:
        return self.oracle(sf_dir) if callable(self.oracle) else self.oracle


REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Entry(fn, oracle)
        return fn
    return deco


# Populate (import order = display order). Bottom of module so the
# builders can `from ..registry import register`.
from .queries import (  # noqa: E402,F401
    advanced,
    ann,
    bm25,
    cdc,
    colbert,
    dedup,
    discover,
    events,
    formula,
    hnsw,
    hybrid,
    ingest,
    knn,
    maxsim,
    pipeline,
    quality,
    relational,
    scale,
    sparse,
    sql_surface,
    streaming,
    text,
)
