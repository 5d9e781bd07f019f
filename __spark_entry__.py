"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (dense cosine top-5) on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 via the registry in
``image_indexing_and_retrival_with_qdrant_spark.registry``.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["knn_dense_top5"].builder(spark, "/root/testdata/sf0.001")


def _stamped() -> set[str]:
    """Names already value-checked by a prior round's driver run
    (CORRECTNESS_r*.json) — used only to ORDER ``queries()`` so
    never-yet-stamped entries come first and per-round sampling
    rotates through the whole registry instead of re-drawing the same
    prefix. Purely an ordering hint: content is identical either way."""
    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                seen.update(json.load(f).keys())
        except Exception:
            continue
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    seen = _stamped()
    pos = {name: i for i, name in enumerate(REGISTRY)}
    ordered = sorted(REGISTRY, key=lambda n: (n in seen, pos[n]))
    return {name: REGISTRY[name].builder for name in ordered}


def oracle_sql() -> dict[str, str]:
    # factory oracles (data-derived constants) resolve at the driver's
    # correctness SF
    return {name: e.oracle_for("/root/testdata/sf0.01")
            for name, e in REGISTRY.items() if e.oracle is not None}
