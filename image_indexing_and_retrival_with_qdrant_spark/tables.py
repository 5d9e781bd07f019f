"""Fixture-table loaders.

The driver materializes TPC-H-ish + vector fixture tables as parquet
under ``/root/testdata/sf*/`` (see TESTDATA.md / FIXTURES.md). All
operators take DataFrames, so these loaders are the only place that
knows the on-disk layout. Reading via ``spark.read.parquet`` keeps
predicate pushdown / column pruning available to Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}")
    if name == "events":
        # Fixture generations have stored ts as TIMESTAMP(NANOS) (which
        # Spark's parquet reader rejects without nanosAsLong) or as
        # TIMESTAMP(MICROS). Handle both: enable nanosAsLong, and only
        # apply the nanos->micros conversion when ts actually read back
        # as a long (integer div — no double rounding). Set at runtime
        # so it works under the driver's own session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
