"""Physical-plan inspection helpers (SURVEY.md §4).

Used by tests and bench to pin the *shape* of the plans, not just
their results: filters pushed into scans, broadcast joins where a side
is small, TakeOrderedAndProject instead of global sorts, bounded
exchange counts. A plan regression at sf0.001 is the same regression
at 100 TB — this is the cheapest scale test we have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["formatted_plan", "exchange_count", "pushed_filters"]


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def exchange_count(plan: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith(("Exchange", "+- Exchange"))
        or " Exchange" in line.split("(")[0]
    )


def pushed_filters(plan: str) -> list[str]:
    return [
        line.strip()
        for line in plan.splitlines()
        if line.strip().startswith("PushedFilters") and "[]" not in line
    ]
