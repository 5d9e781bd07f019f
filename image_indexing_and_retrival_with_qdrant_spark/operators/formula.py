"""Formula-based score boosting (Qdrant "score boosting" / FormulaQuery).

Qdrant's universal query API can rescore a prefetch shortlist with an
arbitrary formula over the prescore and payload fields — weighted
sums, arithmetic, and the standard decay-function family
(lin/exp/gauss, the same trio Elasticsearch ``function_score``
popularized): each decay maps ``|x − target|`` into ``[0, 1]``,
equal to 1 at ``x = target`` and to ``midpoint`` at
``|x − target| = scale``. The reference's searchers stop at plain
``query_points`` (e.g. ``with_vdr-2b-multi-v1/query_vdr_2b_multi_v1.py:78-83``),
but the server API they call supports formula rescoring; a user
switching engines keeps it.

Spark-first shape: the formula is ONE Catalyst projection over the
(tiny, already-top-N) shortlist — no UDF, no extra scan, no shuffle
beyond the final ≤N-row top-k. The decay helpers render plain SQL
strings valid in BOTH Spark and DuckDB (constants folded driver-side
to repr'd float64 literals, explicit casts, no engine-specific
functions), so a registry query and its oracle share the exact same
formula text — the parity argument is "same SQL, same doubles", not a
re-derivation.

At 100 TB: rescoring cost is O(shortlist), independent of corpus
size; the prefetch tier (exact scan, IVF probe, BM25, …) does the
heavy lifting. Boosting never touches the corpus-sized path.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import global_topk

__all__ = ["lin_decay_sql", "exp_decay_sql", "gauss_decay_sql",
           "formula_rescore"]


def _x(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


def lin_decay_sql(x: str, target: float, scale: float,
                  midpoint: float = 0.5) -> str:
    """``max(0, 1 − (1−midpoint)/scale · |x − target|)`` — reaches 0 at
    ``|x − target| = scale/(1−midpoint)``. The slope is folded to one
    float64 literal so Spark and DuckDB evaluate the identical
    expression."""
    if not 0.0 < midpoint < 1.0:
        raise ValueError("midpoint must be in (0, 1)")
    slope = -(1.0 - float(midpoint)) / float(scale)
    return (f"GREATEST(0.0, 1.0 + ({slope!r}) * "
            f"ABS({_x(x)} - ({float(target)!r})))")


def exp_decay_sql(x: str, target: float, scale: float,
                  midpoint: float = 0.5) -> str:
    """``exp(ln(midpoint)/scale · |x − target|)`` — never reaches 0."""
    if not 0.0 < midpoint < 1.0:
        raise ValueError("midpoint must be in (0, 1)")
    lam = math.log(float(midpoint)) / float(scale)
    return f"EXP(({lam!r}) * ABS({_x(x)} - ({float(target)!r})))"


def gauss_decay_sql(x: str, target: float, scale: float,
                    midpoint: float = 0.5) -> str:
    """``exp(ln(midpoint)/scale² · (x − target)²)`` — bell-shaped,
    flat near the target. The square is an explicit self-multiply
    (no POWER), keeping both engines on the same float64 ops."""
    if not 0.0 < midpoint < 1.0:
        raise ValueError("midpoint must be in (0, 1)")
    lam = math.log(float(midpoint)) / (float(scale) * float(scale))
    d = f"({_x(x)} - ({float(target)!r}))"
    return f"EXP(({lam!r}) * ({d} * {d}))"


def formula_rescore(shortlist: DataFrame, formula: str | Column,
                    k: int = 5, id_col: str = "vec_id",
                    boosted_col: str = "boosted",
                    payload_cols: Sequence[str] = (),
                    round_digits: int | None = 6) -> DataFrame:
    """Rescore a prefetch shortlist with ``formula`` (a SQL string over
    the shortlist's columns — typically ``score`` plus payload fields —
    or a prebuilt Column), then re-rank top-k by
    ``(boosted DESC, id ASC)``.

    A SQL-string formula is parsed in one JVM call (``F.expr``) and is
    directly reusable as the oracle's formula text. The input is an
    already-bounded shortlist, so the top-k runs on ≤|shortlist| rows
    — TakeOrderedAndProject, no exchange of the corpus.
    """
    boosted = F.expr(formula) if isinstance(formula, str) else formula
    if round_digits is not None:
        boosted = F.round(boosted, round_digits)
    out = shortlist.select(
        F.col(id_col), *payload_cols, boosted.alias(boosted_col))
    return global_topk(out, [(boosted_col, False), (id_col, True)], k)
