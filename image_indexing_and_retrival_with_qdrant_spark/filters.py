"""Qdrant ``Filter`` DSL → Catalyst predicate compiler.

The reference passes ``query_filter=Filter(...)`` on every
``query_points`` call (declared-unused, SURVEY.md §2.3 F4 —
``qdrant_query_with_colpali.py:109-114``); Qdrant's public filter
model is boolean clauses over field conditions:

- ``must``      — every condition matches (AND)
- ``should``    — at least one matches (OR); combined with ``must``,
                  both constraints apply
- ``must_not``  — none matches (NOT OR)

and ``FieldCondition`` with ``match`` (exact value), ``match_any``
(IN), ``match_except`` (NOT IN, missing-field matches — Qdrant's
``MatchExcept`` ≡ ``must_not MatchAny``), ``match_text`` (token
containment), ``range`` (gt/gte/lt/lte), ``is_null``, ``is_empty``
(missing or zero-length array — ``IsEmptyCondition``), and
``values_count`` (bounds on the element count of an array field).
Clauses nest (a ``Filter`` is itself a condition); ``min_should``
(at least ``min_count`` of the listed conditions hold) and the
point-id selector ``HasId`` complete the public model. ``Nested``
scopes a sub-filter to a *single element* of an ``array<struct>``
payload field (Qdrant nested-object filters: all inner conditions
must hold on the same element, which plain dotted keys cannot
express).

Two compilers, one tree:

- ``to_column()`` — a Spark ``Column`` predicate. Compiled filters are
  ordinary Catalyst expressions, so they push down into the parquet
  scan exactly like hand-written ``F.col`` predicates (plan-pinned in
  tests/test_plans.py for the F4 path).
- ``to_sql()`` — the same predicate as an ANSI-SQL string, so a
  registry query built from a DSL object gets its DuckDB oracle twin
  from the *same tree* — the filter semantics are oracle-checked, not
  just mirrored by hand.

Scale: a compiled filter is a pre-score scan predicate — it prunes
*before* any scoring or shuffle, which is precisely what Qdrant's
filterable-index does; no extra machinery needed at 100 TB.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["FieldCondition", "Filter", "HasId", "Nested", "as_predicate"]


def _sql_lit(v: Any) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return repr(v)


_EARTH_R_M = 6371000.0  # mean earth radius (haversine convention)


def _ring_edges(ring: Sequence[dict]) -> list[tuple]:
    """Closed-ring edges as precomputed floats ``(yi, xi, dy, dx)``.
    The deltas are computed HERE (driver-side) so the Column and SQL
    compilers embed bit-identical constants."""
    pts = [(float(p["lat"]), float(p["lon"])) for p in ring]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]  # accept GeoJSON-style explicitly closed rings
    if len(pts) < 3:
        raise ValueError("polygon ring needs at least 3 distinct points")
    out = []
    for i in range(len(pts)):
        (yi, xi), (yj, xj) = pts[i], pts[(i + 1) % len(pts)]
        out.append((yi, xi, yj - yi, xj - xi))
    return out


def _ring_contains_col(c: Column, ring: Sequence[dict]) -> Column:
    """Even-odd ray casting: odd number of edges crossed by the
    eastward ray from the point → inside. Horizontal edges are
    guarded out; the division's by-zero branch is unreachable (and
    null/inf under either engine folds to FALSE through the guard)."""
    lat, lon = c["lat"], c["lon"]
    crossings = None
    for yi, xi, dy, dx in _ring_edges(ring):
        guard = (F.lit(yi) > lat) != (F.lit(yi + dy) > lat)
        xcross = lon < F.lit(dx) * (lat - F.lit(yi)) / F.lit(dy) + F.lit(xi)
        term = F.when(guard & xcross, F.lit(1)).otherwise(F.lit(0))
        crossings = term if crossings is None else crossings + term
    return crossings % 2 == 1


def _ring_contains_sql(k: str, ring: Sequence[dict]) -> str:
    terms = []
    for yi, xi, dy, dx in _ring_edges(ring):
        guard = f"(({yi!r} > {k}.lat) <> ({(yi + dy)!r} > {k}.lat))"
        xcross = f"({k}.lon < {dx!r} * ({k}.lat - {yi!r}) / {dy!r} + {xi!r})"
        terms.append(f"CASE WHEN {guard} AND {xcross} THEN 1 ELSE 0 END")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


@dataclass(frozen=True)
class FieldCondition:
    """One field predicate (Qdrant ``FieldCondition``). Geo conditions
    expect ``key`` to name a struct column with ``lat``/``lon`` double
    fields (the columnar reading of Qdrant's GeoPoint payload):

    - ``geo_radius={"lat": .., "lon": .., "radius_m": ..}`` — great-
      circle (haversine) distance within ``radius_m`` meters.
    - ``geo_bounding_box={"top_left": {"lat","lon"}, "bottom_right":
      {"lat","lon"}}`` — axis-aligned lat/lon box.
    - ``geo_polygon={"exterior": [{"lat","lon"}, ...], "interiors":
      [[...], ...]}`` — point-in-polygon (even-odd ray casting over
      the literal vertex ring, holes subtracted), Qdrant GeoPolygon.
    """

    key: str
    match: Any = None
    match_any: Sequence[Any] | None = None
    match_except: Sequence[Any] | None = None
    match_text: str | None = None
    range: dict | None = None
    datetime_range: dict | None = None
    is_null: bool | None = None
    is_empty: bool | None = None
    values_count: dict | None = None
    geo_radius: dict | None = None
    geo_bounding_box: dict | None = None
    geo_polygon: dict | None = None

    def to_column(self, base: Column | None = None) -> Column:
        c = F.col(self.key) if base is None else base[self.key]
        preds: list[Column] = []
        if self.match is not None:
            preds.append(c == F.lit(self.match))
        if self.match_any is not None:
            preds.append(c.isin(list(self.match_any)))
        if self.match_except is not None:
            # MatchExcept ≡ must_not MatchAny: a missing field matches
            preds.append(c.isNull() | ~c.isin(list(self.match_except)))
        if self.match_text is not None:
            # Qdrant MatchText: EVERY \w+ token of the query string
            # must appear in the field (AND-of-tokens over the word
            # tokenizer). re.ASCII mirrors Java/RE2 \w (ASCII-only) so
            # the driver-side split agrees with both engines' regexes.
            from .functions.text import tokens
            qtoks = _re.findall(r"\w+", self.match_text, _re.ASCII)
            if not qtoks:
                raise ValueError("match_text with no word tokens")
            for t in qtoks:
                preds.append(F.array_contains(tokens(c), t))
        if self.range is not None:
            ops = {"gt": c.__gt__, "gte": c.__ge__,
                   "lt": c.__lt__, "lte": c.__le__}
            for op, bound in self.range.items():
                preds.append(ops[op](F.lit(bound)))
        if self.datetime_range is not None:
            # Qdrant DatetimeRange: ISO-8601 bounds against a
            # timestamp column; the cast-to-timestamp literal keeps
            # the comparison partition-prunable on ts-partitioned data
            ops = {"gt": c.__gt__, "gte": c.__ge__,
                   "lt": c.__lt__, "lte": c.__le__}
            for op, bound in self.datetime_range.items():
                preds.append(ops[op](F.to_timestamp(F.lit(str(bound)))))
        if self.is_null is not None:
            preds.append(c.isNull() if self.is_null else c.isNotNull())
        if self.is_empty is not None:
            # array-field semantics: missing or zero-length list (the
            # when-guard is conf-independent — size(NULL) is -1 or NULL
            # depending on spark.sql.legacy.sizeOfNull)
            n = F.when(c.isNull(), F.lit(0)).otherwise(F.size(c))
            preds.append(n <= 0 if self.is_empty else n > 0)
        if self.values_count is not None:
            n = F.when(c.isNull(), F.lit(0)).otherwise(F.size(c))
            vops = {"gt": n.__gt__, "gte": n.__ge__,
                    "lt": n.__lt__, "lte": n.__le__}
            for op, bound in self.values_count.items():
                preds.append(vops[op](F.lit(int(bound))))
        if self.geo_radius is not None:
            g = self.geo_radius
            lat, lon = c["lat"], c["lon"]
            dphi = F.radians(lat - F.lit(g["lat"]))
            dlmb = F.radians(lon - F.lit(g["lon"]))
            a = (
                F.sin(dphi / 2) * F.sin(dphi / 2)
                + F.cos(F.radians(F.lit(g["lat"]))) * F.cos(F.radians(lat))
                * F.sin(dlmb / 2) * F.sin(dlmb / 2)
            )
            dist = F.lit(2.0 * _EARTH_R_M) * F.asin(F.sqrt(a))
            preds.append(dist <= F.lit(float(g["radius_m"])))
        if self.geo_bounding_box is not None:
            tl = self.geo_bounding_box["top_left"]
            br = self.geo_bounding_box["bottom_right"]
            preds.append(
                (c["lat"] <= F.lit(tl["lat"])) & (c["lat"] >= F.lit(br["lat"]))
                & (c["lon"] >= F.lit(tl["lon"])) & (c["lon"] <= F.lit(br["lon"]))
            )
        if self.geo_polygon is not None:
            inside = _ring_contains_col(c, self.geo_polygon["exterior"])
            for hole in self.geo_polygon.get("interiors", []):
                inside = inside & ~_ring_contains_col(c, hole)
            preds.append(inside)
        if not preds:
            raise ValueError(f"empty FieldCondition on {self.key!r}")
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out

    def to_sql(self, prefix: str = "") -> str:
        k = prefix + self.key
        preds: list[str] = []
        if self.match is not None:
            preds.append(f"{k} = {_sql_lit(self.match)}")
        if self.match_any is not None:
            vals = ", ".join(_sql_lit(v) for v in self.match_any)
            preds.append(f"{k} IN ({vals})")
        if self.match_except is not None:
            vals = ", ".join(_sql_lit(v) for v in self.match_except)
            preds.append(f"({k} IS NULL OR {k} NOT IN ({vals}))")
        if self.match_text is not None:
            qtoks = _re.findall(r"\w+", self.match_text, _re.ASCII)
            if not qtoks:
                raise ValueError("match_text with no word tokens")
            for t in qtoks:
                preds.append(
                    f"list_contains(regexp_extract_all({k}, '\\w+'), "
                    f"{_sql_lit(t)})")
        if self.range is not None:
            sym = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
            for op, bound in self.range.items():
                preds.append(f"{k} {sym[op]} {_sql_lit(bound)}")
        if self.datetime_range is not None:
            sym = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
            for op, bound in self.datetime_range.items():
                preds.append(
                    f"{k} {sym[op]} TIMESTAMP {_sql_lit(str(bound))}")
        if self.is_null is not None:
            preds.append(f"{k} IS {'NULL' if self.is_null else 'NOT NULL'}")
        if self.is_empty is not None:
            n = f"(CASE WHEN {k} IS NULL THEN 0 ELSE len({k}) END)"
            preds.append(f"{n} <= 0" if self.is_empty else f"{n} > 0")
        if self.values_count is not None:
            n = f"(CASE WHEN {k} IS NULL THEN 0 ELSE len({k}) END)"
            sym = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}
            for op, bound in self.values_count.items():
                preds.append(f"{n} {sym[op]} {int(bound)}")
        if self.geo_radius is not None:
            g = self.geo_radius
            qlat, qlon = float(g["lat"]), float(g["lon"])
            dist = (
                f"(2.0 * {_EARTH_R_M} * asin(sqrt("
                f"sin(radians({k}.lat - ({qlat})) / 2)"
                f" * sin(radians({k}.lat - ({qlat})) / 2)"
                f" + cos(radians({qlat})) * cos(radians({k}.lat))"
                f" * sin(radians({k}.lon - ({qlon})) / 2)"
                f" * sin(radians({k}.lon - ({qlon})) / 2))))"
            )
            preds.append(f"{dist} <= {float(g['radius_m'])}")
        if self.geo_bounding_box is not None:
            tl = self.geo_bounding_box["top_left"]
            br = self.geo_bounding_box["bottom_right"]
            preds.append(
                f"({k}.lat <= {float(tl['lat'])} AND "
                f"{k}.lat >= {float(br['lat'])} AND "
                f"{k}.lon >= {float(tl['lon'])} AND "
                f"{k}.lon <= {float(br['lon'])})"
            )
        if self.geo_polygon is not None:
            inside = _ring_contains_sql(k, self.geo_polygon["exterior"])
            for hole in self.geo_polygon.get("interiors", []):
                inside += f" AND NOT {_ring_contains_sql(k, hole)}"
            preds.append(f"({inside})")
        if not preds:
            raise ValueError(f"empty FieldCondition on {self.key!r}")
        return "(" + " AND ".join(preds) + ")"


@dataclass(frozen=True)
class Nested:
    """Qdrant nested-object filter: ``filter`` must hold on a *single*
    element of the ``array<struct>`` column ``key``. Compiles to
    ``exists(key, x -> ...)`` (Catalyst higher-order function — stays
    in codegen, no explode/shuffle) and DuckDB
    ``len(list_filter(key, x -> ...)) > 0``. Inner condition keys name
    struct fields of the element."""

    key: str
    filter: "Filter"

    def to_column(self, base: Column | None = None) -> Column:
        c = F.col(self.key) if base is None else base[self.key]
        # null array = no element matches (FALSE, not NULL) — so a
        # must_not over a Nested keeps missing-field rows, as Qdrant
        # and the DuckDB twin (CASE WHEN NULL THEN 0) both do
        return F.when(c.isNull(), F.lit(False)).otherwise(
            F.exists(c, lambda x: self.filter.to_column(base=x)))

    def to_sql(self, prefix: str = "") -> str:
        k = prefix + self.key
        # lambda var unique per nesting depth (prefix grows inward)
        var = f"_qn{len(prefix)}"
        inner = self.filter.to_sql(prefix=f"{var}.")
        return (f"(CASE WHEN {k} IS NULL THEN 0 ELSE "
                f"len(list_filter({k}, {var} -> {inner})) END > 0)")


@dataclass(frozen=True)
class HasId:
    """Qdrant ``HasIdCondition``: the point id is one of ``has_id``.
    ``id_col`` names the id column of the frame being filtered
    (collections default to ``id``)."""

    has_id: Sequence[Any]
    id_col: str = "id"

    def to_column(self, base: Column | None = None) -> Column:
        c = F.col(self.id_col) if base is None else base[self.id_col]
        return c.isin(list(self.has_id))

    def to_sql(self, prefix: str = "") -> str:
        vals = ", ".join(_sql_lit(v) for v in self.has_id)
        return f"{prefix}{self.id_col} IN ({vals})"


@dataclass(frozen=True)
class Filter:
    """Boolean clause tree (Qdrant ``Filter``). Conditions are
    ``FieldCondition``, ``Nested``, ``HasId``, or nested ``Filter``
    objects. ``min_should`` is Qdrant's ``MinShould``: a dict
    ``{"conditions": [...], "min_count": n}`` — at least ``n`` of the
    listed conditions hold (compiled as a sum of 0/1 indicators, so it
    remains a plain scan predicate)."""

    must: Sequence = field(default_factory=tuple)
    should: Sequence = field(default_factory=tuple)
    must_not: Sequence = field(default_factory=tuple)
    min_should: dict | None = None

    def _parts_col(self, base: Column | None = None) -> list[Column]:
        parts: list[Column] = []
        for c in self.must:
            parts.append(c.to_column(base))
        if self.should:
            s = None
            for c in self.should:
                s = c.to_column(base) if s is None else (s | c.to_column(base))
            parts.append(s)
        for c in self.must_not:
            parts.append(~c.to_column(base))
        if self.min_should is not None:
            conds = list(self.min_should["conditions"])
            n = int(self.min_should["min_count"])
            tally = None
            for c in conds:
                t = F.when(c.to_column(base), F.lit(1)).otherwise(F.lit(0))
                tally = t if tally is None else tally + t
            if tally is None:
                raise ValueError("min_should with no conditions")
            parts.append(tally >= F.lit(n))
        if not parts:
            raise ValueError("empty Filter")
        return parts

    def to_column(self, base: Column | None = None) -> Column:
        parts = self._parts_col(base)
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out

    def to_sql(self, prefix: str = "") -> str:
        parts: list[str] = []
        for c in self.must:
            parts.append(c.to_sql(prefix))
        if self.should:
            parts.append(
                "(" + " OR ".join(c.to_sql(prefix) for c in self.should)
                + ")")
        for c in self.must_not:
            parts.append(f"(NOT {c.to_sql(prefix)})")
        if self.min_should is not None:
            conds = list(self.min_should["conditions"])
            n = int(self.min_should["min_count"])
            if not conds:
                raise ValueError("min_should with no conditions")
            tally = " + ".join(
                f"(CASE WHEN {c.to_sql(prefix)} THEN 1 ELSE 0 END)"
                for c in conds)
            parts.append(f"(({tally}) >= {n})")
        if not parts:
            raise ValueError("empty Filter")
        return "(" + " AND ".join(parts) + ")"


def as_predicate(query_filter) -> Column | None:
    """Accept a DSL ``Filter``/``FieldCondition``, a raw Spark
    ``Column``, or None — the collection surface takes any of them."""
    if query_filter is None or isinstance(query_filter, Column):
        return query_filter
    if isinstance(query_filter, (Filter, FieldCondition, Nested, HasId)):
        return query_filter.to_column()
    raise TypeError(
        f"query_filter must be a Column or Filter, got {type(query_filter)}")
