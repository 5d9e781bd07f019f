"""Local mirror of the driver's DuckDB oracle comparison.

Runs a registry entry's Spark builder and its oracle SQL on the same
sf dir, then compares: row count, column names, and values
(order-insensitive: columns sorted by name, rows sorted by all
columns). Floats must match exactly — registry queries round on both
sides, so an inequality here means the driver's value-hash would
mismatch too.
"""

from __future__ import annotations

import math

import duckdb

from image_indexing_and_retrival_with_qdrant_spark.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(val):
    import decimal

    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, decimal.Decimal):
        # Deliberately NOT coerced to match float text: a DECIMAL-typed
        # oracle column (DuckDB types bare decimal literals as DECIMAL)
        # must FAIL here so the oracle gets an explicit DOUBLE cast —
        # repr-level value hashes distinguish Decimal('x') from x.
        return f"DECIMAL:{val}"
    if val is None:
        return "NULL"
    return str(val)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(spark, entry, sf_dir: str, name: str = "?") -> None:
    sdf = entry.builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(entry.oracle_for(sf_dir))
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()

    assert sorted(scols) == sorted(ocols), (
        f"{name}: columns differ spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{name}: row count differs spark={len(srows)} oracle={len(orows)}"
    )
    sc, sr = _canon_rows(scols, srows)
    _, orr = _canon_rows(ocols, orows)
    for i, (a, b) in enumerate(zip(sr, orr)):
        assert a == b, (
            f"{name}: row {i} differs (cols {sc})\n  spark : {a}\n  oracle: {b}"
        )
