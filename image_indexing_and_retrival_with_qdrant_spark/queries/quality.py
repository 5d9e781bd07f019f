"""Data-quality / robustness queries: permissive-mode ingestion
(F2/A1), window-analytics showcase, fuzzy matching, dataset profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.embedder import HashEmbedder
from ..tables import load

_E = HashEmbedder(dim=8)


@register(
    "ingest_failure_stats",
    f"""
    WITH src AS (
      SELECT doc_id, CASE WHEN doc_id % 50 = 0 THEN NULL ELSE text END AS text
      FROM documents
    ),
    emb AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  ELSE ROUND({_E.oracle_dim_sql(0, 'text')}, 6) END AS e0
      FROM src
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS total,
           CAST(COUNT(e0) AS BIGINT) AS processed,
           CAST(COUNT(*) - COUNT(e0) AS BIGINT) AS failed
    FROM emb
    """,
)
def ingest_failure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive-mode ingestion (F2/A1): rows that fail the embed
    stage (here: null text, standing in for corrupt images —
    ``incremental_indexing_colpali_with_qdrant.py:165-173``) yield
    null embeddings that are counted, never failing the job."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "text", F.when(F.col("doc_id") % 50 == 0, None).otherwise(F.col("text"))
    )
    embedded = docs.withColumn(
        "e0",
        F.when(F.col("text").isNotNull(),
               F.round(F.element_at(_E.expr(F.col("text")), 1), 6)),
    )
    return embedded.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("e0").alias("processed"),
        (F.count(F.lit(1)) - F.count("e0")).alias("failed"),
    )


@register(
    "customer_window_showcase",
    """
    WITH spend AS (
      SELECT c.c_nationkey, c.c_custkey,
             ROUND(SUM(o.o_totalprice), 2) AS total
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, c.c_custkey
    )
    SELECT c_nationkey, c_custkey, total,
           CAST(rank()       OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4)     OVER w AS INTEGER) AS quartile,
           ROUND(total - lag(total, 1, 0.0) OVER w, 2) AS gap_to_prev,
           ROUND(first_value(total) OVER w, 2) AS nation_top,
           FLOOR(CAST(cume_dist() OVER w AS DOUBLE) * 1000000 + 0.5)
             / 1000000 AS cume
    FROM spend
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY total DESC, c_custkey)
    """,
)
def customer_window_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-analytics breadth on one frame: rank, dense_rank, ntile,
    lag-with-default, first_value, cume_dist."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("total").desc(), F.col("c_custkey")
    )
    return spend.select(
        "c_nationkey", "c_custkey", "total",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.col("total") - F.lag("total", 1, 0.0).over(w), 2).alias("gap_to_prev"),
        F.round(F.first("total").over(w), 2).alias("nation_top"),
        # floor(x·10⁶+0.5)/10⁶, not F.round: cume_dist is k/n and at
        # sf0.1 one rank hits an exact 7th-digit-5 repr (0.0640625),
        # where Spark's BigDecimal HALF_UP and DuckDB's binary ROUND
        # disagree; the floor form is identical double math on both
        (F.floor(F.cume_dist().over(w) * 1e6 + F.lit(0.5)) / 1e6)
        .alias("cume"),
    )


@register(
    "part_name_fuzzy_pairs",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 6
    """,
)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: near-identical part names (edit distance ≤ 6)
    within brand blocks — the entity-resolution tier of dedup."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, on="p_brand")
        .filter(F.col("a.p_partkey") < F.col("b.p_partkey"))
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 6)
    )


@register(
    "events_profile",
    """
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      CAST(COUNT(*) - COUNT(value) AS BIGINT) AS null_values,
      ROUND(MIN(value), 2) AS min_value,
      ROUND(MAX(value), 2) AS max_value,
      CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_values,
      CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT) AS bad_json
    FROM events
    """,
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset profile: cardinalities, null/negative counts,
    bounds, JSON validity — the pre-training sanity scan."""
    ev = load(spark, sf_dir, "events")
    json_ok = F.get_json_object("props", "$").isNotNull()
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        (F.count(F.lit(1)) - F.count("value")).alias("null_values"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).cast("long").alias("neg_values"),
        F.sum(F.when(json_ok, 0).otherwise(1)).cast("long").alias("bad_json"),
    )


# ---- extended Filter-DSL showcase (round 7) ------------------------
# Qdrant's remaining filter model: MatchExcept, IsEmpty, ValuesCount,
# MinShould, HasId, and Nested (same-element array<struct> filters).
# As with knn_dsl_filtered_top5, the Spark predicate and the oracle
# WHERE clause compile from the SAME tree (filters.py), so the DSL
# semantics are oracle-checked end to end.
from ..filters import FieldCondition, Filter, HasId, Nested  # noqa: E402

_XDSL = Filter(
    must=[Nested("sections", Filter(must=[
        FieldCondition("len", range={"gte": 7}),
        FieldCondition("tok", match_except=["the", "and"]),
    ]))],
    must_not=[FieldCondition("tags", is_empty=True),
              HasId([7, 13, 21], id_col="doc_id")],
    min_should={"conditions": [
        FieldCondition("lang", match_except=["de", "fr"]),
        FieldCondition("tags", values_count={"gte": 2}),
        FieldCondition("source", match_any=["src1", "src3", "src5", "src7"]),
    ], "min_count": 2},
)

# identical derivations on both engines: tags = a 0..3-token slice
# (len = n_chars % 4 — exercises empty arrays), sections = the first
# 3 tokens as {tok, len} structs (exercises per-element conditions)
_XDSL_DUCK_SRC = """
    SELECT doc_id, lang, source, n_chars,
           list_slice(regexp_extract_all(text, '\\w+'), 1,
                      CAST(n_chars % 4 AS INT)) AS tags,
           list_transform(list_slice(regexp_extract_all(text, '\\w+'), 1, 3),
                          t -> {'tok': t, 'len': CAST(length(t) AS BIGINT)})
             AS sections
    FROM documents
"""


@register(
    "docs_extended_filter_dsl",
    f"""
    WITH t AS ({_XDSL_DUCK_SRC})
    SELECT doc_id, lang, source, n_chars
    FROM t WHERE {_XDSL.to_sql()}
    ORDER BY doc_id
    LIMIT 50
    """,
)
def docs_extended_filter_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full extended Qdrant filter model in one clause tree:
    ``Nested`` (conditions bound to a single ``sections`` element —
    Catalyst ``exists()`` higher-order function, no explode),
    ``IsEmpty``/``ValuesCount`` over a derived ``tags`` array,
    ``MatchExcept`` (missing-field-matches NOT IN), ``MinShould``
    (≥2 of 3 indicator sum), and ``HasId`` exclusion. Everything
    compiles to one scan predicate — no shuffle, no UDF; at 100 TB
    this is a pruned parquet scan like every other F4 filter."""
    docs = load(spark, sf_dir, "documents")
    from ..functions.text import tokens
    t = (docs
         .withColumn("__toks", tokens(F.col("text")))
         .withColumn("tags", F.expr(
             "slice(__toks, 1, CAST(n_chars % 4 AS INT))"))
         .withColumn("sections", F.expr(
             "transform(slice(__toks, 1, 3), "
             "t -> struct(t AS tok, CAST(length(t) AS BIGINT) AS len))")))
    return (t.filter(_XDSL.to_column())
             .select("doc_id", "lang", "source", "n_chars")
             .orderBy("doc_id")
             .limit(50))
