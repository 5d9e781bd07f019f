"""Relational analytics queries (SURVEY.md §2.4 note + §7 M6).

The reference has no join/agg/window/set operators — these enter via
the generalized-engine north star and are all Catalyst built-ins. Each
query demonstrates a scale-relevant plan shape (noted per query) and is
oracle-checked against DuckDB.

Float discipline: money sums are rounded to 2 dp on both sides
(double addition order differs across engines; the absolute error on a
~1e7 sum is ~1e-7, far below the rounding grain). Date filters use
timestamp literals; outputs never carry raw timestamps (epoch seconds
instead — Spark and DuckDB agree on UTC epochs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


# --- TPC-H Q1-style scan+agg: the canonical map-side partial agg shape.
# At 100 TB this is scan-bound; the groupBy key cardinality is tiny (≤6
# groups), so partial aggregation reduces each partition to a handful of
# rows before the single cheap shuffle.
@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3-style 3-way join + agg + top-k. customer is small →
# broadcast; orders⋈lineitem is the big shuffle join on l_orderkey.
@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(epoch(o.o_orderdate) AS BIGINT) AS o_orderdate_epoch
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --- Revenue per nation: snowflake join chain; region/nation/supplier
# are dimension tables → broadcast all three, single fact shuffle.
@register(
    "nation_revenue",
    """
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- Top-k per group (window ranking) — the batched-KNN shape on
# relational data.
@register(
    "top_customers_per_nation",
    """
    WITH spend AS (
      SELECT c.c_nationkey, c.c_custkey, c.c_name,
             ROUND(SUM(o.o_totalprice), 2) AS total_spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, c.c_custkey, c.c_name
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY c_nationkey
                       ORDER BY total_spend DESC, c_custkey) AS INTEGER) AS rank
      FROM spend
    )
    SELECT c_nationkey, c_custkey, c_name, total_spend, rank
    FROM ranked WHERE rank <= 3
    """,
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return spend.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


# --- ROLLUP (grouping sets). NULL group markers flow through the hash
# compare on both engines identically.
@register(
    "order_priority_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# --- Set ops: customers with both open and finished orders
# (INTERSECT → left_semi chain), and with none (anti join).
@register(
    "customers_open_and_finished",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_both
    FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def customers_open_and_finished(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(fin_c).agg(F.count(F.lit(1)).alias("n_both"))


@register(
    "customers_without_orders",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_no_orders
    FROM customer c ANTI JOIN orders o ON o.o_custkey = c.c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_no_orders")
    )


# --- Approximate + exact distinct (sketch ops; approx is rows-only —
# HLL implementations differ across engines, so no value oracle).
@register(
    "part_brand_volume",
    """
    SELECT p.p_brand,
           CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_parts,
           ROUND(AVG(p.p_retailprice), 6) AS avg_retail,
           ROUND(SUM(l.l_quantity), 2) AS shipped_qty
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 25
    GROUP BY p.p_brand
    """,
)
def part_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-dimension join: brand-level shipped volume (part is small
    → broadcast; the size filter pushes into its scan)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_retail"),
            F.round(F.sum("l_quantity"), 2).alias("shipped_qty"),
        )
    )


@register(
    "supplier_part_distinct",
    """
    SELECT l_suppkey,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY l_suppkey
    """,
)
def supplier_part_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- correlated-subquery shape (TPC-H Q2-style): row vs per-group min.
@register(
    "cheapest_part_per_brand",
    """
    SELECT p.p_brand, p.p_partkey, ROUND(p.p_retailprice, 2) AS price
    FROM part p
    WHERE p.p_retailprice = (
      SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
)
def cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2 shape). Catalyst rewrites
    it to an aggregate + join — written here in subquery form via the
    SQL API to exercise that rewrite."""
    import uuid

    view = f"v_part_{uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "part").createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT p.p_brand, p.p_partkey, ROUND(p.p_retailprice, 2) AS price
        FROM {view} p
        WHERE p.p_retailprice = (
          SELECT MIN(p2.p_retailprice) FROM {view} p2
          WHERE p2.p_brand = p.p_brand
        )
    """)


# --- unpivot / melt
@register(
    "lineitem_unpivot_measures",
    """
    SELECT l_returnflag, measure, ROUND(SUM(val), 2) AS total
    FROM (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    GROUP BY l_returnflag, measure
    """,
)
def lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) via stack(): wide measure columns → long
    (measure, value) rows, then aggregate."""
    li = load(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "l_returnflag",
        "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
        "'discount', l_discount) AS (measure, val)",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.round(F.sum("val"), 2).alias("total")
    )


# --- TPC-H Q5 shape: the 6-way snowflake with the local-supplier
# correlation (customer and supplier must share a nation) — the
# classic join-graph stress: Catalyst must broadcast the four
# dimensions and keep the orders⋈lineitem fact join as the ONE
# shuffled edge; the c_nationkey = s_nationkey condition rides the
# supplier broadcast as a post-join filter.
@register(
    "tpch_q5_local_supplier",
    """
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation where the
    lineitem's supplier and the ordering customer share that nation,
    one order year, one region."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate")
           < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s),
              (l.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )
