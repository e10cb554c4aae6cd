"""TPC-H-shaped benchmark queries on the testdata star schema — the
canonical OLAP plan shapes (pricing summary, shipping priority) that a
warehouse user of the reference's schema would run via Power BI
(SURVEY §2.5 analysis intents), expressed against the columns the
synthetic tables actually have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query("tpch_q1_pricing_summary", oracle="""
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       round(sum(l_quantity), 1) AS sum_qty,
       round(sum(l_extendedprice), 1) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 1) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 1) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: the canonical scan-heavy aggregate — predicate
    pushed to the scan, compound arithmetic in codegen, partial agg
    before one small shuffle."""
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (l.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
            .groupBy(F.col("l_returnflag").alias("returnflag"),
                     F.col("l_linestatus").alias("linestatus"))
            .agg(F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 1).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 1).alias("sum_disc_price"),
                 F.round(F.sum(charge), 1).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


@query("tpch_q3_shipping_priority", oracle="""
SELECT o.o_orderkey AS order_id,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate AS orderdate,
       o.o_orderpriority AS priority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
""")
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: selective dim filter → fact joins → agg →
    top-N. The segment filter prunes customer before the join (Catalyst
    pushes it); the final top-10 is TakeOrderedAndProject."""
    c = (table(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING"))
    o = (table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    l = (table(spark, sf_dir, "lineitem")
         .filter(F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(l, l.l_orderkey == o.o_orderkey)
            .groupBy(F.col("o_orderkey").alias("order_id"),
                     F.col("o_orderdate").alias("orderdate"),
                     F.col("o_orderpriority").alias("priority"))
            .agg(F.round(F.sum(revenue), 2).alias("revenue"))
            .select("order_id", "revenue", "orderdate", "priority")
            .orderBy(F.col("revenue").desc(), F.col("order_id"))
            .limit(10))


@query("tpch_q5_local_supplier", oracle="""
SELECT n.n_name AS nation,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))), 2)
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""")
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: the 6-way star join. region→nation→
    supplier are broadcast (bounded dims); the fact-fact
    lineitem⋈orders shuffle carries only date-filtered orders. The
    same-nation residual (c_nationkey = s_nationkey) rides the supplier
    equi-join."""
    r = (table(spark, sf_dir, "region")
         .filter(F.col("r_name") == "ASIA"))
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = (table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))))
    l = table(spark, sf_dir, "lineitem")
    sn = (s.join(F.broadcast(n.join(F.broadcast(r),
                                    n.n_regionkey == r.r_regionkey)),
                 s.s_nationkey == F.col("n_nationkey")))
    revenue = (F.col("l_extendedprice")
               * (1 - F.col("l_discount"))).cast("decimal(24,6)")
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(l, l.l_orderkey == o.o_orderkey)
            .join(F.broadcast(sn),
                  (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
            .select("nation", "revenue")
            .orderBy(F.col("revenue").desc(), F.col("nation")))


@query("tpch_q6_forecast_revenue", oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""")
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue: pure scan-filter-agg — every predicate reaches
    the parquet scan (row-group min/max skipping on shipdate), no
    shuffle beyond the single-row final agg. The I/O-bound floor of the
    suite: at 100 TB this query IS the scan."""
    l = table(spark, sf_dir, "lineitem")
    return (l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count("*").alias("n_lines")))


@query("tpch_q10_returned_items", oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))), 2)
            AS DOUBLE) AS revenue,
       round(c.c_acctbal, 2) AS acctbal, n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20
""")
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned items: quarter of orders × returned lines → per-
    customer revenue, top 20. nation broadcast; the orders date filter
    makes the fact join's build side small enough for AQE to broadcast
    at low SF and shuffle-join at high SF — exactly the decision AQE
    should own."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = (table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))))
    l = (table(spark, sf_dir, "lineitem")
         .filter(F.col("l_returnflag") == "R"))
    # sum in exact decimal: float accumulation order differs between
    # engines and flips round() at .005 boundaries (observed at sf0.01)
    revenue = (F.col("l_extendedprice")
               * (1 - F.col("l_discount"))).cast("decimal(24,6)")
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("c_custkey").alias("custkey"),
                     F.col("c_name").alias("name"),
                     F.round(F.col("c_acctbal"), 2).alias("acctbal"),
                     F.col("n_name").alias("nation"))
            .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
            .select("custkey", "name", "revenue", "acctbal", "nation")
            .orderBy(F.col("revenue").desc(), F.col("custkey"))
            .limit(20))


@query("tpch_q18_large_volume", oracle="""
SELECT c.c_name AS name, c.c_custkey AS custkey,
       o.o_orderkey AS orderkey, o.o_orderdate AS orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       round(sum(l.l_quantity), 1) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, orderkey
LIMIT 100
""")
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: agg-filter-semi-join back onto the
    fact. The HAVING subquery is a map-side-combined groupBy whose
    survivors are a tiny key set → broadcast LEFT SEMI onto orders, so
    the big lineitem table is scanned twice but shuffled only as
    order-level partials."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    big = (l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
           .filter(F.col("q") > 300).select(F.col("l_orderkey").alias("o_orderkey")))
    o_big = o.join(F.broadcast(big), "o_orderkey", "left_semi")
    return (c.join(o_big, c.c_custkey == o_big.o_custkey)
            .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy(F.col("c_name").alias("name"),
                     F.col("c_custkey").alias("custkey"),
                     F.col("o_orderkey").alias("orderkey"),
                     F.col("o_orderdate").alias("orderdate"),
                     F.round(F.col("o_totalprice"), 2).alias("totalprice"))
            .agg(F.round(F.sum("l_quantity"), 1).alias("sum_qty"))
            .select("name", "custkey", "orderkey", "orderdate",
                    "totalprice", "sum_qty")
            .orderBy(F.col("totalprice").desc(), F.col("orderkey"))
            .limit(100))
