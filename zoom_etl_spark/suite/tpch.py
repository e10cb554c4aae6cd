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
