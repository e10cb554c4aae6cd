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
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))), 2)
            AS DOUBLE) AS revenue,
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
        .agg(F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount"))
                           .cast("decimal(24,6)")), 2)
             .cast("double").alias("revenue"),
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


@query("tpch_q4_order_priority", oracle="""
SELECT o.o_orderpriority AS priority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
ORDER BY priority
""")
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking: the EXISTS shape. A correlated
    existence test (any line shipped >60 days after order) becomes a
    LEFT SEMI join with the correlation as a join-side predicate — one
    shuffle on orderkey, lineitem never widens the output. (The
    reference's schema lacks commit/receipt dates; ship-lag vs
    orderdate is the same late-line semantics on available columns.)"""
    o = (table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))))
    l = table(spark, sf_dir, "lineitem")
    late = o.join(l, (F.col("o_orderkey") == F.col("l_orderkey"))
                  & (F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
                  "left_semi")
    return (late.groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.count("*").alias("order_count"))
            .orderBy("priority"))


@query("tpch_q13_customer_distribution", oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: outer join that must keep
    zero-order customers, then a histogram of the counts. The join
    filter lives in the ON clause (a WHERE would silently drop the NULL
    rows — the classic outer-join bug); count(o_orderkey) skips NULLs so
    no-order customers land in the c_count=0 bucket. Second agg is over
    a tiny domain → single light shuffle."""
    c = table(spark, sf_dir, "customer")
    o = (table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") != "1-URGENT"))
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy(c.c_custkey)
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@query("tpch_q14_promo_revenue", oracle="""
SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))
                 ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6)))
                    AS DOUBLE), 4) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""")
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promo revenue: conditional-aggregate ratio. part is a
    broadcast dim (two columns after pruning), so the month of lineitem
    never shuffles — the CASE rides the probe side into one scalar agg.
    Sums accumulate in exact decimal (engine-order-independent), the
    ratio is computed in double."""
    l = (table(spark, sf_dir, "lineitem")
         .filter((F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))))
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(24,6)"))
    return (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .agg(F.round(100.0 * F.sum(promo).cast("double")
                         / F.sum(rev).cast("double"), 4).alias("promo_revenue")))


@query("tpch_q17_small_qty_revenue", oracle="""
WITH thr AS (
  SELECT l_partkey, count(*) AS cnt,
         sum(CAST(l_quantity AS DECIMAL(24,6))) AS qty_sum
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(24,6))) AS DOUBLE)
                  / 7.0, 2) AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN thr t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND 5.0 * l.l_quantity * t.cnt < CAST(t.qty_sum AS DOUBLE)
""")
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: correlated scalar subquery
    (quantity < 20% of the part's average) decorrelated into a per-part
    aggregate joined back. The brand semi-filter is applied BEFORE the
    threshold aggregate — the correlated avg only ever references rows
    of the same part, so restricting to the brand's parts first shrinks
    both sides without changing semantics. The avg comparison is
    rewritten 5*qty*cnt < sum(qty): sums in exact decimal, no
    engine-dependent division ordering."""
    p23 = (table(spark, sf_dir, "part")
           .filter(F.col("p_brand") == "Brand#23").select("p_partkey"))
    l = table(spark, sf_dir, "lineitem")
    lf = l.join(F.broadcast(p23), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    thr = (lf.groupBy("l_partkey")
           .agg(F.count("*").alias("cnt"),
                F.sum(F.col("l_quantity").cast("decimal(24,6)")).alias("qty_sum")))
    return (lf.join(F.broadcast(thr), "l_partkey")
            .filter(F.lit(5.0) * F.col("l_quantity") * F.col("cnt")
                    < F.col("qty_sum").cast("double"))
            .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(24,6)"))
                         .cast("double") / 7.0, 2).alias("avg_yearly")))


@query("tpch_q2_min_cost_supplier", oracle="""
WITH offers AS (
  SELECT l.l_partkey, l.l_suppkey, min(l.l_extendedprice / l.l_quantity) AS unit_price
  FROM lineitem l GROUP BY l.l_partkey, l.l_suppkey),
best AS (
  SELECT l_partkey, min(unit_price) AS best_price
  FROM offers GROUP BY l_partkey)
SELECT o.l_partkey AS partkey, p.p_brand AS brand,
       s.s_name AS supplier, n.n_name AS nation,
       round(o.unit_price, 6) AS unit_price
FROM offers o
JOIN best b ON b.l_partkey = o.l_partkey AND o.unit_price = b.best_price
JOIN part p ON p.p_partkey = o.l_partkey
JOIN supplier s ON s.s_suppkey = o.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size = 15
ORDER BY unit_price, partkey, supplier
LIMIT 100
""")
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 min-cost supplier: the join-back-to-per-group-min shape (the
    correlated MIN subquery, decorrelated). Observed unit prices stand
    in for partsupp.ps_supplycost, which the schema lacks. The min is
    on a raw double (no re-aggregation), so the equality join back is
    exact and engine-independent. part/supplier/nation broadcast; the
    only real shuffle is the offers groupBy — and since both the
    per-group min and the final p_size filter are partkey-local, the
    broadcast-semi-join on the filtered part keys runs BEFORE the
    groupBy: semantics-preserving (surviving groups are untouched;
    discarded groups would have been discarded by the part join anyway)
    and it shrinks that shuffle ~50× (~2% of parts have p_size = 15)."""
    l = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_size") == 15).select("p_partkey", "p_brand"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    lf = l.join(F.broadcast(p.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    offers = (lf.groupBy("l_partkey", "l_suppkey")
              .agg(F.min(unit).alias("unit_price")))
    best = (offers.groupBy("l_partkey")
            .agg(F.min("unit_price").alias("best_price")))
    return (offers.join(best, ["l_partkey"])
            .filter(F.col("unit_price") == F.col("best_price"))
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select(F.col("l_partkey").alias("partkey"),
                    F.col("p_brand").alias("brand"),
                    F.col("s_name").alias("supplier"),
                    F.col("n_name").alias("nation"),
                    F.round("unit_price", 6).alias("unit_price"))
            .orderBy("unit_price", "partkey", "supplier")
            .limit(100))


@query("tpch_q7_nation_volume", oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))), 2)
            AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
""")
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations: the disjunctive
    cross-dimension predicate. Each nation filter is pushed to its own
    dim BEFORE joining (supplier and customer both shrink to 2/25 of
    rows), and the OR-pair condition evaluates on the joined row — far
    cheaper than joining first and filtering later. Both dims broadcast;
    lineitem⋈orders is the one real shuffle."""
    pair = ("NATION_3", "NATION_7")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = (table(spark, sf_dir, "supplier")
         .join(F.broadcast(n.select(F.col("n_nationkey").alias("sk"),
                                    F.col("n_name").alias("supp_nation"))),
               F.col("s_nationkey") == F.col("sk")))
    c = (table(spark, sf_dir, "customer")
         .join(F.broadcast(n.select(F.col("n_nationkey").alias("ck"),
                                    F.col("n_name").alias("cust_nation"))),
               F.col("c_nationkey") == F.col("ck")))
    l = (table(spark, sf_dir, "lineitem")
         .filter((F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))))
    o = table(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
    return (l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
            .filter(((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
                    | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0])))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
            .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


@query("tpch_q8_market_share", oracle="""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                  THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))
                  ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6)))
                    AS DOUBLE), 4) AS mkt_share
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n1.n_regionkey
JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
""")
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: conditional-sum ratio over an 8-table
    star. Every dimension (part filtered to one type, supplier+nation,
    customer restricted to the region) broadcasts; the plan is lineitem
    ⋈ orders as the single shuffle with four broadcast hash joins
    hanging off it. The share numerator rides a CASE on the supplier
    nation — no second pass over the fact."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = (table(spark, sf_dir, "customer")
         .join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
                           .select(F.col("n_nationkey").alias("ck"))),
               F.col("c_nationkey") == F.col("ck"), "left_semi"))
    s = (table(spark, sf_dir, "supplier")
         .join(F.broadcast(n.select(F.col("n_nationkey").alias("sk"),
                                    F.col("n_name").alias("supp_nation"))),
               F.col("s_nationkey") == F.col("sk")))
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    o = (table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))))
    l = table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
    natl = F.when(F.col("supp_nation") == "NATION_2", rev) \
            .otherwise(F.lit(0).cast("decimal(24,6)"))
    return (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
            .join(F.broadcast(s.select("s_suppkey", "supp_nation")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c.select("c_custkey"), F.col("c_custkey") == F.col("o_custkey"),
                  "left_semi")
            .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.round(F.sum(natl).cast("double")
                         / F.sum(rev).cast("double"), 4).alias("mkt_share"))
            .orderBy("o_year"))


@query("tpch_q15_top_supplier", oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey AS suppkey, s.s_name AS name,
       CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY suppkey
""")
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: scalar-subquery max over a derived view, joined
    back by exact equality. Revenue accumulates in exact decimal so the
    max-equality join is deterministic (ties all surface, as in the
    spec). The per-supplier agg is computed once and reused for both
    the max and the join — in Spark that's just referencing the same
    DataFrame; the shuffle output is reused, not recomputed."""
    l = (table(spark, sf_dir, "lineitem")
         .filter((F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))))
    s = table(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
    revenue = (l.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.sum(rev).alias("total_revenue")))
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (revenue.join(F.broadcast(top),
                         F.col("total_revenue") == F.col("mx"))
            .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
            .select(F.col("s_suppkey").alias("suppkey"),
                    F.col("s_name").alias("name"),
                    F.round("total_revenue", 2).cast("double").alias("total_revenue"))
            .orderBy("suppkey"))


@query("tpch_q9_product_profit", oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))
                      - CAST(p.p_retailprice * l.l_quantity * 0.1 AS DECIMAL(24,6))), 2)
            AS DOUBLE) AS profit
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, o_year
ORDER BY nation, o_year DESC
""")
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: revenue minus cost per supplier-nation and
    order-year. p_retailprice*qty*0.1 stands in for ps_supplycost (no
    partsupp table in the schema). The LIKE '%red%' filter can't use
    row-group stats but DOES prune the broadcast build side to a
    fraction of part before the fact join; profit terms accumulate in
    exact decimal."""
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%red%"))
         .select("p_partkey", "p_retailprice"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
    cost = (F.col("p_retailprice") * F.col("l_quantity") * 0.1).cast("decimal(24,6)")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey) \
          .select("s_suppkey", F.col("n_name").alias("nation"))
    return (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.round(F.sum(rev - cost), 2).cast("double").alias("profit"))
            .orderBy(F.col("nation"), F.col("o_year").desc()))


@query("tpch_q11_important_stock", oracle="""
WITH filtered AS (
  SELECT l.l_partkey,
         CAST(l.l_extendedprice AS DECIMAL(24,6)) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_5')
SELECT l_partkey AS partkey,
       CAST(round(sum(value), 2) AS DOUBLE) AS value
FROM filtered
GROUP BY l_partkey
HAVING CAST(sum(value) AS DOUBLE)
       > 0.002 * (SELECT CAST(sum(value) AS DOUBLE) FROM filtered)
ORDER BY value DESC, partkey
""")
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: HAVING against a scalar subquery over the
    same derived set. The filtered fact is aggregated ONCE per part;
    the global total is a second agg over those per-part partials (not a
    second fact scan), broadcast as a 1-row build side. Threshold
    compares exact-decimal sums cast to double — deterministic across
    engines."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    l = table(spark, sf_dir, "lineitem")
    sk = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    per_part = (l.join(F.broadcast(sk), F.col("l_suppkey") == F.col("s_suppkey"),
                       "left_semi")
                .groupBy("l_partkey")
                .agg(F.sum(F.col("l_extendedprice").cast("decimal(24,6)"))
                     .alias("value_sum")))
    total = per_part.agg(F.sum("value_sum").alias("total"))
    return (per_part.join(F.broadcast(total),
                          F.col("value_sum").cast("double")
                          > 0.002 * F.col("total").cast("double"))
            .select(F.col("l_partkey").alias("partkey"),
                    F.round("value_sum", 2).cast("double").alias("value"))
            .orderBy(F.col("value").desc(), F.col("partkey")))


@query("tpch_q12_shipmode_priority", oracle="""
SELECT l.l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY linestatus
""")
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping modes / priority: pivot-style CASE counts with a
    cross-table residual predicate (ship lag > 90 days stands in for
    receipt-vs-commit; l_linestatus for the missing l_shipmode). The
    year filter pushes to the lineitem scan; the lag predicate rides
    the orderkey join as a post-join filter."""
    o = table(spark, sf_dir, "orders")
    l = (table(spark, sf_dir, "lineitem")
         .filter((F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(l, (F.col("o_orderkey") == F.col("l_orderkey"))
                   & (F.col("l_shipdate")
                      > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")))
            .groupBy(F.col("l_linestatus").alias("linestatus"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("linestatus"))


@query("tpch_q16_supplier_cnt", oracle="""
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, brand, type, size
""")
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier-count by part class: NOT IN exclusion + COUNT
    DISTINCT. Negative-balance suppliers stand in for the
    complaints-comment filter. The exclusion list is a broadcast
    LEFT ANTI (safe here: keys are non-null, so NOT IN == anti join);
    count(DISTINCT) expands to a two-phase agg — partial distinct
    map-side, exact count after one shuffle."""
    p = (table(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    l = table(spark, sf_dir, "lineitem")
    return (l.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                   "left_anti")
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy(F.col("p_brand").alias("brand"),
                     F.col("p_type").alias("type"),
                     F.col("p_size").alias("size"))
            .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "brand", "type", "size"))


@query("tpch_q19_discounted_revenue", oracle="""
SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,6))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""")
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue: disjunction of cross-table conjunctions.
    The part-only disjuncts (brand+size) are pre-applied to shrink the
    broadcast build side — the full OR still evaluates post-join, but
    part rows matching NO disjunct never enter the hash table. At 100 TB
    that inferred build-side filter is the difference between
    broadcasting all of part and 3 brands of it."""
    part_pred = (((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
                 | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
                 | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)))
    p = (table(spark, sf_dir, "part").filter(part_pred)
         .select("p_partkey", "p_brand", "p_size"))
    l = table(spark, sf_dir, "lineitem")
    full = (((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
             & F.col("l_quantity").between(1, 11))
            | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
               & F.col("l_quantity").between(10, 20))
            | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
               & F.col("l_quantity").between(20, 30)))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
    return (l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
            .filter(full)
            .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"),
                 F.count("*").alias("n_lines")))


@query("tpch_q20_promotion_suppliers", oracle="""
WITH shipped AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(CAST(l.l_quantity AS DECIMAL(24,6))) AS total_qty,
         sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                  THEN CAST(l.l_quantity AS DECIMAL(24,6)) ELSE 0 END) AS year_qty
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l.l_partkey, l.l_suppkey)
SELECT DISTINCT s.s_name AS name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
WHERE n.n_regionkey = 1
  AND CAST(sh.year_qty AS DOUBLE) > 0.5 * CAST(sh.total_qty AS DOUBLE)
ORDER BY name
""")
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 promotion-eligible suppliers: nested semi-join chain — parts
    by name prefix → per-(part,supplier) shipped totals → suppliers
    where the promo year moved >50% of all-time volume → region filter.
    One conditional aggregate replaces TPC-H's separate availqty
    lookup; both quantities sum in exact decimal and compare in
    double. DISTINCT collapses multi-part qualifiers before the sort."""
    p = (table(spark, sf_dir, "part")
         .filter(F.col("p_name").like("red%")).select("p_partkey"))
    l = table(spark, sf_dir, "lineitem")
    in_year = ((F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
               & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    qty = F.col("l_quantity").cast("decimal(24,6)")
    shipped = (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"),
                      "left_semi")
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum(qty).alias("total_qty"),
                    F.sum(F.when(in_year, qty).otherwise(
                        F.lit(0).cast("decimal(24,6)"))).alias("year_qty")))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    sn = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
          .select("s_suppkey", F.col("s_name").alias("name"),
                  F.col("n_name").alias("nation")))
    return (shipped.filter(F.col("year_qty").cast("double")
                           > 0.5 * F.col("total_qty").cast("double"))
            .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("name", "nation").distinct()
            .orderBy("name"))


@query("tpch_q21_waiting_suppliers", oracle="""
SELECT s.s_name AS name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_4'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                    ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, name
LIMIT 100
""")
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: the EXISTS + NOT-EXISTS
    self-join pair. Both correlated subqueries become orderkey-keyed
    joins against the SAME per-order lineitem pass — a semi join for
    'another supplier participated' and an anti join for 'no OTHER
    supplier was late'. The suppkey<>suppkey disequality rides each
    join as a residual; lineitem is scanned twice but shuffles on
    orderkey both times (AQE coalesces the shared exchange layout).
    Ship lag >90 days stands in for receipt-after-commit."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    sn = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
          .select("s_suppkey", F.col("s_name").alias("name")))
    l1 = (l.join(o, F.col("o_orderkey") == F.col("l_orderkey")).filter(late)
          .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
          .select("l_orderkey", "l_suppkey", "name"))
    l2 = l.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = (l.join(o, F.col("o_orderkey") == F.col("l_orderkey")).filter(late)
          .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")))
    return (l1.join(l2, (F.col("k2") == F.col("l_orderkey"))
                    & (F.col("s2") != F.col("l_suppkey")), "left_semi")
            .join(l3, (F.col("k3") == F.col("l_orderkey"))
                  & (F.col("s3") != F.col("l_suppkey")), "left_anti")
            .groupBy("name").agg(F.count("*").alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("name"))
            .limit(100))


@query("tpch_q22_global_sales_opportunity", oracle="""
WITH eligible AS (
  SELECT substr(c_name, -2) AS cntrycode, c_custkey, c_acctbal
  FROM customer
  WHERE substr(c_name, -2) IN ('13', '31', '23', '29', '30', '18', '17'))
SELECT cntrycode, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(24,6))), 2) AS DOUBLE) AS totacctbal
FROM eligible e
WHERE e.c_acctbal > (SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE)
                     FROM eligible WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey)
GROUP BY cntrycode
ORDER BY cntrycode
""")
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: scalar-average subquery + NOT EXISTS
    anti join. The trailing digits of c_name stand in for the phone
    country code. The average is computed over the eligible set once
    (decimal sum / count, cast to double — one deterministic division),
    broadcast as a 1-row build; customers-without-orders is a LEFT ANTI
    against just the o_custkey column. At scale the anti join shuffles
    customer once; orders arrives pre-projected to one column."""
    c = table(spark, sf_dir, "customer")
    code = F.substring(F.col("c_name"), -2, 2)
    eligible = (c.filter(code.isin("13", "31", "23", "29", "30", "18", "17"))
                .select(code.alias("cntrycode"), "c_custkey", "c_acctbal"))
    avg_bal = (eligible.filter(F.col("c_acctbal") > 0.0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(24,6)"))
                     / F.count("*")).cast("double").alias("avg_bal")))
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (eligible.join(F.broadcast(avg_bal),
                          F.col("c_acctbal") > F.col("avg_bal"))
            .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
            .groupBy("cntrycode")
            .agg(F.count("*").alias("numcust"),
                 F.round(F.sum(F.col("c_acctbal").cast("decimal(24,6)")), 2)
                 .cast("double").alias("totacctbal"))
            .orderBy("cntrycode"))
