"""Aggregation family: counts, grouped stats, rollup, watermark max,
tumbling windows, approximate distinct.

The reference delegates aggregation to Postgres/Power BI but documents
the intended analyses in its DDL comments (reference
sql/create_tables.sql:9,23-26,38-40,52 — per-host stats, attendance,
duration, storage rollups); SURVEY.md §2.5 assigns each a query here.

Scale posture: every groupBy is a hash aggregate with map-side partial
aggregation (automatic in Spark); grouping keys are the natural
high-cardinality keys so no single reducer hot-spots. approx_count_distinct
is the 100 TB cardinality path (HLL sketch, no shuffle of raw values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query("agg_count", oracle="""
SELECT o_orderstatus AS status, count(*) AS cnt
FROM orders GROUP BY o_orderstatus
""")
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count (ref create_tables.sql:25 participants_count)."""
    return (table(spark, sf_dir, "orders")
            .groupBy(F.col("o_orderstatus").alias("status"))
            .agg(F.count("*").alias("cnt")))


@query("agg_group_stats", oracle="""
SELECT c.c_mktsegment AS segment,
       n.n_name AS nation,
       count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_rev,
       round(avg(o.o_totalprice), 2) AS avg_rev,
       round(max(o.o_totalprice), 2) AS max_rev
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_mktsegment, n.n_name
""")
def agg_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group stats (ref create_tables.sql:9 'grouping by department').
    Join then aggregate; partial aggregation halves the shuffle."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("c_mktsegment").alias("segment"),
                     F.col("n_name").alias("nation"))
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_rev"),
                 F.round(F.avg("o_totalprice"), 2).alias("avg_rev"),
                 F.round(F.max("o_totalprice"), 2).alias("max_rev")))


@query("agg_rollup", oracle="""
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       count(*) AS cnt,
       round(sum(l_quantity), 1) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (ref create_tables.sql:52 'storage analysis')."""
    return (table(spark, sf_dir, "lineitem")
            .rollup(F.col("l_returnflag").alias("returnflag"),
                    F.col("l_linestatus").alias("linestatus"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("l_quantity"), 1).alias("sum_qty")))


@query("agg_max_watermark", oracle="""
SELECT max(ts) AS watermark, count(*) AS n_events FROM events
""")
def agg_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark derivation (ref extract.py:196-211): max processed event
    time; batch analog of the streaming watermark."""
    return (table(spark, sf_dir, "events")
            .agg(F.max("ts").alias("watermark"), F.count("*").alias("n_events")))


@query("agg_approx_distinct", oracle="""
SELECT event_type, count(DISTINCT user_id) AS exact_users
FROM events GROUP BY event_type
""")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality estimation. Oracle checks the EXACT distinct count; the
    Spark side computes exact too, but the engine exposes
    approx_count_distinct (HLL) as the 100 TB path — asserted within
    relative error in unit tests."""
    return (table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("exact_users")))


@query("agg_collect", oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
       CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types
FROM events GROUP BY user_id
""")
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation (collect_set), emitted as a sorted joined
    string so the comparison is order-insensitive and scalar."""
    e = table(spark, sf_dir, "events")
    types = F.collect_set("event_type")
    return (e.groupBy("user_id")
            .agg(F.array_join(F.array_sort(types), ",").alias("types_seen"),
                 F.size(types).alias("n_types")))


@query("agg_max_by", oracle="""
SELECT user_id,
       arg_max(event_type, value) AS top_type,
       round(max(value), 3) AS top_value
FROM events GROUP BY user_id
""")
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax aggregation (max_by/arg_max): the event type carrying each
    user's max value. Deterministic on this data — values are continuous
    doubles, exact ties have measure zero (a production version would
    order by (value, unique_id))."""
    e = table(spark, sf_dir, "events")
    return (e.groupBy("user_id")
            .agg(F.max_by("event_type", "value").alias("top_type"),
                 F.round(F.max("value"), 3).alias("top_value")))


@query("window_tumbling", oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) AS cnt,
       round(sum(value), 3) AS total
FROM events GROUP BY date_trunc('day', ts)
""")
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time window (ref extract.py:98-104 30-day windows; SURVEY
    ST5). Uses F.window — identical code works under Structured Streaming
    with withWatermark; window.start == date_trunc for epoch-aligned days."""
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("value"), 3).alias("total"))
            .select(F.col("w.start").alias("day"), "cnt", "total"))


@query("supplier_hhi", oracle="""
WITH q AS (
  SELECT l_partkey AS partkey, l_suppkey,
         sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem GROUP BY 1, 2
),
t AS (
  SELECT partkey,
         sum(qty * qty) AS sq,
         sum(qty) AS tot,
         CAST(count(*) AS BIGINT) AS n_suppliers
  FROM q GROUP BY 1
)
SELECT partkey, n_suppliers,
       round(CAST(sq AS DOUBLE) / (tot * tot), 6) AS hhi
FROM t
""")
def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration Herfindahl-Hirschman index per part: Σ of
    squared supplier quantity shares (1.0 = single-sourced, →0 =
    perfectly diversified) — the procurement-risk metric behind
    second-source decisions. Restated on exact integers: HHI =
    Σq_i²/(Σq)², so the only float op is ONE IEEE division per part on
    exactly-aggregated integer moments (the trend_linefit discipline —
    Σ(q/T)² would float-accumulate differently per engine). Two
    map-combined keyed aggregates, no joins; rounding is tie-free
    because Σq_i²·10⁶ / T² lands on the rational grid only at measure-
    zero alignments of the data, unlike means over small denominators."""
    li = table(spark, sf_dir, "lineitem")
    q = (li.groupBy(F.col("l_partkey").alias("partkey"), "l_suppkey")
           .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty")))
    t = (q.groupBy("partkey")
          .agg(F.sum(F.col("qty") * F.col("qty")).alias("sq"),
               F.sum("qty").alias("tot"),
               F.count("*").alias("n_suppliers")))
    return t.select(
        "partkey", "n_suppliers",
        F.round(F.col("sq").cast("double")
                / (F.col("tot") * F.col("tot")), 6).alias("hhi"))


@query("revenue_concentration", oracle="""
WITH r AS (
  SELECT o_custkey AS k,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
q AS (
  SELECT k, cents,
         CAST(ntile(5) OVER (ORDER BY cents DESC, k) AS INT) AS quintile
  FROM r
),
t AS (SELECT sum(cents) AS tot FROM r)
SELECT quintile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST((2000000 * sum(cents) + t.tot) // (2 * t.tot) AS BIGINT)
         AS share_e6
FROM q, t GROUP BY quintile, t.tot
""")
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by customer quintile (the 80/20 question:
    how much of revenue does the top fifth of customers carry).
    Revenue lives in exact integer cents; quintiles cut by ntile over
    the UNIQUE (revenue desc, custkey) order so membership is
    engine-exact; the share is integer half-away on the 1e-6 grid (no
    float round — SURVEY 7.3). Plan: one customer rollup, one
    customer-count-sized global sort window (bounded by |customers|,
    never |orders|), a 5-row aggregate, and the 1-row total via
    broadcast cross join."""
    o = table(spark, sf_dir, "orders")
    r = (o.groupBy(F.col("o_custkey").alias("k"))
          .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
                .alias("cents")))
    w = Window.orderBy(F.col("cents").desc(), "k")
    q = r.withColumn("quintile", F.ntile(5).over(w).cast("int"))
    t = r.agg(F.sum("cents").alias("tot"))
    return (q.groupBy("quintile")
             .agg(F.count("*").alias("n_customers"),
                  F.sum("cents").alias("revenue_cents"))
             .crossJoin(F.broadcast(t))
             .select("quintile", "n_customers", "revenue_cents",
                     # 2e6 * cents overflows int64 once corpus revenue
                     # passes ~4.6e12 cents (hit at the 10x smoke);
                     # route the product through DECIMAL(38,0) — the
                     # revenue_gini lesson. DuckDB widens to HUGEINT
                     # on its own; its result column is already CAST.
                     F.expr("CAST((CAST(2000000 AS DECIMAL(38,0)) "
                            "* revenue_cents + tot) "
                            "DIV (2 * CAST(tot AS DECIMAL(38,0))) "
                            "AS BIGINT)").alias("share_e6")))
