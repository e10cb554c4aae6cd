"""Extended analytics surface (SURVEY.md §2.5 scope decision: rollup, cube,
grouping sets, approx distinct — plus percentiles, pivot, session/sliding
windows and the error-taxonomy routing of §2.10 E2).

The reference delegates these analyses to Postgres/Power BI; the DDL
comments name them (per-host stats, attendance, storage analysis) and the
engine owns them natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query("agg_cube", oracle="""
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       count(*) AS cnt,
       round(sum(l_extendedprice), 1) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions (all 2^2 grouping combinations)."""
    return (table(spark, sf_dir, "lineitem")
            .cube(F.col("l_returnflag").alias("returnflag"),
                  F.col("l_linestatus").alias("linestatus"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("l_extendedprice"), 1).alias("revenue")))


@query("agg_grouping_sets", oracle="""
SELECT o_orderstatus AS status,
       o_orderpriority AS priority,
       count(*) AS cnt
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (two independent one-dimension rollups in one
    pass over the data — one shuffle instead of two)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql("""
        SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               count(*) AS cnt
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


@query("agg_percentiles", oracle="""
SELECT o_orderstatus AS status,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 2) AS p99
FROM orders GROUP BY o_orderstatus
""")
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. The 100 TB path is
    approx_percentile (t-digest sketch, bounded memory, mergeable
    partials) — asserted within tolerance in unit tests; the oracle
    checks the exact variant."""
    return (table(spark, sf_dir, "orders")
            .groupBy(F.col("o_orderstatus").alias("status"))
            .agg(F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
                 F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
                 F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99")))


@query("agg_pivot", oracle="""
SELECT user_id,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error
FROM events GROUP BY user_id
""")
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts into per-type columns. Explicit value list →
    single-pass plan (no extra distinct-values job); absent cells
    coalesced to 0 to match SQL sum(CASE)."""
    e = table(spark, sf_dir, "events")
    p = e.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES])


@query("window_session", oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sess GROUP BY user_id, sid
""")
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) — F.session_window, the same
    operator Structured Streaming uses for stateful sessionization. The
    oracle derives identical sessions via the lag/cumulative-flag rewrite."""
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"), "n_events"))


@query("window_sliding", oracle="""
SELECT w AS win_start, count(*) AS cnt, round(sum(value), 3) AS total
FROM (
  SELECT CAST(unnest([date_trunc('day', ts),
                      date_trunc('day', ts) - INTERVAL 1 DAY]) AS TIMESTAMP) AS w,
         value
  FROM events
) GROUP BY w
""")
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2-day length, 1-day slide): every event lands in
    two overlapping windows. Spark expands slide positions natively in
    F.window; the oracle unnests the two candidate starts explicitly."""
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("value"), 3).alias("total"))
            .select(F.col("w.start").alias("win_start"), "cnt", "total"))


@query("error_categorize", oracle="""
SELECT CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 'MISSING_FIELD'
            WHEN value < 0.05 THEN 'OUT_OF_RANGE'
            WHEN event_type = 'error' THEN 'UPSTREAM_ERROR'
            ELSE 'OK' END AS reason,
       count(*) AS cnt
FROM events GROUP BY 1
""")
def error_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-taxonomy routing (ref src/errors/error_types.py:4-11,
    error_handler.py:107-147): classify rows into a typed reason column
    instead of raising — the quarantine-DataFrame pattern. First matching
    rule wins, like the reference's match/case."""
    e = table(spark, sf_dir, "events")
    reason = (F.when(F.get_json_object("props", "$.k").isNull(), "MISSING_FIELD")
              .when(F.col("value") < 0.05, "OUT_OF_RANGE")
              .when(F.col("event_type") == "error", "UPSTREAM_ERROR")
              .otherwise("OK"))
    return (e.groupBy(reason.alias("reason"))
            .agg(F.count("*").alias("cnt")))
