"""Window-function queries: top-k per group, running sums, sort/limit,
ntile chunking, last-wins dedup (SURVEY.md §2.6, §2.5 A5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.windows import last_wins, ntile_chunks, running_sum, topk_per_group
from ..registry import query


@query("topk_per_group", oracle="""
SELECT segment, custkey, balance FROM (
  SELECT c_mktsegment AS segment,
         c_custkey AS custkey,
         round(c_acctbal, 2) AS balance,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn <= 3
""")
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-ordered top-k per group (ref handler.py:18-36: best
    recording file per category). Deterministic total order: value DESC,
    unique key ASC (SURVEY §7.3 tiebreaker decision)."""
    c = table(spark, sf_dir, "customer")
    base = c.select(F.col("c_mktsegment").alias("segment"),
                    F.col("c_custkey").alias("custkey"),
                    F.round("c_acctbal", 2).alias("balance"),
                    F.col("c_acctbal"))
    out = topk_per_group(base, keys=["segment"],
                         order=[F.col("c_acctbal").desc(), F.col("custkey").asc()],
                         k=3)
    return out.select("segment", "custkey", "balance")


@query("window_running_sum", oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             3) AS run_total
FROM events
""")
def window_running_sum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total (ref create_tables.sql:38-40 'duration
    calculation' intent). One shuffle on user_id."""
    e = table(spark, sf_dir, "events")
    out = running_sum(e, keys=["user_id"],
                      order=[F.col("ts"), F.col("event_id")],
                      value=F.col("value"), out_col="raw_total")
    return out.select("event_id", "user_id",
                      F.round("raw_total", 3).alias("run_total"))


@query("sort_limit", oracle="""
SELECT o_orderkey AS order_id, round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""")
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N (ref pagination page_size, extract.py:25). Spark plans
    TakeOrderedAndProject — per-partition top-N then driver merge of N×P
    rows, never a full sort."""
    o = table(spark, sf_dir, "orders")
    return (o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(10)
            .select(F.col("o_orderkey").alias("order_id"),
                    F.round("o_totalprice", 2).alias("total")))


@query("ntile_chunks", oracle="""
SELECT CAST(chunk AS INTEGER) AS chunk,
       count(*) AS cnt,
       min(custkey) AS lo,
       max(custkey) AS hi
FROM (
  SELECT ntile(8) OVER (ORDER BY c_custkey) AS chunk, c_custkey AS custkey
  FROM customer
) GROUP BY chunk
""")
def ntile_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-count chunk assignment (ref etl_process.py:45-48 task chunks).
    Global window = single-task sort; summarized per chunk so the output
    is bounded. At scale use repartitionByRange (see operator docstring)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    chunked = ntile_chunks(c, 8, order=[F.col("custkey")], out_col="chunk")
    return (chunked.groupBy("chunk")
            .agg(F.count("*").alias("cnt"),
                 F.min("custkey").alias("lo"),
                 F.max("custkey").alias("hi")))


@query("dedup_last_wins", oracle="""
SELECT user_id, event_type, event_id, round(value, 3) AS val FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""")
def dedup_last_wins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key dedup — the batch equivalent of repeated
    ON CONFLICT upserts (ref load.py:83-91). Unique tiebreaker event_id
    makes the winner deterministic."""
    e = table(spark, sf_dir, "events")
    out = last_wins(e, keys=["user_id", "event_type"],
                    version=[F.col("ts"), F.col("event_id")])
    return out.select("user_id", "event_type", "event_id",
                      F.round("value", 3).alias("val"))


@query("window_range_1h", oracle="""
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       round(sum(value) OVER w, 3) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""")
def window_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-bounded running aggregate (trailing 1-hour count/sum per
    user) — the sliding time-window rollup of time-series engines, as a
    RANGE frame: peers are selected by event-time distance, not row
    count, so bursts widen the frame and quiet periods shrink it. Spark
    needs a numeric range key — microseconds since epoch — with the
    frame in the same unit; one shuffle on the user key, sorted once,
    then a two-pointer frame scan per partition. DuckDB's native
    interval RANGE frame is the oracle, so the unit conversion is
    value-hash-proven exact (ties at the boundary included: both engines
    use inclusive bounds over all peers)."""
    from pyspark.sql import Window
    e = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-3_600_000_000, 0))
    return e.select(
        "event_id", "user_id", "ts",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 3).alias("sum_1h"))


@query("keyset_paginate", oracle="""
WITH anchor AS (
  SELECT o_orderdate AS ad, o_orderkey AS ak
  FROM orders ORDER BY o_orderdate, o_orderkey
  LIMIT 1 OFFSET 99
)
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM orders o, anchor
WHERE (o.o_orderdate, o.o_orderkey) > (anchor.ad, anchor.ak)
ORDER BY o.o_orderdate, o.o_orderkey
LIMIT 100
""")
def keyset_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination — page 2 of an order listing fetched by
    unique-key predicate, NOT by OFFSET: at scale, `OFFSET n` scans and
    discards n rows per page (O(pages²) total), while the keyset
    predicate `(date, key) > (last_date, last_key)` pushes to the scan
    and every page costs one top-k. Both the anchor lookup and the page
    plan are TakeOrderedAndProject (k-bounded heaps, no global sort);
    the tuple comparison is spelled as the explicit OR-form so the
    predicate is pushdown-friendly in both engines."""
    o = table(spark, sf_dir, "orders")
    anchor = (o.select(F.col("o_orderdate").alias("ad"),
                       F.col("o_orderkey").alias("ak"))
               .orderBy("ad", "ak").limit(100)
               .orderBy(F.col("ad").desc(), F.col("ak").desc()).limit(1))
    after = ((F.col("o_orderdate") > F.col("ad"))
             | ((F.col("o_orderdate") == F.col("ad"))
                & (F.col("o_orderkey") > F.col("ak"))))
    return (o.crossJoin(F.broadcast(anchor))
             .filter(after)
             .select("o_orderkey", "o_orderdate", "o_totalprice")
             .orderBy("o_orderdate", "o_orderkey").limit(100))


@query("window_range_numeric", oracle="""
WITH cents AS (
  SELECT event_id, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
)
SELECT event_id, user_id, c,
       CAST(count(*) OVER w AS BIGINT) AS n_band,
       CAST(sum(c) OVER w AS BIGINT) AS sum_band
FROM cents
WINDOW w AS (PARTITION BY user_id ORDER BY c
             RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
""")
def window_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-range window frame (RANGE BETWEEN 500 PRECEDING on integer
    cents, not rows, not time): per user, how many of their events fall
    within $5 below each event's value, and their cent sum — the
    peer-band framing behind price-band analytics and nearest-tier
    lookups. The time-range sibling is `window_range_1h`; this pins the
    NUMERIC range frame, whose peer-set semantics (ties share a frame
    tail) differ from ROWS frames. Integer cents keep the frame
    boundary and the sums engine-exact. One user-keyed sort window —
    the minimal plan."""
    from pyspark.sql import Window
    e = table(spark, sf_dir, "events")
    cents = e.select(
        "event_id", "user_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"))
    w = (Window.partitionBy("user_id").orderBy("c")
         .rangeBetween(-500, Window.currentRow))
    return cents.select(
        "event_id", "user_id", "c",
        F.count("*").over(w).alias("n_band"),
        F.sum("c").over(w).alias("sum_band"))


@query("sample_k_per_group", oracle="""
WITH h AS (
  SELECT event_id, user_id, event_type,
         (event_id * 2654435761) % 4294967296 AS hk
  FROM events
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY hk, event_id) AS rn
  FROM h
)
SELECT event_type, event_id, user_id, CAST(rn AS INT) AS rn
FROM rk WHERE rn <= 100
""")
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-k-per-stratum sampling (k=100 per event type) by
    deterministic hash order — the balanced-subset primitive
    `sample_stratified` (fraction-based, size varies) cannot give:
    training-data pipelines that need exactly k examples per class rank
    by an arithmetic hash (Knuth multiplicative, reproducible across
    runs AND engines) and cut at k. Unlike reservoir sampling the
    result is stable under re-runs and appends that don't displace the
    k smallest hashes. Plan: one group-keyed WindowGroupLimit — rank
    truncation happens map-side before the sort's exchange, so the
    shuffle carries ~k rows per group, not the stratum."""
    from pyspark.sql import Window
    e = table(spark, sf_dir, "events")
    h = e.select("event_id", "user_id", "event_type",
                 F.expr("(event_id * 2654435761) % 4294967296").alias("hk"))
    w = Window.partitionBy("event_type").orderBy("hk", "event_id")
    return (h.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= 100)
             .select("event_type", "event_id", "user_id",
                     F.col("rn").cast("int").alias("rn")))
