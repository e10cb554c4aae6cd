"""Join family: inner/semi/anti/left-flag/FK-enrichment/interval/point-lookup.

Spark-first re-expressions of the reference's join surface (SURVEY.md
§2.4): the staging merge gate (reference src/db/load.py:203-208), the
existence-delete semi join (load.py:222-228), the FK enrichment the
warehouse schema declares (sql/create_tables.sql:27,42-43,60), the
nullable-membership left join (create_tables.sql:33-41), the per-key
point lookup with 404 tolerance (extract.py:70-96), and the
schema-implied participant/recording interval overlap.

Scale posture: bounded dims (nation, region, filtered part) are
broadcast explicitly; fact-fact joins shuffle on their keys and AQE
handles skew. The interval join anchors on an equi-key so it stays a
hash join with a range residual — never a BNL cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..catalog import events_since, table
from ..registry import query


@query("join_inner", oracle="""
SELECT l.l_orderkey AS order_id,
       l.l_linenumber AS line_no,
       o.o_orderstatus AS status,
       round(l.l_extendedprice, 2) AS price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""")
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-gate inner equi-join (ref load.py:203-208). Fact-fact: shuffle
    hash/sort-merge on the key, AQE decides."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
            .select(F.col("l_orderkey").alias("order_id"),
                    F.col("l_linenumber").alias("line_no"),
                    F.col("o_orderstatus").alias("status"),
                    F.round("l_extendedprice", 2).alias("price")))


@query("join_semi", oracle="""
SELECT c_custkey AS custkey, c_name AS name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence semi join (ref load.py:222-228 DELETE … WHERE EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (c.join(o, "c_custkey", "left_semi")
            .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")))


@query("join_anti", oracle="""
SELECT c_custkey AS custkey, c_name AS name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — the retained-staging complement of join_semi."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (c.join(o, "c_custkey", "left_anti")
            .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")))


@query("join_fk_enrich", oracle="""
SELECT o.o_orderkey AS order_id,
       c.c_name AS customer,
       n.n_name AS nation,
       r.r_name AS region
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""")
def join_fk_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-level FK enrichment (ref create_tables.sql:27,42-43,60). nation and
    region are bounded dims at any scale → explicit broadcast; customer is
    data-sized → shuffle join, AQE may still broadcast at small SF."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select(F.col("o_orderkey").alias("order_id"),
                    F.col("c_name").alias("customer"),
                    F.col("n_name").alias("nation"),
                    F.col("r_name").alias("region")))


@query("join_left_flag", oracle="""
SELECT l.l_orderkey AS order_id,
       l.l_linenumber AS line_no,
       (p.p_partkey IS NOT NULL) AS has_large_part
FROM lineitem l
LEFT JOIN (SELECT p_partkey FROM part WHERE p_size > 25) p
  ON l.l_partkey = p.p_partkey
""")
def join_left_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nullable-membership left join with derived boolean flag — the
    ``internal_user`` pattern (ref create_tables.sql:33-41, load.py:187):
    membership is derived relationally, not stored."""
    l = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part").filter(F.col("p_size") > 25)
         .select("p_partkey"))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left")
            .select(F.col("l_orderkey").alias("order_id"),
                    F.col("l_linenumber").alias("line_no"),
                    F.col("p_partkey").isNotNull().alias("has_large_part")))


@query("join_interval", oracle="""
SELECT o.o_orderkey AS order_id, count(*) AS n_in_window
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
GROUP BY o.o_orderkey
""")
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (SURVEY §2.4 note: participant↔recording
    overlap implied by create_tables.sql:38-39,54-55). Anchored on the
    equi-key so Spark plans a hash join with the range predicate as a
    residual filter — linear, not BNL."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    cond = ((l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate >= o.o_orderdate)
            & (l.l_shipdate < o.o_orderdate + F.expr("interval 90 days")))
    return (o.join(l, cond)
            .groupBy(F.col("o_orderkey").alias("order_id"))
            .agg(F.count("*").alias("n_in_window")))


@query("point_lookup_join", oracle="""
WITH keys(custkey) AS (VALUES (1), (2), (3), (42), (999999999))
SELECT CAST(k.custkey AS BIGINT) AS custkey, c.c_name AS name
FROM keys k LEFT JOIN customer c ON c.c_custkey = k.custkey
""")
def point_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key point lookup with tolerated misses (ref extract.py:70-96:
    404 → logged, not fatal). The key set must be the BUILD side: Spark
    can't broadcast the preserved (left) side of a left-outer join, so
    ``broadcast(keys).join(c, …, "left")`` silently degrades to shuffling
    the entire customer table to look up 5 keys. A right-outer join with
    the keys broadcast keeps the big table streamed in place — each
    customer partition probes the 5-key hash table locally, misses
    surface as NULLs (the 404 path), zero shuffle. Plan shape asserted
    in test_plans.py."""
    keys = spark.createDataFrame(
        [(1,), (2,), (3,), (42,), (999999999,)],
        StructType([StructField("custkey", LongType(), False)]))
    c = table(spark, sf_dir, "customer")
    return (c.join(F.broadcast(keys), keys.custkey == c.c_custkey, "right")
            .select("custkey", F.col("c_name").alias("name")))


@query("join_asof", oracle="""
WITH purchases AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
)
SELECT user_id, event_id, last_click FROM (
  SELECT p.user_id, p.event_id, c.event_id AS last_click,
         row_number() OVER (PARTITION BY p.user_id, p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM purchases p JOIN clicks c
    ON c.user_id = p.user_id AND c.ts <= p.ts
) WHERE rn = 1
""")
def join_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent click at-or-
    before it (the classic attribution query; SURVEY §2.4 notes the
    reference implies interval/as-of shapes via its time-pair schema).
    Equi-anchored range join + deterministic top-1 window."""
    from ..operators.joins import asof_join
    e = table(spark, sf_dir, "events")
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", "event_id", "ts"))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    out = asof_join(purchases, clicks, on=["user_id"],
                    left_ts="ts", right_ts="click_ts",
                    right_cols=["click_id"],
                    tiebreak=[F.col("r.click_id").desc()])
    return out.select("user_id", "event_id",
                      F.col("asof_click_id").alias("last_click"))


@query("window_lag_lead", oracle="""
SELECT event_id, user_id,
       lag(event_id) OVER w AS prev_event,
       lead(event_id) OVER w AS next_event,
       CAST(coalesce(date_diff('second', lag(ts) OVER w, ts), -1) AS BIGINT) AS secs_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead neighbor access per user timeline (session-delta shape,
    ref create_tables.sql:38-40 attendance intent)."""
    from pyspark.sql import Window
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
    return e.select(
        "event_id", "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.coalesce(secs, F.lit(-1)).alias("secs_since_prev"))


@query("join_salted", oracle="""
SELECT l.l_orderkey AS order_id,
       l.l_linenumber AS line_no,
       o.o_orderstatus AS status
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""")
def join_salted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join — same result set as the plain equi-join
    (the oracle IS the plain join); the salted physical plan splits every
    hot key across 8 shards. For when one key dominates (AQE skew-join
    covers moderate skew automatically)."""
    from ..operators.joins import salted_join
    l = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"))
    o = (table(spark, sf_dir, "orders")
         .select(F.col("o_orderkey").alias("k"),
                 F.col("o_orderstatus").alias("status")))
    return salted_join(l, o, "k", n_salts=8).select("order_id", "line_no", "status")


@query("join_auto_skew", oracle="""
SELECT l.k AS k, l.line_no AS line_no, o.status AS status
FROM (SELECT CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE l_orderkey END AS k,
             l_linenumber AS line_no
      FROM lineitem) l
JOIN (SELECT o_orderkey AS k, o_orderstatus AS status FROM orders) o
  USING (k)
""")
def join_auto_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-driven join: sample the key histogram, salt only when one key
    is pathologically hot. Here ~80% of lineitem keys are remapped onto a
    single hot key, so the sampler must pick the salted plan — and the
    oracle (the plain SQL join) proves salting changed the physical
    strategy, not the result."""
    from ..operators.joins import auto_join
    l = table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 8, F.lit(1))
         .otherwise(F.col("l_orderkey")).cast("bigint").alias("k"),
        F.col("l_linenumber").alias("line_no"))
    o = (table(spark, sf_dir, "orders")
         .select(F.col("o_orderkey").cast("bigint").alias("k"),
                 F.col("o_orderstatus").alias("status")))
    decision: dict = {}
    out = auto_join(l, o, "k", sample_fraction=0.1, decision_out=decision)
    assert decision["strategy"] == "salted", decision  # the point of the query
    return out.select("k", "line_no", "status")


@query("incremental_scan", oracle="""
SELECT event_id, user_id, event_type, round(value, 3) AS val
FROM events
WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
""")
def incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-incremental scan (ref extract.py:106-131): only rows since
    the last successful run. The predicate is pushed into the parquet
    scan (min/max row-group skipping); on a date-partitioned layout this
    is partition pruning."""
    e = events_since(spark, sf_dir, "2024-01-20 00:00:00")
    return e.select("event_id", "user_id", "event_type",
                    F.round("value", 3).alias("val"))


@query("join_band_dates", oracle="""
-- band join stated over the DAY DOMAIN (n_near(o) = banded day total
-- minus self): row-identical to the per-order-pair formulation
-- `orders a JOIN orders b ON abs(diff) <= 1 AND a.key <> b.key GROUP
-- BY a.key`, which DuckDB executes as an ~27M-pair IEJoin at sf0.1 —
-- 240-460 s, AT the drive watchdog boundary (it tripped once in the
-- round-7 sf0.1 drive, passing only on a 480 s re-run). The day-domain
-- band keeps the non-equi predicate the oracle exists to check while
-- staying ~2.4k x 2.4k — the stream_cusum_ivm closed-form precedent.
WITH d AS (
  SELECT o_orderdate AS day, count(*) AS c FROM orders GROUP BY 1
),
m AS (
  SELECT a.day, sum(b.c) AS m FROM d a JOIN d b
    ON abs(date_diff('day', b.day, a.day)) <= 1
  GROUP BY 1
)
SELECT o.o_orderkey AS order_id, CAST(m.m - 1 AS BIGINT) AS n_near
FROM orders o JOIN m ON o.o_orderdate = m.day
WHERE m.m - 1 > 0
""")
def join_band_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band query with NO equi anchor: for each order, how many other
    orders were placed within ±1 day. The payload here is COUNT-only,
    which admits full aggregate pushdown through the band: per-day
    order counts (day-domain-sized), a ±1 range window over the day
    axis, then one broadcast join back to orders — n_near(o) =
    m(day(o)) − 1 where m is the banded day total. Cost is one
    map-combined day rollup + a domain-sized window + a broadcast probe:
    O(n) with NO n·band candidate blowup (the previous banded-hash-join
    plan materialized ~180 candidates/order — 27M joined rows at sf0.1 —
    just to count them; 10.7 s → ~1 s). Payload-carrying band joins
    (where each matched pair must survive) still use
    ``operators.joins.band_join`` — bin equi-key + residual filter,
    hypothesis-tested against brute force and BNL-free plan-gated on
    this same shape."""
    o = table(spark, sf_dir, "orders")
    day = F.unix_date(F.to_date("o_orderdate"))
    cnt = o.groupBy(day.alias("day")).agg(F.count("*").alias("c"))
    w = Window.orderBy("day").rangeBetween(-1, 1)
    m = cnt.select("day", F.sum("c").over(w).alias("m"))
    return (o.select(F.col("o_orderkey").alias("order_id"),
                     day.alias("day"))
             .join(F.broadcast(m), "day")
             .select("order_id", (F.col("m") - 1).alias("n_near"))
             # inner-join semantics: an order with no ±1-day neighbor
             # produces no pair in the oracle, so n_near = 0 rows drop
             .filter(F.col("n_near") > 0))


@query("join_asof_nearest", oracle="""
WITH purchases AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
)
SELECT user_id, event_id, near_click FROM (
  SELECT p.user_id, p.event_id, c.event_id AS near_click,
         row_number() OVER (PARTITION BY p.user_id, p.event_id
                            ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
                                     c.ts, c.event_id DESC) AS rn
  FROM purchases p JOIN clicks c ON c.user_id = p.user_id
) WHERE rn = 1
""")
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest' / feature-store closest-observation semantics):
    each purchase matches the user's click closest in time on EITHER
    side, exact ties preferring the earlier (backward) match. Same
    single-shuffle union-timeline plan as ``join_asof`` — both fills
    evaluate over ONE sorted window, the per-row pick is a codegen'd
    CASE on micros-exact distances — while the oracle states the
    O(L·R)-pair definition."""
    from ..operators.joins import asof_join
    e = table(spark, sf_dir, "events")
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", "event_id", "ts"))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    out = asof_join(purchases, clicks, on=["user_id"],
                    left_ts="ts", right_ts="click_ts",
                    right_cols=["click_id"],
                    tiebreak=[F.col("r.click_id").desc()],
                    direction="nearest")
    return out.select("user_id", "event_id",
                      F.col("asof_click_id").alias("near_click"))


@query("join_range_lookup", oracle="""
WITH blocks AS (
  SELECT c_custkey AS owner,
         CAST(c_nationkey AS INT) AS nationkey,
         c_custkey * 1000 AS start_addr,
         c_custkey * 1000 + 200
           + (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) % 700 + 700)
             % 700 AS end_addr
  FROM customer
),
lookups AS (
  SELECT event_id,
         (event_id * 7919) % ((SELECT max(c_custkey) + 1 FROM customer)
                              * 1000) AS addr
  FROM events
),
m AS (
  SELECT l.event_id, b.nationkey
  FROM lookups l LEFT JOIN blocks b
    ON (l.addr // 1000) = b.owner
   AND l.addr >= b.start_addr AND l.addr < b.end_addr
)
SELECT coalesce(nationkey, -1) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_lookups
FROM m GROUP BY 1
""")
def join_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure RANGE-lookup join — the IP-geolocation / CIDR-block shape:
    a large table of non-overlapping [start, end) blocks, a stream of
    point addresses, no shared equi-key. Naively this is a
    BroadcastNestedLoop/cartesian theta-join (quadratic — the plan
    Spark falls into if you write only the BETWEEN predicate); the
    scale technique is BUCKET DECOMPOSITION: quantize the address
    space into fixed buckets, emit each block under every bucket it
    touches (here blocks are stride-aligned and narrower than one
    bucket, so the fan-out is exactly 1; a block spanning B buckets
    emits B copies), map each point to its bucket, and the range
    predicate becomes a residual filter on a plain shuffled
    EQUI-join — linear, partitionable, the plan a billion-block
    table needs (a plan test asserts no nested-loop node survives).
    Blocks synthesize deterministically from customers (owner-strided
    starts, balance-hashed widths → ~55% address coverage so both
    match and miss paths are exercised; misses roll up under
    nationkey −1). Exact integer address arithmetic; the width hash
    double-mods ((x % 700 + 700) % 700) to stay nonnegative under
    both engines' signed % semantics."""
    c = table(spark, sf_dir, "customer")
    e = table(spark, sf_dir, "events")
    blocks = c.select(
        F.col("c_custkey").alias("owner"),
        F.col("c_nationkey").cast("int").alias("nationkey"),
        (F.col("c_custkey") * 1000).alias("start_addr"),
        F.expr("c_custkey * 1000 + 200 "
               "+ (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) % 700 "
               "+ 700) % 700").alias("end_addr"))
    # 1-value driver collect (bounded by construction — the
    # lang_id/control-table precedent): inlining the space bound as a
    # literal keeps the lookup side join-free
    space = c.agg(((F.max("c_custkey") + 1) * 1000).alias("s")) \
             .collect()[0].s
    lookups = e.select(
        "event_id",
        ((F.col("event_id") * 7919) % F.lit(space)).alias("addr"))
    m = lookups.join(
        blocks,
        (F.expr("addr div 1000") == F.col("owner"))
        & (F.col("addr") >= F.col("start_addr"))
        & (F.col("addr") < F.col("end_addr")),
        "left")
    return (m.groupBy(F.coalesce("nationkey", F.lit(-1)).alias("nationkey"))
             .agg(F.count("*").alias("n_lookups")))
