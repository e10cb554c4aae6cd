"""Sequence / frontier mining operators — the classic analytics shapes a
warehouse layers on an event log and a catalog once the plain rollups
exist: Markov transition structure, recursive per-entity smoothing, and
Pareto (skyline) frontiers.

Generalizes the reference's per-user event tracking intent (reference
sql/create_tables.sql:38 "attendance tracking", src/zoom/transform.py's
per-meeting orderings) the same way ``funnel_conversion`` and
``retention_cohorts`` do.

Scale posture: ``markov_transitions`` is two keyed map-combined
aggregates over one (user)-keyed sort window; ``ewma_smooth`` is
inherently sequential PER KEY (a recurrence) and runs as one Arrow
batch per user across all cores — the only correct distribution for a
recurrence: parallel across keys, ordered within; ``skyline_pareto``
reduces the catalog to a price-keyed aggregate (bounded by the price
domain, 1000 values here) before any ordered scan, so the single
ordered pass is domain-sized, never catalog-sized (the two-level
prefix pattern in ``operators/packing.py`` removes even that if the
domain ever grows corpus-like).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query("markov_transitions", oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
t AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
FROM t
""")
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    adjacent pair of events per user (event-time order), count
    from-state → to-state transitions and normalize rows into
    probabilities — the session-flow model behind "what do users do
    after X" product questions. Plan: one (user)-keyed sort window for
    ``lead`` (the only corpus-sized shuffle), then a states²-bounded
    aggregate and a states-partitioned tiny window — output cardinality
    is |state|², independent of corpus size."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "event_type",
                   F.lead("event_type").over(w).alias("next_type"))
    t = (seq.filter(F.col("next_type").isNotNull())
         .groupBy(F.col("event_type").alias("from_type"),
                  F.col("next_type").alias("to_type"))
         .agg(F.count("*").alias("n")))
    wf = Window.partitionBy("from_type")
    return t.select("from_type", "to_type", "n",
                    F.round(F.col("n").cast("double") / F.sum("n").over(wf), 4)
                    .alias("p"))


_EWMA_ALPHA = 0.3
_EWMA_SCHEMA = "user_id bigint, rn int, ewma double"


def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # one user per group; recurrence must match the oracle's expression
    # shape exactly (0.3 * x + 0.7 * prev, IEEE double) for bit parity
    pdf = pdf.sort_values(["ts", "event_id"])
    x = pdf["value"].to_numpy(dtype=np.float64)
    out = np.empty(len(x), dtype=np.float64)
    prev = 0.0
    for i, v in enumerate(x):
        prev = v if i == 0 else _EWMA_ALPHA * v + (1.0 - _EWMA_ALPHA) * prev
        out[i] = prev
    return pd.DataFrame({
        "user_id": pdf["user_id"].to_numpy(),
        "rn": np.arange(1, len(x) + 1, dtype=np.int32),
        # half-away-from-zero to match the oracle's round() (numpy's
        # np.round is half-to-even and diverges on exact .00005 ties)
        "ewma": np.copysign(np.floor(np.abs(out) * 1e4 + 0.5), out) / 1e4,
    })


@query("ewma_smooth", oracle=f"""
WITH RECURSIVE seq AS (
  SELECT user_id, value,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS INT) AS rn
  FROM events
),
ew AS (
  SELECT user_id, rn, CAST(value AS DOUBLE) AS ewma FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn,
         {_EWMA_ALPHA} * s.value + {1.0 - _EWMA_ALPHA} * e.ewma
  FROM seq s JOIN ew e ON s.user_id = e.user_id AND s.rn = e.rn + 1
)
SELECT user_id, rn, round(ewma, 4) AS ewma FROM ew
""")
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of ``value``
    (α=0.3, seeded at the first observation) — the standard online
    smoother behind anomaly baselines and rate estimators. A recurrence
    has no closed-form window formulation that survives long sequences
    numerically (the tempting pow(1-α, -i) prefix trick overflows), so
    this is the honest distributed shape: ``applyInPandas`` per user —
    sequential within a key because the MATH is sequential within a key,
    parallel across the keyspace, one Arrow batch per group. The oracle
    is a recursive CTE computing the identical double recurrence, so
    values match bit-for-bit before the output rounding. At 100 TB state
    per task is one running scalar; skew is bounded by the longest
    single-entity history."""
    e = table(spark, sf_dir, "events")
    # explicit key repartition: the bytes are tiny, so AQE would coalesce
    # the exchange to 1-2 tasks — but the cost here is the PYTHON
    # recurrence, which scales with rows, not bytes. A user-specified
    # partition count is exempt from AQE coalescing and satisfies the
    # applyInPandas distribution, so no second shuffle is added.
    n = spark.sparkContext.defaultParallelism
    return (e.select("user_id", "ts", "event_id", "value")
            .repartition(n, "user_id")
            .groupBy("user_id")
            .applyInPandas(_ewma_group, _EWMA_SCHEMA))


@query("skyline_pareto", oracle="""
SELECT p.p_partkey, p.p_retailprice, p.p_size,
       NOT EXISTS (
         SELECT 1 FROM part q
         WHERE q.p_retailprice <= p.p_retailprice
           AND q.p_size >= p.p_size
           AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
       ) AS on_skyline
FROM part p
""")
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of the part catalog — parts where no other part
    is both cheaper-or-equal and larger-or-equal (strictly better in at
    least one): the skyline operator (Börzsönyi et al., ICDE 2001,
    "maximal vectors"). The oracle states the O(n²) NOT EXISTS
    definition; the engine plan is the sort-based skyline: fold the
    catalog to one max-size row per price point (price-keyed
    map-combined aggregate, bounded by the price DOMAIN), one
    domain-sized ordered scan computing the running best size over all
    strictly-cheaper prices, then a price-keyed join back. A part is
    dominated iff a strictly-cheaper price reached its size
    (prev_max >= size) or its own price point has something bigger
    (size < gmax). No quadratic anywhere; the catalog shuffles once on
    price."""
    p = table(spark, sf_dir, "part")
    per_price = (p.groupBy("p_retailprice")
                 .agg(F.max("p_size").alias("gmax")))
    wp = (Window.orderBy("p_retailprice")
          .rowsBetween(Window.unboundedPreceding, -1))
    frontier = per_price.select(
        "p_retailprice", "gmax", F.max("gmax").over(wp).alias("prev_max"))
    dominated = (F.coalesce(F.col("prev_max") >= F.col("p_size"), F.lit(False))
                 | (F.col("p_size") < F.col("gmax")))
    return (p.join(frontier, "p_retailprice")
            .select("p_partkey", "p_retailprice", "p_size",
                    (~dominated).alias("on_skyline")))


@query("term_pmi", oracle="""
WITH tok AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))
           AS toks
  FROM documents
),
n AS (SELECT count(*) AS nd FROM tok),
ex AS (SELECT doc_id, unnest(toks) AS term FROM tok),
uni AS (SELECT term, count(*) AS c FROM ex GROUP BY 1),
pair AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS c_ab
  FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2
)
SELECT term_a, term_b, CAST(c_ab AS BIGINT) AS support,
       round(ln(CAST(c_ab AS DOUBLE) * nd / (ua.c * ub.c)), 4) AS pmi
FROM pair
JOIN uni ua ON ua.term = term_a
JOIN uni ub ON ub.term = term_b
CROSS JOIN n
WHERE c_ab >= 25
""")
def term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of term pairs co-occurring in the
    same document (Church & Hanks 1990) — the collocation/association
    miner behind phrase detection and topic seeding: pmi =
    ln(P(a,b) / P(a)P(b)) over document-level co-occurrence, reported
    with support ≥ 25 docs.

    Plan: per-doc DISTINCT terms explode once; the pair generation is a
    doc-keyed self-join whose per-doc cost is (distinct terms)² —
    bounded by per-document vocabulary, never corpus size — and the
    pair aggregate's key domain is vocab², naturally tiny relative to
    the corpus (heavy tails are bounded because both unigram and pair
    counts cap at n_docs). Unigram counts broadcast back into the
    vocab²-sized frame; everything after the explode is
    vocabulary-sized, the map-combined shape a 100 TB corpus needs.
    Counts are exact integers; the single ln() rides on exact ratios
    (the text_tfidf_topk precedent)."""
    d = (table(spark, sf_dir, "documents")
         .repartition(spark.sparkContext.defaultParallelism))
    tok = d.select("doc_id", F.array_distinct(
        F.filter(F.split("text", " "), lambda x: x != "")).alias("toks"))
    nd = tok.agg(F.count("*").alias("nd"))
    ex = tok.select("doc_id", F.explode("toks").alias("term"))
    uni = ex.groupBy("term").agg(F.count("*").alias("c"))
    ea = ex.select("doc_id", F.col("term").alias("term_a"))
    eb = ex.select("doc_id", F.col("term").alias("term_b"))
    pair = (ea.join(eb, "doc_id")
            .filter(F.col("term_a") < F.col("term_b"))
            .groupBy("term_a", "term_b").agg(F.count("*").alias("c_ab"))
            .filter(F.col("c_ab") >= 25))
    ua = uni.select(F.col("term").alias("term_a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("c").alias("cb"))
    return (pair.join(F.broadcast(ua), "term_a")
            .join(F.broadcast(ub), "term_b")
            .crossJoin(F.broadcast(nd))
            .select("term_a", "term_b",
                    F.col("c_ab").cast("bigint").alias("support"),
                    F.round(F.log(F.col("c_ab").cast("double") * F.col("nd")
                                  / (F.col("ca") * F.col("cb"))), 4)
                    .alias("pmi")))


@query("seq_pattern_topk", oracle="""
WITH seq AS (
  SELECT user_id, event_type AS a,
         lead(event_type, 1) OVER w AS b,
         lead(event_type, 2) OVER w AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pat AS (
  SELECT a, b, c, count(*) AS support
  FROM seq WHERE c IS NOT NULL GROUP BY 1, 2, 3
)
SELECT a, b, c, CAST(support AS BIGINT) AS support
FROM pat ORDER BY support DESC, a, b, c LIMIT 15
""")
def seq_pattern_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 most frequent 3-step event-type sequences across users —
    the order-2 extension of ``markov_transitions`` and the simplest
    member of the sequential-pattern-mining family (contiguous
    episodes, GSP/PrefixSpan's unit case): which behavioral paths
    dominate the log.

    Plan: one user-keyed sort window materializes each event's next two
    types (no sequence explosion — the window carries exactly two
    leads), then a |types|³-bounded map-combined aggregate and a
    top-k heap. The window and nothing else touches the full log; at
    100 TB the pattern space stays types³ regardless of corpus size."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"))
    return (seq.filter(F.col("c").isNotNull())
            .groupBy("a", "b", "c")
            .agg(F.count("*").cast("bigint").alias("support"))
            .orderBy(F.desc("support"), "a", "b", "c").limit(15))


@query("assoc_rules_brands", oracle="""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS bid, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
nb AS (SELECT count(DISTINCT bid) AS n FROM baskets),
items AS (SELECT item, count(*) AS n_item FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.item AS ant, b.item AS cons, count(*) AS n_ab
  FROM baskets a JOIN baskets b ON a.bid = b.bid AND a.item < b.item
  GROUP BY 1, 2
),
both_dir AS (
  SELECT ant, cons, n_ab FROM pairs
  UNION ALL
  SELECT cons, ant, n_ab FROM pairs
)
SELECT r.ant, r.cons, r.n_ab,
       ia.n_item AS n_ant,
       round(CAST(r.n_ab AS DOUBLE) / nb.n, 6) AS support,
       round(CAST(r.n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
       round(CAST(r.n_ab AS DOUBLE) * nb.n / (ia.n_item * ic.n_item), 6)
         AS lift
FROM both_dir r
JOIN items ia ON ia.item = r.ant
JOIN items ic ON ic.item = r.cons
CROSS JOIN nb
WHERE r.n_ab * 50 >= nb.n
""")
def assoc_rules_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (Agrawal-Srikant support/
    confidence/lift) over order baskets of part brands: which brands
    co-sell. Support threshold 2% compared in integers
    (n_ab·50 ≥ n_baskets); every ratio is ONE IEEE division over exact
    integer counts, so both engines agree bitwise.

    Plan shape: baskets dedup (one orderkey shuffle), then the pair
    count self-joins baskets ON the basket id — candidate volume is
    Σ|basket|², bounded by basket size (≈4 brands/order), never
    |vocab|²; item and basket totals are item-cardinality-sized
    broadcasts back onto the rule frame. The classic a-priori trick
    (prune items below min-support BEFORE pairing) is unnecessary here
    because baskets are tiny, but composes trivially as a semi-join on
    `items`."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    # ONE orderkey shuffle builds the basket arrays (collect_set dedups
    # in the same aggregate); pair generation is then a codegen'd
    # in-array double transform — no baskets⋈baskets self-join shuffle
    bl = (li.join(p, li["l_partkey"] == p["p_partkey"])
            .groupBy(F.col("l_orderkey").alias("bid"))
            .agg(F.sort_array(F.collect_set("p_brand")).alias("items"))
            .localCheckpoint(eager=False))
    nb = bl.agg(F.count("*").alias("n"))
    items = (bl.select(F.explode("items").alias("item"))
               .groupBy("item").agg(F.count("*").alias("n_item")))
    pair_arr = F.expr(
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), "
        "y -> struct(x AS ant, y AS cons))))")
    pairs = (bl.select(F.explode(pair_arr).alias("pr"))
               .groupBy(F.col("pr.ant").alias("ant"),
                        F.col("pr.cons").alias("cons"))
               .agg(F.count("*").alias("n_ab")))
    both = pairs.unionByName(
        pairs.select(F.col("cons").alias("ant"), F.col("ant").alias("cons"),
                     "n_ab"))
    ia = items.select(F.col("item").alias("ant"),
                      F.col("n_item").alias("n_ant"))
    ic = items.select(F.col("item").alias("cons"),
                      F.col("n_item").alias("n_cons"))
    return (both.join(F.broadcast(ia), "ant")
                .join(F.broadcast(ic), "cons")
                .crossJoin(F.broadcast(nb))
                .filter(F.col("n_ab") * 50 >= F.col("n"))
                .select("ant", "cons", "n_ab", "n_ant",
                        F.round(F.col("n_ab").cast("double") / F.col("n"), 6)
                         .alias("support"),
                        F.round(F.col("n_ab").cast("double")
                                / F.col("n_ant"), 6).alias("confidence"),
                        F.round(F.col("n_ab").cast("double") * F.col("n")
                                / (F.col("n_ant") * F.col("n_cons")), 6)
                         .alias("lift")))


@query("rolling_distinct_users", oracle="""
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM ud)
SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
""")
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the WAU product metric) —
    EXACT, without the two things that kill it at scale: the days×events
    range join and the per-day COUNT DISTINCT shuffle. Per user, merge
    activity days into disjoint coverage intervals [d, d+6] (a gap > 6
    days starts a new interval — one lag + conditional cumsum over the
    user's own days), then explode each interval into its covered days:
    (user, day) pairs are UNIQUE BY CONSTRUCTION (intervals are
    disjoint), so the per-day tally is a plain map-combined count — the
    trailing-window distinct-count becomes interval algebra. Days with
    no activity anywhere drop via one day-domain-sized broadcast
    semi-join (oracle semantics). Explode volume ≤ 7·|user-days|,
    linear in input."""
    from pyspark.sql import Window
    e = table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    gap = F.datediff(F.col("day"), F.lag("day").over(w))
    marked = ud.withColumn(
        "new_iv", F.when(gap.isNull() | (gap > 6), 1).otherwise(0))
    ivd = marked.withColumn(
        "iv", F.sum("new_iv").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    spans = (ivd.groupBy("user_id", "iv")
                .agg(F.min("day").alias("lo"),
                     F.date_add(F.max("day"), 6).alias("hi")))
    cover = spans.select(
        "user_id", F.explode(F.expr("sequence(lo, hi)")).alias("day"))
    days = ud.select("day").distinct()
    return (cover.join(F.broadcast(days), "day")
                 .groupBy("day").agg(F.count("*").alias("wau")))


_HOLT_SCHEMA = ("user_id long, rn int, level double, trend double, "
                "fcast3 double")


def _holt_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # constants written literally (0.3/0.7, 0.2/0.8) and the expression
    # shapes mirrored in the oracle CTE exactly — IEEE bit parity before
    # the output rounding (the ewma_smooth discipline)
    pdf = pdf.sort_values(["ts", "event_id"])
    x = pdf["value"].to_numpy(dtype=np.float64)
    n = len(x)
    lev = np.empty(n); trd = np.empty(n)
    l = b = 0.0
    for i, v in enumerate(x):
        if i == 0:
            l, b = float(v), 0.0
        else:
            lp = l
            l = 0.3 * v + 0.7 * (l + b)
            b = 0.2 * (l - lp) + 0.8 * b
        lev[i], trd[i] = l, b

    def r4(a):
        return np.copysign(np.floor(np.abs(a) * 1e4 + 0.5), a) / 1e4

    return pd.DataFrame({
        "user_id": pdf["user_id"].to_numpy(),
        "rn": np.arange(1, n + 1, dtype=np.int32),
        "level": r4(lev), "trend": r4(trd), "fcast3": r4(lev + 3.0 * trd),
    })


@query("holt_linear_smooth", oracle="""
WITH RECURSIVE seq AS (
  SELECT user_id, value,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS INT) AS rn
  FROM events
),
h AS (
  SELECT user_id, rn, CAST(value AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn,
         0.3 * s.value + 0.7 * (h.l + h.b),
         0.2 * ((0.3 * s.value + 0.7 * (h.l + h.b)) - h.l) + 0.8 * h.b
  FROM seq s JOIN h ON s.user_id = h.user_id AND s.rn = h.rn + 1
)
SELECT user_id, rn, round(l, 4) AS level, round(b, 4) AS trend,
       round(l + 3.0 * b, 4) AS fcast3
FROM h
""")
def holt_linear_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt's linear (double) exponential smoothing — level +
    trend recurrence (α=0.3, β=0.2, trend seeded 0) with a 3-step-ahead
    forecast, the standard short-horizon baseline forecaster. Like
    ``ewma_smooth``, the math is sequential WITHIN a key, so the honest
    distributed shape is applyInPandas per user (parallel across keys,
    one Arrow batch per group, two running scalars of state); the
    oracle's recursive CTE computes the bit-identical coupled double
    recurrence — the level expression is textually inlined into the
    trend update in BOTH engines so evaluation order cannot drift."""
    e = table(spark, sf_dir, "events")
    # same AQE-coalesce exemption as ewma_smooth: size the exchange for
    # the Python recurrence, not the bytes
    n = spark.sparkContext.defaultParallelism
    return (e.select("user_id", "ts", "event_id", "value")
            .repartition(n, "user_id")
            .groupBy("user_id")
            .applyInPandas(_holt_group, _HOLT_SCHEMA))


@query("pattern_click_burst", oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS s
  FROM events GROUP BY 1
),
m AS (
  SELECT user_id, regexp_extract_all(s, 'c+p') AS hits FROM seq
)
SELECT user_id,
       CAST(len(hits) AS BIGINT) AS n_episodes,
       CAST(coalesce(list_max(list_transform(hits, x -> length(x) - 1)), 0)
            AS BIGINT) AS longest_burst
FROM m
""")
def pattern_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence pattern detection: per user, count
    episodes of ≥1 clicks IMMEDIATELY followed by a purchase (no
    intervening event of any other type) and the longest such click
    burst — the row-pattern query SQL standardized as MATCH_RECOGNIZE
    and Spark lacks. Each user's event-type sequence folds to a
    character string inside one keyed aggregate (initials are distinct
    across the five types), then the pattern is a codegen'd regex over
    that string: matching cost is sequence-length-bounded per user,
    parallel across users, one corpus shuffle total. The general
    operator shape handles any regular pattern (the A{2,}B? class) by
    the same fold-then-regex plan."""
    e = table(spark, sf_dir, "events")
    pair = F.struct("ts", "event_id",
                    F.substring("event_type", 1, 1).alias("ini"))
    seq = (e.groupBy("user_id")
            .agg(F.array_join(
                F.transform(F.sort_array(F.collect_list(pair)),
                            lambda x: x["ini"]), "").alias("s")))
    hits = F.expr("regexp_extract_all(s, 'c+p', 0)")
    longest = F.coalesce(
        F.array_max(F.transform(hits, lambda x: F.length(x) - 1)),
        F.lit(0))
    return seq.select(
        "user_id",
        F.size(hits).cast("long").alias("n_episodes"),
        longest.cast("long").alias("longest_burst"))


@query("er_blocked_linkage", oracle="""
WITH a AS (
  SELECT c_custkey AS a_key, c_name AS name, c_mktsegment AS seg,
         c_nationkey AS nk,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
b AS (
  SELECT c_custkey AS b_key, c_nationkey AS nk,
         substr(c_name, 1, 9 + (c_custkey % 9)) || 'X'
           || substr(c_name, 11 + (c_custkey % 9)) AS name,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
           + (c_custkey % 7) - 3 AS cents
  FROM customer
),
px(r) AS (VALUES (1), (2)),
off(o) AS (VALUES (0), (500)),
cand AS (
  SELECT DISTINCT a.a_key, b.b_key
  FROM a CROSS JOIN px CROSS JOIN off
  JOIN b ON a.nk = b.nk
        AND CASE px.r WHEN 1 THEN substr(a.name, 11, 4)
                      ELSE substr(a.name, 15, 4) END
          = CASE px.r WHEN 1 THEN substr(b.name, 11, 4)
                      ELSE substr(b.name, 15, 4) END
        -- +200000 keeps the band operand positive (acctbal can be
        -- negative; DuckDB // floors, Spark DIV truncates — they only
        -- agree on non-negative operands)
        AND (a.cents + 200000 + off.o) // 1000
          = (b.cents + 200000 + off.o) // 1000
),
scored AS (
  SELECT c.a_key, c.b_key,
         CASE levenshtein(a.name, b.name)
              WHEN 0 THEN 4 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 0 END
         + CASE WHEN b.seg IS NULL THEN 1
                WHEN a.seg = b.seg THEN 2 ELSE 0 END
         + CASE WHEN abs(a.cents - b.cents) <= 3 THEN 2
                WHEN abs(a.cents - b.cents) <= 100 THEN 1
                ELSE 0 END AS score
  FROM cand c JOIN a ON c.a_key = a.a_key JOIN b ON c.b_key = b.b_key
)
SELECT a_key, b_key, CAST(score AS INT) AS score,
       CASE WHEN score >= 6 THEN 'match' ELSE 'possible' END AS cls
FROM scored WHERE score >= 4
""")
def er_blocked_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage (Fellegi-Sunter shape):
    link the clean customer register against a deterministic "dirty CRM
    extract" of itself (one character corrupted at a key-derived
    position, 20% of segments nulled, balances jittered a few cents) by
    MULTI-PASS BLOCKING + weighted field agreement — the classic ER
    pipeline, all in exact integers (levenshtein distance, null-aware
    segment agreement, cent-difference bands) so both engines score
    identically.

    Multi-pass COMPOUND blocking is the load-bearing idea. One blocking
    key cannot survive a corruption inside it, so candidates come from
    four passes = {two disjoint name regions (suffix digits 2-5, 6-9)}
    x {two $10 balance bandings offset by half a band}: a corrupted
    character breaks at most one name region, and a <=3-cent jitter can
    straddle a band boundary of at most one of the two shifted bandings
    (their boundaries sit 497+ cents apart), so every true pair under
    the declared corruption model survives at least one (region,
    banding) pass — the recall guarantee, proven per pass-dimension.
    The compound second field is what keeps blocks bounded: the leading
    name region is all zero-padding at realistic key ranges (a
    degenerate hot block — measured 4.5M candidates and 7.7 s at sf0.1
    on name-only blocking), and conjoining the balance band shrinks it
    to band-population size (0.9 s, same true links). That is the
    classic production trade: compound keys buy block-size control at
    the price of recall OUTSIDE the modeled corruption (a record whose
    balance moved dollars would need a dedicated pass). All four
    passes ride ONE equi-join via an exploded (pass, key) column.
    Classification: score >= 6 'match', 4-5 'possible' (the
    Fellegi-Sunter two-threshold decision), rest suppressed."""
    c = table(spark, sf_dir, "customer")
    cents = F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
    a = c.select(F.col("c_custkey").alias("a_key"),
                 F.col("c_name").alias("a_name"),
                 F.col("c_mktsegment").alias("a_seg"),
                 F.col("c_nationkey").alias("nk"),
                 cents.alias("a_cents"))
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_nationkey").alias("nk"),
        F.expr("concat(substring(c_name, 1, 9 + (c_custkey % 9)), 'X', "
               "substring(c_name, 11 + (c_custkey % 9)))").alias("b_name"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
         .otherwise(F.col("c_mktsegment")).alias("b_seg"),
        (cents + F.col("c_custkey") % 7 - 3).alias("b_cents"))

    def blocks(name_col, cents_col):
        # (region, banding-offset) compound keys; +200000 keeps the
        # band operand positive (Spark DIV truncates, DuckDB // floors
        # — they only agree on non-negative operands)
        parts = []
        for r, (pos, ln) in ((1, (11, 4)), (2, (15, 4))):
            for o in (0, 500):
                parts.append(F.struct(
                    F.lit(r).alias("r"), F.lit(o).alias("o"),
                    F.substring(name_col, pos, ln).alias("k"),
                    ((cents_col + 200000 + o) / F.lit(1000))
                    .cast("long").alias("band")))
        return F.explode(F.array(*parts)).alias("blk")

    ab = a.select("a_key", "a_name", "a_seg", "nk", "a_cents",
                  blocks(F.col("a_name"), F.col("a_cents")))
    bb = b.select("b_key", "b_name", "b_seg",
                  F.col("nk").alias("b_nk"), "b_cents",
                  blocks(F.col("b_name"), F.col("b_cents")).alias("b_blk"))
    cand = (ab.join(bb, (F.col("nk") == F.col("b_nk"))
                    & (F.col("blk") == F.col("b_blk")))
              .dropDuplicates(["a_key", "b_key"]))
    lev = F.levenshtein(F.col("a_name"), F.col("b_name"))
    score = (
        F.when(lev == 0, 4).when(lev == 1, 3).when(lev == 2, 1).otherwise(0)
        + F.when(F.col("b_seg").isNull(), 1)
           .when(F.col("a_seg") == F.col("b_seg"), 2).otherwise(0)
        + F.when(F.abs(F.col("a_cents") - F.col("b_cents")) <= 3, 2)
           .when(F.abs(F.col("a_cents") - F.col("b_cents")) <= 100, 1)
           .otherwise(0))
    return (cand.withColumn("score", score.cast("int"))
                .filter(F.col("score") >= 4)
                .select("a_key", "b_key", "score",
                        F.when(F.col("score") >= 6, "match")
                         .otherwise("possible").alias("cls")))


@query("skipgram_cooc", oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
           AS toks
  FROM documents
),
p1 AS (
  SELECT doc_id, unnest(list_zip(toks, toks[2:])) AS z FROM tok
),
p2 AS (
  SELECT doc_id, unnest(list_zip(toks, toks[3:])) AS z FROM tok
),
pairs AS (
  SELECT z[1] AS a, z[2] AS b FROM p1
  UNION ALL
  SELECT z[1] AS a, z[2] AS b FROM p2
),
c AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c
  FROM pairs WHERE b IS NOT NULL GROUP BY 1, 2
)
SELECT a, b, c FROM c
ORDER BY c DESC, a, b LIMIT 100
""")
def skipgram_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence pair extraction (window ±2, direction
    preserved) — the training-pair generator of word2vec/GloVe-style
    embedding pipelines, and the POSITIONAL complement to term_pmi's
    document-level co-occurrence. No self-join and no positions
    table: the d-offset pairs fall out of zipping each token array
    with its own d-shifted slice (arrays_zip pads the tail with NULL
    in BOTH engines — the pad rows are filtered), so pair generation
    is a pure per-row explode, embarrassingly parallel, linear in
    corpus tokens × window size. Counts are exact; the top-100 is
    TakeOrderedAndProject on (count DESC, pair) — fully
    deterministic."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    tok = d.select(toks.alias("toks"))
    pairs = []
    for dd in (1, 2):
        z = tok.select(F.explode(F.arrays_zip(
            F.col("toks"),
            F.slice(F.col("toks"), dd + 1,
                    F.greatest(F.size("toks") - dd, F.lit(0)))))
            .alias("z"))
        pairs.append(z.select(F.col("z.toks").alias("a"),
                              F.col("z.1").alias("b")))
    c = (pairs[0].unionByName(pairs[1])
         .filter(F.col("b").isNotNull())
         .groupBy("a", "b").agg(F.count("*").alias("c")))
    return c.orderBy(F.desc("c"), "a", "b").limit(100)


_JACCARD_DEG_CAP = 64


def capped_neighborhoods(edges: DataFrame, key: str, item: str, cap: int,
                         salts: int = 1) -> DataFrame:
    """(key, ss) with ``ss`` = the ``cap`` deterministically-sampled
    items of each key's neighborhood, sorted — rank by md5(key:item),
    the engine-portable keyed coin flip (identical hex ordering in
    DuckDB oracles). The degree-capping/DIMSUM discipline that bounds
    downstream pair work to |keys|·cap² no matter how fat the whales
    get, fused into aggregates only: no row_number window exchange, no
    extra passes over the edge list.

    ``salts=1`` (default): ONE key-keyed aggregate — the right plan
    whenever single-key neighborhoods fit an aggregation buffer (true
    for any catalog-bounded item domain; collect_list falls back to
    sort-based spilling under memory pressure, but the finished array
    for one key must fit in memory). ``salts=k``: a two-phase
    salt-split for genuinely unbounded neighborhoods — phase 1 caps
    within (key, md5-salt) sub-buckets (buffers shrink ~k×), phase 2
    merges the ≤k sliced arrays per key (buffer ≤ k·cap structs,
    BOUNDED). Selection is exact and salt-invariant: every member of
    the global cap-smallest set is also within its own salt bucket's
    cap-smallest (property-tested for equality with salts=1). Cost of
    the bound: one extra (key-local) exchange — pay it when the item
    domain makes single-key arrays a memory hazard, not before."""
    hcol = F.md5(F.concat_ws(":", F.col(key).cast("string"),
                             F.col(item).cast("string")))
    hs = F.struct(hcol.alias("h"), F.col(item).alias("s"))
    capped = F.slice(F.array_sort(F.collect_list(hs)), 1, cap)
    if salts == 1:
        per_key = edges.groupBy(key).agg(capped.alias("hs"))
    else:
        lvl1 = (edges
                .groupBy(key, F.pmod(F.crc32(F.col(item).cast("string")),
                                     F.lit(salts)).alias("_salt"))
                .agg(capped.alias("hs1")))
        per_key = (lvl1.groupBy(key)
                   .agg(F.slice(F.array_sort(
                            F.flatten(F.collect_list("hs1"))),
                        1, cap).alias("hs")))
    return per_key.select(key, F.array_sort(F.col("hs.s")).alias("ss"))


@query("recsys_item_jaccard", oracle=f"""
WITH edges0 AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT c, s FROM (
    SELECT c, s, row_number() OVER (
      PARTITION BY c
      ORDER BY md5(CAST(c AS VARCHAR) || ':' || CAST(s AS VARCHAR)), s
    ) AS rn
    FROM edges0)
  WHERE rn <= {_JACCARD_DEG_CAP}
),
deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
cooc AS (
  SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS c_ab
  FROM edges a JOIN edges b ON a.c = b.c AND a.s < b.s
  GROUP BY 1, 2
  HAVING count(*) >= 5
),
j AS (
  SELECT s1, s2, c_ab, d1.d AS d1, d2.d AS d2,
         CAST((2 * 1000000 * c_ab + (d1.d + d2.d - c_ab))
              // (2 * (d1.d + d2.d - c_ab)) AS BIGINT) AS jaccard_ppm
  FROM cooc JOIN deg d1 ON d1.s = cooc.s1 JOIN deg d2 ON d2.s = cooc.s2
)
SELECT s1, s2, c_ab, d1, d2, jaccard_ppm
FROM j ORDER BY jaccard_ppm DESC, s1, s2 LIMIT 100
""")
def recsys_item_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity: top-100 supplier
    pairs by exact Jaccard of their customer neighborhoods
    (|A∩B| / |A∪B| in half-away ppm, support ≥ 5 shared customers) —
    the classic co-occurrence recommender primitive ("customers who
    buy from X also buy from Y"). Co-occurrence pairs ride Σdeg² per
    customer — the whale-customer mitigation is SHIPPED, not just
    named: every customer neighborhood is capped to a deterministic
    uniform sample of {_JACCARD_DEG_CAP} suppliers
    (``capped_neighborhoods``: rank by md5(c:s) — an engine-portable
    keyed coin flip, identical hex ordering in the oracle), the
    DIMSUM/degree-capping discipline that bounds pair work to
    |C|·CAP² no matter how fat the whales get. Cap and pair
    generation are FUSED into aggregates (collect→sort→slice→
    array-local ordered-pair expansion), so the whole candidate stage
    is one shuffle by c — no row_number window exchange, no Σdeg²-row
    sort-merge self-join; supplier catalogs bound single-key arrays
    here, and for genuinely unbounded item domains the helper's
    salts=k two-phase keeps every aggregation buffer ≤ k·CAP structs
    (selection provably salt-invariant, property-tested). Degrees and
    co-occurrence both come from the SAME capped edge set, so
    Jaccard stays internally consistent (≤ 1) and the statistic is
    exact over the sampled neighborhoods. The support filter prunes
    the pair frame BEFORE degrees join back (two broadcast-able
    degree joins) and the top-100 is TakeOrderedAndProject. All
    counts exact integers."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    edges0 = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
               .select(F.col("o_custkey").alias("c"),
                       F.col("l_suppkey").alias("s"))
               .distinct())
    per_c = (capped_neighborhoods(edges0, "c", "s", _JACCARD_DEG_CAP)
             .localCheckpoint(eager=False))
    edges = per_c.select("c", F.explode("ss").alias("s"))
    deg = edges.groupBy("s").agg(F.count("*").alias("d"))
    pairs = per_c.select(F.explode(F.expr(
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), "
        "y -> struct(x AS s1, y AS s2))))")).alias("p"))
    cooc = (pairs.select("p.s1", "p.s2")
            .groupBy("s1", "s2").agg(F.count("*").alias("c_ab"))
            .filter(F.col("c_ab") >= 5))
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("d2"))
    j = (cooc.join(F.broadcast(d1), "s1").join(F.broadcast(d2), "s2")
         .select("s1", "s2", "c_ab", "d1", "d2",
                 F.expr("CAST((2 * 1000000 * c_ab + (d1 + d2 - c_ab)) "
                        "DIV (2 * (d1 + d2 - c_ab)) AS BIGINT)")
                  .alias("jaccard_ppm")))
    return j.orderBy(F.desc("jaccard_ppm"), "s1", "s2").limit(100)


# O·ln(O·N / (R·C)) quantized half-away to integer micro-nats; zero
# cells contribute exactly 0 (the lim x->0 x·ln x convention)
_LLR_T = ("CASE WHEN {o} = 0 THEN 0 ELSE "
          "CAST(floor({o} * ln(CAST({o} AS DOUBLE) * n "
          "/ (CAST({r} AS DOUBLE) * {c})) * 1000000 + 0.5) "
          "AS BIGINT) END")


@query("collocation_llr", oracle=f"""
WITH tok AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
bg AS (
  SELECT z[1] AS a, z[2] AS b
  FROM (SELECT unnest(list_zip(toks, toks[2:])) AS z FROM tok)
  WHERE z[2] IS NOT NULL
),
c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o11
      FROM bg GROUP BY 1, 2),
ra AS (SELECT a, CAST(sum(o11) AS BIGINT) AS r1 FROM c GROUP BY 1),
cb AS (SELECT b, CAST(sum(o11) AS BIGINT) AS c1 FROM c GROUP BY 1),
nn AS (SELECT CAST(sum(o11) AS BIGINT) AS n FROM c),
f AS (
  SELECT c.a, c.b, o11, r1, c1, n,
         r1 - o11 AS o12, c1 - o11 AS o21,
         n - r1 - c1 + o11 AS o22
  FROM c JOIN ra ON ra.a = c.a JOIN cb ON cb.b = c.b CROSS JOIN nn
  WHERE o11 >= 25
),
g AS (
  SELECT a, b, o11, r1, c1,
         2 * ({_LLR_T.format(o='o11', r='r1', c='c1')}
              + {_LLR_T.format(o='o12', r='r1', c='(n - c1)')}
              + {_LLR_T.format(o='o21', r='(n - r1)', c='c1')}
              + {_LLR_T.format(o='o22', r='(n - r1)', c='(n - c1)')})
           AS llr_e6
  FROM f
)
SELECT a, b, o11, r1, c1, llr_e6
FROM g ORDER BY llr_e6 DESC, a, b LIMIT 50
""")
def collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation strength by Dunning's log-likelihood ratio (G², the
    1993 standard that fixes PMI's rare-pair bias — `term_pmi` ranks
    hapax pairs absurdly high, G² weights by evidence): for each
    adjacent bigram with support ≥ 25, the 2×2 contingency G² =
    2·ΣO·ln(O·N/(R·C)) against the independence expectation, top-50.
    Bigrams come from the zip-shift explode (no positions table);
    margins are two pair-frame aggregates; every ln term is quantized
    half-away to INTEGER micro-nats (zero cells contribute exactly 0,
    the x·ln x limit) so G² is an exact integer and the ranking —
    ORDER BY llr_e6 — cannot straddle across engines. One corpus
    explode + vocab²-bounded pair frames; top-50 is
    TakeOrderedAndProject."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    tok = d.select(toks.alias("toks"))
    z = tok.select(F.explode(F.arrays_zip(
        F.col("toks"),
        F.slice(F.col("toks"), 2,
                F.greatest(F.size("toks") - 1, F.lit(0))))).alias("z"))
    bg = (z.select(F.col("z.toks").alias("a"), F.col("z.1").alias("b"))
           .filter(F.col("b").isNotNull()))
    c = (bg.groupBy("a", "b").agg(F.count("*").alias("o11"))
         .localCheckpoint(eager=False))
    ra = c.groupBy("a").agg(F.sum("o11").alias("r1"))
    cb = c.groupBy("b").agg(F.sum("o11").alias("c1"))
    nn = c.agg(F.sum("o11").alias("n"))
    f = (c.filter(F.col("o11") >= 25)
         .join(ra, "a").join(cb, "b").crossJoin(F.broadcast(nn))
         .withColumn("o12", F.expr("r1 - o11"))
         .withColumn("o21", F.expr("c1 - o11"))
         .withColumn("o22", F.expr("n - r1 - c1 + o11")))
    llr = (F.expr(_LLR_T.format(o="o11", r="r1", c="c1"))
           + F.expr(_LLR_T.format(o="o12", r="r1", c="(n - c1)"))
           + F.expr(_LLR_T.format(o="o21", r="(n - r1)", c="c1"))
           + F.expr(_LLR_T.format(o="o22", r="(n - r1)", c="(n - c1)")))
    g = f.select("a", "b", "o11", "r1", "c1",
                 (2 * llr).alias("llr_e6"))
    return g.orderBy(F.desc("llr_e6"), "a", "b").limit(50)


# ln P quantized to integer micro-nats per (a, b) CELL — the 5x5
# transition domain is bounded, so one ln per cell, order-free sums
_MKV_LNP_E6 = ("CAST(floor(ln((CAST(c_tr AS DOUBLE) + 1.0) "
               "/ (CAST(c_a AS DOUBLE) + 5.0)) * 1000000 + 0.5) "
               "AS BIGINT)")


@query("markov_perplexity", oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS a, ts,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS b,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS bt
  FROM events
),
mid AS (
  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT)
           AS m
  FROM events
),
tr AS (
  SELECT a, b, (epoch_us(bt) < m) AS is_train
  FROM seq, mid WHERE b IS NOT NULL
),
trn AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_tr
  FROM tr WHERE is_train GROUP BY 1, 2
),
ta AS (SELECT a, CAST(sum(c_tr) AS BIGINT) AS c_a FROM trn GROUP BY 1),
ev AS (
  SELECT tr.a, tr.b, CAST(count(*) AS BIGINT) AS c_ev
  FROM tr WHERE NOT is_train GROUP BY 1, 2
),
cell AS (
  SELECT ev.a, ev.b, ev.c_ev,
         coalesce(trn.c_tr, 0) AS c_tr, coalesce(ta.c_a, 0) AS c_a
  FROM ev LEFT JOIN trn ON trn.a = ev.a AND trn.b = ev.b
          LEFT JOIN ta ON ta.a = ev.a
),
ll AS (
  SELECT CAST(sum(c_ev) AS BIGINT) AS n_eval,
         CAST(sum(c_ev * {_MKV_LNP_E6}) AS BIGINT) AS ll_e6
  FROM cell
),
nt AS (SELECT CAST(sum(c_tr) AS BIGINT) AS n_train FROM trn)
SELECT nt.n_train, ll.n_eval,
       CAST((2 * (-ll.ll_e6) + ll.n_eval) // (2 * ll.n_eval) AS BIGINT)
         AS avg_nll_e6,
       CAST(round(exp(CAST((2 * (-ll.ll_e6) + ll.n_eval)
                           // (2 * ll.n_eval) AS DOUBLE) / 1000000.0)
                  * 1000000, 0) AS BIGINT) AS ppl_e6
FROM nt, ll
""")
def markov_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity of a first-order Markov next-event model —
    the sequence-model evaluation loop in miniature (train on the
    first half of the timeline, score the second half): transitions
    are per-user consecutive event pairs (lead window), the model is
    add-one-smoothed P(b|a) over the 5-type domain, and the held-out
    log-likelihood is exact integer micro-nats because ln P is
    quantized ONCE PER (a,b) CELL (≤25 cells — the transition domain
    is bounded, so no per-row float exists at all); avg NLL is
    half-away on the nonnegative numerator and perplexity is one
    shared-text exp chain. Unseen eval transitions get the smoothed
    floor 1/(c_a+5), never −inf. Plan: one user-keyed lead window,
    two cell-sized rollups, 1-row folds — the corpus is touched
    once."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", F.col("event_type").alias("a"), "ts",
                   F.lead("event_type").over(w).alias("b"),
                   F.lead("ts").over(w).alias("bt"))
    mid = e.agg(F.expr(
        "CAST((min(unix_micros(ts)) + max(unix_micros(ts))) div 2 "
        "AS BIGINT)").alias("m"))
    tr = (seq.filter(F.col("b").isNotNull())
          .crossJoin(F.broadcast(mid))
          .select("a", "b",
                  (F.unix_micros("bt") < F.col("m")).alias("is_train"))
          .localCheckpoint(eager=False))
    trn = (tr.filter("is_train").groupBy("a", "b")
           .agg(F.count("*").alias("c_tr")))
    ta = trn.groupBy("a").agg(F.sum("c_tr").alias("c_a"))
    ev = (tr.filter(~F.col("is_train")).groupBy("a", "b")
          .agg(F.count("*").alias("c_ev")))
    cell = (ev.join(F.broadcast(trn), ["a", "b"], "left")
            .join(F.broadcast(ta), "a", "left")
            .select("a", "b", "c_ev",
                    F.coalesce("c_tr", F.lit(0)).alias("c_tr"),
                    F.coalesce("c_a", F.lit(0)).alias("c_a")))
    ll = cell.agg(
        F.sum("c_ev").alias("n_eval"),
        F.sum(F.col("c_ev") * F.expr(_MKV_LNP_E6)).alias("ll_e6"))
    nt = trn.agg(F.sum("c_tr").alias("n_train"))
    return (nt.crossJoin(F.broadcast(ll))
            .select("n_train", "n_eval",
                    F.expr("CAST((2 * (-ll_e6) + n_eval) DIV (2 * n_eval)"
                           " AS BIGINT)").alias("avg_nll_e6"),
                    F.expr("CAST(round(exp(CAST((2 * (-ll_e6) + n_eval) "
                           "DIV (2 * n_eval) AS DOUBLE) / 1000000.0) "
                           "* 1000000, 0) AS BIGINT)").alias("ppl_e6")))
