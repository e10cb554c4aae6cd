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
    return (e.select("user_id", "ts", "event_id", "value")
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
