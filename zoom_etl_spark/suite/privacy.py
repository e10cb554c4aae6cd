"""Privacy / compliance operators — the release-gating layer a
warehouse needs before person-level extracts leave the platform:
k-anonymity + l-diversity auditing over a quasi-identifier set, and
global-recoding generalization that picks the finest band ladder rung
satisfying the k constraint.

Generalizes the reference's credential-hygiene stance (reference
src/zoom/oauth.py keeps secrets out of band; src/zoom/transform.py
strips payloads to a fixed projection) from secret-handling to
person-level re-identification risk: the reference pipeline lands
user rows (create_tables.sql users/participants with emails) that a
real deployment could not re-share without exactly these audits.

Engine-exactness: every statistic here is an integer count over
integer-banded quasi-identifiers; account balances are shifted to a
nonnegative cent grid BEFORE band division because Spark's `div`
truncates while DuckDB's `//` floors — they disagree on negatives
(the attribution_multi_touch lesson).

Scale posture: everything is groupBy over the quasi-identifier space
(map-combined, bounded by the QI domain, never by row count); the
ladder evaluates all rungs in ONE pass by exploding each row into
|ladder| banded copies — a 5x map-side fan-out, no extra scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# nonnegative shift for cent-banded balances: c_acctbal >= -1000.00 in
# every TPC-H scale (spec lower bound -999.99)
_SHIFT = 100000
_K = 5
_LADDER = [500, 1000, 2500, 5000, 20000]  # band width in balance units


@query("dq_k_anonymity", oracle=f"""
WITH s AS (
  SELECT o.o_custkey AS k, o.o_orderpriority AS pri,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders o GROUP BY 1, 2
),
dom AS (
  SELECT k, pri FROM (
    SELECT k, pri,
           row_number() OVER (PARTITION BY k ORDER BY cnt DESC, pri) AS rn
    FROM s) WHERE rn = 1
),
q AS (
  SELECT c.c_custkey,
         CAST(c.c_nationkey AS INT) AS nationkey,
         c.c_mktsegment AS segment,
         CAST((CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) + {_SHIFT})
              // 100000 AS BIGINT) AS bal_band,
         coalesce(dom.pri, 'NONE') AS sensitive
  FROM customer c LEFT JOIN dom ON c.c_custkey = dom.k
)
SELECT nationkey, segment, bal_band,
       CAST(count(*) AS BIGINT) AS class_size,
       CAST(count(DISTINCT sensitive) AS BIGINT) AS l_diversity,
       (count(*) < {_K}) AS k_violation,
       (count(DISTINCT sensitive) < 2) AS l_violation
FROM q GROUP BY 1, 2, 3
""")
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity audit of the customer extract
    (Sweeney 2002 / Machanavajjhala 2007): quasi-identifiers =
    (nation, market segment, $1000 balance band) — the columns an
    adversary can link from outside — and the sensitive attribute is
    each customer's DOMINANT order priority (deterministic max-count
    with lexicographic tie-break; customers without orders audit as
    'NONE'). Per equivalence class: size k, distinct-sensitive count
    l, and violation flags (k < 5 → re-identifiable to fewer than 5
    candidates; l < 2 → homogeneity attack succeeds even at k >= 5
    because EVERY member shares the sensitive value). Balance bands
    divide on the +$1000-shifted nonneg cent grid (Spark div
    truncates, DuckDB // floors — they differ below zero). Plan: one
    orders rollup for the dominant attribute (groupBy + per-customer
    top-1 window), one broadcast-sized left join onto customers, one
    QI-domain-bounded aggregate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = (o.groupBy(F.col("o_custkey").alias("k"),
                   F.col("o_orderpriority").alias("pri"))
          .agg(F.count("*").alias("cnt")))
    from pyspark.sql import Window
    w = Window.partitionBy("k").orderBy(F.col("cnt").desc(), "pri")
    dom = (s.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select("k", "pri"))
    q = (c.join(dom, c.c_custkey == dom.k, "left")
          .select(
              F.col("c_nationkey").cast("int").alias("nationkey"),
              F.col("c_mktsegment").alias("segment"),
              F.expr(f"CAST((CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"
                     f" + {_SHIFT}) div 100000 AS BIGINT)")
               .alias("bal_band"),
              F.coalesce("pri", F.lit("NONE")).alias("sensitive")))
    return (q.groupBy("nationkey", "segment", "bal_band")
             .agg(F.count("*").alias("class_size"),
                  F.countDistinct("sensitive").alias("l_diversity"))
             .select("nationkey", "segment", "bal_band", "class_size",
                     "l_diversity",
                     (F.col("class_size") < _K).alias("k_violation"),
                     (F.col("l_diversity") < 2).alias("l_violation")))


@query("privacy_generalize_ladder", oracle=f"""
WITH b AS (
  SELECT c_custkey,
         CAST(c_nationkey AS INT) AS nationkey,
         c_mktsegment AS segment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + {_SHIFT} AS sc
  FROM customer
),
l AS (
  SELECT CAST(w AS BIGINT) AS w
  FROM (VALUES ({'),('.join(str(w) for w in _LADDER)})) AS t(w)
),
g AS (
  SELECT l.w, b.nationkey, b.segment, b.sc // (l.w * 100) AS band,
         CAST(count(*) AS BIGINT) AS k
  FROM b, l GROUP BY 1, 2, 3, 4
),
m AS (
  SELECT w, min(k) AS min_k FROM g GROUP BY 1
),
pick AS (
  SELECT coalesce(min(w) FILTER (WHERE min_k >= {_K}),
                  (SELECT max(w) FROM l)) AS w
  FROM m
)
SELECT g.w AS width, g.nationkey, g.segment, g.band, g.k
FROM g JOIN pick ON g.w = pick.w
""")
def privacy_generalize_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-recoding generalization for k-anonymity: widen the
    balance-band quasi-identifier up a FIXED ladder (500 → 1000 →
    2500 → 5000 → 20000 balance units) and release at the FINEST rung
    where every (nation, segment, band) class reaches k >= 5 — the
    single-dimension core of Samarati's full-domain generalization
    (no rung satisfies k → the coarsest rung ships, the audit query
    above still flags it). Deterministic and engine-exact: bands
    divide the +$1000-shifted nonneg integer cent grid. Plan: ONE
    scan fans each row into |ladder| = 5 banded copies (map-side
    explode via the ladder cross join), one QI-domain-bounded
    aggregate covers every rung simultaneously, a 5-row min picks the
    rung, and the released table is an equi-join of the already-built
    class counts against that 1-row pick — evaluating the whole
    ladder costs one shuffle, not |ladder| scans."""
    c = table(spark, sf_dir, "customer")
    b = c.select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(f"CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + {_SHIFT}")
         .alias("sc"))
    ladder = spark.createDataFrame([(w,) for w in _LADDER], "w long")
    g = (b.crossJoin(F.broadcast(ladder))
          .groupBy("w", "nationkey", "segment",
                   F.expr("sc div (w * 100)").alias("band"))
          .agg(F.count("*").alias("k")))
    m = g.groupBy("w").agg(F.min("k").alias("min_k"))
    pick = m.agg(
        F.coalesce(F.min(F.when(F.col("min_k") >= _K, F.col("w"))),
                   F.max("w")).alias("w"))
    return (g.join(F.broadcast(pick), "w")
             .select(F.col("w").alias("width"), "nationkey", "segment",
                     "band", "k"))


# discrete-Laplace release at epsilon = 1: alpha = e^-1, so the inverse
# geometric CDF collapses to floor(-ln(1-u)) — no alpha constant to
# transcribe. Two independent uniforms per cell come from Knuth
# multiplicative hashes of a cell fingerprint on the 2^32 grid.
_DP_U = ("(CAST((ck * {mult}) % 4294967296 AS DOUBLE) + 0.5) "
         "/ 4294967296.0")
_DP_G = "CAST(floor(-ln(1.0 - ({u}))) AS BIGINT)"


@query("privacy_dp_counts", oracle=f"""
WITH cell AS (
  SELECT CAST(c_nationkey AS INT) AS nationkey,
         c_mktsegment AS segment,
         CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
),
keyed AS (
  SELECT nationkey, segment, n,
         CAST(nationkey * 131 + ascii(substr(segment, 1, 1)) * 7
              + length(segment) AS BIGINT) AS ck
  FROM cell
),
noise AS (
  SELECT nationkey, segment, n,
         {_DP_G.format(u=_DP_U.format(mult=2654435761))}
           - {_DP_G.format(u=_DP_U.format(mult=2246822519))} AS eta
  FROM keyed
)
SELECT nationkey, segment, n + eta AS n_noisy,
       greatest(n + eta, 0) AS n_released
FROM noise
""")
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private customer counts per (nation, segment) —
    epsilon = 1 discrete Laplace via the two-sided-geometric identity
    X = Geom(1-e^-eps) - Geom'(1-e^-eps) (Ghosh-Roughgarden-Sundararajan:
    the discrete Laplace is the universally utility-maximizing
    eps-DP mechanism for counts), inverse-CDF sampled as
    floor(-ln(1-u)) because eps = 1 makes ln(alpha) = -1 exactly. The
    uniforms are DETERMINISTIC Knuth multiplicative hashes of a cell
    fingerprint on the 2^32 grid (the sample_stratified
    reproducibility discipline; integer hash then ONE shared-text ln
    per draw — engine-exact, no RNG layout dependence). A production
    release rotates the hash seed per release and drops n from the
    output; n stays here so the oracle and the noise-distribution
    test can audit the mechanism (the released columns are n_noisy
    and its nonnegative clamp). Plan: one cell-domain-bounded
    aggregate; noise is row-local arithmetic on the cells frame —
    adding DP to any rollup costs zero extra shuffles."""
    c = table(spark, sf_dir, "customer")
    cell = (c.groupBy(F.col("c_nationkey").cast("int").alias("nationkey"),
                      F.col("c_mktsegment").alias("segment"))
             .agg(F.count("*").alias("n")))
    keyed = cell.withColumn("ck", F.expr(
        "CAST(nationkey * 131 + ascii(substr(segment, 1, 1)) * 7 "
        "+ length(segment) AS BIGINT)"))
    g1 = _DP_G.format(u=_DP_U.format(mult=2654435761))
    g2 = _DP_G.format(u=_DP_U.format(mult=2246822519))
    noise = keyed.withColumn("eta", F.expr(f"{g1} - {g2}"))
    return noise.select(
        "nationkey", "segment",
        (F.col("n") + F.col("eta")).alias("n_noisy"),
        F.greatest(F.col("n") + F.col("eta"), F.lit(0))
         .alias("n_released"))


@query("pipeline_privacy_e2e", oracle=f"""
WITH b AS (
  SELECT c_custkey,
         CAST(c_nationkey AS INT) AS nationkey,
         c_mktsegment AS segment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + {_SHIFT} AS sc
  FROM customer
),
l AS (
  SELECT CAST(w AS BIGINT) AS w
  FROM (VALUES ({'),('.join(str(w) for w in _LADDER)})) AS t(w)
),
g AS (
  SELECT l.w, b.nationkey, b.segment, b.sc // (l.w * 100) AS band,
         CAST(count(*) AS BIGINT) AS k
  FROM b, l GROUP BY 1, 2, 3, 4
),
m AS (SELECT w, min(k) AS min_k FROM g GROUP BY 1),
pick AS (
  SELECT coalesce(min(w) FILTER (WHERE min_k >= {_K}),
                  (SELECT max(w) FROM l)) AS w
  FROM m
),
rel AS (
  SELECT g.w AS width, g.nationkey, g.segment, g.band, g.k
  FROM g JOIN pick ON g.w = pick.w
),
keyed AS (
  SELECT *, CAST(nationkey * 131 + ascii(substr(segment, 1, 1)) * 7
                 + length(segment) + band * 17 AS BIGINT) AS ck
  FROM rel
),
noise AS (
  SELECT width, nationkey, segment, band, k,
         {_DP_G.format(u=_DP_U.format(mult=2654435761))}
           - {_DP_G.format(u=_DP_U.format(mult=2246822519))} AS eta
  FROM keyed
)
SELECT width, nationkey, segment, band, k,
       k + eta AS k_noisy,
       greatest(k + eta, 0) AS k_released,
       (k < {_K}) AS suppressed
FROM noise
""")
def pipeline_privacy_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy release pipeline END TO END: generalize up the
    band ladder to the finest k-feasible rung
    (`privacy_generalize_ladder`), then release each surviving class
    count under the ε=1 discrete-Laplace mechanism
    (`privacy_dp_counts`' deterministic seeded form, cell fingerprint
    extended with the band), with classes still under k flagged
    `suppressed` (only possible when NO rung was feasible and the
    coarsest shipped — generalization and suppression are the two
    Samarati knobs, and the flag makes the residual risk explicit
    instead of silent). One composed plan: the ladder's single
    fan-out shuffle, a 5-row rung pick, and row-local noise — the
    full compliance flow costs one QI-bounded shuffle more than the
    raw rollup. True k stays in the frame for the oracle/audit (the
    dp_counts discipline; a production release drops it and rotates
    the hash seed)."""
    rel = privacy_generalize_ladder(spark, sf_dir)
    keyed = rel.withColumn("ck", F.expr(
        "CAST(nationkey * 131 + ascii(substr(segment, 1, 1)) * 7 "
        "+ length(segment) + band * 17 AS BIGINT)"))
    g1 = _DP_G.format(u=_DP_U.format(mult=2654435761))
    g2 = _DP_G.format(u=_DP_U.format(mult=2246822519))
    noise = keyed.withColumn("eta", F.expr(f"{g1} - {g2}"))
    return noise.select(
        "width", "nationkey", "segment", "band", "k",
        (F.col("k") + F.col("eta")).alias("k_noisy"),
        F.greatest(F.col("k") + F.col("eta"), F.lit(0))
         .alias("k_released"),
        (F.col("k") < _K).alias("suppressed"))
