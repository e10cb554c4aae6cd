"""Model-evaluation / feature-engineering operators — the offline-ML
layer a training-data pipeline runs after scoring (SURVEY §2.12
extensions, composing with ``scoring.ml_infer_linear``'s fused linear
scorer): exact ROC-AUC from value-grouped rank algebra, reliability
(calibration) deciles, cumulative-gains/lift, leave-one-out target
encoding, and the per-entity lag-feature matrix.

Engine-exactness discipline (the stats-suite playbook): every statistic
is built from exact integer counts; divisions are half-away-from-zero
ppm on nonnegative numerators via the ``(2*num + den) // (2*den)``
pattern, products that can cross int64 at production scale ride
decimal(38) (DuckDB HUGEINT widens automatically); the only float op is
a single IEEE division immediately rounded (calibration mean). Deciles
come from a TWO-LEVEL order statistic (the ``revenue_gini`` discipline
— band by the bounded score domain, prefix-sum band populations, rank
per-band in parallel) with the ntile bucket derived arithmetically, so
no global single-task sort exists anywhere; the oracle uses the
engine's own ``ntile()`` which doubles as a semantics check of the
bucket arithmetic.

Label/score conventions for the gated demos: score = the integer
centilogit of ``ml_infer_linear`` (shared expression text), label =
``lang = 'en'``. Production swaps both for real model outputs; the plan
shapes are label-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# -- shared scorer text: ml_infer_linear's fused feature+dot-product ----
_LOGIT_SQL = """
feats AS (
  SELECT doc_id, source, lang = 'en' AS y,
         CAST(-300 + 12 * least(len(list_filter(string_split(text, ' '),
                                                x -> x <> '')), 50)
              - 40 * len(list_filter(list_filter(string_split(text, ' '),
                                                 x -> x <> ''),
                         x -> x IN ('the', 'a', 'of', 'and', 'in', 'to')))
              + 2 * (len(text) // 10) AS BIGINT) AS score
  FROM documents
)"""


def _feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, source, y, score): the Spark twin of
    ``_LOGIT_SQL`` — one codegen'd expression over the scan."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    stops = F.filter(toks, lambda x: x.isin("the", "a", "of", "and",
                                            "in", "to"))
    logit = (F.lit(-300)
             + 12 * F.least(F.size(toks), F.lit(50))
             - 40 * F.size(stops)
             + 2 * F.expr("length(text) DIV 10"))
    return d.select("doc_id", "source",
                    (F.col("lang") == "en").alias("y"),
                    logit.cast("bigint").alias("score"))


def _ranked(feats: DataFrame, descending: bool) -> DataFrame:
    """Global unique rank over (score, doc_id) via the two-level order
    statistic: band = score value (bounded domain — the scorer's output
    grid), band populations prefix-summed in a band-count-sized window,
    local row_number per band in parallel. Descending ranks reuse the
    same machinery on the reversed order (score DESC, doc_id DESC)."""
    r = feats.localCheckpoint(eager=False)
    bands = r.groupBy("score").agg(F.count("*").alias("bn"))
    order = F.col("score").desc() if descending else F.col("score").asc()
    wb = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    offs = bands.select(
        "score", F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("off"))
    wl = (Window.partitionBy("score")
          .orderBy(F.col("doc_id").desc() if descending
                   else F.col("doc_id").asc()))
    return (r.join(F.broadcast(offs), "score")
             .withColumn("i", F.col("off") + F.row_number().over(wl)))


# ntile(k) over n rows ranked i (1-based): first n%k buckets take
# floor(n/k)+1 rows — the standard SQL semantics, reproduced as pure
# integer arithmetic so no engine needs a single-task global window.
_NTILE10 = ("CASE WHEN i <= (n % 10) * (n DIV 10 + 1) "
            "THEN (i - 1) DIV (n DIV 10 + 1) + 1 "
            "ELSE (n % 10) + (i - (n % 10) * (n DIV 10 + 1) - 1) "
            "DIV (n DIV 10) + 1 END")


@query("model_auc_by_source", oracle=f"""
WITH {_LOGIT_SQL},
v AS (
  SELECT source, score,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos_v,
         sum(CASE WHEN y THEN 0 ELSE 1 END) AS neg_v
  FROM feats GROUP BY 1, 2
),
c AS (
  SELECT source, pos_v, neg_v,
         coalesce(sum(neg_v) OVER (PARTITION BY source ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
  FROM v
),
g AS (
  SELECT source, CAST(sum(pos_v) AS BIGINT) AS n_pos,
         CAST(sum(neg_v) AS BIGINT) AS n_neg,
         CAST(sum(pos_v * (2 * cnb + neg_v)) AS BIGINT) AS u2
  FROM c GROUP BY 1
)
SELECT source, n_pos, n_neg, u2,
       CAST((2 * 1000000 * CAST(u2 AS HUGEINT)
             + 2 * n_pos * n_neg) // (4 * n_pos * n_neg) AS BIGINT)
         AS auc_ppm
FROM g
""")
def model_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the fused linear scorer per source — the
    rank-sum identity AUC = U/(n1·n0) with ties at half credit
    (AUC and Mann-Whitney U are the same statistic; this is the
    model-evaluation face of ``ab_mann_whitney``'s machinery). No
    global sort: rows collapse to (source, score) cells first (score
    is an integer grid, so cells are bounded), the below-count window
    runs over CELLS within each source, and the doubled-U
    u2 = Σ pos_v·(2·cum_neg_below + neg_v) stays an exact integer —
    ties contribute neg_v (half credit doubled). auc_ppm is half-away
    on the ppm grid with the 1e6 product ridden through
    decimal/HUGEINT (u2 ~ n²/2 crosses int64·1e-6 near 2M rows per
    group). One corpus shuffle (the cell groupBy); everything after is
    cell-sized."""
    v = (_feats(spark, sf_dir)
         .groupBy("source", "score")
         .agg(F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos_v"),
              F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("neg_v")))
    w = (Window.partitionBy("source").orderBy("score")
         .rowsBetween(Window.unboundedPreceding, -1))
    c = v.withColumn("cnb", F.coalesce(F.sum("neg_v").over(w), F.lit(0)))
    g = c.groupBy("source").agg(
        F.sum("pos_v").alias("n_pos"),
        F.sum("neg_v").alias("n_neg"),
        F.sum(F.col("pos_v") * (2 * F.col("cnb") + F.col("neg_v")))
         .alias("u2"))
    return g.select(
        "source", "n_pos", "n_neg", "u2",
        F.expr("CAST((2 * 1000000 * CAST(u2 AS DECIMAL(38,0)) "
               "+ 2 * n_pos * n_neg) DIV (4 * n_pos * n_neg) AS BIGINT)")
         .alias("auc_ppm"))


@query("model_calibration_bins", oracle=f"""
WITH {_LOGIT_SQL},
b AS (
  SELECT y, score, ntile(10) OVER (ORDER BY score, doc_id) AS decile
  FROM feats
)
SELECT CAST(decile AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       round(CAST(sum(score) AS DOUBLE) / count(*), 4) AS mean_logit,
       CAST((2 * 1000000 * sum(CASE WHEN y THEN 1 ELSE 0 END)
             + count(*)) // (2 * count(*)) AS BIGINT) AS pos_ppm
FROM b GROUP BY 1
""")
def model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table: score deciles vs observed positive rate —
    the calibration-curve aggregate (well-calibrated ⇔ predicted
    probability ≈ pos_ppm per bin, monotone bins ⇔ useful ranking).
    Deciles are ntile(10) over the UNIQUE (score, doc_id) order,
    computed WITHOUT a global sort: the two-level band rank (band =
    integer score value, prefix-summed band offsets, per-band local
    row_number) yields the global rank i, and the ntile bucket is pure
    integer arithmetic on (i, n) replicating the engine's
    first-r-buckets-take-one-extra rule — the oracle's real ntile()
    certifies the arithmetic. mean_logit is ONE IEEE division on two
    exact integers, rounded; pos_ppm is half-away integer ppm."""
    ranked = _ranked(_feats(spark, sf_dir), descending=False)
    n = ranked.groupBy().agg(F.count("*").alias("n"))
    b = (ranked.crossJoin(F.broadcast(n))
         .withColumn("decile", F.expr(_NTILE10).cast("int")))
    return (b.groupBy("decile")
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos"),
                 F.round(F.sum("score").cast("double") / F.count("*"), 4)
                  .alias("mean_logit"))
            .withColumn("pos_ppm",
                        F.expr("CAST((2 * 1000000 * pos + n) "
                               "DIV (2 * n) AS BIGINT)")))


@query("model_gains_deciles", oracle=f"""
WITH {_LOGIT_SQL},
b AS (
  SELECT y, ntile(10) OVER (ORDER BY score DESC, doc_id DESC) AS decile
  FROM feats
),
d AS (
  SELECT CAST(decile AS INT) AS decile,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM b GROUP BY 1
),
c AS (
  SELECT decile, n, pos,
         CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
         CAST(sum(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
         CAST(sum(n) OVER () AS BIGINT) AS tot_n,
         CAST(sum(pos) OVER () AS BIGINT) AS tot_pos
  FROM d
)
SELECT decile, n, pos, cum_n, cum_pos,
       CAST((2 * 1000000 * cum_pos + tot_pos) // (2 * tot_pos) AS BIGINT)
         AS gain_ppm,
       CAST((2 * 1000000 * CAST(cum_pos AS HUGEINT) * tot_n
             + cum_n * tot_pos) // (2 * cum_n * tot_pos) AS BIGINT)
         AS lift_ppm
FROM c
""")
def model_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table: rank by score DESC, cut into
    deciles, report what fraction of all positives the top-k deciles
    capture (gain) and the capture rate relative to random (lift) —
    the campaign-targeting readout. Decile assignment reuses the
    two-level descending rank + arithmetic ntile (no global sort);
    after the per-decile rollup everything is a 10-row frame, so the
    cumulative windows are driver-trivial. lift's cum_pos·tot_n
    product rides decimal(38)/HUGEINT (crosses int64 near 3e9 rows);
    both ratios are half-away integer ppm."""
    ranked = _ranked(_feats(spark, sf_dir), descending=True)
    n = ranked.groupBy().agg(F.count("*").alias("n"))
    b = (ranked.crossJoin(F.broadcast(n))
         .withColumn("decile", F.expr(_NTILE10).cast("int")))
    d = b.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    c = (d.withColumn("cum_n", F.sum("n").over(wc))
          .withColumn("cum_pos", F.sum("pos").over(wc))
          .withColumn("tot_n", F.sum("n").over(wt))
          .withColumn("tot_pos", F.sum("pos").over(wt)))
    return c.select(
        "decile", "n", "pos", "cum_n", "cum_pos",
        F.expr("CAST((2 * 1000000 * cum_pos + tot_pos) "
               "DIV (2 * tot_pos) AS BIGINT)").alias("gain_ppm"),
        F.expr("CAST((2 * 1000000 * CAST(cum_pos AS DECIMAL(38,0)) * tot_n "
               "+ cum_n * tot_pos) DIV (2 * cum_n * tot_pos) AS BIGINT)")
         .alias("lift_ppm"))


@query("target_encode_loo", oracle=f"""
WITH {_LOGIT_SQL},
cat AS (
  SELECT source, CAST(count(*) AS BIGINT) AS cat_n,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cat_pos
  FROM feats GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS tot_n,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS tot_pos
  FROM feats
)
SELECT f.doc_id, f.source, CAST(f.y AS INT) AS y,
       CASE WHEN c.cat_n > 1 THEN
         CAST((2 * 1000000 * (c.cat_pos - CAST(f.y AS INT))
               + (c.cat_n - 1)) // (2 * (c.cat_n - 1)) AS BIGINT)
       ELSE
         CAST((2 * 1000000 * t.tot_pos + t.tot_n) // (2 * t.tot_n)
              AS BIGINT)
       END AS enc_ppm
FROM feats f JOIN cat c USING (source) CROSS JOIN tot t
""")
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the ``source`` category —
    the leakage-safe categorical feature: each row's encoded value is
    the positive rate of its category EXCLUDING the row itself
    ((cat_pos − y)/(cat_n − 1)), so the row's own label never leaks
    into its feature (plain mean encoding does leak, and CV folds are
    the expensive fix). Singleton categories fall back to the global
    prior. Plan: one category rollup (bounded dim) broadcast back plus
    the 1-row total — the corpus is scanned once and never shuffled;
    the encode is a row-local integer expression, half-away ppm with
    a nonnegative numerator by construction (y ≤ cat_pos)."""
    f = _feats(spark, sf_dir).localCheckpoint(eager=False)
    cat = f.groupBy("source").agg(
        F.count("*").alias("cat_n"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("cat_pos"))
    tot = f.agg(F.count("*").alias("tot_n"),
                F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("tot_pos"))
    return (f.join(F.broadcast(cat), "source")
             .crossJoin(F.broadcast(tot))
             .select("doc_id", "source",
                     F.col("y").cast("int").alias("y"),
                     F.expr(
                         "CASE WHEN cat_n > 1 THEN "
                         "CAST((2 * 1000000 * (cat_pos - CAST(y AS INT)) "
                         "+ (cat_n - 1)) DIV (2 * (cat_n - 1)) AS BIGINT) "
                         "ELSE CAST((2 * 1000000 * tot_pos + tot_n) "
                         "DIV (2 * tot_n) AS BIGINT) END").alias("enc_ppm")))


@query("feature_lag_matrix", oracle="""
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS val_cents
  FROM events GROUP BY 1, 2
),
k AS (
  SELECT user_id, day, n_events, CAST(val_cents AS BIGINT) AS val_cents,
         CAST(day - DATE '1970-01-01' AS BIGINT) AS dk
  FROM d
)
SELECT user_id, day, n_events, val_cents,
       CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY dk
           RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS BIGINT) AS lag1_n,
       CAST(sum(val_cents) OVER (PARTITION BY user_id ORDER BY dk
           RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS BIGINT)
         AS lag1_cents,
       CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY dk
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll7_n,
       CAST(sum(val_cents) OVER (PARTITION BY user_id ORDER BY dk
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS roll7_cents
FROM k
""")
def feature_lag_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) lag-feature matrix — the feature-store
    precompute for sequence models: daily activity counts and exact
    cents with calendar-correct lag-1-day and trailing-7-day rollups.
    RANGE frames over the integer day index make the windows
    CALENDAR-aware (a user absent yesterday gets NULL lag, not the
    previous-row value a ROWS frame would leak; the 7-day sum spans
    exactly 7 calendar days however sparse the activity). All features
    are exact integers; the daily rollup is map-side combined, then
    one user-keyed window pass computes every feature — two shuffles
    total, both on user keys, skew-bounded by per-user day counts."""
    e = table(spark, sf_dir, "events")
    d = (e.groupBy("user_id", F.to_date("ts").alias("day"))
          .agg(F.count("*").alias("n_events"),
               F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
                .alias("val_cents"))
          .withColumn("dk", F.datediff("day", F.lit("1970-01-01"))
                      .cast("bigint")))
    wl = (Window.partitionBy("user_id").orderBy("dk").rangeBetween(-1, -1))
    w7 = (Window.partitionBy("user_id").orderBy("dk").rangeBetween(-6, 0))
    return d.select(
        "user_id", "day", "n_events", "val_cents",
        F.sum("n_events").over(wl).alias("lag1_n"),
        F.sum("val_cents").over(wl).alias("lag1_cents"),
        F.sum("n_events").over(w7).alias("roll7_n"),
        F.sum("val_cents").over(w7).alias("roll7_cents"))


_COV_PPM = "CAST((2 * 1000000 * covered + eval_n) DIV (2 * eval_n) AS BIGINT)"


@query("conformal_threshold", oracle=f"""
WITH {_LOGIT_SQL},
cal AS (SELECT * FROM feats WHERE doc_id % 5 = 0),
r AS (SELECT score, row_number() OVER (ORDER BY score, doc_id) AS i
      FROM cal),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
lv AS (SELECT CAST(unnest([800, 900, 950, 990]) AS BIGINT) AS c_permil),
kk AS (
  SELECT c_permil, n_cal,
         least(((n_cal + 1) * c_permil + 999) // 1000, n_cal) AS k
  FROM lv, nn
),
t AS (
  SELECT kk.c_permil, kk.n_cal, kk.k, r.score AS thr_score
  FROM kk JOIN r ON r.i = kk.k
),
ev AS (SELECT score FROM feats WHERE doc_id % 5 <> 0),
en AS (SELECT CAST(count(*) AS BIGINT) AS eval_n FROM ev),
cov AS (
  SELECT t.c_permil, t.n_cal, t.k, t.thr_score, en.eval_n,
         CAST(sum(CASE WHEN ev.score <= t.thr_score THEN 1 ELSE 0 END)
              AS BIGINT) AS covered
  FROM t, ev, en GROUP BY 1, 2, 3, 4, 5
)
SELECT c_permil, n_cal, k, thr_score, eval_n, covered,
       CAST((2 * 1000000 * covered + eval_n) // (2 * eval_n) AS BIGINT)
         AS cov_ppm
FROM cov
""")
def conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration of the fused scorer: on a
    deterministic hash split (doc_id % 5 = 0 -> calibration), the
    conformal threshold for target coverage c is the k-th smallest
    calibration score with k = ceil((n_cal + 1) * c) (clamped to
    n_cal) — the finite-sample-valid quantile rule of split conformal
    prediction — reported for four coverage levels alongside the
    ACHIEVED coverage on the held-out split (half-away ppm). Exact
    order statistics without a global sort: the k-th value comes from
    the same two-level band rank as the calibration/gains deciles
    (band = integer score, prefix-summed offsets, per-band
    row_number over the UNIQUE (score, doc_id) order); held-out
    coverage is one pass over held-out SCORE CELLS (bounded by the
    scorer's grid) cross-joined with the 4-row threshold frame. The
    only data-sized ops are the calibration rank join and the two
    cell aggregates."""
    f = _feats(spark, sf_dir).localCheckpoint(eager=False)
    cal = f.filter(F.col("doc_id") % 5 == 0)
    ranked = _ranked(cal, descending=False)
    nn = cal.groupBy().agg(F.count("*").alias("n_cal"))
    lv = spark.createDataFrame([(800,), (900,), (950,), (990,)],
                               "c_permil long")
    kk = lv.crossJoin(F.broadcast(nn)).select(
        "c_permil", "n_cal",
        F.expr("least(((n_cal + 1) * c_permil + 999) DIV 1000, n_cal)")
         .alias("k"))
    t = (ranked.join(F.broadcast(kk), ranked["i"] == kk["k"])
         .select("c_permil", "n_cal", "k",
                 F.col("score").alias("thr_score")))
    ev = (f.filter(F.col("doc_id") % 5 != 0)
           .groupBy("score").agg(F.count("*").alias("cnt")))
    en = ev.groupBy().agg(F.sum("cnt").alias("eval_n"))
    cov = (ev.crossJoin(F.broadcast(t))
           .groupBy("c_permil", "n_cal", "k", "thr_score")
           .agg(F.sum(F.when(F.col("score") <= F.col("thr_score"),
                             F.col("cnt")).otherwise(0)).alias("covered"))
           .crossJoin(F.broadcast(en)))
    return cov.select("c_permil", "n_cal", "k", "thr_score", "eval_n",
                      "covered", F.expr(_COV_PPM).alias("cov_ppm"))


# WoE in integer micro-nats: one ln per category over an exact integer
# ratio (shared text in both engines); NULL-guarded for one-sided cells
_WOE_E6 = ("CASE WHEN cat_pos = 0 OR cat_neg = 0 THEN NULL ELSE "
           "CAST(round(ln(CAST(cat_pos AS DOUBLE) * tot_neg / "
           "(CAST(cat_neg AS DOUBLE) * tot_pos)) * 1000000, 0) "
           "AS BIGINT) END")
# IV contribution: (dist_pos - dist_neg) * WoE, reported in e9 so the
# two shared-text float multiplies keep 3 significant digits past ppm
_IV_E9 = ("CASE WHEN cat_pos = 0 OR cat_neg = 0 THEN NULL ELSE "
          "CAST(round((CAST(cat_pos AS DOUBLE) / tot_pos "
          "- CAST(cat_neg AS DOUBLE) / tot_neg) * "
          "ln(CAST(cat_pos AS DOUBLE) * tot_neg / "
          "(CAST(cat_neg AS DOUBLE) * tot_pos)) * 1000000000, 0) "
          "AS BIGINT) END")


@query("encode_woe_iv", oracle=f"""
WITH {_LOGIT_SQL},
cat AS (
  SELECT source,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cat_pos,
         CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS cat_neg
  FROM feats GROUP BY 1
),
tot AS (
  SELECT CAST(sum(cat_pos) AS BIGINT) AS tot_pos,
         CAST(sum(cat_neg) AS BIGINT) AS tot_neg
  FROM cat
)
SELECT source, cat_pos, cat_neg, {_WOE_E6} AS woe_e6, {_IV_E9} AS iv_e9
FROM cat, tot
""")
def encode_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding of the ``source`` category against
    the binary label, with each category's information-value
    contribution — the credit-scoring-native alternative to
    ``target_encode_loo`` (WoE is the log-odds ratio, so a downstream
    logistic model consumes it linearly; IV = Σ(dist_pos −
    dist_neg)·WoE ranks features by separation power: <0.02
    useless, >0.5 suspicious). WoE_c = ln(pos_c·neg_tot /
    (neg_c·pos_tot)) — ONE ln per category over an exact integer
    ratio (micro-nat quantization, the mixture_entropy discipline);
    the IV term adds two shared-text float multiplies, reported in
    1e-9 units. One-sided categories (no positives or no negatives)
    yield NULL rather than ±inf — the standard smoothing decision is
    left to the caller. Plan: one corpus scan, one category-bounded
    rollup, a 1-row total broadcast; nothing data-sized after the
    scan."""
    f = _feats(spark, sf_dir)
    cat = f.groupBy("source").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("cat_pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("cat_neg"))
    tot = cat.agg(F.sum("cat_pos").alias("tot_pos"),
                  F.sum("cat_neg").alias("tot_neg"))
    return (cat.crossJoin(F.broadcast(tot))
            .select("source", "cat_pos", "cat_neg",
                    F.expr(_WOE_E6).alias("woe_e6"),
                    F.expr(_IV_E9).alias("iv_e9")))


_FH_BUCKETS = 32

# portable term hash: first 8 hex digits of md5 parsed via instr (the
# table_fingerprint primitive); bit 0 -> sign, the rest -> bucket
_FH_H32 = (
    "("
    + " + ".join(
        "CAST(instr('0123456789abcdef', substr(md5(term), "
        f"{i}, 1)) - 1 AS BIGINT) * {16 ** (8 - i)}"
        for i in range(1, 9))
    + ")")


@query("feature_hash_tf", oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2
),
vocab AS (
  SELECT term, {_FH_H32} AS h FROM (SELECT DISTINCT term FROM tf)
),
hashed AS (
  SELECT tf.doc_id,
         CAST((v.h // 2) % {_FH_BUCKETS} AS BIGINT) AS bucket,
         CAST(CASE WHEN v.h % 2 = 0 THEN tf.tf ELSE -tf.tf END
              AS BIGINT) AS signed_tf
  FROM tf JOIN vocab v USING (term)
)
SELECT doc_id, bucket, CAST(sum(signed_tf) AS BIGINT) AS feat
FROM hashed GROUP BY 1, 2
HAVING sum(signed_tf) <> 0
""")
def feature_hash_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): project each document's
    term-frequency vector into a fixed 32-bucket feature space with a
    SIGNED hash kernel — bucket = h(term) div 2 mod B, sign = parity
    of h — so collisions cancel in expectation and the feature space
    is bounded regardless of vocabulary growth; the sparse (doc,
    bucket, value) rows with zero-sum cells dropped are exactly what
    a downstream linear model consumes. h is the engine-portable
    md5-instr h32 (the table_fingerprint primitive), computed ONCE
    per DISTINCT term on the vocabulary frame and joined back — the
    corpus-sized explode never touches md5. Plan: explode → (doc,
    term) tf aggregate → vocab-keyed hash join → (doc, bucket)
    aggregate; every shuffle is corpus-token- or vocab-keyed, the
    bucket space is constant."""
    d = table(spark, sf_dir, "documents")
    tf = (d.select("doc_id", F.explode(
              F.filter(F.split("text", " "), lambda x: x != ""))
              .alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    tf = tf.localCheckpoint(eager=False)
    vocab = (tf.select("term").distinct()
             .withColumn("h", F.expr(_FH_H32)))
    hashed = (tf.join(vocab, "term")
              .select("doc_id",
                      F.expr(f"CAST((h div 2) % {_FH_BUCKETS} AS BIGINT)")
                       .alias("bucket"),
                      F.expr("CAST(CASE WHEN h % 2 = 0 THEN tf "
                             "ELSE -tf END AS BIGINT)").alias("signed_tf")))
    return (hashed.groupBy("doc_id", "bucket")
            .agg(F.sum("signed_tf").alias("feat"))
            .filter(F.col("feat") != 0))


# per-row predicted probability: sigmoid of the centilogit, quantized
# half-away to 1e-6 BEFORE any sum (the micro-nat discipline — one exp
# per row, no float accumulation anywhere)
_P_E6 = ("CAST(floor(1000000.0 / (1.0 + exp(-CAST(score AS DOUBLE) "
         "/ 100.0)) + 0.5) AS BIGINT)")


@query("pipeline_mleval_e2e", oracle=f"""
WITH {_LOGIT_SQL},
p AS (
  SELECT doc_id, y, score, {_P_E6} AS p_e6,
         ntile(10) OVER (ORDER BY score, doc_id) AS decile
  FROM feats
),
v AS (
  SELECT score,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos_v,
         sum(CASE WHEN y THEN 0 ELSE 1 END) AS neg_v
  FROM p GROUP BY 1
),
cu AS (
  SELECT pos_v, neg_v,
         coalesce(sum(neg_v) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
  FROM v
),
auc AS (
  SELECT CAST(sum(pos_v) AS BIGINT) AS n_pos,
         CAST(sum(neg_v) AS BIGINT) AS n_neg,
         CAST(sum(pos_v * (2 * cnb + neg_v)) AS BIGINT) AS u2
  FROM cu
),
bins AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS posb,
         CAST(sum(p_e6) AS BIGINT) AS pe6b
  FROM p GROUP BY 1
),
ece AS (
  SELECT CAST(sum(abs((2 * 1000000 * posb + nb) // (2 * nb)
                      - (2 * pe6b + nb) // (2 * nb)) * nb) AS HUGEINT)
           AS ece_num,
         CAST(sum(nb) AS BIGINT) AS n
  FROM bins
),
brier AS (
  SELECT CAST(sum(CAST((p_e6 - CASE WHEN y THEN 1000000 ELSE 0 END)
                       AS HUGEINT)
                  * (p_e6 - CASE WHEN y THEN 1000000 ELSE 0 END))
              AS HUGEINT) AS bsum
  FROM p
)
SELECT ece.n, auc.n_pos,
       CAST((2 * 1000000 * auc.n_pos + ece.n) // (2 * ece.n) AS BIGINT)
         AS pos_ppm,
       CAST((2 * 1000000 * CAST(auc.u2 AS HUGEINT)
             + 2 * auc.n_pos * auc.n_neg)
            // (4 * auc.n_pos * auc.n_neg) AS BIGINT) AS auc_ppm,
       CAST((2 * ece.ece_num + ece.n) // (2 * ece.n) AS BIGINT) AS ece_e6,
       CAST((2 * brier.bsum + CAST(ece.n AS HUGEINT) * 1000000)
            // (2 * CAST(ece.n AS HUGEINT) * 1000000) AS BIGINT)
         AS brier_e6
FROM auc, ece, brier
""")
def pipeline_mleval_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-health SCORECARD, end to end in one pipeline — the
    single row a model monitor alerts on: n, positives, base rate,
    pooled exact AUC (the score-cell rank-sum — no global sort),
    expected calibration error over the ntile deciles (ECE =
    Σ n_b/n·|observed − predicted|, both sides exact integers: the
    predicted probability is sigmoid(centilogit) quantized HALF-AWAY
    to 1e-6 per row before any sum, so ECE is integer arithmetic to
    the end), and the Brier score (mean squared error on the 1e-6
    probability grid — (p−y)² sums ride HUGEINT/decimal). One corpus
    scan feeds all three statistics; everything downstream is
    cell- or decile-sized. Composes the mleval family the way a
    production evaluation job would: score once, derive every health
    metric from the same frame."""
    f = _feats(spark, sf_dir)
    ranked = _ranked(f, descending=False)
    nn = ranked.groupBy().agg(F.count("*").alias("n"))
    p = (ranked.crossJoin(F.broadcast(nn))
         .withColumn("decile", F.expr(_NTILE10).cast("int"))
         .withColumn("p_e6", F.expr(_P_E6))
         .localCheckpoint(eager=False))
    v = (p.groupBy("score")
         .agg(F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("pos_v"),
              F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("neg_v")))
    wc = (Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1))
    cu = v.withColumn("cnb", F.coalesce(F.sum("neg_v").over(wc), F.lit(0)))
    auc = cu.agg(
        F.sum("pos_v").alias("n_pos"), F.sum("neg_v").alias("n_neg"),
        F.sum(F.col("pos_v") * (2 * F.col("cnb") + F.col("neg_v")))
         .alias("u2"))
    bins = p.groupBy("decile").agg(
        F.count("*").alias("nb"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("posb"),
        F.sum("p_e6").alias("pe6b"))
    ece = bins.agg(
        F.sum(F.abs(F.expr("(2 * 1000000 * posb + nb) DIV (2 * nb)")
                    - F.expr("(2 * pe6b + nb) DIV (2 * nb)"))
              * F.col("nb")).cast("decimal(38,0)").alias("ece_num"),
        F.sum("nb").alias("n"))
    dev = F.expr("CAST(p_e6 - CASE WHEN y THEN 1000000 ELSE 0 END "
                 "AS DECIMAL(20,0))")
    brier = p.agg(F.sum((dev * dev).cast("decimal(38,0)"))
                  .cast("decimal(38,0)").alias("bsum"))
    return (ece.crossJoin(F.broadcast(auc)).crossJoin(F.broadcast(brier))
            .select(
                "n", "n_pos",
                F.expr("CAST((2 * 1000000 * n_pos + n) DIV (2 * n) "
                       "AS BIGINT)").alias("pos_ppm"),
                F.expr("CAST((2 * 1000000 * CAST(u2 AS DECIMAL(38,0)) "
                       "+ 2 * n_pos * n_neg) DIV (4 * n_pos * n_neg) "
                       "AS BIGINT)").alias("auc_ppm"),
                F.expr("CAST((2 * ece_num + n) DIV (2 * n) AS BIGINT)")
                 .alias("ece_e6"),
                F.expr("CAST((2 * bsum + CAST(n AS DECIMAL(38,0)) "
                       "* 1000000) DIV (2 * CAST(n AS DECIMAL(38,0)) "
                       "* 1000000) AS BIGINT)").alias("brier_e6")))
