"""Statistical analytics over the event log: exact rolling medians,
contingency-table independence testing, and equal-frequency histograms
— the hypothesis-testing / distribution-shape layer a warehouse adds
once plain aggregates exist.

Engine-exactness: the rolling median replicates DuckDB's quantile_cont
interpolation FORMULA (lower + (upper-lower)*0.5, not (a+b)/2 — the two
differ in the last ulp); the chi-square statistic is built from exact
integer cross-products ((o·n − rt·ct)² / (n·rt·ct) per cell) so each
cell contribution is a single IEEE division on exact integers; the
equi-depth histogram totals are ntile over a UNIQUE total order
(rounded value, event_id) so bin membership is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query("window_rolling_median", oracle="""
SELECT user_id, event_id,
       round(median(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 6) AS med
FROM events
""")
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of ``value`` per user over the trailing
    11-row frame — the robust-smoothing window the mean-based
    ``window_running_sum`` family can't express (medians don't
    decompose, so engines without a median window must materialize the
    frame). Spark has no median window function: the frame is collected
    per row (bounded: ≤ 11 values), sorted in-expression, and
    interpolated with EXACTLY DuckDB's quantile_cont arithmetic
    (lower + (upper−lower)·0.5) so even-count frames agree bitwise.
    One user-keyed sort window; frame state is O(11) per row — the
    constant-frame pattern that scales to any log size."""
    e = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-10, 0))
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(n % 2 == 1, lo).otherwise(lo + (hi - lo) * F.lit(0.5))
    return e.select("user_id", "event_id", F.round(med, 6).alias("med"))


@query("chisq_independence", oracle="""
WITH cell AS (
  SELECT event_type, CASE WHEN value < 0.5 THEN 'lo' ELSE 'hi' END AS band,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, band, o,
         sum(o) OVER (PARTITION BY event_type) AS rt,
         sum(o) OVER (PARTITION BY band) AS ct,
         sum(o) OVER () AS n
  FROM cell
)
SELECT event_type, band, CAST(o AS BIGINT) AS o,
       -- expected on the 1e-4 integer grid, half-away (float round()
       -- ties diverge between engines — SURVEY 7.3); rt·ct·1e4 is
       -- within int64 through bench scales, HUGEINT/decimal beyond
       CAST((20000 * rt * ct + n) // (2 * n) AS BIGINT) AS expected_e4,
       round(CAST((o * n - rt * ct) * (o * n - rt * ct) AS DOUBLE)
             / (CAST(n AS DOUBLE) * rt * ct), 4) AS contrib
FROM tot
""")
def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for event_type × value-band: per
    cell the observed count, expected count under independence, and the
    χ² contribution — the contingency-table test every product-analytics
    stack runs ("does conversion depend on segment?"). The classic
    formula (o−e)²/e is restated on exact integers —
    (o·n − rt·ct)² / (n·rt·ct) — so each output is ONE IEEE division of
    exactly-aggregated integer cross-products: no float accumulation
    anywhere, engine-exact without tolerance. Plan: one map-combined
    cell aggregate (|types|×2 cells), marginals via windows over the
    cell frame (cells-sized, not data-sized)."""
    e = table(spark, sf_dir, "events")
    band = F.when(F.col("value") < 0.5, "lo").otherwise("hi")
    cell = (e.groupBy("event_type", band.alias("band"))
            .agg(F.count("*").alias("o")))
    tot = cell.select(
        "event_type", "band", "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(Window.partitionBy("band")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"))
    dev = F.col("o") * F.col("n") - F.col("rt") * F.col("ct")
    return tot.select(
        "event_type", "band", F.col("o").cast("bigint").alias("o"),
        F.expr("(20000 * rt * ct + n) div (2 * n)").cast("long")
         .alias("expected_e4"),
        F.round((dev * dev).cast("double")
                / (F.col("n").cast("double") * F.col("rt") * F.col("ct")), 4)
        .alias("contrib"))


@query("histogram_equidepth", oracle="""
WITH r AS (
  SELECT event_type, event_id, round(value, 4) AS v,
         ntile(10) OVER (PARTITION BY event_type
                         ORDER BY round(value, 4), event_id) AS tile
  FROM events
)
SELECT event_type, CAST(tile AS INT) AS tile,
       min(v) AS lo, max(v) AS hi, CAST(count(*) AS BIGINT) AS cnt
FROM r GROUP BY 1, 2
""")
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (equi-depth) histogram of value per event type —
    the bin shape optimizers and data-profilers prefer over fixed-width
    (``histogram_value``) because every bin carries the same evidence.
    ntile over a UNIQUE total order (rounded value, event_id) makes bin
    membership engine-exact — ties in raw value are broken
    deterministically, so both engines cut identical bins. One keyed
    sort window + a bins-sized aggregate; at 100 TB the same histogram
    is usually built from a quantile sketch (``agg_approx_quantile``) —
    this is the exact contract that sketch approximates."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.round("value", 4),
                                                 "event_id")
    r = e.select("event_type", "event_id",
                 F.round("value", 4).alias("v"),
                 F.ntile(10).over(w).alias("tile"))
    return (r.groupBy("event_type", F.col("tile").cast("int").alias("tile"))
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
                 F.count("*").cast("bigint").alias("cnt")))


_PROFILE_COLS = [
    # (name, spark/duck min-max expression is the rounded/cast value)
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_returnflag", "l_linestatus",
]


@query("analyze_table_stats", oracle="""
SELECT 'l_orderkey' AS col, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ndv,
       CAST(min(l_orderkey) AS VARCHAR) AS min_s,
       CAST(max(l_orderkey) AS VARCHAR) AS max_s FROM lineitem
UNION ALL
SELECT 'l_partkey', count(*), count(*) - count(l_partkey),
       count(DISTINCT l_partkey),
       CAST(min(l_partkey) AS VARCHAR), CAST(max(l_partkey) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_suppkey', count(*), count(*) - count(l_suppkey),
       count(DISTINCT l_suppkey),
       CAST(min(l_suppkey) AS VARCHAR), CAST(max(l_suppkey) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_linenumber', count(*), count(*) - count(l_linenumber),
       count(DISTINCT l_linenumber),
       CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
       count(DISTINCT l_quantity),
       CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR),
       CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
       count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
FROM lineitem
UNION ALL
SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
       count(DISTINCT l_linestatus), min(l_linestatus), max(l_linestatus)
FROM lineitem
""")
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style column profile of the fact table: per column
    the row count, null count, EXACT distinct count, and min/max — the
    statistics a cost-based optimizer (and every data-profiler /
    dq-monitor) feeds on; the reference has no ANALYZE at all (heuristic
    indexes only, SURVEY §4.1). Plan: one branch PER COLUMN, unioned —
    each branch scans exactly its own parquet column (pruned ReadSchema)
    and computes the exact ndv via a map-side-partial distinct. The
    tempting alternative — every stat in ONE aggregate — makes
    Catalyst's multi-distinct EXPAND rewrite duplicate each row 8×
    across the full row width (measured 11.4 s warm vs ~2 s for the
    union at sf0.1); per-column branches are the plan real profilers
    (Deequ) emit. At 100 TB swap ndv for approx_count_distinct per
    column — the exact contract is what the sketch approximates (the
    agg_approx_quantile pairing). Doubles are quantized before min/max
    stringification so both engines print identical literals."""
    li = table(spark, sf_dir, "lineitem")
    branches = []
    for c in _PROFILE_COLS:
        mm_lo, mm_hi = F.min(c), F.max(c)
        if c == "l_quantity":  # double: quantize before stringify
            mm_lo, mm_hi = mm_lo.cast("bigint"), mm_hi.cast("bigint")
        branches.append(li.select(c).agg(
            F.lit(c).alias("col"),
            F.count("*").alias("n"),
            (F.count("*") - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("ndv"),
            mm_lo.cast("string").alias("min_s"),
            mm_hi.cast("string").alias("max_s")))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


@query("drift_psi", oracle="""
WITH x AS (
  SELECT event_type,
         CASE WHEN value < 0 THEN 0
              WHEN value >= 100 THEN 21
              ELSE CAST(floor(value / 5) AS INT) + 1 END AS bucket,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS isb
  FROM events
),
c AS (
  SELECT event_type, bucket,
         CAST(sum(isb) AS BIGINT) AS nb,
         CAST(sum(1 - isb) AS BIGINT) AS nc
  FROM x GROUP BY 1, 2
),
t AS (
  SELECT event_type, sum(nb) AS tb, sum(nc) AS tc FROM c GROUP BY 1
)
SELECT c.event_type,
       round(sum(
         ((nb + 1.0) / (tb + 22.0) - (nc + 1.0) / (tc + 22.0))
         * ln(((nb + 1.0) / (tb + 22.0))
              / ((nc + 1.0) / (tc + 22.0)))), 4) AS psi
FROM c JOIN t USING (event_type)
GROUP BY 1
""")
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the first and
    second half of the month — the standard ML-ops distribution-drift
    monitor (PSI < 0.1 stable, > 0.25 shifted). Value distributions are
    compared on the same fixed 20-bin grid as ``histogram_value`` (+
    under/overflow), add-one smoothed so one-sided empty bins stay
    finite: psi = Σ (p−q)·ln(p/q).

    Plan: ONE corpus scan → a (type, bucket, period-flag) map-combined
    conditional aggregate (shuffle is bucket-cardinality-sized), totals
    are a types-sized second rollup broadcast back — the comparison
    never joins the two periods row-wise, so cost is one scan at any
    scale."""
    e = table(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        F.width_bucket("value", F.lit(0), F.lit(100), F.lit(20))
         .cast("int").alias("bucket"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
         .otherwise(0).alias("isb"))
    c = (x.groupBy("event_type", "bucket")
          .agg(F.sum("isb").alias("nb"),
               F.sum(1 - F.col("isb")).alias("nc")))
    t = c.groupBy("event_type").agg(F.sum("nb").alias("tb"),
                                    F.sum("nc").alias("tc"))
    j = c.join(F.broadcast(t), "event_type")
    p = (F.col("nb") + 1.0) / (F.col("tb") + 22.0)
    q = (F.col("nc") + 1.0) / (F.col("tc") + 22.0)
    return (j.groupBy("event_type")
             .agg(F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi")))


@query("anomaly_mad", oracle="""
WITH v AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events
),
med AS (
  SELECT event_type,
         CAST(2 * quantile_cont(vm, 0.5) AS BIGINT) AS med2
  FROM v GROUP BY 1
),
dev AS (
  SELECT v.event_type, v.event_id, v.vm,
         abs(2 * v.vm - m.med2) AS dd
  FROM v JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type,
         CAST(2 * quantile_cont(dd, 0.5) AS BIGINT) AS mad4
  FROM dev GROUP BY 1
)
SELECT d.event_type, d.event_id,
       10000 * d.dd > 22239 * m.mad4 AS is_outlier
FROM dev d JOIN mad m USING (event_type)
""")
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier sweep: |v − median| > 3·1.4826·MAD per event type
    (the median-absolute-deviation rule that, unlike ``anomaly_zscore``,
    no outlier can inflate away) — computed ENTIRELY in integers. The
    half-sample medians are carried doubled (2·median of ints is always
    an integer; 4·MAD likewise), and the 1.4826 consistency constant
    becomes the exact rational 22239/10000, so the flag boundary is an
    integer comparison — engine-exact with zero float tolerance.
    Plan: two group-keyed exact-percentile aggregates (group-count-sized
    frames broadcast back) + row-local flags; at 100 TB the exact
    median swaps for the GK sketch (`agg_approx_quantile`) with the
    same downstream algebra."""
    e = table(spark, sf_dir, "events")
    v = e.select("event_type", "event_id",
                 F.floor(F.col("value") * 1000).cast("long").alias("vm"))
    med = v.groupBy("event_type").agg(
        (2 * F.expr("percentile(vm, 0.5)")).cast("long").alias("med2"))
    dev = (v.join(F.broadcast(med), "event_type")
            .withColumn("dd", F.abs(2 * F.col("vm") - F.col("med2"))))
    mad = dev.groupBy("event_type").agg(
        (2 * F.expr("percentile(dd, 0.5)")).cast("long").alias("mad4"))
    return (dev.join(F.broadcast(mad), "event_type")
               .select("event_type", "event_id",
                       (10000 * F.col("dd") > 22239 * F.col("mad4"))
                        .alias("is_outlier")))


# Welch's t on exact integer moments: every float step below is ONE
# fixed sequence of correctly-rounded IEEE ops over exactly-aggregated
# integers, written as the SAME expression text in both engines so the
# doubles are bit-identical before the final rounding (the
# chisq_independence discipline, extended to a two-sample test).
_WELCH_EXPRS = {
    "ma": "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)",
    "mb": "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)",
    "va": "(CAST(ssa AS DOUBLE) - (CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
          " / CAST(na AS DOUBLE)) / CAST(na - 1 AS DOUBLE)",
    "vb": "(CAST(ssb AS DOUBLE) - (CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))"
          " / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE)",
    "sea": "va / CAST(na AS DOUBLE)",
    "seb": "vb / CAST(nb AS DOUBLE)",
    "t_stat": "round((ma - mb) / sqrt(sea + seb), 4)",
    "df": "round(((sea + seb) * (sea + seb)) / ((sea * sea)"
          " / CAST(na - 1 AS DOUBLE) + (seb * seb)"
          " / CAST(nb - 1 AS DOUBLE)), 2)",
}


@query("ab_welch_ttest", oracle=f"""
WITH obs AS (
  SELECT event_type, user_id % 2 AS grp,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT event_type,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN grp = 0 THEN cents ELSE 0 END) AS BIGINT) AS sa,
         CAST(sum(CASE WHEN grp = 1 THEN cents ELSE 0 END) AS BIGINT) AS sb,
         CAST(sum(CASE WHEN grp = 0 THEN cents * cents ELSE 0 END) AS BIGINT) AS ssa,
         CAST(sum(CASE WHEN grp = 1 THEN cents * cents ELSE 0 END) AS BIGINT) AS ssb
  FROM obs GROUP BY event_type
),
e1 AS (SELECT *, {_WELCH_EXPRS['ma']} AS ma, {_WELCH_EXPRS['mb']} AS mb,
              {_WELCH_EXPRS['va']} AS va, {_WELCH_EXPRS['vb']} AS vb
       FROM m),
e2 AS (SELECT *, {_WELCH_EXPRS['sea']} AS sea, {_WELCH_EXPRS['seb']} AS seb
       FROM e1)
SELECT event_type, na, nb, sa, sb,
       {_WELCH_EXPRS['t_stat']} AS t_stat, {_WELCH_EXPRS['df']} AS df
FROM e2
""")
def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's unequal-variance t-statistic and
    Welch-Satterthwaite degrees of freedom per event type, arms = the
    deterministic user_id parity split. The engine-portability
    discipline: the ONLY data-sized work is one map-combined
    conditional aggregate producing exact integer moments (n, Σcents,
    Σcents²) per (type, arm); means/variances/t/df are then a fixed
    chain of correctly-rounded IEEE ops over those integers — written
    as the SAME expression text in both engines, so every intermediate
    double is bit-identical and the final rounding cannot straddle a
    tie. At 100 TB this is the cheapest possible plan: one scan, one
    |types|-row shuffle, no second pass for variances (sum-of-squares
    identity instead of two-pass centered moments — safe here because
    cents are bounded integers, so Σx² stays far from the 2^53
    precision cliff; a production guard would shift by a per-type
    pre-mean when values are large)."""
    e = table(spark, sf_dir, "events")
    obs = e.select(
        "event_type", (F.col("user_id") % 2).alias("grp"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"))
    g0 = F.col("grp") == 0
    m = obs.groupBy("event_type").agg(
        F.sum(F.when(g0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(~g0, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(g0, F.col("cents")).otherwise(0)).alias("sa"),
        F.sum(F.when(~g0, F.col("cents")).otherwise(0)).alias("sb"),
        F.sum(F.when(g0, F.col("cents") * F.col("cents")).otherwise(0))
         .alias("ssa"),
        F.sum(F.when(~g0, F.col("cents") * F.col("cents")).otherwise(0))
         .alias("ssb"))
    for name in ("ma", "mb", "va", "vb", "sea", "seb"):
        m = m.withColumn(name, F.expr(_WELCH_EXPRS[name]))
    return m.select("event_type", "na", "nb", "sa", "sb",
                    F.expr(_WELCH_EXPRS["t_stat"]).alias("t_stat"),
                    F.expr(_WELCH_EXPRS["df"]).alias("df"))


_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181,
                66947, 57992, 51153, 45757]


@query("dq_benford", oracle=f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1
),
dom AS (SELECT CAST(range AS INT) AS digit FROM range(1, 10)),
t AS (SELECT sum(cnt) AS tot FROM d),
j AS (
  SELECT dom.digit, COALESCE(d.cnt, 0) AS cnt,
         ([{','.join(str(p) for p in _BENFORD_PPM)}])[dom.digit]
           AS exp_ppm
  FROM dom LEFT JOIN d ON dom.digit = d.digit
)
SELECT j.digit, j.cnt,
       CAST((2000000 * j.cnt + t.tot) // (2 * t.tot) AS BIGINT) AS obs_ppm,
       CAST(j.exp_ppm AS BIGINT) AS exp_ppm,
       CAST(abs((2000000 * j.cnt + t.tot) // (2 * t.tot) - j.exp_ppm)
            AS BIGINT) AS dev_ppm
FROM j, t
""")
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data / unit-mix data-quality screen: observed
    first-significant-digit frequencies vs the log10(1 + 1/d)
    expectation, one row per digit 1-9 (digits absent from the data
    still appear with cnt = 0 via the digit-domain left join).
    Engine-exact throughout: the first digit is taken from the decimal
    string of integer cents (x100 never changes the leading digit),
    observed shares are half-away integer ppm, and the Benford
    expectation enters as nine precomputed integer-ppm literals, so no
    engine ever evaluates a log. Plan: one scan -> 9-group
    map-combined aggregate; the total and digit-domain joins are
    broadcast 9-row/1-row frames. Generalizes the reference's
    validation intent (transform.py required-field checks) from
    per-row presence to distribution-level plausibility."""
    o = table(spark, sf_dir, "orders")
    d = (o.select(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                   .alias("cents"))
          .select(F.substring(F.col("cents").cast("string"), 1, 1)
                   .cast("int").alias("digit"))
          .groupBy("digit").agg(F.count("*").alias("cnt")))
    dom = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    t = d.agg(F.sum("cnt").alias("tot"))
    exp_arr = F.array(*[F.lit(p) for p in _BENFORD_PPM])
    j = (dom.join(F.broadcast(d), "digit", "left")
            .select("digit",
                    F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
                    F.element_at(exp_arr, F.col("digit")).cast("long")
                     .alias("exp_ppm")))
    return (j.crossJoin(F.broadcast(t))
             .select("digit", "cnt",
                     F.expr("CAST((2000000 * cnt + tot) div (2 * tot) "
                            "AS BIGINT)").alias("obs_ppm"),
                     "exp_ppm",
                     F.expr("CAST(abs((2000000 * cnt + tot) div (2 * tot) "
                            "- exp_ppm) AS BIGINT)").alias("dev_ppm")))


@query("revenue_gini", oracle="""
WITH r AS (
  SELECT o_custkey AS k,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
q AS (
  SELECT cents, row_number() OVER (ORDER BY cents, k) AS i FROM r
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(cents) AS sx,
         sum(CAST(i AS HUGEINT) * cents) AS srx
  FROM q
)
SELECT n, CAST(sx AS BIGINT) AS total_cents,
       CAST((2 * 1000000 * (2 * srx - (n + 1) * sx) + n * sx)
            // (2 * n * sx) AS BIGINT) AS gini_ppm
FROM m
""")
def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the single-number
    inequality complement to revenue_concentration's quintile table
    (0 = every customer spends alike, ->1 = one whale carries it all).
    Exact integer form G = (2*Sum(i*x_i) - (n+1)*Sum(x))/(n*Sum(x))
    over ranks i of the UNIQUE (cents, custkey) ascending order,
    half-away on the ppm grid; the rank-weighted sum accumulates in
    decimal(38) (DuckDB HUGEINT) because Sum(i*x) crosses int64 near
    ~1e7 customers — the int64-overflow lesson the 10x smoke taught
    on synthetic positions, applied at design time. Scale posture:
    ranks come from the TWO-LEVEL order statistic (the
    token_budget_pack discipline), not one global sort task — rows
    band by cents div 1e6 (domain-bounded band count), a tiny
    band-count window prefix-sums band populations, and row_number
    runs per-band in parallel; global rank = band offset + local rank
    reproduces row_number() over the full order exactly."""
    o = table(spark, sf_dir, "orders")
    # the customer rollup feeds the band census AND the rank join —
    # localCheckpoint runs the orders scan/shuffle once, not twice
    # (the graph-suite reuse pattern)
    r = (o.groupBy(F.col("o_custkey").alias("k"))
          .agg(F.sum(F.expr(
              "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
                .alias("cents"))
          .withColumn("band", F.expr("cents div 1000000"))
          .localCheckpoint(eager=False))
    bands = r.groupBy("band").agg(F.count("*").alias("bn"))
    wb = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    offs = bands.select(
        "band", F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("off"))
    wl = Window.partitionBy("band").orderBy("cents", "k")
    q = (r.join(F.broadcast(offs), "band")
          .select("cents",
                  (F.col("off") + F.row_number().over(wl)).alias("i")))
    m = q.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum((F.col("i").cast("decimal(20,0)") * F.col("cents"))
               .cast("decimal(38,0)")).alias("srx"))
    # nd/sxd route the FINAL arithmetic through decimal(38): 2*n*sx
    # crosses int64 already at ~1.5e5 customers x $2.5e11 revenue (the
    # 10x smoke caught the long-overflow); the oracle side is HUGEINT
    # throughout because DuckDB's sum(BIGINT) widens automatically.
    m = m.withColumn("nd", F.col("n").cast("decimal(20,0)")) \
         .withColumn("sxd", F.col("sx").cast("decimal(20,0)"))
    return m.select(
        "n", F.col("sx").cast("long").alias("total_cents"),
        F.expr("CAST((2 * 1000000 * (2 * srx - (nd + 1) * sxd) "
               "+ nd * sxd) div (2 * nd * sxd) AS BIGINT)")
         .alias("gini_ppm"))


_MW_Z = (
    "round((CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)"
    " / (2 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)"
    " * ((n1 + n2 + 1)"
    " - CAST(tie_cubes AS DOUBLE)"
    " / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))), 6)"
)


@query("ab_mann_whitney", oracle=f"""
WITH obs AS (
  SELECT event_type, user_id % 2 AS grp,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
v AS (
  SELECT event_type, cents,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM obs GROUP BY 1, 2
),
c AS (
  SELECT event_type, cents, na, nb,
         COALESCE(sum(nb) OVER (
           PARTITION BY event_type ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cumb_less
  FROM v
),
g AS (
  SELECT event_type,
         CAST(sum(na) AS BIGINT) AS n1,
         CAST(sum(nb) AS BIGINT) AS n2,
         CAST(sum(na * (2 * cumb_less + nb)) AS BIGINT) AS u2,
         CAST(sum((na + nb) * (na + nb) * (na + nb) - (na + nb))
              AS BIGINT) AS tie_cubes
  FROM c GROUP BY 1
)
SELECT event_type, n1, n2, u2, tie_cubes, {_MW_Z} AS z
FROM g
""")
def ab_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U per event type (arms = the same deterministic
    user-parity split as ab_welch_ttest) — the rank-sum complement to
    Welch's t: distribution-free, so it reads location shift even
    where cents are heavy-tailed and the t-test's normality lean is
    wrong. Exactness: U is accumulated DOUBLED (u2 = 2U = sum over
    distinct values of na*(2*#{b<a} + #{b=a})) so half-credit ties
    stay integer; tie_cubes = sum(t^3 - t) ships the exact tie
    correction; the normal-approximation z is then one shared-text
    IEEE chain over those integers (the Welch discipline). u2 <= 2*n1*n2
    holds int64 to ~10^9 per arm per type. Scale: ranks are NEVER
    materialized per row — the corpus collapses to distinct (type,
    cents) counts first (value-domain-bounded), and the cumulative
    count of below-value B-observations comes from the per-type
    ordered window over that bounded table; at a wider value domain
    the revenue_gini two-level band trick applies verbatim. The
    oracle is the same construction in SQL (engine-exact integers +
    shared z text)."""
    e = table(spark, sf_dir, "events")
    obs = e.select(
        "event_type", (F.col("user_id") % 2).alias("grp"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"))
    g0 = F.col("grp") == 0
    v = obs.groupBy("event_type", "cents").agg(
        F.sum(F.when(g0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(~g0, 1).otherwise(0)).alias("nb"))
    w = (Window.partitionBy("event_type").orderBy("cents")
               .rowsBetween(Window.unboundedPreceding, -1))
    c = v.withColumn("cumb_less",
                     F.coalesce(F.sum("nb").over(w), F.lit(0)))
    g = c.groupBy("event_type").agg(
        F.sum("na").alias("n1"),
        F.sum("nb").alias("n2"),
        F.sum(F.col("na") * (2 * F.col("cumb_less") + F.col("nb")))
         .alias("u2"),
        F.sum((F.col("na") + F.col("nb")) * (F.col("na") + F.col("nb"))
              * (F.col("na") + F.col("nb"))
              - (F.col("na") + F.col("nb"))).alias("tie_cubes"))
    return g.select("event_type", "n1", "n2", "u2", "tie_cubes",
                    F.expr(_MW_Z).alias("z"))


@query("anomaly_seasonal_dow", oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS c
  FROM orders GROUP BY 1
),
w AS (
  SELECT day, c, CAST(isodow(day) - 1 AS INT) AS dw FROM d
),
med AS (
  SELECT day, c, dw,
         max(CASE WHEN rw = (nw + 1) // 2 THEN c END) OVER
           (PARTITION BY dw) AS med
  FROM (
    SELECT day, c, dw,
           row_number() OVER (PARTITION BY dw ORDER BY c, day) AS rw,
           CAST(count(*) OVER (PARTITION BY dw) AS BIGINT) AS nw
    FROM w)
),
dev AS (
  SELECT day, c, dw, med, abs(c - med) AS dev FROM med
),
mad AS (
  SELECT day, c, dw, med, dev,
         max(CASE WHEN rd = (nw + 1) // 2 THEN dev END) OVER
           (PARTITION BY dw) AS mad
  FROM (
    SELECT day, c, dw, med, dev,
           row_number() OVER (PARTITION BY dw ORDER BY dev, day) AS rd,
           CAST(count(*) OVER (PARTITION BY dw) AS BIGINT) AS nw
    FROM dev)
)
SELECT day, c AS daily_cents, dw, med AS med_cents, mad AS mad_cents,
       dev AS dev_cents, (dev > 3 * mad) AS is_anomaly
FROM mad
""")
def anomaly_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted daily-revenue anomalies: each day is judged
    against its own DAY-OF-WEEK cohort (median + MAD), so a quiet
    Sunday isn't flagged low and a busy Monday isn't flagged high —
    the adjustment plain anomaly_zscore/anomaly_mad lack. Exactness:
    weekday is Spark weekday() == DuckDB isodow()-1 (both Mon=0 —
    dayofweek() disagrees between the engines and is avoided);
    medians are the LOWER nearest-rank statistic at (n+1) div 2 over
    unique (value, day) orders, so median and MAD stay exact integers
    in cents and the 3-MAD flag is a pure integer compare (a
    zero-MAD cohort — >=half its days identical — flags any
    deviation, the standard hypersensitive-MAD caveat). Scale: one
    map-combined groupBy(day); every window partitions by the 7
    weekday cohorts of the DAY-bounded series."""
    o = table(spark, sf_dir, "orders")
    d = (o.groupBy(F.to_date("o_orderdate").alias("day"))
          .agg(F.sum(F.expr(
              "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
                .alias("c"))
          .withColumn("dw", F.weekday("day").cast("int")))
    wp = Window.partitionBy("dw")
    med = (d.withColumn("rw", F.row_number().over(
                wp.orderBy("c", "day")))
            .withColumn("nw", F.count("*").over(wp))
            .withColumn("med", F.max(F.when(
                F.col("rw") == F.expr("(nw + 1) div 2"),
                F.col("c"))).over(wp))
            .withColumn("dev", F.abs(F.col("c") - F.col("med"))))
    mad = (med.withColumn("rd", F.row_number().over(
                wp.orderBy("dev", "day")))
              .withColumn("mad", F.max(F.when(
                  F.col("rd") == F.expr("(nw + 1) div 2"),
                  F.col("dev"))).over(wp)))
    return mad.select(
        "day", F.col("c").alias("daily_cents"), "dw",
        F.col("med").alias("med_cents"), F.col("mad").alias("mad_cents"),
        F.col("dev").alias("dev_cents"),
        (F.col("dev") > 3 * F.col("mad")).alias("is_anomaly"))


_KS_P = (
    "round(2 * exp(-2 * (CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))"
    " * (CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))"
    " * (CAST(n1 AS DOUBLE) * n2 / (n1 + n2))), 6)"
)


_KS_SQL = f"""
WITH obs AS (
  SELECT event_type, user_id % 2 AS grp,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
v AS (
  SELECT event_type, cents,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM obs GROUP BY 1, 2
),
c AS (
  SELECT event_type, cents, na, nb,
         sum(na) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cuma,
         sum(nb) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumb,
         sum(na) OVER (PARTITION BY event_type) AS n1,
         sum(nb) OVER (PARTITION BY event_type) AS n2
  FROM v
),
g AS (
  SELECT event_type, CAST(max(n1) AS BIGINT) AS n1,
         CAST(max(n2) AS BIGINT) AS n2,
         CAST(max(abs(cuma * n2 - cumb * n1)) AS BIGINT) AS d_num
  FROM c GROUP BY 1
)
SELECT event_type, n1, n2, d_num,
       CAST((2000000 * d_num + n1 * n2) // (2 * n1 * n2) AS BIGINT)
         AS d_e6,
       {_KS_P} AS p_asym
FROM g
"""


@query("ab_ks_test", oracle=_KS_SQL)
def ab_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov per event type (same user-parity
    arms as ab_welch_ttest/ab_mann_whitney) — the SHAPE-sensitive
    companion: Welch reads mean shift, Mann-Whitney stochastic
    ordering, KS any ECDF divergence (variance change, bimodality).
    Exactness: D = max|ECDF_a - ECDF_b| never divides — the statistic
    is kept as the exact integer CROSS-MULTIPLIED numerator d_num =
    max|cumA*n2 - cumB*n1| over distinct values (the supremum over
    the full real line is attained at a jump point, i.e. an observed
    value, so scanning distinct cents is exact); d_e6 is one half-away
    integer division and the asymptotic p-value 2*exp(-2*lambda^2) one
    shared-text IEEE chain. Scale: identical posture to
    ab_mann_whitney — corpus collapses to distinct (type, cents)
    counts, cumulative windows run on that value-domain-bounded
    table."""
    e = table(spark, sf_dir, "events")
    obs = e.select(
        "event_type", (F.col("user_id") % 2).alias("grp"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"))
    g0 = F.col("grp") == 0
    v = obs.groupBy("event_type", "cents").agg(
        F.sum(F.when(g0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(~g0, 1).otherwise(0)).alias("nb"))
    wcum = (Window.partitionBy("event_type").orderBy("cents")
                  .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy("event_type")
    c = (v.withColumn("cuma", F.sum("na").over(wcum))
          .withColumn("cumb", F.sum("nb").over(wcum))
          .withColumn("n1", F.sum("na").over(wall))
          .withColumn("n2", F.sum("nb").over(wall)))
    g = c.groupBy("event_type").agg(
        F.max("n1").alias("n1"), F.max("n2").alias("n2"),
        F.max(F.abs(F.col("cuma") * F.col("n2")
                    - F.col("cumb") * F.col("n1"))).alias("d_num"))
    return g.select(
        "event_type", "n1", "n2", "d_num",
        # decimal routing: 2e6*n1*n2 crosses int64 near ~7e7 rows per
        # arm (the revenue_gini 10x-smoke lesson, applied at design
        # time); the oracle side is HUGEINT automatically
        F.expr("CAST((2000000 * CAST(d_num AS DECIMAL(28,0)) "
               "+ CAST(n1 AS DECIMAL(19,0)) * n2) "
               "div (2 * CAST(n1 AS DECIMAL(19,0)) * n2) AS BIGINT)")
         .alias("d_e6"),
        F.expr(_KS_P).alias("p_asym"))


# CUPED finals: one shared-text IEEE chain over exact integer moments
# (cast to decimal(38) first — n*Sxy crosses int64 at ~10x bench scale).
_CUPED = {
    "theta": "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
             " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)",
    "delta": "round(CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0, 4)",
    "delta_adj": "round((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)"
                 " - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
                 " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
                 " * (CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0), 4)",
    "var_reduction": "round(((CAST(n AS DOUBLE) * sxy"
                     " - CAST(sx AS DOUBLE) * sy)"
                     " * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))"
                     " / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
                     " * (CAST(n AS DOUBLE) * syy"
                     " - CAST(sy AS DOUBLE) * sy)), 6)",
}


@query("ab_cuped_adjust", oracle=f"""
WITH b AS (
  SELECT min(ts) AS t0, max(ts) AS t1 FROM events
),
h AS (SELECT make_timestamp(epoch_us(t0)
        + (epoch_us(t1) - epoch_us(t0)) // 2) AS mid FROM b),
u AS (
  SELECT e.user_id, e.user_id % 2 AS grp,
         CAST(sum(CASE WHEN e.ts < h.mid
                  THEN CAST(floor(e.value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN e.ts >= h.mid
                  THEN CAST(floor(e.value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events e, h
  GROUP BY 1, 2
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(y * y) AS HUGEINT) AS syy,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN grp = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
         CAST(sum(CASE WHEN grp = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
         CAST(sum(CASE WHEN grp = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
         CAST(sum(CASE WHEN grp = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
  FROM u
)
SELECT CAST(n AS BIGINT) AS n_users, n0, n1,
       {_CUPED['theta']} AS theta,
       {_CUPED['delta']} AS delta_cents,
       {_CUPED['delta_adj']} AS delta_adj_cents,
       {_CUPED['var_reduction']} AS var_reduction
FROM m
""")
def ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout (Deng et al. 2013,
    the industry-standard pre-period adjustment): each user's
    experiment-period metric y is adjusted by theta * (x - mean(x))
    where x is the SAME user's pre-period spend (timeline split at
    its midpoint) — because assignment is independent of x, the
    adjusted arm difference is unbiased but its variance shrinks by
    the squared x,y correlation (reported as var_reduction). The
    whole statistic reduces to ONE map-combined aggregate of exact
    integer per-user moments (n, Σx, Σy, Σxy, Σx², Σy², per-arm
    splits) accumulated in HUGEINT/decimal (n·Σxy crosses int64 near
    10x bench scale), then theta / delta / adjusted delta /
    var_reduction are shared-text IEEE chains over those integers —
    the ab_welch_ttest discipline extended to covariance. The
    midpoint split rides min/max(ts) (integer microsecond arithmetic,
    both engines truncate the /2 identically on the micros grid).
    Scale: one scan + one user-keyed aggregate + one 1-row fold;
    nothing else."""
    e = table(spark, sf_dir, "events")
    b = e.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    h = b.select(F.expr(
        "timestamp_micros(unix_micros(t0) "
        "+ (unix_micros(t1) - unix_micros(t0)) div 2)").alias("mid"))
    cents = F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    u = (e.crossJoin(F.broadcast(h))
          .groupBy("user_id", (F.col("user_id") % 2).alias("grp"))
          .agg(F.sum(F.when(F.col("ts") < F.col("mid"), cents)
                      .otherwise(0)).alias("x"),
               F.sum(F.when(F.col("ts") >= F.col("mid"), cents)
                      .otherwise(0)).alias("y")))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = u.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        dec(F.sum("x")).alias("sx"), dec(F.sum("y")).alias("sy"),
        dec(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
        dec(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
        dec(F.sum(F.col("y") * F.col("y"))).alias("syy"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("x")).otherwise(0))
         .alias("sx0"),
        F.sum(F.when(F.col("grp") == 1, F.col("x")).otherwise(0))
         .alias("sx1"),
        F.sum(F.when(F.col("grp") == 0, F.col("y")).otherwise(0))
         .alias("sy0"),
        F.sum(F.when(F.col("grp") == 1, F.col("y")).otherwise(0))
         .alias("sy1"))
    return m.select(
        F.col("n").cast("long").alias("n_users"), "n0", "n1",
        F.expr(_CUPED["theta"]).alias("theta"),
        F.expr(_CUPED["delta"]).alias("delta_cents"),
        F.expr(_CUPED["delta_adj"]).alias("delta_adj_cents"),
        F.expr(_CUPED["var_reduction"]).alias("var_reduction"))


_BH_M, _BH_Q100 = 5, 10  # m hypotheses, q = 0.10


@query("ab_fdr_bh", oracle=f"""
WITH ks AS ({_KS_SQL}),
rk AS (
  SELECT event_type, p_asym,
         CAST(row_number() OVER (ORDER BY p_asym, event_type) AS BIGINT)
           AS rnk
  FROM ks
),
fl AS (
  SELECT event_type, p_asym, rnk,
         round(CAST(rnk AS DOUBLE) * {_BH_Q100} / (100.0 * {_BH_M}), 6)
           AS bh_thresh,
         (p_asym <= round(CAST(rnk AS DOUBLE) * {_BH_Q100}
                          / (100.0 * {_BH_M}), 6)) AS under
  FROM rk
),
k AS (
  SELECT coalesce(max(CASE WHEN under THEN rnk END), 0) AS kstar FROM fl
)
SELECT fl.event_type, fl.p_asym, fl.rnk, fl.bh_thresh,
       (fl.rnk <= k.kstar) AS rejected
FROM fl, k
""")
def ab_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over the per-type KS
    p-values (q = 0.10) — the multiple-testing guard every
    experimentation platform needs once it reads out one test per
    segment: sort the m = 5 p-values, find the LARGEST k with
    p_(k) <= k·q/m, and reject hypotheses 1..k (the step-up may
    reject a p ABOVE its own threshold when a later one qualifies —
    the part naive per-row thresholding gets wrong). Composes the
    registered `ab_ks_test` frame directly (same construction, same
    shared-text p chain); ranks over the unique (p, type) order and
    the k* fold run on the m-bounded frame, so the multiple-testing
    layer adds zero data-sized work. Thresholds are rounded to the
    1e-6 grid in BOTH engines before comparison so boundary
    membership is engine-exact."""
    ks = ab_ks_test(spark, sf_dir)
    rk = ks.select(
        "event_type", "p_asym",
        F.row_number().over(Window.orderBy("p_asym", "event_type"))
         .cast("long").alias("rnk"))
    thr = F.round(F.col("rnk").cast("double") * _BH_Q100 / (100.0 * _BH_M),
                  6)
    fl = rk.select("event_type", "p_asym", "rnk",
                   thr.alias("bh_thresh"),
                   (F.col("p_asym") <= thr).alias("under"))
    k = fl.agg(F.coalesce(
        F.max(F.when(F.col("under"), F.col("rnk"))), F.lit(0))
        .alias("kstar"))
    return (fl.crossJoin(F.broadcast(k))
              .select("event_type", "p_asym", "rnk", "bh_thresh",
                      (F.col("rnk") <= F.col("kstar")).alias("rejected")))


_DID = {
    "did": "round((CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10)"
           " - (CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00), 4)",
    "se": "round(sqrt("
          " (CAST(n11 AS DOUBLE) * ss11 - CAST(s11 AS DOUBLE) * s11)"
          " / (CAST(n11 AS DOUBLE) * n11 * (n11 - 1))"
          " + (CAST(n10 AS DOUBLE) * ss10 - CAST(s10 AS DOUBLE) * s10)"
          " / (CAST(n10 AS DOUBLE) * n10 * (n10 - 1))"
          " + (CAST(n01 AS DOUBLE) * ss01 - CAST(s01 AS DOUBLE) * s01)"
          " / (CAST(n01 AS DOUBLE) * n01 * (n01 - 1))"
          " + (CAST(n00 AS DOUBLE) * ss00 - CAST(s00 AS DOUBLE) * s00)"
          " / (CAST(n00 AS DOUBLE) * n00 * (n00 - 1))), 4)",
}


@query("ab_diff_in_diff", oracle=f"""
WITH b AS (SELECT min(ts) AS t0, max(ts) AS t1 FROM events),
h AS (SELECT make_timestamp(epoch_us(t0)
        + (epoch_us(t1) - epoch_us(t0)) // 2) AS mid FROM b),
u AS (
  SELECT user_id % 2 AS grp,
         CASE WHEN e.ts >= h.mid THEN 1 ELSE 0 END AS post,
         CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS y,
         CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)
                  * CAST(floor(e.value * 100 + 0.5) AS BIGINT))
              AS HUGEINT) AS yy,
         CAST(count(*) AS BIGINT) AS n
  FROM events e, h
  GROUP BY 1, 2, e.user_id
),
m AS (
  SELECT
    CAST(sum(CASE WHEN grp=1 AND post=1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
    CAST(sum(CASE WHEN grp=1 AND post=0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(sum(CASE WHEN grp=0 AND post=1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    CAST(sum(CASE WHEN grp=0 AND post=0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
    CAST(sum(CASE WHEN grp=1 AND post=1 THEN y ELSE 0 END) AS BIGINT) AS s11,
    CAST(sum(CASE WHEN grp=1 AND post=0 THEN y ELSE 0 END) AS BIGINT) AS s10,
    CAST(sum(CASE WHEN grp=0 AND post=1 THEN y ELSE 0 END) AS BIGINT) AS s01,
    CAST(sum(CASE WHEN grp=0 AND post=0 THEN y ELSE 0 END) AS BIGINT) AS s00,
    CAST(sum(CASE WHEN grp=1 AND post=1 THEN y*y ELSE 0 END) AS HUGEINT) AS ss11,
    CAST(sum(CASE WHEN grp=1 AND post=0 THEN y*y ELSE 0 END) AS HUGEINT) AS ss10,
    CAST(sum(CASE WHEN grp=0 AND post=1 THEN y*y ELSE 0 END) AS HUGEINT) AS ss01,
    CAST(sum(CASE WHEN grp=0 AND post=0 THEN y*y ELSE 0 END) AS HUGEINT) AS ss00
  FROM u
)
SELECT n00, n01, n10, n11,
       {_DID['did']} AS did_cents,
       {_DID['se']} AS se_cents
FROM m
""")
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the parity arms' effect
    on per-user spend across the timeline midpoint — the
    observational-causal staple when randomization can't be assumed:
    delta = (treated post − treated pre) − (control post − control
    pre) cancels both the group baseline and the common time trend
    (the two confounds a naive post-only comparison absorbs), with
    the unit of analysis a USER-PERIOD cell so the SE is the
    four-cell pooled standard error of independent means. Exactness:
    per-user-period integer cent sums feed a single map-combined
    4-cell moment aggregate (n, Σy, Σy² per cell — Σy² in
    HUGEINT/decimal), and the estimate/SE are shared-text chains (the
    ab_welch_ttest discipline; the midpoint is explicit epoch_us
    arithmetic after the interval-division trap CUPED caught).
    Scale: one scan, one (user, period)-keyed aggregate, one 1-row
    fold."""
    e = table(spark, sf_dir, "events")
    b = e.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    h = b.select(F.expr(
        "timestamp_micros(unix_micros(t0) "
        "+ (unix_micros(t1) - unix_micros(t0)) div 2)").alias("mid"))
    cents = F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    u = (e.crossJoin(F.broadcast(h))
          .groupBy("user_id", (F.col("user_id") % 2).alias("grp"),
                   F.when(F.col("ts") >= F.col("mid"), 1).otherwise(0)
                    .alias("post"))
          .agg(F.sum(cents).alias("y")))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cell = lambda g, p: (F.col("grp") == g) & (F.col("post") == p)  # noqa: E731
    aggs = []
    for (g, p), tag in (((1, 1), "11"), ((1, 0), "10"),
                        ((0, 1), "01"), ((0, 0), "00")):
        aggs += [
            F.sum(F.when(cell(g, p), 1).otherwise(0)).alias(f"n{tag}"),
            F.sum(F.when(cell(g, p), F.col("y")).otherwise(0))
             .alias(f"s{tag}"),
            dec(F.sum(F.when(cell(g, p), F.col("y") * F.col("y"))
                       .otherwise(0))).alias(f"ss{tag}"),
        ]
    m = u.agg(*aggs)
    return m.select("n00", "n01", "n10", "n11",
                    F.expr(_DID["did"]).alias("did_cents"),
                    F.expr(_DID["se"]).alias("se_cents"))


# Poisson(1) CDF thresholds on the u ∈ [0, 1000003) grid, precomputed
# Python literals (floor(cum_k * 1000003)) — neither engine evaluates
# exp/factorial; weights ≥ 9 have probability < 1e-6 and are clamped
_POIS1_T = [367880, 735761, 919701, 981014, 996343, 999408, 999919,
            999992, 1000001]
_BOOT_B = 100


def _pois_w(u: str) -> str:
    """CASE chain mapping a uniform u to a Poisson(1) draw."""
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS1_T))
    return f"CAST(CASE {cases} ELSE 9 END AS BIGINT)"


@query("bootstrap_ci_mean", oracle=f"""
WITH c AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
rep AS (SELECT CAST(range AS BIGINT) AS r FROM range(0, {_BOOT_B})),
w AS (
  SELECT r, cents,
         {_pois_w("((k % 1000003) * 2654435761 + r * 40503) % 1000003")}
           AS w
  FROM c, rep
),
m AS (
  SELECT r, CAST(sum(w) AS BIGINT) AS n_w,
         CAST(sum(w * cents) AS HUGEINT) AS s_w
  FROM w GROUP BY 1
),
means AS (
  SELECT r, n_w, round(CAST(s_w AS DOUBLE) / n_w, 4) AS m
  FROM m WHERE n_w > 0
),
rk AS (
  SELECT m, row_number() OVER (ORDER BY m, r) AS i,
         count(*) OVER () AS nb
  FROM means
),
pt AS (
  SELECT round(CAST(sum(cents) AS DOUBLE) / count(*), 4) AS full_mean,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM c
)
SELECT pt.n_rows, pt.full_mean,
       CAST(rk.nb AS BIGINT) AS n_reps,
       max(CASE WHEN rk.i = CAST(ceil(0.025 * rk.nb) AS BIGINT)
                THEN rk.m END) AS ci_lo,
       max(CASE WHEN rk.i = CAST(ceil(0.975 * rk.nb) AS BIGINT)
                THEN rk.m END) AS ci_hi
FROM rk, pt
GROUP BY pt.n_rows, pt.full_mean, rk.nb
""")
def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap 95% confidence interval for the mean order
    value via the POISSON BOOTSTRAP (Chamandy et al., the distributed
    resampling scheme: multinomial replicate counts are approximated
    by independent Poisson(1) weights, so each row's contribution to
    every replicate is computed locally — no sampling coordination,
    ONE pass, map-combined into B cells). Everything deterministic
    and engine-exact: the per-(row, replicate) uniform is a Knuth
    multiplicative hash (key reduced mod 1000003 BEFORE the multiply
    so the product never overflows int64 at any key scale), the
    Poisson draw is a CASE chain over nine precomputed CDF literals,
    replicate sums are exact integers (HUGEINT/decimal for Σw·cents),
    each replicate mean is ONE rounded IEEE division, and the CI
    bounds are nearest-rank order statistics of the ROUNDED means
    with replicate-id tiebreak. Cost is B× the scan rows in expanded
    form — linear by design and embarrassingly parallel; B=100 lives
    in one broadcast frame."""
    o = table(spark, sf_dir, "orders")
    c = o.select(F.col("o_orderkey").alias("k"),
                 F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                  .alias("cents"))
    c = c.localCheckpoint(eager=False)
    rep = spark.range(_BOOT_B).select(F.col("id").cast("long").alias("r"))
    w = (c.crossJoin(F.broadcast(rep))
         .select("r", "cents", F.expr(_pois_w(
             "((k % 1000003) * 2654435761 + r * 40503) % 1000003"))
             .alias("w")))
    m = w.groupBy("r").agg(
        F.sum("w").alias("n_w"),
        F.sum((F.col("w").cast("decimal(20,0)") * F.col("cents"))
              .cast("decimal(38,0)")).cast("decimal(38,0)").alias("s_w"))
    means = (m.filter(F.col("n_w") > 0)
             .select("r", "n_w",
                     F.round(F.col("s_w").cast("double") / F.col("n_w"), 4)
                      .alias("m")))
    wrk = Window.orderBy("m", "r")
    rk = means.select(
        "m", F.row_number().over(wrk).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("nb"))
    pt = c.agg(
        F.round(F.sum("cents").cast("double") / F.count("*"), 4)
         .alias("full_mean"),
        F.count("*").alias("n_rows"))
    return (rk.crossJoin(F.broadcast(pt))
            .groupBy("n_rows", "full_mean",
                     F.col("nb").cast("long").alias("n_reps"))
            .agg(F.max(F.when(
                F.col("i") == F.expr("CAST(ceil(0.025 * nb) AS BIGINT)"),
                F.col("m"))).alias("ci_lo"),
                 F.max(F.when(
                F.col("i") == F.expr("CAST(ceil(0.975 * nb) AS BIGINT)"),
                F.col("m"))).alias("ci_hi")))


# O'Brien-Fleming-shaped group-sequential z boundaries for K=5 looks,
# two-sided alpha = 0.05: z_k = 2.0403 * sqrt(K/k), precomputed Python
# literals (the canonical OBF shape; neither engine evaluates sqrt)
_OBF_BOUNDS = [4.5622, 3.226, 2.634, 2.2811, 2.0403]

_SEQ_Z = ("round((sa / CAST(na AS DOUBLE) - sb / CAST(nb AS DOUBLE))"
          " / sqrt((ssa / CAST(na AS DOUBLE)"
          "         - (sa / CAST(na AS DOUBLE)) * (sa / CAST(na AS DOUBLE)))"
          "        / na"
          "        + (ssb / CAST(nb AS DOUBLE)"
          "           - (sb / CAST(nb AS DOUBLE)) * (sb / CAST(nb AS DOUBLE)))"
          "        / nb), 6)")


@query("ab_sequential_obf", oracle=f"""
WITH span AS (
  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
),
obs AS (
  SELECT CAST(least(((epoch_us(ts) - t0) * 5) // (t1 - t0 + 1), 4) + 1
              AS BIGINT) AS look,
         user_id % 2 AS grp,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events, span
),
m AS (
  SELECT look,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ia,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ib,
         CAST(sum(CASE WHEN grp = 0 THEN cents ELSE 0 END) AS BIGINT)
           AS va,
         CAST(sum(CASE WHEN grp = 1 THEN cents ELSE 0 END) AS BIGINT)
           AS vb,
         CAST(sum(CASE WHEN grp = 0 THEN cents * cents ELSE 0 END)
              AS HUGEINT) AS wa,
         CAST(sum(CASE WHEN grp = 1 THEN cents * cents ELSE 0 END)
              AS HUGEINT) AS wb
  FROM obs GROUP BY 1
),
c AS (
  SELECT look,
         CAST(sum(ia) OVER w AS BIGINT) AS na,
         CAST(sum(ib) OVER w AS BIGINT) AS nb,
         CAST(sum(va) OVER w AS DOUBLE) AS sa,
         CAST(sum(vb) OVER w AS DOUBLE) AS sb,
         CAST(sum(wa) OVER w AS DOUBLE) AS ssa,
         CAST(sum(wb) OVER w AS DOUBLE) AS ssb
  FROM m
  WINDOW w AS (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
b AS (
  SELECT CAST(range + 1 AS BIGINT) AS look,
         CAST(([{','.join(str(v) for v in _OBF_BOUNDS)}])[range + 1]
              AS DOUBLE) AS bound
  FROM range(0, 5)
)
SELECT c.look, na, nb, {_SEQ_Z} AS z, b.bound,
       (abs({_SEQ_Z}) > b.bound) AS reject
FROM c JOIN b ON b.look = c.look
""")
def ab_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien-Fleming-shaped
    stopping boundaries (K=5 interim looks, two-sided α=0.05): the
    experimentation-platform staple that lets an experiment PEEK five
    times without inflating false positives — early looks demand
    z > 4.56, the final look nearly the fixed-horizon 2.04. Looks
    partition the event timeline into five equal spans
    (epoch-microsecond arithmetic, the CUPED interval-trap
    discipline); per-(look, arm) integer moments cumulate over a
    5-row frame, the z at each look is one shared-text IEEE chain
    over exact integers (the welch discipline), and the boundaries
    enter as five precomputed literals — the reject decision compares
    the ROUNDED z so no engine can straddle. Plan: one corpus scan →
    10-cell moment aggregate; everything after is 5-row frames."""
    e = table(spark, sf_dir, "events")
    span = e.agg(F.min(F.unix_micros("ts")).alias("t0"),
                 F.max(F.unix_micros("ts")).alias("t1"))
    obs = (e.crossJoin(F.broadcast(span))
           .select(F.expr("CAST(least(((unix_micros(ts) - t0) * 5) "
                          "div (t1 - t0 + 1), 4) + 1 AS BIGINT)")
                    .alias("look"),
                   (F.col("user_id") % 2).alias("grp"),
                   F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
                    .alias("cents")))
    g0 = F.col("grp") == 0
    m = obs.groupBy("look").agg(
        F.sum(F.when(g0, 1).otherwise(0)).alias("ia"),
        F.sum(F.when(~g0, 1).otherwise(0)).alias("ib"),
        F.sum(F.when(g0, F.col("cents")).otherwise(0)).alias("va"),
        F.sum(F.when(~g0, F.col("cents")).otherwise(0)).alias("vb"),
        F.sum(F.when(g0, (F.col("cents").cast("decimal(20,0)")
                          * F.col("cents")).cast("decimal(38,0)"))
               .otherwise(F.lit(0).cast("decimal(38,0)"))).alias("wa"),
        F.sum(F.when(~g0, (F.col("cents").cast("decimal(20,0)")
                           * F.col("cents")).cast("decimal(38,0)"))
               .otherwise(F.lit(0).cast("decimal(38,0)"))).alias("wb"))
    w = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
    c = m.select(
        "look",
        F.sum("ia").over(w).cast("long").alias("na"),
        F.sum("ib").over(w).cast("long").alias("nb"),
        F.sum("va").over(w).cast("double").alias("sa"),
        F.sum("vb").over(w).cast("double").alias("sb"),
        F.sum("wa").over(w).cast("double").alias("ssa"),
        F.sum("wb").over(w).cast("double").alias("ssb"))
    barr = F.array(*[F.lit(v) for v in _OBF_BOUNDS])
    b = (spark.range(1, 6)
         .select(F.col("id").cast("long").alias("look"),
                 F.element_at(barr, F.col("id").cast("int"))
                  .alias("bound")))
    return (c.join(F.broadcast(b), "look")
            .select("look", "na", "nb",
                    F.expr(_SEQ_Z).alias("z"), "bound",
                    (F.abs(F.expr(_SEQ_Z)) > F.col("bound"))
                     .alias("reject")))


@query("trimmed_mean_robust", oracle="""
WITH r AS (
  SELECT c.c_mktsegment AS seg,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o.o_orderkey AS k
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
q AS (
  SELECT seg, cents,
         row_number() OVER (PARTITION BY seg ORDER BY cents, k) AS i,
         count(*) OVER (PARTITION BY seg) AS n
  FROM r
),
lim AS (
  SELECT seg, n, n // 20 AS kt FROM q GROUP BY 1, 2
),
mid AS (
  SELECT q.seg, CAST(sum(q.cents) AS HUGEINT) AS s_mid,
         CAST(count(*) AS BIGINT) AS n_mid
  FROM q JOIN lim ON lim.seg = q.seg
  WHERE q.i > lim.kt AND q.i <= lim.n - lim.kt
  GROUP BY 1
),
edge AS (
  SELECT q.seg,
         max(CASE WHEN q.i = lim.kt + 1 THEN q.cents END) AS lo_v,
         max(CASE WHEN q.i = lim.n - lim.kt THEN q.cents END) AS hi_v
  FROM q JOIN lim ON lim.seg = q.seg
  GROUP BY 1
)
SELECT lim.seg, CAST(lim.n AS BIGINT) AS n,
       CAST(lim.kt AS BIGINT) AS k_trim,
       CAST(edge.lo_v AS BIGINT) AS lo_cents,
       CAST(edge.hi_v AS BIGINT) AS hi_cents,
       round(CAST(s_mid AS DOUBLE) / n_mid, 4) AS trimmed_mean,
       round(CAST(s_mid + lim.kt * CAST(edge.lo_v AS HUGEINT)
                  + lim.kt * CAST(edge.hi_v AS HUGEINT) AS DOUBLE)
             / lim.n, 4) AS winsorized_mean
FROM lim JOIN mid ON mid.seg = lim.seg JOIN edge ON edge.seg = lim.seg
""")
def trimmed_mean_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided trimmed AND winsorized means of order value per
    market segment — the robust-location pair every metrics platform
    keeps beside the raw mean (trimming drops the k = n div 20
    extreme values per tail; winsorizing clamps them to the boundary
    order statistics, preserving n). Exact end to end: ranks over the
    UNIQUE (cents, orderkey) order come from the two-level banded
    order statistic (the revenue_gini machinery — band offsets +
    per-band row_number, no global sort), the interior sum and the
    two boundary values are integer aggregates over that ranked
    frame, and each mean is ONE rounded IEEE division; the winsorized
    reconstruction s_mid + k·lo + k·hi rides decimal/HUGEINT. Plan:
    one rollup-sized shuffle for ranks, then segment-bounded
    aggregates."""
    o = table(spark, sf_dir, "orders")
    cst = table(spark, sf_dir, "customer")
    r = (o.join(cst, o["o_custkey"] == cst["c_custkey"])
         .select(F.col("c_mktsegment").alias("seg"),
                 F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                  .alias("cents"),
                 F.col("o_orderkey").alias("k"))
         .withColumn("band", F.expr("cents div 1000000"))
         .localCheckpoint(eager=False))
    bands = r.groupBy("seg", "band").agg(F.count("*").alias("bn"))
    wb = (Window.partitionBy("seg").orderBy("band")
          .rowsBetween(Window.unboundedPreceding, -1))
    offs = bands.select(
        "seg", "band",
        F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("off"))
    wl = Window.partitionBy("seg", "band").orderBy("cents", "k")
    q = (r.join(F.broadcast(offs), ["seg", "band"])
         .select("seg", "cents",
                 (F.col("off") + F.row_number().over(wl)).alias("i"))
         .localCheckpoint(eager=False))
    lim = (q.groupBy("seg").agg(F.count("*").alias("n"))
           .withColumn("kt", F.expr("n div 20")))
    mid = (q.join(F.broadcast(lim), "seg")
           .filter((F.col("i") > F.col("kt"))
                   & (F.col("i") <= F.col("n") - F.col("kt")))
           .groupBy("seg")
           .agg(F.sum(F.col("cents").cast("decimal(38,0)"))
                 .cast("decimal(38,0)").alias("s_mid"),
                F.count("*").alias("n_mid")))
    edge = (q.join(F.broadcast(lim), "seg")
            .groupBy("seg")
            .agg(F.max(F.when(F.col("i") == F.col("kt") + 1,
                              F.col("cents"))).alias("lo_v"),
                 F.max(F.when(F.col("i") == F.col("n") - F.col("kt"),
                              F.col("cents"))).alias("hi_v")))
    return (lim.join(mid, "seg").join(edge, "seg")
            .select("seg",
                    F.col("n").cast("long").alias("n"),
                    F.col("kt").cast("long").alias("k_trim"),
                    F.col("lo_v").cast("long").alias("lo_cents"),
                    F.col("hi_v").cast("long").alias("hi_cents"),
                    F.round(F.col("s_mid").cast("double")
                            / F.col("n_mid"), 4).alias("trimmed_mean"),
                    F.round(F.expr(
                        "CAST(s_mid + kt * CAST(lo_v AS DECIMAL(38,0)) "
                        "+ kt * CAST(hi_v AS DECIMAL(38,0)) AS DOUBLE)")
                        / F.col("n"), 4).alias("winsorized_mean")))


_UPLIFT_Z = ("round((CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc)"
             " / sqrt((CAST(ct + cc AS DOUBLE) / (nt + nc))"
             " * (1.0 - CAST(ct + cc AS DOUBLE) / (nt + nc))"
             " * (1.0 / nt + 1.0 / nc)), 6)")


@query("ab_uplift_by_segment", oracle=f"""
WITH obs AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey % 2 AS grp,
         CASE WHEN o.o_totalprice > 150000 THEN 1 ELSE 0 END AS conv
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
m AS (
  SELECT seg,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT)
           AS cc,
         CAST(sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT)
           AS ct
  FROM obs GROUP BY 1
)
SELECT seg, nc, nt, cc, ct,
       CAST((2 * 1000000 * ct + nt) // (2 * nt) AS BIGINT)
         - CAST((2 * 1000000 * cc + nc) // (2 * nc) AS BIGINT)
         AS uplift_ppm,
       {_UPLIFT_Z} AS z
FROM m
""")
def ab_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment uplift readout for a binary conversion (order over
    $150k), arms = custkey parity — the heterogeneous-treatment-effect
    table an experimentation platform renders next to the pooled
    result ("the feature helps BUILDING but hurts MACHINERY"): uplift
    = treated-rate − control-rate as a DIFFERENCE of half-away ppm
    (each rate exact), and the two-proportion pooled z as one welch-
    discipline shared-text chain over exact integer counts. One scan
    → |segments|×2 conditional cells; nothing data-sized after."""
    o = table(spark, sf_dir, "orders")
    cst = table(spark, sf_dir, "customer")
    obs = (o.join(cst, o["o_custkey"] == cst["c_custkey"])
           .select(F.col("c_mktsegment").alias("seg"),
                   (F.col("o_custkey") % 2).alias("grp"),
                   F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)
                    .alias("conv")))
    g0 = F.col("grp") == 0
    m = obs.groupBy("seg").agg(
        F.sum(F.when(g0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(~g0, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(g0, F.col("conv")).otherwise(0)).alias("cc"),
        F.sum(F.when(~g0, F.col("conv")).otherwise(0)).alias("ct"))
    return m.select(
        "seg", "nc", "nt", "cc", "ct",
        (F.expr("CAST((2 * 1000000 * ct + nt) DIV (2 * nt) AS BIGINT)")
         - F.expr("CAST((2 * 1000000 * cc + nc) DIV (2 * nc) AS BIGINT)"))
        .alias("uplift_ppm"),
        F.expr(_UPLIFT_Z).alias("z"))
