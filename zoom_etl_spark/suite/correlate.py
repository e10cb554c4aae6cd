"""Rank-correlation / association operators over the per-customer
order rollup: exact Spearman rho (Pearson on doubled average ranks)
and exact Kendall tau-b (dense-grid 2D dominance counting) per market
segment — the distribution-free dependence layer that complements the
moment-based ``agg_stats_corr`` (Pearson) and ``trend_linefit`` (OLS).

Engine-exactness discipline: ranks and pair counts are EXACT integers
throughout — doubled average ranks (2x the midrank is always an
integer, so ties never create fractions), concordant/discordant pair
counts from integer cell algebra — and the only float arithmetic is
the single shared-text IEEE chain producing the final coefficient
(identical expression text in Spark and DuckDB, the ``ab_welch_ttest``
discipline), immediately rounded to 6 digits.

Scale posture: the only data-sized operation in either query is the
per-customer rollup + the segment join. Spearman's ranks come from
value CELLS (groupBy value), with the cumulative-below count computed
two-level (band by cents div 1e6, tiny per-segment band-offset window,
within-band cell window in parallel) — the ``revenue_gini`` order
statistic generalized to midranks, no global single-task sort.
Kendall's tau is O(n^2) pairs computed WITHOUT pairs: counts collapse
to a (order-count x spend-band) grid bounded by the DOMAINS (not the
data), densified per segment, and concordant pairs fall out of a 2D
prefix sum — three windows over grid-sized frames.

Reference scope: the reference's analytics stop at plain aggregates
(/root/reference/src/db/load.py); this module is part of the §2.13
statistical extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# per-customer rollup shared by both queries: x = order count,
# y = lifetime spend in exact integer cents, seg = market segment
_ROLLUP_SQL = """
r AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey AS k,
         CAST(count(*) AS BIGINT) AS x,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)"""

# the one float chain: coefficient = num / (sqrt(d1) * sqrt(d2)),
# every input an exact integer (decimal/HUGEINT), each sqrt taken
# separately so the doubles stay far from overflow; degenerate
# zero-variance groups yield NULL rather than a NaN that hashes
# differently across engines
_COEF = ("CASE WHEN d1 = 0 OR d2 = 0 THEN NULL ELSE "
         "round(CAST(num AS DOUBLE) / "
         "(sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))), 6) END")


def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy(F.col("c_mktsegment").alias("seg"),
                     F.col("o_custkey").alias("k"))
            .agg(F.count("*").alias("x"),
                 F.sum(F.expr(
                     "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
                 .alias("y")))


@query("corr_spearman", oracle=f"""
WITH {_ROLLUP_SQL},
dx AS (
  SELECT *,
         2 * rank() OVER (PARTITION BY seg ORDER BY x)
           + count(*) OVER (PARTITION BY seg, x) - 1 AS drx,
         2 * rank() OVER (PARTITION BY seg ORDER BY y)
           + count(*) OVER (PARTITION BY seg, y) - 1 AS dry
  FROM r
),
m AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(drx AS HUGEINT)) AS sx, sum(CAST(dry AS HUGEINT)) AS sy,
         sum(CAST(drx AS HUGEINT) * dry) AS sxy,
         sum(CAST(drx AS HUGEINT) * drx) AS sxx,
         sum(CAST(dry AS HUGEINT) * dry) AS syy
  FROM dx GROUP BY 1
),
f AS (
  SELECT seg, n, n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS d1, n * syy - sy * sy AS d2
  FROM m
)
SELECT seg, n, {_COEF} AS rho FROM f
""")
def corr_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's order count and
    lifetime spend, per market segment — "does ordering more often go
    with spending more?" robust to the spend distribution's heavy
    tail (Pearson on ranks = Spearman). Ties use midranks, carried as
    DOUBLED ranks so they stay exact integers: dr(v) = 2·|{u < v}| +
    |{u = v}| + 1. The below-counts come from value cells, two-level:
    order-count cells are domain-bounded; spend cells band by
    cents div 1e6 with a per-segment band-offset window (tiny frame)
    and a within-band cell window (parallel across bands) — no global
    sort. Moments accumulate in decimal(38)/HUGEINT (n·Σdrx·drx is
    ~4n³), and rho is the one shared-text IEEE chain over exact
    integers, rounded to 6 digits."""
    r = _rollup(spark, sf_dir).localCheckpoint(eager=False)

    # x side: domain-bounded cells (order counts), one tiny window
    xc = r.groupBy("seg", "x").agg(F.count("*").alias("cx"))
    wx = (Window.partitionBy("seg").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1))
    xr = xc.select(
        "seg", "x",
        (2 * F.coalesce(F.sum("cx").over(wx), F.lit(0))
         + F.col("cx") + 1).alias("drx"))

    # y side: two-level banded cells (the revenue_gini order statistic
    # generalized to midranks)
    yc = (r.groupBy("seg", "y").agg(F.count("*").alias("cy"))
          .withColumn("band", F.expr("y div 1000000"))
          .localCheckpoint(eager=False))
    bands = (yc.groupBy("seg", "band")
             .agg(F.sum("cy").alias("bn")))
    wb = (Window.partitionBy("seg").orderBy("band")
          .rowsBetween(Window.unboundedPreceding, -1))
    offs = bands.select(
        "seg", "band",
        F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("off"))
    wv = (Window.partitionBy("seg", "band").orderBy("y")
          .rowsBetween(Window.unboundedPreceding, -1))
    yr = (yc.join(F.broadcast(offs), ["seg", "band"])
          .select("seg", "y",
                  (2 * (F.col("off")
                        + F.coalesce(F.sum("cy").over(wv), F.lit(0)))
                   + F.col("cy") + 1).alias("dry")))

    dx = (r.join(F.broadcast(xr), ["seg", "x"])
           .join(yr, ["seg", "y"]))
    dec = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    m = dx.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum(dec("drx")).cast("decimal(38,0)").alias("sx"),
        F.sum(dec("dry")).cast("decimal(38,0)").alias("sy"),
        F.sum((dec("drx") * dec("dry")).cast("decimal(38,0)"))
         .cast("decimal(38,0)").alias("sxy"),
        F.sum((dec("drx") * dec("drx")).cast("decimal(38,0)"))
         .cast("decimal(38,0)").alias("sxx"),
        F.sum((dec("dry") * dec("dry")).cast("decimal(38,0)"))
         .cast("decimal(38,0)").alias("syy"))
    f = m.select(
        "seg", "n",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("d1"),
        F.expr("n * syy - sy * sy").alias("d2"))
    return f.select("seg", "n", F.expr(_COEF).alias("rho"))


@query("corr_kendall", oracle=f"""
WITH {_ROLLUP_SQL},
cell AS (
  SELECT seg, x, y // 100000 AS yb, CAST(count(*) AS BIGINT) AS cnt
  FROM r GROUP BY 1, 2, 3
),
grid AS (
  SELECT xs.seg, xs.x, ys.yb, COALESCE(cell.cnt, 0) AS cnt
  FROM (SELECT DISTINCT seg, x FROM cell) xs
  JOIN (SELECT DISTINCT seg, yb FROM cell) ys USING (seg)
  LEFT JOIN cell USING (seg, x, yb)
),
p AS (
  SELECT *, sum(cnt) OVER (PARTITION BY seg, x ORDER BY yb
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc
  FROM grid
),
q AS (
  SELECT *, COALESCE(sum(pc) OVER (PARTITION BY seg, yb ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS qc
  FROM p
),
bl AS (
  SELECT *, COALESCE(lag(qc) OVER (PARTITION BY seg, x ORDER BY yb), 0)
            AS below_left
  FROM q
),
agg AS (
  SELECT seg,
         CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(cnt * below_left) AS BIGINT) AS c_pairs,
         CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS n3
  FROM bl GROUP BY 1
),
tx AS (
  SELECT seg, CAST(sum(nx * (nx - 1) // 2) AS BIGINT) AS n1
  FROM (SELECT seg, x, sum(cnt) AS nx FROM cell GROUP BY 1, 2)
  GROUP BY 1
),
ty AS (
  SELECT seg, CAST(sum(ny * (ny - 1) // 2) AS BIGINT) AS n2
  FROM (SELECT seg, yb, sum(cnt) AS ny FROM cell GROUP BY 1, 2)
  GROUP BY 1
),
f AS (
  SELECT agg.seg, n, c_pairs,
         n * (n - 1) // 2 - n1 - n2 + n3 - c_pairs AS d_pairs,
         CAST(c_pairs AS HUGEINT)
           - (n * (n - 1) // 2 - n1 - n2 + n3 - c_pairs) AS num,
         CAST(n * (n - 1) // 2 - n1 AS HUGEINT) AS d1,
         CAST(n * (n - 1) // 2 - n2 AS HUGEINT) AS d2
  FROM agg JOIN tx ON agg.seg = tx.seg JOIN ty ON agg.seg = ty.seg
)
SELECT seg, n, c_pairs, CAST(d_pairs AS BIGINT) AS d_pairs,
       {_COEF} AS tau_b
FROM f
""")
def corr_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between a customer's order count and spend band
    ($1000 buckets), per market segment — the concordance coefficient
    whose naive form is O(n²) pairs. No pair is ever materialized:
    counts collapse onto the (order-count × spend-band) grid, bounded
    by the DOMAINS (≈50 × ≈600 cells) however large the data, the
    per-segment grid is densified (distinct-x × distinct-band cross),
    and concordant pairs fall out of a 2D prefix sum — cum over bands
    within x, exclusive cum over x within band, then one lag gives
    each cell its strictly-below-left mass BL, C = Σ cnt·BL. Tie
    terms use the inclusion–exclusion identity C + D = n₀ − n₁ − n₂ +
    n₃, so D needs no second dominance pass. Pair counts stay within
    int64 through ~4e9 rows per segment (n²/2 < 2^63); tau-b is the
    shared-text IEEE chain. The only data-sized ops are the rollup
    and the cell groupBy."""
    r = _rollup(spark, sf_dir)
    cell = (r.withColumn("yb", F.expr("y div 100000"))
            .groupBy("seg", "x", "yb").agg(F.count("*").alias("cnt"))
            .localCheckpoint(eager=False))
    xs = cell.select("seg", "x").distinct()
    ys = cell.select("seg", "yb").distinct()
    grid = (xs.join(ys, "seg")
            .join(F.broadcast(cell), ["seg", "x", "yb"], "left")
            .select("seg", "x", "yb",
                    F.coalesce("cnt", F.lit(0)).alias("cnt")))
    wp = (Window.partitionBy("seg", "x").orderBy("yb")
          .rowsBetween(Window.unboundedPreceding, 0))
    wq = (Window.partitionBy("seg", "yb").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1))
    wl = Window.partitionBy("seg", "x").orderBy("yb")
    bl = (grid.withColumn("pc", F.sum("cnt").over(wp))
              .withColumn("qc", F.coalesce(F.sum("pc").over(wq), F.lit(0)))
              .withColumn("below_left",
                          F.coalesce(F.lag("qc").over(wl), F.lit(0))))
    agg = bl.groupBy("seg").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("below_left")).alias("c_pairs"),
        F.sum(F.expr("cnt * (cnt - 1) div 2")).alias("n3"))
    tx = (cell.groupBy("seg", "x").agg(F.sum("cnt").alias("nx"))
          .groupBy("seg").agg(F.sum(F.expr("nx * (nx - 1) div 2"))
                              .alias("n1")))
    ty = (cell.groupBy("seg", "yb").agg(F.sum("cnt").alias("ny"))
          .groupBy("seg").agg(F.sum(F.expr("ny * (ny - 1) div 2"))
                              .alias("n2")))
    f = (agg.join(F.broadcast(tx), "seg").join(F.broadcast(ty), "seg")
         .select(
             "seg", "n", "c_pairs",
             F.expr("n * (n - 1) div 2 - n1 - n2 + n3 - c_pairs")
              .alias("d_pairs"),
             F.expr("CAST(c_pairs AS DECIMAL(38,0)) "
                    "- (n * (n - 1) div 2 - n1 - n2 + n3 - c_pairs)")
              .alias("num"),
             F.expr("CAST(n * (n - 1) div 2 - n1 AS DECIMAL(38,0))")
              .alias("d1"),
             F.expr("CAST(n * (n - 1) div 2 - n2 AS DECIMAL(38,0))")
              .alias("d2")))
    return f.select("seg", "n", "c_pairs",
                    F.col("d_pairs").cast("long").alias("d_pairs"),
                    F.expr(_COEF).alias("tau_b"))


# n·ln(n) quantized half-away to integer micro-nats (the
# mixture_entropy ln-parity discipline): one ln per cell/marginal, so
# cross-cell sums are exact integers and no accumulation order exists
_NLOGN = ("CAST(floor({0} * ln(CAST({0} AS DOUBLE)) * 1000000 + 0.5) "
          "AS BIGINT)")

# MI and the marginal entropies as shared-text IEEE chains over the
# integer micro-nat sums: MI = (s_xy - s_x - s_y)/n/1e6 + ln n,
# H(col) = ln n - s_col/(n*1e6); everything reported in micro-nats
_MI_E6 = ("CAST(round((CAST(s_xy - s_x - s_y AS DOUBLE) / 1000000.0 / n "
          "+ ln(CAST(n AS DOUBLE))) * 1000000, 0) AS BIGINT)")
_H_E6 = ("CAST(round((ln(CAST(n AS DOUBLE)) "
         "- CAST({0} AS DOUBLE) / 1000000.0 / n) * 1000000, 0) AS BIGINT)")


@query("mutual_info_lang_source", oracle=f"""
WITH cell AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
mx AS (SELECT lang, CAST(sum(c) AS BIGINT) AS c FROM cell GROUP BY 1),
my AS (SELECT source, CAST(sum(c) AS BIGINT) AS c FROM cell GROUP BY 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(sum({_NLOGN.format('c')}) AS BIGINT) AS s_xy
  FROM cell
),
sx AS (SELECT CAST(sum({_NLOGN.format('c')}) AS BIGINT) AS s_x,
              CAST(count(*) AS BIGINT) AS n_lang FROM mx),
sy AS (SELECT CAST(sum({_NLOGN.format('c')}) AS BIGINT) AS s_y,
              CAST(count(*) AS BIGINT) AS n_source FROM my)
SELECT n, n_cells, n_lang, n_source,
       {_MI_E6} AS mi_e6,
       {_H_E6.format('s_x')} AS h_lang_e6,
       {_H_E6.format('s_y')} AS h_source_e6
FROM s, sx, sy
""")
def mutual_info_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between a document's language and its source
    (micro-nats), with both marginal entropies — the dataset-design
    readout for a training-mixture curator: MI ≈ 0 means sources are
    linguistically interchangeable, MI near min(H) means language is
    almost determined by source (so source-level sampling silently
    reweights languages). Uses the identity n·MI = Σc·ln c − Σc_x·ln
    c_x − Σc_y·ln c_y + n·ln n so every log term is an n·ln n shape,
    quantized per cell/marginal to INTEGER micro-nats (one ln each,
    the mixture_entropy parity discipline) — the sums are exact
    integers, order-free in both engines; the final MI/H values are
    one shared-text IEEE chain each. Plan: one corpus scan into a
    (lang × source)-bounded cell aggregate; marginals and folds are
    cell-sized. MI ≥ max(0, H_x + H_y − ln n·…) sanity is
    property-gated in tests."""
    d = table(spark, sf_dir, "documents")
    cell = (d.groupBy("lang", "source").agg(F.count("*").alias("c"))
             .localCheckpoint(eager=False))
    mx = cell.groupBy("lang").agg(F.sum("c").alias("c"))
    my = cell.groupBy("source").agg(F.sum("c").alias("c"))
    s = cell.agg(F.count("*").alias("n_cells"),
                 F.sum("c").alias("n"),
                 F.sum(F.expr(_NLOGN.format("c"))).alias("s_xy"))
    sx = mx.agg(F.sum(F.expr(_NLOGN.format("c"))).alias("s_x"),
                F.count("*").alias("n_lang"))
    sy = my.agg(F.sum(F.expr(_NLOGN.format("c"))).alias("s_y"),
                F.count("*").alias("n_source"))
    return (s.crossJoin(F.broadcast(sx)).crossJoin(F.broadcast(sy))
            .select("n", "n_cells", "n_lang", "n_source",
                    F.expr(_MI_E6).alias("mi_e6"),
                    F.expr(_H_E6.format("s_x")).alias("h_lang_e6"),
                    F.expr(_H_E6.format("s_y")).alias("h_source_e6")))
