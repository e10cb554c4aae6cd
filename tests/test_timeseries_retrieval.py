"""Property gates for the time-series and retrieval operator families
(suite/timeseries.py, suite/retrieval.py) — the invariants the oracle
hash can't express: sketch mergeability, downsample shape preservation,
sampling reproducibility under re-partitioning, and global segment
uniqueness."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.suite.retrieval import (_SEG, dedup_segments_global,
                                            sample_weighted)
from zoom_etl_spark.suite.timeseries import (_LTTB_N, downsample_lttb,
                                             hll_rollup)


def test_hll_union_of_partials_is_register_exact(spark, sf_dir):
    """Unioning hourly HLL sketches must give the SAME estimate as
    sketching the day directly: HLL registers are maxima, and max is
    associative — the property that makes the rollup cascade sound.
    This is exact, not approximate."""
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    direct = (e.groupBy("event_type", day)
              .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
                   .alias("direct")))
    hourly = (e.groupBy("event_type",
                        F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.hll_sketch_agg("user_id").alias("sk")))
    merged = (hourly.groupBy("event_type",
                             F.date_trunc("day", F.col("h")).alias("day"))
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("merged")))
    diff = (direct.join(merged, ["event_type", "day"])
            .filter(F.col("direct") != F.col("merged")).count())
    assert diff == 0


def test_hll_rollup_error_envelope(spark, sf_dir):
    """Every day-level row must carry sketch_ok=True — the unioned HLL
    estimate within the ±5% (~3σ for lgK=12) envelope of the exact
    distinct count that the oracle asserts (the round-5 promotion moved
    the envelope INTO the gated output; a sketch regression flips the
    boolean and fails both this test and the value hash)."""
    rows = hll_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.sketch_ok is True, r
        assert r.exact_users > 0 and r.n_hours > 0, r


def test_lttb_keeps_endpoints_and_bucket_budget(spark, sf_dir):
    """Mean-anchored LTTB must keep each user's first and last point and
    emit at most one point per (user, bucket) — ≤ N points per user."""
    e = table(spark, sf_dir, "events")
    out = downsample_lttb(spark, sf_dir)
    per = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("bucket").alias("nb"),
        F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    ends = e.groupBy("user_id").agg(F.min("ts").alias("tmin"),
                                    F.max("ts").alias("tmax"))
    bad = (per.join(ends, "user_id")
           .filter((F.col("n") > _LTTB_N) | (F.col("n") != F.col("nb"))
                   | (F.col("lo") != F.col("tmin"))
                   | (F.col("hi") != F.col("tmax"))).count())
    assert bad == 0


def test_sample_weighted_layout_invariant(spark, sf_dir):
    """Priority sampling must select the identical id set whatever the
    input partitioning — the reproducibility contract that made us
    reject RNG-based sampleBy."""
    a = {r.doc_id for r in sample_weighted(spark, sf_dir).collect()}
    d = (table(spark, sf_dir, "documents").repartition(7)
         .createOrReplaceTempView("__sw_docs"))
    # re-run the same scoring over a reshuffled layout
    u = F.pmod(F.col("doc_id") * F.lit(2654435761) + F.lit(12345),
               F.lit(1000003)) + 1
    b = {r.doc_id for r in
         (spark.table("__sw_docs")
          .select("doc_id",
                  (F.col("n_chars") * F.lit(1000003.0) / u).alias("p"))
          .orderBy(F.desc("p"), "doc_id").limit(100)).collect()}
    assert a == b and len(a) == 100


def test_segments_globally_unique_and_reassembly(spark, sf_dir):
    """After global segment dedup no segment string may survive twice
    corpus-wide, and each doc's kept text must reassemble to exactly
    n_kept segments."""
    out = dedup_segments_global(spark, sf_dir)
    segs = out.filter(F.col("n_kept") > 0).select(
        "doc_id", "n_kept",
        F.filter(F.split("text_kept", " "), lambda x: x != "")
        .alias("toks"))
    # reassembled token count: n_kept full segments, except possibly one
    # trailing partial per doc
    bad = segs.filter(
        (F.size("toks") > F.col("n_kept") * _SEG)
        | (F.size("toks") <= (F.col("n_kept") - 1) * _SEG)).count()
    assert bad == 0
    # re-split the kept text into segments and check global uniqueness
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_SEG))
    ex = (segs.select("doc_id", "toks", F.explode(starts).alias("st"))
          .select(F.concat_ws(" ", F.slice("toks", F.col("st") + 1,
                                           F.lit(_SEG))).alias("s")))
    # NOTE: only FULL segments are globally unique (a trailing partial
    # can coincide with a prefix of another segment) — filter to full
    full = ex.filter(F.size(F.split("s", " ")) == _SEG)
    dup = full.groupBy("s").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_trend_linefit_matches_numpy(spark, sf_dir):
    """The exact-moment closed form must agree with numpy's polyfit on
    the same quantized series."""
    import numpy as np
    from zoom_etl_spark.suite.timeseries import trend_linefit
    e = table(spark, sf_dir, "events")
    rows = (e.select("event_type",
                     F.expr("CAST((unix_micros(ts) - 1577836800000000)"
                            " div 3600000000 AS BIGINT)").alias("x"),
                     F.floor(F.col("value") * 1000).alias("y"))
            .collect())
    fits = {r.event_type: r for r in trend_linefit(spark, sf_dir).collect()}
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.x, r.y))
    for et, pts in by_type.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float) / 1000.0
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(fits[et].slope - slope) < 1e-4, et
        assert abs(fits[et].intercept - intercept) < 1e-3, et
