"""Operator semantics on reference-native fixtures: preference top-1 with
deterministic ties (W1), sanitize edge cases (F2), NULL-on-bad-parse (F1),
last-wins ordering (A5), running sums, HLL accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zoom_etl_spark.functions.text import parse_timestamp_ntz, sanitize_name
from zoom_etl_spark.operators.windows import last_wins, running_sum, topk_per_group

from .fixtures import bad_timestamps, dirty_topics, preferences, recording_files


def test_preference_top1_per_category(spark):
    """The webhook handler's first-match-by-priority select (handler.py:18-36)
    as a join + window: top-1 per (meeting, category), tie broken by file id
    DESC (the reference's dict-build keeps the LAST duplicate — SURVEY §7.3)."""
    files = recording_files(spark)
    prefs = preferences(spark)
    joined = files.join(F.broadcast(prefs), "recording_type")
    best = topk_per_group(joined, keys=["meeting_uuid", "category"],
                          order=[F.col("priority").asc(), F.col("id").desc()], k=1)
    got = {(r.meeting_uuid, r.category): r.id for r in best.collect()}
    assert got[("m1", "video")] == "r2"   # tie on type → last id wins
    assert got[("m1", "audio")] == "r3"
    assert got[("m1", "chat")] == "r4"
    assert got[("m2", "audio")] == "r5"


def test_sanitize_edge_cases(spark):
    out = dict((r.id, r.clean) for r in dirty_topics(spark)
               .select("id", sanitize_name("topic").alias("clean")).collect())
    assert out[1] == "a_b_c_d_e_f_g_h_i_j"     # every illegal char replaced
    assert len(out[2]) == 255                  # truncated
    assert out[3] == "unknown"                 # empty → default
    assert out[4] == "unknown"                 # NULL → default
    assert out[5] == "Clean Topic"


def test_parse_timestamp_null_on_failure(spark):
    out = dict((r.id, r.parsed) for r in bad_timestamps(spark)
               .select("id", parse_timestamp_ntz("ts_str").alias("parsed")).collect())
    assert out[1] is not None                  # ISO-Z parses
    assert out[2] is not None                  # space-separated parses
    assert out[3] is None                      # garbage → NULL, no throw
    assert out[4] is None
    assert out[5] is None                      # invalid fields → NULL


def test_last_wins_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 1, "a"), ("k", 2, "b"), ("k", 2, "c")], "key string, ver int, val string")
    out = last_wins(df, keys=["key"], version=[F.col("ver"), F.col("val")])
    assert out.collect()[0].val == "c"         # ver tie → val desc


def test_running_sum_order(spark):
    df = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 5.0), ("v", 1, 1.0)], "u string, t int, x double")
    out = {(r.u, r.t): r.rs for r in
           running_sum(df, ["u"], [F.col("t")], F.col("x"), "rs").collect()}
    assert out[("u", 1)] == 10.0 and out[("u", 2)] == 15.0 and out[("v", 1)] == 1.0


def test_stratified_sampling_bounds(spark, sf_dir):
    """sampleBy: per-stratum sampling for balanced training subsets (the
    100 TB data-curation path: downsample dominant classes). Seeded,
    fraction approximately honored per stratum."""
    from zoom_etl_spark.catalog import table
    e = table(spark, sf_dir, "events")
    fracs = {"click": 0.5, "view": 0.1, "purchase": 1.0}
    s = e.sampleBy("event_type", fracs, seed=42)
    got = {r.event_type: r.cnt for r in
           s.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    base = {r.event_type: r.cnt for r in
            e.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    assert set(got) <= set(fracs)                     # unlisted strata dropped
    assert got["purchase"] == base["purchase"]        # fraction 1.0 = all
    assert 0.25 * base["click"] <= got["click"] <= 0.75 * base["click"]
    assert got["view"] <= 0.3 * base["view"]


def test_hll_within_relative_error(spark, sf_dir):
    """approx_count_distinct (the 100 TB cardinality path) vs exact."""
    from zoom_etl_spark.catalog import table
    e = table(spark, sf_dir, "events")
    row = e.agg(F.count_distinct("user_id").alias("exact"),
                F.approx_count_distinct("user_id", 0.02).alias("approx")).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_gapfill_locf_materializes_missing_buckets(spark):
    from zoom_etl_spark.operators.timeseries import gapfill_locf
    import datetime as dt
    rows = [(1, dt.datetime(2024, 1, 1, 0), 10.0),
            (1, dt.datetime(2024, 1, 1, 3), 40.0),   # 01:00, 02:00 missing
            (2, dt.datetime(2024, 1, 1, 5), 7.0)]    # single bucket: no gaps
    b = spark.createDataFrame(rows, "k int, h timestamp, v double")
    out = {(r.k, r.h.hour): (r.v, r.v_locf)
           for r in gapfill_locf(b, "k", "h", "v", "1 hour").collect()}
    assert out == {
        (1, 0): (10.0, 10.0),
        (1, 1): (None, 10.0),   # gap rows exist, filled forward
        (1, 2): (None, 10.0),
        (1, 3): (40.0, 40.0),
        (2, 5): (7.0, 7.0),
    }


def test_gapfill_linear_interpolates_between_observations(spark):
    from zoom_etl_spark.operators.timeseries import gapfill_linear
    import datetime as dt
    rows = [(1, dt.datetime(2024, 1, 1, 0), 10.0),
            (1, dt.datetime(2024, 1, 1, 3), 40.0),   # 01:00, 02:00 missing
            (2, dt.datetime(2024, 1, 1, 4), None),   # leading edge gap
            (2, dt.datetime(2024, 1, 1, 5), 7.0)]
    b = spark.createDataFrame(rows, "k int, h timestamp, v double")
    out = {(r.k, r.h.hour): r.v_interp
           for r in gapfill_linear(b, "k", "h", "v", "1 hour").collect()}
    assert out == {
        (1, 0): 10.0,
        (1, 1): 20.0,   # straight line 10 -> 40 over 3 hours
        (1, 2): 30.0,
        (1, 3): 40.0,
        (2, 4): 7.0,    # edge gap degrades to nearest observation
        (2, 5): 7.0,
    }


@pytest.mark.parametrize("accuracy", [10000, 1000])
def test_approx_quantile_rank_error(spark, sf_dir, accuracy):
    """approx_percentile rank-error gate, measured the honest way: the
    true rank interval of the sketched value (ties included) must lie
    within 2% of the target rank. NOTE the nominal GK bound (1/accuracy)
    does NOT survive partition-merge: merging per-partition summaries
    degrades it — the gate pins the practical contract a 1000-executor
    deployment actually gets, plus quantile monotonicity. accuracy=1000
    is the resolution the registered agg_approx_quantile ships with
    (round 6: sized for the ε=0.02 envelope, measured 0.1% merged)."""
    from zoom_etl_spark.catalog import table as t
    e = t(spark, sf_dir, "events")
    n = e.count()
    row = e.agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], accuracy).alias("a")
    ).collect()[0]
    p50, p95, p99 = row.a
    assert p50 <= p95 <= p99
    for p, a in ((0.5, p50), (0.95, p95), (0.99, p99)):
        lt, le = e.agg(
            F.sum((F.col("value") < a).cast("long")).alias("lt"),
            F.sum((F.col("value") <= a).cast("long")).alias("le")
        ).collect()[0]
        target = p * n
        dist = 0 if lt <= target <= le else min(abs(lt - target),
                                                abs(le - target))
        assert dist <= 0.02 * n, (p, a, lt, le, dist)


def test_mv_apply_delta_retractions(spark):
    """CDC retractions must subtract from the MV state and a fully
    retracted key must leave the view; a mixed insert+delete delta must
    land on exactly the from-scratch recompute."""
    from zoom_etl_spark.operators.mv import agg_state, apply_delta

    base_rows = [(1, 10), (1, 20), (2, 5), (3, 7)]
    base = spark.createDataFrame(base_rows, "k long, v long")
    mv = agg_state(base, ["k"], "v")
    # delta: insert (1,30); update (2,5)->(2,9) as delete+insert; delete (3,7)
    delta = spark.createDataFrame(
        [(1, 30, "+"), (2, 5, "-"), (2, 9, "+"), (3, 7, "-")],
        "k long, v long, op string")
    got = {(r.k): (r.cnt, r.total)
           for r in apply_delta(mv, agg_state(delta, ["k"], "v",
                                              signed=True), ["k"]).collect()}
    assert got == {1: (3, 60), 2: (1, 9)}  # key 3 fully retracted → gone


def test_mv_apply_delta_idempotent_shape(spark):
    """Applying an EMPTY delta must return the MV unchanged (refresh with
    no new data is a no-op), including keys untouched by any delta."""
    from zoom_etl_spark.operators.mv import agg_state, apply_delta

    base = spark.createDataFrame([(1, 10), (2, 5)], "k long, v long")
    mv = agg_state(base, ["k"], "v")
    empty = spark.createDataFrame([], "k long, v long")
    got = {r.k: (r.cnt, r.total)
           for r in apply_delta(mv, agg_state(empty, ["k"], "v"),
                                ["k"]).collect()}
    assert got == {1: (1, 10), 2: (1, 5)}


def test_bitemporal_slice_equals_scd2_at_every_checkpoint(spark, sf_dir):
    """The bitemporal invariant at MULTIPLE transaction checkpoints:
    slicing the (built-once) bitemporal rows at T must reproduce the
    valid-time SCD2 history computed over only the first T assertions —
    for early, quartile, and full-log checkpoints."""
    from pyspark.sql import Window

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.operators.bitemporal import (as_of,
                                                     bitemporal_history)

    e = table(spark, sf_dir, "events").limit(2000)
    assertions = e.select(
        "user_id", F.col("ts").alias("valid"),
        F.floor(F.col("value") * 1000).cast("long").alias("value"),
        F.col("event_id").alias("tx"))
    bt = bitemporal_history(assertions).cache()
    max_tx = assertions.agg(F.max("tx")).first()[0]
    for frac in (0.1, 0.25, 0.75, 1.0):
        t = int(max_tx * frac)
        got = {(r.user_id, r.value, r.valid_from, r.valid_to)
               for r in as_of(bt, t).collect()}
        first = assertions.filter(F.col("tx") <= t)
        w_dedup = Window.partitionBy("user_id", "valid").orderBy(
            F.col("tx").desc())
        last = (first.withColumn("rn", F.row_number().over(w_dedup))
                     .filter("rn = 1"))
        w_lead = Window.partitionBy("user_id").orderBy("valid")
        want = {(r.user_id, r.value, r.valid, r.valid_to)
                for r in last.select(
                    "user_id", "value", "valid",
                    F.lead("valid").over(w_lead).alias("valid_to"))
                .collect()}
        assert got == want, f"checkpoint {frac}"
    bt.unpersist()


def test_attribution_credits_sum_to_purchase_cents(spark, sf_dir):
    """The multi-touch invariant finance reconciliation depends on:
    total credited cents across clicks == total cents of every purchase
    that HAS at least one preceding-24h click — exactly, not to within
    float tolerance."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    credits = all_queries()["attribution_multi_touch"].fn(spark, sf_dir)
    total_credit = credits.agg(
        F.sum("credit_cents").alias("s")).collect()[0].s

    e = table(spark, sf_dir, "events")
    p = (e.filter(F.col("event_type") == "purchase")
          .select("user_id", F.col("ts").alias("pts"),
                  F.col("event_id").alias("pid"),
                  F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
                   .alias("cents")))
    c = (e.filter(F.col("event_type") == "click")
          .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts")))
    touched = (p.join(c, (F.col("user_id") == F.col("cu"))
                      & (F.col("cts") < F.col("pts"))
                      & (F.col("cts") >= F.col("pts")
                         - F.expr("INTERVAL 24 HOURS")), "left_semi"))
    want = touched.agg(F.sum("cents").alias("s")).collect()[0].s
    assert total_credit == want and want > 0


def test_er_blocking_recall_guarantee(spark, sf_dir):
    """The compound-blocking recall proof, verified end to end: under
    the declared corruption model (one character at a key-derived
    position, 20% segments nulled, <=3-cent jitter) EVERY true
    (clean, dirty-twin) pair must survive blocking and classify
    'match' — a missed identity link would mean a blocking pass pair
    (name region x balance banding) failed its coverage guarantee."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    out = all_queries()["er_blocked_linkage"].fn(spark, sf_dir)
    true_links = {(r.a_key, r.b_key): r.cls
                  for r in out.collect() if r.a_key == r.b_key}
    n_cust = table(spark, sf_dir, "customer").count()
    assert len(true_links) == n_cust, (
        f"blocking lost {n_cust - len(true_links)} true pairs")
    assert set(true_links.values()) == {"match"}


def test_welch_formula_against_pure_python(spark, sf_dir):
    """The engine's Welch t/df must equal a pure-Python reference
    computed from the same exact integer moments — validates the
    FORMULA (not just Spark/DuckDB agreement, which could share a
    transcription error)."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {r.event_type: r for r in
           all_queries()["ab_welch_ttest"].fn(spark, sf_dir).collect()}
    e = table(spark, sf_dir, "events")
    rows = e.select("event_type", "user_id", "value").collect()
    groups = {}
    for r in rows:
        cents = math.floor(r.value * 100 + 0.5)
        groups.setdefault((r.event_type, r.user_id % 2), []).append(cents)
    for et, g in got.items():
        a, b = groups[(et, 0)], groups[(et, 1)]
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        sea, seb = va / len(a), vb / len(b)
        t = (ma - mb) / math.sqrt(sea + seb)
        df = (sea + seb) ** 2 / (sea ** 2 / (len(a) - 1)
                                 + seb ** 2 / (len(b) - 1))
        assert g.na == len(a) and g.nb == len(b)
        assert abs(g.t_stat - t) < 5e-4, (et, g.t_stat, t)
        assert abs(g.df - df) < 5e-2, (et, g.df, df)


def test_gini_formula_against_pure_python(spark, sf_dir):
    """revenue_gini's two-level banded rank + integer formula must
    equal a pure-Python Gini computed from a plain sort of the same
    integer cents — validates both the formula transcription AND that
    band-offset + local row_number reproduces the global order
    statistic (the scale-critical claim)."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = all_queries()["revenue_gini"].fn(spark, sf_dir).collect()[0]
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    per = {}
    for r in o.collect():
        per[r.o_custkey] = (per.get(r.o_custkey, 0)
                            + math.floor(r.o_totalprice * 100 + 0.5))
    xs = [c for _, c in sorted(per.items(), key=lambda kv: (kv[1], kv[0]))]
    n, sx = len(xs), sum(xs)
    srx = sum((i + 1) * x for i, x in enumerate(xs))
    num = 2 * srx - (n + 1) * sx
    gini_ppm = (2 * 1000000 * num + n * sx) // (2 * n * sx)
    assert got.n == n and got.total_cents == sx
    assert got.gini_ppm == gini_ppm
    assert 0 <= got.gini_ppm < 1000000


def test_benford_domain_complete_and_shares_sum(spark, sf_dir):
    """dq_benford must emit all nine digit rows (absent digits as
    cnt = 0) and its half-away ppm shares must sum to 1e6 within the
    rounding slack (<= 4 ppm for 9 half-away roundings); deviations
    must equal |obs - exp| recomputed in Python."""
    from zoom_etl_spark.registry import all_queries

    rows = {r.digit: r for r in
            all_queries()["dq_benford"].fn(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, 10))
    tot = sum(r.cnt for r in rows.values())
    for r in rows.values():
        assert r.obs_ppm == (2000000 * r.cnt + tot) // (2 * tot)
        assert r.dev_ppm == abs(r.obs_ppm - r.exp_ppm)
    assert abs(sum(r.obs_ppm for r in rows.values()) - 1000000) <= 4


def test_mann_whitney_against_pure_python(spark, sf_dir):
    """ab_mann_whitney's doubled-U, tie correction, and z must equal a
    pure-Python rank-based reference (average ranks over the pooled
    sample) — validates the counting identity u2 = 2*(rank_sum_A -
    n1(n1+1)/2) independently of the window construction."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {r.event_type: r for r in
           all_queries()["ab_mann_whitney"].fn(spark, sf_dir).collect()}
    e = table(spark, sf_dir, "events")
    pools = {}
    for r in e.select("event_type", "user_id", "value").collect():
        cents = math.floor(r.value * 100 + 0.5)
        pools.setdefault(r.event_type, []).append((r.user_id % 2, cents))
    for et, pool in pools.items():
        pool.sort(key=lambda t: t[1])
        # average ranks doubled to stay integer
        rank2 = {}
        i = 0
        while i < len(pool):
            j = i
            while j < len(pool) and pool[j][1] == pool[i][1]:
                j += 1
            r2 = (i + 1) + j  # 2 * average rank of the tie run
            for k in range(i, j):
                rank2[k] = r2
            i = j
        n1 = sum(1 for g, _ in pool if g == 0)
        n2 = len(pool) - n1
        ranksum2_a = sum(rank2[k] for k, (g, _) in enumerate(pool)
                         if g == 0)
        u2 = ranksum2_a - n1 * (n1 + 1)
        g = got[et]
        assert (g.n1, g.n2, g.u2) == (n1, n2, u2), (et, g, n1, n2, u2)
        n = n1 + n2
        var = (n1 * n2 / 12.0) * ((n + 1) - g.tie_cubes / (n * (n - 1)))
        z = (u2 - n1 * n2) / (2 * math.sqrt(var))
        assert abs(g.z - z) < 5e-6, (et, g.z, z)


def test_cusum_against_pure_python(spark, sf_dir):
    """changepoint_cusum's fold must equal a pure-Python CUSUM over
    the same integer daily series, and a planted sustained shift must
    alarm: appending the fold's own mean + 2k for enough days drives
    S+ over h (sanity that the alarm can fire at all)."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    rows = sorted(all_queries()["changepoint_cusum"].fn(spark, sf_dir)
                  .collect(), key=lambda r: r.day)
    o = table(spark, sf_dir, "orders")
    per = {}
    for r in o.select("o_orderdate", "o_totalprice").collect():
        d = r.o_orderdate.date()
        per[d] = per.get(d, 0) + math.floor(r.o_totalprice * 100 + 0.5)
    days = sorted(per)
    n, tot = len(days), sum(per.values())
    mu = (2 * tot + n) // (2 * n)
    k, h = mu // 20, mu // 4
    hi = lo = 0
    for r, d in zip(rows, days):
        hi = max(0, hi + per[d] - mu - k)
        lo = max(0, lo + mu - per[d] - k)
        assert (r.day, r.daily_cents) == (d, per[d])
        assert (r.cusum_hi, r.cusum_lo) == (hi, lo), d
        assert r.alarm_hi == (hi > h) and r.alarm_lo == (lo > h)
    # planted drift: mean + 2k per day must alarm within h/k days
    s, steps = 0, 0
    while s <= h:
        s = s + (mu + 2 * k) - mu - k
        steps += 1
    assert steps <= (h // k) + 1


def test_acf_against_numpy(spark, sf_dir):
    """acf_daily_revenue must match the standard estimator r_k =
    sum((x_t-mean)(x_{t+k}-mean)) / sum((x_t-mean)^2) computed in
    float by numpy — validates the n^2-multiplied integer restatement
    against the textbook formula (to ppm-grid tolerance)."""
    import math

    import numpy as np

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {r.lag: r for r in
           all_queries()["acf_daily_revenue"].fn(spark, sf_dir).collect()}
    o = table(spark, sf_dir, "orders")
    per = {}
    for r in o.select("o_orderdate", "o_totalprice").collect():
        d = r.o_orderdate.date()
        per[d] = per.get(d, 0) + math.floor(r.o_totalprice * 100 + 0.5)
    x = np.array([per[d] for d in sorted(per)], dtype=float)
    dev = x - x.mean()
    den = (dev * dev).sum()
    for k in range(1, 15):
        ref = (dev[:-k] * dev[k:]).sum() / den
        g = got[k]
        assert g.n_pairs == len(x) - k
        assert abs(g.acf_ppm / 1e6 - ref) < 2e-6, (k, g.acf_ppm, ref)
        assert -1000000 <= g.acf_ppm <= 1000000


def test_quantile_normalize_properties(spark, sf_dir):
    """quality_quantile_normalize invariants: (1) normalization is
    monotone within a source (higher raw q4 never maps below a lower
    one); (2) every norm_q4 is an actually-occurring global score;
    (3) the within-source top doc maps to the top of the global scale
    and the bottom to the bottom decile's values; (4) every doc
    appears exactly once."""
    from zoom_etl_spark.registry import all_queries

    rows = all_queries()["quality_quantile_normalize"].fn(
        spark, sf_dir).collect()
    n_docs = len({r.doc_id for r in rows})
    assert len(rows) == n_docs
    global_scores = sorted({r.q4 for r in rows})
    by_src = {}
    for r in rows:
        assert 0 <= r.pr_m <= 1000
        assert r.norm_q4 in set(global_scores)
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.q4, r.doc_id))
        for a, b in zip(rs, rs[1:]):
            assert a.pr_m <= b.pr_m and a.norm_q4 <= b.norm_q4, src
        assert rs[-1].pr_m == 1000 and rs[-1].norm_q4 == global_scores[-1]
        assert rs[0].pr_m == 0 and rs[0].norm_q4 == global_scores[0]


def test_seasonal_dow_against_pure_python(spark, sf_dir):
    """anomaly_seasonal_dow must equal a pure-Python replay: weekday
    cohorts, lower nearest-rank median and MAD, 3-MAD integer flag."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    rows = {r.day: r for r in
            all_queries()["anomaly_seasonal_dow"].fn(spark, sf_dir)
            .collect()}
    o = table(spark, sf_dir, "orders")
    per = {}
    for r in o.select("o_orderdate", "o_totalprice").collect():
        d = r.o_orderdate.date()
        per[d] = per.get(d, 0) + math.floor(r.o_totalprice * 100 + 0.5)
    cohorts = {}
    for d, c in per.items():
        cohorts.setdefault(d.weekday(), []).append((c, d))
    for dw, vals in cohorts.items():
        vals.sort()
        nw = len(vals)
        med = vals[(nw + 1) // 2 - 1][0]
        devs = sorted((abs(c - med), d) for c, d in vals)
        mad = devs[(nw + 1) // 2 - 1][0]
        for c, d in vals:
            g = rows[d]
            assert (g.dw, g.daily_cents) == (dw, c)
            assert (g.med_cents, g.mad_cents) == (med, mad), (d, g)
            assert g.dev_cents == abs(c - med)
            assert g.is_anomaly == (abs(c - med) > 3 * mad)


def test_mixture_entropy_against_pure_python(spark, sf_dir):
    """mixture_entropy must match float Shannon entropy over the same
    per-source token masses (to micro-nat quantization tolerance) and
    respect 0 <= H <= ln(k), 1 <= exp(H) <= k."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = all_queries()["mixture_entropy"].fn(spark, sf_dir).collect()[0]
    d = table(spark, sf_dir, "documents")
    masses = {}
    for r in d.select("source", "text").collect():
        n = len([t for t in r.text.split(" ") if t])
        masses[r.source] = masses.get(r.source, 0) + n
    masses = {s: n for s, n in masses.items() if n > 0}
    N = sum(masses.values())
    H = -sum((n / N) * math.log(n / N) for n in masses.values())
    k = len(masses)
    assert got.n_sources == k and got.total_tokens == N
    assert abs(got.entropy_e6 / 1e6 - H) < 1e-4
    assert 0 <= got.entropy_e6 <= math.log(k) * 1e6 + 1
    assert 1000 <= got.effective_sources_e3 <= k * 1000 + 1
    assert abs(got.effective_sources_e3 / 1000 - math.exp(H)) < 1e-2


def test_rfm_segment_rules_and_quintiles(spark, sf_dir):
    """rfm_segments: quintile sizes differ by at most 1 per dimension,
    scores are 1..5, and the segment label re-derives from the scores
    by the documented first-match-wins rules for every customer."""
    from zoom_etl_spark.registry import all_queries

    rows = all_queries()["rfm_segments"].fn(spark, sf_dir).collect()
    n = len(rows)
    for dim in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            s = getattr(r, dim)
            assert 1 <= s <= 5
            sizes[s] = sizes.get(s, 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (dim, sizes)
        assert sum(sizes.values()) == n
    for r in rows:
        if r.r_score >= 4 and r.f_score >= 4 and r.m_score >= 4:
            want = "champion"
        elif r.f_score >= 4:
            want = "loyal"
        elif r.m_score >= 4:
            want = "big_spender"
        elif r.r_score <= 2 and r.f_score <= 2:
            want = "hibernating"
        elif r.r_score <= 2:
            want = "at_risk"
        else:
            want = "regular"
        assert r.segment == want, (r.k, r.segment, want)


def test_naive7_backtest_against_pure_python(spark, sf_dir):
    """forecast_backtest_naive7 must equal a pure-Python replay of the
    join + integer-ppm error chain."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = all_queries()["forecast_backtest_naive7"].fn(
        spark, sf_dir).collect()[0]
    o = table(spark, sf_dir, "orders")
    per = {}
    for r in o.select("o_orderdate", "o_totalprice").collect():
        d = r.o_orderdate.date()
        per[d] = per.get(d, 0) + math.floor(r.o_totalprice * 100 + 0.5)
    import datetime
    aes, apes, sapes = [], [], []
    for d, a in per.items():
        f = per.get(d - datetime.timedelta(days=7))
        if f is None:
            continue
        ae = abs(a - f)
        aes.append(ae)
        apes.append((2000000 * ae + a) // (2 * a))
        sapes.append((4000000 * ae + (a + f)) // (2 * (a + f)))
    n = len(aes)
    assert got.n_days == n
    assert got.mae_cents == (2 * sum(aes) + n) // (2 * n)
    assert got.mape_ppm == (2 * sum(apes) + n) // (2 * n)
    assert got.smape_ppm == (2 * sum(sapes) + n) // (2 * n)


def test_ks_against_pure_python(spark, sf_dir):
    """ab_ks_test's cross-multiplied D numerator must equal a pure-
    Python two-sample ECDF sweep, and d_e6 must be the half-away ppm
    of D = d_num/(n1*n2)."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {r.event_type: r for r in
           all_queries()["ab_ks_test"].fn(spark, sf_dir).collect()}
    e = table(spark, sf_dir, "events")
    pools = {}
    for r in e.select("event_type", "user_id", "value").collect():
        cents = math.floor(r.value * 100 + 0.5)
        pools.setdefault(r.event_type, []).append((r.user_id % 2, cents))
    for et, pool in pools.items():
        a = sorted(c for g, c in pool if g == 0)
        b = sorted(c for g, c in pool if g == 1)
        n1, n2 = len(a), len(b)
        d_num = 0
        for v in sorted(set(a) | set(b)):
            ca = sum(1 for x in a if x <= v)
            cb = sum(1 for x in b if x <= v)
            d_num = max(d_num, abs(ca * n2 - cb * n1))
        g = got[et]
        assert (g.n1, g.n2, g.d_num) == (n1, n2, d_num), et
        assert g.d_e6 == (2000000 * d_num + n1 * n2) // (2 * n1 * n2)
        lam2 = (d_num / (n1 * n2)) ** 2 * (n1 * n2 / (n1 + n2))
        assert abs(g.p_asym - 2 * math.exp(-2 * lam2)) < 5e-6


def test_cuped_against_pure_python(spark, sf_dir):
    """ab_cuped_adjust must equal a pure-Python replay: midpoint split
    on the micros grid, per-user integer pre/post sums, theta =
    cov/var from raw moments, adjusted delta, and var_reduction =
    corr^2; var_reduction must also bound the adjusted-estimator
    variance claim 0 <= r2 < 1."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = all_queries()["ab_cuped_adjust"].fn(spark, sf_dir).collect()[0]
    e = table(spark, sf_dir, "events")
    rows = e.select("user_id", "ts", "value").collect()
    us = [int(r.ts.timestamp() * 1_000_000) for r in rows]
    mid = min(us) + (max(us) - min(us)) // 2
    per = {}
    for r, t in zip(rows, us):
        cents = math.floor(r.value * 100 + 0.5)
        x, y = per.setdefault(r.user_id, [0, 0])
        if t < mid:
            per[r.user_id][0] = x + cents
        else:
            per[r.user_id][1] = y + cents
    n = len(per)
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    g0 = {u: v for u, v in per.items() if u % 2 == 0}
    g1 = {u: v for u, v in per.items() if u % 2 == 1}
    d = (sum(v[1] for v in g1.values()) / len(g1)
         - sum(v[1] for v in g0.values()) / len(g0))
    dx = (sum(v[0] for v in g1.values()) / len(g1)
          - sum(v[0] for v in g0.values()) / len(g0))
    r2 = ((n * sxy - sx * sy) ** 2
          / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
    assert (got.n_users, got.n0, got.n1) == (n, len(g0), len(g1))
    assert abs(got.theta - theta) < 5e-6
    assert abs(got.delta_cents - d) < 5e-4
    assert abs(got.delta_adj_cents - (d - theta * dx)) < 5e-4
    assert abs(got.var_reduction - r2) < 5e-6
    assert 0 <= got.var_reduction < 1


def test_k_anonymity_against_pure_python(spark, sf_dir):
    """dq_k_anonymity classes, sizes, l-diversity and flags must equal
    a pure-Python replay (dominant priority with max-count then
    lexicographic tie-break, +shift nonneg band division)."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {(r.nationkey, r.segment, r.bal_band): r for r in
           all_queries()["dq_k_anonymity"].fn(spark, sf_dir).collect()}
    o = table(spark, sf_dir, "orders")
    cnt = {}
    for r in o.select("o_custkey", "o_orderpriority").collect():
        cnt[(r.o_custkey, r.o_orderpriority)] = \
            cnt.get((r.o_custkey, r.o_orderpriority), 0) + 1
    dom = {}
    for (k, pri), n in cnt.items():
        best = dom.get(k)
        if best is None or (-n, pri) < (-best[0], best[1]):
            dom[k] = (n, pri)
    classes = {}
    c = table(spark, sf_dir, "customer")
    for r in c.collect():
        band = (math.floor(r.c_acctbal * 100 + 0.5) + 100000) // 100000
        key = (r.c_nationkey, r.c_mktsegment, band)
        sens = dom.get(r.c_custkey, (0, "NONE"))[1]
        classes.setdefault(key, []).append(sens)
    assert set(classes) == set(got)
    for key, sens in classes.items():
        g = got[key]
        assert g.class_size == len(sens)
        assert g.l_diversity == len(set(sens))
        assert g.k_violation == (len(sens) < 5)
        assert g.l_violation == (len(set(sens)) < 2)


def test_generalize_ladder_picks_finest_feasible(spark, sf_dir):
    """privacy_generalize_ladder must release at the FINEST rung whose
    min class size reaches k=5 (or the coarsest if none), and the
    released class counts must equal a pure-Python re-banding."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries
    from zoom_etl_spark.suite.privacy import _K, _LADDER, _SHIFT

    rows = all_queries()["privacy_generalize_ladder"].fn(
        spark, sf_dir).collect()
    widths = {r.width for r in rows}
    assert len(widths) == 1
    width = widths.pop()
    c = table(spark, sf_dir, "customer").collect()
    per_w = {}
    for w in _LADDER:
        cl = {}
        for r in c:
            sc = math.floor(r.c_acctbal * 100 + 0.5) + _SHIFT
            key = (r.c_nationkey, r.c_mktsegment, sc // (w * 100))
            cl[key] = cl.get(key, 0) + 1
        per_w[w] = cl
    feasible = [w for w in _LADDER if min(per_w[w].values()) >= _K]
    want = min(feasible) if feasible else max(_LADDER)
    assert width == want
    got = {(r.nationkey, r.segment, r.band): r.k for r in rows}
    assert got == per_w[width]
    if feasible:
        assert min(got.values()) >= _K


def test_dp_counts_mechanism_replay_and_utility(spark, sf_dir):
    """privacy_dp_counts: the seeded discrete-Laplace noise must replay
    exactly in pure Python (hash -> uniform -> floor(-ln(1-u)) pair),
    n_released must clamp at zero, and the mechanism must have usable
    utility (mean |noise| across cells within the e^-1 geometric's
    expected band — catches a broken uniform that degenerates to huge
    or zero noise everywhere)."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    rows = all_queries()["privacy_dp_counts"].fn(spark, sf_dir).collect()
    c = table(spark, sf_dir, "customer")
    true = {}
    for r in c.select("c_nationkey", "c_mktsegment").collect():
        key = (r.c_nationkey, r.c_mktsegment)
        true[key] = true.get(key, 0) + 1
    assert len(rows) == len(true)
    etas = []
    for r in rows:
        n = true[(r.nationkey, r.segment)]
        ck = r.nationkey * 131 + ord(r.segment[0]) * 7 + len(r.segment)
        def geo(mult):
            u = ((ck * mult) % 4294967296 + 0.5) / 4294967296.0
            return math.floor(-math.log(1.0 - u))
        eta = geo(2654435761) - geo(2246822519)
        assert r.n_noisy == n + eta, (r, n, eta)
        assert r.n_released == max(n + eta, 0)
        etas.append(eta)
    # E|G1-G2| for alpha=e^-1 is ~0.77; a broken hash would blow this up
    mean_abs = sum(abs(e) for e in etas) / len(etas)
    assert mean_abs <= 4.0, etas


def test_zipf_fit_against_numpy(spark, sf_dir):
    """term_zipf_fit must match a numpy least-squares on the same
    (ln rank, ln freq) points, slope must be negative (monotone
    rank-frequency), and r2 in [0, 1]."""
    import numpy as np

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = all_queries()["term_zipf_fit"].fn(spark, sf_dir).collect()[0]
    d = table(spark, sf_dir, "documents")
    tf = {}
    for r in d.select("text").collect():
        for t in r.text.split(" "):
            if t:
                tf[t] = tf.get(t, 0) + 1
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(ranked) + 1))
    y = np.log(np.array([f for _, f in ranked], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert got.n_terms == len(ranked)
    assert abs(got.slope - slope) < 1e-4
    assert abs(got.intercept - intercept) < 1e-3
    assert abs(got.r2 - r * r) < 1e-4
    assert got.slope < 0
    assert 0 <= got.r2 <= 1


def test_logrank_against_pure_python(spark, sf_dir):
    """survival_logrank must equal a pure-Python replay of the study
    construction and the micro-quantized hypergeometric term sums;
    the z must match the float log-rank statistic to quantization
    tolerance; O1+O2 must equal total events."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = all_queries()["survival_logrank"].fn(spark, sf_dir).collect()[0]
    e = table(spark, sf_dir, "events")
    rows = e.select("user_id", "ts", "event_type").collect()
    days = [r.ts.date() for r in rows]
    d0, d1 = min(days), max(days)
    import datetime
    hz = d0 + datetime.timedelta(days=(d1 - d0).days // 2)
    fc, fp = {}, {}
    for r in rows:
        if r.event_type == "click":
            if r.user_id not in fc or r.ts < fc[r.user_id]:
                fc[r.user_id] = r.ts
    entered = {u: t for u, t in fc.items() if t.date() <= hz}
    for r in rows:
        if (r.event_type == "purchase" and r.user_id in entered
                and r.ts >= entered[r.user_id] and r.ts.date() <= hz):
            if r.user_id not in fp or r.ts < fp[r.user_id]:
                fp[r.user_id] = r.ts
    subj = []
    for u, t0 in entered.items():
        if u in fp:
            subj.append((u % 2, (fp[u].date() - t0.date()).days, True))
        else:
            subj.append((u % 2, (hz - t0.date()).days, False))
    assert got.n_arm0 == sum(1 for a, _, _ in subj if a == 0)
    assert got.n_arm1 == sum(1 for a, _, _ in subj if a == 1)
    grid = {}
    for a, dur, ev in subj:
        g = grid.setdefault(dur, [0, 0, 0, 0])  # d1, d, x1, x
        if ev:
            g[1] += 1
            if a == 1:
                g[0] += 1
        g[3] += 1
        if a == 1:
            g[2] += 1
    se = sv = o1 = o2 = 0
    n1 = n = 0
    for t in sorted(grid, reverse=True):
        d1_, d_, x1_, x_ = grid[t]
        n1 += x1_
        n += x_
        if d_ >= 1:
            o1 += d1_
            o2 += d_ - d1_
            se += (2 * 1000000 * d_ * n1 + n) // (2 * n)
            if n > 1:
                num = 2 * 1000000 * d_ * n1 * (n - n1) * (n - d_)
                den = 2 * n * n * (n - 1)
                sv += (num + n * n * (n - 1)) // den
    assert (got.o1, got.o2, got.e1_e6, got.v_e6) == (o1, o2, se, sv)
    import math
    z = (1000000 * o1 - se) / math.sqrt(1000000 * sv)
    assert abs(got.z - z) < 5e-6


def test_bh_stepup_semantics(spark, sf_dir):
    """ab_fdr_bh: rejection set must be exactly ranks 1..k* where k*
    is the largest rank with p <= rank*q/m (recomputed in Python),
    and the step-up property holds (a rejected rank may individually
    exceed nothing — monotone set, no gaps)."""
    from zoom_etl_spark.registry import all_queries

    rows = sorted(all_queries()["ab_fdr_bh"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.rnk)
    m, q = 5, 0.10
    assert [r.rnk for r in rows] == list(range(1, m + 1))
    ps = [r.p_asym for r in rows]
    assert ps == sorted(ps)
    kstar = 0
    for i, p in enumerate(ps, 1):
        if p <= round(i * q / m, 6):
            kstar = i
    for r in rows:
        assert r.bh_thresh == round(r.rnk * q / m, 6)
        assert r.rejected == (r.rnk <= kstar)


def test_survivorship_rules_and_idempotence(spark, sf_dir):
    """dedup_survivorship invariants: every document lands in exactly
    one cluster; the text rule picks (max n_chars, min doc_id); lang
    is the deterministic majority; singletons survive as themselves;
    and re-running yields the identical golden set (idempotence)."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    fn = all_queries()["dedup_survivorship"].fn
    rows = fn(spark, sf_dir).collect()
    docs = {r.doc_id: r for r in
            table(spark, sf_dir, "documents").collect()}
    assert sum(r.n_members for r in rows) == len(docs)
    assert len({r.cluster for r in rows}) == len(rows)
    for r in rows:
        d = docs[r.text_doc_id]
        assert d.n_chars == r.n_chars_max
        if r.n_members == 1:
            assert r.cluster == r.text_doc_id
            assert r.lang_majority == docs[r.cluster].lang
    again = {(r.cluster, r.n_members, r.n_sources, r.lang_majority,
              r.text_doc_id, r.n_chars_max) for r in fn(spark, sf_dir)
             .collect()}
    assert again == {(r.cluster, r.n_members, r.n_sources,
                      r.lang_majority, r.text_doc_id, r.n_chars_max)
                     for r in rows}


def test_seasonal_decompose_identity_and_python(spark, sf_dir):
    """seasonal_decompose_ma: trend + seasonal + residual must equal
    the observed value on every emitted day (additive identity), and
    trend/seasonal must equal a pure-Python replay of the centered
    7-point MA + shifted per-weekday mean."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    rows = {r.day: r for r in
            all_queries()["seasonal_decompose_ma"].fn(spark, sf_dir)
            .collect()}
    o = table(spark, sf_dir, "orders")
    per = {}
    for r in o.select("o_orderdate", "o_totalprice").collect():
        d = r.o_orderdate.date()
        per[d] = per.get(d, 0) + math.floor(r.o_totalprice * 100 + 0.5)
    days = sorted(per)
    cs = [per[d] for d in days]
    C = 1000000000000
    trend, det_by_dw = {}, {}
    for i in range(3, len(days) - 3):
        ws = sum(cs[i - 3:i + 4])
        trend[days[i]] = (2 * ws + 7) // 14
        det = cs[i] - trend[days[i]]
        det_by_dw.setdefault(days[i].weekday(), []).append(det)
    seas = {dw: (2 * (sum(v) + len(v) * C) + len(v)) // (2 * len(v)) - C
            for dw, v in det_by_dw.items()}
    assert set(rows) == set(trend)
    for d, r in rows.items():
        assert r.trend_cents == trend[d]
        assert r.seasonal_cents == seas[d.weekday()]
        assert (r.trend_cents + r.seasonal_cents + r.residual_cents
                == r.daily_cents)


def test_dbscan_grid_against_pure_python(spark, sf_dir):
    """geo_dbscan_grid must equal a pure-Python grid-DBSCAN (cells,
    3x3 density, CC over adjacent cores, min-label border, noise),
    and at sf0.01 the parameterization must be non-degenerate (core,
    border AND noise all present)."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    rows = {(r.cy, r.cx): r for r in
            all_queries()["geo_dbscan_grid"].fn(spark, sf_dir).collect()}
    c = table(spark, sf_dir, "customer").select("c_custkey").collect()
    cells = {}
    for r in c:
        k = r.c_custkey
        y = (k * 7919) % 18000 - 9000
        x = ((k % 36000) * (k % 36000) * 31 + k * 104729) % 36000 - 18000
        cell = (y // 500, x // 1000)
        cells[cell] = cells.get(cell, 0) + 1
    def nbsum(cy, cx):
        return sum(cells.get((cy + dy, cx + dx), 0)
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    core = {c for c in cells if nbsum(*c) >= 12}
    # CC over 8-adjacent cores
    label = {c: (c[0] + 18) * 100 + c[1] + 18 for c in core}
    changed = True
    while changed:
        changed = False
        for (cy, cx) in core:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    nb = (cy + dy, cx + dx)
                    if nb in core and label[nb] < label[(cy, cx)]:
                        label[(cy, cx)] = label[nb]
                        changed = True
    roles = {}
    for cell, n in cells.items():
        if cell in core:
            roles[cell] = ("core", label[cell])
        else:
            adj = [label[(cell[0] + dy, cell[1] + dx)]
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                   if (cell[0] + dy, cell[1] + dx) in core]
            roles[cell] = ("border", min(adj)) if adj else ("noise", None)
    assert set(rows) == set(cells)
    for cell, (role, cl) in roles.items():
        g = rows[cell]
        assert (g.role, g.cluster, g.n) == (role, cl, cells[cell]), cell
    # non-degeneracy is proven on a PLANTED corpus (sf0.001 is too
    # sparse to form cores): 40 custkeys whose synthetic positions
    # pile into one cell neighborhood + a few isolated far keys
    import tempfile
    dense, sparse, k = [], [], 1
    while (len(dense) < 40 or len(sparse) < 5) and k < 2_000_000:
        y = (k * 7919) % 18000 - 9000
        x = ((k % 36000) * (k % 36000) * 31 + k * 104729) % 36000 - 18000
        cell = (y // 500, x // 1000)
        if cell == (0, 0) and len(dense) < 40:
            dense.append(k)
        elif cell[0] > 10 and abs(cell[1]) > 10 and len(sparse) < 5:
            sparse.append(k)
        k += 1
    assert len(dense) == 40 and len(sparse) == 5
    src = tempfile.mkdtemp(prefix="zes_dbscan_")
    (spark.createDataFrame(
        [(int(kk), "x", 0, 0.0, "SEG") for kk in dense + sparse],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string")
     .coalesce(1).write.parquet(f"{src}/customer.parquet"))
    planted = all_queries()["geo_dbscan_grid"].fn(spark, src).collect()
    kinds = {r.role for r in planted}
    assert "core" in kinds and "noise" in kinds, kinds
    core_cells = [r for r in planted if r.role == "core"]
    assert any(r.cy == 0 and r.cx == 0 for r in core_cells)


def test_rake_against_pure_python(spark, sf_dir):
    """text_keyphrase_rake must equal a pure-Python RAKE replay
    (stopword-run phrases, degree/frequency micro-scores, phrase
    sums, the unique top-50 order)."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = [(r.phrase, r.n_words, r.phrase_count, r.score_e6) for r in
           all_queries()["text_keyphrase_rake"].fn(spark, sf_dir)
           .collect()]
    stops = {"the", "a", "of", "and", "in", "to"}
    phrases = []
    d = table(spark, sf_dir, "documents")
    for r in d.select("text").collect():
        run = []
        for t in [t for t in r.text.split(" ") if t]:
            if t in stops:
                if run:
                    phrases.append(run)
                run = []
            else:
                run.append(t)
        if run:
            phrases.append(run)
    freq, deg = {}, {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    s6 = {w: (2 * 1000000 * deg[w] + freq[w]) // (2 * freq[w])
          for w in freq}
    agg = {}
    for p in phrases:
        key = " ".join(p)
        cnt, _ = agg.get(key, (0, 0))
        agg[key] = (cnt + 1, sum(s6[w] for w in p))
    ranked = sorted(((ph, len(ph.split(" ")), cnt, sc)
                     for ph, (cnt, sc) in agg.items()),
                    key=lambda t: (-t[3], -t[2], t[0]))[:50]
    assert got == ranked


def test_lpa_against_pure_python(spark, sf_dir):
    """graph_lpa_communities must equal a pure-Python 3-round
    synchronous LPA with (count desc, min label) tie-breaks, and the
    partition must be coarser than singletons but finer than one blob
    at sf0.01's graph (non-degeneracy)."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {(r.kind, r.id): r.community for r in
           all_queries()["graph_lpa_communities"].fn(spark, sf_dir)
           .collect()}
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ok = {r.o_orderkey: r.o_custkey for r in o.collect()}
    e0 = {(ok[r.l_orderkey] * 2, r.l_suppkey * 2 + 1)
          for r in li.collect() if r.l_orderkey in ok}
    adj = {}
    for u, v in e0:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    labels = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            new[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    want = {("c" if n % 2 == 0 else "s", n // 2): l
            for n, l in labels.items()}
    assert got == want
    n_comm = len(set(got.values()))
    assert 1 < n_comm < len(got)


def test_burn_rate_against_pure_python(spark, sf_dir):
    """ops_sla_burn_rate must equal a pure-Python replay (hourly
    buckets, trailing-6 sum, half-away micro burns, two-window page
    conjunction), and a planted full-error hour must page."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    rows = {r.hour: r for r in
            all_queries()["ops_sla_burn_rate"].fn(spark, sf_dir)
            .collect()}
    e = table(spark, sf_dir, "events")
    per = {}
    for r in e.select("ts", "event_type").collect():
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        t, er = per.get(h, (0, 0))
        per[h] = (t + 1, er + (1 if r.event_type == "error" else 0))
    hours = sorted(per)
    for i, h in enumerate(hours):
        n, er = per[h]
        t6 = sum(per[x][0] for x in hours[max(0, i - 5):i + 1])
        e6 = sum(per[x][1] for x in hours[max(0, i - 5):i + 1])
        b1 = (2 * 100000000 * er + n) // (2 * n)
        b6 = (2 * 100000000 * e6 + t6) // (2 * t6)
        g = rows[h]
        assert (g.n_total, g.n_err) == (n, er)
        assert (g.burn1_e6, g.burn6_e6) == (b1, b6)
        assert g.page == (b1 >= 14400000 and b6 >= 6000000)
    # planted: an all-error hour burns 100x on both windows -> pages
    assert (2 * 100000000 * 10 + 10) // (2 * 10) >= 14400000


def test_m4_against_pure_python(spark, sf_dir):
    """downsample_m4 must equal a pure-Python replay (bucketing, min/
    max, first/last under the composite order), and the M4 guarantee
    must hold: per bucket the kept values bracket every dropped one."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {(r.user_id, r.bucket): r for r in
           all_queries()["downsample_m4"].fn(spark, sf_dir).collect()}
    e = table(spark, sf_dir, "events")
    pts = {}
    for r in e.select("user_id", "event_id", "ts", "value").collect():
        t = int(r.ts.timestamp() * 1_000_000)
        pts.setdefault(r.user_id, []).append(
            (t, r.event_id, math.floor(r.value * 1000)))
    want = {}
    for u, ps in pts.items():
        tmin = min(t for t, _, _ in ps)
        tmax = max(t for t, _, _ in ps)
        width = (tmax - tmin) // 10 + 1
        buckets = {}
        for t, eid, vm in ps:
            buckets.setdefault((t - tmin) // width, []).append(
                (t, eid, vm))
        for b, rows in buckets.items():
            rows.sort()
            vals = [vm for _, _, vm in rows]
            want[(u, b)] = (min(vals), max(vals), rows[0][2],
                            rows[-1][2], len(rows))
    assert set(got) == set(want)
    for k, (vmin, vmax, vf, vl, n) in want.items():
        g = got[k]
        assert (g.v_min, g.v_max, g.v_first, g.v_last, g.n) == (
            vmin, vmax, vf, vl, n), k
        assert g.v_min <= g.v_first <= g.v_max
        assert g.v_min <= g.v_last <= g.v_max


def test_user_features_against_pure_python(spark, sf_dir):
    """features_user_activity must equal a pure-Python replay of every
    feature (counts, diversity, exact cents, recency, span/(n-1)
    mean gap with the -1 sentinel, purchase ppm)."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {r.user_id: r for r in
           all_queries()["features_user_activity"].fn(spark, sf_dir)
           .collect()}
    e = table(spark, sf_dir, "events")
    rows = e.select("user_id", "ts", "event_type", "value").collect()
    anchor = max(int(r.ts.timestamp() * 1_000_000) for r in rows)
    per = {}
    for r in rows:
        t = int(r.ts.timestamp() * 1_000_000)
        per.setdefault(r.user_id, []).append(
            (t, r.ts.date(), r.event_type,
             math.floor(r.value * 100 + 0.5)))
    assert set(got) == set(per)
    for u, ps in per.items():
        g = got[u]
        n = len(ps)
        ts = [t for t, _, _, _ in ps]
        npur = sum(1 for _, _, et, _ in ps if et == "purchase")
        assert g.n_events == n
        assert g.active_days == len({d for _, d, _, _ in ps})
        assert g.type_diversity == len({et for _, _, et, _ in ps})
        assert g.total_cents == sum(c for _, _, _, c in ps)
        assert g.recency_days == (anchor - max(ts)) // 86400000000
        want_gap = ((2 * (max(ts) - min(ts)) + (n - 1)) // (2 * (n - 1))
                    if n > 1 else -1)
        assert g.mean_gap_us == want_gap
        assert g.n_purchases == npur
        assert g.purchase_ratio_ppm == (1000000 * npur * 2 + n) // (2 * n)


def test_readability_against_pure_python(spark, sf_dir):
    """text_readability_fk must equal a pure-Python replay of the
    vowel-group/sentence/word counts and both Flesch formulas."""
    import re

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {r.doc_id: r for r in
           all_queries()["text_readability_fk"].fn(spark, sf_dir)
           .collect()}
    d = table(spark, sf_dir, "documents")
    for r in d.select("doc_id", "text").collect():
        words = len([t for t in r.text.split(" ") if t])
        sents = max(len(re.findall(r"[.!?]+", r.text)), 1)
        sylls = len(re.findall(r"[aeiouy]+", r.text.lower()))
        g = got[r.doc_id]
        assert (g.words, g.sents, g.sylls) == (words, sents, sylls)
        grade = round(0.39 * (words / sents)
                      + 11.8 * (sylls / max(words, 1)) - 15.59, 4)
        ease = round(206.835 - 1.015 * (words / sents)
                     - 84.6 * (sylls / max(words, 1)), 4)
        # python round() is banker's; the engines round half away —
        # compare on the 1e-4 grid instead of exactly
        assert abs(g.fk_grade - grade) < 2e-4
        assert abs(g.flesch_ease - ease) < 2e-4


def test_wow_growth_against_pure_python(spark, sf_dir):
    """window_wow_growth must equal a pure-Python replay: Monday-
    anchored ISO weeks, per-segment lag, signed half-away ppm (the
    floor-consistent +C shift), NULL on first weeks."""
    import datetime
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {(r.segment, r.week): r for r in
           all_queries()["window_wow_growth"].fn(spark, sf_dir)
           .collect()}
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate",
                                              "o_totalprice").collect()
    c = {r.c_custkey: r.c_mktsegment for r in
         table(spark, sf_dir, "customer").collect()}
    per = {}
    for r in o:
        d = r.o_orderdate.date()
        wk = d - datetime.timedelta(days=d.weekday())
        key = (c[r.o_custkey], wk)
        per[key] = per.get(key, 0) + math.floor(
            r.o_totalprice * 100 + 0.5)
    segs = {}
    for (s, wk), v in per.items():
        segs.setdefault(s, []).append((wk, v))
    C = 10 ** 12
    for s, rows in segs.items():
        rows.sort()
        prev = None
        for wk, v in rows:
            g = got[(s, wk)]
            assert g.rev_cents == v
            if prev is None:
                assert g.prev_cents is None and g.wow_ppm is None
            else:
                want = ((2 * (1000000 * (v - prev) + C * prev) + prev)
                        // (2 * prev)) - C
                assert (g.prev_cents, g.wow_ppm) == (prev, want), (s, wk)
            prev = v


def test_did_against_pure_python(spark, sf_dir):
    """ab_diff_in_diff must equal a pure-Python replay: per-user-
    period cent sums, the four-cell DiD estimate, and the pooled SE
    of independent means."""
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = all_queries()["ab_diff_in_diff"].fn(spark, sf_dir).collect()[0]
    e = table(spark, sf_dir, "events")
    rows = e.select("user_id", "ts", "value").collect()
    us = [int(r.ts.timestamp() * 1_000_000) for r in rows]
    mid = min(us) + (max(us) - min(us)) // 2
    per = {}
    for r, t in zip(rows, us):
        key = (r.user_id, r.user_id % 2, 1 if t >= mid else 0)
        per[key] = per.get(key, 0) + math.floor(r.value * 100 + 0.5)
    cells = {}
    for (_, g, p), y in per.items():
        n, s, ss = cells.get((g, p), (0, 0, 0))
        cells[(g, p)] = (n + 1, s + y, ss + y * y)
    mean = {k: s / n for k, (n, s, _) in cells.items()}
    did = ((mean[(1, 1)] - mean[(1, 0)])
           - (mean[(0, 1)] - mean[(0, 0)]))
    var = 0.0
    for k, (n, s, ss) in cells.items():
        var += (n * ss - s * s) / (n * n * (n - 1))
    assert got.n11 == cells[(1, 1)][0] and got.n00 == cells[(0, 0)][0]
    assert abs(got.did_cents - did) < 5e-4
    assert abs(got.se_cents - math.sqrt(var)) < 5e-4


def test_abc_xyz_against_pure_python(spark, sf_dir):
    """inventory_abc_xyz must equal a pure-Python replay (cumulative-
    share ABC by cross-multiplication, zero-filled-week CV classes),
    and class totals must be non-degenerate (A and C both present;
    every part classified exactly once)."""
    import datetime
    import math

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.registry import all_queries

    got = {r.partkey: r for r in
           all_queries()["inventory_abc_xyz"].fn(spark, sf_dir)
           .collect()}
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity",
        "l_shipdate").collect()
    rev, wq, weeks = {}, {}, set()
    for r in li:
        cents = math.floor(r.l_extendedprice * 100 + 0.5)
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + cents
        d = r.l_shipdate.date()
        wk = d - datetime.timedelta(days=d.weekday())
        weeks.add(wk)
        key = (r.l_partkey, wk)
        wq[key] = wq.get(key, 0) + int(r.l_quantity)
    W = len(weeks)
    tot = sum(rev.values())
    cum = 0
    abc = {}
    for pk, rc in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += rc
        abc[pk] = ("A" if 5 * cum <= 4 * tot
                   else "B" if 20 * cum <= 19 * tot else "C")
    per = {}
    for (pk, _), q in wq.items():
        n, s, sq = per.get(pk, (0, 0, 0))
        per[pk] = (n + 1, s + q, sq + q * q)
    assert set(got) == set(rev)
    for pk, g in got.items():
        n, s, sq = per[pk]
        xyz = ("X" if 4 * (W * sq - s * s) < s * s
               else "Y" if W * sq - s * s < s * s else "Z")
        assert (g.rev_cents, g.abc, g.xyz, g.n_demand_weeks) == (
            rev[pk], abc[pk], xyz, n), pk
    kinds = {g.abc for g in got.values()}
    assert "A" in kinds and "C" in kinds
