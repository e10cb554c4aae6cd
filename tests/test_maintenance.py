"""Partition-scoped merge + compaction: only touched partitions rewrite,
untouched partition files stay byte-identical on disk."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.operators.maintenance import (compact_partition,
                                                  merge_into_partitioned,
                                                  partition_file_count)


def _files_with_mtimes(target_dir, partition_col, value):
    pdir = os.path.join(target_dir, f"{partition_col}={value}")
    return {f: os.path.getmtime(os.path.join(pdir, f))
            for f in os.listdir(pdir) if f.endswith(".parquet")}


def test_merge_rewrites_only_touched_partitions(spark, sf_dir):
    target_dir = tempfile.mkdtemp(prefix="zes_part_") + "/t"
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderstatus").alias("status"))
    o.write.partitionBy("status").parquet(target_dir)

    untouched_before = _files_with_mtimes(target_dir, "status", "F")

    # contract: a key's partition is stable → update an id that already
    # lives in partition O, plus insert a brand-new key into O
    some_o_id = o.filter(F.col("status") == "O").select("id").first().id
    updates = spark.createDataFrame(
        [(some_o_id, 999.0, "O"), (999999999, 1.0, "O")],
        "id long, total double, status string")
    touched = merge_into_partitioned(spark, target_dir, updates,
                                     keys=["id"], partition_col="status")
    assert touched == ["O"]

    # untouched partition: exact same files, same mtimes
    assert _files_with_mtimes(target_dir, "status", "F") == untouched_before

    back = spark.read.parquet(target_dir)
    assert back.filter(F.col("id") == 999999999).count() == 1       # inserted
    assert back.filter(F.col("id") == some_o_id).collect()[0].total == 999.0
    # row count grew by exactly the new key
    assert back.count() == o.count() + 1


def test_merge_rejects_null_partition_updates(spark, sf_dir):
    import pytest
    target_dir = tempfile.mkdtemp(prefix="zes_part_") + "/t"
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderstatus").alias("status"))
    o.write.partitionBy("status").parquet(target_dir)
    updates = spark.createDataFrame([(1, 9.0, None)], "id long, total double, status string")
    with pytest.raises(ValueError, match="NULL 'status'"):
        merge_into_partitioned(spark, target_dir, updates,
                               keys=["id"], partition_col="status")


def test_salted_join_rejects_outer(spark):
    import pytest
    from zoom_etl_spark.operators.joins import salted_join
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, "y")], "k int, w string")
    with pytest.raises(ValueError, match="inner"):
        salted_join(a, b, "k", how="full_outer")
    assert salted_join(a, b, "k", how="left").count() == 1


def test_compaction_reduces_files_preserves_rows(spark, sf_dir):
    target_dir = tempfile.mkdtemp(prefix="zes_comp_") + "/t"
    e = table(spark, sf_dir, "events").select(
        "event_id", F.col("event_type").alias("etype"))
    # simulate many small streaming appends
    e.repartition(16).write.partitionBy("etype").parquet(target_dir)
    before_files = partition_file_count(target_dir, "etype", "click")
    assert before_files > 4
    before_rows = spark.read.parquet(target_dir).count()
    other_before = _files_with_mtimes(target_dir, "etype", "view")

    compact_partition(spark, target_dir, "etype", "click", target_files=1)

    assert partition_file_count(target_dir, "etype", "click") == 1
    assert spark.read.parquet(target_dir).count() == before_rows
    assert _files_with_mtimes(target_dir, "etype", "view") == other_before


def test_auto_join_detects_skew_and_matches_plain(spark):
    from zoom_etl_spark.operators.joins import auto_join
    # one key owns 90% of the left side — pathological by any threshold
    hot = spark.range(0, 9000).selectExpr("1 AS k", "id AS v")
    cold = spark.range(0, 1000).selectExpr("cast(id % 50 + 2 AS bigint) AS k",
                                           "id + 9000 AS v")
    left = hot.unionAll(cold)
    right = spark.range(1, 60).selectExpr("id AS k", "id * 10 AS w")
    decision: dict = {}
    out = auto_join(left, right, "k", sample_fraction=0.5,
                    decision_out=decision)
    assert decision["strategy"] == "salted"
    assert decision["hot_share"] > 0.5
    plain = left.join(right, "k")
    assert out.count() == plain.count()
    assert out.exceptAll(plain).count() == 0
    assert plain.exceptAll(out).count() == 0


def test_cms_skew_stats_bounds_and_estimate(spark):
    """Count-min estimate of the hot key: never an undercount (one-sided
    error), overcount bounded by the sketch guarantee e·n/width."""
    import math

    from zoom_etl_spark.operators.joins import skew_stats_cms
    # hot key 1 owns 3000 rows; 100k distinct cold keys of 1 row each —
    # the exact histogram would hold 100k counters, the sketch holds 4×4096
    hot = spark.range(0, 3000).selectExpr("cast(1 AS bigint) AS k")
    cold = spark.range(0, 100000).selectExpr("id + 10 AS k")
    stats = skew_stats_cms(hot.unionAll(cold), "k", sample_fraction=1.0,
                           width=4096, depth=4, support=0.02)
    assert stats["mode"] == "cms"
    assert stats["n"] == 103000
    assert stats["top_count"] >= 3000                      # no undercount
    assert stats["top_count"] <= 3000 + math.e * stats["n"] / 4096
    assert stats["hot_share"] >= 0.025


def test_auto_join_cms_mode_chooses_salted_on_hot_key(spark):
    """ROADMAP item 3 done-condition: synthetic hot-key table under the
    sketch picks the salted path, result identical to the plain join."""
    from zoom_etl_spark.operators.joins import auto_join
    hot = spark.range(0, 9000).selectExpr("1 AS k", "id AS v")
    cold = spark.range(0, 1000).selectExpr("cast(id % 50 + 2 AS bigint) AS k",
                                           "id + 9000 AS v")
    left = hot.unionAll(cold)
    right = spark.range(1, 60).selectExpr("id AS k", "id * 10 AS w")
    decision: dict = {}
    out = auto_join(left, right, "k", sample_fraction=0.5,
                    decision_out=decision, stats_mode="cms")
    assert decision["mode"] == "cms" and decision["strategy"] == "salted"
    assert decision["hot_share"] > 0.5
    plain = left.join(right, "k")
    assert out.exceptAll(plain).count() == 0
    assert plain.exceptAll(out).count() == 0


def test_auto_join_uniform_stays_plain(spark):
    from zoom_etl_spark.operators.joins import auto_join
    left = spark.range(0, 5000).selectExpr("id % 500 AS k", "id AS v")
    right = spark.range(0, 500).selectExpr("id AS k", "id * 10 AS w")
    decision: dict = {}
    out = auto_join(left, right, "k", sample_fraction=0.5,
                    decision_out=decision)
    assert decision["strategy"] == "plain"
    assert decision["hot_share"] < 0.2
    assert out.count() == 5000


def test_cms_merge_of_parts_equals_full_sketch(spark):
    """ROADMAP 3 done-gate: the CMS is LINEAR — sketching two disjoint
    halves and merging must reproduce the full-data sketch exactly
    (counters, n) and give identical hot-key estimates."""
    from zoom_etl_spark.operators.stats import build_cms

    rows = [(i % 50,) for i in range(4000)] + [(999,)] * 1000
    df = spark.createDataFrame(rows, "k long")
    a = df.filter(F.col("k") < 25)
    b = df.filter(F.col("k") >= 25)
    kw = dict(sample_fraction=1.0, width=256, depth=4)
    full = build_cms(df, "k", **kw)
    merged = build_cms(a, "k", **kw).merge(build_cms(b, "k", **kw))
    assert merged.n == full.n
    assert merged.counters == full.counters
    # the hot key is a candidate on at least one side; merged estimate
    # uses the summed counters (>= true count 1000, CMS overshoots only)
    assert merged.top_estimate() >= 1000
    assert merged.top_estimate() == full.estimate(
        dict(full.candidates)[999] if full.candidates
        and 999 in dict(full.candidates) else merged.candidates[0][1])


def test_cms_save_load_roundtrip_and_cache_read(tmp_path, spark):
    """Persisted sketch round-trips exactly, and auto_join's cms mode
    reads the cache instead of re-scanning (proven by priming the cache
    from a DIFFERENT, hot dataframe: the decision follows the cache)."""
    from zoom_etl_spark.operators.joins import auto_join
    from zoom_etl_spark.operators.stats import CMSketch, build_cms

    hot = spark.createDataFrame([(1, i) for i in range(500)]
                                + [(k, 0) for k in range(2, 30)],
                                "k long, v long")
    sk = build_cms(hot, "k", sample_fraction=1.0, width=256, depth=4)
    p = str(tmp_path / "events.k.cms.json")
    sk.save(p)
    back = CMSketch.load(p)
    assert back.counters == sk.counters and back.n == sk.n
    assert back.top_estimate() == sk.top_estimate()

    uniform = spark.createDataFrame([(k, k) for k in range(100)],
                                    "k long, v long")
    right = spark.createDataFrame([(k, "d") for k in range(100)],
                                  "k long, name string")
    decision = {}
    out = auto_join(uniform, right, "k", sample_fraction=1.0,
                    skew_threshold=0.2, stats_mode="cms",
                    stats_cache_path=p, decision_out=decision)
    # the uniform frame alone would go plain; the cached hot sketch wins
    assert decision["strategy"] == "salted" and decision["mode"] == "cms"
    assert out.count() == 100


def test_cms_merge_rejects_geometry_mismatch(spark):
    import pytest

    from zoom_etl_spark.operators.stats import build_cms

    df = spark.createDataFrame([(1,)], "k long")
    a = build_cms(df, "k", sample_fraction=1.0, width=128, depth=4)
    b = build_cms(df, "k", sample_fraction=1.0, width=256, depth=4)
    with pytest.raises(ValueError, match="geometry"):
        a.merge(b)
