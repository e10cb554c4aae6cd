"""File-level zone-map data skipping: pruning must never change results
(conservative intervals), must actually skip files on clustered layouts,
and must commit atomically with the data through TableGroup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from zoom_etl_spark.operators import zonemap
from zoom_etl_spark.operators.txn import TableGroup


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    """10 range-clustered files over k in [0, 100) — tight per-file
    intervals, the layout zorder/repartitionByRange produces."""
    path = str(tmp_path_factory.mktemp("zm") / "clustered")
    df = (spark.range(0, 20_000)
          .select((F.col("id") % 100).alias("k"),
                  (F.col("id") * 7 % 1000).alias("v"),
                  F.concat(F.lit("cat_"), (F.col("id") % 26).cast("string"))
                  .alias("s")))
    df.repartitionByRange(10, "k").write.mode("overwrite").parquet(path)
    return path


def test_stats_cover_all_files(clustered_dir):
    stats = zonemap.collect_file_stats(clustered_dir, ["k", "s"])
    assert len(stats) == 10
    for s in stats.values():
        ks = s["columns"]["k"]
        assert ks["min"] is not None and ks["max"] >= ks["min"]
        assert s["num_rows"] > 0


@pytest.mark.parametrize("op,val,hi", [
    ("=", 37, None),
    ("<", 13, None),
    ("<=", 13, None),
    (">", 91, None),
    (">=", 91, None),
    ("between", 20, 29),
])
def test_prune_preserves_results_and_skips(spark, clustered_dir, op, val, hi):
    full = (spark.read.parquet(clustered_dir)
            .filter(zonemap._predicate("k", op, val, hi)))
    pruned = zonemap.read_skipping(spark, clustered_dir, "k", op, val, hi)
    assert pruned.count() == full.count() > 0
    assert (sorted(r["v"] for r in pruned.collect())
            == sorted(r["v"] for r in full.collect()))
    # the point: provably-dead files never enter the plan
    n_all = len(spark.read.parquet(clustered_dir).inputFiles())
    assert n_all == 10
    assert len(pruned.inputFiles()) < n_all


def test_string_pruning(spark, clustered_dir):
    # s is NOT clustered → intervals overlap → no skipping, but results
    # must still be exact (conservative pruning keeps everything)
    pruned = zonemap.read_skipping(spark, clustered_dir, "s", "=", "cat_7")
    full = spark.read.parquet(clustered_dir).filter(F.col("s") == "cat_7")
    assert pruned.count() == full.count() > 0


def test_empty_prune_returns_empty_with_schema(spark, clustered_dir):
    out = zonemap.read_skipping(spark, clustered_dir, "k", ">", 10_000)
    assert out.count() == 0
    assert set(out.columns) == {"k", "v", "s"}


def test_missing_column_stats_never_prune(spark, clustered_dir):
    stats = zonemap.collect_file_stats(clustered_dir, ["k"])
    keep = zonemap.prune_files(stats, "v", "=", 5)  # no stats for v
    assert len(keep) == 10


def test_timestamp_stats_roundtrip(spark, sf_dir):
    """Real testdata: events.ts zone stats prune a time-range read."""
    from zoom_etl_spark.catalog import table
    import tempfile
    e = table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "events_clustered")
        e.repartitionByRange(8, "ts").write.parquet(path)
        stats = zonemap.collect_file_stats(path, ["ts"])
        lo = e.agg(F.min("ts")).collect()[0][0]
        hi = e.agg(F.max("ts")).collect()[0][0]
        mid = lo + (hi - lo) / 2
        pruned = zonemap.read_skipping(spark, path, "ts", "<", mid,
                                       stats=stats)
        full = spark.read.parquet(path).filter(F.col("ts") < F.lit(mid))
        assert pruned.count() == full.count() > 0
        assert len(pruned.inputFiles()) < 8


# --------------------------------------------------------- txn integration


def test_publish_with_stats_and_read_where(spark, tmp_path):
    g = TableGroup(str(tmp_path / "grp"))
    df = (spark.range(0, 10_000)
          .select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
          .repartitionByRange(5, "k"))
    v1 = g.publish({"t": df}, stats_columns={"t": ["k"]})
    assert v1 == 1
    zm = g.manifest()["meta"]["zonemaps"]["t"]
    assert len(zm) == 5

    got = zonemap.read_where(g, spark, "t", "k", "between", 10, 19)
    want = g.read(spark, "t").filter(F.col("k").between(10, 19))
    assert got.count() == want.count() > 0
    assert len(got.inputFiles()) < 5


def test_zonemaps_carry_forward_and_invalidate(spark, tmp_path):
    g = TableGroup(str(tmp_path / "grp2"))
    a = (spark.range(0, 1000).select((F.col("id") % 10).alias("k"))
         .repartitionByRange(2, "k"))
    b = spark.range(0, 10).select(F.col("id").alias("x"))
    g.publish({"a": a, "b": b}, stats_columns={"a": ["k"]})
    # republish b only → a's zone map carries forward with a's path
    g.publish({"b": b})
    assert "a" in g.manifest()["meta"]["zonemaps"]
    # republish a WITHOUT stats → its stale zone map is dropped
    g.publish({"a": a})
    assert "a" not in g.manifest()["meta"].get("zonemaps", {})
    # read_where still works (plain filtered scan fallback)
    assert zonemap.read_where(g, spark, "a", "k", "=", 3).count() == 100


def test_read_where_fallback_without_stats(spark, tmp_path):
    g = TableGroup(str(tmp_path / "grp3"))
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    g.publish({"t": df})
    assert zonemap.read_where(g, spark, "t", "k", "<", 10).count() == 10
