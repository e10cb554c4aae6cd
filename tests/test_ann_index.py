"""Disk-resident shared ANN index (ROADMAP item 3): build-once /
serve-many, result parity with the in-memory IVF operator, and the
partition-pruned probe scan that makes the persisted layout an index."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.dedup.index import (ann_topk_indexed, build_ivf_index,
                                        load_centroids)
from zoom_etl_spark.dedup.ivf import ann_topk_ivf

DIM = 64
K = 10


def test_indexed_search_matches_inmemory_ivf(spark, sf_dir):
    """Same seed → same centroids → the persisted index must return
    EXACTLY what the in-memory IVF operator returns — persistence is a
    layout change, not a semantics change."""
    corpus = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = corpus.limit(25)
    path = tempfile.mkdtemp(prefix="zes_ivfidx_")
    built = build_ivf_index(corpus, "vec_id", "embedding", DIM, path,
                            n_cells=16, iters=3, seed=42)
    loaded = load_centroids(spark, path)
    assert abs(built - loaded).max() < 1e-12

    got = {(r.query_id, r.neighbor_id, r.sim) for r in
           ann_topk_indexed(spark, path, queries, "vec_id", "embedding",
                            k=K, n_probe=2).collect()}
    want = {(r.query_id, r.neighbor_id, r.sim) for r in
            ann_topk_ivf(corpus, queries, "vec_id", "embedding", DIM, k=K,
                         n_cells=16, n_probe=2, iters=3, seed=42).collect()}
    assert got == want and len(got) > 0


def test_indexed_probe_scan_is_partition_pruned(spark, sf_dir):
    """A single query probing n_probe=2 of 16 cells must read ONLY those
    partitions: the scan carries PartitionFilters on `cell` and the file
    index selects ≤ 2 of the 16 cell directories."""
    corpus = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    one_query = corpus.limit(1)
    path = tempfile.mkdtemp(prefix="zes_ivfidx_pp_")
    build_ivf_index(corpus, "vec_id", "embedding", DIM, path,
                    n_cells=16, iters=3, seed=42)
    res = ann_topk_indexed(spark, path, one_query, "vec_id", "embedding",
                           k=K, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("#", " #").replace(
        "cell #", "cell#") or "cell IN" in plan
    # the pruned scan must touch at most n_probe of the n_cells dirs
    pruned = (spark.read.parquet(f"{path}/cells")
              .where(F.col("cell").isin([0, 1])))
    n_parts = pruned.select("cell").distinct().count()
    assert n_parts <= 2
    assert res.count() > 0


def test_index_lifecycle_drift_decision(spark, sf_dir):
    """Versioned index maintenance: an UNCHANGED corpus must measure low
    drift (no rebuild); a materially shifted corpus must measure higher
    drift than the unchanged one, and the threshold placed between the
    two flips the decision. The version log records the evidence."""
    from zoom_etl_spark.dedup.index import (current_index_version,
                                            save_index_version,
                                            should_rebuild)

    corpus = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = tempfile.mkdtemp(prefix="zes_ivflc_")
    build_ivf_index(corpus, "vec_id", "embedding", DIM, path,
                    n_cells=16, iters=3, seed=42)
    save_index_version(spark, path, 1, {"built": "initial"})
    assert current_index_version(spark, path) == 1

    same = should_rebuild(corpus, "embedding", path, drift_threshold=0.2)
    # identical corpus + identical training recipe → identical centroids
    # → zero reassignment
    assert same["reassignment_rate"] <= 0.01, same
    assert not same["rebuild"]

    # shift a third of the corpus far away: the fresh quantizer moves
    shifted = corpus.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 3 == 0,
               F.transform("embedding", lambda x: x + F.lit(5.0)))
        .otherwise(F.col("embedding")))
    moved = should_rebuild(shifted, "embedding", path, drift_threshold=0.2)
    assert moved["reassignment_rate"] > same["reassignment_rate"], (same, moved)
    if moved["rebuild"]:
        save_index_version(spark, path, 2, moved)
        assert current_index_version(spark, path) == 2
    # threshold placed between the two rates flips the decision
    mid = (same["reassignment_rate"] + moved["reassignment_rate"]) / 2
    assert not should_rebuild(corpus, "embedding", path, mid)["rebuild"]
    assert should_rebuild(shifted, "embedding", path, mid)["rebuild"]
