"""Disk-resident shared ANN index (ROADMAP item 3): persist a trained
IVF layout once, serve any number of later sessions from disk without
re-training or re-assigning.

Layout under ``<path>/``:
  * ``centroids/`` — parquet (cell INT, vec ARRAY<DOUBLE>): the trained
    coarse quantizer, k×dim — broadcast-sized by construction.
  * ``cells/`` — the corpus (id, embedding) written PARTITIONED BY its
    nearest-cell assignment. Partitioning is the index: a query that
    probes ``n_probe`` of ``k`` cells reads ~n_probe/k of the corpus
    from disk (partition pruning), which is the entire point of IVF made
    durable — the in-memory variant (ivf.py) re-buckets the corpus per
    query run.

Build is one training pass + one assignment pass + one partitioned
write; search is metadata-read (centroids) + partition-pruned scan +
exact cosine rerank. Nothing data-sized ever reaches the driver. At
100 TB the cells table lives on the object store and maintenance jobs
(ivf.py::reassignment_rate) decide when the layout has drifted enough
to rewrite — the same lifecycle as compaction (operators/maintenance).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..operators.windows import topk_per_group
from .ivf import _nearest_cells_udf, nearest_cell, train_centroids


def build_ivf_index(corpus: DataFrame, id_col: str, emb_col: str, dim: int,
                    path: str, n_cells: int = 16, iters: int = 3,
                    seed: int = 42) -> np.ndarray:
    """Train + assign + persist. Returns the trained centroids (k×dim)."""
    spark = corpus.sparkSession
    centroids = train_centroids(corpus, emb_col, dim, n_cells, iters, seed)
    (spark.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cell INT, vec ARRAY<DOUBLE>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids"))
    (corpus.select(F.col(id_col).alias("id"),
                   F.col(emb_col).alias("emb"),
                   nearest_cell(emb_col, centroids).alias("cell"))
     .write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells"))
    return centroids


def load_centroids(spark: SparkSession, path: str) -> np.ndarray:
    """Read the coarse quantizer back — k rows, driver-bounded by design."""
    rows = spark.read.parquet(f"{path}/centroids").collect()
    k = max(r.cell for r in rows) + 1
    out = np.zeros((k, len(rows[0].vec)))
    for r in rows:
        out[r.cell] = r.vec
    return out


def save_index_version(spark: SparkSession, path: str, version: int,
                       meta: dict) -> None:
    """Append a row to the index's version log (parquet — readable by
    any session, no side files). ``meta`` carries the drift stats the
    maintenance job recorded when this version was built."""
    import json as _json
    (spark.createDataFrame([(int(version), _json.dumps(meta))],
                           "version INT, meta STRING")
     .coalesce(1).write.mode("append").parquet(f"{path}/versions"))


def current_index_version(spark: SparkSession, path: str) -> int:
    rows = spark.read.parquet(f"{path}/versions").agg(
        F.max("version").alias("v")).collect()
    return int(rows[0].v) if rows and rows[0].v is not None else 0


def should_rebuild(corpus: DataFrame, emb_col: str, path: str,
                   drift_threshold: float = 0.2, iters: int = 3,
                   seed: int = 42) -> dict:
    """Index-lifecycle decision (ROADMAP: codebook versioning tied to
    reassignment_rate): train FRESH centroids on the corpus as it is
    NOW, measure the fraction of rows whose nearest cell would change
    versus the PERSISTED quantizer, and rebuild only when that drift
    exceeds the threshold — rewriting a 100 TB cell layout is the
    expensive step, so it must be justified by measured drift, not a
    timer. One distributed pass (two closure-shipped argmins per row,
    one scalar out); the decision and its evidence are returned so the
    maintenance job can log them into the version log on rebuild."""
    from .ivf import reassignment_rate, train_centroids
    spark = corpus.sparkSession
    old = load_centroids(spark, path)
    k, dim = old.shape
    fresh = train_centroids(corpus, emb_col, dim, k, iters, seed)
    rate = reassignment_rate(corpus, emb_col, old, fresh)
    return {"reassignment_rate": rate,
            "drift_threshold": drift_threshold,
            "rebuild": rate > drift_threshold}


def ann_topk_indexed(spark: SparkSession, path: str, queries: DataFrame,
                     id_col: str, emb_col: str, k: int = 10,
                     n_probe: int = 2) -> DataFrame:
    """Serve top-k cosine ANN from the persisted index: probe the
    ``n_probe`` nearest cells per query, equi-join on the PARTITION
    column (pruned scan — test_ann_index asserts the plan), exact rerank
    within candidates. No training, no corpus-wide assignment — the
    index amortizes across every session that loads it."""
    centroids = load_centroids(spark, path)
    probe = _nearest_cells_udf(centroids, n_probe)
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(emb_col).alias("q_emb"),
                         F.explode(probe(F.col(emb_col))).alias("cell")))
    # The union of probed cells is bounded by k (index metadata-sized,
    # NOT data-sized), so collecting it buys STATIC partition pruning on
    # the cells scan — deterministic, plan-visible, and independent of
    # whether dynamic pruning would fire. With many diverse queries the
    # set approaches all k cells and pruning correctly degrades to a
    # full (still one-pass) scan.
    probed = sorted(r.cell for r in qb.select("cell").distinct().collect())
    cells = (spark.read.parquet(f"{path}/cells")
             .where(F.col("cell").isin(probed)))
    cand = (qb.join(cells, "cell")
            .filter(F.col("query_id") != F.col("id"))
            .withColumn("sim", F.round(cosine_similarity("q_emb", "emb"), 6))
            .select("query_id", F.col("id").alias("neighbor_id"), "sim")
            .dropDuplicates(["query_id", "neighbor_id"]))
    return topk_per_group(cand, keys=["query_id"],
                          order=[F.col("sim").desc(),
                                 F.col("neighbor_id").asc()], k=k)
