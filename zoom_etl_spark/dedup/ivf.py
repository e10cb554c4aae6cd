"""IVF (inverted-file) ANN: coarse k-means centroids partition the vector
space; search probes only the closest ``n_probe`` cells.

The complement to hyperplane LSH (lsh.py): LSH buckets are oblivious to
the data distribution, IVF cells adapt to it — better recall/cost on
clustered embeddings (which real embedding corpora are).

Scale shape: centroids are tiny (k × dim floats) and ship to executors
inside the assignment UDF's closure — the ONLY driver-side data in the
algorithm (k rows, never data rows). Assignment is an Arrow-batched
numpy matmul (a per-row argmin over k interpreted HOF folds is ~10×
slower — measured); training is Lloyd's iterations as DataFrame
aggregations (one shuffle per iteration); search is an equi-join on cell
id. Everything else streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from ..functions.vectors import cosine_similarity
from ..operators.windows import topk_per_group


def _nearest_cells_udf(centroids: np.ndarray, n: int):
    """Arrow UDF: per row, ids of the ``n`` closest centroids (L2).
    Centroids ride in the closure — k×dim floats, broadcast-sized."""
    C = centroids.astype(np.float64)            # (k, dim)
    c_norms = (C * C).sum(axis=1)               # (k,)

    @pandas_udf(ArrayType(IntegerType()))
    def nearest(embs: pd.Series) -> pd.Series:
        E = np.stack(embs.to_numpy()).astype(np.float64)          # (b, dim)
        # ||e-c||² = ||e||² - 2e·c + ||c||²; ||e||² constant per row → drop
        d = c_norms[None, :] - 2.0 * (E @ C.T)                    # (b, k)
        idx = np.argsort(d, axis=1)[:, :n].astype(np.int32)
        return pd.Series(list(idx))

    return nearest


def nearest_cell(emb: Column | str, centroids: np.ndarray) -> Column:
    """Id of the closest centroid."""
    c = F.col(emb) if isinstance(emb, str) else emb
    return _nearest_cells_udf(centroids, 1)(c).getItem(0)


def train_centroids_history(corpus: DataFrame, emb_col: str, dim: int,
                            k: int = 16, iters: int = 3, seed: int = 42,
                            sample_rows: int = 4096) -> list[np.ndarray]:
    """Lloyd's k-means on a bounded sample, returning the centroid set
    AFTER EACH iteration (history[-1] is what ``train_centroids``
    returns). The history is the raw material for the maintenance
    metrics: ``reassignment_rate`` between successive entries falls as
    Lloyd's converges — the signal an index-maintenance job watches to
    decide when re-training has stopped paying."""
    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((k, dim))
    train = corpus.select(F.col(emb_col).alias("e")).limit(sample_rows)
    history: list[np.ndarray] = []
    for _ in range(iters):
        assigned = train.select(nearest_cell(F.col("e"), centroids).alias("cell"),
                                "e")
        sums = (assigned.select("cell", F.posexplode("e").alias("i", "v"))
                .groupBy("cell", "i").agg(F.sum("v").alias("s"),
                                          F.count("*").alias("n")))
        rows = sums.collect()  # k × dim rows — bounded, not data-sized
        new = centroids.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in rows:
            acc.setdefault(r.cell, np.zeros(dim))[r.i] = r.s
            cnt[r.cell] = r.n
        for cell, vec in acc.items():
            new[cell] = vec / max(cnt[cell], 1)
        centroids = new
        history.append(centroids)
    return history


def train_centroids(corpus: DataFrame, emb_col: str, dim: int, k: int = 16,
                    iters: int = 3, seed: int = 42,
                    sample_rows: int = 4096) -> np.ndarray:
    """Lloyd's k-means on a bounded sample: deterministic init (seeded
    normal), each iteration one assignment + one groupBy-mean (single
    shuffle). Only the k centroids ever reach the driver. Training on a
    sample is standard IVF practice — cell quality needs distribution
    coverage, not every row."""
    return train_centroids_history(corpus, emb_col, dim, k, iters, seed,
                                   sample_rows)[-1]


def reassignment_rate(corpus: DataFrame, emb_col: str,
                      old_centroids: np.ndarray,
                      new_centroids: np.ndarray) -> float:
    """Fraction of corpus rows whose nearest cell differs between two
    centroid sets — the IVF maintenance metric (ROADMAP item 4). High
    rate after a re-train = the index layout shifted and cells must be
    rewritten; a rate that keeps falling across re-trains on a stable
    corpus = training has converged and the maintenance job can back
    off. One distributed pass (two closure-shipped argmins per row, one
    scalar to the driver) — never collects assignments."""
    changed = (nearest_cell(emb_col, old_centroids)
               != nearest_cell(emb_col, new_centroids)).cast("double")
    row = corpus.agg(F.avg(changed)).first()
    return float(row[0]) if row[0] is not None else 0.0


def ann_topk_ivf(corpus: DataFrame, queries: DataFrame, id_col: str,
                 emb_col: str, dim: int, k: int = 10, n_cells: int = 16,
                 n_probe: int = 2, iters: int = 3, seed: int = 42) -> DataFrame:
    """Approximate top-k cosine neighbors per query: corpus bucketed by
    nearest centroid; each query probes its ``n_probe`` closest cells;
    exact cosine rerank within the probed cells."""
    centroids = train_centroids(corpus, emb_col, dim, n_cells, iters, seed)

    cb = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(emb_col).alias("c_emb"),
                       nearest_cell(emb_col, centroids).alias("cell"))

    probe = _nearest_cells_udf(centroids, n_probe)
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(emb_col).alias("q_emb"),
                         F.explode(probe(F.col(emb_col))).alias("cell")))

    cand = (qb.join(cb, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", F.round(cosine_similarity("q_emb", "c_emb"), 6)))
    return topk_per_group(
        cand.select("query_id", "neighbor_id", "sim").dropDuplicates(
            ["query_id", "neighbor_id"]),
        keys=["query_id"],
        order=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=k)
