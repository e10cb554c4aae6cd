"""IVF (inverted-file) ANN: coarse k-means centroids partition the vector
space; search probes only the closest ``n_probe`` cells.

The complement to hyperplane LSH (lsh.py): LSH buckets are oblivious to
the data distribution, IVF cells adapt to it — better recall/cost on
clustered embeddings (which real embedding corpora are).

Scale shape: centroids are tiny (k × dim floats) and live driver-side /
broadcast — the ONLY collect in the algorithm (k rows, not data rows).
Training is Lloyd's iterations as DataFrame aggregations (one shuffle per
iteration); assignment is a per-row argmin over broadcast centroids in
codegen; search is an equi-join on cell id. Everything else streams.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..operators.windows import topk_per_group


def _dist2(emb: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid — codegen'd fold."""
    lits = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(emb, lits, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0), lambda acc, x: acc + x)


def nearest_cell(emb: Column, centroids: np.ndarray) -> Column:
    """Index of the closest centroid (argmin over k literal distances)."""
    k = len(centroids)
    best_d = _dist2(emb, centroids[0])
    best_i = F.lit(0)
    for i in range(1, k):
        d = _dist2(emb, centroids[i])
        closer = d < best_d
        best_i = F.when(closer, i).otherwise(best_i)
        best_d = F.when(closer, d).otherwise(best_d)
    return best_i


def train_centroids(corpus: DataFrame, emb_col: str, dim: int, k: int = 16,
                    iters: int = 3, seed: int = 42) -> np.ndarray:
    """Lloyd's k-means: deterministic init (seeded normal), each iteration
    one assignment + one groupBy-mean (single shuffle). Only the k
    centroids ever reach the driver."""
    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((k, dim))
    for _ in range(iters):
        assigned = corpus.select(
            nearest_cell(F.col(emb_col), centroids).alias("cell"),
            F.col(emb_col).alias("e"))
        # mean per cell: element-wise sums via posexplode, then regroup
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
    return centroids


def ann_topk_ivf(corpus: DataFrame, queries: DataFrame, id_col: str,
                 emb_col: str, dim: int, k: int = 10, n_cells: int = 16,
                 n_probe: int = 2, iters: int = 3, seed: int = 42) -> DataFrame:
    """Approximate top-k cosine neighbors per query: corpus bucketed by
    nearest centroid; each query probes its ``n_probe`` closest cells;
    exact cosine rerank within the probed cells."""
    centroids = train_centroids(corpus, emb_col, dim, n_cells, iters, seed)

    cb = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(emb_col).alias("c_emb"),
                       nearest_cell(F.col(emb_col), centroids).alias("cell"))

    # query → its n_probe closest cells (rank the k literal distances)
    dists = F.array(*[F.struct(_dist2(F.col(emb_col), centroids[i]).alias("d"),
                               F.lit(i).alias("cell"))
                      for i in range(len(centroids))])
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(emb_col).alias("q_emb"),
                         F.explode(F.slice(F.array_sort(dists), 1, n_probe)).alias("p"))
          .select("query_id", "q_emb", F.col("p.cell").alias("cell")))

    cand = (qb.join(cb, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", F.round(cosine_similarity("q_emb", "c_emb"), 6)))
    return topk_per_group(
        cand.select("query_id", "neighbor_id", "sim").dropDuplicates(
            ["query_id", "neighbor_id"]),
        keys=["query_id"],
        order=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=k)
