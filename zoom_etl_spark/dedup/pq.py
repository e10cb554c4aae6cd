"""IVF-PQ ANN: product-quantized residual codes inside IVF cells
(Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the index family behind FAISS `IVFxx,PQyy`).

Why PQ at 100 TB: IVF alone reranks probed cells against FULL vectors —
the candidate join ships dim×4 bytes per corpus row (256 B at dim=64)
and the rerank does O(dim) arithmetic per pair. PQ replaces the vector
with an m-byte code (m=8 here: 32× smaller shuffle payload) and the
per-pair distance with m table lookups, after a once-per-(query, cell)
lookup-table build. The scan is asymmetric (ADC): queries stay exact,
only the corpus side is quantized — recall loss comes from code
granularity alone, and a final exact rerank of the short list restores
ordering quality.

Spark mapping:
* codebook training: driver-side numpy Lloyd's on a bounded sample of
  cell residuals (sample_rows × dim floats — same bound as IVF's own
  training; nothing data-sized ever reaches the driver),
* corpus encoding: Arrow-batched pandas UDF, codebooks in the closure
  (m × ks × dim/m floats — broadcast-sized),
* ADC scan: ``applyInPandas`` grouped by (query, probed cell) — the
  textbook IVF-PQ layout where one LUT serves every code in the cell;
  group count = |queries| × n_probe, group size = cell occupancy, so
  parallelism scales with the probe fan-out, and no group outlives one
  cell.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StructField, StructType)

from ..functions.vectors import cosine_similarity
from ..operators.windows import topk_per_group
from .ivf import _nearest_cells_udf, nearest_cell, train_centroids


def train_pq_codebooks(corpus: DataFrame, emb_col: str, dim: int,
                       centroids: np.ndarray, m: int = 8, ks: int = 16,
                       iters: int = 8, seed: int = 42,
                       sample_rows: int = 4096) -> np.ndarray:
    """Per-subspace k-means codebooks over CELL RESIDUALS (e − centroid):
    residual magnitudes are far smaller than raw coordinates once the
    coarse quantizer has soaked up cluster structure, so ks codewords per
    subspace buy much finer resolution. Returns (m, ks, dim//m).

    The sample is a driver-bounded ``limit(sample_rows)`` pull; Lloyd's
    runs in numpy on that sample — per subspace the problem is
    (sample_rows × dim/m), trivially driver-sized, and training on a
    sample is the standard PQ recipe (FAISS does exactly this)."""
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    sub = dim // m
    pdf = (corpus.select(F.col(emb_col).alias("e"))
           .limit(sample_rows).toPandas())
    E = np.stack(pdf["e"].to_numpy()).astype(np.float64)      # (n, dim)
    cells = np.argmin(
        ((E[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2), axis=1)
    R = E - centroids[cells]                                   # residuals
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, sub))
    for j in range(m):
        X = R[:, j * sub:(j + 1) * sub]                        # (n, sub)
        C = X[rng.choice(len(X), size=ks, replace=False)]      # k-means++ lite
        for _ in range(iters):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
            for c in range(ks):
                mask = a == c
                if mask.any():
                    C[c] = X[mask].mean(axis=0)
        books[j] = C
    return books


def train_opq_rotation(corpus: DataFrame, emb_col: str, dim: int, m: int = 8,
                       sample_rows: int = 4096) -> np.ndarray:
    """OPQ rotation, parametric/PCA initialization (Ge, He, Ke & Sun,
    "Optimized Product Quantization", CVPR 2013 — the OPQ_P variant):
    rotate into the PCA basis, then assign principal components to the m
    subspaces so each subspace's variance PRODUCT is balanced (greedy on
    log-eigenvalues, largest first). PQ quantizes each subspace with the
    same budget (ks codewords); unrotated, one subspace can carry most of
    the corpus variance and dominate quantization error — the rotation
    spreads variance so every codeword bit works equally hard.

    Driver cost: a bounded sample → dim×dim covariance → one eigh — all
    index-metadata-sized, same bound as centroid training. Returns R
    (dim×dim, orthonormal, applied as x @ R): columns are permuted
    eigenvectors, so rotation preserves L2/cosine exactly — ADC and the
    exact rerank are unchanged in meaning, only error balance shifts."""
    assert dim % m == 0
    sub = dim // m
    pdf = corpus.select(F.col(emb_col).alias("e")).limit(sample_rows).toPandas()
    E = np.stack(pdf["e"].to_numpy()).astype(np.float64)
    C = np.cov(E, rowvar=False)
    vals, vecs = np.linalg.eigh(C)            # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    # greedy balanced assignment: next-largest eigenvalue goes to the
    # non-full subspace with the smallest accumulated log-variance
    logs = np.log(np.maximum(vals, 1e-12))
    load = np.zeros(m)
    fill = np.zeros(m, dtype=int)
    slots: list[list[int]] = [[] for _ in range(m)]
    for i in range(dim):
        j = min((jj for jj in range(m) if fill[jj] < sub),
                key=lambda jj: load[jj])
        slots[j].append(i)
        load[j] += logs[i]
        fill[j] += 1
    perm = [i for s in slots for i in s]
    return vecs[:, perm]


def refine_opq_rotation(corpus: DataFrame, emb_col: str, dim: int,
                        centroids: np.ndarray, m: int = 8, ks: int = 16,
                        n_iter: int = 4, seed: int = 42,
                        sample_rows: int = 4096
                        ) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """Full iterative OPQ (Ge et al. 2013, the non-parametric solution):
    starting from the PCA-initialized rotation, ALTERNATE

      (1) fix R → train per-subspace codebooks on the rotated residuals,
      (2) fix the codes → update R by orthogonal Procrustes
          (R = U·Vᵀ from the SVD of Xᵀ·Y, X raw residuals, Y their
          quantized reconstructions — the orthonormal matrix minimizing
          ‖X·R − Y‖²),

    which is coordinate descent on quantization MSE, so the error is
    non-increasing per round (the property the test gates). All driver
    math is on the bounded sample (n×dim) and dim×dim matrices — the
    same index-metadata budget as every other trainer here. Returns
    (R, codebooks, mse_trace)."""
    pdf = corpus.select(F.col(emb_col).alias("e")).limit(sample_rows).toPandas()
    E = np.stack(pdf["e"].to_numpy()).astype(np.float64)
    cells = np.argmin(
        ((E[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2), axis=1)
    X = E - centroids[cells]                      # raw residuals (fixed)
    R = train_opq_rotation(corpus, emb_col, dim, m, sample_rows)
    sub = dim // m
    rng = np.random.default_rng(seed)
    trace: list[float] = []
    books = None
    for _ in range(n_iter):
        XR = X @ R
        # (1) codebooks on rotated residuals (numpy Lloyd's per subspace)
        # warm-start from the previous round's codebooks: Lloyd's then
        # only ever descends, which is what makes the whole alternation
        # monotone (a fresh random init could hop to a worse local opt)
        prev = books
        books = np.empty((m, ks, sub))
        Y = np.empty_like(XR)
        for j in range(m):
            Z = XR[:, j * sub:(j + 1) * sub]
            C = (prev[j].copy() if prev is not None
                 else Z[rng.choice(len(Z), size=ks, replace=False)])
            for _it in range(8):
                d = ((Z[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                a = np.argmin(d, axis=1)
                for c in range(ks):
                    mask = a == c
                    if mask.any():
                        C[c] = Z[mask].mean(axis=0)
            d = ((Z[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            Y[:, j * sub:(j + 1) * sub] = C[np.argmin(d, axis=1)]
            books[j] = C
        trace.append(float(((XR - Y) ** 2).sum(axis=1).mean()))
        # (2) Procrustes update: argmin_R ||X R - Y||_F, R orthonormal
        U, _s, Vt = np.linalg.svd(X.T @ Y)
        R = U @ Vt
    return R, books, trace


def rotate_embeddings(df: DataFrame, emb_col: str, R: np.ndarray,
                      out_col: str | None = None) -> DataFrame:
    """Apply x @ R to an embedding column (Arrow-batched matmul; R rides
    in the closure — dim×dim, broadcast-sized)."""
    Rm = R.astype(np.float64)

    @pandas_udf(ArrayType(DoubleType()))
    def rot(embs: pd.Series) -> pd.Series:
        E = np.stack(embs.to_numpy()).astype(np.float64)
        return pd.Series(list(E @ Rm))

    return df.withColumn(out_col or emb_col, rot(F.col(emb_col)))


def quantization_mse(corpus: DataFrame, emb_col: str, centroids: np.ndarray,
                     books: np.ndarray, sample_rows: int = 2048) -> float:
    """Mean squared PQ reconstruction error on a bounded sample — the
    index-quality metric OPQ optimizes; used by the OPQ gates and by
    maintenance jobs deciding whether a re-train paid off."""
    m, ks, sub = books.shape
    pdf = corpus.select(F.col(emb_col).alias("e")).limit(sample_rows).toPandas()
    E = np.stack(pdf["e"].to_numpy()).astype(np.float64)
    cells = np.argmin(
        ((E[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2), axis=1)
    R = E - centroids[cells]
    err = 0.0
    for j in range(m):
        X = R[:, j * sub:(j + 1) * sub]
        d = ((X[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        err += d.min(axis=1).sum()
    return err / len(E)


def _encode_udf(centroids: np.ndarray, books: np.ndarray):
    """Arrow UDF: (embedding, cell) → m PQ code ids over the residual."""
    m, ks, sub = books.shape

    @pandas_udf(ArrayType(IntegerType()))
    def encode(embs: pd.Series, cells: pd.Series) -> pd.Series:
        E = np.stack(embs.to_numpy()).astype(np.float64)
        R = E - centroids[cells.to_numpy()]
        codes = np.empty((len(E), m), dtype=np.int32)
        for j in range(m):
            X = R[:, j * sub:(j + 1) * sub]
            d = ((X[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return encode


def encode_corpus(corpus: DataFrame, id_col: str, emb_col: str,
                  centroids: np.ndarray, books: np.ndarray) -> DataFrame:
    """(id, cell, codes): the complete PQ index — m small ints per row in
    place of the dim-float vector. This is the table a 100 TB deployment
    materializes once and shares across every query."""
    cell = nearest_cell(emb_col, centroids)
    enc = _encode_udf(centroids, books)
    return (corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(emb_col).alias("e"),
                          cell.alias("cell"))
            .select("neighbor_id", "cell",
                    enc(F.col("e"), F.col("cell")).alias("codes")))


_ADC_SCHEMA = StructType([
    StructField("query_id", LongType()),
    StructField("neighbor_id", LongType()),
    StructField("adc", DoubleType()),
])


def _adc_scan(centroids: np.ndarray, books: np.ndarray):
    """Grouped ADC kernel: one (query, cell) group builds the LUT once —
    m × ks squared half-distances of the query residual to every codeword
    — then every candidate code in the cell is scored with m gathers.
    LUT cost amortizes over the cell's occupancy; candidate cost is
    independent of dim."""
    m, ks, sub = books.shape

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        q = np.asarray(pdf["q_emb"].iloc[0], dtype=np.float64)
        cell = int(pdf["cell"].iloc[0])
        r = q - centroids[cell]
        lut = np.empty((m, ks))
        for j in range(m):
            diff = books[j] - r[j * sub:(j + 1) * sub][None, :]
            lut[j] = (diff * diff).sum(axis=1)
        codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
        adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
        return pd.DataFrame({"query_id": pdf["query_id"],
                             "neighbor_id": pdf["neighbor_id"],
                             "adc": adc})

    return scan


def ann_topk_ivfpq(corpus: DataFrame, queries: DataFrame, id_col: str,
                   emb_col: str, dim: int, k: int = 10, n_cells: int = 16,
                   n_probe: int = 2, m: int = 8, ks: int = 16,
                   refine: int = 4, iters: int = 3,
                   seed: int = 42, opq: bool = False) -> DataFrame:
    """Approximate top-k cosine neighbors per query, IVF-PQ pipeline:
    coarse cells prune the corpus (n_probe of n_cells searched), ADC over
    PQ codes ranks the probed candidates without touching full vectors,
    and only the top ``k × refine`` shortlist is reranked exactly (the
    single place full embeddings are joined back). Same output contract
    as ``ann_topk_ivf``: (query_id, neighbor_id, sim).

    ``opq=True`` prepends the OPQ rotation (``train_opq_rotation``):
    both sides rotate once up front; rotation is orthonormal so every
    distance/cosine downstream is IDENTICAL in meaning — only the PQ
    error distribution changes (balanced across subspaces)."""
    if opq:
        R = train_opq_rotation(corpus, emb_col, dim, m)
        corpus = rotate_embeddings(corpus, emb_col, R)
        queries = rotate_embeddings(queries, emb_col, R)
    centroids = train_centroids(corpus, emb_col, dim, n_cells, iters, seed)
    books = train_pq_codebooks(corpus, emb_col, dim, centroids, m, ks,
                               seed=seed)

    index = encode_corpus(corpus, id_col, emb_col, centroids, books)

    probe = _nearest_cells_udf(centroids, n_probe)
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(emb_col).alias("q_emb"),
                         F.explode(probe(F.col(emb_col))).alias("cell")))

    cand = (qb.join(index, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id")))
    scored = (cand.select("query_id", "cell", "q_emb", "neighbor_id", "codes")
              .groupBy("query_id", "cell")
              .applyInPandas(_adc_scan(centroids, books), _ADC_SCHEMA))
    shortlist = topk_per_group(
        scored.dropDuplicates(["query_id", "neighbor_id"]),
        keys=["query_id"],
        order=[F.col("adc").asc(), F.col("neighbor_id").asc()],
        k=k * refine)

    # exact rerank of the shortlist only
    full = corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(emb_col).alias("c_emb"))
    qfull = queries.select(F.col(id_col).alias("query_id"),
                           F.col(emb_col).alias("q_emb"))
    exact = (shortlist.join(full, "neighbor_id").join(qfull, "query_id")
             .withColumn("sim", F.round(cosine_similarity("q_emb", "c_emb"), 6)))
    return topk_per_group(
        exact.select("query_id", "neighbor_id", "sim"),
        keys=["query_id"],
        order=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=k)
