"""Random-hyperplane LSH for cosine ANN over embedding columns.

Bucket = sign bits of the embedding projected onto ``n_planes`` fixed
pseudo-random hyperplanes (deterministic seed → reproducible plans).
ANN search: bucket the corpus once, bucket the queries, equi-join on
bucket id, exact cosine rerank within buckets, top-k per query.

Scale: bucketing is a narrow per-row projection (O(dim·planes));
the join is an equi-join on bucket id → shuffled hash join, linear.
With b planes the corpus splits into ≤2^b buckets; recall is tuned by
probing fewer planes (coarser buckets) or multiple tables. This is the
100 TB path; brute-force cosine (suite ``similarity_topk``) is the
small-side / exactness baseline.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, cosine_similarity_arrow
from ..operators.windows import topk_per_group


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def hyperplane_bucket(emb: Column | str, dim: int, n_planes: int = 12,
                      seed: int = 42) -> Column:
    """Bucket id (long) = packed sign bits of projections onto fixed planes.
    Plane coefficients are literals folded into the plan — no join needed."""
    c = F.col(emb) if isinstance(emb, str) else emb
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        lits = F.array(*[F.lit(float(v)) for v in planes[p]])
        proj = F.aggregate(
            F.zip_with(c, lits, lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket * 2 + F.when(proj >= 0, 1).otherwise(0)
    return bucket


def probe_buckets(emb: Column | str, dim: int, n_planes: int = 12,
                  seed: int = 42, n_flip: int = 2) -> Column:
    """Query-directed multi-probe (Lv et al., VLDB'07): the query's own
    bucket plus the ``n_flip`` buckets reached by flipping the planes with
    the SMALLEST projection margin — the bits most likely to be on the
    wrong side for a true near neighbor. Returns array<long> of 1+n_flip
    bucket ids, computed entirely row-local (plane coefficients are
    constant-folded literals; no extra hash tables, no extra corpus pass).
    """
    c = F.col(emb) if isinstance(emb, str) else emb
    planes = _planes(dim, n_planes, seed)
    projs = F.array(*[
        F.aggregate(
            F.zip_with(c, F.array(*[F.lit(float(v)) for v in planes[p]]),
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        for p in range(n_planes)])
    base = F.aggregate(
        projs, F.lit(0).cast("long"),
        lambda acc, x: acc * 2 + F.when(x >= 0, 1).otherwise(0))
    # plane indices ordered by |margin| ascending (struct sort: m then i)
    order = F.transform(
        F.array_sort(F.transform(
            projs, lambda x, i: F.struct(F.abs(x).alias("m"), i.alias("i")))),
        lambda s: s["i"])
    # mask for plane p: bit (n_planes-1-p) — literal table, element_at 1-based
    masks = F.array(*[F.lit(1 << (n_planes - 1 - p)).cast("long")
                      for p in range(n_planes)])
    flips = F.transform(
        F.slice(order, 1, n_flip),
        lambda i: base.bitwiseXOR(F.element_at(masks, i + 1)))
    return F.concat(F.array(base), flips)


def near_dup_pairs_lsh(df: DataFrame, id_col: str, emb_col: str, dim: int,
                       threshold: float = 0.8, n_planes: int = 8,
                       seed: int = 42, n_flip: int = 2,
                       max_bucket: int = 10000) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cosine ≥ threshold) with
    hyperplane-bucket blocking — the all-pairs twin of ``ann_topk_lsh``
    and the 100 TB replacement for attribute (label) blocking: no
    attribute is hot enough to go quadratic because buckets are sign
    patterns of random projections, and degenerate buckets (e.g. a spike
    of near-identical vectors) are dropped at ``max_bucket`` exactly like
    ``minhash.max_bucket``.

    Multi-probe for pairs: each row joins from its own bucket PLUS its
    ``n_flip`` most marginal Hamming-1 buckets (left side only) against
    base buckets (right side) — a pair split across one marginal plane is
    still found, while the corpus is bucketed once.
    """
    ids = df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb"))
    base = df.select(F.col(id_col).alias("id"),
                     hyperplane_bucket(emb_col, dim, n_planes, seed)
                     .alias("bucket"))
    # skew guard: a degenerate bucket of m rows would emit O(m²) pairs
    sizes = base.groupBy("bucket").agg(F.count("*").alias("bsz"))
    base = (base.join(sizes.filter(F.col("bsz") <= max_bucket), "bucket")
            .drop("bsz"))
    probes = df.select(
        F.col(id_col).alias("id"),
        F.explode(probe_buckets(emb_col, dim, n_planes, seed, n_flip))
        .alias("bucket")) if n_flip > 0 else base
    # candidate payload is (id_a, id_b) ONLY — the embedding arrays do
    # NOT ride the ≤2^n_planes-key bucket join or the pair-dedup
    # shuffle (the minhash payload-trim lesson: carrying both arrays
    # through the join cost a 13-minute single-thread verify stage at
    # 10x); they join back by id after dedup.
    cand = (probes.alias("a")
            .join(base.alias("b"),
                  (F.col("a.bucket") == F.col("b.bucket"))
                  & (F.col("a.id") != F.col("b.id")))
            .select(F.least("a.id", "b.id").alias("id_a"),
                    F.greatest("a.id", "b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    # pin the verify stage's width AFTER the embedding joins — the pair
    # frame's byte size underestimates its per-pair cosine CPU, so AQE
    # would coalesce the stage; pinning before the joins only survives
    # when both joins broadcast, and at scales where `ids` shuffles the
    # joins' own exchanges would re-partition and re-coalesce the data
    par = df.sparkSession.sparkContext.defaultParallelism
    cand = (cand
            .join(ids.select(F.col("id").alias("id_a"),
                             F.col("emb").alias("ea")), "id_a")
            .join(ids.select(F.col("id").alias("id_b"),
                             F.col("emb").alias("eb")), "id_b")
            .repartition(par, "id_a", "id_b"))
    sim = cosine_similarity_arrow(F.col("ea"), F.col("eb"))
    return (cand.withColumn("raw_sim", sim)
            .filter(F.col("raw_sim") >= threshold)
            .select("id_a", "id_b", F.round("raw_sim", 4).alias("sim")))


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame, id_col: str,
                 emb_col: str, dim: int, k: int = 10, n_planes: int = 8,
                 seed: int = 42, n_flip: int = 0) -> DataFrame:
    """Approximate top-k cosine neighbors per query row.

    Returns (query_id, neighbor_id, sim) — neighbors limited to the
    query's probed LSH buckets. ``n_flip=0`` probes only the query's own
    bucket; ``n_flip=t`` adds the t most marginal Hamming-1 buckets
    (query-directed multi-probe), a strict candidate-set superset so
    recall is monotone in t while the corpus is still bucketed ONCE.
    """
    cb = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(emb_col).alias("c_emb"),
                       hyperplane_bucket(emb_col, dim, n_planes, seed).alias("bucket"))
    if n_flip > 0:
        qb = queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
            F.explode(probe_buckets(emb_col, dim, n_planes, seed, n_flip)
                      ).alias("bucket"))
    else:
        qb = queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
            hyperplane_bucket(emb_col, dim, n_planes, seed).alias("bucket"))
    cand = (qb.join(cb, "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", F.round(cosine_similarity("q_emb", "c_emb"), 6)))
    cand = cand.select("query_id", "neighbor_id", "sim")
    if n_flip > 0:  # a neighbor can appear via several probed buckets
        cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    return topk_per_group(
        cand,
        keys=["query_id"],
        order=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        k=k,
    )
