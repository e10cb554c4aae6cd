"""Exact n-gram Jaccard near-dup pairs via a df-capped inverted index.

The exact counterpart MinHash approximates (SURVEY §2.12). Candidate
generation is an inverted-index self-join: every pair of docs sharing a
shingle meets once per shared shingle. Unguarded, a boilerplate shingle
shared by m docs contributes m(m-1)/2 candidate pairs — quadratic in the
hot shingle's document frequency, fatal at 100 TB (the same degenerate-
bucket failure ``minhash.max_bucket`` guards against).

Two-phase design keeps the cap from touching reported values:

1. **Candidates** come only from shingles with document frequency in
   [2, max_df]. df=1 shingles can't form a pair; df>max_df shingles are
   boilerplate whose pairs the cap deliberately skips. Candidate count is
   bounded by sum over kept shingles of df² ≤ max_df · (total postings)
   — linear in corpus size for fixed max_df.
2. **Verification** joins the full shingle sets back and computes exact
   Jaccard with array_intersect — so every emitted pair's value is exact
   over ALL shingles (capped ones included). The cap affects recall only:
   a pair sharing *nothing but* >max_df boilerplate is skipped, the same
   trade exact-dedup-then-minhash pipelines make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import shingle_hashes


def shingled(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, grams, n): hashed distinct k-token shingles + set size. One
    expensive text→shingle evaluation; callers persist when reused."""
    return (df.select(F.col(id_col).alias("doc"),
                      shingle_hashes(text_col, k).alias("grams"))
            .withColumn("n", F.size("grams")))


def ngram_candidates(sh: DataFrame, max_df: int = 50,
                     threshold: float | None = None) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 shingle with
    document frequency in [2, max_df]. Linear in corpus size for fixed
    max_df (see module docstring).

    With ``threshold`` set, additionally applies PREFIX FILTERING (the
    AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al. 2008),
    LOSSLESS for Jaccard ≥ threshold: order each doc's shingles rarest-
    first (ascending df, hash tiebreak) and emit postings only for the
    first ``n − ceil(t·n) + 1`` of them. Two sets with Jaccard ≥ t
    must overlap within BOTH prefixes under a consistent global order,
    so no qualifying pair is lost — hot shingles sit at the END of the
    order and mostly fall outside prefixes. Measured on the sf0.1
    corpus at t=0.2: candidates 1.13M → 789k, final pairs IDENTICAL.
    OPT-IN because it only pays when per-candidate verification
    dominates (e.g. an edit-distance verifier): the per-doc ranking
    window costs more than a cheap array_intersect verify saves, so
    ``ngram_jaccard_pairs`` leaves it off by default."""
    ex = sh.select("doc", F.explode("grams").alias("g"))
    # document frequency per shingle — partials combine map-side, so the
    # shuffle is bounded by distinct shingles per partition, not postings
    dfreq = ex.groupBy("g").agg(F.count("*").alias("df"))
    keep = (dfreq.filter((F.col("df") >= 2) & (F.col("df") <= max_df))
            .select("g", "df"))
    exr = ex.join(keep, "g")
    if threshold is not None:
        from pyspark.sql import Window
        # rarest-first global order; prefix length over the FULL set
        # size n (kept + capped grams — the bound needs the true n)
        n_full = sh.select("doc", F.col("n").alias("n_full"))
        w = Window.partitionBy("doc").orderBy("df", "g")
        exr = (exr.join(n_full, "doc")
               .withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") <= F.col("n_full")
                       - F.ceil(F.lit(threshold) * F.col("n_full")) + 1)
               .select("doc", "g"))
    else:
        exr = exr.select("doc", "g")
    return (exr.alias("a")
            .join(exr.alias("b"),
                  (F.col("a.g") == F.col("b.g"))
                  & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("id_a"),
                    F.col("b.doc").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))


def ngram_jaccard_incremental(new_df: DataFrame, old_df: DataFrame,
                              id_col: str, text_col: str, k: int = 3,
                              threshold: float = 0.2,
                              max_df: int = 50) -> DataFrame:
    """INCREMENTAL near-dup detection: (new_id, old_id, jaccard) pairs
    between a new batch and the existing corpus — the production shape
    (today's crawl vs the historical index) where old×old pairs were
    already decided and must not be recomputed. Candidates come only
    from new-side × old-side postings of df-capped shingles (df counted
    over the UNION so a gram boilerplate-hot in the old corpus is capped
    even if rare in the batch); verification is exact Jaccard on the
    full sets, same two-phase contract as :func:`ngram_jaccard_pairs`.
    Cost scales with |new| × avg-df, NOT |old|² — the property that
    makes daily dedup against a 100 TB index payable."""
    par = new_df.sparkSession.sparkContext.defaultParallelism
    sh_new = shingled(new_df.repartition(par), id_col, text_col, k).persist()
    sh_old = shingled(old_df.repartition(par), id_col, text_col, k).persist()
    ex_new = sh_new.select("doc", F.explode("grams").alias("g"))
    ex_old = sh_old.select("doc", F.explode("grams").alias("g"))
    df_all = (ex_new.unionByName(ex_old)
              .groupBy("g").agg(F.count("*").alias("df"))
              .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
              .select("g"))
    cand = (ex_new.join(df_all, "g").alias("a")
            .join(ex_old.join(df_all, "g").alias("b"), "g")
            .select(F.col("a.doc").alias("new_id"),
                    F.col("b.doc").alias("old_id"))
            .dropDuplicates(["new_id", "old_id"]))
    pa = sh_new.select(F.col("doc").alias("new_id"),
                       F.col("grams").alias("ga"), F.col("n").alias("na"))
    pb = sh_old.select(F.col("doc").alias("old_id"),
                       F.col("grams").alias("gb"), F.col("n").alias("nb"))
    j = (cand.join(pa, "new_id").join(pb, "old_id")
         .withColumn("i", F.size(F.array_intersect("ga", "gb")).cast("double")))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (j.filter(jac >= threshold)
            .select("new_id", "old_id", F.round(jac, 4).alias("jaccard")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        k: int = 3, threshold: float = 0.2,
                        max_df: int = 50) -> DataFrame:
    """Pairs (id_a, id_b, jaccard) with exact shingle-set Jaccard ≥
    threshold, candidates capped at document frequency max_df.

    The input is repartitioned to full parallelism before the CPU-bound
    shingle pass: a small-file corpus scans as ONE partition, and the
    persist would materialize every shingle set through a single task
    (at real corpus widths the repartition is a cheap rebalance)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = shingled(df.repartition(par), id_col, text_col, k).persist()
    cand = ngram_candidates(sh, max_df)
    pa = sh.select(F.col("doc").alias("id_a"), F.col("grams").alias("ga"),
                   F.col("n").alias("na"))
    pb = sh.select(F.col("doc").alias("id_b"), F.col("grams").alias("gb"),
                   F.col("n").alias("nb"))
    # exact Jaccard on the FULL sets: i from array_intersect, union by
    # inclusion-exclusion — per-pair O(na+nb), pairs are cap-bounded
    j = (cand.join(pa, "id_a").join(pb, "id_b")
         .withColumn("i", F.size(F.array_intersect("ga", "gb")).cast("double")))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (j.filter(jac >= threshold)
            .select("id_a", "id_b", F.round(jac, 4).alias("jaccard")))
