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
2. **Verification** is exact over ALL shingles (capped ones included)
   without re-touching the gram arrays per candidate: the intersection
   splits as i = i_cold + i_hot (every shared shingle has df ≥ 2, so it
   is either kept or hot). i_cold falls out of the pair-dedup aggregate
   the candidate join needs anyway; i_hot is a short-array intersect of
   the per-doc HOT shingle sets (df > max_df — boilerplate, a
   df-bounded tiny array). The cap affects recall only: a pair sharing
   *nothing but* >max_df boilerplate is skipped, the same trade exact-
   dedup-then-minhash pipelines make. (This is the round-6
   ``dedup_containment`` verify-payload trim, promoted to the shared
   library path in round 9 — the full-array ``array_intersect`` per
   candidate dominated every ngram-family query at ~4000 candidates
   per survivor.)
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


def _kept_postings(sh: DataFrame, max_df: int) -> tuple[DataFrame, DataFrame]:
    """(kept postings, document frequencies): postings restricted to
    shingles with df in [2, max_df] plus the full per-shingle df frame
    (callers reuse it for the hot-shingle side of the exact count)."""
    ex = sh.select("doc", F.explode("grams").alias("g"))
    # document frequency per shingle — partials combine map-side, so the
    # shuffle is bounded by distinct shingles per partition, not postings
    dfreq = ex.groupBy("g").agg(F.count("*").alias("df"))
    keep = (dfreq.filter((F.col("df") >= 2) & (F.col("df") <= max_df))
            .select("g", "df"))
    return ex.join(keep, "g"), dfreq


def ngram_candidate_counts(sh: DataFrame, max_df: int = 50) -> DataFrame:
    """Candidate pairs (id_a < id_b, shared ≥1 kept shingle) WITH the
    exact count of shared df-capped shingles: ``i_cold``.

    The pair-dedup aggregate the candidate join needs anyway
    (``groupBy(id_a, id_b)``) counts the shared kept shingles for free —
    so the expensive exact-verify step downstream no longer has to
    re-intersect the full gram arrays per candidate (measured at sf0.1:
    1.13M candidates → ~300 survivors; the per-candidate
    ``array_intersect`` over ~48-element arrays was the dominant cost of
    every ngram-family query). A shared shingle has df ≥ 2 by
    definition, so every shared shingle is either kept (df ≤ max_df,
    counted here) or hot (df > max_df, counted from the tiny per-doc
    hot sets) — ``i = i_cold + i_hot`` is the exact intersection.
    This is the same decomposition ``dedup_containment`` adopted in
    round 6; round 9 moves it into the shared library path."""
    exr, _ = _kept_postings(sh, max_df)
    return _pair_counts(exr.select("doc", "g"))


def _pair_counts(postings: DataFrame) -> DataFrame:
    """(id_a < id_b, i_cold) from a (doc, g) postings frame.

    ONE shuffle of the postings (groupBy g → sorted doc-list, bounded
    by max_df because the caller already dropped df>max_df shingles),
    then pair generation is a codegen'd in-array double transform —
    the assoc_rules/graph_triangles basket idiom — instead of a
    postings⋈postings self-join that shuffles every posting TWICE and
    walks Σdf² join matches through a sort-merge. The pair-dedup
    aggregate that counts each pair's shared postings (i_cold) is
    unchanged; per g the exploded (a<b) pairs are exactly the rows the
    old self-join produced (docs sorted ascending, i<j), so the counts
    are identical."""
    lists = (postings.groupBy("g")
             .agg(F.sort_array(F.collect_list("doc")).alias("ds")))
    pair_arr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x AS id_a, y AS id_b))))")
    return (lists.select(F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.id_a").alias("id_a"),
                     F.col("p.id_b").alias("id_b"))
            .agg(F.count("*").alias("i_cold")))


def hot_shingle_sets(sh: DataFrame, dfreq: DataFrame,
                     max_df: int) -> DataFrame:
    """(doc, hot): each document's shingles with df > max_df — the
    boilerplate vocabulary, a df-bounded tiny array per doc (most docs
    have none and carry no row). Joined back to candidate pairs, a
    short-array intersect completes the exact shared-shingle count."""
    ex = sh.select("doc", F.explode("grams").alias("g"))
    return (ex.join(dfreq.filter(F.col("df") > max_df).select("g"), "g")
            .groupBy("doc").agg(F.collect_set("g").alias("hot")))


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
    exr, _ = _kept_postings(sh, max_df)
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
    return _pair_counts(exr).select("id_a", "id_b")


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
    # df over the UNION (a gram boilerplate-hot in the old corpus is
    # capped even if rare in the batch); a new×old shared gram has one
    # posting on each side, so df ≥ 2 always — i_cold + i_hot is exact
    # (see ngram_candidate_counts)
    df_all = (ex_new.unionByName(ex_old)
              .groupBy("g").agg(F.count("*").alias("df")))
    kept = (df_all.filter((F.col("df") >= 2) & (F.col("df") <= max_df))
            .select("g"))
    hot_g = df_all.filter(F.col("df") > max_df).select("g")
    cold = (ex_new.join(kept, "g").alias("a")
            .join(ex_old.join(kept, "g").alias("b"), "g")
            .groupBy(F.col("a.doc").alias("new_id"),
                     F.col("b.doc").alias("old_id"))
            .agg(F.count("*").alias("i_cold")))
    hot_new = (ex_new.join(hot_g, "g")
               .groupBy("doc").agg(F.collect_set("g").alias("hot")))
    hot_old = (ex_old.join(hot_g, "g")
               .groupBy("doc").agg(F.collect_set("g").alias("hot")))
    pa = sh_new.select(F.col("doc").alias("new_id"), F.col("n").alias("na"))
    pb = sh_old.select(F.col("doc").alias("old_id"), F.col("n").alias("nb"))
    empty = F.array().cast("array<bigint>")
    j = (cold.join(pa, "new_id").join(pb, "old_id")
         .join(hot_new.select(F.col("doc").alias("new_id"),
                              F.col("hot").alias("hot_a")),
               "new_id", "left")
         .join(hot_old.select(F.col("doc").alias("old_id"),
                              F.col("hot").alias("hot_b")),
               "old_id", "left")
         .withColumn("i", (F.col("i_cold") + F.size(F.array_intersect(
             F.coalesce("hot_a", empty),
             F.coalesce("hot_b", empty)))).cast("double")))
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
    # exact Jaccard WITHOUT touching the gram arrays per candidate:
    # i = i_cold (shared kept shingles, counted by the pair-dedup
    # aggregate the candidate join needs anyway) + i_hot (shared
    # boilerplate shingles, from the tiny per-doc hot sets). A shared
    # shingle has df ≥ 2, so the two classes partition the intersection
    # exactly — same statistic as the old full-array array_intersect,
    # same candidate set, ~50× less per-candidate work (candidates
    # outnumber survivors ~4000:1 at sf0.1).
    exr, dfreq = _kept_postings(sh, max_df)
    cold = _pair_counts(exr.select("doc", "g"))
    hot = hot_shingle_sets(sh, dfreq, max_df)
    pa = sh.select(F.col("doc").alias("id_a"), F.col("n").alias("na"))
    pb = sh.select(F.col("doc").alias("id_b"), F.col("n").alias("nb"))
    empty = F.array().cast("array<bigint>")
    j = (cold.join(pa, "id_a").join(pb, "id_b")
         .join(hot.select(F.col("doc").alias("id_a"),
                          F.col("hot").alias("hot_a")), "id_a", "left")
         .join(hot.select(F.col("doc").alias("id_b"),
                          F.col("hot").alias("hot_b")), "id_b", "left")
         .withColumn("i", (F.col("i_cold") + F.size(F.array_intersect(
             F.coalesce("hot_a", empty),
             F.coalesce("hot_b", empty)))).cast("double")))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (j.filter(jac >= threshold)
            .select("id_a", "id_b", F.round(jac, 4).alias("jaccard")))
