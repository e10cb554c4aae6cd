"""MinHash + LSH near-duplicate detection, pure DataFrame ops.

Pipeline: tokens → k-token shingles → per-seed min of xxhash64 →
band keys → equi-self-join on (band, key) → exact-Jaccard verify.

Scale analysis (the point of banding): candidate generation is an
equi-join on band keys — a plain shuffled hash join, linear in data +
candidate pairs, never O(n²). Skew guard: a degenerate band bucket
(e.g. thousands of identical boilerplate docs) would produce a
quadratic bucket locally; ``max_bucket`` drops buckets above that size
(standard practice — such docs are caught by exact dedup first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .exact import normalize_text


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(normalize_text(c), " "), lambda t: t != "")


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (strings). Docs shorter than k tokens get
    one whole-doc shingle so they still participate.

    Built from k shifted slices zipped together (k slices + k-1 zips per
    row) rather than one slice per position (O(n) slices) — the HOF
    evaluator is interpreted, so constant-factor expression cost matters.
    """
    toks = tokens(col)
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(1))  # shingle count
    out = F.slice(toks, 1, m)
    for j in range(1, k):
        # zip_with pads the shorter array with NULL; concat_ws skips NULLs,
        # which reproduces the short-doc whole-doc shingle behavior
        out = F.zip_with(out, F.slice(toks, 1 + j, m),
                         lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(out)


def shingle_hashes(col: Column | str, k: int = 3) -> Column:
    """64-bit hashes of the k-token shingles — narrow join/compare key
    (collision probability ~n²/2⁶⁴, negligible)."""
    return F.transform(shingles(col, k), lambda s: F.xxhash64(s))


def _salted_hash(seed: int):
    # MUST be a one-parameter lambda: pyspark.sql.functions.transform
    # dispatches on lambda ARITY, so a two-param `lambda h, seed=seed:`
    # would be called as (element, index) and the array INDEX silently
    # replaces the captured seed — collapsing every permutation to the
    # same function (caught by the analytic-bound gate in test_dedup).
    return lambda h: F.xxhash64(F.lit(seed), h)


def minhash_signature(shingle_hash_col: Column, num_perm: int = 32) -> Column:
    """Array of ``num_perm`` min-hashes over pre-hashed shingles. Each
    permutation re-salts the 64-bit shingle hash with the seed index —
    evaluated JVM-side per shingle, no UDF."""
    sigs = [
        F.array_min(F.transform(shingle_hash_col, _salted_hash(seed)))
        for seed in range(num_perm)
    ]
    return F.array(*sigs)


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of matching signature slots — the unbiased MinHash
    estimator of Jaccard similarity. Each slot matches with probability
    exactly J (Broder 1997), so the estimate is Binomial(num_perm, J)/
    num_perm: stderr sqrt(J(1-J)/num_perm). The analytic-bound property
    gate in tests/test_dedup.py holds the implementation to this."""
    eq = F.zip_with(sig_a, sig_b,
                    lambda x, y: (x == y).cast("int"))
    return (F.aggregate(eq, F.lit(0), lambda acc, v: acc + v)
            / F.size(eq))


def band_keys(sig_col: Column, bands: int, rows: int) -> Column:
    """Hash each band's slice of the signature to one 64-bit key.
    Returns array<struct<band:int, key:long>> ready to explode."""
    entries = []
    for b in range(bands):
        parts = [sig_col.getItem(b * rows + r) for r in range(rows)]
        entries.append(F.struct(F.lit(b).alias("band"),
                                F.xxhash64(F.lit(b), *parts).alias("key")))
    return F.array(*entries)


def minhash_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                            k: int = 3, num_perm: int = 32, bands: int = 8,
                            threshold: float = 0.5,
                            max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs (id_a < id_b) with exact Jaccard ≥ threshold.

    Returns (id_a, id_b, jaccard). Banding finds candidates; the exact
    Jaccard on shingle sets (array_intersect/array_union) removes LSH
    false positives.
    """
    rows = num_perm // bands
    # hashed shingles: one expensive text→shingle evaluation (persisted —
    # the banded self-join and the verify step would otherwise re-evaluate
    # it per use), then only 64-bit longs flow through the joins. The
    # input is repartitioned first so a small-file corpus doesn't
    # materialize every shingle set through one task (no-op rebalance at
    # real corpus widths).
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (df.repartition(par)
            .select(F.col(id_col).alias("doc"),
                    shingle_hashes(text_col, k).alias("sh")).persist())
    sig = base.withColumn("sig", minhash_signature(F.col("sh"), num_perm))
    # The banded frame carries ONLY (doc, band, key) — 3 longs/ints per
    # row. Shipping the full shingle arrays through the 8× band explode
    # and the self-join exchange would multiply shuffle width by the
    # document payload; shingle sets are recovered AFTER candidate
    # dedup by re-joining the (id_a, id_b) pairs to `base` on doc id,
    # so the wide payload moves once per candidate doc, not once per
    # (band × bucket-partner).
    banded = (
        sig.select("doc",
                   F.explode(band_keys(F.col("sig"), bands, rows))
                    .alias("bk"))
        .select("doc", F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key"))
    )
    # skew guard: drop degenerate buckets (see module docstring)
    bucket_sizes = banded.groupBy("band", "key").agg(F.count("*").alias("bsz"))
    banded = (banded.join(bucket_sizes.filter(F.col("bsz") <= max_bucket),
                          ["band", "key"], "inner").drop("bsz"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) &
                  (F.col("a.key") == F.col("b.key")) &
                  (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = (cand
             .join(base.select(F.col("doc").alias("id_a"),
                               F.col("sh").alias("sh_a")), "id_a")
             .join(base.select(F.col("doc").alias("id_b"),
                               F.col("sh").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (pairs.withColumn("jaccard", F.round(inter / union, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
