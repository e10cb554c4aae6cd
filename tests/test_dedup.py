"""Dedup/similarity behavior on planted near-duplicates (the synthetic
corpus has none, so plant our own)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_etl_spark.dedup.exact import exact_dedup_keys
from zoom_etl_spark.dedup.lsh import ann_topk_lsh
from zoom_etl_spark.dedup.minhash import minhash_candidate_pairs
from zoom_etl_spark.dedup.simhash import hamming_distance, with_simhash

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the late afternoon sun")
NEAR = BASE.replace("lazy", "sleepy")          # one-token edit → near-dup
FAR = ("completely different content about distributed query engines "
       "processing parquet files with vectorized readers at scale")


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, "  The  QUICK brown fox jumps over the lazy dog while the cat "
                                             "watches from the warm windowsill in the late afternoon sun ")],
        "doc_id long, text string")


def test_exact_dedup_normalization(spark):
    out = exact_dedup_keys(_docs(spark), "doc_id", "text")
    groups = {r.keeper_id: r.n_dups for r in out.collect()}
    assert groups[1] == 2          # doc 4 is doc 1 after normalization
    assert groups[2] == 1 and groups[3] == 1


def test_minhash_finds_planted_near_dup(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             minhash_candidate_pairs(_docs(spark), "doc_id", "text",
                                     threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.5   # near-dup found
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0   # exact dup found
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_hamming_separation(spark):
    sh = {r.doc_id: r.simhash for r in
          with_simhash(_docs(spark), "text").collect()}
    df = _docs(spark).sparkSession.createDataFrame(
        [(sh[1], sh[2]), (sh[1], sh[3])], "a long, b long")
    near, far = [r.h for r in df.select(hamming_distance("a", "b").alias("h")).collect()]
    assert near < far
    assert near <= 16 and far > 16


def test_ngram_jaccard_exact_values(spark):
    """Emitted Jaccard is exact over the FULL shingle sets (join-back
    verify), and planted near-dups are found."""
    from zoom_etl_spark.dedup.ngram import ngram_jaccard_pairs
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             ngram_jaccard_pairs(_docs(spark), "doc_id", "text",
                                 threshold=0.2).collect()}
    assert pairs[(1, 4)] == 1.0            # exact dup after normalization
    assert 0.5 <= pairs[(1, 2)] < 1.0      # one-token edit → high Jaccard
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_candidates_linear_under_boilerplate(spark):
    """Adversarial hot-shingle corpus: every doc shares one boilerplate
    trigram. Uncapped, the inverted-index self-join would emit
    m(m-1)/2 ≈ 20k candidate pairs; the df cap must keep candidates to
    exactly the rare-shingle pairs (here: one planted near-dup pair)."""
    from zoom_etl_spark.dedup.ngram import ngram_candidates, shingled
    m = 200
    rows = [(i, f"shared boiler plate unique{i}a unique{i}b unique{i}c")
            for i in range(m)]
    # planted pair sharing rare shingles beyond the boilerplate
    rows += [(1000, "shared boiler plate alpha beta gamma delta epsilon"),
             (1001, "shared boiler plate alpha beta gamma delta zeta")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingled(d, "doc_id", "text").persist()
    cand = ngram_candidates(sh, max_df=50).collect()
    assert {(r.id_a, r.id_b) for r in cand} == {(1000, 1001)}
    sh.unpersist()


def test_ann_ivf_finds_planted_near_dups(spark, sf_dir):
    """IVF twin of the LSH recall test: a perturbed copy lands in the same
    (or a probed) cell and must surface in the top-k."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.dedup.ivf import ann_topk_ivf
    e = table(spark, sf_dir, "embeddings")
    planted = (e.filter(F.col("vec_id") < 20)
               .select((F.col("vec_id") + 100000).alias("vec_id"),
                       F.transform("embedding", lambda x: x + F.lit(0.005)).alias("embedding"),
                       "label"))
    corpus = e.unionByName(planted)
    approx = ann_topk_ivf(corpus, planted, "vec_id", "embedding", dim=64,
                          k=5, n_cells=8, n_probe=2, iters=2)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    hits = sum((100000 + i, i) in a for i in range(20))
    assert hits >= 18   # n_probe=2 covers boundary cases → high recall


def test_lsh_pair_blocking_finds_planted_near_dups(spark, sf_dir):
    """near_dup_pairs_lsh must recover planted perturbed-copy pairs —
    including ones label-blocking would MISS (the plant flips the label,
    so a.label = b.label never pairs them)."""
    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.dedup.lsh import near_dup_pairs_lsh
    e = table(spark, sf_dir, "embeddings")
    planted = (e.filter(F.col("vec_id") < 20)
               .select((F.col("vec_id") + 100000).alias("vec_id"),
                       F.transform("embedding", lambda x: x + F.lit(0.005)).alias("embedding"),
                       F.concat(F.col("label"), F.lit("_flip")).alias("label")))
    corpus = e.unionByName(planted)
    pairs = near_dup_pairs_lsh(corpus, "vec_id", "embedding", dim=64,
                               threshold=0.8, n_planes=6, n_flip=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    hits = sum((i, 100000 + i) in got for i in range(20))
    assert hits >= 16   # ≥80% of planted twins, all cross-label
    # random unrelated vectors are near-orthogonal → no false positives
    assert all(b - a == 100000 for a, b in got)


def test_ann_lsh_finds_planted_near_dups(spark, sf_dir):
    """The LSH use case is near-dup retrieval: a slightly-perturbed copy of
    a vector (cosine ≈ 1) lands in the same bucket w.h.p. and must surface
    in the top-k. (Uniformly random vectors are near-orthogonal — low
    same-bucket probability is expected and not a defect.)"""
    from zoom_etl_spark.catalog import table
    e = table(spark, sf_dir, "embeddings")
    planted = (e.filter(F.col("vec_id") < 20)
               .select((F.col("vec_id") + 100000).alias("vec_id"),
                       F.transform("embedding", lambda x: x + F.lit(0.005)).alias("embedding"),
                       "label"))
    corpus = e.unionByName(planted)
    approx = ann_topk_lsh(corpus, planted, "vec_id", "embedding", dim=64,
                          k=5, n_planes=6)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    hits = sum((100000 + i, i) in a for i in range(20))
    assert hits >= 16   # ≥80% of planted twins retrieved


def _jaccard_pairs_df(spark, set_size=100, replicas=4):
    """Synthetic shingle-hash set pairs with EXACT known Jaccard across a
    spectrum. Pair (target J): A and B share s elements out of set_size
    each, J = s / (2*set_size - s). Disjoint element ranges per replica
    make the salted hashes effectively independent draws."""
    rows = []
    pid = 0
    for rep in range(replicas):
        for tgt in (0.1, 0.2, 0.3, 0.5, 0.7, 0.8, 0.9, 1.0):
            s = round(2 * set_size * tgt / (1 + tgt))
            base = (pid + 1) * 100_000
            a = list(range(base, base + set_size))
            b = a[:s] + list(range(base + 50_000,
                                   base + 50_000 + set_size - s))
            jexact = s / (2 * set_size - s)
            rows.append((pid, a, b, jexact))
            pid += 1
    return spark.createDataFrame(
        rows, "pid long, sh_a array<long>, sh_b array<long>, jexact double")


def test_minhash_estimator_within_analytic_bound(spark):
    """Round-2 VERDICT item 5 gate: |minhash-estimated Jaccard − exact
    Jaccard| stays within the Binomial analytic bound for each num_perm
    config — per-pair 4.5·stderr (+ discreteness floor) and, since the
    estimator is unbiased, a much tighter bound on the MEAN error."""
    import math

    import pytest
    from zoom_etl_spark.dedup.minhash import (estimated_jaccard,
                                              minhash_signature)

    df = _jaccard_pairs_df(spark)
    for num_perm in (32, 64, 128):
        est = df.select(
            "pid", "jexact",
            estimated_jaccard(
                minhash_signature(F.col("sh_a"), num_perm),
                minhash_signature(F.col("sh_b"), num_perm)).alias("jest")
        ).collect()
        errs = []
        for r in est:
            sigma = math.sqrt(r.jexact * (1 - r.jexact) / num_perm)
            bound = 4.5 * sigma + 1.5 / num_perm
            assert abs(r.jest - r.jexact) <= bound, (
                num_perm, r.pid, r.jexact, r.jest, bound)
            if r.jexact == 1.0:   # identical sets: estimator must be exact
                assert r.jest == pytest.approx(1.0)
            errs.append(r.jest - r.jexact)
        # unbiased: mean signed error ~ N(0, sigma_avg/sqrt(P))
        sigma_avg = math.sqrt(0.25 / num_perm)   # worst-case J=0.5
        assert abs(sum(errs) / len(errs)) <= 4 * sigma_avg / math.sqrt(len(errs))


def test_minhash_banding_s_curve(spark):
    """The band/row config's capture probability must follow the LSH
    S-curve p(J) = 1 − (1 − J^rows)^bands: high-J pairs share a band key
    nearly always, low-J pairs nearly never."""
    from zoom_etl_spark.dedup.minhash import band_keys, minhash_signature

    num_perm, bands, rows_per_band = 32, 8, 4
    df = _jaccard_pairs_df(spark, replicas=8)
    cap = df.select(
        "jexact",
        F.arrays_overlap(
            band_keys(minhash_signature(F.col("sh_a"), num_perm),
                      bands, rows_per_band),
            band_keys(minhash_signature(F.col("sh_b"), num_perm),
                      bands, rows_per_band)).alias("hit")
    ).collect()
    hi = [r.hit for r in cap if r.jexact >= 0.79]   # p(0.8) ≈ 0.985
    lo = [r.hit for r in cap if r.jexact <= 0.21]   # p(0.2) ≈ 0.013
    assert sum(hi) / len(hi) >= 0.8, sum(hi) / len(hi)
    assert sum(lo) / len(lo) <= 0.2, sum(lo) / len(lo)


def test_ngram_jaccard_cold_hot_split_matches_full_arrays(spark):
    """The round-9 verify restructure (i = i_cold + i_hot, no full-array
    array_intersect per candidate) must emit the IDENTICAL (pair,
    jaccard) map as the old full-set verify — on a corpus engineered so
    i_hot > 0 (a boilerplate shingle with df > max_df shared by near-dup
    pairs) AND a pair that only passes the threshold WITH its hot
    shingles counted."""
    from zoom_etl_spark.dedup.ngram import (ngram_candidate_counts,
                                            ngram_jaccard_pairs, shingled)
    boiler = "lorem ipsum dolor"          # one trigram shared by ALL docs
    rows = [(i, f"{boiler} filler{i}a filler{i}b filler{i}c")
            for i in range(30)]           # df(boiler-grams) > max_df=20
    # planted near-dup pair: large kept-shingle overlap + the hot grams
    rows += [(100, f"{boiler} alpha beta gamma delta epsilon zeta"),
             (101, f"{boiler} alpha beta gamma delta epsilon eta")]
    # pair that passes the 0.4 threshold ONLY when hot shingles are
    # counted: with the boilerplate i = 3 of 5 union grams (J = 0.6);
    # kept-only i_cold = 2 gives J = 2/(4+4-2) = 0.333 < 0.4 — dropping
    # i_hot would lose the pair, so the threshold assert below
    # exercises the recall property, not just the value map (round-9
    # ADVICE: at 0.2 the pair passed either way)
    rows += [(200, f"{boiler} omega psi chi"),
             (201, f"{boiler} omega psi phi")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    new = {(r.id_a, r.id_b): r.jaccard for r in
           ngram_jaccard_pairs(d, "doc_id", "text", k=3,
                               threshold=0.4, max_df=20).collect()}
    # brute-force reference: the pre-round-9 full-array verify
    sh = shingled(d, "doc_id", "text", 3).persist()
    cand = ngram_candidate_counts(sh, 20).select("id_a", "id_b")
    pa = sh.select(F.col("doc").alias("id_a"),
                   F.col("grams").alias("ga"), F.col("n").alias("na"))
    pb = sh.select(F.col("doc").alias("id_b"),
                   F.col("grams").alias("gb"), F.col("n").alias("nb"))
    j = (cand.join(pa, "id_a").join(pb, "id_b")
         .withColumn("i", F.size(F.array_intersect("ga", "gb"))
                     .cast("double")))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    old = {(r.id_a, r.id_b): r.jaccard for r in
           j.filter(jac >= 0.4)
            .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
            .collect()}
    sh.unpersist()
    assert new == old
    assert (100, 101) in new
    assert (200, 201) in new              # hot shingles counted exactly


def test_prefix_filter_lossless(spark, sf_dir):
    """PPJoin-style prefix filtering (ngram_candidates threshold=) must
    be LOSSLESS for Jaccard >= t: the filtered candidate set, verified
    exactly, yields the IDENTICAL pair set as unfiltered candidates —
    while emitting strictly fewer postings."""
    from zoom_etl_spark.catalog import table as t
    from zoom_etl_spark.dedup.ngram import ngram_candidates, shingled

    d = t(spark, sf_dir, "documents")
    sh = shingled(d.repartition(8), "doc_id", "text", 3).persist()
    plain = ngram_candidates(sh, 50)
    pref = ngram_candidates(sh, 50, threshold=0.2)
    n_plain, n_pref = plain.count(), pref.count()
    assert n_pref <= n_plain

    def verified(cand):
        pa = sh.select(F.col("doc").alias("id_a"),
                       F.col("grams").alias("ga"), F.col("n").alias("na"))
        pb = sh.select(F.col("doc").alias("id_b"),
                       F.col("grams").alias("gb"), F.col("n").alias("nb"))
        j = (cand.join(pa, "id_a").join(pb, "id_b")
             .withColumn("i", F.size(F.array_intersect("ga", "gb"))
                         .cast("double")))
        jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
        return {(r.id_a, r.id_b) for r in j.filter(jac >= 0.2).collect()}

    assert verified(plain) == verified(pref)
    assert len(verified(plain)) > 0
    sh.unpersist()


def test_containment_catches_subset_duplication(spark, sf_dir):
    """Containment's defining property vs Jaccard, replayed in pure
    Python on the real corpus: every reported pair's ppm equals the
    exact set-algebra value, and every pair with max-containment >=
    0.5 is reported (completeness under the df cap — the cap prunes
    candidate GENERATION but verification is exact)."""
    import re as _re

    import pandas as pd

    from zoom_etl_spark.registry import all_queries

    rows = {(r["id_a"], r["id_b"]): r.asDict() for r in
            all_queries()["dedup_containment"].fn(
                spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    grams = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = [x for x in
                _re.sub(r"\s+", " ", text.strip().lower()).split(" ")
                if x]
        n = max(len(toks) - 2, 1)
        grams[int(doc_id)] = {" ".join(toks[i:i + 3])
                              for i in range(n)}
    ids = sorted(grams)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(grams[a] & grams[b])
            if inter == 0:
                continue
            na, nb = len(grams[a]), len(grams[b])
            ppm = max((2 * 1000000 * inter + na) // (2 * na),
                      (2 * 1000000 * inter + nb) // (2 * nb))
            if ppm >= 500000:
                want[(a, b)] = (inter, na, nb, ppm)
    assert set(rows) == set(want)
    for k, (inter, na, nb, ppm) in want.items():
        r = rows[k]
        assert (r["inter"], r["na"], r["nb"], r["containment_ppm"]) == \
            (inter, na, nb, ppm)


def test_simhash_exact_replays(spark, sf_dir):
    """hashlib twin of the portable SimHash: fingerprints, band
    blocking, and the 50-closest pairs recomputed independently."""
    import hashlib
    from collections import Counter

    import pandas as pd

    from zoom_etl_spark.registry import all_queries

    rows = [(r["id_a"], r["id_b"], r["hamming"]) for r in
            all_queries()["dedup_simhash_exact"].fn(
                spark, sf_dir).collect()]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    hs = {}
    sh = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        tf = Counter(x for x in text.split(" ") if x)
        votes = [0] * 32
        for term, c in tf.items():
            h = hs.get(term)
            if h is None:
                h = int(hashlib.md5(term.encode()).hexdigest()[:8], 16)
                hs[term] = h
            for i in range(32):
                votes[i] += c if (h >> i) & 1 else -c
        sh[int(doc_id)] = sum(1 << i for i in range(32) if votes[i] > 0)
    bands = {}
    for doc, s in sh.items():
        for k in range(4):
            bands.setdefault((k, (s >> (8 * k)) & 255), []).append(doc)
    cand = set()
    for docs in bands.values():
        docs.sort()
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                cand.add((a, b))
    scored = sorted(
        ((bin(sh[a] ^ sh[b]).count("1"), a, b) for a, b in cand))
    want = [(a, b, h) for h, a, b in scored[:50]]
    assert rows == want
    assert len(rows) == 50  # band collisions exist at every SF
    # pigeonhole law: any pair with hamming <= 3 MUST be in candidates
    docs = sorted(sh)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            if bin(sh[a] ^ sh[b]).count("1") <= 3:
                assert (a, b) in cand


def test_minhash_exact_replays_and_recalls(spark, sf_dir):
    """hashlib+arithmetic twin of the portable MinHash: signatures,
    banding, cap, and exact-Jaccard verification all recomputed in
    Python; plus the LSH recall property — every pair the EXACT
    trigram Jaccard puts at >= 0.5 must be recovered by the bands
    (at J=0.5, P[band match] = 1-(1-J^2)^4 ~ 0.68 per band pair —
    the test only asserts pairs the bands DID catch are right and
    the returned set equals the replay, i.e. determinism, not
    probabilistic recall)."""
    import hashlib
    import re as _re
    from collections import defaultdict

    import pandas as pd

    from zoom_etl_spark.registry import all_queries

    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           all_queries()["dedup_minhash_exact"].fn(
               spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    P = 1000003
    perms = [(91882, 30399), (788364, 752875), (548488, 577975),
             (459572, 299190), (935457, 71164), (508952, 717495),
             (774858, 842141), (667795, 277165)]
    grams = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = [x for x in
                _re.sub(r"\s+", " ", text.strip().lower()).split(" ")
                if x]
        n = max(len(toks) - 2, 1)
        seen = []
        have = set()
        for i in range(n):
            g = " ".join(toks[i:i + 3])
            if g not in have:
                have.add(g)
                seen.append(g)
        grams[int(doc_id)] = seen
    hcache = {}

    def h32(g):
        if g not in hcache:
            hcache[g] = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
        return hcache[g]

    sig = {}
    for doc, gs in grams.items():
        sig[doc] = [min((a * (h32(g) % P) + b) % P for g in gs)
                    for a, b in perms]
    buckets = defaultdict(list)
    for doc, s in sig.items():
        for k in range(4):
            buckets[(k, s[2 * k], s[2 * k + 1])].append(doc)
    cand = set()
    for docs in buckets.values():
        if len(docs) > 50:
            continue
        docs.sort()
        for i, x in enumerate(docs):
            for y in docs[i + 1:]:
                cand.add((x, y))
    want = {}
    for x, y in cand:
        sx, sy = set(grams[x]), set(grams[y])
        inter = len(sx & sy)
        j = inter / (len(sx) + len(sy) - inter)
        if j >= 0.3:
            want[(x, y)] = round(j, 4)
    assert got == want
    assert len(got) > 0  # the corpus contains real near-dups


def test_rows_only_dedup_twins_are_cross_run_deterministic(spark, sf_dir):
    """Round-7 verdict item 8 (kept after the round-8 oracle promotion
    — determinism is a distinct property from single-run value
    correctness): run each xxhash64 production query twice in the same
    session and assert the full sorted row sets (every column, exact
    values) are identical. xxhash64 is seed-deterministic and the
    plans contain no sampling/time/rand source, so any flake here is a
    real nondeterminism bug (e.g. a float reduce order leaking into an
    emitted value)."""
    from zoom_etl_spark.registry import all_queries

    qs = all_queries()
    for name in ("dedup_minhash", "dedup_simhash"):
        fn = qs[name].fn
        run1 = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        run2 = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        assert run1 == run2, f"{name}: cross-run row-set drift"
        assert len(run1) > 0, f"{name}: empty result can't gate anything"
