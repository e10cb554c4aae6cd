"""Corpus-curation operators a training-data pipeline runs between dedup
and shard-writing (SURVEY §2.12 extensions): PII redaction, percentile
quality filtering, deterministic stratified sampling, token-budget shard
packing, and transitive dedup clustering. All value-hash-gated against
DuckDB — including the iterative connected-components operator, whose
oracle is a recursive-CTE transitive closure.

Generalizes the reference's sanitize/validate projection stage (reference
src/zoom/transform.py:16-38) from per-row hygiene to corpus-level
curation. Hot paths are codegen'd column expressions; the only loop
(connected components) is a bounded label-propagation driver loop whose
per-iteration work is joins — no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..dedup.cluster import connected_components
from ..dedup.ngram import ngram_candidates, ngram_jaccard_pairs, shingled
from ..operators.packing import bucketed_running_sum
from ..registry import query
from .northstar import quality_expr

# PII patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


@query("pii_redact", oracle=rf"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_EMAIL}', '<EMAIL>', 'g'),
           '{_IPV4}', '<IP>', 'g'),
           '{_PHONE}', '<PHONE>', 'g') AS clean,
       CAST(len(regexp_extract_all(text, '{_EMAIL}'))
          + len(regexp_extract_all(text, '{_IPV4}'))
          + len(regexp_extract_all(text, '{_PHONE}')) AS INT) AS n_pii
FROM documents
""")
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / IPv4 / US-style phones → typed tokens) +
    per-doc redaction count — the mandatory hygiene pass before a corpus
    ships to training. Pure regexp_replace/regexp_count codegen; the
    pattern subset is chosen for engine-portable semantics so the oracle
    is value-exact. Redaction behavior on planted PII is unit-tested."""
    d = table(spark, sf_dir, "documents")
    clean = F.col("text")
    n_pii = F.lit(0)
    for pat, tok in ((_EMAIL, "<EMAIL>"), (_IPV4, "<IP>"),
                     (_PHONE, "<PHONE>")):
        clean = F.regexp_replace(clean, pat, tok)
        n_pii = n_pii + F.regexp_count("text", F.lit(pat))
    return d.select("doc_id", clean.alias("clean"),
                    n_pii.cast("int").alias("n_pii"))


@query("quality_filter_pctl", oracle="""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
feats AS (
  SELECT doc_id,
         round(0.5 * least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0)
               + 0.5 * (1.0 - coalesce(
                   CAST(len(list_filter(toks,
                        x -> x IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS DOUBLE)
                   / nullif(len(toks), 0), 1.0)), 4) AS quality
  FROM tok
),
bounds AS (
  SELECT quantile_cont(quality, 0.05) AS lo,
         quantile_cont(quality, 0.95) AS hi
  FROM feats
)
SELECT doc_id, quality
FROM feats, bounds
WHERE quality >= lo AND quality <= hi
""")
def quality_filter_pctl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band quality filter: drop the bottom and top 5% of the
    corpus by quality score (outlier tails: boilerplate spam and
    degenerate short docs). The bounds are a 1-row aggregate broadcast
    into the filter — two passes over a codegen'd projection, no sort.
    Quality is rounded BEFORE the quantile so boundary membership is
    engine-exact (adjacent distinct values differ by ≥ 1e-4, far above
    float error)."""
    d = table(spark, sf_dir, "documents")
    feats = d.select("doc_id", F.round(quality_expr(), 4).alias("quality"))
    bounds = feats.agg(
        F.percentile("quality", F.lit(0.05)).alias("lo"),
        F.percentile("quality", F.lit(0.95)).alias("hi"))
    return (feats.crossJoin(F.broadcast(bounds))
            .filter((F.col("quality") >= F.col("lo"))
                    & (F.col("quality") <= F.col("hi")))
            .select("doc_id", "quality"))


@query("sample_stratified", oracle="""
SELECT doc_id, lang
FROM documents
WHERE (doc_id * 37 + 11) % 100 <
      CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 80 ELSE 50 END
""")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling — rebalance a corpus by
    language (downsample dominant en, upsample rare zh). The arithmetic
    hash on the key makes the sample REPRODUCIBLE and engine-portable
    (the property `df.sampleBy` lacks: its RNG is partition-layout
    dependent); production swaps in xxhash64(doc_id) with the same
    structure. Row-local predicate → full scan parallelism, no shuffle."""
    d = table(spark, sf_dir, "documents")
    rate = (F.when(F.col("lang") == "en", 30)
            .when(F.col("lang") == "zh", 80).otherwise(50))
    return (d.filter(F.pmod(F.col("doc_id") * 37 + 11, F.lit(100)) < rate)
            .select("doc_id", "lang"))


@query("token_budget_pack", oracle="""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT)
           AS n_tok
  FROM documents
)
SELECT doc_id, lang, n_tok,
       CAST(floor(coalesce(sum(n_tok) OVER (
            PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / 1000.0) AS INT) AS shard
FROM t
""")
def token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: assign docs to training shards of
    ~1000 tokens by running token count — the standard pre-tokenization
    sharding step. The running sum is the two-level parallel prefix-sum
    (operators/packing.py): per-(lang, bucket) sums → tiny per-lang
    prefix over buckets → local running sum + bucket offset. Same shard
    ids as a single ``PARTITION BY lang`` window, but each language
    packs with 32-way parallelism instead of serializing through one
    task — the round-2 perf-weak fix, proven by a partitioning test."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    toks = d.select("doc_id", "lang", n_tok.alias("n_tok"))
    packed = bucketed_running_sum(toks, ["lang"], "doc_id", "n_tok",
                                  out_col="_cum")
    return packed.select(
        "doc_id", "lang", "n_tok",
        F.floor(F.col("_cum") / 1000.0).cast("int").alias("shard"))


def _toks() -> F.Column:
    """Whitespace tokens of ``text`` with empties dropped — the shared
    tokenizer of the curation suite (mirrors the oracle's
    ``list_filter(string_split(...))``)."""
    return F.filter(F.split("text", " "), lambda x: x != "")


def word_ngrams(toks: F.Column, n: int) -> F.Column:
    """Space-joined word n-grams of a token array as a codegen'd array
    expression (no explode): transform over the index sequence
    [1, len - n + 1]."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]))


@query("quality_gopher_rules", oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
gr AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1]) AS bigrams,
         list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS trigrams
  FROM tok
),
big AS (
  SELECT doc_id, max(c) AS topc, sum(c) AS total FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, unnest(bigrams) AS g FROM gr) GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT g.doc_id,
       round(CAST(b.topc AS DOUBLE) / b.total, 4) AS top_bigram_frac,
       round(1.0 - CAST(len(list_distinct(g.trigrams)) AS DOUBLE)
             / len(g.trigrams), 4) AS dup_trigram_frac,
       round(CAST(len(array_to_string(g.toks, '')) AS DOUBLE)
             / len(g.toks), 4) AS mean_word_len
FROM gr g JOIN big b USING (doc_id)
""")
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals in the style of the Gopher/
    MassiveText filtering rules: top-bigram fraction (boilerplate
    headers repeat one phrase), duplicate-trigram fraction (spun/looped
    text), and mean word length (OCR noise / non-linguistic content).
    dup-trigram and word-length are pure array expressions (zero
    shuffle); the bigram mode needs a count-per-(doc, gram) which is one
    map-side-combined shuffle keyed by (doc_id, gram) — cardinality
    bounded by total bigrams, skew bounded by the longest document, so
    the plan is insensitive to corpus-level hot phrases. Small-file
    corpora are repartitioned before the CPU-bound n-gram transform
    (a single-partition scan would serialize it through one task; a
    no-op at the scan widths a real corpus has)."""
    d = (table(spark, sf_dir, "documents")
         .repartition(spark.sparkContext.defaultParallelism))
    g = d.select("doc_id", _toks().alias("toks")).select(
        "doc_id", "toks",
        word_ngrams(F.col("toks"), 2).alias("bigrams"),
        word_ngrams(F.col("toks"), 3).alias("trigrams"))
    big = (g.select("doc_id", F.explode("bigrams").alias("g"))
           .groupBy("doc_id", "g").count()
           .groupBy("doc_id").agg(F.max("count").alias("topc"),
                                  F.sum("count").alias("total")))
    return (g.join(big, "doc_id")
            .select(
                "doc_id",
                F.round(F.col("topc").cast("double") / F.col("total"), 4)
                .alias("top_bigram_frac"),
                F.round(F.lit(1.0)
                        - F.size(F.array_distinct("trigrams")).cast("double")
                        / F.size("trigrams"), 4).alias("dup_trigram_frac"),
                F.round(F.length(F.concat_ws("", F.col("toks"))).cast("double")
                        / F.size("toks"), 4).alias("mean_word_len")))


@query("decontaminate_ngram", oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
  FROM tok
),
bench AS (SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id % 20 = 0),
train AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS g
          FROM sh WHERE doc_id % 20 <> 0),
ov AS (
  SELECT t.doc_id, count(*) AS hits
  FROM train t JOIN bench b USING (g) GROUP BY 1
)
SELECT s.doc_id,
       round(coalesce(CAST(ov.hits AS DOUBLE) / len(s.grams), 0.0), 4)
         AS overlap_frac,
       coalesce(CAST(ov.hits AS DOUBLE) / len(s.grams), 0.0) >= 0.5
         AS contaminated
FROM sh s LEFT JOIN ov ON s.doc_id = ov.doc_id
WHERE s.doc_id % 20 <> 0
""")
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents whose distinct
    trigram sets overlap an eval/benchmark set (here: every 20th doc
    stands in for the benchmark) — the pre-training hygiene step that
    keeps test data out of the training corpus. Scale posture: benchmark
    suites are tiny (MBs) next to a 100 TB corpus, so the benchmark gram
    set is BROADCAST and the corpus side never shuffles for the probe —
    left-outer probe → per-doc count combines map-side. Every train doc
    flows through the single aggregation (misses count 0 hits), so
    there is no join back to the corpus.

    Two perf lessons are baked in (measured 9s → 1.3s warm at sf0.1):
    the token array is MATERIALIZED as a column before the n-gram
    transform — passing the raw split/filter expression into the lambda
    re-evaluates the split per element_at (no CSE inside lambda bodies)
    — and the corpus is REPARTITIONED before the CPU-bound shingle pass
    (the lang_id_ngram lesson: a small-file corpus scans as one
    partition, serializing the transform through one task; at 100 TB
    the scan has natural parallelism and the repartition is a no-op to
    remove)."""
    d = (table(spark, sf_dir, "documents")
         .repartition(spark.sparkContext.defaultParallelism))
    sh = (d.select("doc_id", _toks().alias("toks"))
          .select("doc_id",
                  F.array_distinct(word_ngrams(F.col("toks"), 3))
                  .alias("grams")))
    bench = (sh.filter(F.col("doc_id") % 20 == 0)
             .select(F.explode("grams").alias("g")).distinct()
             .withColumn("__hit", F.lit(1)))
    ex = (sh.filter(F.col("doc_id") % 20 != 0)
          .select("doc_id", F.size("grams").alias("n"),
                  F.explode("grams").alias("g")))
    per = (ex.join(F.broadcast(bench), "g", "left")
           .groupBy("doc_id", "n")
           .agg(F.sum(F.coalesce("__hit", F.lit(0))).alias("hits")))
    frac = F.col("hits").cast("double") / F.col("n")
    return per.select("doc_id",
                      F.round(frac, 4).alias("overlap_frac"),
                      (frac >= 0.5).alias("contaminated"))


_PAIRS_SQL = r"""
tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                                      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS grams
  FROM tok
),
ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2
)"""


@query("dedup_clusters", oracle=f"""
WITH RECURSIVE {_PAIRS_SQL},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, least(u, min(v)) AS cluster
FROM reach GROUP BY u
""")
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters over near-dup pairs: pairwise dedup says
    A~B and B~C; the curation decision (one keeper per group) needs the
    connected component {A,B,C}. Min-label propagation (dedup/cluster.py)
    — per-iteration joins, converges in diameter hops (near-dup clusters
    are shallow). The ITERATIVE Spark operator is value-hash-gated
    against a recursive-CTE transitive closure in DuckDB — both sides
    label each clustered doc with its component's min doc_id."""
    d = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text",
                                k=3, threshold=0.2, max_df=50)
    cc = connected_components(pairs.select("id_a", "id_b"))
    return cc.select(F.col("node").alias("doc_id"), "cluster")


@query("mixture_temperature_sample", oracle="""
WITH tok AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
  FROM documents
),
dom AS (SELECT lang, CAST(sum(n_tok) AS DOUBLE) AS tot FROM tok GROUP BY 1),
sh AS (SELECT lang, tot / sum(tot) OVER () AS share FROM dom),
r AS (SELECT lang, pow(share, 0.3) / share AS rate FROM sh),
a AS (SELECT lang, round(rate / max(rate) OVER (), 4) AS accept_rate FROM r)
SELECT t.doc_id, t.lang, a.accept_rate,
       (t.doc_id * 37 + 11) % 10000 < CAST(round(a.accept_rate * 10000) AS INT)
         AS keep
FROM tok t JOIN a USING (lang)
""")
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (the mT5/multilingual-sampling
    recipe): target share ∝ (token share)^α with α=0.3 flattens the
    domain distribution — rare languages are upsampled, dominant ones
    trimmed — without a hand-written target list. Per-domain acceptance
    rate = (targetshare) normalized so the most-upsampled domain keeps
    everything; the per-doc keep decision is the same reproducible
    arithmetic hash as ``sample_stratified``. Plan shape: one
    map-combined groupBy over (lang) → an n_langs-row frame whose
    whole-frame windows are trivial → broadcast join back to the corpus.
    Nothing data-sized shuffles; the corpus side is one scan."""
    from pyspark.sql import Window
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.size(_toks()).alias("n_tok"))
    dom = tok.groupBy("lang").agg(F.sum("n_tok").cast("double").alias("tot"))
    w_all = Window.partitionBy()
    share = F.col("tot") / F.sum("tot").over(w_all)
    rate = F.pow(share, F.lit(0.3)) / share
    a = (dom.select("lang", rate.alias("rate"))
         .select("lang", F.round(F.col("rate") / F.max("rate").over(w_all), 4)
                 .alias("accept_rate")))
    keep = (F.pmod(F.col("doc_id") * 37 + 11, F.lit(10000))
            < F.round(F.col("accept_rate") * 10000).cast("int"))
    return (tok.join(F.broadcast(a), "lang")
            .select("doc_id", "lang", "accept_rate", keep.alias("keep")))


@query("chunk_documents", oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
ch AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
  FROM tok
)
SELECT doc_id,
       CAST(start / 48 AS INT) AS chunk_id,
       array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk,
       CAST(least(len(toks) - start, 64) AS INT) AS n_tok
FROM ch
""")
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 64, stride 48 → 16-token
    overlap): how long documents become training/RAG-sized pieces while
    no boundary sentence is lost to a hard cut. Pure array expressions +
    one explode — a scan-shaped linear fan-out of ~len/stride rows per
    doc, no shuffle anywhere; at 100 TB this pipelines inside the same
    stage as the tokenizer that follows it."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", _toks().alias("toks"))
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(48))
    ch = t.select("doc_id", "toks", F.explode(starts).alias("start"))
    return ch.select(
        "doc_id",
        (F.col("start") / 48).cast("int").alias("chunk_id"),
        F.concat_ws(" ", F.slice("toks", F.col("start") + 1, F.lit(64)))
        .alias("chunk"),
        F.least(F.size("toks") - F.col("start"), F.lit(64)).cast("int")
        .alias("n_tok"))


@query("pipeline_curation_e2e", oracle=r"""
WITH base AS (
  SELECT doc_id, lang, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
keep1 AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h
        FROM base)
  GROUP BY h
),
s1 AS (SELECT b.* FROM base b JOIN keep1 k USING (doc_id)),
feats AS (
  SELECT *,
         round(0.5 * least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0)
               + 0.5 * (1.0 - coalesce(
                   CAST(len(list_filter(toks,
                        x -> x IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS DOUBLE)
                   / nullif(len(toks), 0), 1.0)), 4) AS quality
  FROM s1
),
bounds AS (
  SELECT quantile_cont(quality, 0.05) AS lo,
         quantile_cont(quality, 0.95) AS hi
  FROM feats
),
s2 AS (SELECT f.* FROM feats f, bounds
       WHERE quality >= lo AND quality <= hi),
sh_all AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
  FROM base
),
bench AS (SELECT DISTINCT unnest(grams) AS g FROM sh_all WHERE doc_id % 20 = 0),
tr AS (
  SELECT s.doc_id, len(sh.grams) AS n, unnest(sh.grams) AS g
  FROM s2 s JOIN sh_all sh USING (doc_id)
),
ov AS (
  SELECT tr.doc_id, count(b.g) AS hits, any_value(tr.n) AS n
  FROM tr LEFT JOIN bench b USING (g) GROUP BY tr.doc_id
),
s3 AS (
  SELECT s.* FROM s2 s JOIN ov USING (doc_id)
  WHERE s.doc_id % 20 <> 0 AND CAST(ov.hits AS DOUBLE) / ov.n < 0.5
),
dom AS (SELECT lang, CAST(sum(len(toks)) AS DOUBLE) AS tot FROM s3 GROUP BY 1),
r AS (SELECT lang, pow(share, 0.3) / share AS rate
      FROM (SELECT lang, tot / sum(tot) OVER () AS share FROM dom)),
a AS (SELECT lang, round(rate / max(rate) OVER (), 4) AS accept_rate FROM r),
s4 AS (
  SELECT s.doc_id, s.lang, s.toks FROM s3 s JOIN a USING (lang)
  WHERE (s.doc_id * 37 + 11) % 10000 <
        CAST(round(a.accept_rate * 10000) AS INT)
),
ch AS (SELECT doc_id, lang, toks, unnest(range(0, len(toks), 48)) AS start
       FROM s4)
SELECT doc_id, lang,
       CAST(start / 48 AS INT) AS chunk_id,
       array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk,
       CAST(least(len(toks) - start, 64) AS INT) AS n_tok
FROM ch
""")
def pipeline_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE pre-training curation pipeline as ONE value-hash-gated
    query: exact dedup (min-id keeper per normalized-content hash) →
    percentile quality band over the survivors → benchmark
    decontamination (overlap < 0.5, benchmark docs excluded) →
    temperature-mixture sampling over the surviving token distribution →
    overlapping chunking of what remains. Every stage's semantics are
    the individually-gated operators'; this query proves they COMPOSE —
    each stage's statistics (quality percentiles, domain shares) are
    computed over the previous stage's survivors, exactly as a real
    pipeline run would. Plan: the token array is materialized once and
    carried; stage stats are tiny aggregates broadcast back; the only
    data-sized shuffles are the dedup hash groupBy and the decontam
    per-doc count — both map-side combined."""
    from pyspark.sql import Window
    from ..dedup.exact import normalize_text
    from .northstar import quality_expr
    par = spark.sparkContext.defaultParallelism
    d = table(spark, sf_dir, "documents").repartition(par)
    base = d.select("doc_id", "lang", "text", _toks().alias("toks"))
    # 1. exact dedup
    keep1 = (base.select(F.md5(normalize_text("text")).alias("h"), "doc_id")
             .groupBy("h").agg(F.min("doc_id").alias("doc_id"))
             .select("doc_id"))
    s1 = base.join(keep1, "doc_id").drop("text")
    # 2. quality band over survivors
    feats = s1.withColumn(
        "quality",
        F.round(0.5 * F.least(F.size("toks").cast("double") / 20.0, F.lit(1.0))
                + 0.5 * (1.0 - F.coalesce(
                    F.size(F.filter("toks", lambda x: x.isin(
                        "the", "a", "of", "and", "in", "to"))).cast("double")
                    / F.nullif(F.size("toks"), F.lit(0)), F.lit(1.0))), 4))
    bounds = feats.agg(F.percentile("quality", F.lit(0.05)).alias("lo"),
                       F.percentile("quality", F.lit(0.95)).alias("hi"))
    s2 = (feats.crossJoin(F.broadcast(bounds))
          .filter((F.col("quality") >= F.col("lo"))
                  & (F.col("quality") <= F.col("hi")))
          .select("doc_id", "lang", "toks"))
    # 3. decontamination (benchmark grams from the FULL corpus)
    sh_all = base.select(
        "doc_id", F.array_distinct(word_ngrams(F.col("toks"), 3)).alias("grams"))
    bench = (sh_all.filter(F.col("doc_id") % 20 == 0)
             .select(F.explode("grams").alias("g")).distinct()
             .withColumn("__hit", F.lit(1)))
    tr = (s2.join(sh_all, "doc_id")
          .select("doc_id", F.size("grams").alias("n"),
                  F.explode("grams").alias("g")))
    ov = (tr.join(F.broadcast(bench), "g", "left")
          .groupBy("doc_id", "n")
          .agg(F.sum(F.coalesce("__hit", F.lit(0))).alias("hits")))
    s3 = (s2.join(ov, "doc_id")
          .filter((F.col("doc_id") % 20 != 0)
                  & (F.col("hits").cast("double") / F.col("n") < 0.5))
          .select("doc_id", "lang", "toks"))
    # 4. temperature mixture over the survivors' token distribution
    w_all = Window.partitionBy()
    dom = s3.groupBy("lang").agg(F.sum(F.size("toks")).cast("double").alias("tot"))
    share = F.col("tot") / F.sum("tot").over(w_all)
    rate = F.pow(share, F.lit(0.3)) / share
    a = (dom.select("lang", rate.alias("rate"))
         .select("lang", F.round(F.col("rate") / F.max("rate").over(w_all), 4)
                 .alias("accept_rate")))
    s4 = (s3.join(F.broadcast(a), "lang")
          .filter(F.pmod(F.col("doc_id") * 37 + 11, F.lit(10000))
                  < F.round(F.col("accept_rate") * 10000).cast("int"))
          .select("doc_id", "lang", "toks"))
    # 5. chunk
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(48))
    ch = s4.select("doc_id", "lang", "toks", F.explode(starts).alias("start"))
    return ch.select(
        "doc_id", "lang",
        (F.col("start") / 48).cast("int").alias("chunk_id"),
        F.concat_ws(" ", F.slice("toks", F.col("start") + 1, F.lit(64)))
        .alias("chunk"),
        F.least(F.size("toks") - F.col("start"), F.lit(64)).cast("int")
        .alias("n_tok"))


@query("dedup_levenshtein", oracle=r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                                      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS grams
  FROM tok
),
ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
keep AS (
  SELECT g FROM (SELECT g, count(*) AS df FROM ex GROUP BY 1)
  WHERE df BETWEEN 2 AND 10
),
exk AS (SELECT doc_id, g FROM ex JOIN keep USING (g)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM exk a JOIN exk b ON a.g = b.g AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(levenshtein(da.text, db.text) AS INT) AS dist,
       round(1.0 - levenshtein(da.text, db.text)
             / CAST(greatest(len(da.text), len(db.text)) AS DOUBLE), 4) AS edit_sim
FROM cand
JOIN documents da ON da.doc_id = id_a
JOIN documents db ON db.doc_id = id_b
WHERE levenshtein(da.text, db.text)
      <= 0.2 * greatest(len(da.text), len(db.text))
""")
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup pairs: edit distance ≤ 20% of the longer
    text — catches OCR noise, typo-level mutation, and small insertions
    that token-set Jaccard under-weights (and vice versa: this is the
    character-granularity member of the dedup family, complementing
    ngram/minhash/simhash/embedding). Same two-phase scale shape as
    dedup_ngram_jaccard — candidates only from df-capped shingles, exact
    verification per candidate — but the verifier is ~1000× costlier
    than a set intersection, so every stage tightens: the df cap is 10
    (a near-identical pair shares MANY shingles, so it only needs ONE
    under the cap; only docs duplicated >10× lose pairs — the
    documented boilerplate trade), a rigorous length-band prune
    (dist >= |la-lb|) drops most candidates before any edit-distance
    work, and the Levenshtein itself is BANDED by the cutoff bound
    (threshold arg -> O(min_len x band) with early abort instead of
    O(len^2)). 184s -> ~8s at sf0.1 for identical output; the
    blocking/verify split is the Lee et al. "Deduplicating Training
    Data" recipe with an edit-distance verifier."""
    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    sh = shingled(d.repartition(par), "doc_id", "text", k=3)
    cand = ngram_candidates(sh, max_df=10)
    ta = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"),
                  F.col("n_chars").alias("la"))
    tb = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"),
                  F.col("n_chars").alias("lb"))
    j = cand.join(ta, "id_a").join(tb, "id_b")
    # rigorous prune: dist >= |la - lb|, so a pair failing the length
    # band can never pass the cutoff — drops ~2/3 of candidates before
    # any edit-distance work, provably changing nothing
    j = j.filter(F.abs(F.col("la") - F.col("lb"))
                 <= 0.2 * F.greatest("la", "lb"))
    # the survivor set is BYTES-small but CPU-huge, so AQE coalesces it
    # to a handful of tasks — and a plain repartition can't fix that
    # because Catalyst pushes the edit-distance filter back below the
    # exchange. The localCheckpoint is an optimizer BARRIER: candidates
    # materialize at full width and the Levenshtein stage actually runs
    # 32-wide (the CPU-bound-transform lesson, pushdown-proof form).
    j = j.repartition(par).localCheckpoint(eager=False)
    # banded Levenshtein: a threshold turns O(len_a*len_b) per pair into
    # O(min*k) with early abort (-1 = "exceeds"). The band is PER PAIR —
    # floor(0.2*longest), this pair's own integer cutoff (the SQL form
    # accepts a non-foldable threshold even though the Python helper
    # types it int) — instead of the old global-max scalar, which was
    # ~10x looser for a typical pair and needed a driver-side agg job.
    # Equivalence: dist is an integer, so dist <= 0.2*longest iff
    # dist <= floor(0.2*longest); inside the band the exact distance is
    # returned, outside it -1 (dropped by dist >= 0 exactly as before).
    dist = F.expr("levenshtein(ta, tb, "
                  "cast(floor(0.2 * greatest(length(ta), length(tb))) "
                  "as int))")
    longest = F.greatest(F.length("ta"), F.length("tb"))
    return (j.filter((dist >= 0) & (dist <= 0.2 * longest))
            .select("id_a", "id_b", dist.cast("int").alias("dist"),
                    F.round(1.0 - dist / longest.cast("double"), 4)
                    .alias("edit_sim")))


@query("dedup_incremental", oracle=r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                                      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS grams
  FROM tok
),
exn AS (SELECT doc_id, unnest(grams) AS g FROM sh WHERE doc_id % 10 = 0),
exo AS (SELECT doc_id, unnest(grams) AS g FROM sh WHERE doc_id % 10 <> 0),
sizes AS (SELECT doc_id, len(grams) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS old_id, count(*) AS i
  FROM exn a JOIN exo b ON a.g = b.g GROUP BY 1, 2
),
pairs AS (
  SELECT new_id, old_id,
         round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = new_id
  JOIN sizes sb ON sb.doc_id = old_id
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2
)
SELECT new_id, old_id, jaccard FROM (
  SELECT *, row_number() OVER (PARTITION BY new_id
                               ORDER BY jaccard DESC, old_id) AS rk
  FROM pairs
) WHERE rk = 1
""")
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: each document of the NEW batch (doc_id % 10 =
    0 stands in for today's crawl) is checked against the EXISTING
    corpus only, and reports its best near-dup there (top-1 by exact
    Jaccard, id tiebreak, on the ROUNDED score). The already-deduped
    old corpus is never self-joined again — candidate cost is
    |batch| × avg-df, independent of |corpus|² (see
    dedup/ngram.py::ngram_jaccard_incremental). This is the shape a
    daily pipeline actually runs; the one-shot corpus-wide variant is
    ``dedup_ngram_jaccard``/``dedup_clusters``."""
    from ..dedup.ngram import ngram_jaccard_incremental
    from ..operators.windows import topk_per_group
    d = table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 10 == 0)
    old = d.filter(F.col("doc_id") % 10 != 0)
    pairs = ngram_jaccard_incremental(new, old, "doc_id", "text",
                                      k=3, threshold=0.2, max_df=50)
    return topk_per_group(pairs, keys=["new_id"],
                          order=[F.col("jaccard").desc(),
                                 F.col("old_id").asc()], k=1)


@query("split_leakage_free", oracle=f"""
WITH RECURSIVE {_PAIRS_SQL},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
cc AS (
  SELECT u AS doc_id, least(u, min(v)) AS cluster
  FROM reach GROUP BY u
),
rep AS (
  SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS rep
  FROM documents d LEFT JOIN cc USING (doc_id)
)
SELECT doc_id, rep,
       CASE WHEN (rep * 37 + 11) % 100 < 80 THEN 'train'
            WHEN (rep * 37 + 11) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM rep
""")
def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-FREE train/val/test split (80/10/10): the split decision
    hashes each document's near-dup CLUSTER REPRESENTATIVE (connected
    components over Jaccard pairs; singletons represent themselves), so
    two near-duplicate documents can NEVER land in different splits —
    the eval-hygiene property a naive per-doc hash split silently
    violates (train/test contamination via duplicates is one of the
    classic benchmark bugs). Deterministic arithmetic hash — the split
    is reproducible across runs and engines. Plan: the pair/CC machinery
    is the dedup_clusters plan; the split itself adds one broadcast-
    sized left join + row-local arithmetic."""
    d = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text",
                                k=3, threshold=0.2, max_df=50)
    cc = connected_components(pairs.select("id_a", "id_b"))
    rep = (d.select("doc_id")
           .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
           .select("doc_id",
                   F.coalesce("cluster", "doc_id").alias("rep")))
    h = F.pmod(F.col("rep") * 37 + 11, F.lit(100))
    split = (F.when(h < 80, "train").when(h < 90, "val").otherwise("test"))
    return rep.select("doc_id", "rep", split.alias("split"))


@query("mixture_temperature_alloc", oracle="""
WITH toks AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tok
  FROM documents GROUP BY source
),
scored AS (
  SELECT source, n_tok,
         CAST(floor(sqrt(CAST(n_tok AS DOUBLE))) AS BIGINT) AS score
  FROM toks
),
base AS (
  SELECT source, n_tok, score,
         (10000000 * score) // t.stot AS base_tok,
         (10000000 * score) % t.stot AS rem
  FROM scored CROSS JOIN (SELECT sum(score) AS stot FROM scored) t
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rn,
         10000000 - sum(base_tok) OVER () AS leftover
  FROM base
)
SELECT source, n_tok, score,
       CAST(base_tok + CASE WHEN rn <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_tok
FROM ranked
""")
def mixture_temperature_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain-mixture BUDGET allocation (tau = 0.5):
    the dual of ``mixture_temperature_sample`` — that query flattens by
    per-doc accept/reject (keep-rate can only approximate the target
    mix); this one answers "given a 10M-token budget, how many tokens
    does each source contribute", splitting the budget by the
    LARGEST-REMAINDER method so the per-domain allocations are integers
    that sum to the budget EXACTLY (the invariant shard manifests need).
    tau = 0.5 is deliberate: IEEE sqrt is correctly rounded, so
    floor(sqrt(n)) is bit-identical across engines where a pow(n, 0.7)
    chain would diverge in the last ulp; the remainder distribution is
    pure integer arithmetic (rank by remainder desc, ties by source).
    Plan: one corpus scan -> map-combined groupBy(source) (domain-count
    sized shuffle), then the rank/offset windows run on n_domains rows
    in a single tiny partition — the 100 TB cost is the scan, nothing
    else."""
    from pyspark.sql import Window
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    toks = d.groupBy("source").agg(F.sum(n_tok).alias("n_tok"))
    scored = toks.select(
        "source", "n_tok",
        F.floor(F.sqrt(F.col("n_tok").cast("double"))).alias("score"))
    tot = scored.agg(F.sum("score").alias("stot"))
    base = scored.crossJoin(F.broadcast(tot)).select(
        "source", "n_tok", "score",
        F.expr("(10000000 * score) div stot").alias("base_tok"),
        F.expr("(10000000 * score) % stot").alias("rem"))
    w_rank = Window.orderBy(F.desc("rem"), "source")
    w_all = Window.partitionBy()
    ranked = base.select(
        "source", "n_tok", "score", "base_tok",
        F.row_number().over(w_rank).alias("rn"),
        (F.lit(10000000) - F.sum("base_tok").over(w_all)).alias("leftover"))
    alloc = (F.col("base_tok")
             + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0))
    return ranked.select("source", "n_tok", "score",
                         alloc.cast("bigint").alias("alloc_tok"))


@query("quality_quantile_normalize", oracle="""
WITH tok AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
feats AS (
  SELECT doc_id, source,
         CAST(floor(round(0.5 * least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0)
               + 0.5 * (1.0 - coalesce(
                   CAST(len(list_filter(toks,
                        x -> x IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS DOUBLE)
                   / nullif(len(toks), 0), 1.0)), 4) * 10000 + 0.5)
              AS BIGINT) AS q4
  FROM tok
),
src AS (
  SELECT doc_id, source, q4,
         row_number() OVER (PARTITION BY source ORDER BY q4, doc_id) AS rn,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
  FROM feats
),
docs AS (
  SELECT doc_id, source, q4,
         CASE WHEN ns = 1 THEN 500
              ELSE (2000 * (rn - 1) + (ns - 1)) // (2 * (ns - 1)) END
           AS pr_m
  FROM src
),
cdf AS (
  SELECT q4, CAST(count(*) AS BIGINT) AS cnt FROM feats GROUP BY 1
),
cdfc AS (
  SELECT q4, sum(cnt) OVER (ORDER BY q4) AS cum FROM cdf
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feats),
grid AS (SELECT CAST(range AS BIGINT) AS g FROM range(0, 1001)),
qt AS (
  SELECT grid.g, min(cdfc.q4) AS norm_q4
  FROM grid, nn, cdfc
  WHERE cdfc.cum >= 1 + (2 * grid.g * (nn.n - 1) + 1000) // 2000
  GROUP BY 1
)
SELECT d.doc_id, d.source, d.q4, CAST(d.pr_m AS BIGINT) AS pr_m,
       qt.norm_q4
FROM docs d JOIN qt ON d.pr_m = qt.g
""")
def quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of document quality — the
    cross-source calibration step a mixture pipeline needs before ONE
    quality threshold can mean the same thing for every source (a
    score of 0.6 from a clean source and a noisy one sit at very
    different percentiles; after normalization each doc carries the
    GLOBAL score at its within-source percentile). Construction is
    grid-quantile: quality on its 1e-4 integer lattice (q4, the
    quality_filter_pctl boundedness trick), within-source percent
    rank half-away on the milli-grid over the unique (q4, doc_id)
    order, global nearest-rank quantile table evaluated ONLY at the
    1001 grid points from the value-domain-bounded CDF (<=10001 rows),
    then an equi-join docs.pr_m = grid.g — every division nonnegative
    so Spark div == DuckDB //. Scale: sources are the parallel unit
    for the rank windows (a single giant source would take the
    revenue_gini two-level banding verbatim); the CDF window and the
    grid x CDF min-join are lattice-bounded, never corpus-bounded;
    the only corpus-sized ops are one scan, one groupBy(q4), and one
    broadcast equi-join."""
    d = table(spark, sf_dir, "documents")
    feats = (d.select("doc_id", "source",
                      F.floor(F.round(quality_expr(), 4) * 10000 + 0.5)
                       .cast("long").alias("q4"))
               .localCheckpoint(eager=False))
    ws = Window.partitionBy("source").orderBy("q4", "doc_id")
    wn = Window.partitionBy("source")
    docs = (feats
            .withColumn("rn", F.row_number().over(ws))
            .withColumn("ns", F.count("*").over(wn))
            .select("doc_id", "source", "q4",
                    F.expr("CASE WHEN ns = 1 THEN 500L ELSE "
                           "(2000 * (rn - 1) + (ns - 1)) "
                           "div (2 * (ns - 1)) END").alias("pr_m")))
    cdf = feats.groupBy("q4").agg(F.count("*").alias("cnt"))
    cdfc = cdf.select("q4", F.sum("cnt").over(
        Window.orderBy("q4").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"))
    nn = feats.agg(F.count("*").alias("n"))
    grid = spark.range(0, 1001).select(F.col("id").alias("g"))
    qt = (grid.crossJoin(F.broadcast(nn))
              .join(F.broadcast(cdfc),
                    F.col("cum") >= F.expr(
                        "1 + (2 * g * (n - 1) + 1000) div 2000"))
              .groupBy("g").agg(F.min("q4").alias("norm_q4")))
    return (docs.join(F.broadcast(qt), docs.pr_m == qt.g)
                .select("doc_id", "source", "q4",
                        F.col("pr_m").cast("long").alias("pr_m"),
                        "norm_q4"))


@query("dedup_survivorship", oracle=f"""
WITH RECURSIVE {_PAIRS_SQL},
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
cc AS (
  SELECT u AS doc_id, least(u, min(v)) AS cluster
  FROM reach GROUP BY u
),
mem AS (
  SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS cluster,
         d.lang, d.source, d.n_chars
  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
),
txt AS (
  SELECT cluster, doc_id AS text_doc_id, n_chars AS n_chars_max
  FROM (
    SELECT cluster, doc_id, n_chars,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM mem) WHERE rn = 1
),
lng AS (
  SELECT cluster, lang AS lang_majority FROM (
    SELECT cluster, lang,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY count(*) DESC, lang) AS rn
    FROM mem GROUP BY cluster, lang) WHERE rn = 1
),
agg AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM mem GROUP BY 1
)
SELECT agg.cluster, agg.n_members, agg.n_sources,
       lng.lang_majority, txt.text_doc_id,
       CAST(txt.n_chars_max AS BIGINT) AS n_chars_max
FROM agg JOIN lng USING (cluster) JOIN txt USING (cluster)
""")
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record SURVIVORSHIP over the transitive dedup clusters —
    the MDM step after `dedup_clusters` answers 'which rows are the
    same entity': per cluster (singletons survive as themselves via
    the left join), field-level merge policies pick the canonical
    values — longest-text rule for the content field (max n_chars,
    min doc_id on ties), majority vote for lang (count desc, lexical
    tie-break), plus member/source counts for lineage. Every rule is
    a deterministic total order, so the merged record is engine-exact
    and idempotent under re-runs (the property MDM survivorship
    must have). Plan: the ngram-candidate + CC pipeline of
    dedup_clusters (df-capped candidates, localCheckpointed pairs,
    diameter-bounded iterations), then cluster-keyed windows/
    aggregates — all parallel by cluster, nothing corpus-serial.
    Oracle: the same recursive-CTE closure + window construction."""
    d = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text",
                                k=3, threshold=0.2, max_df=50)
    cc = connected_components(pairs.select("id_a", "id_b"))
    mem = (d.join(cc.select(F.col("node").alias("doc_id"), "cluster"),
                  "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster", "doc_id").alias("cluster"),
                    "lang", "source", "n_chars"))
    wt = Window.partitionBy("cluster").orderBy(F.col("n_chars").desc(),
                                               "doc_id")
    txt = (mem.withColumn("rn", F.row_number().over(wt))
              .filter(F.col("rn") == 1)
              .select("cluster", F.col("doc_id").alias("text_doc_id"),
                      F.col("n_chars").cast("long").alias("n_chars_max")))
    lcnt = mem.groupBy("cluster", "lang").agg(F.count("*").alias("cnt"))
    wl = Window.partitionBy("cluster").orderBy(F.col("cnt").desc(), "lang")
    lng = (lcnt.withColumn("rn", F.row_number().over(wl))
               .filter(F.col("rn") == 1)
               .select("cluster", F.col("lang").alias("lang_majority")))
    agg = mem.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.countDistinct("source").alias("n_sources"))
    return (agg.join(lng, "cluster").join(txt, "cluster")
               .select("cluster", "n_members", "n_sources",
                       "lang_majority", "text_doc_id", "n_chars_max"))


@query("quality_repetition_signals", oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, 1 AS n, unnest(t) AS g FROM toks
  UNION ALL
  SELECT doc_id, 2 AS n,
         unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
            i -> array_to_string(
                   list_slice(t, CAST(i AS INT), CAST(i AS INT) + 1),
                   ' '))) AS g
  FROM toks
),
tf AS (
  SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS tf
  FROM grams GROUP BY 1, 2, 3
),
sig AS (
  SELECT doc_id,
         CAST(max(CASE WHEN n = 1 THEN tf END) AS BIGINT) AS m1,
         CAST(sum(CASE WHEN n = 1 THEN tf ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN n = 1 AND tf >= 2 THEN tf ELSE 0 END)
              AS BIGINT) AS d1,
         CAST(max(CASE WHEN n = 2 THEN tf END) AS BIGINT) AS m2,
         CAST(sum(CASE WHEN n = 2 THEN tf ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN n = 2 AND tf >= 2 THEN tf ELSE 0 END)
              AS BIGINT) AS d2
  FROM tf GROUP BY 1
)
SELECT doc_id, s1 AS n_tokens,
       CAST(1000000 * m1 // s1 AS BIGINT) AS top1_ppm,
       CAST(1000000 * d1 // s1 AS BIGINT) AS dup1_ppm,
       CAST(1000000 * m2 // s2 AS BIGINT) AS top2_ppm,
       CAST(1000000 * d2 // s2 AS BIGINT) AS dup2_ppm,
       (1000000 * m2 // s2 > 110000 OR 1000000 * d2 // s2 > 180000)
         AS is_repetitive
FROM sig WHERE s2 > 0
""")
def quality_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1, restated in token space): top-unigram share, fraction of
    tokens belonging to repeated unigrams, top-bigram share, and the
    duplicate-bigram fraction — the 'lorem lorem lorem' and boilerplate
    loops that length/stopword heuristics (quality_gopher_rules) miss.
    All shares are integer floor-div ppm over exact term frequencies;
    the repetition flag fires on top-bigram share > 11% or duplicate-
    bigram mass > 18% (p99-calibrated on this corpus so the flag is
    non-degenerate but not universal).

    Plan: ONE corpus scan; unigrams and bigrams explode with an n label
    into a single (doc, n, gram) tf groupBy, then per-doc signals are
    conditional aggregates in ONE second groupBy — two corpus-keyed
    shuffles total, no joins, no per-n passes. Bigrams are zip-shifted
    array ops (O(k) per doc). At 100 TB both exchanges are narrowed by
    the doc-id key and map-side combine."""
    from .northstar import _pos_grams
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"))
    g1 = toks.select("doc_id", F.lit(1).alias("n"),
                     F.explode("t").alias("g"))
    g2 = toks.select("doc_id", F.lit(2).alias("n"),
                     F.explode(_pos_grams(F.col("t"), 2)).alias("g"))
    tf = (g1.unionByName(g2)
          .groupBy("doc_id", "n", "g")
          .agg(F.count("*").alias("tf")))
    n1, n2 = F.col("n") == 1, F.col("n") == 2
    rep = F.col("tf") >= 2
    sig = tf.groupBy("doc_id").agg(
        F.max(F.when(n1, F.col("tf"))).alias("m1"),
        F.sum(F.when(n1, F.col("tf")).otherwise(0)).alias("s1"),
        F.sum(F.when(n1 & rep, F.col("tf")).otherwise(0)).alias("d1"),
        F.max(F.when(n2, F.col("tf"))).alias("m2"),
        F.sum(F.when(n2, F.col("tf")).otherwise(0)).alias("s2"),
        F.sum(F.when(n2 & rep, F.col("tf")).otherwise(0)).alias("d2"))
    return (sig.filter(F.col("s2") > 0)
            .select(
                "doc_id", F.col("s1").alias("n_tokens"),
                F.expr("CAST(1000000 * m1 div s1 AS BIGINT)")
                 .alias("top1_ppm"),
                F.expr("CAST(1000000 * d1 div s1 AS BIGINT)")
                 .alias("dup1_ppm"),
                F.expr("CAST(1000000 * m2 div s2 AS BIGINT)")
                 .alias("top2_ppm"),
                F.expr("CAST(1000000 * d2 div s2 AS BIGINT)")
                 .alias("dup2_ppm"),
                F.expr("1000000 * m2 div s2 > 110000 "
                       "OR 1000000 * d2 div s2 > 180000")
                 .alias("is_repetitive")))


@query("corpus_distinct_ngrams", oracle="""
WITH toks AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT source, 1 AS n, unnest(t) AS g FROM toks
  UNION ALL
  SELECT source, 2 AS n,
         unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
            i -> array_to_string(
                   list_slice(t, CAST(i AS INT), CAST(i AS INT) + 1),
                   ' '))) FROM toks
  UNION ALL
  SELECT source, 3 AS n,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
            i -> array_to_string(
                   list_slice(t, CAST(i AS INT), CAST(i AS INT) + 2),
                   ' '))) FROM toks
)
SELECT source, n,
       CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
       CAST(1000000 * count(DISTINCT g) // count(*) AS BIGINT)
         AS distinct_ppm
FROM grams GROUP BY 1, 2
""")
def corpus_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram diversity per source (distinct-n, the corpus-level
    diversity statistic synthetic-data pipelines watch for mode
    collapse: a generator that loops emits the same n-grams and
    distinct-n craters long before eyeballs notice): for n in {1,2,3},
    total vs distinct n-gram counts and their ratio in integer ppm.
    Rising n should raise distinct_ppm sharply in healthy corpora;
    flat curves mean templated text.

    Plan: one scan explodes all three gram sizes with an n label into
    ONE (source, n)-keyed aggregate; the distinct count is per-group
    exact (a 100 TB deployment swaps countDistinct for an HLL sketch
    with the same plan shape — see hll_rollup). Grams are zip-shifted
    array ops; the exchange is map-side combined."""
    from .northstar import _pos_grams
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"))
    frames = [toks.select("source", F.lit(1).alias("n"),
                          F.explode("t").alias("g"))]
    for n in (2, 3):
        frames.append(toks.select(
            "source", F.lit(n).alias("n"),
            F.explode(_pos_grams(F.col("t"), n)).alias("g")))
    grams = frames[0].unionByName(frames[1]).unionByName(frames[2])
    return (grams.groupBy("source", "n")
            .agg(F.count("*").cast("long").alias("total_ngrams"),
                 F.countDistinct("g").cast("long").alias("distinct_ngrams"))
            .select("source", "n", "total_ngrams", "distinct_ngrams",
                    F.expr("CAST(1000000 * distinct_ngrams div "
                           "total_ngrams AS BIGINT)").alias("distinct_ppm")))


def shard_key_cols(id_col):
    """Seeded-md5 shard keying shared by the batch manifest
    (``curation_shard_shuffle``) and its streaming IVM twin
    (``stream_shard_manifest_ivm``) — the correspondence between the
    two manifests is load-bearing, so the seed, prefix widths and
    shard count live HERE only: (shard = 16-bit prefix mod 8 as int,
    hv = 60-bit numeric prefix as long)."""
    h = F.md5(F.concat(F.lit("s42:"), id_col.cast("string")))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 8).cast("int")
    hv = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    return shard, hv


@query("curation_shard_shuffle", oracle="""
WITH h AS (
  SELECT md5('s42:' || CAST(doc_id AS VARCHAR)) AS hsh,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tok
  FROM documents
),
s AS (
  SELECT hsh, n_tok,
         CAST(('0x' || substr(hsh, 1, 4)) AS BIGINT) % 8 AS shard,
         CAST(('0x' || substr(hsh, 1, 15)) AS BIGINT) AS hv
  FROM h
)
SELECT CAST(shard AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       bit_xor(hv) AS checksum,
       min(hv) AS first_hv,
       max(hv) AS last_hv
FROM s
GROUP BY 1
ORDER BY shard
""")
def curation_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard manifest — the reproducible
    pre-training data-ordering step (shuffle the corpus once, write N
    shards, train in shard/hash order). Shard = 16-bit md5 prefix mod 8
    (row-local — the 100 TB shuffle is a plain hash exchange, NEVER a
    global row_number, which would serialize through one task); within a
    shard the read order is the md5 order, so the manifest's first/last
    60-bit hash prefixes pin the boundaries (numeric, not the hex
    string, so every buffer slot is fixed-width and the aggregate stays
    a map-combined HashAggregate — string min/max would demote it to a
    per-partition SortAggregate) and an order-insensitive 60-bit xor
    checksum pins shard MEMBERSHIP (a dropped or duplicated doc flips
    it). Seeded ('s42:') so re-runs and engines agree — the determinism
    the reference's extract-order-dependent loads lack
    (src/zoom/extract.py). Plan: scan -> row-local hash/projection ->
    one 8-group map-combined aggregate; at any scale this is one pass
    over the corpus."""
    d = table(spark, sf_dir, "documents")
    shard, hv = shard_key_cols(F.col("doc_id"))
    s = d.select(
        F.size(_toks()).cast("long").alias("n_tok"),
        shard.alias("shard"), hv.alias("hv"))
    return (s.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens"),
                 F.bit_xor("hv").alias("checksum"),
                 F.min("hv").alias("first_hv"),
                 F.max("hv").alias("last_hv"))
            .orderBy("shard"))


@query("vocab_oov_rate", oracle="""
WITH occ AS (
  SELECT source, tok, count(*) AS c FROM (
    SELECT source,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
    FROM documents)
  GROUP BY 1, 2
),
vocab AS (
  SELECT tok FROM (SELECT tok, sum(c) AS cnt FROM occ GROUP BY 1)
  ORDER BY cnt DESC, tok LIMIT 20
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS BIGINT)
         AS oov_occ,
       CAST(count(DISTINCT CASE WHEN v.tok IS NULL THEN occ.tok END)
            AS BIGINT) AS distinct_oov,
       round(CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS DOUBLE)
             / sum(c), 4) AS oov_rate
FROM occ LEFT JOIN vocab v ON occ.tok = v.tok
GROUP BY source
""")
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / out-of-vocabulary rate per source — the
    tokenizer-fit statistic a training pipeline checks before committing
    a vocab (a source whose OOV rate spikes is about to train badly).
    Vocab = top-20 tokens by global frequency, ties broken by token so
    both engines pick the identical set.

    Plan: occurrences are pre-reduced to (source, token) counts BEFORE
    anything else (one map-combined exchange bounded by
    |sources| x |vocab|, not corpus tokens); the top-K is a sort-limit
    over that tiny frame (TakeOrdered, no window); membership is a
    broadcast left join. At 100 TB the only corpus-sized work is the
    first combine — exactly the floor for an exact count."""
    d = table(spark, sf_dir, "documents")
    occ = (d.select("source", F.explode(_toks()).alias("tok"))
           .groupBy("source", "tok").agg(F.count("*").alias("c")))
    vocab = (occ.groupBy("tok").agg(F.sum("c").alias("cnt"))
             .orderBy(F.desc("cnt"), "tok").limit(20)
             .select("tok", F.lit(1).alias("_inv")))
    j = occ.join(F.broadcast(vocab), "tok", "left")
    oov_c = F.when(F.col("_inv").isNull(), F.col("c")).otherwise(F.lit(0))
    return (j.groupBy("source")
            .agg(F.sum("c").cast("long").alias("n_tokens"),
                 F.sum(oov_c).cast("long").alias("oov_occ"),
                 F.count_distinct(
                     F.when(F.col("_inv").isNull(), F.col("tok")))
                 .cast("long").alias("distinct_oov"))
            .withColumn("oov_rate",
                        F.round(F.col("oov_occ") / F.col("n_tokens"), 4)))
