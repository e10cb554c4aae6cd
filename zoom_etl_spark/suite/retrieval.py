"""Retrieval / selection operators over the document corpus: BM25
keyword search, weight-proportional priority sampling, global
duplicate-segment removal, and the joint curation-policy calibration
that closes ROADMAP item 5 (thresholds tuned ACROSS filters as one
budget, not per-filter constants).

Generalizes the reference's recording-lookup intent (reference
src/zoom/extract.py:52-64 fetches a meeting's assets by id; the
engine's corpus-scale analog is ranked retrieval) and its fixed-rule
hygiene constants to corpus-calibrated policies.

Engine-exactness stance: ranking keys are either exact-integer-derived
doubles (priority sampling — one IEEE division, no transcendentals) or
ROUNDED scores with explicit id tiebreaks (BM25 — same ln() precedent
as text_tfidf_topk); per-cell policy statistics aggregate 1e-4-grid
integers so cell stats are exact in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .curation import _toks, word_ngrams
from .northstar import quality_expr

_TOKSQL = ("list_filter(string_split(text, ' '), x -> x <> '')")


@query("bm25_search", oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKSQL} AS toks FROM documents
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(len(toks)) AS BIGINT) AS tottok
      FROM tok),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  WHERE term IN ('join', 'stream', 'filter')
  GROUP BY 1, 2
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
             * tf * 2.2
             / (tf + 1.2 * (0.25 + 0.75 * len(tok.toks)
                                   / (tottok / nd)))) AS s
  FROM tf
  JOIN tok ON tok.doc_id = tf.doc_id
  JOIN df USING (term) CROSS JOIN n
  GROUP BY 1
)
SELECT doc_id, round(s, 4) AS bm25
FROM sc ORDER BY round(s, 4) DESC, doc_id LIMIT 10
""")
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson-Spärck Jones) for a fixed
    keyword query over the corpus — top-10 documents by the classic
    tf-saturated, length-normalized score (k1=1.2, b=0.75). The shape
    every search/RAG lexical-recall stage runs.

    Plan: the per-(doc, query-term) tf aggregate filters to the QUERY
    TERMS before grouping (query-sized, not vocabulary-sized — at
    100 TB the posting build is the only corpus-scan shuffle and its
    key domain is |q| terms × docs containing them); df and avgdl are
    term-count-sized and 1-row broadcasts; final ranking is
    TakeOrderedAndProject (top-k heap per partition, no global sort).
    Ranking is on the ROUNDED score with doc_id tiebreak, the
    engine-exactness recipe of text_tfidf_topk."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", _toks().alias("toks"))
    n = tok.agg(F.count("*").cast("double").alias("nd"),
                F.sum(F.size("toks")).cast("bigint").alias("tottok"))
    # dl rides through the tf groupBy as a key (functionally dependent on
    # doc_id) — no corpus-sized join back for document length
    tf = (tok.select("doc_id", F.size("toks").alias("dl"),
                     F.explode("toks").alias("term"))
          .filter(F.col("term").isin("join", "stream", "filter"))
          .groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf")))
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log((F.col("nd") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    score = (idf * F.col("tf") * F.lit(2.2)
             / (F.col("tf") + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * F.col("dl")
                   / (F.col("tottok") / F.col("nd")))))
    sc = (tf.join(F.broadcast(df), "term")
          .crossJoin(F.broadcast(n))
          .groupBy("doc_id").agg(F.sum(score).alias("s")))
    return (sc.select("doc_id", F.round("s", 4).alias("bm25"))
            .orderBy(F.desc("bm25"), "doc_id").limit(10))


@query("sample_weighted", oracle="""
WITH pr AS (
  SELECT doc_id, n_chars,
         n_chars * 1000003.0
           / ((doc_id * 2654435761 + 12345) % 1000003 + 1) AS priority
  FROM documents
)
SELECT doc_id, n_chars, round(priority, 4) AS priority
FROM pr ORDER BY priority DESC, doc_id LIMIT 100
""")
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling via PRIORITY SAMPLING (Duffield,
    Lund & Thorup 2007): each doc gets priority w/u for a uniform u,
    the top-k priorities form a without-replacement sample whose
    inclusion probability is proportional to weight (here: n_chars, the
    'sample long documents more' curation move). The uniform is an
    arithmetic hash of doc_id — reproducible and engine-portable, the
    `sample_stratified` recipe — and the score is ONE exact-integer-fed
    IEEE division: no ln()/pow() in the ranking key, so cross-engine
    determinism needs no rounding tolerance at all (rounding appears
    only in the DISPLAYED priority). Row-local scoring + top-k heap
    (TakeOrderedAndProject): zero shuffles at any scale."""
    d = table(spark, sf_dir, "documents")
    u = F.pmod(F.col("doc_id") * F.lit(2654435761) + F.lit(12345),
               F.lit(1000003)) + 1
    pr = d.select("doc_id", "n_chars",
                  (F.col("n_chars") * F.lit(1000003.0) / u)
                  .alias("priority"))
    return (pr.orderBy(F.desc("priority"), "doc_id").limit(100)
            .select("doc_id", "n_chars",
                    F.round("priority", 4).alias("priority")))


_SEG = 10


@query("dedup_segments_global", oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKSQL} AS toks FROM documents
),
ex AS (
  SELECT doc_id, CAST(start / {_SEG} AS INT) AS idx,
         array_to_string(list_slice(toks, start + 1, start + {_SEG}), ' ') AS s
  FROM (SELECT doc_id, toks, unnest(range(0, len(toks), {_SEG})) AS start
        FROM tok)
),
base AS (SELECT doc_id, count(*) AS n_seg FROM ex GROUP BY 1),
fst AS (
  SELECT doc_id, idx, s,
         row_number() OVER (PARTITION BY s ORDER BY doc_id, idx) AS rk
  FROM ex
),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(s, ' ' ORDER BY idx) AS text_kept
  FROM fst WHERE rk = 1 GROUP BY 1
)
SELECT b.doc_id, CAST(b.n_seg AS INT) AS n_seg,
       CAST(coalesce(k.n_kept, 0) AS INT) AS n_kept,
       coalesce(k.text_kept, '') AS text_kept
FROM base b LEFT JOIN kept k USING (doc_id)
""")
def dedup_segments_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global duplicate-SEGMENT removal (the Lee et al. 2021 /C4
    sub-document dedup granularity): split every document into
    {SEG}-token segments, keep only the globally FIRST occurrence of
    each distinct segment (ordered by doc_id, position), and reassemble
    each document from its surviving segments — boilerplate shared
    across documents disappears from all but one, while whole-doc dedup
    would keep every copy of a page that differs only in its header.

    Plan: segment fan-out is a scan-shaped explode; first-occurrence is
    ONE segment-keyed window (count-distinct-segments cardinality, hot
    segments bounded by the window's single pass — at 100 TB this is
    the same segment-hash shuffle MinHash banding pays); reassembly is
    one doc-keyed aggregate with an in-memory sort of each doc's ≤
    len/{SEG} surviving structs. No join back to the corpus: the
    segment rows carry everything."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", _toks().alias("toks"))
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_SEG))
    ex = (tok.select("doc_id", "toks", F.explode(starts).alias("start"))
          .select("doc_id",
                  (F.col("start") / _SEG).cast("int").alias("idx"),
                  F.concat_ws(" ", F.slice("toks", F.col("start") + 1,
                                           F.lit(_SEG))).alias("s")))
    base = ex.groupBy("doc_id").agg(F.count("*").cast("int").alias("n_seg"))
    w = Window.partitionBy("s").orderBy("doc_id", "idx")
    kept = (ex.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_kept"),
                 F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(F.struct("idx", "s"))),
                     lambda x: x.s)).alias("text_kept")))
    return (base.join(kept, "doc_id", "left")
            .select("doc_id", "n_seg",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("text_kept", F.lit("")).alias("text_kept")))


dedup_segments_global.__doc__ = dedup_segments_global.__doc__.replace(
    "{SEG}", str(_SEG))

_QUALITY_SQL = """
  round(0.5 * least(CAST(len(list_filter(string_split(text, ' '),
                                         x -> x <> '')) AS DOUBLE) / 20.0, 1.0)
        + 0.5 * (1.0 - coalesce(
            CAST(len(list_filter(list_filter(string_split(text, ' '),
                                             x -> x <> ''),
                 x -> x IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS DOUBLE)
            / nullif(len(list_filter(string_split(text, ' '),
                                     x -> x <> '')), 0), 1.0)), 4)"""


@query("curation_joint_calibrate", oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKSQL} AS toks FROM documents
),
sh AS (
  SELECT doc_id, len(toks) AS n_tok,
         list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
  FROM tok
),
bench AS (SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id % 20 = 0),
train AS (SELECT doc_id, len(grams) AS n, unnest(grams) AS g
          FROM sh WHERE doc_id % 20 <> 0),
ov AS (SELECT t.doc_id, count(*) AS hits
       FROM train t JOIN bench b USING (g) GROUP BY 1),
q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents),
docs AS (
  SELECT s.doc_id, s.n_tok, q.quality,
         round(coalesce(CAST(ov.hits AS DOUBLE) / len(s.grams), 0.0), 4) AS o
  FROM sh s JOIN q USING (doc_id)
  LEFT JOIN ov ON s.doc_id = ov.doc_id
  WHERE s.doc_id % 20 <> 0
),
cuts AS (
  SELECT 0.1 AS qp, round(quantile_cont(quality, 0.1), 4) AS cutoff
  FROM docs WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 0.2, round(quantile_cont(quality, 0.2), 4)
  FROM docs WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 0.3, round(quantile_cont(quality, 0.3), 4)
  FROM docs WHERE doc_id % 7 = 0
),
grid AS (
  SELECT CAST(qp AS DOUBLE) AS qp, cutoff, CAST(ovt AS DOUBLE) AS ovt
  FROM cuts, (VALUES (0.05), (0.10), (0.50)) h(ovt)
),
cells AS (
  SELECT qp, ovt, cutoff,
         CAST(sum(CASE WHEN quality >= cutoff AND o < ovt
                       THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
         CAST(sum(CASE WHEN quality >= cutoff AND o < ovt
                       THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
         CAST(sum(CASE WHEN quality >= cutoff AND o < ovt
                       THEN CAST(round(o * 10000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS ovsum,
         count(*) AS total
  FROM docs CROSS JOIN grid GROUP BY 1, 2, 3
),
scored AS (
  SELECT qp, ovt, cutoff, kept_docs, kept_tokens,
         round(ovsum / (10000.0 * kept_docs), 4) AS cont_rate,
         round(kept_docs / (1.0 * total), 4) AS keep_rate,
         coalesce(round(ovsum / (10000.0 * kept_docs), 4) <= 0.05
                  AND round(kept_docs / (1.0 * total), 4) <= 0.75,
                  FALSE) AS feasible
  FROM cells
)
SELECT qp, ovt, cutoff, kept_docs, kept_tokens, cont_rate, keep_rate,
       feasible AND row_number() OVER (
           ORDER BY feasible DESC, kept_tokens DESC, qp, ovt) = 1 AS chosen
FROM scored
""")
def curation_joint_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOINT curation-policy calibration (ROADMAP 5 closed): instead of
    tuning the quality cutoff and the decontamination threshold
    independently, evaluate the 3×3 policy grid (quality-percentile ∈
    {{10,20,30}} × overlap-threshold ∈ {{.05,.10,.50}}) on the corpus
    and pick the cell that MAXIMIZES retained tokens subject to the
    shared budget: mean residual contamination ≤ 5% AND keep-rate ≤
    75%. That is how production pipelines actually set filters —
    retention vs contamination traded as ONE constrained objective, not
    two magic constants (the filters interact: a tight quality cut
    removes contaminated docs too, loosening how strict
    decontamination must be).

    Plan: per-doc (quality, token count, benchmark-overlap) computed
    ONCE — the quality/decontaminate operators' own plans — then a
    9-row broadcast grid × conditional aggregation gives every cell's
    stats in a single map-combined shuffle over the corpus; the argmax
    is a 9-row window. Cell statistics aggregate 1e-4-grid INTEGERS
    (overlap pre-rounded then rescaled), so every cell stat is exact in
    both engines; percentile cutoffs come from the deterministic
    doc_id%7 calibration sample, pre-rounded like
    quality_adaptive_threshold."""
    d = table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    sh = (d.repartition(par)
          .select("doc_id", _toks().alias("toks"))
          .select("doc_id", F.size("toks").alias("n_tok"),
                  F.array_distinct(word_ngrams(F.col("toks"), 3))
                  .alias("grams")))
    bench = (sh.filter(F.col("doc_id") % 20 == 0)
             .select(F.explode("grams").alias("g")).distinct()
             .withColumn("__hit", F.lit(1)))
    train = (sh.filter(F.col("doc_id") % 20 != 0)
             .select("doc_id", "n_tok", F.size("grams").alias("n"),
                     F.explode("grams").alias("g")))
    per = (train.join(F.broadcast(bench), "g", "left")
           .groupBy("doc_id", "n_tok", "n")
           .agg(F.sum(F.coalesce("__hit", F.lit(0))).alias("hits")))
    quality = d.select("doc_id", F.round(quality_expr(), 4).alias("quality"))
    docs = (per.join(quality, "doc_id")
            .select("doc_id", "n_tok", "quality",
                    F.round(F.col("hits").cast("double") / F.col("n"), 4)
                    .alias("o")))
    cal = docs.filter(F.col("doc_id") % 7 == 0)
    cuts1 = cal.agg(
        F.round(F.percentile("quality", F.lit(0.1)), 4).alias("c10"),
        F.round(F.percentile("quality", F.lit(0.2)), 4).alias("c20"),
        F.round(F.percentile("quality", F.lit(0.3)), 4).alias("c30"))
    cuts = cuts1.selectExpr(
        "stack(3, 0.1D, c10, 0.2D, c20, 0.3D, c30) as (qp, cutoff)")
    ovt = spark.createDataFrame([(0.05,), (0.10,), (0.50,)], ["ovt"])
    grid = cuts.crossJoin(ovt)
    keep = (F.col("quality") >= F.col("cutoff")) & (F.col("o") < F.col("ovt"))
    cells = (docs.crossJoin(F.broadcast(grid))
             .groupBy("qp", "ovt", "cutoff")
             .agg(F.sum(F.when(keep, 1).otherwise(0)).alias("kept_docs"),
                  F.sum(F.when(keep, F.col("n_tok")).otherwise(0))
                  .alias("kept_tokens"),
                  F.sum(F.when(keep, F.round(F.col("o") * 10000)
                               .cast("long")).otherwise(0)).alias("ovsum"),
                  F.count("*").alias("total")))
    # empty cells: DuckDB yields NULL on a zero divisor, ANSI Spark
    # errors — try_divide restores the NULL contract
    cont = F.round(F.try_divide(F.col("ovsum"),
                                F.lit(10000.0) * F.col("kept_docs")), 4)
    krate = F.round(F.col("kept_docs") / (F.lit(1.0) * F.col("total")), 4)
    scored = cells.select(
        "qp", "ovt", "cutoff", "kept_docs", "kept_tokens",
        cont.alias("cont_rate"), krate.alias("keep_rate"),
        F.coalesce((cont <= 0.05) & (krate <= 0.75), F.lit(False))
        .alias("feasible"))
    w = Window.orderBy(F.desc("feasible"), F.desc("kept_tokens"),
                       "qp", "ovt")
    return (scored
            .withColumn("chosen",
                        F.col("feasible") & (F.row_number().over(w) == 1))
            .select("qp", "ovt", "cutoff", "kept_docs", "kept_tokens",
                    "cont_rate", "keep_rate", "chosen"))


@query("inverted_index", oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
post AS (
  SELECT term, doc_id
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  GROUP BY 1, 2
)
SELECT term, CAST(count(*) AS INT) AS df,
       list(doc_id ORDER BY doc_id) AS postings
FROM post GROUP BY term
""")
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency + sorted postings
    list — the materialized artifact behind ``bm25_search`` (a real
    deployment writes this partitioned by term-hash and point-reads
    postings at query time, the disk-resident-index play dedup/index.py
    makes for ANN). Postings dedup to (term, doc) BEFORE collecting, so
    the collect_set holds df entries, bounded by docs-containing-term;
    the sorted-array comparison makes the oracle order-exact, not just
    set-equal. One term-keyed shuffle; posting-list skew is the term
    df distribution itself, the thing a production layout shards by."""
    d = table(spark, sf_dir, "documents")
    post = (d.select("doc_id", F.explode(_toks()).alias("term"))
            .groupBy("term", "doc_id").agg(F.lit(1).alias("_"))
            .drop("_"))
    return (post.groupBy("term")
            .agg(F.count("*").cast("int").alias("df"),
                 F.sort_array(F.collect_list("doc_id")).alias("postings")))


@query("pipeline_hybrid_search", oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKSQL} AS toks FROM documents
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(len(toks)) AS BIGINT) AS tottok
      FROM tok),
tf AS (
  SELECT doc_id, len(toks) AS dl, term, count(*) AS tf
  FROM (SELECT doc_id, toks, unnest(toks) AS term FROM tok)
  WHERE term IN ('join', 'stream', 'filter')
  GROUP BY 1, 2, 3
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         round(sum(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
             * tf * 2.2
             / (tf + 1.2 * (0.25 + 0.75 * dl / (tottok / nd)))), 4) AS bm25
  FROM tf JOIN df USING (term) CROSS JOIN n
  GROUP BY 1
),
lex AS (SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT 50),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
rer AS (
  SELECT l.doc_id, l.bm25,
         round(list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) /
         (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
          sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
           AS cos
  FROM lex l JOIN embeddings e ON e.vec_id = l.doc_id CROSS JOIN q
)
SELECT doc_id, bm25, cos
FROM rer ORDER BY cos DESC, doc_id LIMIT 10
""")
def pipeline_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval COMPOSED end to end — the standard two-stage
    search stack: BM25 lexical recall (top-50 candidates from the
    inverted-posting aggregate) followed by dense reranking (cosine to
    the query embedding over candidates only), final top-10 by dense
    score. Candidates without an embedding drop at the rerank join —
    exactly what a production hybrid stack does when the dense index
    lags the lexical one.

    Scale shape: stage 1 is the bm25_search plan (query-term-sized
    aggregate + top-k heap); stage 2 touches ONLY the 50 candidates —
    the embedding table is probed via an equi-join on the candidate ids
    (at 100 TB: a point-lookup against the dedup/index.py layout), and
    the O(dim) cosine runs 50 times, not corpus-times. The expensive
    side of hybrid search stays bounded by the recall budget, never the
    corpus."""
    from ..functions.vectors import cosine_similarity
    d = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    tok = d.select("doc_id", _toks().alias("toks"))
    n = tok.agg(F.count("*").cast("double").alias("nd"),
                F.sum(F.size("toks")).cast("bigint").alias("tottok"))
    tf = (tok.select("doc_id", F.size("toks").alias("dl"),
                     F.explode("toks").alias("term"))
          .filter(F.col("term").isin("join", "stream", "filter"))
          .groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf")))
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log((F.col("nd") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    score = (idf * F.col("tf") * F.lit(2.2)
             / (F.col("tf") + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * F.col("dl")
                   / (F.col("tottok") / F.col("nd")))))
    lex = (tf.join(F.broadcast(df), "term").crossJoin(F.broadcast(n))
           .groupBy("doc_id").agg(F.round(F.sum(score), 4).alias("bm25"))
           .orderBy(F.desc("bm25"), "doc_id").limit(50))
    qv = (emb.filter(F.col("vec_id") == 0)
          .select(F.col("embedding").alias("qe")))
    rer = (F.broadcast(lex)
           .join(emb, lex.doc_id == emb.vec_id)
           .crossJoin(F.broadcast(qv))
           .select("doc_id", "bm25",
                   F.round(cosine_similarity("embedding", "qe"), 4)
                   .alias("cos")))
    return rer.orderBy(F.desc("cos"), "doc_id").limit(10)


_HH_NUM, _HH_DEN = 33, 1000   # heavy-hitter threshold θ = 3.3% of tokens
_HH_K = 64                    # Misra-Gries counters/partition (≥ DEN/NUM ⇒ lossless)


@query("heavy_hitters_terms", oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKSQL} AS toks FROM documents
),
t AS (SELECT unnest(toks) AS term FROM tok),
n AS (SELECT count(*) AS c FROM t)
SELECT term, count(*) AS freq,
       round(CAST(count(*) AS DOUBLE) / (SELECT c FROM n), 6) AS share
FROM t GROUP BY term
HAVING count(*) * {_HH_DEN} >= {_HH_NUM} * (SELECT c FROM n)
""")
def heavy_hitters_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters (terms with ≥3.3% of all token
    occurrences) via the two-pass sketch-then-verify plan — the shape
    that finds frequent terms over a web-scale vocabulary WITHOUT a
    vocabulary-sized shuffle.

    Pass 1: per-partition Misra-Gries summaries (k=64 counters, Arrow
    batches through ``mapInPandas``) emit a candidate set. Losslessness:
    a term with global share ≥ θ has partition share ≥ θ on at least one
    partition (pigeonhole), and MG with k ≥ 1/θ keeps every such term
    (undercount ≤ n_p/(k+1) < θ·n_p), so no true heavy hitter can be
    missed. Pass 2: exact recount of ONLY the candidates (broadcast
    semi-join pre-filter) with an integer-arithmetic threshold — the
    final answer is exact, the sketch only bounds what shuffles.

    Scale: shuffle traffic = candidates (≤ k per partition), never the
    vocabulary; both corpus passes are scan+map only. The threshold
    compare is freq·1000 ≥ 33·N in integers — no float boundary."""
    d = table(spark, sf_dir, "documents")
    terms = d.select(F.explode(_toks()).alias("term"))

    def mg_partition(batches):
        import pandas as pd
        counters: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            for term in pdf["term"]:
                seen += 1
                if term in counters:
                    counters[term] += 1
                elif len(counters) < _HH_K:
                    counters[term] = 1
                else:
                    counters = {t: c - 1 for t, c in counters.items()
                                if c > 1}
        if seen:
            yield pd.DataFrame(
                {"term": list(counters) + [None],
                 "cnt": [0] * len(counters) + [seen]})

    sketch = (terms.mapInPandas(mg_partition, "term string, cnt long")
                   .localCheckpoint(eager=False))
    cand = sketch.filter(F.col("term").isNotNull()).select("term").distinct()
    n = sketch.filter(F.col("term").isNull()).agg(
        F.sum("cnt").alias("c"))
    return (terms.join(F.broadcast(cand), "term")
                 .groupBy("term").agg(F.count("*").alias("freq"))
                 .crossJoin(F.broadcast(n))
                 .filter(F.col("freq") * _HH_DEN >= _HH_NUM * F.col("c"))
                 .select("term", "freq",
                         F.round(F.col("freq").cast("double") / F.col("c"), 6)
                          .alias("share")))


@query("mixture_grid_calibrate", oracle=f"""
WITH tok AS (
  SELECT doc_id, source, len({_TOKSQL}) AS n_tok FROM documents
),
q AS (SELECT doc_id, {_QUALITY_SQL} AS quality FROM documents),
docs AS (
  SELECT t.doc_id, t.source, t.n_tok, q.quality
  FROM tok t JOIN q USING (doc_id)
),
tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tt FROM docs),
cuts AS (
  SELECT 0.1 AS qp, round(quantile_cont(quality, 0.1), 4) AS cutoff
  FROM docs WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 0.3, round(quantile_cont(quality, 0.3), 4)
  FROM docs WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 0.5, round(quantile_cont(quality, 0.5), 4)
  FROM docs WHERE doc_id % 7 = 0
),
grid AS (SELECT CAST(qp AS DOUBLE) AS qp, cutoff, CAST(tau AS DOUBLE) AS tau
         FROM cuts, (VALUES (1.0), (0.5), (0.25)) t(tau)),
src AS (
  SELECT g.qp, g.tau, g.cutoff, d.source, CAST(sum(d.n_tok) AS BIGINT) AS n
  FROM docs d CROSS JOIN grid g
  WHERE d.quality >= g.cutoff
  GROUP BY 1, 2, 3, 4
),
sc AS (
  SELECT *, CASE WHEN tau = 1.0 THEN n
                 WHEN tau = 0.5
                   THEN CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)
                 ELSE CAST(floor(sqrt(floor(sqrt(CAST(n AS DOUBLE)))))
                           AS BIGINT)
            END AS s
  FROM src
),
al AS (
  SELECT *, (10000000 * s) // sum(s) OVER w AS base,
         (10000000 * s) % sum(s) OVER w AS rem
  FROM sc
  WINDOW w AS (PARTITION BY qp, tau)
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY qp, tau
                               ORDER BY rem DESC, source) AS rn,
         10000000 - sum(base) OVER (PARTITION BY qp, tau) AS leftover
  FROM al
),
alloc AS (
  SELECT qp, tau, cutoff, source, n,
         base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS a
  FROM rk
),
cells AS (
  SELECT qp, tau, cutoff,
         CAST(sum(n) AS BIGINT) AS retained_tok,
         CAST(min(a) AS BIGINT) AS min_alloc,
         CAST(max(a) AS BIGINT) AS max_alloc
  FROM alloc GROUP BY 1, 2, 3
),
feas AS (
  SELECT c.*, (2 * c.retained_tok >= t.tt) AS feasible
  FROM cells c CROSS JOIN tot t
)
SELECT qp, tau, cutoff, retained_tok, min_alloc, max_alloc, feasible,
       feasible AND row_number() OVER (
         ORDER BY feasible DESC, max_alloc - min_alloc ASC, qp, tau) = 1
         AS chosen
FROM feas
""")
def mixture_grid_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture TEMPERATURE folded into the calibration grid (ROADMAP
    5's named remainder): evaluate quality-percentile ∈ {10,30,50} ×
    tau ∈ {1, 1/2, 1/4} as ONE policy surface — each cell filters the
    corpus at its quality cutoff, temperature-reweights the surviving
    per-source token masses (s = n^tau), and splits the 10M-token
    budget by the exact largest-remainder allocation of
    `mixture_temperature_alloc` — then pick the FLATTEST feasible
    mixture: among cells retaining ≥ half the corpus tokens, minimize
    the max-min allocation spread (lower tau flattens the mix but a
    tight quality cut can starve a source; the knobs interact, which
    is why they calibrate jointly). The tau grid is {1, 1/2, 1/4}
    deliberately: n^(1/2) and n^(1/4) evaluate as one and two IEEE
    correctly-rounded sqrts (floor(sqrt(floor(sqrt(n)))) ==
    floor(n^(1/4)) on integers), so scores are engine-identical where
    a pow(n, 0.7) chain would drift. Plan: per-doc stats once, a 9-row
    broadcast grid × conditional aggregation in one map-combined
    corpus shuffle, then every window runs on (cells × sources) rows;
    nothing per-row leaves codegen."""
    d = table(spark, sf_dir, "documents")
    docs = d.select("doc_id", "source", F.size(_toks()).alias("n_tok"),
                    F.round(quality_expr(), 4).alias("quality"))
    tot = docs.agg(F.sum("n_tok").cast("long").alias("tt"))
    cal = docs.filter(F.col("doc_id") % 7 == 0)
    cuts1 = cal.agg(
        F.round(F.percentile("quality", F.lit(0.1)), 4).alias("c10"),
        F.round(F.percentile("quality", F.lit(0.3)), 4).alias("c30"),
        F.round(F.percentile("quality", F.lit(0.5)), 4).alias("c50"))
    cuts = cuts1.selectExpr(
        "stack(3, 0.1D, c10, 0.3D, c30, 0.5D, c50) as (qp, cutoff)")
    taus = spark.createDataFrame([(1.0,), (0.5,), (0.25,)], ["tau"])
    grid = cuts.crossJoin(taus)
    src = (docs.crossJoin(F.broadcast(grid))
           .filter(F.col("quality") >= F.col("cutoff"))
           .groupBy("qp", "tau", "cutoff", "source")
           .agg(F.sum("n_tok").cast("long").alias("n")))
    s = (F.when(F.col("tau") == 1.0, F.col("n"))
          .when(F.col("tau") == 0.5,
                F.floor(F.sqrt(F.col("n").cast("double"))))
          .otherwise(F.floor(F.sqrt(
              F.floor(F.sqrt(F.col("n").cast("double"))).cast("double"))))
          .cast("long"))
    w = Window.partitionBy("qp", "tau")
    al = (src.withColumn("s", s)
          .withColumn("stot", F.sum("s").over(w))
          .withColumn("base", F.expr("(10000000 * s) div stot"))
          .withColumn("rem", F.expr("(10000000 * s) % stot")))
    w_rank = (Window.partitionBy("qp", "tau")
              .orderBy(F.desc("rem"), "source"))
    rk = (al.withColumn("rn", F.row_number().over(w_rank))
          .withColumn("leftover", F.lit(10000000) - F.sum("base").over(w)))
    alloc = rk.select(
        "qp", "tau", "cutoff", "source", "n",
        (F.col("base")
         + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0))
        .alias("a"))
    cells = (alloc.groupBy("qp", "tau", "cutoff")
             .agg(F.sum("n").cast("long").alias("retained_tok"),
                  F.min("a").cast("long").alias("min_alloc"),
                  F.max("a").cast("long").alias("max_alloc")))
    feas = (cells.crossJoin(F.broadcast(tot))
            .withColumn("feasible",
                        2 * F.col("retained_tok") >= F.col("tt")))
    w_choose = Window.orderBy(
        F.desc("feasible"), F.col("max_alloc") - F.col("min_alloc"),
        "qp", "tau")
    return (feas
            .withColumn("chosen",
                        F.col("feasible")
                        & (F.row_number().over(w_choose) == 1))
            .select("qp", "tau", "cutoff", "retained_tok", "min_alloc",
                    "max_alloc", "feasible", "chosen"))


_ENTROPY_H = (
    "round((ln(CAST(ntok AS DOUBLE)) "
    "- (CAST(s AS DOUBLE) / 1000000.0) / ntok) * 1000000, 0)"
)


@query("mixture_entropy", oracle=f"""
WITH t AS (
  SELECT source,
         CAST(sum(len({_TOKSQL})) AS BIGINT) AS n
  FROM documents GROUP BY 1
),
q AS (
  SELECT source, n,
         CAST(floor(n * ln(CAST(n AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS term
  FROM t WHERE n > 0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sources,
         CAST(sum(n) AS BIGINT) AS ntok,
         CAST(sum(term) AS BIGINT) AS s
  FROM q
)
SELECT n_sources, ntok AS total_tokens,
       CAST({_ENTROPY_H} AS BIGINT) AS entropy_e6,
       CAST(round(exp({_ENTROPY_H} / 1000000.0) * 1000, 0) AS BIGINT)
         AS effective_sources_e3
FROM m
""")
def mixture_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the corpus's source mixture by TOKEN mass,
    plus the 'effective number of sources' exp(H) — the one-number
    diversity readout a mixture designer watches while reweighting
    (a 20-source corpus where one source holds 90% of tokens has
    ~1.6 effective sources; `mixture_grid_calibrate` raises it).
    Engine-exactness for a log-based statistic WITHOUT float
    accumulation: H = ln N − (Σ nᵢ·ln nᵢ)/N is computed by
    quantizing each per-source term nᵢ·ln nᵢ to INTEGER micro-nats
    first (one ln per source — the quality_unigram_logprob ln-parity
    precedent), so the cross-source sum is an exact integer in both
    engines and no accumulation ORDER can differ; the final H/exp(H)
    are one shared-text IEEE chain over those integers. (Micro-nat
    quantization saturates double precision near nᵢ ~ 1e12 tokens —
    at that scale drop to milli-nats.) Plan: one scan, one
    source-keyed map-combined aggregate, then a sources-sized fold —
    nothing corpus-bounded past the scan."""
    d = table(spark, sf_dir, "documents")
    t = (d.groupBy("source")
          .agg(F.sum(F.size(_toks())).cast("long").alias("n"))
          .filter(F.col("n") > 0))
    q = t.select("source", "n", F.expr(
        "CAST(floor(n * ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) "
        "AS BIGINT)").alias("term"))
    m = q.agg(F.count("*").alias("n_sources"),
              F.sum("n").alias("ntok"),
              F.sum("term").alias("s"))
    return m.select(
        "n_sources", F.col("ntok").alias("total_tokens"),
        F.expr(f"CAST({_ENTROPY_H} AS BIGINT)").alias("entropy_e6"),
        F.expr(f"CAST(round(exp({_ENTROPY_H} / 1000000.0) * 1000, 0) "
               "AS BIGINT)").alias("effective_sources_e3"))


_ZIPF = {
    # x6 and y6 are BOTH micro-scaled, so the slope is unitless (the
    # 1e6 factors cancel); only the intercept de-scales by 1e6
    "slope": "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
             " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)",
    "intercept": "round((CAST(sy AS DOUBLE) / n - ((CAST(n AS DOUBLE) * sxy"
                 " - CAST(sx AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * sxx"
                 " - CAST(sx AS DOUBLE) * sx)) * (CAST(sx AS DOUBLE) / n))"
                 " / 1000000.0, 6)",
    "r2": "round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
          " * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))"
          " / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
          " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)",
}


@query("term_zipf_fit", oracle=f"""
WITH tok AS (
  SELECT unnest({_TOKSQL}) AS term FROM documents
),
tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS freq
  FROM tok GROUP BY 1
),
rk AS (
  SELECT term, freq,
         row_number() OVER (ORDER BY freq DESC, term) AS rank
  FROM tf
),
q AS (
  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS x6,
         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS y6
  FROM rk WHERE rank <= 1000
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x6) AS HUGEINT) AS sx, CAST(sum(y6) AS HUGEINT) AS sy,
         CAST(sum(x6 * y6) AS HUGEINT) AS sxy,
         CAST(sum(x6 * x6) AS HUGEINT) AS sxx,
         CAST(sum(y6 * y6) AS HUGEINT) AS syy
  FROM q
)
SELECT n AS n_terms, {_ZIPF['slope']} AS slope,
       {_ZIPF['intercept']} AS intercept, {_ZIPF['r2']} AS r2
FROM m
""")
def term_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus term-frequency distribution: OLS
    of ln(freq) on ln(rank) over the top 1000 terms — slope ≈ -1 is
    the natural-language signature; a corpus of boilerplate or
    machine-generated spam bends it, making this a corpus-level
    quality fingerprint next to the per-doc gopher rules. Exactness:
    ln(rank)/ln(freq) are quantized to INTEGER micro-units per term
    (one ln per term, the mixture_entropy discipline), so the OLS
    moment sums are exact integers in both engines (no accumulation
    order) and slope/intercept/r² are shared-text IEEE chains over
    them. Scale: term counting is the map-combined vocabulary rollup
    every retrieval query here shares; the rank window runs on the
    vocab-bounded table and the fit on its k=1000 head."""
    d = table(spark, sf_dir, "documents")
    tf = (d.select(F.explode(_toks()).alias("term"))
           .groupBy("term").agg(F.count("*").alias("freq")))
    rk = tf.select("term", "freq", F.row_number().over(
        Window.orderBy(F.col("freq").desc(), "term")).alias("rank"))
    q = (rk.filter(F.col("rank") <= 1000)
           .select(
               F.expr("CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000 "
                      "+ 0.5) AS BIGINT)").alias("x6"),
               F.expr("CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000 "
                      "+ 0.5) AS BIGINT)").alias("y6")))
    m = q.agg(F.count("*").alias("n"),
              F.sum("x6").alias("sx"), F.sum("y6").alias("sy"),
              F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
              F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
              F.sum(F.col("y6") * F.col("y6")).alias("syy"))
    return m.select(F.col("n").alias("n_terms"),
                    F.expr(_ZIPF["slope"]).alias("slope"),
                    F.expr(_ZIPF["intercept"]).alias("intercept"),
                    F.expr(_ZIPF["r2"]).alias("r2"))


_RAKE_STOPS = "('the', 'a', 'of', 'and', 'in', 'to')"


@query("text_keyphrase_rake", oracle=f"""
WITH tk AS (
  SELECT doc_id, unnest({_TOKSQL}) AS tok,
         generate_subscripts({_TOKSQL}, 1) AS pos
  FROM documents
),
fl AS (
  SELECT doc_id, tok, pos,
         CAST(sum(CASE WHEN tok IN {_RAKE_STOPS} THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS run
  FROM tk
),
ph AS (
  SELECT doc_id, run,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS n_words
  FROM fl WHERE tok NOT IN {_RAKE_STOPS}
  GROUP BY 1, 2
),
pw AS (
  SELECT unnest(string_split(phrase, ' ')) AS word, n_words FROM ph
),
ws AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(n_words) AS BIGINT) AS deg
  FROM pw GROUP BY 1
),
w6 AS (
  SELECT word, (2 * 1000000 * deg + freq) // (2 * freq) AS s6 FROM ws
),
dp AS (
  SELECT phrase, CAST(max(n_words) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS phrase_count
  FROM ph GROUP BY 1
),
dpw AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS word FROM dp
),
sc AS (
  SELECT dp.phrase, dp.n_words, dp.phrase_count,
         CAST(sum(w6.s6) AS BIGINT) AS score_e6
  FROM dp JOIN dpw ON dp.phrase = dpw.phrase
          JOIN w6 ON dpw.word = w6.word
  GROUP BY 1, 2, 3
)
SELECT phrase, n_words, phrase_count, score_e6
FROM (
  SELECT *, row_number() OVER (
    ORDER BY score_e6 DESC, phrase_count DESC, phrase) AS rk
  FROM sc
) WHERE rk <= 50
""")
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction at corpus level (Rose et al. 2010):
    candidate phrases are maximal stopword-free token runs, each
    word scores degree/frequency over the phrase cooccurrence graph
    (degree = Σ length of phrases it appears in — favors words that
    keep multi-word company), a phrase scores the sum of its word
    scores, and the corpus's top 50 phrases ship ranked by (score,
    support, lexical) — the unsupervised complement to
    `text_tfidf_topk` (which needs a document focus) and `term_pmi`
    (pairs only). Exactness: word scores are half-away integer
    MICRO-quotients (one exact division per word — the
    mixture_entropy discipline), phrase scores exact integer sums,
    the rank a unique total order. Scale: tokenize/explode is the
    corpus-linear part; word stats and phrase scores are
    vocabulary-/phrase-domain-bounded aggregates, and the run-id
    window partitions per document."""
    d = table(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.posexplode(_toks()).alias("pos0", "tok")) \
          .select("doc_id", F.col("tok"), (F.col("pos0") + 1).alias("pos"))
    stops = ["the", "a", "of", "and", "in", "to"]
    wrun = (Window.partitionBy("doc_id").orderBy("pos")
                  .rowsBetween(Window.unboundedPreceding, 0))
    fl = tk.withColumn(
        "run", F.sum(F.when(F.col("tok").isin(stops), 1).otherwise(0))
                .over(wrun))
    ph = (fl.filter(~F.col("tok").isin(stops))
            .groupBy("doc_id", "run")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", "tok"))),
                         lambda s: s.tok), " ").alias("phrase"),
                 F.count("*").alias("n_words"))
            .localCheckpoint(eager=False))
    pw = ph.select(F.explode(F.split("phrase", " ")).alias("word"),
                   "n_words")
    ws = pw.groupBy("word").agg(F.count("*").alias("freq"),
                                F.sum("n_words").alias("deg"))
    w6 = ws.select("word", F.expr(
        "(2 * 1000000 * deg + freq) div (2 * freq)").alias("s6"))
    dp = ph.groupBy("phrase").agg(F.max("n_words").alias("n_words"),
                                  F.count("*").alias("phrase_count"))
    dpw = dp.select("phrase", F.explode(F.split("phrase", " "))
                    .alias("word"))
    sc = (dp.join(dpw, "phrase").join(w6, "word")
            .groupBy("phrase", "n_words", "phrase_count")
            .agg(F.sum("s6").alias("score_e6")))
    rk = sc.withColumn("rk", F.row_number().over(
        Window.orderBy(F.col("score_e6").desc(),
                       F.col("phrase_count").desc(), "phrase")))
    return (rk.filter(F.col("rk") <= 50)
              .select("phrase", "n_words", "phrase_count", "score_e6"))


# 1e9-scaled inverse log2(i+1) discounts for positions 1..10 —
# precomputed Python literals (the dq_benford discipline: neither
# engine ever evaluates the log)
_NDCG_DISC_E9 = [round(1e9 / math.log2(i + 1)) for i in range(1, 11)]
_NDCG_TERMS = "'join', 'stream', 'filter'"


@query("search_ndcg", oracle=f"""
WITH tok AS (
  SELECT doc_id, {_TOKSQL} AS toks FROM documents
),
rel AS (
  SELECT doc_id, toks,
         CAST(len(list_intersect(toks, [{_NDCG_TERMS}])) AS BIGINT) AS rel
  FROM tok
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(len(toks)) AS BIGINT) AS tottok
      FROM tok),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  WHERE term IN ({_NDCG_TERMS})
  GROUP BY 1, 2
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
             * tf * 2.2
             / (tf + 1.2 * (0.25 + 0.75 * len(tok.toks)
                                   / (tottok / nd)))) AS s
  FROM tf
  JOIN tok ON tok.doc_id = tf.doc_id
  JOIN df USING (term) CROSS JOIN n
  GROUP BY 1
),
top AS (
  SELECT sc.doc_id, rel.rel,
         row_number() OVER (ORDER BY round(s, 4) DESC, sc.doc_id) AS pos
  FROM sc JOIN rel ON rel.doc_id = sc.doc_id
  ORDER BY round(s, 4) DESC, sc.doc_id LIMIT 10
),
disc AS (
  SELECT CAST(range + 1 AS BIGINT) AS pos,
         CAST(([{','.join(str(d) for d in _NDCG_DISC_E9)}])[range + 1]
              AS BIGINT) AS disc_e9
  FROM range(0, 10)
),
dcg AS (
  SELECT CAST(sum(CAST((1 << rel) - 1 AS BIGINT) * disc_e9) AS BIGINT)
           AS dcg_e9
  FROM top JOIN disc USING (pos)
),
gc AS (SELECT rel, CAST(count(*) AS BIGINT) AS c FROM rel GROUP BY 1),
cnt AS (
  SELECT CAST(coalesce(sum(CASE WHEN rel = 3 THEN c END), 0) AS BIGINT)
           AS c3,
         CAST(coalesce(sum(CASE WHEN rel = 2 THEN c END), 0) AS BIGINT)
           AS c2,
         CAST(coalesce(sum(CASE WHEN rel = 1 THEN c END), 0) AS BIGINT)
           AS c1
  FROM gc
),
ideal AS (
  SELECT disc.pos, disc.disc_e9,
         CAST(CASE WHEN disc.pos <= c3 THEN 7
              WHEN disc.pos <= c3 + c2 THEN 3
              WHEN disc.pos <= c3 + c2 + c1 THEN 1
              ELSE 0 END AS BIGINT) AS gain
  FROM disc, cnt
),
idcg AS (
  SELECT CAST(sum(gain * disc_e9) AS BIGINT) AS idcg_e9 FROM ideal
)
SELECT dcg_e9, idcg_e9,
       CAST((2 * 1000000 * dcg_e9 + idcg_e9) // (2 * idcg_e9) AS BIGINT)
         AS ndcg_ppm
FROM dcg, idcg
""")
def search_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking against a deterministic graded
    relevance (grade = number of distinct query terms the document
    contains, gain = 2^rel − 1) — the ranking-quality readout every
    search/RAG evaluation harness computes over its lexical-recall
    stage. Engine-exact log-free form: the position discounts
    1/log2(i+1) enter as ten precomputed 1e9-scaled integer literals
    (the dq_benford discipline), so DCG and ideal DCG are exact
    integer dot products; the ideal ranking needs NO sort — relevance
    grades are 0..3, so IDCG falls out of the four GRADE COUNTS via
    CASE over positions 1..10; ndcg_ppm is half-away integer ppm.
    Plan: the BM25 posting build is the only corpus shuffle
    (query-term-keyed, as in bm25_search), the top-10 is
    TakeOrderedAndProject, grade counts are one 4-cell aggregate."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", _toks().alias("toks"))
    tok = tok.localCheckpoint(eager=False)
    terms = ["join", "stream", "filter"]
    rel = tok.select(
        "doc_id",
        F.size(F.array_intersect(
            "toks", F.array(*[F.lit(t) for t in terms]))).cast("long")
         .alias("rel"))
    rel = rel.localCheckpoint(eager=False)
    n = tok.agg(F.count("*").cast("double").alias("nd"),
                F.sum(F.size("toks")).cast("bigint").alias("tottok"))
    tf = (tok.select("doc_id", F.explode("toks").alias("term"))
          .filter(F.col("term").isin(terms))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    sc = (tf.join(tok, "doc_id").join(F.broadcast(df), "term")
            .crossJoin(F.broadcast(n))
            .groupBy("doc_id")
            .agg(F.sum(
                F.expr("ln((nd - df + 0.5) / (df + 0.5) + 1.0)")
                * F.col("tf") * 2.2
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.size("toks")
                                        / (F.col("tottok")
                                           / F.col("nd"))))).alias("s")))
    top = (sc.join(rel, "doc_id")
             .orderBy(F.round("s", 4).desc(), "doc_id").limit(10)
             .withColumn("pos", F.row_number().over(
                 Window.orderBy(F.round("s", 4).desc(), "doc_id"))))
    disc_arr = F.array(*[F.lit(v).cast("long") for v in _NDCG_DISC_E9])
    disc = (spark.range(1, 11)
            .select(F.col("id").cast("long").alias("pos"),
                    F.element_at(disc_arr, F.col("id").cast("int"))
                     .alias("disc_e9")))
    dcg = (top.join(F.broadcast(disc), "pos")
           .agg(F.sum(F.expr("CAST((1 << rel) - 1 AS BIGINT)")
                      * F.col("disc_e9"))
                 .cast("long").alias("dcg_e9")))
    gc = rel.groupBy("rel").agg(F.count("*").alias("c"))
    cnt = gc.agg(
        F.coalesce(F.sum(F.when(F.col("rel") == 3, F.col("c"))), F.lit(0))
         .alias("c3"),
        F.coalesce(F.sum(F.when(F.col("rel") == 2, F.col("c"))), F.lit(0))
         .alias("c2"),
        F.coalesce(F.sum(F.when(F.col("rel") == 1, F.col("c"))), F.lit(0))
         .alias("c1"))
    ideal = disc.crossJoin(F.broadcast(cnt)).select(
        F.expr("CAST(CASE WHEN pos <= c3 THEN 7 "
               "WHEN pos <= c3 + c2 THEN 3 "
               "WHEN pos <= c3 + c2 + c1 THEN 1 ELSE 0 END AS BIGINT)")
         .alias("gain"),
        "disc_e9")
    idcg = ideal.agg(F.sum(F.col("gain") * F.col("disc_e9"))
                     .cast("long").alias("idcg_e9"))
    return (dcg.crossJoin(F.broadcast(idcg))
            .select("dcg_e9", "idcg_e9",
                    F.expr("CAST((2 * 1000000 * dcg_e9 + idcg_e9) "
                           "DIV (2 * idcg_e9) AS BIGINT)")
                     .alias("ndcg_ppm")))


_COS = ("round(CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) "
        "* sqrt(CAST(n2 AS DOUBLE))), 6)")


@query("source_term_cosine", oracle=f"""
WITH tok AS (
  SELECT source, unnest({_TOKSQL}) AS term FROM documents
),
tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
nrm AS (
  SELECT source, CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS nn
  FROM tf GROUP BY 1
),
dots AS (
  SELECT a.source AS s1, b.source AS s2,
         CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS dot
  FROM tf a JOIN tf b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s1, s2, CAST(dot AS BIGINT) AS dot,
       CAST(n1.nn AS BIGINT) AS n1_sq, CAST(n2.nn AS BIGINT) AS n2_sq,
       round(CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nn AS DOUBLE))
             * sqrt(CAST(n2.nn AS DOUBLE))), 6) AS cosine
FROM dots
JOIN nrm n1 ON n1.source = dots.s1
JOIN nrm n2 ON n2.source = dots.s2
""")
def source_term_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between sources' unigram
    term-frequency vectors — the corpus-design distance matrix
    ("which sources are lexically interchangeable, which add real
    diversity") that complements mutual_info_lang_source's
    label-level view. The tf vectors live vocabulary-keyed, so the
    pairwise dot products are ONE self-equi-join on term with
    source1 < source2 (|sources|²/2 pairs share a vocab-keyed
    shuffle — never a dense matrix), norms are per-source Σc², both
    in exact integers on decimal(38)/HUGEINT (Σc² crosses int64 once
    a term passes ~3e9 occurrences in one source); cosine is the
    shared-text sqrt chain. Plan: one corpus explode-aggregate
    (vocab-keyed), one vocab-keyed join; everything else is
    |sources|-bounded."""
    d = table(spark, sf_dir, "documents")
    tf = (d.select("source", F.explode(_toks()).alias("term"))
          .groupBy("source", "term").agg(F.count("*").alias("c"))
          .localCheckpoint(eager=False))
    dec = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    nrm = tf.groupBy("source").agg(
        F.sum((dec("c") * dec("c")).cast("decimal(38,0)"))
         .cast("decimal(38,0)").alias("nn"))
    a = tf.select(F.col("source").alias("s1"), "term",
                  F.col("c").alias("ca"))
    b = tf.select(F.col("source").alias("s2"), "term",
                  F.col("c").alias("cb"))
    dots = (a.join(b, "term")
            .filter(F.col("s1") < F.col("s2"))
            .groupBy("s1", "s2")
            .agg(F.sum((dec("ca") * dec("cb")).cast("decimal(38,0)"))
                  .cast("decimal(38,0)").alias("dot")))
    n1 = nrm.select(F.col("source").alias("s1"), F.col("nn").alias("n1"))
    n2 = nrm.select(F.col("source").alias("s2"), F.col("nn").alias("n2"))
    return (dots.join(F.broadcast(n1), "s1").join(F.broadcast(n2), "s2")
            .select("s1", "s2",
                    F.col("dot").cast("long").alias("dot"),
                    F.col("n1").cast("long").alias("n1_sq"),
                    F.col("n2").cast("long").alias("n2_sq"),
                    F.expr(_COS).alias("cosine")))
