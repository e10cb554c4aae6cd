"""Embedding-space / distribution-matching curation operators — the two
selection stages modern LLM data pipelines run between dedup and mixing:

* ``semantic_dedup`` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  prune semantically-redundant documents inside embedding clusters,
  keeping the LEAST-central member of each duplicate group (diversity
  is preserved, redundancy dropped). Clusters bound the pairwise work —
  exactly why the published algorithm clusters first.
* ``importance_weight_dsir`` — DSIR (Xie et al. 2023, arXiv:2302.03169):
  per-document importance = average token log-likelihood ratio between
  a target-domain unigram distribution and the raw-corpus distribution
  (add-1 smoothed); documents that look like the target domain get
  positive weight and are selected.

Both extend the reference's fixed-rule data hygiene (reference
lambda/zoom_webhook/handler.py:46-52, src/zoom/extract.py:25) to
corpus-statistics-driven selection, the same calibrate-then-apply shape
as ``quality_adaptive_threshold``.

Scale posture: semantic_dedup's only quadratic work is per-cluster and
cluster sizes are bounded by construction (at 100 TB the cluster id is
the IVF cell from ``dedup/index.py`` — same contract, k-means instead
of the oracle-checkable label attribute; SemDeDup §3 does exactly
this). DSIR's statistics are vocabulary-sized aggregates; the corpus is
scanned once, term-keyed map-combined, and the per-term log-ratio joins
back term-keyed — nothing corpus-sized shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.vectors import cosine_similarity_arrow
from ..registry import query
from .curation import _toks

# Shared pairwise-cosine CTE over intra-cluster (label-blocked) pairs —
# identical to dedup_embedding's oracle arithmetic (double-widened
# element products, engine-native sqrt norms).
_PAIRS_SQL = """
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
         (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
          sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)"""


@query("semantic_dedup", oracle=f"""
WITH {_PAIRS_SQL},
sym AS (
  SELECT id_a AS id, sim FROM pairs
  UNION ALL
  SELECT id_b AS id, sim FROM pairs
),
scores AS (SELECT id, round(avg(sim), 4) AS score FROM sym GROUP BY 1),
losers AS (
  SELECT DISTINCT CASE WHEN sa.score > sb.score THEN p.id_a
                       WHEN sb.score > sa.score THEN p.id_b
                       ELSE greatest(p.id_a, p.id_b) END AS id
  FROM pairs p
  JOIN scores sa ON sa.id = p.id_a
  JOIN scores sb ON sb.id = p.id_b
  WHERE p.sim >= 0.8
)
SELECT e.vec_id, e.label, s.score, l.id IS NULL AS keep
FROM embeddings e
LEFT JOIN scores s ON s.id = e.vec_id
LEFT JOIN losers l ON l.id = e.vec_id
""")
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: inside each embedding cluster, find duplicate pairs
    (cosine >= 0.8) and drop the MORE central member of each pair —
    centrality here is the medoid-style mean cosine to the rest of the
    cluster, so what survives is the diverse tail, which is the point of
    the algorithm. Cluster id is the oracle-checkable ``label``
    attribute (DuckDB can't reproduce k-means); the 100 TB twin swaps in
    the IVF cell id from ``dedup/index.py`` with no other change, which
    is the published formulation (clusters exist to BOUND the pairwise
    work). Plan shape: one intra-cluster self-join producing Arrow-
    batched numpy cosines, a per-vector mean over the symmetric pair
    view, and a broadcast-sized loser set anti-flagged back — per-
    cluster quadratic, corpus-linear across clusters. Drop decisions
    compare ROUNDED scores with a vec_id tiebreak so the kept set is
    engine-exact."""
    e = table(spark, sf_dir, "embeddings")
    a, b = e.alias("a"), e.alias("b")
    sim = cosine_similarity_arrow(F.col("a.embedding"), F.col("b.embedding"))
    pairs = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("id_a"),
                     F.col("b.vec_id").alias("id_b"), sim.alias("sim")))
    # pairs feed two consumers (scores + losers); keep the Arrow cosine
    # sweep from running twice
    pairs = pairs.localCheckpoint(eager=False)
    sym = (pairs.select(F.col("id_a").alias("id"), "sim")
           .unionByName(pairs.select(F.col("id_b").alias("id"), "sim")))
    scores = sym.groupBy("id").agg(F.round(F.avg("sim"), 4).alias("score"))
    sa = scores.select(F.col("id").alias("id_a"), F.col("score").alias("sc_a"))
    sb = scores.select(F.col("id").alias("id_b"), F.col("score").alias("sc_b"))
    losers = (pairs.filter(F.col("sim") >= 0.8)
              .join(sa, "id_a").join(sb, "id_b")
              .select(F.when(F.col("sc_a") > F.col("sc_b"), F.col("id_a"))
                      .when(F.col("sc_b") > F.col("sc_a"), F.col("id_b"))
                      .otherwise(F.greatest("id_a", "id_b")).alias("id"))
              .distinct())
    return (e.join(scores, e.vec_id == scores.id, "left").drop("id")
            .join(F.broadcast(losers.withColumn("_lost", F.lit(True))),
                  e.vec_id == losers.id, "left")
            .select("vec_id", "label", "score",
                    F.col("_lost").isNull().alias("keep")))


@query("importance_weight_dsir", oracle="""
WITH tok AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
tf AS (
  SELECT doc_id, lang, term, count(*) AS tf
  FROM (SELECT doc_id, lang, unnest(toks) AS term FROM tok)
  GROUP BY 1, 2, 3
),
raw_c AS (SELECT term, sum(tf) AS c_r FROM tf GROUP BY 1),
tgt_c AS (SELECT term, sum(tf) AS c_t FROM tf WHERE lang = 'en' GROUP BY 1),
consts AS (
  SELECT CAST(count(*) AS DOUBLE) AS v,
         CAST(sum(c_r) AS DOUBLE) AS n_r,
         (SELECT CAST(coalesce(sum(c_t), 0) AS DOUBLE) FROM tgt_c) AS n_t
  FROM raw_c
),
ratio AS (
  SELECT r.term,
         ln((coalesce(t.c_t, 0) + 1) / (n_t + v))
           - ln((r.c_r + 1) / (n_r + v)) AS llr
  FROM raw_c r LEFT JOIN tgt_c t USING (term) CROSS JOIN consts
)
SELECT tf.doc_id, any_value(tf.lang) AS lang,
       round(sum(tf.tf * ratio.llr) / sum(tf.tf), 4) AS logratio,
       round(sum(tf.tf * ratio.llr) / sum(tf.tf), 4) > 0 AS selected
FROM tf JOIN ratio USING (term)
GROUP BY tf.doc_id
""")
def importance_weight_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: target domain = English documents, raw =
    the whole corpus; each document's weight is its mean token
    log-likelihood ratio ln(p_target/p_raw) under add-1-smoothed unigram
    distributions, and documents whose weight is positive are selected —
    importance resampling toward the target domain without labels.
    (DSIR hashes n-grams into a fixed feature space; whitespace unigrams
    keep the oracle exact — the distribution arithmetic is identical.)
    Plan: one (doc, term) count (map-combined), term-keyed rollups for
    the raw and target distributions (the target rollup is a FILTERED
    re-aggregate of the same tiny term frame, not a second corpus scan),
    three scalar constants broadcast via a 1-row cross join, then one
    term-keyed probe join back and a per-doc weighted mean. All sizes
    after the first aggregate are vocabulary-bounded, so at 100 TB this
    is one corpus scan plus vocabulary-scale joins."""
    d = (table(spark, sf_dir, "documents")
         .repartition(spark.sparkContext.defaultParallelism))
    tf = (d.select("doc_id", "lang", F.explode(_toks()).alias("term"))
          .groupBy("doc_id", "lang", "term").agg(F.count("*").alias("tf")))
    raw_c = tf.groupBy("term").agg(F.sum("tf").alias("c_r"))
    tgt_c = (tf.filter(F.col("lang") == "en")
             .groupBy("term").agg(F.sum("tf").alias("c_t")))
    consts = (raw_c.agg(F.count("*").cast("double").alias("v"),
                        F.sum("c_r").cast("double").alias("n_r"))
              .crossJoin(tgt_c.agg(
                  F.coalesce(F.sum("c_t"), F.lit(0))
                  .cast("double").alias("n_t"))))
    ratio = (raw_c.join(tgt_c, "term", "left")
             .crossJoin(F.broadcast(consts))
             .select("term",
                     (F.log((F.coalesce(F.col("c_t"), F.lit(0)) + 1)
                            / (F.col("n_t") + F.col("v")))
                      - F.log((F.col("c_r") + 1)
                              / (F.col("n_r") + F.col("v")))).alias("llr")))
    lr = F.round(F.sum(F.col("tf") * F.col("llr")) / F.sum("tf"), 4)
    return (tf.join(ratio, "term")
            .groupBy("doc_id")
            .agg(F.any_value("lang").alias("lang"),
                 lr.alias("logratio"), (lr > 0).alias("selected")))


@query("embedding_centroids", oracle="""
WITH comp AS (
  -- DuckDB lacks WITH ORDINALITY: index the array through a lateral
  -- unnest of its subscript range instead
  SELECT e.label, u.i - 1 AS dim,
         -- CAST to DOUBLE first: a bare 1000000.0 literal is DECIMAL
         -- in DuckDB and the float32*decimal product rounds at 7
         -- digits, flipping floors vs Spark's double arithmetic
         CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * 1000000.0)
              AS BIGINT) AS xi
  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS u(i)
)
SELECT label, CAST(dim AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       -- half-away-from-zero mean in INTEGERS: round(sx/n) ties are
       -- where Spark (rounds the shortest-decimal string, HALF_UP) and
       -- DuckDB (rounds the binary double) genuinely disagree, so no
       -- float round may touch the output
       CAST(CASE WHEN sum(xi) >= 0
                 THEN (2 * sum(xi) + count(*)) // (2 * count(*))
                 ELSE -((2 * -sum(xi) + count(*)) // (2 * count(*)))
            END AS BIGINT) AS centroid_micro
FROM comp GROUP BY 1, 2
""")
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the class-prototype vectors behind
    nearest-centroid classification, prototype networks, and the
    coarse quantizer IVF trains): dimension-wise means accumulated as
    EXACT 1e-6-grid integers — vector sums are the canonical place
    float accumulation order drifts between engines, and the integer
    grid removes it (one IEEE division at the end). Plan: posexplode →
    (label, dim)-keyed map-combined sum; shuffle is labels×dims-sized,
    never corpus-sized; the same aggregate at 100 TB is the standard
    first step of k-means/IVF training (`dedup/ivf.py` does it with
    Arrow batches — this is the pure-codegen twin)."""
    emb = table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x"))
    xi = F.floor(F.col("x").cast("double") * 1000000.0).cast("long")
    agg = (comp.select("label", "dim", xi.alias("xi"))
               .groupBy("label", "dim")
               .agg(F.count("*").alias("n"), F.sum("xi").alias("sx")))
    sx, n = F.col("sx"), F.col("n")
    # div on the negated numerator for the negative branch — floor(a/b)
    # would round toward -inf, not away from zero
    half_away = (F.when(sx >= 0,
                        F.expr("(2 * sx + n) div (2 * n)"))
                  .otherwise(-F.expr("(2 * -sx + n) div (2 * n)")))
    return agg.select("label", F.col("dim").cast("int").alias("dim"), "n",
                      half_away.cast("long").alias("centroid_micro"))


@query("embedding_quantize_int8", oracle="""
WITH q AS (
  SELECT vec_id,
         CAST(len(embedding) AS BIGINT) AS dim,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS amax
  FROM embeddings
),
e AS (
  SELECT vec_id, dim, amax,
         CAST(list_max(list_transform(embedding,
             x -> abs(round(CAST(x AS DOUBLE) * 127 / q.amax, 0))))
           AS BIGINT) AS q_absmax,
         CAST(list_sum(list_transform(embedding, x ->
             CAST(floor((CAST(x AS DOUBLE)
                         - round(CAST(x AS DOUBLE) * 127 / q.amax, 0)
                           * q.amax / 127.0)
                        * (CAST(x AS DOUBLE)
                           - round(CAST(x AS DOUBLE) * 127 / q.amax, 0)
                             * q.amax / 127.0) * 1e12 + 0.5) AS BIGINT)))
           AS BIGINT) AS err_e12,
         CAST(list_sum(list_transform(embedding, x ->
             CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12
                        + 0.5) AS BIGINT))) AS BIGINT) AS norm_e12
  FROM embeddings JOIN q USING (vec_id)
)
SELECT vec_id, dim, round(amax, 6) AS amax, q_absmax,
       CAST((2 * 1000000 * err_e12 + norm_e12) // (2 * norm_e12)
            AS BIGINT) AS err_ppm
FROM e
""")
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column with exact
    reconstruction-error accounting — the storage/serving compression
    every vector platform applies (4x smaller, ANN-compatible): per
    vector, scale = max|x|/127, q_d = round(x*127/max|x|) in [-127,
    127], and the relative squared reconstruction error in half-away
    ppm. Engine-exactness for a float pipeline: each per-element
    squared term is quantized to an INTEGER at 1e-12 BEFORE any sum
    (the micro-nat discipline — float32 widens to double identically
    in both engines), so the per-vector sums are integer sums over
    the list, exact under ANY evaluation order. Plan: everything is
    ARRAY-LOCAL — transform + list aggregation inside the row, ZERO
    shuffles at any scale (the earlier posexplode + groupBy draft
    paid a 64x-row vec_id shuffle for nothing)."""
    e = table(spark, sf_dir, "embeddings")
    # hoist amax into a column FIRST: lambda bodies referencing the
    # array_max expression inline recompute it per element (no CSE
    # across lambda scopes — measured 2.2x slower)
    e = e.withColumn("amax_c", F.expr(
        "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
    qv = "round(CAST(x AS DOUBLE) * 127 / amax_c, 0)"
    err_t = (f"CAST(floor((CAST(x AS DOUBLE) - {qv} * amax_c / 127.0) "
             f"* (CAST(x AS DOUBLE) - {qv} * amax_c / 127.0) "
             "* 1e12 + 0.5) AS BIGINT)")
    norm_t = ("CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12 "
              "+ 0.5) AS BIGINT)")
    out = e.select(
        "vec_id",
        F.expr("CAST(size(embedding) AS BIGINT)").alias("dim"),
        F.expr("round(amax_c, 6)").alias("amax"),
        F.expr(f"CAST(array_max(transform(embedding, x -> abs({qv}))) "
               "AS BIGINT)").alias("q_absmax"),
        F.expr("aggregate(transform(embedding, x -> "
               f"{err_t}), 0L, (a, t) -> a + t)").alias("err_e12"),
        F.expr("aggregate(transform(embedding, x -> "
               f"{norm_t}), 0L, (a, t) -> a + t)").alias("norm_e12"))
    return out.select(
        "vec_id", "dim", "amax", "q_absmax",
        F.expr("CAST((2 * 1000000 * err_e12 + norm_e12) "
               "DIV (2 * norm_e12) AS BIGINT)").alias("err_ppm"))


_PCA_ITERS = 3
_PCA_DIM = 64


def _pca_oracle() -> str:
    head = f"""
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(generate_subscripts(embedding, 1) AS INT) AS d
  FROM embeddings
),
v0 AS (
  SELECT CAST(range + 1 AS INT) AS d, 0.125 AS v FROM range(0, {_PCA_DIM})
)"""
    its = []
    for k in range(1, _PCA_ITERS + 1):
        p = k - 1
        its.append(f""",
dot{k} AS (
  SELECT e.vec_id,
         CAST(sum(CAST(floor(e.x * v.v * 1e12 + 0.5) AS BIGINT))
              AS BIGINT) AS dot_e12
  FROM ex e JOIN v{p} v ON v.d = e.d GROUP BY 1
),
w{k} AS (
  SELECT e.d,
         CAST(sum(CAST(floor(e.x * (t.dot_e12 / 1e12) * 1e9 + 0.5)
                       AS BIGINT)) AS HUGEINT) AS w
  FROM ex e JOIN dot{k} t ON t.vec_id = e.vec_id GROUP BY 1
),
n{k} AS (SELECT sum(w * w) AS n2 FROM w{k}),
v{k} AS (
  SELECT d, CAST(w AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)) AS v
  FROM w{k}, n{k}
)""")
    tail = f"""
SELECT v.d, round(v.v, 8) AS loading,
       round(sqrt(CAST(n.n2 AS DOUBLE)) / 1e9, 6) AS eigval
FROM v{_PCA_ITERS} v, n{_PCA_ITERS} n
"""
    return head + "".join(its) + tail


@query("embedding_pca_power", oracle=_pca_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by MATRIX-FREE
    power iteration (3 fixed iterations, v₀ = uniform): w = Σ_rows
    x·(xᵀv) never materializes the 64×64 covariance — each iteration
    is one row-keyed dot aggregate plus one dim-keyed accumulate, the
    shape that scales to billions of vectors where a Gram matrix
    would need a second pass and a driver collect. Cross-row float
    sums are the distributed-determinism trap: BOTH accumulations
    quantize per-term to integers first (dot terms at 1e-12, update
    terms at 1e-9 — the micro-nat discipline), so sums are order-free
    exact; normalization divides exact integers inside one
    shared-text sqrt chain, and the 1e9 scale cancels. ‖w‖ is the
    Rayleigh-quotient estimate of λ₁ — a LOWER bound that tightens at
    rate (λ₂/λ₁)^k, so on a spectrum with a real dominant direction a
    few iterations nail the component, while on this near-isotropic
    synthetic corpus (λ₁/λ₂ ≈ 1.07, measured in the replay gate) the
    fixed-k demo reports the bound and a partially-converged
    direction — production iterates to a delta tolerance with the
    same per-iteration plan. Output: the 64 loadings (deterministic
    v₀ fixes the ± ambiguity) + eigval; the replay gate re-runs the
    EXACT quantized iteration in numpy and requires bit-equal
    loadings, monotone Rayleigh growth, and eigval ≤ λ₁."""
    e = table(spark, sf_dir, "embeddings")
    ex = (e.select("vec_id", F.posexplode("embedding").alias("d0", "xf"))
          .select("vec_id", (F.col("d0") + 1).cast("int").alias("d"),
                  F.expr("CAST(xf AS DOUBLE)").alias("x"))
          .localCheckpoint(eager=False))
    v = (spark.range(1, _PCA_DIM + 1)
         .select(F.col("id").cast("int").alias("d"),
                 F.lit(0.125).alias("v")))
    n2 = None
    for _ in range(_PCA_ITERS):
        dot = (ex.join(F.broadcast(v), "d")
               .groupBy("vec_id")
               .agg(F.sum(F.expr(
                   "CAST(floor(x * v * 1e12 + 0.5) AS BIGINT)"))
                    .cast("long").alias("dot_e12")))
        w = (ex.join(dot, "vec_id")
             .groupBy("d")
             .agg(F.sum(F.expr(
                 "CAST(floor(x * (dot_e12 / 1e12) * 1e9 + 0.5) "
                 "AS BIGINT)")).cast("decimal(38,0)").alias("w")))
        n2 = w.agg(F.sum(F.expr("w * w")).cast("decimal(38,0)")
                    .alias("n2"))
        v = (w.crossJoin(F.broadcast(n2))
             .select("d", F.expr(
                 "CAST(w AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE))")
                 .alias("v")))
    return (v.crossJoin(F.broadcast(n2))
            .select("d", F.round("v", 8).alias("loading"),
                    F.round(F.expr("sqrt(CAST(n2 AS DOUBLE)) / 1e9"), 6)
                     .alias("eigval")))
