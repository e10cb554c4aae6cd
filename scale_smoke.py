#!/usr/bin/env python
"""10x scale smoke: synthesize ~sf1 tables (6M lineitem rows) from the
sf0.1 parquet by key-shifted replication, then run representative heavy
queries end-to-end. Answers "does the plan survive a 10x scale-up" with
wall-clock evidence rather than argument. Writes only under /tmp.

Replication keeps key relationships intact: copy c gets every key offset
by c * KEY_STRIDE, so joins/FKs still match within a copy and cardinality
scales linearly in every table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from zoom_etl_spark.registry import all_queries  # noqa: E402
from zoom_etl_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# SMOKE_COPIES: replication factor (default 10 = the standing per-round
# smoke; 30 gives the weak-scaling second decade — time(30x)/time(10x)
# ~ 3 for linear plans). Non-default factors land in their own /tmp dir
# so the standing 10x replica is never clobbered.
COPIES = int(os.environ.get("SMOKE_COPIES", "10"))
OUT = os.environ.get(
    "SMOKE_OUT", "/tmp/zes_sf1" if COPIES == 10 else f"/tmp/zes_x{COPIES}")
STRIDE = 100_000_000

QUERIES = [
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority", "agg_group_stats",
    "join_inner", "join_interval", "merge_upsert", "staging_merge",
    "window_running_sum", "dedup_last_wins",
    # round-3 additions: the curation/text family and the rewritten as-of
    # join (replicated doc_ids keep their %20 residues, so the
    # decontamination benchmark scales proportionally with the corpus)
    "join_asof", "quality_gopher_rules", "decontaminate_ngram",
    "chunk_documents", "pipeline_curation_e2e", "stream_session_ivm",
    # round-3 second wave: scoring/funnel/retention + incremental dedup
    # (replicated doc_ids keep their %10 residues → the new/old split
    # scales proportionally) + the retraction changelog IVM
    "text_tfidf_topk", "quality_unigram_logprob", "funnel_conversion",
    "retention_cohorts", "dedup_incremental", "stream_retract_ivm",
    # round-3 third wave: joint policy calibration (the heaviest new
    # query — full trigram overlap + 9-cell grid in one pass), global
    # segment dedup (segment-keyed window at 10x segment count), PMI
    # pairs (vocab²-bounded — should be near-flat), LTTB downsample and
    # the rolling-median constant frame (user-keyed windows), BM25
    # (query-term-sized aggregate — should be near-flat)
    "curation_joint_calibrate", "dedup_segments_global", "term_pmi",
    "downsample_lttb", "window_rolling_median", "bm25_search",
    # round-3 fourth/fifth wave: iterative graph fixpoint (|E| scales
    # 10x, iteration count must NOT), sketch-then-verify heavy hitters
    # (candidate set stays k-bounded), WAU interval algebra (explode
    # stays ≤7·user-days), basket-array association rules, the
    # aggregate-pushdown band query (day domain unchanged at 10x), the
    # delta-merge MV refresh, and the keyspace-arrangement top-k IVM
    "graph_pagerank", "heavy_hitters_terms", "rolling_distinct_users",
    "assoc_rules_brands", "join_band_dates", "mv_incremental_refresh",
    "stream_topk_ivm",
    # closing wave (session 2): degree-oriented triangles (|E| grows
    # ~linearly within copies — wedge work must not blow up), the
    # haversine neighbor join (uniform-density replication makes pair
    # OUTPUT grow ~quadratically with density — the operator's cost is
    # candidates+output, so ~100x rows at 10x points is the EXPECTED
    # shape, not a plan failure), and multi-touch attribution (per-user
    # touch lists unchanged — must scale linearly).
    # er_blocked_linkage rides wave 2 since round 6 (the replicator's
    # balance salt removed the clone cross-match artifact — see
    # replicate()).
    "graph_triangles", "geo_neighbor_haversine", "attribution_multi_touch",
    # closing wave (session 3): ray-cast containment (fence areas fixed,
    # candidates ∝ local density → linear), equal-area pyramid (cell
    # domain fixed → near-flat agg over a linear scan), delta-frontier
    # SSSP (each copy is a disconnected component with its own German
    # seeds → frontier work linear, round count fixed), KM survival
    # (subjects 10x, day domain unchanged → the fold stays
    # constant-size), and the temperature grid (corpus 10x under the
    # fixed 9-cell broadcast grid)
    "geo_polygon_raycast", "geo_equalarea_rollup", "graph_sssp_weighted",
    "survival_km", "mixture_grid_calibrate",
    # session-3 statistics wave: the Gini two-level order statistic
    # (band offsets + per-band ranks must hold as customers go 10x),
    # Mann-Whitney (distinct-(type,cents) collapse is value-domain
    # bounded → near-flat window, linear scan), and the CUSUM fold
    # (day domain unchanged at 10x → near-flat past the groupBy(day))
    "revenue_gini", "ab_mann_whitney", "changepoint_cusum",
    # ACF (day-bounded lag self-join → near-flat past groupBy(day)) and
    # quantile normalization (lattice-bounded CDF/grid; corpus work is
    # one scan + per-source rank windows → linear, sources the
    # parallel unit)
    "acf_daily_revenue", "quality_quantile_normalize",
    # seasonal DOW anomalies (7 weekday cohorts of the day-bounded
    # series → near-flat past groupBy(day)) and mixture entropy
    # (source-keyed map-combined aggregate → near-flat past the scan)
    "anomaly_seasonal_dow", "mixture_entropy",
    # RFM (customer-bounded ntile windows over the rollup — linear in
    # customers) and the naive-7 backtest (day-bounded self-join →
    # near-flat past groupBy(day))
    "rfm_segments", "forecast_backtest_naive7",
    # KS (value-domain-bounded like Mann-Whitney) and CUPED (one
    # user-keyed moment aggregate → linear scan, 1-row fold)
    "ab_ks_test", "ab_cuped_adjust",
    # privacy family: QI-domain-bounded aggregates (k-anonymity audit
    # linear in the orders rollup; the ladder's 5-way fan-out is one
    # bounded shuffle)
    "dq_k_anonymity", "privacy_generalize_ladder",
    # DP release (cell-bounded, row-local noise) and the Zipf fit
    # (vocab rollup + fixed 1000-row head)
    "privacy_dp_counts", "term_zipf_fit",
    # online CUSUM drain: linear in events like every event-grain IVM;
    # the fold is the vectorized closed prefix form
    "stream_cusum_ivm",
    # log-rank (survival_km corpus work + day-bounded terms) and BH
    # (the KS frame + an m-bounded layer)
    "survival_logrank", "ab_fdr_bh",
    # survivorship (the clusters pipeline + cluster-keyed windows) and
    # the additive decomposition (day-bounded)
    "dedup_survivorship", "seasonal_decompose_ma",
    # grid-DBSCAN (cell-bounded past the first groupBy; CC rounds ride
    # the grid diameter) and RAKE (corpus-linear tokenize)
    "geo_dbscan_grid", "text_keyphrase_rake",
    # bucket-decomposed range lookup: one hash equi-join, linear
    "join_range_lookup",
    # privacy e2e (QI-bounded) and the ordered-funnel drain (linear)
    "pipeline_privacy_e2e", "stream_funnel_ivm",
    # LPA (3 fixed rounds, linear in edges) and the burn-rate rollup
    # (hour-bounded)
    "graph_lpa_communities", "ops_sla_burn_rate",
    # M4 (one per-bucket aggregate) and the user feature vector (one
    # user-keyed aggregate)
    "downsample_m4", "features_user_activity",
    # readability (zero-shuffle projection) and WoW growth
    # (segment-week-bounded lag)
    "text_readability_fk", "window_wow_growth",
    # DiD (one user-period aggregate) and ABC/XYZ (two lineitem
    # rollups + part-bounded cumulative)
    "ab_diff_in_diff", "inventory_abc_xyz",
    # model-evaluation wave: AUC (cell-bounded windows past one corpus
    # groupBy), calibration/gains (two-level band rank — band count
    # rides the score domain, not the corpus), LOO encoding (bounded
    # category rollup + broadcast), and the lag matrix (user-keyed
    # RANGE windows — linear in user-days)
    "model_auc_by_source", "model_calibration_bins",
    "model_gains_deciles", "target_encode_loo", "feature_lag_matrix",
    # correlation/association wave: Spearman (banded midrank cells —
    # the value-cell join is the only data-sized piece past the
    # rollup), Kendall (domain-bounded grid, pair counts via 2D
    # prefix — grid size must NOT grow at 10x), MI (lang x source
    # cells), max drawdown (day-bounded windows)
    "corr_spearman", "corr_kendall", "mutual_info_lang_source",
    "revenue_max_drawdown",
    # conformal thresholds (calibration rank join + score-cell
    # coverage — cells ride the scorer grid, not the corpus) and WoE
    # (category-bounded rollup)
    "conformal_threshold", "encode_woe_iv",
    # reconciliation checksum (6 md5s/row — CPU-bound linear scan, no
    # shuffle) and the closed-form 2-factor OLS (day-bounded moments)
    "table_fingerprint", "ols_two_factor",
    # ranking-eval + corpus-similarity: NDCG (query-term-keyed posting
    # build, grade-count IDCG), source cosine (vocab-keyed self-join)
    "search_ndcg", "source_term_cosine",
    # Holt-Winters (day-bounded fold past the rollup) and the Poisson
    # bootstrap (B x rows expansion — linear BY DESIGN, map-combined
    # into B cells)
    "holt_winters_seasonal", "bootstrap_ci_mean",
    # HITS (6 |E|-joins, fixed iterations) and k-core peeling (4
    # rounds x 2 degree-aggregates over the shrinking edge set)
    "graph_hits", "graph_kcore",
    # hashing-trick features (vocab-keyed md5 + token explode —
    # linear), skip-grams (zip-shift explode), sequential looks
    # (10-cell moments), robust means (banded rank)
    "feature_hash_tf", "skipgram_cooc", "ab_sequential_obf",
    "trimmed_mean_robust",
    # embedding ops: int8 quantization (array-local, ZERO shuffles)
    # and matrix-free PCA power iteration (3 x (row-dot + dim-accum))
    "embedding_quantize_int8", "embedding_pca_power",
    # item-item Jaccard (customer-keyed pair join, pairs ~ sum deg^2)
    # and Theil-Sen (day-bounded pairs — must NOT grow at 10x; only
    # the rollup scan scales)
    "recsys_item_jaccard", "theil_sen_slope",
    # Dunning G2 collocations (bigram explode + vocab^2-bounded pair
    # frames) and uplift-by-segment (segment x 2 cells)
    "collocation_llr", "ab_uplift_by_segment",
    # streaming PSI IVM: constant (type x 22 bucket) state, the drain
    # scans 10x events once
    "stream_drift_ivm",
    # funnel latency (stage frontiers + hop-banded order statistic)
    # and the key-skew audit (one key rollup + 1-row fold)
    "funnel_latency_quantiles", "dq_key_skew",
    # containment dedup: replicated copies share text, so cross-copy
    # pairs are the er_blocked_linkage caveat IN REVERSE — here the
    # ~100x pair output at 10x is the real workload shape (every copy
    # IS a duplicate) and the df-capped candidates + exact verify
    # must absorb it
    "dedup_containment",
    # ship-delay SLA percentiles: fact-fact orderkey join + bounded
    # delay-value cells — the join is the only thing that scales
    "logistics_ship_delay",
    # STL strength diagnostics: day-bounded past the rollup
    "seasonal_strength",
    # the model scorecard e2e: one corpus scan feeds AUC + ECE + Brier
    "pipeline_mleval_e2e",
    # Markov held-out perplexity: one lead window + 25-cell rollups
    "markov_perplexity",
    # portable simhash: max_bucket-capped band join — the uncapped
    # join paid 174 s under the replicator's identical-copy storm
    "dedup_simhash_exact",
    # portable minhash: capped bands + exact verify absorb the same
    # copy storm
    "dedup_minhash_exact",
    # round-4 wave: exact substring spans (replicated copies make EVERY
    # gram cross-doc duplicated — hits = grams, coverage explode =
    # 10x grams; the honest dedup_containment-style storm, linear by
    # construction), within-doc repetition signals (copies never
    # interact -> linear), and corpus distinct-n (distinct unchanged
    # under identical copies, totals x10 -> the groupBy must stay
    # map-combined)
    "dedup_substring_spans", "quality_repetition_signals",
    "corpus_distinct_ngrams",
]

# Round-5 full-contract coverage (verdict item 7): wave 2 = every
# registered query NOT in the curated wave-1 list, computed from the
# registry so new queries can never silently miss their 10x row.
# Round 6: er_blocked_linkage is back IN — the replicator now salts
# copied customer balances (+$2000/copy, see replicate()) so clone
# pairs never share a balance band and the 100x cross-copy candidate
# artifact cannot form; the query runs with its real 10x shape
# (linear candidates, per-copy block structure unchanged).
SMOKE_EXCLUDED: set[str] = set()


def wave2_queries() -> list[str]:
    return sorted(set(all_queries()) - set(QUERIES) - SMOKE_EXCLUDED)

KEYED = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
UNKEYED = ["region", "nation"]  # bounded dims stay as-is


def replicate(spark):
    from zoom_etl_spark.catalog import table
    copies = spark.range(COPIES).select(F.col("id").alias("__c"))
    for name, keys in KEYED.items():
        df = table(spark, SRC, name)
        rep = df.crossJoin(F.broadcast(copies))
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("__c") * STRIDE)
        if name == "events":  # keep nanos-long ts loadable via catalog path
            rep = rep.withColumn("ts", F.expr("CAST(unix_micros(ts) AS BIGINT) * 1000"))
        if name == "customer":
            # Replication-aware ER twin (round-5 verdict item 2): copies
            # share c_name AND c_acctbal, so er_blocked_linkage's
            # (name-region, balance-band) blocks would cross-match every
            # clone pair (10x data -> 100x candidates — a replicator
            # artifact, not the operator). Shifting each copy's balance
            # by $2000 (200 bands, far past the $10 band + $5 offset)
            # makes copies distinct entities in EVERY banding pass while
            # leaving within-copy match structure byte-identical.
            rep = rep.withColumn(
                "c_acctbal", F.col("c_acctbal") + F.col("__c") * F.lit(2000.0))
        rep.drop("__c").write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    for name in UNKEYED:
        table(spark, SRC, name).write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # One full-list pass holds 10x-sized shuffles PLUS every streaming
    # drain's memory-sink table in a single JVM: the 4g default heap
    # OOMs around query ~68 (observed: GCLocker storms then
    # java.lang.OutOfMemoryError in graph_lpa_communities, which passed
    # fine in per-wave SMOKE_ONLY batches). The smoke owns its process,
    # so default it to a heap sized for the full pass; per-query temp
    # views are dropped below for the same reason.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark("zes-scale-smoke", cpus=cpus,
                      shuffle_partitions=int(cpus) * 4)
    spark.sparkContext.setLogLevel("ERROR")
    # replica dirs carry a completion marker (written LAST) recording
    # both the factor and the source, so an existing dir can never be
    # silently paired with a different factor/source (the metric line
    # stamps COPIES — a mismatch would mislabel a scaling point) and a
    # replication killed mid-run is re-run, not trusted. A markerless
    # dir with every table present is trusted only for the legacy
    # default (factor 10 of the default SRC).
    marker = f"{OUT}/_copies.json"
    all_tables = [f"{OUT}/{n}.parquet" for n in (*KEYED, *UNKEYED)]
    if os.path.exists(marker):
        have = json.load(open(marker))
        if have.get("copies") != COPIES or have.get("src") != SRC:
            raise SystemExit(
                f"replica at {OUT} was built as copies="
                f"{have.get('copies')} of {have.get('src')}, but this "
                f"run wants copies={COPIES} of {SRC}; delete it or "
                "point SMOKE_OUT elsewhere")
    elif all(os.path.exists(p) for p in all_tables) and COPIES == 10 \
            and SRC == "/root/testdata/sf0.1":
        pass  # complete legacy default replica, pre-marker
    else:
        t0 = time.time()
        replicate(spark)
        with open(marker, "w") as fh:
            json.dump({"copies": COPIES, "src": SRC}, fh)
        print(f"# replicated {COPIES}x into {OUT} in {time.time()-t0:.0f}s",
              file=sys.stderr)

    from zoom_etl_spark import plans
    specs = all_queries()
    only = os.environ.get("SMOKE_ONLY")
    wave = os.environ.get("SMOKE_WAVE")
    if only:
        names = only.split(",")
    elif wave == "2":
        names = wave2_queries()
    elif wave == "all":
        names = QUERIES + ["flagship_topk_revenue"] + wave2_queries()
    else:
        # the flagship rides the default wave-1 pass BEFORE slicing so
        # the union of all k slices equals the unsliced pass
        names = QUERIES + ["flagship_topk_revenue"]
    # SMOKE_SLICE=i/k runs the i-th of k round-robin STRIPES (1-based:
    # stripe i takes positions i-1, i-1+k, ...) — bounds one OS process
    # per slice so a single long pass can't pin streaming memory-sink
    # tables across 150+ queries.
    sl = os.environ.get("SMOKE_SLICE")
    if sl:
        i, k = (int(x) for x in sl.split("/"))
        if not (1 <= i <= k):
            raise SystemExit(f"SMOKE_SLICE={sl}: need 1 <= i <= k")
        names = [n for j, n in enumerate(names) if j % k == i - 1]
    fns = {name: (plans.flagship if name == "flagship_topk_revenue"
                  else specs[name].fn) for name in names}
    timings = {}
    for name, fn in fns.items():
        t0 = time.time()
        fn(spark, OUT).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        # free streaming drains' memory-sink tables — they pin their
        # whole drained result on the driver heap for the rest of the
        # run otherwise (the full-list OOM above)
        for view in spark.catalog.listTables():
            if view.isTemporary:
                spark.catalog.dropTempView(view.name)
        print(f"# {timings[name]:8.2f}s {name}", file=sys.stderr)
    print(json.dumps({"metric": f"scale_smoke_{COPIES}x", "unit": "sec",
                      "copies": COPIES, "queries": timings,
                      "value": round(sum(timings.values()), 2)}))


if __name__ == "__main__":
    main()
