"""Generate docs/plan_budgets.json — the golden per-query shuffle
budget (ShuffleExchange / BroadcastExchange node counts in the initial
physical plan at sf0.001).

A plan regression (an extra shuffle sneaking into a query through a
refactor) is invisible to the correctness oracle and usually invisible
at bench noise levels too — until it is 10x at scale. Pinning the
exchange counts per query turns "the plan got worse" into a failing
test (tests/test_plan_budgets.py).

Scope: queries whose DataFrame CONSTRUCTION is lazy (pure batch
plans). Queries that execute work while building — streaming drains,
iterative loops (CC, BPE, PageRank, k-means), queries that write temp
inputs — are skipped by prefix/name; their plan shapes are pinned by
their own dedicated tests instead. Regenerate (after an INTENDED plan
change) with: python docs/gen_plan_budgets.py
"""

import json
import re
import sys

sys.path.insert(0, "/root/repo")

from zoom_etl_spark.registry import all_queries  # noqa: E402
from zoom_etl_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

# families whose fn() executes jobs during construction, or whose plan
# is inherently run-dependent — excluded from the lazy-plan budget
SKIP_PREFIXES = (
    "stream_", "bpe_", "dedup_clusters", "dedup_incremental",
    "dedup_ngram", "dedup_levenshtein", "dedup_embedding",
    "dedup_minhash", "dedup_segments", "similarity_ann", "multimodal_",
    "paginated_scan", "db_parallel_read", "upsert_last_wins",
    "staging_merge", "merge_upsert", "merge_three_clause",
    "sink_partitioned_write", "split_leakage_free", "lang_id_ngram",
    "holt_linear", "ewma_smooth", "graph_pagerank", "graph_bfs",
    "graph_triangles", "graph_sssp", "lineage_flagship", "heavy_hitters",
    "join_auto_skew", "join_bucketed", "incremental_scan",
    "agg_max_watermark", "analyze_table_stats", "dq_checks",
    "quality_adaptive", "curation_joint", "mv_incremental",
    "dedup_exact", "udtf_tokenize", "pipeline_",
)


def shuffle_profile(jdf) -> dict:
    s = jdf.queryExecution().executedPlan().toString()
    broadcast = len(re.findall(r"BroadcastExchange", s))
    shuffle = len(re.findall(r"\bExchange\b", s))
    return {"shuffle": shuffle, "broadcast": broadcast}


def main():
    spark = get_spark("plan-budgets", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    budgets = {}
    for name, spec in sorted(all_queries().items()):
        if any(name.startswith(p) for p in SKIP_PREFIXES):
            continue
        try:
            df = spec.fn(spark, SF)
            budgets[name] = shuffle_profile(df._jdf)
        except Exception as e:  # noqa: BLE001 — generator reports, test enforces
            print(f"skip {name}: {type(e).__name__}", file=sys.stderr)
    with open("/root/repo/docs/plan_budgets.json", "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
    print(f"pinned {len(budgets)} queries")


if __name__ == "__main__":
    main()
