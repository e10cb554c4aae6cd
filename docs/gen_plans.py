import sys, io, contextlib
sys.path.insert(0, "/root/repo")
from zoom_etl_spark.session import get_spark
from zoom_etl_spark.registry import all_queries
from zoom_etl_spark import plans

spark = get_spark("plansdoc", cpus="8")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.01"
specs = all_queries()

SECTIONS = [
    ("flagship_topk_revenue", plans.flagship,
     "The engine spine: parquet scans with pruned schemas -> shuffle join on "
     "o_custkey -> broadcast joins for the bounded dims (nation, region) -> "
     "partial+final hash aggregate -> single window for the top-3 -> order. "
     "Only two shuffles total (fact join + aggregate)."),
    ("incremental_scan", specs["incremental_scan"].fn,
     "The watermark predicate reaches the parquet scan as a PushedFilter on the "
     "raw nanos column (row-group min/max skipping; partition pruning on a "
     "date-partitioned layout). A filter above the timestamp conversion would "
     "NOT push - this is pinned by tests/test_plans.py."),
    ("merge_upsert", specs["merge_upsert"].fn,
     "Upsert-by-join: WindowGroupLimit does per-mapper top-1 BEFORE the "
     "shuffle (partial last-wins), the FullOuter sort-merge join consumes the "
     "window's hash partitioning with no extra exchange, and the NULL-key "
     "branch unions in with IsNull pushed to its scan."),
    ("dedup_minhash", specs["dedup_minhash"].fn,
     "MinHash-LSH: the expensive shingle expression evaluates once into a "
     "persisted table; band keys explode to (band, key) longs; candidate "
     "generation is an equi-join on those longs - a linear shuffled hash "
     "join, never O(n^2)."),
    ("similarity_topk", specs["similarity_topk"].fn,
     "Brute-force cosine baseline: the 1-row query vector broadcasts, the "
     "per-row dot product pipelines inside the scan stage, and the global "
     "top-10 is TakeOrderedAndProject (per-partition top-k, driver merge of "
     "k rows per partition - no score shuffle)."),
    ("tpch_q3_shipping_priority", specs["tpch_q3_shipping_priority"].fn,
     "Classic selective-dim OLAP shape: the segment filter prunes customer at "
     "the scan, date filters prune both fact scans, joins shuffle on their "
     "keys, and the final top-10 is TakeOrderedAndProject."),
    ("text_tfidf_topk", specs["text_tfidf_topk"].fn,
     "Two-aggregate relevance shape: the (doc, term) count combines map-side "
     "before its exchange, document frequencies are a second rollup OF THAT "
     "AGGREGATE (no second corpus scan), the 1-row corpus count arrives via "
     "BroadcastNestedLoopJoin (a 1-row cross join, not a data-sized one), and "
     "the per-doc top-3 is a WindowGroupLimit - rank truncation happens "
     "before the window sort's exchange."),
    ("stream_temporal_join", lambda sp, sf: __import__(
        "zoom_etl_spark.suite.sources_streaming", fromlist=["x"]
     )._temporal_join_plan(sp, sf),
     "Point-in-time enrichment as a STATELESS stream-static join: the "
     "versioned dim (scd2 intervals via lead) broadcasts, each micro-batch "
     "probes it with the interval predicate as the join residual - no state "
     "store, no watermark bookkeeping, append semantics. Shown here is the "
     "batch-equivalent plan of one micro-batch."),
    ("funnel_conversion", specs["funnel_conversion"].fn,
     "Ordered-funnel shape: each stage is a keyed min-aggregate joined to "
     "the previous stage's survivor frontier; only (user, frontier-ts) rows "
     "flow between stages, so the per-stage cost is one map-combined "
     "aggregate + one join regardless of how many events each user has."),
    ("dedup_incremental", specs["dedup_incremental"].fn,
     "Incremental near-dup: both sides shingle once, the df filter is "
     "computed over the union, candidates come ONLY from new x old posting "
     "joins (no old x old pair ever forms), and the exact-Jaccard verify "
     "joins the full sets back. Cost scales with the batch, not the corpus "
     "squared."),
]

out = ["""# Plan audits

`.explain("formatted")` captures of representative physical plans at
sf0.01 with commentary - the evidence behind the plan-shape tests
(tests/test_plans.py). Regenerate with `python docs/gen_plans.py`.
"""]
for name, fn, commentary in SECTIONS:
    df = fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out.append(f"## {name}\n\n{commentary}\n\n```\n{buf.getvalue().strip()}\n```\n")

open("/root/repo/docs/PLANS.md", "w").write("\n".join(out))
print("written", sum(len(s) for s in out), "chars")
