#!/usr/bin/env python
"""Warm-session plan-budget sweep (round-7 verdict item 1): re-arm the
shuffle-regression tripwire over the minhash-banding dedup family whose
initial-plan exchange counts are CACHE-STATE-dependent and therefore
could not live in docs/plan_budgets.json.

Mechanism (diagnosed round 8): these queries ``persist()`` their
shingle frames during construction (dedup/minhash.py:116,
dedup/ngram.py:103-104,138). Spark's CacheManager substitutes
InMemoryRelation into ANY canonically-matching subtree, so the plan a
query gets depends on which cache entries are live — including entries
left by OTHER family members (observed: dedup_ngram_jaccard probes 9
exchanges cache-clean, 15 after its own execution, 27 after the whole
family executed). A single pin would flake.

The NORMALIZED protocol makes both ends deterministic, per query:

    clearCache -> build+profile (COLD: no cache entries)
               -> execute to a noop sink (materializes its own caches)
               -> rebuild+profile (WARM: exactly its own caches live)

Probed order-independent and repeat-stable (cold 9/12/9, warm
15/20/15 at sf0.001). This tool sweeps the family and writes the
second golden docs/plan_budgets_warm.json; tests/test_plan_budgets_warm.py
re-runs the protocol and asserts equality, so an extra shuffle sneaking
into the engine's most expensive query family is a red diff again.

Regenerate (after an INTENDED plan change) with:
    python tools/plan_warm_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/docs")

SF = "/root/testdata/sf0.001"
OUT = "/root/repo/docs/plan_budgets_warm.json"

# The cache-state-dependent family (gen_plan_budgets.py excludes these
# from the cold golden with a reason pointing here).
WARM_PINNED = ("dedup_incremental", "dedup_minhash", "dedup_ngram_jaccard")

PROTOCOL = ("per query: clearCache -> profile cold -> execute to noop "
            "sink -> profile warm (own caches only); order-independent")


def sweep(spark, names=WARM_PINNED, sf_dir=SF) -> dict:
    """Run the normalized protocol for each query; return
    {name: {"cold": {...}, "warm": {...}}}."""
    from gen_plan_budgets import shuffle_profile

    from zoom_etl_spark.registry import all_queries

    qs = all_queries()
    out = {}
    for name in sorted(names):
        spark.catalog.clearCache()
        fn = qs[name].fn
        cold = shuffle_profile(fn(spark, sf_dir)._jdf)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        warm = shuffle_profile(fn(spark, sf_dir)._jdf)
        out[name] = {"cold": cold, "warm": warm}
    spark.catalog.clearCache()
    return out


def main() -> None:
    from zoom_etl_spark.session import get_spark

    spark = get_spark("plan-warm-sweep", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    profiles = sweep(spark)
    golden = {"protocol": PROTOCOL, "sf": SF, "queries": profiles}
    with open(OUT, "w") as fh:
        json.dump(golden, fh, indent=1, sort_keys=True)
    print(json.dumps({"metric": "plan_warm_sweep",
                      "n_pinned": len(profiles), "out": OUT,
                      "queries": profiles}))
    spark.stop()


if __name__ == "__main__":
    main()
