#!/usr/bin/env python
"""Solo-time one registered query: cold run + N warm repeats in ONE
bench-shaped session; print a JSON line {query, cold, warms, best}.

Used for interleaved A/B protocols (run alternately from two checkouts
via PYTHONPATH) — single full-suite runs on this host wobble 2-12x, so
per-change evidence is min-of-N solo timings interleaved A,B,A,B,...

Usage: python tools/solo_time.py <query> [--repeats N] [--sf DIR]
       [--cpus N]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from zoom_etl_spark.registry import all_queries  # noqa: E402
from zoom_etl_spark.session import get_spark  # noqa: E402


def main():
    name = sys.argv[1]
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    sf = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    cpus = "32"
    if "--cpus" in sys.argv:
        cpus = sys.argv[sys.argv.index("--cpus") + 1]
    spark = get_spark("solo-time", cpus=cpus,
                      shuffle_partitions=max(int(cpus) * 2, 16), ui=False)
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()[name].fn
    times = []
    for _ in range(1 + repeats):
        t0 = time.time()
        df = fn(spark, sf)
        if not df.isStreaming:
            df.write.mode("overwrite").format("noop").save()
        times.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    out = {"query": name, "cwd": os.getcwd(), "cold": times[0],
           "warms": times[1:], "best": min(times)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
