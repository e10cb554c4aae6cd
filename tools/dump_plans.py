#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<round>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> <query1,query2,...> [--sf DIR]
       [--round rNN]   (default r10)
Plans are captured at sf0.1 (the bench SF) on a bench-shaped session so
the judge can check plan claims without running Spark.
"""
import sys, os, io, contextlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zoom_etl_spark.session import get_spark
from zoom_etl_spark.registry import all_queries

def main():
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    rnd = "r10"
    if "--round" in sys.argv:
        rnd = sys.argv[sys.argv.index("--round") + 1]
    spark = get_spark("dump-plans", cpus="32", shuffle_partitions=64, ui=False)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    for n in names:
        df = specs[n].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{n}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
        spark.catalog.clearCache()
    spark.stop()

if __name__ == "__main__":
    main()
