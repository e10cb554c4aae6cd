"""Pure-Python replay gates for recsys_item_jaccard (set-algebra
replay of neighborhood Jaccard) and theil_sen_slope (brute-force
median-of-slopes replay + robustness direction check)."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from zoom_etl_spark.registry import all_queries


def test_item_jaccard_replays(spark, sf_dir):
    rows = [r.asDict() for r in
            all_queries()["recsys_item_jaccard"].fn(
                spark, sf_dir).collect()]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    m = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    nb = defaultdict(set)
    for c, s in {(int(c), int(s))
                 for c, s in zip(m["o_custkey"], m["l_suppkey"])}:
        nb[s].add(c)
    items = sorted(nb)
    cand = []
    for i, s1 in enumerate(items):
        for s2 in items[i + 1:]:
            inter = len(nb[s1] & nb[s2])
            if inter >= 5:
                union = len(nb[s1]) + len(nb[s2]) - inter
                jac = (2 * 1000000 * inter + union) // (2 * union)
                cand.append((jac, s1, s2, inter,
                             len(nb[s1]), len(nb[s2])))
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = cand[:100]
    assert len(rows) == len(want)
    for r, (jac, s1, s2, inter, d1, d2) in zip(rows, want):
        assert (r["s1"], r["s2"]) == (s1, s2)
        assert (r["c_ab"], r["d1"], r["d2"]) == (inter, d1, d2)
        assert r["jaccard_ppm"] == jac
        assert 0 < jac <= 1000000


def test_capped_neighborhoods_salt_invariant(spark, sf_dir):
    """The salts=k two-phase (bounded aggregation buffers) must select
    EXACTLY the same capped neighborhoods as the single-phase plan:
    every member of the global cap-smallest md5 set is also within its
    salt bucket's cap-smallest, so the merge loses nothing."""
    from pyspark.sql import functions as F

    from zoom_etl_spark.catalog import table
    from zoom_etl_spark.suite.mining import capped_neighborhoods
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    edges = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s")).distinct())
    # cap=8 far below real degrees so the cap (and the salt merge)
    # actually binds at test SF
    one = capped_neighborhoods(edges, "c", "s", cap=8, salts=1)
    four = capped_neighborhoods(edges, "c", "s", cap=8, salts=4)
    a = {r["c"]: tuple(r["ss"]) for r in one.collect()}
    b = {r["c"]: tuple(r["ss"]) for r in four.collect()}
    assert a == b
    assert a and all(len(v) <= 8 for v in a.values())
    assert any(len(v) == 8 for v in a.values())  # cap bound somewhere


def test_theil_sen_replays(spark, sf_dir):
    row = all_queries()["theil_sen_slope"].fn(
        spark, sf_dir).collect()[0].asDict()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(day=pd.to_datetime(o["o_orderdate"]).dt.date,
                 cents=(o["o_totalprice"] * 100 + 0.5).map(math.floor))
    daily = o.groupby("day")["cents"].sum().sort_index()
    ys = list(daily.values)
    n = len(ys)
    assert row["n_days"] == n
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            dy, dx = int(ys[j] - ys[i]), j - i
            if dy >= 0:
                slopes.append((2 * dy * 1000000 + dx) // (2 * dx))
            else:
                slopes.append(-((2 * -dy * 1000000 + dx) // (2 * dx)))
    slopes.sort()
    assert row["n_pairs"] == len(slopes) == n * (n - 1) // 2
    assert row["ts_slope_e6"] == slopes[(len(slopes) + 1) // 2 - 1]
    # robustness: corrupting ONE day by 100x moves OLS but the
    # Theil-Sen median barely shifts — check the direction on the
    # replay side (the operator itself is deterministic)
    ys2 = ys[:]
    ys2[n // 2] *= 100
    s2 = []
    for i in range(n):
        for j in range(i + 1, n):
            dy, dx = int(ys2[j] - ys2[i]), j - i
            s2.append((2 * dy * 1000000 + dx) // (2 * dx) if dy >= 0
                      else -((2 * -dy * 1000000 + dx) // (2 * dx)))
    s2.sort()
    med2 = s2[(len(s2) + 1) // 2 - 1]
    spread = slopes[-1] - slopes[0]
    assert abs(med2 - row["ts_slope_e6"]) < 0.05 * spread
