"""Pure-Python replay gates for holt_winters_seasonal (float fold with
the same operation order) and bootstrap_ci_mean (hash + Poisson CASE +
nearest-rank CI recomputed independently)."""

from __future__ import annotations

import math

import pandas as pd

from zoom_etl_spark.registry import all_queries

POIS1_T = [367880, 735761, 919701, 981014, 996343, 999408, 999919,
           999992, 1000001]


def _daily(sf_dir: str) -> pd.Series:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(day=pd.to_datetime(o["o_orderdate"]).dt.date,
                 cents=(o["o_totalprice"] * 100 + 0.5).map(math.floor))
    return o.groupby("day")["cents"].sum().sort_index()


def test_holt_winters_replays(spark, sf_dir):
    rows = sorted((r.asDict() for r in
                   all_queries()["holt_winters_seasonal"].fn(
                       spark, sf_dir).collect()),
                  key=lambda r: r["day"])
    daily = _daily(sf_dir)
    ys = [float(v) for v in daily.values]
    days = list(daily.index)
    assert len(rows) == len(ys) - 7

    def q(x: float) -> float:
        # the query's 1e-4 state grid (suite/timeseries._hw_grid) —
        # Python doubles follow the same IEEE ops as both engines, so
        # the replay is EXACT, not approximate
        return math.floor(x * 10000 + 0.5) / 10000

    l = q(sum(ys[:7]) / 7.0)
    b = 0.0
    s = [q(ys[i] - l) for i in range(7)]
    for r, day, y in zip(rows, days[7:], ys[7:]):
        fitted = q(l + b + s[0])
        l_new = q(0.3 * (y - s[0]) + 0.7 * (l + b))
        b_new = q(0.2 * (l_new - l) + 0.8 * b)
        s_new = q(0.1 * (y - l_new) + 0.9 * s[0])
        assert r["day"] == day
        assert r["y_cents"] == int(y)
        assert r["fitted"] == fitted
        assert r["level"] == l_new
        assert r["trend"] == b_new
        assert r["season"] == s_new
        l, b = l_new, b_new
        s = s[1:] + [s_new]
    # one-step residuals should beat the naive persistence forecast on
    # a seasonal series: sanity that the model actually fits
    resid = [abs(r["y_cents"] - r["fitted"]) for r in rows]
    naive = [abs(ys[i] - ys[i - 1]) for i in range(8, len(ys))]
    assert sum(resid) / len(resid) < 2.0 * (sum(naive) / len(naive))


def _pois_w(u: int) -> int:
    for k, t in enumerate(POIS1_T):
        if u < t:
            return k
    return 9


def test_bootstrap_ci_replays(spark, sf_dir):
    row = all_queries()["bootstrap_ci_mean"].fn(
        spark, sf_dir).collect()[0].asDict()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (o["o_totalprice"] * 100 + 0.5).map(math.floor)
    keys = o["o_orderkey"].astype(int)
    n = len(o)
    assert row["n_rows"] == n
    assert row["full_mean"] == round(float(cents.sum()) / n, 4)
    means = []
    for r in range(100):
        nw = sw = 0
        for k, c in zip(keys, cents):
            u = ((k % 1000003) * 2654435761 + r * 40503) % 1000003
            w = _pois_w(u)
            nw += w
            sw += w * c
        if nw:
            means.append((round(sw / nw, 4), r))
    means.sort()
    nb = len(means)
    assert row["n_reps"] == nb
    assert row["ci_lo"] == means[math.ceil(0.025 * nb) - 1][0]
    assert row["ci_hi"] == means[math.ceil(0.975 * nb) - 1][0]
    # the interval surrounds the point estimate and is nondegenerate
    assert row["ci_lo"] <= row["full_mean"] <= row["ci_hi"]
    assert row["ci_lo"] < row["ci_hi"]
