"""Pure-Python replay gates for mutual_info_lang_source and
revenue_max_drawdown — statistics recomputed from the raw parquet with
independent Python (math.log / running folds), no SQL on either side."""

from __future__ import annotations

import math

import pandas as pd

from zoom_etl_spark.registry import all_queries


def _nlogn_unat(n: int) -> int:
    return math.floor(n * math.log(n) * 1000000 + 0.5)


def test_mutual_info_replays(spark, sf_dir):
    row = all_queries()["mutual_info_lang_source"].fn(
        spark, sf_dir).collect()[0].asDict()
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells = d.groupby(["lang", "source"]).size()
    mx = d.groupby("lang").size()
    my = d.groupby("source").size()
    n = len(d)
    assert row["n"] == n
    assert row["n_cells"] == len(cells)
    assert row["n_lang"] == len(mx) and row["n_source"] == len(my)
    s_xy = sum(_nlogn_unat(c) for c in cells)
    s_x = sum(_nlogn_unat(c) for c in mx)
    s_y = sum(_nlogn_unat(c) for c in my)
    mi = round(((s_xy - s_x - s_y) / 1e6 / n + math.log(n)) * 1e6)
    hx = round((math.log(n) - s_x / 1e6 / n) * 1e6)
    hy = round((math.log(n) - s_y / 1e6 / n) * 1e6)
    assert row["mi_e6"] == mi
    assert row["h_lang_e6"] == hx and row["h_source_e6"] == hy
    # information inequalities (allow quantization slack of a few
    # micro-nats): 0 <= MI <= min(H_x, H_y)
    assert -5 <= row["mi_e6"] <= min(row["h_lang_e6"],
                                     row["h_source_e6"]) + 5
    # cross-check against the float-accumulated textbook formula
    mi_float = sum((c / n) * math.log(n * c / (mx[lg] * my[src]))
                   for (lg, src), c in cells.items())
    assert abs(row["mi_e6"] / 1e6 - mi_float) < 1e-4


def test_max_drawdown_replays(spark, sf_dir):
    row = all_queries()["revenue_max_drawdown"].fn(
        spark, sf_dir).collect()[0].asDict()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(day=pd.to_datetime(o["o_orderdate"]).dt.date,
                 cents=(o["o_totalprice"] * 100 + 0.5).map(math.floor))
    daily = o.groupby("day")["cents"].sum().sort_index()
    cum = peak = 0
    peak_day = None
    best = (-1, None, None, None, None)  # dd, trough_day, ...
    for day, c in daily.items():
        cum += c
        if cum >= peak:  # ties -> latest peak day (composite-key rule)
            peak, peak_day = cum, day
        dd = peak - cum
        if dd > best[0]:
            best = (dd, day, peak_day, peak, cum)
    dd, trough_day, pk_day, pk_cum, tr_cum = best
    assert row["drawdown_cents"] == dd
    assert row["trough_day"] == trough_day
    assert row["peak_day"] == pk_day
    assert row["peak_cum_cents"] == pk_cum
    assert row["trough_cum_cents"] == tr_cum
    assert row["dd_ppm"] == (2 * 1000000 * dd + pk_cum) // (2 * pk_cum)


def test_funnel_latency_replays(spark, sf_dir):
    got = {r["hop"]: r.asDict() for r in
           all_queries()["funnel_latency_quantiles"].fn(
               spark, sf_dir).collect()}
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    # parquet ts is datetime64[us] since the 2026-08-13 regen — the
    # int64 view IS microseconds already (a //1000 here would be the
    # nanos-era conversion and silently lands on milliseconds)
    e["us"] = e["ts"].astype("datetime64[us]").astype("int64")
    s = (e[e.event_type == "signup"].groupby("user_id")["us"].min())
    c = {}
    for uid, t0 in s.items():
        later = e[(e.event_type == "click") & (e.user_id == uid)
                  & (e.us > t0)]
        if len(later):
            c[uid] = (t0, int(later["us"].min()))
    p = {}
    for uid, (t0, t1) in c.items():
        later = e[(e.event_type == "purchase") & (e.user_id == uid)
                  & (e.us > t1)]
        if len(later):
            p[uid] = (t1, int(later["us"].min()))

    def check(hop, pairs):
        lat = sorted((t1 - t0, uid) for uid, (t0, t1) in pairs.items())
        n = len(lat)
        r = got[hop]
        assert r["n_users"] == n
        assert r["p50_us"] == lat[(n + 1) // 2 - 1][0]
        assert r["p90_us"] == lat[(9 * n + 9) // 10 - 1][0]
        assert r["p50_us"] <= r["p90_us"]

    check("signup->click", c)
    check("click->purchase", p)


def test_dq_key_skew_replays(spark, sf_dir):
    row = all_queries()["dq_key_skew"].fn(
        spark, sf_dir).collect()[0].asDict()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cnt = o.groupby("o_custkey").size()
    K, N = len(cnt), len(o)
    mx = int(cnt.max())
    ss = int((cnt.astype("int64") ** 2).sum())
    assert (row["n_keys"], row["n_rows"], row["max_cnt"]) == (K, N, mx)
    assert row["skew_ratio_ppm"] == (2 * 1000000 * mx * K + N) // (2 * N)
    assert row["chi_ppm"] == (2 * 1000000 * ss * K + N * N) // (2 * N * N)
    top = cnt.sort_values(ascending=False)
    top_keys = top[top == mx].index.min()  # count desc, key asc tie rule
    assert row["top_key"] == int(top_keys)
    assert row["top_cnt"] == mx
    # laws: skew ratio >= 1e6 (max >= mean), chi >= 1e6 (Cauchy-Schwarz)
    assert row["skew_ratio_ppm"] >= 1000000
    assert row["chi_ppm"] >= 1000000


def test_logistics_ship_delay_replays(spark, sf_dir):
    got = {r["flag"]: r.asDict() for r in
           all_queries()["logistics_ship_delay"].fn(
               spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["delay"] = (pd.to_datetime(m["l_shipdate"]).dt.normalize()
                  - pd.to_datetime(m["o_orderdate"]).dt.normalize()).dt.days
    for flag, grp in m.groupby("l_returnflag"):
        ds = sorted(grp["delay"])
        n = len(ds)
        r = got[flag]
        assert r["n_lines"] == n
        assert r["p50_days"] == ds[(n + 1) // 2 - 1]
        assert r["p90_days"] == ds[(9 * n + 9) // 10 - 1]
        assert r["p99_days"] == ds[(99 * n + 99) // 100 - 1]
        assert r["max_days"] == ds[-1]
        assert (r["p50_days"] <= r["p90_days"] <= r["p99_days"]
                <= r["max_days"])


def test_seasonal_strength_replays(spark, sf_dir):
    row = all_queries()["seasonal_strength"].fn(
        spark, sf_dir).collect()[0].asDict()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(day=pd.to_datetime(o["o_orderdate"]).dt.normalize(),
                 cents=(o["o_totalprice"] * 100 + 0.5).map(math.floor))
    daily = o.groupby("day")["cents"].sum().sort_index()
    days = list(daily.index)
    ys = list(daily.values)
    rem, det, deseas = [], [], []
    # centered 7-MA trend, half-away; weekday seasonal via shifted mean
    trends = {}
    for i in range(3, len(ys) - 3):
        ws = sum(ys[i - 3:i + 4])
        trends[i] = (2 * ws + 7) // 14
    by_dw = {}
    for i, tr in trends.items():
        dw = days[i].weekday()
        by_dw.setdefault(dw, []).append(int(ys[i] - tr))
    seas = {}
    C = 1000000000000
    for dw, ds in by_dw.items():
        cnt = len(ds)
        seas[dw] = (2 * (sum(ds) + cnt * C) + cnt) // (2 * cnt) - C
    for i, tr in trends.items():
        dw = days[i].weekday()
        dv = int(ys[i] - tr)
        det.append(dv)
        rem.append(dv - seas[dw])
        deseas.append(int(ys[i]) - seas[dw])

    def var_ratio(a, b):
        n = len(a)
        va = n * sum(x * x for x in a) - sum(a) ** 2
        vb = n * sum(x * x for x in b) - sum(b) ** 2
        return max(0, round((1.0 - va / vb) * 1e6))

    assert row["n"] == len(det)
    assert row["f_seasonal_ppm"] == var_ratio(rem, det)
    assert row["f_trend_ppm"] == var_ratio(rem, deseas)
    assert 0 <= row["f_seasonal_ppm"] <= 1000000
    assert 0 <= row["f_trend_ppm"] <= 1000000
