"""Pure-Python replay gates for feature_hash_tf (hashlib twin of the
md5 hash kernel), skipgram_cooc (windowed pair counting), and the
wave's experimentation/robust-stats queries (ab_sequential_obf,
trimmed_mean_robust)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from zoom_etl_spark.registry import all_queries


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_feature_hash_tf_replays(spark, sf_dir):
    got = {(r["doc_id"], r["bucket"]): r["feat"] for r in
           all_queries()["feature_hash_tf"].fn(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = defaultdict(int)
    for doc_id, text in zip(d["doc_id"], d["text"]):
        for term, tf in Counter(
                x for x in text.split(" ") if x).items():
            h = _h32(term)
            want[(int(doc_id), (h // 2) % 32)] += tf if h % 2 == 0 else -tf
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want
    # the kernel actually uses both signs (collision cancellation is
    # live, not vacuous)
    assert any(v < 0 for v in got.values())
    assert any(v > 0 for v in got.values())


def test_skipgram_cooc_replays(spark, sf_dir):
    rows = [(r["a"], r["b"], r["c"]) for r in
            all_queries()["skipgram_cooc"].fn(spark, sf_dir).collect()]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cnt = Counter()
    for text in d["text"]:
        toks = [x for x in text.split(" ") if x]
        for i, a in enumerate(toks):
            for dd in (1, 2):
                if i + dd < len(toks):
                    cnt[(a, toks[i + dd])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert rows == [(a, b, c) for (a, b), c in want]


def test_ab_sequential_obf_replays(spark, sf_dir):
    rows = {r["look"]: r.asDict() for r in
            all_queries()["ab_sequential_obf"].fn(spark, sf_dir).collect()}
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = pd.to_datetime(e["ts"]).astype("int64") // 1000
    t0, t1 = int(us.min()), int(us.max())
    look = ((us - t0) * 5 // (t1 - t0 + 1)).clip(upper=4) + 1
    cents = (e["value"] * 100 + 0.5).map(math.floor)
    grp = e["user_id"] % 2
    bounds = [4.5622, 3.226, 2.634, 2.2811, 2.0403]
    assert set(rows) == {1, 2, 3, 4, 5}
    for k in range(1, 6):
        sel = look <= k
        a = cents[sel & (grp == 0)]
        b = cents[sel & (grp == 1)]
        na, nb = len(a), len(b)
        sa, sb = float(a.sum()), float(b.sum())
        ssa = float((a.astype("int64") ** 2).sum())
        ssb = float((b.astype("int64") ** 2).sum())
        z = ((sa / na - sb / nb)
             / math.sqrt((ssa / na - (sa / na) ** 2) / na
                         + (ssb / nb - (sb / nb) ** 2) / nb))
        r = rows[k]
        assert (r["na"], r["nb"]) == (na, nb)
        assert r["z"] == pytest.approx(z, abs=2e-6)
        assert r["bound"] == bounds[k - 1]
        assert r["reject"] == (abs(r["z"]) > bounds[k - 1])
    # cumulative looks are nested: sample sizes strictly increase
    assert all(rows[k]["na"] < rows[k + 1]["na"] for k in range(1, 5))


def test_trimmed_mean_replays(spark, sf_dir):
    got = {r["seg"]: r.asDict() for r in
           all_queries()["trimmed_mean_robust"].fn(spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m["cents"] = (m["o_totalprice"] * 100 + 0.5).map(math.floor)
    for seg, grp in m.groupby("c_mktsegment"):
        vals = sorted(zip(grp["cents"], grp["o_orderkey"]))
        cents = [v for v, _ in vals]
        n = len(cents)
        kt = n // 20
        mid = cents[kt:n - kt]
        lo_v, hi_v = cents[kt], cents[n - kt - 1]
        r = got[seg]
        assert (r["n"], r["k_trim"]) == (n, kt)
        assert (r["lo_cents"], r["hi_cents"]) == (lo_v, hi_v)
        assert r["trimmed_mean"] == round(sum(mid) / len(mid), 4)
        wins = sum(mid) + kt * lo_v + kt * hi_v
        assert r["winsorized_mean"] == round(wins / n, 4)
        # robustness direction: both robust means are bracketed by the
        # boundary order statistics
        assert lo_v <= r["trimmed_mean"] <= hi_v
        assert lo_v <= r["winsorized_mean"] <= hi_v


def test_collocation_llr_replays(spark, sf_dir):
    rows = [r.asDict() for r in
            all_queries()["collocation_llr"].fn(spark, sf_dir).collect()]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bg = Counter()
    for text in d["text"]:
        toks = [x for x in text.split(" ") if x]
        for i in range(len(toks) - 1):
            bg[(toks[i], toks[i + 1])] += 1
    ra = Counter()
    cb = Counter()
    for (a, b), c in bg.items():
        ra[a] += c
        cb[b] += c
    n = sum(bg.values())

    def t(o, r, c):
        if o == 0:
            return 0
        return math.floor(o * math.log(o * n / (r * c)) * 1e6 + 0.5)

    cand = []
    for (a, b), o11 in bg.items():
        if o11 < 25:
            continue
        r1, c1 = ra[a], cb[b]
        llr = 2 * (t(o11, r1, c1) + t(r1 - o11, r1, n - c1)
                   + t(c1 - o11, n - r1, c1)
                   + t(n - r1 - c1 + o11, n - r1, n - c1))
        cand.append((llr, a, b, o11, r1, c1))
    cand.sort(key=lambda x: (-x[0], x[1], x[2]))
    want = cand[:50]
    assert len(rows) == len(want)
    for r, (llr, a, b, o11, r1, c1) in zip(rows, want):
        assert (r["a"], r["b"], r["o11"], r["r1"], r["c1"]) == \
            (a, b, o11, r1, c1)
        assert r["llr_e6"] == llr
        assert llr >= 0 or llr > -10  # G2 >= 0 up to quantization slack


def test_uplift_by_segment_replays(spark, sf_dir):
    got = {r["seg"]: r.asDict() for r in
           all_queries()["ab_uplift_by_segment"].fn(
               spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m["grp"] = m["o_custkey"] % 2
    m["conv"] = (m["o_totalprice"] > 150000).astype(int)
    for seg, grp in m.groupby("c_mktsegment"):
        nc = int((grp["grp"] == 0).sum())
        nt = int((grp["grp"] == 1).sum())
        cc = int(grp.loc[grp["grp"] == 0, "conv"].sum())
        ct = int(grp.loc[grp["grp"] == 1, "conv"].sum())
        r = got[seg]
        assert (r["nc"], r["nt"], r["cc"], r["ct"]) == (nc, nt, cc, ct)
        want = ((2 * 1000000 * ct + nt) // (2 * nt)
                - (2 * 1000000 * cc + nc) // (2 * nc))
        assert r["uplift_ppm"] == want
        p = (ct + cc) / (nt + nc)
        z = ((ct / nt - cc / nc)
             / math.sqrt(p * (1 - p) * (1 / nt + 1 / nc)))
        import pytest as _pt
        assert r["z"] == _pt.approx(z, abs=2e-6)
        # parity arms are a null comparison: |z| should rarely scream
        assert abs(r["z"]) < 6


def test_markov_perplexity_replays(spark, sf_dir):
    row = all_queries()["markov_perplexity"].fn(
        spark, sf_dir).collect()[0].asDict()
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["us"] = e["ts"].astype("datetime64[us]").astype("int64")
    mid = (int(e["us"].min()) + int(e["us"].max())) // 2
    e = e.sort_values(["user_id", "us", "event_id"])
    trn = Counter()
    ev = Counter()
    for _, grp in e.groupby("user_id"):
        types = list(grp["event_type"])
        times = list(grp["us"])
        for i in range(len(types) - 1):
            pair = (types[i], types[i + 1])
            (trn if times[i + 1] < mid else ev)[pair] += 1
    ca = Counter()
    for (a, _), c in trn.items():
        ca[a] += c
    n_eval = sum(ev.values())
    ll = 0
    for (a, b), c in ev.items():
        lnp = math.floor(
            math.log((trn.get((a, b), 0) + 1.0) / (ca.get(a, 0) + 5.0))
            * 1e6 + 0.5)
        ll += c * lnp
    nll = (2 * (-ll) + n_eval) // (2 * n_eval)
    assert (row["n_train"], row["n_eval"]) == (sum(trn.values()), n_eval)
    assert row["avg_nll_e6"] == nll
    assert row["ppl_e6"] == round(math.exp(nll / 1e6) * 1e6)
    # perplexity of a 5-symbol process lies in (1, 5+smoothing slack]
    assert 1000000 < row["ppl_e6"] < 6200000
