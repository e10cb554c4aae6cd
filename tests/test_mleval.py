"""Pure-Python replay gates for the model-evaluation family
(suite/mleval.py): the statistics are recomputed from the raw parquet
with independent Python code (no SQL, no Spark) and compared
value-for-value — catching any shared misconception the Spark/DuckDB
oracle pair could agree on. Plus structural property gates (decile
partition laws, gains monotonicity) that hold for ANY data."""

from __future__ import annotations

import pandas as pd
import pytest

from zoom_etl_spark.registry import all_queries

STOPS = {"the", "a", "of", "and", "in", "to"}


def _docs(sf_dir: str) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = d["text"].map(lambda t: [x for x in t.split(" ") if x != ""])
    d["score"] = (
        -300
        + 12 * toks.map(lambda ts: min(len(ts), 50))
        - 40 * toks.map(lambda ts: sum(1 for x in ts if x in STOPS))
        + 2 * (d["text"].str.len() // 10)
    )
    d["y"] = d["lang"] == "en"
    return d


def _half_away(num: int, den: int) -> int:
    return (2 * num + den) // (2 * den)


def test_auc_by_source_replays(spark, sf_dir):
    got = {r["source"]: r.asDict() for r in
           all_queries()["model_auc_by_source"].fn(spark, sf_dir).collect()}
    d = _docs(sf_dir)
    assert set(got) == set(d["source"].unique())
    for src, grp in d.groupby("source"):
        pos = sorted(grp.loc[grp["y"], "score"])
        neg = sorted(grp.loc[~grp["y"], "score"])
        u2 = sum(2 * sum(1 for x in neg if x < p)
                 + sum(1 for x in neg if x == p) for p in pos)
        row = got[src]
        assert (row["n_pos"], row["n_neg"], row["u2"]) == \
            (len(pos), len(neg), u2), src
        assert row["auc_ppm"] == _half_away(
            1000000 * u2, 2 * len(pos) * len(neg)), src
        assert 0 <= row["auc_ppm"] <= 1000000


def test_calibration_bins_partition_laws(spark, sf_dir):
    rows = sorted(
        (r.asDict() for r in
         all_queries()["model_calibration_bins"].fn(spark, sf_dir).collect()),
        key=lambda r: r["decile"])
    d = _docs(sf_dir)
    n = len(d)
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n"] for r in rows) == n
    assert sum(r["pos"] for r in rows) == int(d["y"].sum())
    # ntile law: first n%10 deciles carry one extra row
    q, rmd = divmod(n, 10)
    assert [r["n"] for r in rows] == [q + 1] * rmd + [q] * (10 - rmd)
    # ascending-score deciles => nondecreasing mean score
    means = [r["mean_logit"] for r in rows]
    assert means == sorted(means)
    for r in rows:
        assert r["pos_ppm"] == _half_away(1000000 * r["pos"], r["n"])


def test_gains_deciles_replays(spark, sf_dir):
    rows = sorted(
        (r.asDict() for r in
         all_queries()["model_gains_deciles"].fn(spark, sf_dir).collect()),
        key=lambda r: r["decile"])
    d = _docs(sf_dir)
    # independent replay: sort by (score desc, doc_id desc), cut ntile
    sd = d.sort_values(["score", "doc_id"],
                       ascending=[False, False]).reset_index()
    n, k = len(sd), 10
    q, rmd = divmod(n, k)
    sizes = [q + 1] * rmd + [q] * (k - rmd)
    tot_pos = int(d["y"].sum())
    start, cum_n, cum_pos = 0, 0, 0
    for r, size in zip(rows, sizes):
        chunk = sd.iloc[start:start + size]
        start += size
        cum_n += size
        cum_pos += int(chunk["y"].sum())
        assert r["n"] == size
        assert r["cum_n"] == cum_n and r["cum_pos"] == cum_pos
        assert r["gain_ppm"] == _half_away(1000000 * cum_pos, tot_pos)
        assert r["lift_ppm"] == _half_away(
            1000000 * cum_pos * n, cum_n * tot_pos)
    # totals close: last decile captures everything, lift = 1.0
    assert rows[-1]["gain_ppm"] == 1000000
    assert rows[-1]["lift_ppm"] == 1000000
    # gains are nondecreasing in depth
    gains = [r["gain_ppm"] for r in rows]
    assert gains == sorted(gains)


def test_target_encode_loo_replays(spark, sf_dir):
    got = {r["doc_id"]: r.asDict() for r in
           all_queries()["target_encode_loo"].fn(spark, sf_dir).collect()}
    d = _docs(sf_dir)
    cat_n = d.groupby("source")["y"].count()
    cat_pos = d.groupby("source")["y"].sum()
    tot_n, tot_pos = len(d), int(d["y"].sum())
    prior = _half_away(1000000 * tot_pos, tot_n)
    assert len(got) == tot_n
    for _, row in d.iterrows():
        g = got[row["doc_id"]]
        cn, cp, y = int(cat_n[row["source"]]), int(cat_pos[row["source"]]), \
            int(row["y"])
        want = (_half_away(1000000 * (cp - y), cn - 1) if cn > 1 else prior)
        assert g["enc_ppm"] == want, row["doc_id"]
        assert g["y"] == y


def test_target_encode_no_self_leakage(spark, sf_dir):
    """The defining LOO property: a row's own label must not move its
    encoding. Flipping one row's label changes every OTHER same-category
    row's encoding but leaves the flipped row's own encoding derived
    solely from its peers: enc(row) depends only on peers' labels."""
    d = _docs(sf_dir)
    src = d["source"].iloc[0]
    grp = d[d["source"] == src]
    # independent recompute of enc for two rows with DIFFERENT labels in
    # the same category: enc difference must equal exactly the label
    # swap delta 1e6/(n-1), i.e. the encoding excludes self
    pos_row = grp[grp["y"]].iloc[0]
    neg_row = grp[~grp["y"]].iloc[0]
    cn, cp = len(grp), int(grp["y"].sum())
    enc_pos = _half_away(1000000 * (cp - 1), cn - 1)
    enc_neg = _half_away(1000000 * cp, cn - 1)
    got = {r["doc_id"]: r["enc_ppm"] for r in
           all_queries()["target_encode_loo"].fn(spark, sf_dir).collect()}
    assert got[pos_row["doc_id"]] == enc_pos
    assert got[neg_row["doc_id"]] == enc_neg
    assert enc_neg > enc_pos  # excluding a positive lowers the rate


def test_feature_lag_matrix_replays(spark, sf_dir):
    rows = all_queries()["feature_lag_matrix"].fn(spark, sf_dir).collect()
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts = pd.to_datetime(e["ts"])
    e = e.assign(day=ts.dt.date,
                 cents=(e["value"] * 100 + 0.5).map(int))
    daily = (e.groupby(["user_id", "day"])
              .agg(n_events=("value", "size"), val_cents=("cents", "sum"))
              .reset_index())
    key = {(r.user_id, r.day): (r.n_events, r.val_cents)
           for r in daily.itertuples()}
    assert len(rows) == len(key)
    for r in rows:
        day = r["day"]
        n, c = key[(r["user_id"], day)]
        assert (r["n_events"], r["val_cents"]) == (n, c)
        prev = key.get((r["user_id"], day - pd.Timedelta(days=1).to_pytimedelta()))
        if prev is None:
            assert r["lag1_n"] is None and r["lag1_cents"] is None
        else:
            assert (r["lag1_n"], r["lag1_cents"]) == prev
        win = [key.get((r["user_id"],
                        day - pd.Timedelta(days=k).to_pytimedelta()))
               for k in range(7)]
        win = [w for w in win if w is not None]
        assert r["roll7_n"] == sum(w[0] for w in win)
        assert r["roll7_cents"] == sum(w[1] for w in win)


def test_feature_lag_matrix_calendar_gap():
    """floor(value*100+0.5) in the replay must match the engines on the
    synthetic doubles — spot-guard the cents convention used above."""
    import math
    for v in (0.005, 1.005, 2.675, 99.994999, 10.0):
        assert int(v * 100 + 0.5) == math.floor(v * 100 + 0.5)


def test_conformal_threshold_replays(spark, sf_dir):
    rows = {r["c_permil"]: r.asDict() for r in
            all_queries()["conformal_threshold"].fn(spark, sf_dir).collect()}
    d = _docs(sf_dir)
    cal = d[d["doc_id"] % 5 == 0].sort_values(["score", "doc_id"])
    ev = d[d["doc_id"] % 5 != 0]
    n_cal, eval_n = len(cal), len(ev)
    assert set(rows) == {800, 900, 950, 990}
    for c, r in rows.items():
        k = min(-(-(n_cal + 1) * c // 1000), n_cal)
        thr = int(cal["score"].iloc[k - 1])
        covered = int((ev["score"] <= thr).sum())
        assert (r["n_cal"], r["k"], r["thr_score"]) == (n_cal, k, thr), c
        assert (r["eval_n"], r["covered"]) == (eval_n, covered)
        assert r["cov_ppm"] == _half_away(1000000 * covered, eval_n)
        # conformal validity direction: achieved coverage should not sit
        # wildly under target (exchangeability holds by construction
        # here, so allow a generous finite-sample band)
        assert r["cov_ppm"] >= c * 1000 - 100000
    # thresholds are monotone in the target coverage
    thrs = [rows[c]["thr_score"] for c in (800, 900, 950, 990)]
    assert thrs == sorted(thrs)


def test_woe_iv_replays(spark, sf_dir):
    import math
    got = {r["source"]: r.asDict() for r in
           all_queries()["encode_woe_iv"].fn(spark, sf_dir).collect()}
    d = _docs(sf_dir)
    tot_pos = int(d["y"].sum())
    tot_neg = len(d) - tot_pos
    assert set(got) == set(d["source"].unique())
    for src, grp in d.groupby("source"):
        cp = int(grp["y"].sum())
        cn = len(grp) - cp
        r = got[src]
        assert (r["cat_pos"], r["cat_neg"]) == (cp, cn)
        if cp == 0 or cn == 0:
            assert r["woe_e6"] is None and r["iv_e9"] is None
            continue
        woe = math.log(cp * tot_neg / (cn * tot_pos))
        assert r["woe_e6"] == round(woe * 1e6)
        iv = (cp / tot_pos - cn / tot_neg) * woe
        assert r["iv_e9"] == round(iv * 1e9)
        # IV contributions are nonnegative by construction: the sign of
        # (dist_pos - dist_neg) always matches the sign of the log-odds
        assert r["iv_e9"] >= 0


def test_mleval_e2e_scorecard_replays(spark, sf_dir):
    import math
    row = all_queries()["pipeline_mleval_e2e"].fn(
        spark, sf_dir).collect()[0].asDict()
    d = _docs(sf_dir)
    n = len(d)
    n_pos = int(d["y"].sum())
    assert (row["n"], row["n_pos"]) == (n, n_pos)
    assert row["pos_ppm"] == _half_away(1000000 * n_pos, n)
    # pooled AUC by rank-sum
    pos = sorted(d.loc[d["y"], "score"])
    neg = sorted(d.loc[~d["y"], "score"])
    u2 = sum(2 * sum(1 for x in neg if x < p)
             + sum(1 for x in neg if x == p) for p in pos)
    assert row["auc_ppm"] == _half_away(1000000 * u2,
                                        2 * len(pos) * len(neg))
    # ECE over ntile(10) of the unique (score, doc_id) order
    sd = d.sort_values(["score", "doc_id"]).reset_index()
    sd["p_e6"] = sd["score"].map(
        lambda s: math.floor(1e6 / (1 + math.exp(-s / 100.0)) + 0.5))
    q, rmd = divmod(n, 10)
    sizes = [q + 1] * rmd + [q] * (10 - rmd)
    start, ece_num = 0, 0
    bsum = 0
    for size in sizes:
        chunk = sd.iloc[start:start + size]
        start += size
        obs = _half_away(1000000 * int(chunk["y"].sum()), size)
        pred = _half_away(int(chunk["p_e6"].sum()), size)
        ece_num += abs(obs - pred) * size
    for pe6, y in zip(sd["p_e6"], sd["y"]):
        dev = int(pe6) - (1000000 if y else 0)
        bsum += dev * dev
    assert row["ece_e6"] == _half_away(ece_num, n)
    assert row["brier_e6"] == _half_away(bsum, n * 1000000)
    # health laws: AUC of a real signal beats chance; ECE and Brier in
    # range
    assert row["auc_ppm"] > 500000
    assert 0 <= row["ece_e6"] <= 1000000
    assert 0 <= row["brier_e6"] <= 1000000
