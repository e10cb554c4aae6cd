"""Pure-Python replay gates for search_ndcg (full BM25 + NDCG replay
with math.log — independent of both engines' SQL) and
source_term_cosine (collections.Counter dot products)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from zoom_etl_spark.registry import all_queries

TERMS = ["join", "stream", "filter"]


def _toklists(sf_dir: str) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d["toks"] = d["text"].map(lambda t: [x for x in t.split(" ") if x])
    return d


def test_search_ndcg_replays(spark, sf_dir):
    row = all_queries()["search_ndcg"].fn(spark, sf_dir).collect()[0]
    d = _toklists(sf_dir)
    nd = float(len(d))
    tottok = int(d["toks"].map(len).sum())
    avgdl = tottok / nd
    df = {t: int(d["toks"].map(lambda ts: t in ts).sum()) for t in TERMS}
    scores = {}
    for doc_id, toks in zip(d["doc_id"], d["toks"]):
        c = Counter(toks)
        s = 0.0
        hit = False
        for t in TERMS:
            tf = c.get(t, 0)
            if tf == 0:
                continue
            hit = True
            idf = math.log((nd - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75
                                               * len(toks) / avgdl))
        if hit:
            scores[int(doc_id)] = round(s, 4)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rel = {int(i): sum(1 for t in TERMS if t in set(ts))
           for i, ts in zip(d["doc_id"], d["toks"])}
    disc = [round(1e9 / math.log2(i + 1)) for i in range(1, 11)]
    dcg = sum((2 ** rel[doc] - 1) * disc[i]
              for i, (doc, _) in enumerate(top))
    grades = sorted((rel[int(i)] for i in d["doc_id"]), reverse=True)[:10]
    idcg = sum((2 ** g - 1) * disc[i] for i, g in enumerate(grades))
    assert row["dcg_e9"] == dcg
    assert row["idcg_e9"] == idcg
    assert row["ndcg_ppm"] == (2 * 1000000 * dcg + idcg) // (2 * idcg)
    assert 0 < row["ndcg_ppm"] <= 1000000


def test_source_term_cosine_replays(spark, sf_dir):
    rows = {(r["s1"], r["s2"]): r.asDict() for r in
            all_queries()["source_term_cosine"].fn(spark, sf_dir).collect()}
    d = _toklists(sf_dir)
    tf = {src: Counter(t for ts in grp["toks"] for t in ts)
          for src, grp in d.groupby("source")}
    srcs = sorted(tf)
    expected_pairs = {(a, b) for i, a in enumerate(srcs)
                      for b in srcs[i + 1:]}
    assert set(rows) == expected_pairs
    for (a, b), r in rows.items():
        dot = sum(c * tf[b][t] for t, c in tf[a].items())
        n1 = sum(c * c for c in tf[a].values())
        n2 = sum(c * c for c in tf[b].values())
        assert (r["dot"], r["n1_sq"], r["n2_sq"]) == (dot, n1, n2)
        want = dot / (math.sqrt(n1) * math.sqrt(n2))
        assert r["cosine"] == pytest.approx(want, abs=1.5e-6)
        assert 0.0 <= r["cosine"] <= 1.0
