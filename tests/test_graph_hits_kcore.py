"""Pure-Python replay gates for graph_hits (integer max-norm power
iteration replayed with dicts) and graph_kcore (synchronous peeling
replayed, plus a fixpoint check that 4 rounds suffice on this graph)."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from zoom_etl_spark.registry import all_queries


def _edges(sf_dir: str):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    m = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    return sorted({(int(c), int(s))
                   for c, s in zip(m["o_custkey"], m["l_suppkey"])})


def test_hits_replays(spark, sf_dir):
    got = {(r["kind"], r["id"]): r["score_e6"] for r in
           all_queries()["graph_hits"].fn(spark, sf_dir).collect()}
    edges = _edges(sf_dir)
    h = {c: 1000000 for c, _ in edges}
    a = {}
    for _ in range(3):
        araw = defaultdict(int)
        for c, s in edges:
            araw[s] += h[c]
        am = max(araw.values())
        a = {s: 1000000 * v // am for s, v in araw.items()}
        hraw = defaultdict(int)
        for c, s in edges:
            hraw[c] += a[s]
        hm = max(hraw.values())
        h = {c: 1000000 * v // hm for c, v in hraw.items()}
    want = {("hub", c): v for c, v in h.items()}
    want.update({("auth", s): v for s, v in a.items()})
    assert got == want
    # normalization law: at least one node sits at exactly 1e6 per side
    assert max(v for (k, _), v in got.items() if k == "hub") == 1000000
    assert max(v for (k, _), v in got.items() if k == "auth") == 1000000


def _peel(edges, k):
    e = set(edges)
    rounds = 0
    while True:
        dc = defaultdict(int)
        ds = defaultdict(int)
        for c, s in e:
            dc[c] += 1
            ds[s] += 1
        ne = {(c, s) for c, s in e if dc[c] >= k and ds[s] >= k}
        rounds += 1
        if ne == e:
            return e, rounds
        e = ne


def test_kcore_replays_and_converges(spark, sf_dir):
    got = {(r["kind"], r["id"]): r.asDict() for r in
           all_queries()["graph_kcore"].fn(spark, sf_dir).collect()}
    edges = _edges(sf_dir)
    core, rounds = _peel(edges, 10)
    # the bounded-round operator must have REACHED the fixpoint: if the
    # true peeling needs more than 4 rounds this graph outgrew the
    # bound and the constant must be raised
    assert rounds <= 4, f"peeling needed {rounds} rounds"
    dc = defaultdict(int)
    ds = defaultdict(int)
    for c, s in core:
        dc[c] += 1
        ds[s] += 1
    nodes = {("c", c) for c, _ in edges} | {("s", s) for _, s in edges}
    assert set(got) == nodes
    for (kind, nid), r in got.items():
        deg = (dc if kind == "c" else ds).get(nid, 0)
        assert r["in_core"] == (deg >= 10), (kind, nid)
        assert r["core_deg"] == (deg if deg >= 10 else 0)
    # peeling cascaded: someone alive at round 0 must have died (else
    # the test data exercises nothing) — degree-1 suppliers exist
    assert any(not r["in_core"] for r in got.values())
    assert any(r["in_core"] for r in got.values())
