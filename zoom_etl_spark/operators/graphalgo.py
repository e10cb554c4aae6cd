"""Reusable graph-analytic kernels over edge-list DataFrames.

Companion to the iterative fixpoints living in ``dedup/cluster.py``
(connected components) and ``suite/graph.py`` (PageRank, BFS): this
module holds the non-iterative kernels that are pure joins, starting
with degree-oriented triangle counting. Kept as library functions so
suite queries stay thin and the kernels get brute-force property gates
(tests/test_graphalgo.py) on adversarial random graphs, independent of
any particular edge derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(edges: DataFrame, a: str = "s1", b: str = "s2") -> DataFrame:
    """Per-node triangle participation counts for an undirected simple
    graph given as unique edges with ``a < b`` per row.

    Degree orientation makes enumeration feasible on graphs with hubs:
    each edge is directed from its lower-(degree, id) endpoint, so every
    triangle is produced exactly once and the wedge join's work is
    Sum(out_degree^2) = O(m^1.5) instead of Sum(degree^2) — the
    standard trick (Schank & Wagner 2005; the same orientation behind
    every distributed triangle counter). Plan: the edge list feeds two
    broadcast degree joins (degree table is node-bounded), then two
    wedge joins + one closing equi-join; per-node counts are one
    map-combined explode/groupBy. Returns (id, n_tri) for nodes in at
    least one triangle."""
    edges = edges.select(F.col(a).alias("s1"), F.col(b).alias("s2"))
    deg = (edges.select(F.col("s1").alias("id"))
                .unionByName(edges.select(F.col("s2").alias("id")))
                .groupBy("id").agg(F.count("*").alias("deg")))
    e = (edges
         .join(F.broadcast(deg.withColumnRenamed("id", "s1")
                              .withColumnRenamed("deg", "d1")), "s1")
         .join(F.broadcast(deg.withColumnRenamed("id", "s2")
                              .withColumnRenamed("deg", "d2")), "s2")
         .select(
             F.when(F.expr("struct(d1, s1) < struct(d2, s2)"), F.col("s1"))
              .otherwise(F.col("s2")).alias("src"),
             F.when(F.expr("struct(d1, s1) < struct(d2, s2)"), F.col("s2"))
              .otherwise(F.col("s1")).alias("dst"),
             F.when(F.expr("struct(d1, s1) < struct(d2, s2)"),
                    F.expr("struct(d2 AS d, s2 AS i)"))
              .otherwise(F.expr("struct(d1 AS d, s1 AS i)")).alias("rdst")))
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                  F.col("rdst").alias("rv"))
    e2 = e.select(F.col("src").alias("u"), F.col("dst").alias("w"),
                  F.col("rdst").alias("rw"))
    wedges = e1.join(e2, "u").filter(F.col("rv") < F.col("rw"))
    closing = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    return (tri.select(F.explode(F.array("u", "v", "w")).alias("id"))
               .groupBy("id").agg(F.count("*").alias("n_tri")))


def sssp_bounded(edges: DataFrame, seeds: DataFrame, k: int) -> DataFrame:
    """Bounded-radius multi-seed shortest paths by DELTA-frontier
    Bellman-Ford: ``edges`` = directed (u, v, w) with non-negative
    integer weights (materialize both directions for an undirected
    graph), ``seeds`` = (id, dist) starting distances; returns (id,
    dist) = the exact minimum over paths of at most ``k`` edges for
    every reached node.

    Each round relaxes ONLY edges leaving nodes whose distance improved
    the round before — after k rounds the result is provably identical
    to k full relaxation sweeps (an improvement propagates the round
    after it lands), but a round's join is frontier-sized, not
    settled-set-sized, which is the difference between O(k·|E|) and
    O(Σ frontier_k · avg_deg) work on a cluster. Per round: one
    frontier⋈edges equi-join + map-combined groupBy-min + a full-outer
    reconcile with the running distance table; each round's table is
    localCheckpointed so lineage stays flat (the ``dedup/cluster.py``
    iterative discipline). Property-gated against a pure-Python
    Bellman-Ford on adversarial random graphs
    (tests/test_graphalgo.py)."""
    dist = seeds.select("id", F.col("dist").cast("long").alias("dist"))
    frontier = dist
    for _ in range(k):
        best = (edges.join(frontier.withColumnRenamed("id", "u"), "u")
                     .groupBy(F.col("v").alias("id"))
                     .agg(F.min(F.col("dist") + F.col("w")).alias("nd")))
        merged = (dist.join(best, "id", "full_outer")
                      .select("id", F.least("dist", "nd").alias("dist"),
                              (F.col("dist").isNull()
                               | (F.col("nd") < F.col("dist")))
                              .alias("improved"))
                      .localCheckpoint(eager=False))
        frontier = merged.filter("improved").select("id", "dist")
        dist = merged.select("id", "dist")
    return dist
