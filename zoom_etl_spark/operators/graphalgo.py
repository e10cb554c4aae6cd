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
