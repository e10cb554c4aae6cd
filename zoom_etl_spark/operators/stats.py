"""Persistent, mergeable count-min skew statistics (ROADMAP item 3).

A count-min sketch is a fixed-size linear projection of the key-frequency
vector: counters[i][b] = Σ count(k) over keys k with hash_i(k) = b. Being
linear makes it MERGEABLE — the sketch of A ∪ B is the element-wise sum
of the sketches of A and B (same width/depth/seeds), exactly. That turns
skew stats from a per-run cost into an incremental asset: sketch each
ingested partition once, merge into the table's cached sketch, and every
subsequent ``auto_join`` plan decision reads the cache instead of
re-scanning 100 TB.

Hot-key CANDIDATES (a CMS can estimate any key but enumerate none) ride
along from ``freqItems``; their bucket coordinates are computed at build
time through the SAME Spark hash expressions as the sketch, so estimates
stay valid across merge/save/load. Candidate merge is set-union — each
side's hot keys are estimated against the merged counters.

The reference has no statistics at all (its chunk splitter assumes
uniform keys, SURVEY.md §4.1); this is the Spark-scale replacement.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_exprs(key: str, width: int, depth: int):
    """The canonical key→bucket hash expressions. Every sketch build and
    every candidate estimation MUST go through these, or counters and
    probes would disagree."""
    return [F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(width))
            .cast("int").alias(f"b{i}") for i in range(depth)]


@dataclass
class CMSketch:
    """Count-min sketch + hot-key candidates. ``counters`` is dense
    depth×width (a few hundred KB at the default 4×8192 — driver-scale).
    ``candidates`` maps each hot-key candidate to its per-row bucket
    coordinates."""
    width: int
    depth: int
    n: int = 0
    counters: list[list[int]] = field(default_factory=list)
    candidates: list[tuple] = field(default_factory=list)  # (value, [b0..])

    def estimate(self, buckets: list[int]) -> int:
        """CMS point estimate: min over hash rows (overshoots only)."""
        return min(self.counters[i][b] for i, b in enumerate(buckets))

    def top_estimate(self) -> int:
        if not (self.n and self.candidates):
            return 0
        return max(self.estimate(b) for _, b in self.candidates)

    def merge(self, other: "CMSketch") -> "CMSketch":
        """Element-wise counter sum — exact sketch of the row union
        (linearity). Requires identical geometry (same seeds are implied:
        the hash family is fixed by ``_bucket_exprs``)."""
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError(
                f"cannot merge CMS of geometry {(self.width, self.depth)} "
                f"with {(other.width, other.depth)}")
        counters = [[a + b for a, b in zip(ra, rb)]
                    for ra, rb in zip(self.counters, other.counters)]
        seen, cands = set(), []
        for v, b in [*self.candidates, *other.candidates]:
            if v not in seen:
                seen.add(v)
                cands.append((v, list(b)))
        return CMSketch(self.width, self.depth, self.n + other.n,
                        counters, cands)

    def save(self, path: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"width": self.width, "depth": self.depth,
                       "n": self.n, "counters": self.counters,
                       "candidates": [[v, b] for v, b in self.candidates]},
                      f)
        os.replace(tmp, path)  # atomic: readers never see a torn sketch

    @classmethod
    def load(cls, path: str) -> "CMSketch":
        with open(path) as f:
            d = json.load(f)
        return cls(d["width"], d["depth"], d["n"], d["counters"],
                   [(v, b) for v, b in d["candidates"]])


def build_cms(df: DataFrame, key: str, sample_fraction: float = 0.01,
              width: int = 8192, depth: int = 4,
              support: float = 0.02) -> CMSketch:
    """One-pass sketch build: sample → explode (hash-row, bucket) pairs →
    groupBy bounded by depth×width groups (map-side combined) → driver
    collect of ≤ depth×width rows, REGARDLESS of key cardinality.
    ``sample_fraction=1.0`` sketches exactly (used by the merge-equality
    test; production keeps the sample)."""
    s = (df.select(key) if sample_fraction >= 1.0
         else df.select(key).sample(fraction=sample_fraction, seed=7))
    bucket = _bucket_exprs(key, width, depth)
    pairs = (s.select(*bucket)
             .select(F.explode(F.array(*[
                 F.struct(F.lit(i).alias("i"), F.col(f"b{i}").alias("b"))
                 for i in range(depth)])).alias("ib"))
             .select("ib.i", "ib.b"))
    grid = [[0] * width for _ in range(depth)]
    for r in pairs.groupBy("i", "b").agg(F.count("*").alias("cnt")).collect():
        grid[r["i"]][r["b"]] = r["cnt"]
    n = sum(grid[0])

    cands: list[tuple] = []
    raw = s.stat.freqItems([key], support).first()[0] if n else []
    if raw:
        cdf = df.sparkSession.createDataFrame([(c,) for c in raw], s.schema)
        # candidates hashed through the SAME expressions as the sketch
        for r in cdf.select(F.col(key), *bucket).collect():
            cands.append((r[key], [r[f"b{i}"] for i in range(depth)]))
    return CMSketch(width, depth, n, grid, cands)


def cached_cms(df: DataFrame, key: str, cache_path: str,
               sample_fraction: float = 0.01, width: int = 8192,
               depth: int = 4, support: float = 0.02) -> CMSketch:
    """Load the table's sketch from ``cache_path`` if present, else build
    and persist it. Callers that ingest incrementally sketch only the new
    partition and ``merge``+``save`` — this helper is the read side."""
    if os.path.exists(cache_path):
        return CMSketch.load(cache_path)
    sk = build_cms(df, key, sample_fraction, width, depth, support)
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    sk.save(cache_path)
    return sk
