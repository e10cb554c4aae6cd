"""Vector math over ``array<float>`` embedding columns — pure higher-order
functions (zip_with / aggregate), evaluated JVM-side per row with no
Python round trip. Doubles throughout for numeric stability.

For the 100 TB posture: these are per-row O(dim) expressions that
pipeline inside whole-stage codegen; the expensive part of similarity
search is candidate generation, handled by LSH bucketing (see
zoom_etl_spark.dedup.lsh), not by the arithmetic here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays (double accumulation,
    sequential left-to-right — deterministic)."""
    prods = F.zip_with(_c(a), _c(b),
                       lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    denom = na * nb
    return F.when(denom != 0, dot(a, b) / denom)
