"""Vector math over ``array<float>`` embedding columns — pure higher-order
functions (zip_with / aggregate), evaluated JVM-side per row with no
Python round trip. Doubles throughout for numeric stability.

For the 100 TB posture: these are per-row O(dim) expressions that
pipeline inside whole-stage codegen; the expensive part of similarity
search is candidate generation, handled by LSH bucketing (see
zoom_etl_spark.dedup.lsh), not by the arithmetic here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


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


def cosine_similarity_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched cosine similarity (pandas_udf + numpy).

    The HOF expression path (``cosine_similarity``) is evaluated by the
    interpreted expression walker per element — fine for one broadcast
    query vector, ~60µs/pair on 64-dim pairs. For pair-heavy jobs
    (near-dup sweeps) this vectorized path batches thousands of pairs per
    Arrow exchange and does the math as numpy matrix ops. float64
    throughout; NULL/zero-norm → NULL, matching the HOF variant.
    """
    return _cos_arrow(_c(a), _c(b))


# DataType object, not DDL string: string return types are parsed at
# decoration time and would demand a live SparkSession at import
@pandas_udf(DoubleType())
def _cos_arrow(xs: pd.Series, ys: pd.Series) -> pd.Series:
    # NULL or length-mismatched pairs return NULL instead of letting
    # np.stack blow up the whole task on one bad row (the docstring's
    # "NULL → NULL, matching the HOF variant" promise, made real);
    # same-length valid pairs batch per length so ragged corpora with
    # internally-consistent pairs still vectorize.
    la = xs.map(lambda v: -1 if v is None else len(v)).to_numpy()
    lb = ys.map(lambda v: -1 if v is None else len(v)).to_numpy()
    out = np.full(len(xs), np.nan)
    valid = (la > 0) & (la == lb)
    for length in np.unique(la[valid]):
        m = valid & (la == length)
        va = np.stack(xs[m].to_numpy()).astype(np.float64)
        vb = np.stack(ys[m].to_numpy()).astype(np.float64)
        denom = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.einsum("ij,ij->i", va, vb) / denom
        sim[denom == 0] = np.nan
        out[m] = sim
    s = pd.Series(out)
    return s.where(np.isfinite(s), other=None)
