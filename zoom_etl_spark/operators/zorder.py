"""Z-order (Morton) clustering key for multi-dimensional data skipping.

Partitioning prunes on ONE directory column; parquet min/max row-group
stats prune on the SORT column. When queries filter on several columns,
sorting by an interleaved-bit Z-value keeps rows close in every
dimension at once, so min/max stats stay tight for ALL of them —
Delta/Iceberg OPTIMIZE ZORDER, on plain parquet.

Implementation: rank each column into 2^bits buckets (percent_rank —
distribution-adaptive, skew-resistant), then interleave the bucket bits
into one long. Pure column expressions; sorting by the result is a
normal range-partitioned sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(col: Column, bits: int) -> Column:
    """Equi-depth bucket id in [0, 2^bits) via percent_rank (one window,
    no partitionBy → computed per partition at scale you'd rank against
    sampled quantile bounds instead; semantics identical)."""
    w = Window.orderBy(col)
    return F.least(F.floor(F.percent_rank().over(w) * (1 << bits)),
                   F.lit((1 << bits) - 1)).cast("long")


def zvalue(cols: Sequence[Column], bits: int = 8) -> Column:
    """Morton interleave of each column's bucket bits (MSB-first)."""
    buckets = [_bucket(c, bits) for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):          # high bits first
        for bk in buckets:
            bit = F.shiftright(bk, b).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def zorder_sort(df: DataFrame, cols: Sequence[str], bits: int = 8) -> DataFrame:
    """Rows sorted by their Z-value — write this ordering to get
    multi-column min/max locality in every parquet row group."""
    return (df.withColumn("__z", zvalue([F.col(c) for c in cols], bits))
            .sortWithinPartitions("__z")
            .drop("__z"))
