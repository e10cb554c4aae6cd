"""Two-level (bucketed) running sums for token-budget shard packing.

A running sum windowed by a low-cardinality stratum key (e.g. ``lang``,
~3 values) serializes each stratum through ONE task: at 100 TB one task
would sort and scan an entire language. The exact fix is the classic
parallel prefix-sum decomposition:

1. split each stratum into ordered BUCKETS by range over the order key
   (bucket boundaries respect the order, so bucket b's rows all precede
   bucket b+1's);
2. aggregate per-(stratum, bucket) value sums — a map-side-combinable
   shuffle to ``n_strata × n_buckets`` rows;
3. prefix-sum those bucket sums per stratum — a window over a TINY
   relation (≤ n_buckets rows per stratum), broadcast back;
4. local running sum within each (stratum, bucket) partition + the
   bucket's offset ⇒ the IDENTICAL global running sum, with
   ``n_strata × n_buckets`` tasks instead of ``n_strata``.

Mirrors the reference's per-entity batch chunking (reference
src/zoom/transform.py:41-46 chunks recording lists per meeting) lifted
to corpus scale with provable parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sum(df: DataFrame, stratum_cols: list[str],
                         order_col: str, value_col: str,
                         n_buckets: int = 32,
                         out_col: str = "cum_before") -> DataFrame:
    """Append ``out_col`` = exclusive running sum of ``value_col`` over
    rows ordered by ``order_col`` within each stratum — value-identical
    to ``sum(value) OVER (PARTITION BY stratum ORDER BY order_col ROWS
    UNBOUNDED PRECEDING TO 1 PRECEDING)`` but executed with
    ``n_buckets``-way parallelism per stratum.

    ``order_col`` must be numeric and unique per stratum (it is the
    total order). Buckets are equal-width ranges of the order key
    between the stratum's min and max — balanced when the key is
    roughly uniform (synthetic doc_ids are); a skewed-id deployment
    swaps step 1 for sampled range boundaries (approxQuantile), the
    rest is unchanged.
    """
    # stratum bounds: map-side-combined agg to n_strata rows, broadcast
    bounds = df.groupBy(*stratum_cols).agg(
        F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi"))
    b = df.join(F.broadcast(bounds), stratum_cols)
    span = F.col("_hi") - F.col("_lo") + 1
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(order_col) - F.col("_lo")) * n_buckets / span))
    b = b.withColumn("_bkt", bucket.cast("int")).drop("_lo", "_hi")

    # level 1: bucket sums (tiny) → per-stratum prefix over buckets.
    # The window here runs over ≤ n_buckets rows per stratum — driver-
    # scale, not data-scale.
    bsums = b.groupBy(*stratum_cols, "_bkt").agg(
        F.sum(value_col).alias("_bsum"))
    wb = (Window.partitionBy(*stratum_cols).orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = bsums.select(
        *stratum_cols, "_bkt",
        F.coalesce(F.sum("_bsum").over(wb), F.lit(0)).alias("_off"))

    # level 2: local running sum inside each (stratum, bucket) task +
    # that bucket's offset = the exact global running sum
    wl = (Window.partitionBy(*stratum_cols, "_bkt").orderBy(order_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    return (b.join(F.broadcast(offsets), [*stratum_cols, "_bkt"])
            .withColumn(out_col,
                        F.coalesce(F.sum(value_col).over(wl), F.lit(0))
                        + F.col("_off"))
            .drop("_bkt", "_off"))
