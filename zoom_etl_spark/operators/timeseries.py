"""Time-series regularization: per-key time spine + gap fill.

The hypertable-rollup shape (TimescaleDB ``time_bucket_gapfill``,
InfluxDB ``fill(previous)``): bucket an event stream, then materialize
EVERY bucket in each key's active range — missing buckets appear as
rows — and fill values forward (LOCF). Spark lacks this as a primitive;
it composes from sequence()+explode for the spine, a left join back
onto the observed buckets, and an ignore-nulls last() window for the
fill. No reference counterpart (closest intent: the attendance
time-math in sql/create_tables.sql:38-40).

Scale: the spine explode is row-local (one output row per bucket in the
key's own span — output-proportional, no cross product); the spine⋈agg
join and the LOCF window both hash-partition on the key, so AQE handles
them as ordinary keyed stages. Dense keys (years of 1-min buckets)
fan out proportionally to their true bucket count, never to other keys'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_spine(buckets: DataFrame, key: str, bucket_col: str,
               step: str) -> DataFrame:
    """One row per ``step`` interval between each key's min and max
    bucket (inclusive). ``step`` is a SQL interval literal body, e.g.
    ``'1 hour'``."""
    return (buckets.groupBy(key)
            .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
            .select(key, F.explode(F.expr(
                f"sequence(__lo, __hi, interval {step})")).alias(bucket_col)))


def gapfill_locf(buckets: DataFrame, key: str, bucket_col: str,
                 val_col: str, step: str) -> DataFrame:
    """Materialize missing buckets and carry the last observation
    forward. Output: (key, bucket, raw value-or-NULL, filled value).
    The first bucket per key is always observed (the spine starts at the
    key's min), so the filled column is never NULL."""
    spine = time_spine(buckets, key, bucket_col, step)
    joined = spine.join(buckets, [key, bucket_col], "left")
    w = (Window.partitionBy(key).orderBy(bucket_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        key, bucket_col, F.col(val_col),
        F.last(val_col, ignorenulls=True).over(w).alias(f"{val_col}_locf"))


def gapfill_linear(buckets: DataFrame, key: str, bucket_col: str,
                   val_col: str, step: str) -> DataFrame:
    """Materialize missing buckets and fill by linear interpolation
    between the surrounding observations (edges degrade to nearest-
    observation fill). Two ignore-nulls window passes — last() looking
    back, first() looking forward — give each gap row its bracketing
    (time, value) pairs; the interpolation itself is row-local
    arithmetic. Same partitioning story as ``gapfill_locf``."""
    spine = time_spine(buckets, key, bucket_col, step)
    joined = spine.join(buckets, [key, bucket_col], "left")
    t = F.unix_timestamp(bucket_col).cast("double")
    obs_t = F.when(F.col(val_col).isNotNull(), t)
    # Both lookups are RUNNING frames (unboundedPreceding→currentRow):
    # the forward-looking bracket is a running last() over the DESC
    # order. An unboundedFollowing frame here is O(n^2) per partition in
    # Spark's window exec (re-scans the tail for every row) — at 2 years
    # of hourly buckets that turned this operator into the whole bench.
    wb = (Window.partitionBy(key).orderBy(F.col(bucket_col).asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(key).orderBy(F.col(bucket_col).desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # materialize each bracket column ONCE — window expressions are not
    # common-subexpression-eliminated, so inlining them into the CASE
    # would evaluate 10 window aggregates instead of 4
    bracketed = joined.select(
        key, bucket_col, F.col(val_col),
        F.last(val_col, ignorenulls=True).over(wb).alias("__pv"),
        F.last(obs_t, ignorenulls=True).over(wb).alias("__pt"),
        F.last(val_col, ignorenulls=True).over(wf).alias("__nv"),
        F.last(obs_t, ignorenulls=True).over(wf).alias("__nt"))
    pv, pt = F.col("__pv"), F.col("__pt")
    nv, nt = F.col("__nv"), F.col("__nt")
    interp = F.when(F.col(val_col).isNotNull(), F.col(val_col)) \
              .when(pv.isNull(), nv) \
              .when(nv.isNull(), pv) \
              .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt))
    # full precision out — callers choose their own rounding. (Half-way
    # cases are COMMON here: 3-decimal inputs × power-of-2 gap ratios
    # land exactly on .xxxxxx5, where round() tie-break modes differ
    # across engines.)
    return bracketed.select(
        key, bucket_col, F.col(val_col),
        interp.alias(f"{val_col}_interp"))
