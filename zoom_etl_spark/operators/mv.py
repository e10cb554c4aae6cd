"""Batch incremental materialized-view maintenance (delta application).

The reference maintains derived tables by full reload inside a
transaction (reference src/db/load.py:230-234); at warehouse scale the
standard upgrade is INCREMENTAL refresh: keep the MV's aggregate state
mergeable (count / sum / min / max — the same partial-aggregate shapes
Spark's own map-side combine uses), aggregate ONLY the delta, and merge
the two frames per key. Cost ∝ |delta| + |touched keys|, never ∝ base.

This is the batch twin of the streaming changelog IVM
(`streaming/stateful.py::retract_maintain`): the same +row/-row algebra,
but applied as a set-oriented join instead of per-key state. Deletions
ride in as retraction rows (op = '-') whose measures SUBTRACT; a key
whose count reaches zero leaves the view — so a CDC feed (insert/delete
pairs for updates) maintains the MV exactly.

Scale posture: one map-combined aggregate over the delta (small), one
key-partitioned outer join against the MV. At 100 TB the MV should be
bucketed by key so the join co-locates; AQE broadcasts the delta side
when it is small enough, which is the common case for periodic refresh.
min/max are NOT retraction-mergeable (a deleted row equal to the current
min needs a rescan) — this module keeps them insert-only-correct and the
caller chooses, the same contract Materialize/Flink document for
retractable vs append-only aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(rows: DataFrame, keys: Sequence[str], value: str,
              signed: bool = False) -> DataFrame:
    """Mergeable aggregate state (cnt, total) per key from raw rows.

    ``signed``: rows carry an ``op`` column ('+' insert / '-' retract);
    retractions contribute (-1, -value). The value must already be on an
    exact integer grid (callers quantize floats first) so merge order
    can never change the result."""
    sign = (F.when(F.col("op") == "-", F.lit(-1)).otherwise(F.lit(1))
            if signed else F.lit(1))
    return (rows.groupBy(*keys)
                .agg(F.sum(sign).alias("cnt"),
                     F.sum(sign * F.col(value)).alias("total")))


def apply_delta(mv: DataFrame, delta_state: DataFrame,
                keys: Sequence[str]) -> DataFrame:
    """Merge a delta's aggregate state into the MV's: per-key sums of
    (cnt, total) via one full-outer join; keys whose merged cnt is 0
    leave the view (their rows were fully retracted)."""
    d = (delta_state.withColumnRenamed("cnt", "_dcnt")
                    .withColumnRenamed("total", "_dtotal"))
    merged = mv.join(d, list(keys), "full_outer")
    cnt = F.coalesce("cnt", F.lit(0)) + F.coalesce("_dcnt", F.lit(0))
    total = F.coalesce("total", F.lit(0)) + F.coalesce("_dtotal", F.lit(0))
    return (merged.select(*keys, cnt.alias("cnt"), total.alias("total"))
                  .filter(F.col("cnt") != 0))
