"""Window-function operators: top-k per group, running aggregates, chunking,
last-wins dedup.

Semantics surveyed from the reference:
  * top-k-per-group — the webhook handler's preference-ordered first-match
    file select (reference lambda/zoom_webhook/handler.py:18-36): for each
    (meeting, category) keep the best-priority row. Generalized here as
    ``topk_per_group``.
  * last-wins dedup — repeated ``ON CONFLICT … DO UPDATE`` upserts mean the
    latest record per key wins (reference src/db/load.py:83-91).
  * chunking — the DAG splits work into fixed-size chunks for parallel
    tasks (reference airflow/dags/etl_process.py:45-48); in Spark this is
    partitioning, but an explicit chunk id is still useful (``ntile``).

Scale notes: all of these shuffle once on the partition keys. A window
over ``partitionBy(high_cardinality_key)`` scales linearly; windows with
no partitionBy (global ntile / global running sum) serialize into a single
task and are only for driver-bounded row counts — callers get a warning in
the docstring, not a hidden collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def topk_per_group(df: DataFrame, keys: Sequence[str | Column],
                   order: Sequence[Column], k: int = 1,
                   rank_col: str = "rn", keep_rank: bool = False) -> DataFrame:
    """Keep the top-``k`` rows per group under a total order.

    ``order`` must be a *total* order (include a unique tiebreaker column)
    for deterministic results — the reference's preference-select breaks
    ties by iteration order, which we make explicit (SURVEY.md §7.3).
    Single shuffle on ``keys``; row_number (not rank) bounds output to k.
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def last_wins(df: DataFrame, keys: Sequence[str | Column],
              version: Sequence[Column]) -> DataFrame:
    """Latest-record-per-key dedup — the batch equivalent of an upsert
    stream (each key's newest version survives).

    ``version`` orders candidates ascending-priority-last; internally we
    take ``row_number() == 1`` over the DESC order. Include a unique
    tiebreaker for determinism.
    """
    desc_order = [c.desc() for c in version]
    return topk_per_group(df, keys, desc_order, k=1)


def running_sum(df: DataFrame, keys: Sequence[str | Column],
                order: Sequence[Column], value: Column,
                out_col: str = "running_sum") -> DataFrame:
    """Per-key running total ordered by ``order`` (rowsBetween unbounded
    preceding → current row). One shuffle on keys."""
    w = (Window.partitionBy(*_cols(keys)).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col, F.sum(value).over(w))


def ntile_chunks(df: DataFrame, n: int, order: Sequence[Column],
                 out_col: str = "chunk") -> DataFrame:
    """Assign each row to one of ``n`` balanced chunks under a total order.

    WARNING: a global (un-partitioned) window serializes into one task —
    use only when an explicit global chunk id is required (the reference's
    fixed-size task chunks). For plain parallelism use ``df.repartition``/
    ``repartitionByRange`` instead, which scale.
    """
    w = Window.orderBy(*order)
    return df.withColumn(out_col, F.ntile(n).over(w))
