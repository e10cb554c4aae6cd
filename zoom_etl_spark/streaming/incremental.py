"""Batch-incremental watermark pipeline — the Spark-native form of the
reference's ``last_pipeline_run`` Airflow Variable flow (reference
src/zoom/extract.py:196-211, airflow/dags/etl_process.py:104-114,236):

  1. read the watermark from a control table (NULL on first run);
  2. process only rows with ts >= watermark (predicate pushed to scan /
     partition pruning on date-partitioned layouts);
  3. advance the watermark to max(ts) processed — ONLY after the load
     succeeds (the reference sets the Variable as the DAG's last task),
     so a failed run re-processes and idempotent upserts absorb replays.

The control table is a single-row parquet dir; the write is
atomic-by-rename at the directory level (write to _tmp, swap), which is
the strongest guarantee plain parquet offers — a table format (Delta/
Iceberg) would make this a real transaction, same control flow.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_watermark(spark: SparkSession, control_dir: str) -> datetime | None:
    if not os.path.exists(control_dir):
        return None
    rows = spark.read.parquet(control_dir).collect()
    return rows[0]["last_run_ts"] if rows else None


def advance_watermark(spark: SparkSession, control_dir: str,
                      new_ts: datetime) -> None:
    """Swap-in a new single-row control table (write-then-rename)."""
    tmp = control_dir.rstrip("/") + "._tmp"
    (spark.createDataFrame([(new_ts,)], "last_run_ts timestamp")
     .coalesce(1).write.mode("overwrite").parquet(tmp))
    if os.path.exists(control_dir):
        shutil.rmtree(control_dir)
    os.rename(tmp, control_dir)


def incremental_batch(events: DataFrame, watermark: datetime | None) -> DataFrame:
    """Rows at-or-after the watermark (everything on first run). On a
    plain parquet scan the comparison lands in PushedFilters; if the ts
    column is derived (e.g. the nanos-testdata conversion), filter the
    raw column instead — see catalog.events_since."""
    if watermark is None:
        return events
    return events.filter(F.col("ts") >= F.lit(watermark))


def run_incremental(spark: SparkSession, events: DataFrame, control_dir: str,
                    load_fn) -> int:
    """One pipeline run: filter to new rows, load, then advance the
    watermark to max(ts) processed. ``load_fn(batch_df)`` performs the
    (idempotent) load; any exception leaves the watermark untouched.
    Returns rows processed."""
    wm = read_watermark(spark, control_dir)
    batch = incremental_batch(events, wm)
    stats = batch.agg(F.count("*").alias("n"), F.max("ts").alias("mx")).collect()[0]
    if stats["n"] == 0:
        return 0
    load_fn(batch)  # raises on failure → watermark not advanced
    advance_watermark(spark, control_dir, stats["mx"])
    return stats["n"]
