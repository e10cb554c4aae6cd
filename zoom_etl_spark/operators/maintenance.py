"""Table maintenance: partition-scoped merges and small-file compaction.

At 100 TB a merge must NOT rewrite the whole table. The reference's
staging→merge already isolates write amplification (stream appends hit
staging; bulk merge runs scheduled — SURVEY §4.1); these operators add
the storage half of that story on plain partitioned parquet:

* ``merge_into_partitioned`` — upsert updates into a parquet table
  partitioned by a column, rewriting ONLY the partitions the updates
  touch (dynamic partition overwrite). Untouched partitions' files are
  left physically intact. Delta/Iceberg MERGE INTO is the managed-table
  equivalent; the control flow is identical.
* ``compact_partition`` — streaming appends produce many small files
  (one per micro-batch task); compaction coalesces a partition's files
  to a target count. Small-file proliferation is the classic streaming-
  sink failure mode at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import merge_upsert


def merge_into_partitioned(spark: SparkSession, target_dir: str,
                           updates: DataFrame, keys: list[str],
                           partition_col: str) -> list[str]:
    """Upsert ``updates`` into the partitioned parquet table at
    ``target_dir``, rewriting only touched partitions. Returns the list
    of partition values rewritten.

    CONTRACT: a key's partition value must be stable (partition column
    functionally dependent on the merge key — e.g. partition by a hash or
    creation-date of the key). A partition-scoped merge cannot see a key
    living in an untouched partition; an update that moves a key across
    partitions would duplicate it. Engines with global indexes (or
    Delta's full-table MERGE) relax this; on plain parquet the stable-
    partition contract is what keeps the merge O(touched partitions).

    The updates' partition values are collected (bounded: one driver row
    per touched partition, not per data row) to prune the target scan —
    partition pruning makes the read side proportional to the touched
    partitions too, not the table.
    """
    touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if None in touched:
        raise ValueError(
            f"updates contain NULL {partition_col!r} values — they would be "
            "silently excluded from the partition-pruned merge; assign a "
            "partition value (or quarantine them) first")
    if not touched:
        return []
    target = spark.read.parquet(target_dir)
    target_touched = target.filter(F.col(partition_col).isin(touched))
    merged = merge_upsert(target_touched, updates, keys=keys)
    # dynamic partition overwrite: only partitions present in `merged`
    # (exactly the touched set) are replaced
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col).parquet(target_dir))
    return sorted(map(str, touched))


def partition_file_count(target_dir: str, partition_col: str,
                         value: str) -> int:
    pdir = os.path.join(target_dir, f"{partition_col}={value}")
    if not os.path.isdir(pdir):
        return 0
    return sum(1 for f in os.listdir(pdir) if f.endswith(".parquet"))


def compact_partition(spark: SparkSession, target_dir: str,
                      partition_col: str, value: str,
                      target_files: int = 1) -> None:
    """Rewrite one partition's many small files into ``target_files``
    (coalesce, no shuffle), leaving every other partition untouched."""
    part = (spark.read.parquet(target_dir)
            .filter(F.col(partition_col) == value))
    (part.coalesce(target_files)
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col).parquet(target_dir))
