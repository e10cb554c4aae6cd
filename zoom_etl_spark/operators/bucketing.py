"""Bucketed tables: shuffle-free co-located joins.

The physical replacement for the reference's FK B-tree indexes
(reference sql/create_tables.sql:78-81) at warehouse scale: bucket both
fact tables by the join key at write time; every subsequent join on that
key is exchange-free (each bucket pairs 1:1), which at 100 TB removes
the dominant cost of fact-fact joins. Partitioning (directory-level)
handles pruning; bucketing (file-level hash) handles join co-location —
they compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, key: str, n_buckets: int = 8,
                   sort: bool = True) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. Sorting
    within buckets upgrades the join to sort-merge without a sort step."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a location orphaned by a dropped/lost catalog entry blocks re-create
    import shutil
    from urllib.parse import urlparse
    loc = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{loc}/{name}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str, how: str = "inner",
                   force_merge: bool = False) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — planned
    as a sort-merge join with zero shuffle exchanges (asserted in
    tests/test_bucketing.py). At test scale Catalyst may prefer a
    broadcast join (which also skips the shuffle but ignores bucketing);
    ``force_merge`` pins the sort-merge strategy the 100 TB plan uses."""
    left = spark.table(left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), key, how)
