"""SparkSession factory + per-session runtime configuration.

The reference normalizes all timestamps to UTC (``src/db/load.py:63-65``)
and relies on manual chunk-size parallelism; here the session is pinned
to UTC and Catalyst/AQE does the tuning (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session our queries run on —
# including the driver-owned session passed into __spark_entry__ hooks.
_RUNTIME_CONFS = {
    # tz-aware TIMESTAMP semantics of the reference warehouse (UTC)
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime join-strategy switching, skew splitting, partition coalescing
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas interchange (vectorized UDF paths)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # testdata events.parquet stores TIMESTAMP(NANOS) which the vectorized
    # reader rejects; read as long and convert in the catalog (ns → µs,
    # matching DuckDB's truncation)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # InferFiltersFromGenerate synthesizes size(arr)>0 filters under every
    # explode and pushes them into the scan — duplicating the FULL
    # generator expression (n-gram transforms, LSH probes, even pandas
    # UDFs) as an un-CSE'd interpreted DataFilter. Measured 10× slowdown
    # on the shingle explode (5.9s → 0.4s warm at sf0.1); our exploded
    # arrays are never empty, so the inferred filter prunes nothing.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    # Spark's default INT96 timestamps carry NO parquet min/max stats, so
    # every time-range predicate loses both row-group pruning and the
    # file-level zone maps (operators/zonemap.py). INT64 micros is the
    # modern standard type with full stats.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent, cheap)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in some deployments; defaults are acceptable
    return spark


def get_spark(app_name: str = "zoom-etl-spark", cpus: int | str | None = None,
              shuffle_partitions: int | None = None,
              ui: bool = False) -> SparkSession:
    """Build a local session shaped like the driver's.

    ``local[N]`` with N from $SPARK_GRAFT_CPUS; shuffle partitions sized to
    the core count (AQE coalesces down at runtime, so err high).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "4")
    shuffle_partitions = shuffle_partitions or max(int(cpus) * 2, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "4g"))
        .config("spark.ui.enabled", "true" if ui else "false")
        # StageMetrics diffs cumulative completed-stage totals from the UI
        # store; keep enough stages retained that a full bench run (117
        # queries, several stages each) never evicts between snapshots —
        # eviction would make later snapshots shrink and deltas go negative.
        .config("spark.ui.retainedStages", "100000")
        .config("spark.ui.retainedJobs", "100000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # managed (bucketed) test tables land outside the repo
        .config("spark.sql.warehouse.dir", "/tmp/zes_warehouse")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
