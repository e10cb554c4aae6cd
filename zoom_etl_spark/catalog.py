"""Table registry over the driver testdata parquet directories.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings. Dimension tables (region, nation,
customer, supplier, part) are small relative to facts — callers broadcast
them in joins; at 100 TB the facts (orders, lineitem, events, documents,
embeddings) are the scan-heavy side and stay partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dims safe to broadcast: bounded cardinality even at production scale
# (nations/regions are fixed; parts/suppliers grow sub-linearly).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Declarative parquet scan → Catalyst gets predicate
    pushdown, column pruning and (on partitioned layouts) partition pruning
    for free."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is TIMESTAMP(NANOS) in the file → read as long nanos
    # (nanosAsLong conf) and truncate to µs timestamps, as DuckDB does.
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def events_since(spark: SparkSession, sf_dir: str, since: str) -> DataFrame:
    """Events at-or-after a UTC timestamp literal, with the comparison
    pushed onto the RAW nanos long — a filter on the converted timestamp
    sits above ``timestamp_micros`` and never reaches the scan (caught by
    tests/test_plans.py). On a production micros-parquet layout a plain
    ts filter pushes naturally; this is the nanos-testdata equivalent.
    """
    from datetime import datetime, timezone
    configure(spark)
    dt = datetime.fromisoformat(since).replace(tzinfo=timezone.utc)
    since_ns = int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1000
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (raw.filter(F.col("ts") >= F.lit(since_ns))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
