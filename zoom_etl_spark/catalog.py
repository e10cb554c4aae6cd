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


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to a session-TZ (UTC) TIMESTAMP whatever the
    testdata writer produced: TIMESTAMP(NANOS) arrives as a long (via the
    nanosAsLong conf) and is truncated to µs exactly as DuckDB truncates;
    TIMESTAMP_NTZ micros is reinterpreted as UTC wall-clock. Downstream
    operators always see one ts type, so plans don't fork on file layout."""
    from pyspark.sql.types import LongType, TimestampNTZType
    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(t, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Declarative parquet scan → Catalyst gets predicate
    pushdown, column pruning and (on partitioned layouts) partition pruning
    for free."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def events_since(spark: SparkSession, sf_dir: str, since: str) -> DataFrame:
    """Events at-or-after a UTC timestamp literal, with the comparison
    pushed onto the RAW stored column — a filter above the normalizing
    conversion doesn't reach the scan (caught by tests/test_plans.py).
    For nanos-long files the literal is converted to a nanos long; for
    native timestamp files the literal compares directly (and constant-
    folds into the parquet PushedFilters either way)."""
    from datetime import datetime, timezone

    from pyspark.sql.types import LongType
    configure(spark)
    dt = datetime.fromisoformat(since).replace(tzinfo=timezone.utc)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, LongType):
        since_ns = int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1000
        raw = raw.filter(F.col("ts") >= F.lit(since_ns))
    else:
        lit = F.lit(dt.replace(tzinfo=None)).cast(
            raw.schema["ts"].dataType.simpleString())
        raw = raw.filter(F.col("ts") >= lit)
    return normalize_event_ts(raw)


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() access."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
