"""Range-partitioned parallel database read — the `spark.read.jdbc
(partitionColumn, lowerBound, upperBound, numPartitions)` contract,
proven end-to-end against an in-process DuckDB file since this sandbox
has no network (ROADMAP item 2: the partitioning/pushdown logic is the
engineered part; swapping the connection factory for a JDBC/psycopg2
one changes no control flow).

Mirrors the reference's DB access (reference src/db/load.py:41-50 uses a
single psycopg2 connection — serial; at warehouse scale the read MUST
fan out). Semantics copied from Spark's JDBC relation:

- the key range [lower, upper) splits into ``num_partitions`` strides;
  the FIRST stride also takes everything below ``lower`` and the LAST
  everything at/above ``upper`` (Spark's open-ended edge predicates), so
  mis-estimated bounds can never lose rows;
- an optional ``predicate`` is pushed INTO every partition's WHERE
  clause — filtering happens in the database, not in Spark;
- each task opens its own READ-ONLY connection, fetches exactly one
  Arrow result set for its stride, and streams it out in batches —
  constant memory per task, no driver involvement beyond planning.

Scale posture: reads are embarrassingly parallel across strides; skewed
key ranges show up as task skew, the same remedy as JDBC (choose a
near-uniform partition column — ids, not timestamps with hot tails).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_db_partitioned(spark: SparkSession, db_path: str, table: str,
                        partition_column: str, lower: int, upper: int,
                        num_partitions: int,
                        predicate: str | None = None,
                        columns: list[str] | None = None) -> DataFrame:
    """Parallel read of ``table`` from the DuckDB file at ``db_path``,
    split into ``num_partitions`` strides of ``partition_column``."""
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if upper <= lower:
        raise ValueError(f"empty range [{lower}, {upper})")
    import duckdb

    collist = ", ".join(columns) if columns else "*"
    extra = f" AND ({predicate})" if predicate else ""

    # schema from a zero-row probe on the driver (LIMIT 0 — metadata only)
    con = duckdb.connect(db_path, read_only=True)
    try:
        probe = con.sql(
            f"SELECT {collist} FROM {table} LIMIT 0").arrow()
    finally:
        con.close()
    schema = spark.createDataFrame(probe).schema  # arrow → exact types

    stride = (upper - lower) // num_partitions or 1
    bounds: list[tuple[int | None, int | None]] = []
    for i in range(num_partitions):
        lo = None if i == 0 else lower + i * stride
        hi = (None if i == num_partitions - 1
              else lower + (i + 1) * stride)
        bounds.append((lo, hi))

    def _read(iterator):
        for pdf in iterator:
            for lo, hi, in pdf[["lo", "hi"]].itertuples(index=False):
                conds = []
                if not (lo != lo or lo is None):  # NaN-safe null check
                    conds.append(f"{partition_column} >= {int(lo)}")
                if not (hi != hi or hi is None):
                    conds.append(f"{partition_column} < {int(hi)}")
                where = " AND ".join(conds) or "TRUE"
                c = duckdb.connect(db_path, read_only=True)
                try:
                    reader = c.sql(
                        f"SELECT {collist} FROM {table} "
                        f"WHERE {where}{extra}"
                    ).fetch_arrow_reader(batch_size=65536)
                    import pyarrow as pa
                    for batch in reader:
                        yield pa.Table.from_batches([batch]).to_pandas()
                finally:
                    c.close()

    specs = spark.createDataFrame(
        [(float(lo) if lo is not None else float("nan"),
          float(hi) if hi is not None else float("nan"))
         for lo, hi in bounds], "lo double, hi double"
    ).repartition(num_partitions)  # round-robin: one stride per task
    return specs.mapInPandas(_read, schema)
