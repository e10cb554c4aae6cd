"""Local replica of the driver's DuckDB-oracle comparison: row count +
schema-arity + order-insensitive value comparison, columns sorted by name.

Stricter than a hash match (it diffs actual values) so failures are
debuggable. Floats compare exactly — queries are required to round
explicitly on both sides; if exact equality holds here it will hash-match
in the driver.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # normalize -0.0 and int-valued floats
        return ("f", repr(v + 0.0))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    return ("s", str(v))


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    report = {
        "spark_rows": len(spark_rows), "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols), "duck_cols": sorted(duck_cols),
        "ok": False, "detail": "",
    }
    if sorted(spark_cols) != sorted(duck_cols):
        report["detail"] = "column-name mismatch"
        return report
    if len(spark_rows) != len(duck_rows):
        report["detail"] = "row-count mismatch"
        return report
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        report["detail"] = f"value mismatch, first diffs: {diffs}"
        return report
    report["ok"] = True
    return report
