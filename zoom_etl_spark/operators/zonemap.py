"""File-level zone maps — Delta-style data skipping on plain parquet.

Spark's parquet reader already prunes ROW GROUPS from footer min/max
stats, but it must still list and open every file to do it. Table
formats (Delta, Iceberg) go one step further: per-file column stats are
recorded IN THE COMMIT LOG at write time, so a filtered read plans only
the files whose [min, max] interval can satisfy the predicate — at
100 TB that's the difference between touching 40 files and opening
400 000 footers. This module is that mechanism on plain parquet,
composing with the rest of the stack:

* ``collect_file_stats`` — one footer read per file at WRITE time
  (driver-side, bounded by file count — the same cost Delta pays to
  build its log entry).
* ``read_skipping`` — plan a scan from stats: keep only files whose
  interval intersects the predicate, then re-apply the predicate as a
  normal Catalyst filter (pruning is a performance decision, never a
  correctness one).
* ``TableGroup`` integration (``publish_with_stats`` / ``read_where``)
  — stats commit ATOMICALLY with the data in the same manifest, carried
  forward per-table across versions exactly like the paths they
  describe.

``operators/zorder.py`` is the write-side twin: Z-ordering keeps every
filter column's per-file intervals tight, which is what makes these
zone maps selective on more than one dimension.
"""

from __future__ import annotations

import datetime as _dt
import glob
import os
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover — type-only; txn imports us lazily
    from .txn import TableGroup

_OPS = ("=", "<", "<=", ">", ">=", "between")


def _plain(v: Any) -> Any:
    """JSON-safe, order-preserving encoding of a stats value. Timestamps
    and dates become epoch micros / ordinal ints so comparisons in the
    pruner are plain numeric."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return int((v - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    if isinstance(v, _dt.date):
        return v.toordinal()
    if isinstance(v, bytes):
        return None  # binary stats are not comparable via JSON round-trip
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return None


def collect_file_stats(path: str, columns: list[str] | None = None) -> dict:
    """Per-file {col: {min, max, null_count}, num_rows} from parquet
    footers (row-group stats folded per file). Parquet writers keep
    truncated string bounds CONSERVATIVE (stored min <= true min,
    stored max >= true max), so pruning on them is always safe."""
    out: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        cols: dict[str, dict] = {}
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for c_i in range(rg.num_columns):
                ch = rg.column(c_i)
                name = ch.path_in_schema
                if columns is not None and name not in columns:
                    continue
                st = ch.statistics
                if st is None:
                    cols[name] = {"min": None, "max": None, "null_count": None}
                    continue
                lo = _plain(st.min) if st.has_min_max else None
                hi = _plain(st.max) if st.has_min_max else None
                cur = cols.setdefault(
                    name, {"min": lo, "max": hi,
                           "null_count": st.null_count})
                if lo is not None and (cur["min"] is None or lo < cur["min"]):
                    cur["min"] = lo
                if hi is not None and (cur["max"] is None or hi > cur["max"]):
                    cur["max"] = hi
                if st.null_count is not None and cur["null_count"] is not None:
                    if rg_i > 0:
                        cur["null_count"] += st.null_count
        out[f] = {"num_rows": md.num_rows, "columns": cols}
    return out


def _may_match(col_stats: dict | None, op: str, value: Any,
               hi: Any = None) -> bool:
    """Conservative interval test: True unless the stats PROVE no row in
    the file can satisfy the predicate. Missing/None stats → True."""
    if col_stats is None:
        return True
    lo_s, hi_s = col_stats.get("min"), col_stats.get("max")
    if lo_s is None or hi_s is None:
        return True
    v = _plain(value)
    if v is None:
        return True
    if op == "=":
        return lo_s <= v <= hi_s
    if op == "<":
        return lo_s < v
    if op == "<=":
        return lo_s <= v
    if op == ">":
        return hi_s > v
    if op == ">=":
        return hi_s >= v
    if op == "between":
        h = _plain(hi)
        if h is None:
            return True
        return lo_s <= h and hi_s >= v
    raise ValueError(f"op must be one of {_OPS}, got {op!r}")


def prune_files(stats: dict, col: str, op: str, value: Any,
                hi: Any = None) -> list[str]:
    return [f for f, s in stats.items()
            if _may_match(s["columns"].get(col), op, value, hi)]


def _predicate(col: str, op: str, value: Any, hi: Any = None) -> F.Column:
    c = F.col(col)
    if op == "=":
        return c == F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "between":
        return c.between(F.lit(value), F.lit(hi))
    raise ValueError(f"op must be one of {_OPS}, got {op!r}")


def read_skipping(spark: SparkSession, path: str, col: str, op: str,
                  value: Any, hi: Any = None,
                  stats: dict | None = None) -> DataFrame:
    """Predicate-pruned scan: files whose zone intervals can't satisfy
    the predicate never enter the plan. The predicate is ALSO applied as
    a normal filter — skipping only removes provably-dead I/O, so the
    result is identical to a full scan + filter by construction."""
    if stats is None:
        stats = collect_file_stats(path, [col])
    keep = prune_files(stats, col, op, value, hi)
    pred = _predicate(col, op, value, hi)
    if not keep:
        return spark.read.parquet(path).filter(pred).limit(0)
    return spark.read.parquet(*keep).filter(pred)


# --------------------------------------------------- TableGroup integration
#
# The write side lives in TableGroup.publish(stats_columns=...): stats are
# collected from the fresh data dirs between write and claim, so they ride
# the SAME manifest commit as the paths they describe (the Delta log-entry
# contract) and carry forward / invalidate per-table with those paths.


def read_where(group: "TableGroup", spark: SparkSession, name: str, col: str,
               op: str, value: Any, hi: Any = None,
               version: int | None = None) -> DataFrame:
    """Zone-map-pruned read of a TableGroup table. Falls back to a plain
    filtered scan when the manifest carries no stats for the table or
    column — pruning degrades, correctness doesn't."""
    m = group.manifest(version)
    path = m["tables"].get(name)
    if path is None:
        raise KeyError(f"table {name!r} not in group (v{m['version']})")
    zm = m.get("meta", {}).get("zonemaps", {}).get(name)
    pred = _predicate(col, op, value, hi)
    if not zm:
        return spark.read.parquet(path).filter(pred)
    keep = [f for f, s in zm.items()
            if _may_match(s["columns"].get(col), op, value, hi)]
    if not keep:
        return spark.read.parquet(path).filter(pred).limit(0)
    return spark.read.parquet(*keep).filter(pred)
