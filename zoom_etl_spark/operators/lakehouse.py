"""Lakehouse MERGE adapter: one `MERGE INTO` interface, pluggable table
formats (reference parity: src/db/load.py:77-92 `ON CONFLICT DO UPDATE`
mapped to its at-scale equivalent, `MERGE INTO` on a table format).

A 100 TB shop runs Delta or Iceberg; this sandbox can install neither
(no network, no `delta-spark`/`pyiceberg` wheels, no format jars in the
pyspark distribution — the attempt is recorded by
:func:`delta_available` and ROADMAP.md). The adapter therefore ships:

* :class:`TxnMergeBackend` — fully working against this repo's
  versioned-snapshot transaction layer (`operators/txn.py`): read the
  current snapshot, apply the engine's three-clause
  :func:`~zoom_etl_spark.operators.merge.merge_into`, publish the
  result as the next ACID version (optimistic rebase, crash-safe).
* :class:`DeltaMergeBackend` — the same clause spec translated to
  `delta.tables.DeltaTable.merge(...)` builder calls. Import-gated: on
  a cluster with `delta-spark` installed it executes Delta's native
  MERGE (file-pruned rewrite); here it raises a precise error naming
  the package and the two session configs to set.

Both backends take the SAME clause spec as `merge_into` — ordered
``(action, condition, assignments)`` tuples — so a pipeline written
against :func:`merge_adapter` moves from the sandbox txn layer to a
real Delta cluster by switching one constructor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from .merge import merge_into
from .txn import TableGroup


def delta_available() -> bool:
    """True when the `delta-spark` bindings are importable. In this
    sandbox: False — `pip install delta-spark` is unavailable (no
    network) and no delta jars ship with the pyspark distribution;
    verified 2026-08-15, recorded in ROADMAP.md."""
    try:
        import delta  # noqa: F401
        return True
    except ImportError:
        return False


class TxnMergeBackend:
    """MERGE INTO against the repo's versioned-snapshot txn layer.

    The merge is computed from a pinned snapshot and published with
    optimistic concurrency: a concurrent writer to the same table
    raises `CommitConflict` from publish (no lost updates, no partial
    state) — the same guarantee Delta's conflict checker gives a MERGE.
    """

    def __init__(self, group: TableGroup):
        self.group = group

    def merge(self, spark: SparkSession, table: str, source: DataFrame,
              keys: Sequence[str], matched: Sequence[tuple] = (),
              not_matched_insert=None,
              not_matched_by_source: Sequence[tuple] = ()) -> int:
        """Run the merge and commit; returns the new version."""
        target = self.group.read(spark, table)
        merged = merge_into(target, source, keys, matched=matched,
                            not_matched_insert=not_matched_insert,
                            not_matched_by_source=not_matched_by_source)
        return self.group.publish({table: merged})

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return self.group.read(spark, table)


class DeltaMergeBackend:
    """MERGE INTO via Delta Lake's native `DeltaTable.merge` builder.

    Requires `delta-spark` plus a session built with::

        spark.sql.extensions = io.delta.sql.DeltaSparkSessionExtension
        spark.sql.catalog.spark_catalog =
            org.apache.spark.sql.delta.catalog.DeltaCatalog

    Clause translation (same ordered-first-match semantics as
    `merge_into`; Delta evaluates clauses in order too):

    * ``('update', cond, assignments)`` → ``whenMatchedUpdate`` /
      ``whenMatchedUpdateAll`` (assignments None)
    * ``('delete', cond, _)`` → ``whenMatchedDelete``
    * ``not_matched_insert`` → ``whenNotMatchedInsertAll`` (True) or
      with its Column condition
    * ``not_matched_by_source`` → ``whenNotMatchedBySourceUpdate`` /
      ``whenNotMatchedBySourceDelete``
    """

    def __init__(self, table_path: str):
        if not delta_available():
            raise ImportError(
                "Delta backend needs the delta-spark package "
                "(pip install delta-spark) and a session configured "
                "with spark.sql.extensions="
                "io.delta.sql.DeltaSparkSessionExtension and "
                "spark.sql.catalog.spark_catalog=org.apache.spark.sql."
                "delta.catalog.DeltaCatalog; neither is installable in "
                "this sandbox (no network) — use TxnMergeBackend here.")
        self.table_path = table_path

    def merge(self, spark: SparkSession, table: str, source: DataFrame,
              keys: Sequence[str], matched: Sequence[tuple] = (),
              not_matched_insert=None,
              not_matched_by_source: Sequence[tuple] = ()) -> None:
        from delta.tables import DeltaTable
        t = DeltaTable.forPath(spark, self.table_path)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        b = t.alias("t").merge(source.alias("s"), cond)
        for action, clause_cond, assignments in matched:
            if action == "update":
                if assignments is None:
                    b = b.whenMatchedUpdateAll(condition=clause_cond)
                else:
                    b = b.whenMatchedUpdate(condition=clause_cond,
                                            set=assignments)
            elif action == "delete":
                b = b.whenMatchedDelete(condition=clause_cond)
            else:
                raise ValueError(f"unknown matched action {action!r}")
        if not_matched_insert is not None:
            cond_col = (None if not_matched_insert is True
                        else not_matched_insert)
            b = b.whenNotMatchedInsertAll(condition=cond_col)
        for action, clause_cond, assignments in not_matched_by_source:
            if action == "update":
                b = b.whenNotMatchedBySourceUpdate(condition=clause_cond,
                                                   set=assignments)
            elif action == "delete":
                b = b.whenNotMatchedBySourceDelete(condition=clause_cond)
            else:
                raise ValueError(
                    f"unknown not-matched-by-source action {action!r}")
        b.execute()


def merge_adapter(spark: SparkSession, *, delta_path: str | None = None,
                  txn_group: TableGroup | None = None):
    """Pick the best available MERGE backend: Delta when its bindings
    are installed and a path is given, else the txn-snapshot backend."""
    if delta_path is not None and delta_available():
        return DeltaMergeBackend(delta_path)
    if txn_group is None:
        raise ValueError("no Delta available — pass txn_group")
    return TxnMergeBackend(txn_group)
