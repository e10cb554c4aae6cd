"""Lakehouse MERGE adapter: the txn backend runs the full three-clause
MERGE against versioned snapshots with ACID publish; the Delta backend
is import-gated with an actionable error (delta-spark is not installable
in this sandbox — no network; the adapter seam is what's under test)."""

from __future__ import annotations

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
