"""Atomic multi-table publish (operators/txn.py): the transactional
contract of the reference's staging reconciliation (src/db/load.py:230-234)
on plain parquet — crash injection proves no torn state is ever visible."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from zoom_etl_spark.etl import reconcile_staging
from zoom_etl_spark.operators.txn import CommitConflict, TableGroup


def _group(spark):
    g = TableGroup(tempfile.mkdtemp(prefix="zes_txn_"))
    g.publish({
        "target": spark.createDataFrame(
            [(1, "old-a", 10), (2, "old-b", 10)],
            "id long, payload string, parent_id long"),
        "staging": spark.createDataFrame(
            [(2, "new-b", 10), (3, "new-c", 10), (4, "orphan", 99)],
            "id long, payload string, parent_id long"),
        "parent": spark.createDataFrame([(10,)], "parent_id long"),
    })
    return g


def _snapshot(spark, g):
    return {name: {tuple(r) for r in g.read(spark, name).collect()}
            for name in g.tables()}


def test_reconcile_publishes_both_tables_atomically(spark):
    g = _group(spark)
    out = reconcile_staging(
        spark, g, staging_parent_key="parent_id", parent_key="parent_id",
        merge_keys=["id"], staging="staging", target="target",
        parent="parent")
    assert out["version"] == 2
    target = {r.id: r.payload for r in g.read(spark, "target").collect()}
    assert target == {1: "old-a", 2: "new-b", 3: "new-c"}
    retained = [r.id for r in g.read(spark, "staging").collect()]
    assert retained == [4]  # orphan held for a later run


def test_crash_between_table_writes_leaves_no_torn_state(spark):
    """Kill the publish after the first table's data lands but before the
    second's: the commit pointer never advances, so readers still see the
    OLD version of BOTH tables — never merged-target + stale-staging."""
    g = _group(spark)
    before = _snapshot(spark, g)
    boom = F.udf(lambda x: (_ for _ in ()).throw(RuntimeError("crash")))

    new_target = g.read(spark, "target")            # writes fine
    dying_staging = g.read(spark, "staging").withColumn(
        "payload", boom(F.col("payload")))          # dies mid-write
    with pytest.raises(Exception):
        g.publish({"target": new_target, "staging": dying_staging})

    assert g.current_version() == 1                 # commit never happened
    assert _snapshot(spark, g) == before            # both tables intact
    # retry after the crash converges (fresh dirs — no overwrite conflicts)
    v = g.publish({"target": new_target,
                   "staging": g.read(spark, "staging").limit(1)})
    assert v >= 2 and g.read(spark, "staging").count() == 1


def test_crash_at_pointer_swap_leaves_old_version(spark, monkeypatch):
    """Kill between the manifest write and the pointer rename: still the
    old version everywhere (the rename IS the commit point)."""
    g = _group(spark)
    before = _snapshot(spark, g)
    real_replace = os.replace

    def dying_replace(src, dst):
        raise OSError("injected crash at commit point")

    monkeypatch.setattr(os, "replace", dying_replace)
    with pytest.raises(OSError):
        g.publish({"target": g.read(spark, "target").limit(1)})
    monkeypatch.setattr(os, "replace", real_replace)

    assert g.current_version() == 1
    assert _snapshot(spark, g) == before
    # the half-claimed version makes the NEXT publish conflict loudly,
    # not clobber — the caller reloads and retries at version+1
    with pytest.raises(CommitConflict):
        g.publish({"target": g.read(spark, "target").limit(1)})


def test_carry_forward_and_vacuum(spark):
    g = _group(spark)
    m1_staging = g.manifest()["tables"]["staging"]
    g.publish({"target": g.read(spark, "target").limit(1)})
    # staging carried forward: same physical path, not rewritten
    assert g.manifest()["tables"]["staging"] == m1_staging
    assert g.read(spark, "target").count() == 1
    removed = g.vacuum()                            # v1's target dir only
    assert len(removed) == 1 and "/target/" in removed[0] + "/"
    assert g.read(spark, "staging").count() == 3    # live data untouched
