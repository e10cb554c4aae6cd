"""Atomic multi-table publish (operators/txn.py): the transactional
contract of the reference's staging reconciliation (src/db/load.py:230-234)
on plain parquet — crash injection proves no torn state is ever visible,
and concurrent publishers serialize (disjoint commits rebase, overlapping
commits conflict loudly like a Postgres serialization failure)."""

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


def _snapshot(spark, g, version=None):
    return {name: {tuple(r) for r in g.read(spark, name, version).collect()}
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
    second's: no manifest is ever created, so readers still see the OLD
    version of BOTH tables — never merged-target + stale-staging."""
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


def test_crash_at_commit_point_leaves_old_version_and_no_livelock(spark,
                                                                  monkeypatch):
    """Kill at the manifest hardlink (THE commit point): still the old
    version everywhere, and — the round-2 livelock fix — the next publish
    succeeds at the next version instead of conflicting forever."""
    g = _group(spark)
    before = _snapshot(spark, g)
    real_link = os.link

    def dying_link(src, dst):
        raise OSError("injected crash at commit point")

    monkeypatch.setattr(os, "link", dying_link)
    with pytest.raises(OSError):
        g.publish({"target": g.read(spark, "target").limit(1)})
    monkeypatch.setattr(os, "link", real_link)

    assert g.current_version() == 1
    assert _snapshot(spark, g) == before
    # recovery is immediate: the aborted attempt left only unreferenced
    # data dirs (vacuumable), never a half-claimed version
    v = g.publish({"target": g.read(spark, "target").limit(1)})
    assert v == 2
    assert g.read(spark, "target").count() == 1


def test_concurrent_disjoint_publishers_both_land(spark):
    """Two writers, different tables: the loser of the version race
    rebases onto the winner's commit and lands at the next version with
    the winner's table carried forward — both commits survive."""
    g = _group(spark)
    other = TableGroup(g.root)  # second writer handle on the same log

    def racer():
        other.publish({"parent": other.read(spark, "parent")
                       .withColumn("parent_id", F.col("parent_id") + 100)})

    v = g.publish({"target": g.read(spark, "target").limit(1)},
                  _before_claim=racer)
    assert v == 3  # racer took v2, this publish rebased to v3
    assert g.read(spark, "target").count() == 1                  # ours
    assert [r.parent_id for r in g.read(spark, "parent").collect()] == [110]


def test_concurrent_overlapping_publishers_conflict(spark):
    """Two writers, SAME table: the loser must not silently overwrite the
    winner (lost update) — it gets CommitConflict, and the winner's
    commit is intact."""
    g = _group(spark)
    other = TableGroup(g.root)

    def racer():
        other.publish({"target": other.read(spark, "target").limit(1)})

    with pytest.raises(CommitConflict, match="changed by a concurrent"):
        g.publish({"target": g.read(spark, "target")},
                  _before_claim=racer)
    assert g.current_version() == 2          # the racer's commit stands
    assert g.read(spark, "target").count() == 1


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


def test_vacuum_retention_keeps_pinned_reader_valid(spark):
    """A reader pinned to an older version inside the retention window
    survives vacuum; versions beyond the window are reclaimed."""
    g = _group(spark)                                # v1
    g.publish({"target": g.read(spark, "target").limit(1)})   # v2
    g.publish({"target": g.read(spark, "target", version=1)})  # v3
    pinned = _snapshot(spark, g, version=2)
    removed = g.vacuum(keep_last=2)                  # keep v2 + v3
    assert all("/target/" in p + "/" for p in removed)  # only v1's target
    assert _snapshot(spark, g, version=2) == pinned  # pinned reader intact
    with pytest.raises(Exception):
        # v1's target dir is gone — beyond retention, as documented
        g.read(spark, "target", version=1).collect()


def test_vacuum_min_age_protects_inflight_publisher(spark):
    """vacuum(min_age_s=...) must not delete data a concurrent publisher
    has written but not yet committed (data lands before the manifest)."""
    g = _group(spark)

    def vacuum_midway():
        # runs after the publisher's data is durable, before its commit
        removed = g.vacuum(keep_last=1, min_age_s=3600)
        assert removed == []  # fresh uncommitted dirs are protected

    v = g.publish({"target": g.read(spark, "target").limit(1)},
                  _before_claim=vacuum_midway)
    assert v == 2
    assert g.read(spark, "target").count() == 1  # files survived vacuum


def test_publish_check_constraint_blocks_commit(spark, tmp_path):
    """A violating row must abort the publish BEFORE any manifest claim:
    ConstraintViolation raised, current version unchanged, and a
    subsequent valid publish works normally."""
    from zoom_etl_spark.operators.txn import ConstraintViolation, TableGroup

    g = TableGroup(str(tmp_path / "grp"))
    ok = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    v1 = g.publish({"t": ok}, constraints={"t": "v >= 0"})
    bad = spark.createDataFrame([(3, 30), (4, -1)], "k long, v long")
    import pytest
    with pytest.raises(ConstraintViolation, match="CHECK constraint"):
        g.publish({"t": bad}, constraints={"t": "v >= 0"})
    assert g.current_version() == v1            # nothing committed
    rows = {r.k for r in g.read(spark, "t").collect()}
    assert rows == {1, 2}                       # visible state untouched
    v2 = g.publish({"t": ok}, constraints={"t": "v >= 0"})
    assert v2 == v1 + 1


def test_current_version_hint_probe(spark, tmp_path):
    """The advisory _last hint must bound version resolution: stale-low
    and corrupt hints both degrade to the correct answer, and a crash
    that never wrote a hint still resolves via listing."""
    import os

    from zoom_etl_spark.operators.txn import TableGroup

    g = TableGroup(str(tmp_path / "g"))
    df = spark.createDataFrame([(1,)], "k long")
    for _ in range(4):
        g.publish({"t": df})
    assert g.current_version() == 4
    hint = os.path.join(str(tmp_path / "g"), "_versions", "_last")
    with open(hint, "w") as f:      # stale-low hint (crash before hint)
        f.write("2")
    assert g.current_version() == 4  # probe walks forward
    with open(hint, "w") as f:      # corrupt hint
        f.write("garbage")
    assert g.current_version() == 4  # listing fallback
    os.remove(hint)                  # no hint at all
    assert g.current_version() == 4


def test_tags_pin_versions_and_survive_vacuum(spark, tmp_path):
    """A tag must resolve to its pinned version's data forever: vacuum
    with keep_last=1 must NOT reclaim a tagged older version, tags are
    immutable (re-tagging raises), and dropping the tag releases it."""
    import pytest

    from zoom_etl_spark.operators.txn import TableGroup

    g = TableGroup(str(tmp_path / "g"))
    v1_df = spark.createDataFrame([(1, "old")], "k long, s string")
    v1 = g.publish({"t": v1_df})
    g.tag("release-1")                       # pins v1
    v2 = g.publish({"t": spark.createDataFrame([(1, "new")],
                                               "k long, s string")})
    assert g.tags() == {"release-1": v1}
    with pytest.raises(FileExistsError):
        g.tag("release-1", v2)               # immutable
    removed = g.vacuum(keep_last=1)
    assert removed == []                     # tagged v1 data protected
    assert g.read_tag(spark, "release-1", "t").collect()[0].s == "old"
    assert g.read(spark, "t").collect()[0].s == "new"
    g.drop_tag("release-1")
    removed = g.vacuum(keep_last=1)
    assert removed                           # v1 data now reclaimable
