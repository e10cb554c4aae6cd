"""Merge/upsert semantics the oracle queries can't exercise (SURVEY §7.3):
NULL-key always-append, all-columns overwrite, idempotent replay, and the
late-dimension staging re-merge path (ST3/ST4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zoom_etl_spark.operators.merge import merge_upsert, staging_merge
from zoom_etl_spark.operators.windows import last_wins

from .fixtures import participants


def _state(df):
    return {tuple(r) for r in df.collect()}


def test_merge_overwrites_matched_and_inserts_unmatched(spark):
    target = spark.createDataFrame(
        [("u1", "m1", "Old", 1, 1), ("u9", "m9", "Keep", 9, 1)],
        "user_id string, meeting_uuid string, name string, duration int, version int")
    updates = spark.createDataFrame(
        [("u1", "m1", "New", 2, 2), ("u5", "m5", "Insert", 5, 1)],
        target.schema)
    out = merge_upsert(target, updates, keys=["user_id", "meeting_uuid"])
    rows = _state(out)
    assert ("u1", "m1", "New", 2, 2) in rows          # overwritten (all cols)
    assert ("u9", "m9", "Keep", 9, 1) in rows         # untouched
    assert ("u5", "m5", "Insert", 5, 1) in rows       # inserted
    assert len(rows) == 3


def test_null_key_rows_always_append(spark):
    """Postgres ON CONFLICT: NULL keys never conflict (create_tables.sql:44
    vs NULL user_id) — NULL-key updates append, never match."""
    p = participants(spark)
    target = p.filter(F.col("user_id").isNotNull())
    null_updates = p.filter(F.col("user_id").isNull())
    out = merge_upsert(target, null_updates, keys=["user_id", "meeting_uuid"])
    assert out.count() == target.count() + null_updates.count()
    # merging the same NULL-key rows again appends again (exact Postgres behavior)
    out2 = merge_upsert(out, null_updates, keys=["user_id", "meeting_uuid"])
    assert out2.count() == out.count() + null_updates.count()


def test_merge_idempotent_replay(spark):
    """ST4: re-applying the same keyed batch must not change state."""
    p = last_wins(participants(spark).filter(F.col("user_id").isNotNull()),
                  keys=["user_id", "meeting_uuid"], version=[F.col("version")])
    once = merge_upsert(p, p, keys=["user_id", "meeting_uuid"])
    twice = merge_upsert(once, p, keys=["user_id", "meeting_uuid"])
    assert _state(once) == _state(p)
    assert _state(twice) == _state(p)


def test_staging_merge_late_parent_arrives(spark):
    """ST3: orphan staging rows wait; once the parent lands a later run
    merges them and staging drains."""
    staging = spark.createDataFrame(
        [("r1", "m1", 100), ("r2", "m2", 200)],
        "id string, meeting_uuid string, file_size int")
    parents_run1 = spark.createDataFrame([("m1",)], "uuid string")
    target0 = spark.createDataFrame([], staging.schema)

    t1, s1 = staging_merge(staging, parents_run1, target0,
                           staging_parent_key="meeting_uuid", parent_key="uuid",
                           merge_keys=["id", "meeting_uuid"])
    assert _state(t1) == {("r1", "m1", 100)}
    assert _state(s1) == {("r2", "m2", 200)}      # orphan waits

    parents_run2 = spark.createDataFrame([("m1",), ("m2",)], "uuid string")
    t2, s2 = staging_merge(s1, parents_run2, t1,
                           staging_parent_key="meeting_uuid", parent_key="uuid",
                           merge_keys=["id", "meeting_uuid"])
    assert _state(t2) == {("r1", "m1", 100), ("r2", "m2", 200)}
    assert s2.count() == 0                        # staging drained


def test_merge_rejects_mismatched_columns(spark):
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1,)], "k int")
    try:
        merge_upsert(a, b, keys=["k"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "column mismatch" in str(e)


# ---------------------------------------------------------------- merge_into

def _mi_frames(spark):
    t = spark.createDataFrame(
        [(1, "F", 10.0), (2, "O", 20.0), (3, "O", 30.0), (4, "P", 40.0)],
        "k int, status string, price double")
    s = spark.createDataFrame(
        [(1, "F", 11.0), (2, "O", 22.0), (9, "N", 90.0)],
        "k int, status string, price double")
    return t, s


def test_merge_into_three_clauses(spark):
    from zoom_etl_spark.operators.merge import merge_into
    t, s = _mi_frames(spark)
    out = merge_into(
        t, s, ["k"],
        matched=[("delete", F.col("t.status") == "F", None),
                 ("update", None, {"price": F.col("s.price")})],
        not_matched_insert=True)
    rows = _state(out)
    assert (1, "F", 10.0) not in rows and not any(r[0] == 1 for r in rows)
    assert (2, "O", 22.0) in rows            # updated (price only)
    assert (3, "O", 30.0) in rows            # untouched target
    assert (4, "P", 40.0) in rows
    assert (9, "N", 90.0) in rows            # inserted


def test_merge_into_clause_order_first_wins(spark):
    from zoom_etl_spark.operators.merge import merge_into
    t, s = _mi_frames(spark)
    # same clauses, reversed: the unconditional update now shadows delete
    out = merge_into(
        t, s, ["k"],
        matched=[("update", None, {"price": F.col("s.price")}),
                 ("delete", F.col("t.status") == "F", None)],
        not_matched_insert=None)
    rows = _state(out)
    assert (1, "F", 11.0) in rows            # updated, NOT deleted
    assert not any(r[0] == 9 for r in rows)  # no insert clause


def test_merge_into_insert_condition_and_null_keys(spark):
    from zoom_etl_spark.operators.merge import merge_into
    t, _ = _mi_frames(spark)
    s = spark.createDataFrame(
        [(None, "N", 5.0), (9, "N", 90.0), (8, "X", 80.0)],
        "k int, status string, price double")
    out = merge_into(t, s, ["k"], matched=(),
                     not_matched_insert=F.col("s.status") == "N")
    rows = _state(out)
    assert (None, "N", 5.0) in rows          # NULL key → insert path
    assert (9, "N", 90.0) in rows
    assert not any(r[1] == "X" for r in rows)  # insert condition filtered


def test_merge_into_not_matched_by_source_delete(spark):
    from zoom_etl_spark.operators.merge import merge_into
    t, s = _mi_frames(spark)
    out = merge_into(
        t, s, ["k"],
        matched=[("update", None, {"price": F.col("s.price")})],
        not_matched_insert=None,
        not_matched_by_source=[("delete", F.col("t.status") == "P", None)])
    rows = _state(out)
    assert not any(r[0] == 4 for r in rows)  # P row absent from source → deleted
    assert (3, "O", 30.0) in rows            # absent but not P → kept


def test_merge_into_ambiguous_match_raises(spark):
    import pytest
    from zoom_etl_spark.operators.merge import merge_into
    t, _ = _mi_frames(spark)
    s = spark.createDataFrame(
        [(2, "O", 21.0), (2, "O", 22.0)], "k int, status string, price double")
    out = merge_into(t, s, ["k"],
                     matched=[("update", None, {"price": F.col("s.price")})],
                     not_matched_insert=True)
    with pytest.raises(Exception, match="MERGE ambiguity"):
        out.collect()


def test_merge_into_duplicate_source_ok_when_no_clause_fires(spark):
    """Duplicate source keys are legal when no matched clause's condition
    holds for that key — only an APPLYING clause makes it ambiguous."""
    from zoom_etl_spark.operators.merge import merge_into
    t, _ = _mi_frames(spark)
    s = spark.createDataFrame(
        [(2, "O", 21.0), (2, "O", 22.0)], "k int, status string, price double")
    out = merge_into(t, s, ["k"],
                     matched=[("update", F.col("t.status") == "F",
                               {"price": F.col("s.price")})],
                     not_matched_insert=None)
    rows = _state(out)
    assert (2, "O", 20.0) in rows            # kept unchanged, no error


def test_merge_evolve_new_source_column(spark):
    """evolve=True must widen the target with the update side's new
    column: matched rows take the update value, untouched target rows
    backfill NULL, and inserts carry the new column through."""
    from zoom_etl_spark.operators.merge import evolve_schema

    t = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    u = spark.createDataFrame([(2, "B", 9), (3, "c", 7)],
                              "k long, v string, w long")
    got = {r.k: (r.v, r.w)
           for r in merge_upsert(t, u, keys=["k"], evolve=True).collect()}
    assert got == {1: ("a", None), 2: ("B", 9), 3: ("c", 7)}
    # helper alone: dropped source columns flow back as NULLs too
    t2, u2 = evolve_schema(u, t)
    assert t2.columns == u2.columns


def test_merge_evolve_missing_source_column_keeps_target(spark):
    """An update side MISSING a target column must keep the target's
    values for matched rows (Delta UPDATE SET * with a narrower
    source), and inserts get NULL for it."""
    t = spark.createDataFrame([(1, "a", 5)], "k long, v string, w long")
    u = spark.createDataFrame([(1, "A"), (2, "b")], "k long, v string")
    got = {r.k: (r.v, r.w)
           for r in merge_upsert(t, u, keys=["k"], evolve=True).collect()}
    assert got == {1: ("A", 5), 2: ("b", None)}


def test_merge_evolve_type_conflict_raises(spark):
    """Same-named columns with different types must raise — an implicit
    cast would silently corrupt data."""
    import pytest

    t = spark.createDataFrame([(1, "a")], "k long, v string")
    u = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="type conflict"):
        merge_upsert(t, u, keys=["k"], evolve=True)
