"""Upsert / merge semantics on plain DataFrames.

The reference's core write primitive is ``INSERT … ON CONFLICT (key) DO
UPDATE SET col = EXCLUDED.col`` (reference src/db/load.py:77-92 and three
siblings), i.e. *all-columns-overwrite* upsert. Spark DataFrames have no
in-place upsert, so we implement the canonical merge-by-join rewrite:

    merged = updates FULL OUTER JOIN target ON key
             → per column: coalesce(updates.col, target.col)

NULL-key semantics (SURVEY.md §7.3): in Postgres, NULLs never conflict —
a NULL-key row always inserts. We replicate exactly: NULL-key update rows
are split off and appended (never matched), so the join itself can use
plain (non-null-safe) equality, which keeps it hash-joinable.

Scale notes: the merge shuffles both sides once on the key. At 100 TB the
target should be bucketed/partitioned by the merge key so only matching
partitions rewrite (Delta/Iceberg MERGE does this natively; the join
rewrite here is storage-agnostic). The updates side is usually small →
Catalyst/AQE picks a broadcast join automatically.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evolve_schema(target: DataFrame,
                  source: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Align two frames to their UNION schema (the Delta
    ``mergeSchema``/autoMerge contract): a column present on only one
    side is added to the other as a typed NULL — new source columns
    widen the target (existing rows backfill NULL), dropped source
    columns keep flowing from the target. Same-named columns must agree
    exactly on type; an implicit cast would silently corrupt data, so a
    conflict raises instead (Delta requires an explicit cast too).
    Column order follows the evolved target. Pure metadata work — adds
    only NULL-literal projections, nothing is shuffled or rescanned."""
    tt = dict(target.dtypes)
    st = dict(source.dtypes)
    conflicts = sorted(c for c in tt.keys() & st.keys() if tt[c] != st[c])
    if conflicts:
        raise ValueError(
            "schema evolution type conflict on "
            + ", ".join(f"{c}: {tt[c]} vs {st[c]}" for c in conflicts))
    for c, typ in source.dtypes:
        if c not in tt:
            target = target.withColumn(c, F.lit(None).cast(typ))
    for c, typ in list(tt.items()):
        if c not in st:
            source = source.withColumn(c, F.lit(None).cast(typ))
    return target, source.select(*target.columns)


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: Sequence[str], evolve: bool = False) -> DataFrame:
    """All-columns-overwrite upsert of ``updates`` into ``target``.

    Key-matched target rows are replaced by the update row; unmatched
    update rows are inserted; unmatched target rows are kept. Update rows
    with any NULL key column always insert (Postgres ON CONFLICT NULL
    semantics). Column sets must match unless ``evolve=True``, which
    first aligns both sides to the union schema via
    :func:`evolve_schema` (new update columns widen the target with
    NULL backfill; absent update columns keep target values).
    """
    if evolve:
        target, updates = evolve_schema(target, updates)
    cols = target.columns
    if set(updates.columns) != set(cols):
        raise ValueError(f"column mismatch: {sorted(cols)} vs {sorted(updates.columns)}")

    null_key = reduce(lambda a, b: a | b, (F.col(k).isNull() for k in keys))
    upd_keyed = updates.filter(~null_key)
    upd_nullkey = updates.filter(null_key)

    u = upd_keyed.alias("u")
    t = target.alias("t")
    cond = reduce(lambda a, b: a & b,
                  (F.col(f"u.{k}") == F.col(f"t.{k}") for k in keys))
    merged = u.join(t, cond, "full_outer").select(
        *[F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c) for c in cols]
    )
    return merged.unionByName(upd_nullkey.select(*cols))


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
                  compare_cols: Sequence[str] | None = None) -> DataFrame:
    """CDC-style change feed between two snapshots of the same table:
    every key classified as 'insert' (new only), 'delete' (old only),
    'update' (both, compared columns differ) or 'unchanged'.

    The batch change-capture primitive downstream consumers need when the
    source (like the reference's warehouse) only exposes current state —
    one full-outer join on the key, one shuffle per side. NULL-safe
    column comparison (``eqNullSafe``) so NULL→value and value→NULL both
    read as updates.
    """
    cols = [c for c in new.columns if c not in keys]
    compare_cols = list(compare_cols or cols)
    o = old.alias("o")
    n = new.alias("n")
    cond = reduce(lambda a, b: a & b,
                  (F.col(f"o.{k}") == F.col(f"n.{k}") for k in keys))
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    same = reduce(lambda a, b: a & b,
                  (F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols))
    change = (F.when(~in_old, "insert")
              .when(~in_new, "delete")
              .when(same, "unchanged")
              .otherwise("update"))
    return joined.select(
        *[F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys],
        change.alias("change"),
        *[F.col(f"n.{c}").alias(f"new_{c}") for c in compare_cols],
        *[F.col(f"o.{c}").alias(f"old_{c}") for c in compare_cols],
    )


def staging_merge(staging: DataFrame, parent: DataFrame, target: DataFrame,
                  staging_parent_key: str, parent_key: str,
                  merge_keys: Sequence[str]) -> tuple[DataFrame, DataFrame]:
    """The reference's staging→final reconciliation (src/db/load.py:193-235):

    1. gate: only staging rows whose parent exists merge (inner semi join) —
       referential-integrity filter;
    2. upsert the gated rows into ``target`` (merge_upsert);
    3. retained staging = rows whose parent has NOT arrived yet (anti join)
       — the late-data holding pen, merged on a later run.

    Returns ``(new_target, retained_staging)``. The parent key set is small
    relative to staging at steady state → broadcast semi/anti joins.
    """
    cols = staging.columns  # name-based joins reorder; restore caller's order
    parent_keys = parent.select(F.col(parent_key).alias(staging_parent_key)).distinct()
    mergeable = (staging.join(F.broadcast(parent_keys), staging_parent_key, "left_semi")
                 .select(*cols))
    retained = (staging.join(F.broadcast(parent_keys), staging_parent_key, "left_anti")
                .select(*cols))
    return merge_upsert(target, mergeable, merge_keys), retained


class MergeAmbiguityError(Exception):
    """More than one source row matched a target row while a matched
    clause applied — SQL MERGE / Delta both reject this at runtime."""


def merge_into(target: DataFrame, source: DataFrame, keys: Sequence[str],
               matched: Sequence[tuple] = (),
               not_matched_insert=None,
               not_matched_by_source: Sequence[tuple] = ()) -> DataFrame:
    """Full three-clause MERGE INTO (SQL:2003 + the Delta/Iceberg
    WHEN NOT MATCHED BY SOURCE extension) as one key-keyed full-outer
    join — the storage-agnostic rewrite of ``MERGE INTO t USING s ON
    t.k = s.k WHEN MATCHED [AND c] THEN UPDATE/DELETE WHEN NOT MATCHED
    [AND c] THEN INSERT WHEN NOT MATCHED BY SOURCE [AND c] THEN
    UPDATE/DELETE``. Generalizes ``merge_upsert`` (which is the special
    case: one unconditional matched-update + unconditional insert);
    reference parity: src/db/load.py:77-92 ON CONFLICT upsert.

    ``matched`` / ``not_matched_by_source``: ordered clause tuples
    ``(action, condition, assignments)`` with action ``'update'`` or
    ``'delete'``, condition a Column over aliases ``t``/``s`` (None =
    always), assignments a {col: Column} map (None = all source
    columns; ignored for delete). SQL clause-order semantics: the FIRST
    clause whose condition holds fires; if none fires the target row is
    kept. ``not_matched_insert``: None = no insert, True = insert all
    unmatched source rows, or a Column condition. NULL-key source rows
    never match (Postgres ON CONFLICT semantics, like merge_upsert).

    Runtime ambiguity check (Delta semantics): if more than one source
    row matches a target row AND a matched clause fires, the action
    raises ``MergeAmbiguityError`` via a task-side raise_error — a
    silent last-wins would make the merge nondeterministic under
    partition order. The duplicate count rides the SAME key shuffle as
    the join (a window over the source side), so the check is free at
    any scale.

    Scale: one shuffle per side on the merge key; AQE broadcasts a
    small source automatically. At 100 TB, partition/bucket the target
    by the key so only matching partitions rewrite — identical control
    flow to Delta MERGE's file-pruning (ROADMAP item 1)."""
    from pyspark.sql import Window

    cols = target.columns
    null_key = reduce(lambda a, b: a | b, (F.col(k).isNull() for k in keys))
    src_keyed = source.filter(~null_key).withColumn(
        "__src_cnt", F.count("*").over(Window.partitionBy(*keys)))
    src_nullkey = source.filter(null_key)

    s = src_keyed.alias("s")
    t = target.alias("t")
    cond = reduce(lambda a, b: a & b,
                  (F.col(f"s.{k}") == F.col(f"t.{k}") for k in keys))
    j = t.join(s, cond, "full_outer")
    in_t = reduce(lambda a, b: a | b,
                  (F.col(f"t.{k}").isNotNull() for k in keys))
    in_s = reduce(lambda a, b: a | b,
                  (F.col(f"s.{k}").isNotNull() for k in keys))

    def _row(assignments, side_default):
        out = []
        for c in cols:
            if assignments and c in assignments:
                out.append(assignments[c].alias(c))
            elif assignments is None and side_default == "s":
                out.append(F.col(f"s.{c}").alias(c))
            else:
                out.append(F.col(f"t.{c}").alias(c))
        return F.struct(*out)

    keep_t = F.struct(*[F.col(f"t.{c}").alias(c) for c in cols])

    # matched path: first clause wins; unmatched clauses keep the row
    matched_expr = keep_t
    fired = F.lit(False)
    for action, clause_cond, assignments in reversed(list(matched)):
        c = clause_cond if clause_cond is not None else F.lit(True)
        if action == "update":
            this = _row(assignments, "s")
        elif action == "delete":
            this = F.lit(None)
        else:
            raise ValueError(f"unknown matched action {action!r}")
        matched_expr = F.when(c, this).otherwise(matched_expr)
        fired = F.when(c, F.lit(True)).otherwise(fired)
    # ambiguity: >1 source row matched AND some clause fires — raise in
    # the task (CASE short-circuits, so the error fires only on the
    # offending rows; NullType coerces into the struct branch type)
    if matched:
        matched_expr = F.when(
            (F.col("__src_cnt") > 1) & fired,
            F.raise_error(F.lit(
                "MERGE ambiguity: multiple source rows matched one "
                "target row while a matched clause applied"))
        ).otherwise(matched_expr)

    # not-matched-by-source path (target only)
    nmbs_expr = keep_t
    for action, clause_cond, assignments in reversed(list(not_matched_by_source)):
        c = clause_cond if clause_cond is not None else F.lit(True)
        this = _row(assignments, "t") if action == "update" else F.lit(None)
        nmbs_expr = F.when(c, this).otherwise(nmbs_expr)

    # not-matched path (source only)
    if not_matched_insert is None:
        ins_expr = F.lit(None)
    else:
        ins_cond = (F.lit(True) if not_matched_insert is True
                    else not_matched_insert)
        ins_expr = F.when(ins_cond, _row(None, "s"))

    row = (F.when(in_t & in_s, matched_expr)
           .when(in_t, nmbs_expr)
           .otherwise(ins_expr))
    out = (j.select(row.alias("__row"))
           .filter(F.col("__row").isNotNull())
           .select("__row.*"))
    if not_matched_insert is not None:
        ins_cond = (F.lit(True) if not_matched_insert is True
                    else not_matched_insert)
        # NULL-key source rows never match: straight to the insert path.
        # Their clause condition may reference s.* only (no t side).
        nk = src_nullkey.alias("s")
        out = out.unionByName(
            nk.filter(ins_cond).select(*[F.col(f"s.{c}").alias(c)
                                         for c in cols]))
    return out
