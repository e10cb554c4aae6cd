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


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: Sequence[str]) -> DataFrame:
    """All-columns-overwrite upsert of ``updates`` into ``target``.

    Key-matched target rows are replaced by the update row; unmatched
    update rows are inserted; unmatched target rows are kept. Update rows
    with any NULL key column always insert (Postgres ON CONFLICT NULL
    semantics). Column sets must match.
    """
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
