"""Atomic multi-table publish on plain parquet (version-pointer commit).

The reference wraps the staging→final merge and the staging delete in ONE
database transaction (reference src/db/load.py:230-234, with rollback at
:44-50): readers never see a merged target alongside a stale staging
table. ``staging_merge`` returns two DataFrames; writing them as two
independent parquet overwrites re-introduces exactly the torn state the
reference's transaction prevents — a crash between the writes leaves one
table new and the other old.

This module is the minimal storage-format answer (the idea Delta/Iceberg
commit logs generalize): data files are immutable and versioned, and the
ONLY mutable object is a single pointer file advanced with an atomic
rename. One pointer covers the whole table *group*, so a multi-table
publish is all-or-nothing by construction:

1. every table's new version is written to a fresh directory
   (``data/<table>/v<N>-<nonce>/``) — crash here leaves unreferenced
   garbage, never visible state;
2. a manifest (version → table paths) is created with O_EXCL — a
   concurrent committer racing to the same version loses and retries
   rather than silently clobbering (single-writer optimistic check);
3. the ``current`` pointer file is replaced via write-temp + fsync +
   ``os.replace`` — POSIX-atomic; readers resolve the pointer, then the
   manifest, then read immutable paths.

Readers are snapshot-isolated for free: a reader that resolved version N
keeps reading N's immutable files while a writer publishes N+1. On a real
cluster the pointer lives on a store with atomic rename (HDFS) or
conditional put (S3); the protocol is unchanged.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer published this version first — reload and retry."""


class TableGroup:
    """A set of tables that commit together under one version pointer."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_versions"), exist_ok=True)

    # ------------------------------------------------------------- reads

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "current")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_versions", f"v{version:08d}.json")

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            return {"version": 0, "tables": {}}
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def tables(self) -> list[str]:
        return sorted(self.manifest()["tables"])

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        m = self.manifest()
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} not in group (version {m['version']})")
        return spark.read.parquet(m["tables"][name])

    # ------------------------------------------------------------ commit

    def publish(self, dfs: dict[str, DataFrame],
                meta: dict | None = None) -> int:
        """Atomically publish new versions of the given tables.

        Tables in the group but not in ``dfs`` carry forward unchanged
        (their previous paths are re-referenced, not rewritten). ``meta``
        (JSON-serializable) commits atomically WITH the data in the same
        manifest — the hook sinks use to fence replayed micro-batches
        (a batch-id ledger that can never be newer or older than the
        table it describes). Returns the committed version. Raises
        CommitConflict if another writer claimed the version first; no
        partial state is visible either way.
        """
        prev = self.manifest()
        v = prev["version"] + 1
        tables = dict(prev["tables"])  # carried-forward paths
        for name, df in dfs.items():
            path = os.path.join(self.root, "data", name,
                                f"v{v:08d}-{uuid.uuid4().hex[:8]}")
            df.write.mode("error").parquet(path)  # fresh dir: never overwrite
            tables[name] = path
        # claim the version: O_EXCL create loses loudly on a race
        mpath = self._manifest_path(v)
        try:
            fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as e:
            raise CommitConflict(f"version {v} already claimed") from e
        with os.fdopen(fd, "w") as f:
            json.dump({"version": v, "tables": tables,
                       "meta": {**(prev.get("meta") or {}), **(meta or {})}}, f)
            f.flush()
            os.fsync(f.fileno())
        # THE commit point: atomic pointer swap
        tmp = self._pointer + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer)
        return v

    # ----------------------------------------------------------- cleanup

    def vacuum(self) -> list[str]:
        """Delete data directories not referenced by the CURRENT version
        (aborted publishes, superseded versions). Run only when no reader
        may still hold an older snapshot."""
        import shutil
        live = set(self.manifest()["tables"].values())
        removed = []
        data_root = os.path.join(self.root, "data")
        if not os.path.isdir(data_root):
            return removed
        for tbl in os.listdir(data_root):
            tdir = os.path.join(data_root, tbl)
            for vdir in os.listdir(tdir):
                path = os.path.join(tdir, vdir)
                if path not in live:
                    shutil.rmtree(path)
                    removed.append(path)
        return removed
