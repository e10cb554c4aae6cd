"""Atomic multi-table publish on plain parquet (manifest-log commit).

The reference wraps the staging→final merge and the staging delete in ONE
database transaction (reference src/db/load.py:230-234, with rollback at
:44-50): readers never see a merged target alongside a stale staging
table. ``staging_merge`` returns two DataFrames; writing them as two
independent parquet overwrites re-introduces exactly the torn state the
reference's transaction prevents — a crash between the writes leaves one
table new and the other old.

This module is the minimal storage-format answer (the idea the
Delta/Iceberg commit logs generalize): data files are immutable and
versioned, and a commit IS the atomic creation of a fully-durable
manifest file at the next version number:

1. every table's new version is written to a fresh directory
   (``data/<table>/v<N>-<nonce>/``) — a crash here leaves unreferenced
   garbage, never visible state;
2. the manifest (version → table paths + meta) is written to a unique
   temp file and fsync'd, then ``os.link``-ed to ``_versions/vNNN.json``.
   The hardlink is the commit point: it is atomic, it fails (EEXIST) if
   another writer claimed the version first, and — because the content
   was durable BEFORE the link — a manifest file either doesn't exist or
   is complete. There is no separate pointer to swap, so there is no
   window in which a claimed-but-unpointed version can wedge the log
   (the round-2 livelock): the current version is simply the highest
   manifest present.
3. a loser of the link race rebases and retries: it re-reads the new
   current manifest, carries the winner's tables forward, and claims the
   next version — UNLESS the winner modified one of the tables this
   publish is also writing, which is a real write-write conflict and
   raises ``CommitConflict`` (the caller must recompute from a fresh
   snapshot, exactly like a serialization failure in the reference's
   Postgres transaction).

Readers are snapshot-isolated for free: a reader that resolved version N
keeps reading N's immutable files while writers commit N+1, N+2, …
``vacuum`` honors that with a retention window (keep the last
``keep_last`` versions' files, never delete directories younger than
``min_age_s`` — which also protects data an in-flight publisher has
written but not yet committed). On a real cluster the manifest dir lives
on a store with atomic create-if-absent (HDFS create, S3 conditional
put); the protocol is unchanged. At very high commit rates the listing
in ``current_version`` is the scaling limit — the known fix is
checkpoint summaries every K commits (what Delta does), orthogonal here.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_RE = re.compile(r"^v(\d{8})\.json$")


class ConstraintViolation(Exception):
    """A Delta-style CHECK constraint failed during publish — the write
    aborted before any manifest claim, so no version was committed."""


class CommitConflict(Exception):
    """A concurrent writer changed a table this publish also writes.
    The caller's input DataFrames were derived from a stale snapshot —
    recompute them from the new current version and retry."""


class TableGroup:
    """A set of tables that commit together under one manifest log."""

    def __init__(self, root: str):
        self.root = root
        self._vdir = os.path.join(root, "_versions")
        os.makedirs(self._vdir, exist_ok=True)

    # ------------------------------------------------------------- reads

    def _versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._vdir):
            m = _MANIFEST_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int | None:
        """Highest committed version. At high commit rates a full listing
        per resolve is the log's scaling limit (the checkpoint problem
        Delta's `_last_checkpoint` solves); the same fix here: an
        ADVISORY hint file written after each commit bounds the probe.
        The hint is safe by construction — it is written AFTER the
        manifest hardlink, so it can only lag (crash between link and
        hint ⇒ stale-low), and a stale or corrupt hint degrades to the
        probe/listing path, never to a wrong answer."""
        hint = self._read_hint()
        if hint is not None and os.path.exists(self._manifest_path(hint)):
            v = hint
            while os.path.exists(self._manifest_path(v + 1)):
                v += 1  # O(commits since hint), not O(all commits)
            return v
        vs = self._versions()
        return vs[-1] if vs else None

    def _read_hint(self) -> int | None:
        try:
            with open(os.path.join(self._vdir, "_last")) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def _write_hint(self, version: int) -> None:
        """Best-effort monotone hint (atomic replace; losers of a hint
        race just leave a slightly staler hint — the probe absorbs it)."""
        tmp = os.path.join(self._vdir, f".hint-{uuid.uuid4().hex}")
        try:
            with open(tmp, "w") as f:
                f.write(str(version))
            os.replace(tmp, os.path.join(self._vdir, "_last"))
        except OSError:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._vdir, f"v{version:08d}.json")

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            return {"version": 0, "tables": {}, "meta": {}}
        with open(self._manifest_path(v)) as f:
            m = json.load(f)
        m.setdefault("meta", {})
        return m

    def tables(self) -> list[str]:
        return sorted(self.manifest()["tables"])

    def read(self, spark: SparkSession, name: str,
             version: int | None = None) -> DataFrame:
        """Read a table at the current (or a pinned) version. Pinning a
        version is snapshot isolation: the manifest and data files are
        immutable, so the snapshot stays readable as long as vacuum
        retention covers it."""
        m = self.manifest(version)
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} not in group (version {m['version']})")
        return spark.read.parquet(m["tables"][name])

    # -------------------------------------------------------------- tags

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a named immutable reference to a version (Iceberg tag
        semantics): O_EXCL file creation is the claim, so a tag can never
        be silently repointed — delete + recreate is the explicit
        (auditable) way to move one. Tagged versions are protected from
        :meth:`vacuum` regardless of the retention window."""
        v = self.current_version() if version is None else version
        if v is None or not os.path.exists(self._manifest_path(v)):
            raise ValueError(f"cannot tag non-existent version {version!r}")
        tdir = os.path.join(self.root, "_tags")
        os.makedirs(tdir, exist_ok=True)
        path = os.path.join(tdir, f"{name}.json")
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, json.dumps({"version": v}).encode())
            os.fsync(fd)
        finally:
            os.close(fd)
        return v

    def tags(self) -> dict[str, int]:
        tdir = os.path.join(self.root, "_tags")
        out: dict[str, int] = {}
        if os.path.isdir(tdir):
            for name in os.listdir(tdir):
                if name.endswith(".json"):
                    with open(os.path.join(tdir, name)) as f:
                        out[name[:-5]] = json.load(f)["version"]
        return out

    def drop_tag(self, name: str) -> None:
        os.unlink(os.path.join(self.root, "_tags", f"{name}.json"))

    def read_tag(self, spark: SparkSession, name: str,
                 table_name: str) -> DataFrame:
        tags = self.tags()
        if name not in tags:
            raise KeyError(f"no tag {name!r}")
        return self.read(spark, table_name, version=tags[name])

    # ------------------------------------------------------------ commit

    def _try_claim(self, version: int, payload: dict) -> bool:
        """Atomically claim ``version`` with a fully-durable manifest.
        Content is written + fsync'd to a unique temp file first, then
        hardlinked into place — the link is the commit point, so a
        manifest can never exist half-written. Returns False if another
        writer claimed the version first."""
        tmp = os.path.join(self._vdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._manifest_path(version))
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        # durability of the directory entry itself
        dfd = os.open(self._vdir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        return True

    def publish(self, dfs: dict[str, DataFrame], meta: dict | None = None,
                max_retries: int = 5,
                _before_claim=None,
                stats_columns: dict[str, list[str]] | None = None,
                constraints: dict[str, str] | None = None) -> int:
        """Atomically publish new versions of the given tables.

        Tables in the group but not in ``dfs`` carry forward unchanged
        (their previous paths are re-referenced, not rewritten). ``meta``
        (JSON-serializable) commits atomically WITH the data in the same
        manifest — the hook sinks use to fence replayed micro-batches
        (a batch-id ledger that can never be newer or older than the
        table it describes). Returns the committed version.

        Concurrency: optimistic with rebase. Data directories are
        written once; if another writer commits first, this publish
        re-reads the new current manifest, carries the winner's tables
        forward, and claims the next version. If the winner changed a
        table also being written here, the inputs were computed from a
        stale snapshot — ``CommitConflict`` is raised and no partial
        state is visible. ``_before_claim`` is a test seam invoked once
        after data is durable and before the first claim attempt
        (concurrency/crash injection).

        ``stats_columns`` ({table: [column, ...]}) opts tables into
        file-level zone maps (``operators/zonemap.py``): footers of the
        just-written files are read once and the per-file min/max stats
        ride THIS manifest commit under ``meta["zonemaps"]`` — stats and
        data are atomic, so ``zonemap.read_where`` can never prune
        against a different version than it reads. Republishing a table
        WITHOUT stats drops its (now stale) zone map; untouched tables
        carry their zone maps forward with their paths.

        ``constraints`` ({table: SQL predicate}) are Delta-style CHECK
        constraints enforced DURING the data write: each row is passed
        through a short-circuiting CASE that raises on violation, so the
        check costs no extra job or scan. A violating row aborts the
        write before any manifest is claimed — the group's visible state
        is untouched (the half-written fresh directory is unreferenced
        garbage for vacuum) and :class:`ConstraintViolation` is raised.
        """
        base = self.manifest()
        written: dict[str, str] = {}
        v_hint = base["version"] + 1
        for name, df in dfs.items():
            pred = (constraints or {}).get(name)
            if pred is not None:
                # CASE short-circuits: raise_error only evaluates on
                # violating rows; rides the write pass itself
                guard = F.when(F.expr(pred), F.lit(True)).otherwise(
                    F.raise_error(F.lit(
                        f"CHECK constraint violated on {name!r}: {pred}")))
                df = df.filter(guard)
            path = os.path.join(self.root, "data", name,
                                f"v{v_hint:08d}-{uuid.uuid4().hex[:8]}")
            try:
                df.write.mode("error").parquet(path)  # fresh dir: never overwrite
            except Exception as ex:
                if "CHECK constraint violated" in str(ex):
                    raise ConstraintViolation(
                        f"publish aborted: CHECK constraint failed on "
                        f"{name!r} ({pred}); no version was committed"
                    ) from ex
                raise
            written[name] = path
        zonemaps: dict[str, dict] = {}
        if stats_columns:
            from .zonemap import collect_file_stats
            for name, cols in stats_columns.items():
                if name in written and cols:
                    zonemaps[name] = collect_file_stats(written[name], cols)
        if _before_claim is not None:
            _before_claim()
        for _ in range(max_retries + 1):
            cur = self.manifest()
            for name in dfs:
                if cur["tables"].get(name) != base["tables"].get(name):
                    raise CommitConflict(
                        f"table {name!r} changed by a concurrent commit "
                        f"(base v{base['version']} → v{cur['version']}); "
                        "recompute from the current snapshot and retry")
            v = cur["version"] + 1
            merged_meta = {**cur.get("meta", {}), **(meta or {})}
            zm = {k: v2 for k, v2 in
                  {**cur.get("meta", {}).get("zonemaps", {}), **zonemaps}
                  .items()
                  if k not in written or k in zonemaps}  # drop stale maps
            if zm:
                merged_meta["zonemaps"] = zm
            elif "zonemaps" in merged_meta:
                del merged_meta["zonemaps"]
            payload = {"version": v, "tables": {**cur["tables"], **written},
                       "meta": merged_meta}
            if self._try_claim(v, payload):
                self._write_hint(v)
                return v
            # lost the race on a DISJOINT commit: rebase onto it and retry
        raise CommitConflict(f"lost the version race {max_retries + 1} times")

    # ----------------------------------------------------------- cleanup

    def vacuum(self, keep_last: int = 1, min_age_s: float = 0.0) -> list[str]:
        """Delete data directories not referenced by the newest
        ``keep_last`` versions (aborted publishes, superseded versions),
        plus stale manifest temp files.

        ``keep_last`` is the snapshot-retention window: readers pinned to
        any of the last ``keep_last`` versions stay valid. ``min_age_s``
        additionally protects young directories — including data an
        in-flight publisher has written but not yet committed (data lands
        before the manifest), so vacuum is safe to run alongside writers
        when ``min_age_s`` exceeds the longest plausible publish duration.
        With the defaults (keep_last=1, min_age_s=0) it reclaims
        everything but the current version and must not run concurrently
        with a publisher — the round-2 footgun, now opt-out rather than
        always-on."""
        import shutil
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (current version is live)")
        vs = self._versions()
        live: set[str] = set()
        keep = set(vs[-keep_last:]) | set(self.tags().values())
        for v in keep:  # retention window + every tagged version
            live.update(self.manifest(v)["tables"].values())
        now = time.time()
        removed: list[str] = []
        data_root = os.path.join(self.root, "data")
        if os.path.isdir(data_root):
            for tbl in os.listdir(data_root):
                tdir = os.path.join(data_root, tbl)
                for vdir in os.listdir(tdir):
                    path = os.path.join(tdir, vdir)
                    if path in live:
                        continue
                    if now - os.path.getmtime(path) < min_age_s:
                        continue
                    shutil.rmtree(path)
                    removed.append(path)
        for name in os.listdir(self._vdir):
            if name.startswith(".tmp-"):
                path = os.path.join(self._vdir, name)
                if now - os.path.getmtime(path) >= min_age_s:
                    os.unlink(path)
        return removed
