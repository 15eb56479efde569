"""Crash-atomic, optimistically-concurrent table commits over plain
parquet — a minimal log-structured table format (the Delta/Iceberg
design point, reduced to what the write paths here need).

Why: plain ``df.write.mode("overwrite")`` (and dynamic partition
overwrite, the rollup state's old write path) deletes-then-writes in
place — a crash mid-write leaves the table truncated or a partition
half-rewritten, and two concurrent writers corrupt each other. The
reference gets atomicity from DuckDB's transactional PK inserts
(telegram_database.py:925-928); a distributed engine needs it from the
storage layout instead.

Design (the public Delta-log recipe):

* Data files are IMMUTABLE. Every commit writes fresh parquet under a
  unique ``data/<uuid>/`` directory; nothing is ever modified in place.
* The table state is a MANIFEST: ``_txn/<version>.json`` lists exactly
  the live entries (path + optional partition value + row count). A
  reader resolves the highest committed version and reads only the
  files it names — orphaned data from crashed writers is invisible.
* A commit is one atomic filesystem primitive: the manifest is written
  to a temp name, fsynced, then ``os.link``-ed to its final versioned
  name. ``link`` fails with EEXIST if that version was concurrently
  committed — the loser re-reads the log, re-resolves conflicts, and
  retries at the next version (optimistic concurrency). On object
  stores the same protocol rides a conditional PUT (S3
  If-None-Match/ETag) — the manifest layer is the only part that needs
  the primitive, data files never conflict by construction.
* Exactly-once streaming folds: a commit optionally records an
  ``applied_id``. Replaying a delivered micro-batch sees its id in the
  committed chain and skips — the marker and the state change are ONE
  atomic commit, closing the marker-after-write crash window of the
  non-transactional recipe (operators/rollup.py rollup_merge_fn).

Scale notes: the manifest holds one entry per live data directory (or
per partition subdir), not per row — thousands of entries is a small
JSON document. ``compact()`` bounds log growth by rewriting live data
and starting a fresh entry list, itself an atomic commit. Reads attach
each entry's partition value as a literal column, so partition pruning
happens at MANIFEST level (entries filtered driver-side before any
scan is planned) — the same effect as hive partition pruning without
trusting directory-listing consistency.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TXN_DIR = "_txn"
_VERSION_WIDTH = 20
# Replay-detection horizon: each manifest carries at most this many
# applied ids (oldest dropped first). Without a cap the list — copied
# forward by every commit — grows O(total batches ever applied) and each
# commit re-serializes all of it. The cap bounds manifest size at the
# cost of a bounded horizon: a replay is detected iff its id is among
# the last MAX_APPLIED_IDS committed. Structured Streaming's foreachBatch
# redelivers only the most recent unacknowledged batch per query, so any
# horizon >= the number of concurrent writer queries is safe; 4096 gives
# four orders of magnitude of headroom. (Delta bounds the same state by
# keeping one txn action per appId; ids here are opaque strings, so an
# ordered tail is the equivalent bound.)
MAX_APPLIED_IDS = 4096


def _cap_ids(ids: list[str]) -> list[str]:
    return ids[-MAX_APPLIED_IDS:] if len(ids) > MAX_APPLIED_IDS else ids


class CommitConflict(Exception):
    """Another writer committed this version first; caller must re-read
    the log, re-resolve, and retry."""


@dataclass
class Manifest:
    version: int
    # each entry: {"path": str, "partition": {col: value} | {}, "rows": int}
    entries: list[dict[str, Any]]
    applied_ids: list[str] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "entries": self.entries,
                "applied_ids": self.applied_ids,
            },
            sort_keys=True,
        )


class TxnTable:
    """A table addressed by its root directory. All methods are safe to
    call concurrently from independent writers; readers never block."""

    def __init__(self, path: str):
        self.path = path
        self._log = os.path.join(path, _TXN_DIR)

    # -- log primitives ------------------------------------------------------

    def _versions(self) -> list[int]:
        try:
            names = os.listdir(self._log)
        except FileNotFoundError:
            return []
        return sorted(
            int(n[: -len(".json")]) for n in names
            if n.endswith(".json") and n[: -len(".json")].isdigit()
        )

    def _read_manifest(self, version: int) -> Manifest:
        with open(os.path.join(self._log, f"{version:0{_VERSION_WIDTH}d}.json")) as fh:
            raw = json.load(fh)
        return Manifest(raw["version"], raw["entries"], raw.get("applied_ids", []))

    def latest(self) -> Manifest | None:
        """Resolve the highest committed manifest (None for an empty or
        nonexistent table). A half-written temp file is never visible:
        only fully-linked ``<version>.json`` names are considered."""
        versions = self._versions()
        if not versions:
            return None
        return self._read_manifest(versions[-1])

    def history(self) -> list[int]:
        """Committed versions, ascending — each is a readable snapshot
        (time travel) until a retention pass deletes its data files."""
        return self._versions()

    def _commit(self, manifest: Manifest) -> None:
        """Atomically publish ``manifest`` as its version. Raises
        CommitConflict if that version already exists (lost the race)."""
        os.makedirs(self._log, exist_ok=True)
        final = os.path.join(self._log, f"{manifest.version:0{_VERSION_WIDTH}d}.json")
        tmp = os.path.join(self._log, f".tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(manifest.to_json())
            fh.flush()
            os.fsync(fh.fileno())
        try:
            # link (not rename): EEXIST on a concurrently-taken version
            # is the conflict signal; rename would silently clobber
            os.link(tmp, final)
        except FileExistsError:
            raise CommitConflict(
                f"version {manifest.version} of {self.path} committed concurrently"
            )
        finally:
            os.unlink(tmp)

    def _write_data(
        self, df: DataFrame, partition_col: str | None
    ) -> list[dict[str, Any]]:
        """Write ``df`` to a fresh immutable data directory; return the
        manifest entries describing it. With a partition column the
        directory is split hive-style so each partition value gets its
        own entry (manifest-level pruning)."""
        dest = os.path.join(self.path, "data", uuid.uuid4().hex)
        if partition_col is None:
            n = df.count()
            if n == 0:
                return []
            df.write.mode("errorifexists").parquet(dest)
            return [{"path": dest, "partition": {}, "rows": n}]
        ptype = dict(df.dtypes)[partition_col]
        df.write.mode("errorifexists").partitionBy(partition_col).parquet(dest)
        entries = []
        for name in sorted(os.listdir(dest)):
            if "=" not in name:
                continue
            col, _, raw = name.partition("=")
            entries.append(
                {
                    "path": os.path.join(dest, name),
                    "partition": {col: raw},
                    "rows": -1,
                    # the partition column's declared type: readers
                    # reattach with THIS cast, so a string-keyed table
                    # round-trips (a hard-coded int cast would null it)
                    "ptype": ptype,
                }
            )
        return entries

    # -- reads ---------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        partition_filter: Any | None = None,
        partition_type: str = "int",
        version: int | None = None,
    ) -> DataFrame:
        """Read the current snapshot — or, with ``version``, any past
        committed snapshot (time travel: data files are immutable and
        manifests name exactly the files live at that version).
        ``partition_filter`` (a set of partition values, compared as
        strings) prunes entries at the manifest — the pruned scans are
        never planned at all."""
        m = self._read_manifest(version) if version is not None else self.latest()
        entries = m.entries if m else []
        if partition_filter is not None:
            wanted = {str(v) for v in partition_filter}
            entries = [
                e for e in entries
                if not e["partition"] or set(e["partition"].values()) & wanted
            ]
        if not entries:
            raise FileNotFoundError(f"txn table {self.path} is empty")
        parts = [self._entry_df(spark, e, partition_type) for e in entries]
        # allowMissingColumns = additive schema evolution: entries
        # written before a column existed read it as typed nulls (the
        # Delta mergeSchema read behavior); renames/drops/type changes
        # remain the caller's migration problem, as everywhere
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )

    def _entry_df(
        self, spark: SparkSession, e: dict[str, Any], partition_type: str = "int"
    ) -> DataFrame:
        """One manifest entry as a DataFrame: partitionBy strips the
        partition column from the data files, so reattach it from the
        entry with the type the WRITER recorded (fallback: the caller's
        hint, for manifests predating the ptype field)."""
        part_df = spark.read.parquet(e["path"])
        for col, raw in e["partition"].items():
            cast_to = e.get("ptype", partition_type)
            val = None if raw == "__HIVE_DEFAULT_PARTITION__" else raw
            part_df = part_df.withColumn(col, F.lit(val).cast(cast_to))
        return part_df

    def applied(self, applied_id: str) -> bool:
        """True iff a committed manifest recorded ``applied_id`` —
        the exactly-once replay check for streaming folds."""
        m = self.latest()
        return m is not None and applied_id in m.applied_ids

    # -- writes --------------------------------------------------------------

    def _retrying_commit(self, build, max_attempts: int = 12) -> Manifest:
        """Optimistic-concurrency loop: ``build(latest_manifest)``
        returns the next manifest (or None to no-op); on conflict the
        log is re-read and ``build`` re-runs against the new tip."""
        for attempt in range(max_attempts):
            base = self.latest()
            nxt = build(base)
            if nxt is None:
                return base
            nxt.version = (base.version + 1) if base else 1
            try:
                self._commit(nxt)
                return nxt
            except CommitConflict:
                time.sleep(min(0.05 * (2**attempt), 1.0))
        raise CommitConflict(f"gave up after {max_attempts} attempts on {self.path}")

    def append(
        self,
        df: DataFrame,
        applied_id: str | None = None,
        partition_col: str | None = None,
    ) -> None:
        """Atomically append ``df``'s rows (new files + manifest swap).
        With ``applied_id``, the append is exactly-once: a replay whose
        id is already committed is a no-op. With ``partition_col`` the
        new files land hive-split with per-partition manifest entries —
        appends into a partitioned table keep manifest-level pruning
        (an unpartitioned entry would be scanned by every filtered
        read until the next compact)."""
        if applied_id is not None and self.applied(applied_id):
            return
        new_entries = self._write_data(df, partition_col)

        def build(base: Manifest | None) -> Manifest | None:
            if applied_id is not None and base and applied_id in base.applied_ids:
                return None  # lost a race against our own replay twin
            entries = (list(base.entries) if base else []) + new_entries
            ids = list(base.applied_ids) if base else []
            if applied_id is not None:
                ids.append(applied_id)
            return Manifest(0, entries, _cap_ids(ids))

        self._retrying_commit(build)

    def overwrite(
        self,
        df: DataFrame,
        applied_id: str | None = None,
        partition_col: str | None = None,
        expected_version: int | None = None,
    ) -> None:
        """Atomically replace the whole table contents. With
        ``partition_col`` the new snapshot lands hive-split with
        per-partition entries — the full-rebuild form for partitioned
        tables (unlike ``replace_partitions``, values absent from
        ``df`` do NOT survive: an index retrain with fewer partitions
        leaves no stale ones).

        ``expected_version`` is the same optimistic-concurrency handle
        as on ``replace_partitions``: read-merge-overwrite callers pin
        the version they merged against and get CommitConflict (to
        re-read and re-merge) if another writer landed in between."""
        if applied_id is not None and self.applied(applied_id):
            return
        new_entries = self._write_data(df, partition_col)

        def build(base: Manifest | None) -> Manifest | None:
            if expected_version is not None:
                tip = base.version if base else 0
                if tip != expected_version:
                    raise CommitConflict(
                        f"{self.path} moved to v{tip} (expected v{expected_version})"
                    )
            if applied_id is not None and base and applied_id in base.applied_ids:
                return None
            ids = list(base.applied_ids) if base else []
            if applied_id is not None:
                ids.append(applied_id)
            return Manifest(0, new_entries, _cap_ids(ids))

        self._retrying_commit(build)

    def replace_partitions(
        self,
        df: DataFrame,
        partition_col: str,
        applied_id: str | None = None,
        expected_version: int | None = None,
    ) -> None:
        """Atomically replace exactly the partitions present in ``df``
        (dynamic partition overwrite with a crash-safe swap): entries
        for untouched partition values survive unchanged; the touched
        values' old entries are dropped and the new files take over —
        all in one manifest commit.

        Entries written WITHOUT partitioning (``append``/``overwrite``,
        or a ``compact`` of a mixed snapshot) may hold live rows for the
        touched values too, so they are SPLIT, not kept: their rows for
        untouched values are rewritten as per-partition entries and
        their rows for touched values are dropped — still one atomic
        commit. Requires the unpartitioned data to actually contain
        ``partition_col`` (raises ValueError otherwise — refusing is
        better than silently leaving stale rows live). Partition values
        are compared as their hive directory strings, which is exact for
        the int/simple-string keys used here.

        ``expected_version`` is the optimistic-concurrency handle for
        read-merge-replace callers (``rollup_update_txn``): the commit
        succeeds only if the table tip is still exactly that version
        (0 = expected empty). Any concurrent commit in between raises
        CommitConflict to the CALLER so it can re-read and re-merge —
        retrying internally here would silently overwrite the other
        writer's merge (lost update)."""
        if applied_id is not None and self.applied(applied_id):
            return
        spark = df.sparkSession
        new_entries = self._write_data(df, partition_col)
        touched = {v for e in new_entries for v in e["partition"].values()}

        def build(base: Manifest | None) -> Manifest | None:
            if expected_version is not None:
                tip = base.version if base else 0
                if tip != expected_version:
                    raise CommitConflict(
                        f"{self.path} moved to v{tip} (expected v{expected_version})"
                    )
            if applied_id is not None and base and applied_id in base.applied_ids:
                return None
            old = base.entries if base else []
            kept = [
                e for e in old
                if e["partition"] and not (set(e["partition"].values()) & touched)
            ]
            unpart = [e for e in old if not e["partition"]]
            split_entries: list[dict[str, Any]] = []
            if unpart and touched:
                stale = reduce(
                    lambda a, b: a.unionByName(b),
                    [spark.read.parquet(e["path"]) for e in unpart],
                )
                if partition_col not in stale.columns:
                    raise ValueError(
                        f"txn table {self.path} has unpartitioned entries without "
                        f"column {partition_col!r}; cannot replace partitions safely"
                    )
                # NULL partition values: isin() is NULL-valued for NULL
                # rows, and a bare where() would silently DROP them.
                # Keep NULL rows unless the replacement explicitly
                # targets the hive default partition.
                keep = ~F.col(partition_col).cast("string").isin(sorted(touched))
                null_kept = "__HIVE_DEFAULT_PARTITION__" not in touched
                remainder = stale.where(F.coalesce(keep, F.lit(null_kept)))
                split_entries = self._write_data(remainder, partition_col)
            elif unpart:
                kept = unpart + kept
            ids = list(base.applied_ids) if base else []
            if applied_id is not None:
                ids.append(applied_id)
            return Manifest(0, kept + split_entries + new_entries, _cap_ids(ids))

        self._retrying_commit(build)

    def merge_upsert(
        self,
        new_rows: DataFrame,
        keys: list[str],
        version_col: str | None = None,
        applied_id: str | None = None,
    ) -> None:
        """MERGE: insert-or-ignore on ``keys`` (version_col=None — the
        S5 idempotent append) or insert-or-replace keeping the highest
        ``version_col`` per key (S6 upsert). Implemented as
        read-snapshot -> plan-level merge -> atomic overwrite; the
        snapshot is pinned by the manifest, so a concurrent commit is
        detected (version conflict) and the merge re-runs against the
        new snapshot rather than silently clobbering it."""
        if applied_id is not None and self.applied(applied_id):
            return
        from terrorblade_spark.operators.relational import (
            idempotent_append,
            upsert_latest,
        )

        for attempt in range(12):
            base = self.latest()
            if base is None or not base.entries:
                merged = new_rows
            else:
                existing = self.read(new_rows.sparkSession)
                if applied_id is not None and applied_id in base.applied_ids:
                    return
                if version_col is None:
                    merged = idempotent_append(new_rows, existing, keys)
                else:
                    merged = upsert_latest(new_rows, existing, keys, version_col)
            new_entries = self._write_data(merged, None)
            nxt = Manifest(
                (base.version + 1) if base else 1,
                new_entries,
                _cap_ids(
                    (list(base.applied_ids) if base else [])
                    + ([applied_id] if applied_id is not None else [])
                ),
            )
            try:
                self._commit(nxt)
                return
            except CommitConflict:
                time.sleep(min(0.05 * (2**attempt), 1.0))
        raise CommitConflict(f"merge_upsert gave up on {self.path}")

    def delete_where(
        self,
        spark: SparkSession,
        condition: Any,
        applied_id: str | None = None,
    ) -> dict[str, int]:
        """Row-level DELETE (the Delta ``DELETE WHERE`` shape): remove
        every row matching ``condition`` (SQL string or Column) in one
        atomic manifest swap. Rows where the condition is NULL are KEPT
        (SQL three-valued semantics). Only entries that actually
        contain matches are rewritten — discovered by ONE probe scan
        over the snapshot (parquet footer stats prune it); untouched
        entries keep their immutable files, so a targeted delete from a
        large table rewrites only the hit partitions.

        Deleted rows remain readable via time travel until
        :func:`vacuum` drops the pre-delete versions — for
        right-to-be-forgotten erasure, follow with
        ``vacuum(retain_versions=1, min_age_s=0)`` once no reader needs
        the history."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        return self._delete(
            spark,
            lambda df: df.where(cond),
            lambda df: df.where(~F.coalesce(cond, F.lit(False))),
            applied_id,
        )

    def delete_keys(
        self,
        spark: SparkSession,
        keys: DataFrame,
        key_col: str,
        applied_id: str | None = None,
    ) -> dict[str, int]:
        """Row-level delete by key relation (the GDPR erasure shape:
        the key list is a DataFrame, not a literal): semi-join probe,
        anti-join rewrite — same atomic swap and touched-entries-only
        rewrite as :func:`delete_where`."""
        ks = keys.select(key_col).distinct()
        return self._delete(
            spark,
            lambda df: df.join(ks, key_col, "leftsemi"),
            lambda df: df.join(ks, key_col, "leftanti"),
            applied_id,
        )

    def _delete(
        self,
        spark: SparkSession,
        matches,
        keeps,
        applied_id: str | None,
        max_attempts: int = 12,
    ) -> dict[str, int]:
        """Shared delete engine. Each attempt probes and rewrites
        against ONE pinned snapshot and commits only if the tip has not
        moved — a concurrent append of rows that would also match is
        re-probed on the retry rather than silently surviving (the
        rollup_update_txn conflict recipe)."""
        if applied_id is not None and self.applied(applied_id):
            return {"rows_deleted": 0, "entries_rewritten": 0, "entries_kept": 0}
        for attempt in range(max_attempts):
            base = self.latest()
            if base is None or not base.entries:
                return {"rows_deleted": 0, "entries_rewritten": 0, "entries_kept": 0}
            if applied_id is not None and applied_id in base.applied_ids:
                return {"rows_deleted": 0, "entries_rewritten": 0, "entries_kept": 0}
            parts = [
                self._entry_df(spark, e).withColumn("__entry", F.lit(i))
                for i, e in enumerate(base.entries)
            ]
            snap = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
            )
            hits = {
                r["__entry"]: r["n"]
                for r in matches(snap)
                .groupBy("__entry")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            ids = list(base.applied_ids)
            if applied_id is not None:
                ids.append(applied_id)
            if not hits:
                if applied_id is None:
                    return {
                        "rows_deleted": 0,
                        "entries_rewritten": 0,
                        "entries_kept": len(base.entries),
                    }
                nxt = Manifest(base.version + 1, list(base.entries), _cap_ids(ids))
            else:
                touched = set(hits)
                t_unpart = [i for i in touched if not base.entries[i]["partition"]]
                t_part = [i for i in touched if base.entries[i]["partition"]]
                new_entries: list[dict[str, Any]] = []
                if t_unpart:
                    df = keeps(
                        snap.where(F.col("__entry").isin(t_unpart))
                    ).drop("__entry")
                    new_entries += self._write_data(df, None)
                if t_part:
                    # group touched entries by their partition column: a
                    # table mixing partition columns across entries must
                    # not re-home one column's rows under another's
                    # partitioning (that would break manifest pruning)
                    by_pcol: dict[str, list[int]] = {}
                    for i in t_part:
                        pc = next(iter(base.entries[i]["partition"]))
                        by_pcol.setdefault(pc, []).append(i)
                    for pc, idxs in sorted(by_pcol.items()):
                        df = keeps(
                            snap.where(F.col("__entry").isin(idxs))
                        ).drop("__entry")
                        new_entries += self._write_data(df, pc)
                kept = [
                    e for i, e in enumerate(base.entries) if i not in touched
                ]
                nxt = Manifest(
                    base.version + 1, kept + new_entries, _cap_ids(ids)
                )
            try:
                self._commit(nxt)
                return {
                    "rows_deleted": sum(hits.values()),
                    "entries_rewritten": len(hits),
                    "entries_kept": len(base.entries) - len(hits),
                }
            except CommitConflict:
                time.sleep(min(0.05 * (2**attempt), 1.0))
        raise CommitConflict(
            f"delete gave up after {max_attempts} attempts on {self.path}"
        )

    def compact(self, spark: SparkSession) -> None:
        """Rewrite the live snapshot into one fresh data directory and
        commit a minimal manifest — bounds manifest growth after many
        incremental commits. A table whose live entries are all
        partitioned by the same single column keeps that partitioning
        (one entry per value, so manifest-level pruning and
        ``replace_partitions`` stay cheap after a compact); mixed or
        unpartitioned snapshots compact to one unpartitioned entry,
        which ``replace_partitions`` splits safely if later touched.
        Readers mid-flight keep their pinned snapshot (old files are
        not deleted here; vacuuming orphans is a separate retention
        decision, as in every log-structured format)."""
        m = self.latest()
        if m is None or len(m.entries) <= 1:
            return
        part_keys = {tuple(sorted(e["partition"])) for e in m.entries}
        keep_col = None
        if len(part_keys) == 1:
            only = next(iter(part_keys))
            if len(only) == 1:
                keep_col = only[0]
        snap = self.read(spark)
        new_entries = self._write_data(snap, keep_col)

        def build(base: Manifest | None) -> Manifest | None:
            if base is not None and base.version != m.version:
                return None  # someone committed since; skip this cycle
            return Manifest(0, new_entries, list(m.applied_ids))

        self._retrying_commit(build)

    def vacuum(
        self,
        retain_versions: int = 1,
        min_age_s: float = 7 * 24 * 3600.0,
        tmp_age_floor_s: float = 60.0,
    ) -> dict[str, int]:
        """Reclaim storage: delete data directories referenced by NO
        retained manifest, and manifests older than the retention
        window. Returns {"data_dirs": n, "manifests": n} deleted.

        Retention contract (the Delta VACUUM trade-off): the newest
        ``retain_versions`` manifests stay readable (time travel
        shrinks to that window); anything a retained manifest
        references is never touched. ``min_age_s`` additionally spares
        YOUNG unreferenced directories — an in-flight writer has
        already written its data files but not yet committed its
        manifest, and deleting under it would fail its commit's
        durability; the default 7-day guard makes that race practically
        impossible (pass 0 only in tests). Orphan ``.tmp.*`` manifests
        are reclaimed under ``max(min_age_s, tmp_age_floor_s)`` — the
        separate always-positive floor keeps a min_age_s=0 maintenance
        run from unlinking a live committer's tmp file mid-commit;
        ``tmp_age_floor_s`` must exceed worst-case commit latency. Deletion is driver-side
        filesystem IO over the table root — O(live data dirs), no
        Spark job; on object stores this is the same LIST + DELETE
        sweep every log-structured format runs."""
        import shutil

        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        versions = self._versions()
        if not versions:
            return {"data_dirs": 0, "manifests": 0}
        retained = versions[-retain_versions:]
        live_roots: set[str] = set()
        for v in retained:
            for e in self._read_manifest(v).entries:
                # entries point at data/<uuid> or data/<uuid>/<col>=v;
                # the vacuum unit is the top-level uuid directory
                rel = os.path.relpath(e["path"], os.path.join(self.path, "data"))
                live_roots.add(rel.split(os.sep)[0])
        deleted_dirs = 0
        data_root = os.path.join(self.path, "data")
        now = time.time()
        for name in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
            full = os.path.join(data_root, name)
            if name in live_roots or not os.path.isdir(full):
                continue
            if now - os.path.getmtime(full) < min_age_s:
                continue  # possibly an uncommitted writer's fresh files
            shutil.rmtree(full)
            deleted_dirs += 1
        deleted_manifests = 0
        for v in versions:
            if v not in retained:
                os.unlink(os.path.join(self._log, f"{v:0{_VERSION_WIDTH}d}.json"))
                deleted_manifests += 1
        # a writer killed inside _commit (tmp manifest written, link not
        # taken) leaves an orphan .tmp.* file; readers ignore them, but
        # reclaim the stale ones. The age guard here has its OWN floor
        # (``tmp_age_floor_s``), independent of min_age_s: callers pass
        # min_age_s=0 in tests/offline maintenance, but unlinking a LIVE
        # committer's tmp file inside its tmp-write -> atomic-link
        # window would fail that commit (retryable, not corrupting) —
        # the 60 s default exceeds any plausible commit latency while
        # still reclaiming genuinely dead files
        tmp_age_floor = max(min_age_s, tmp_age_floor_s)
        for name in sorted(os.listdir(self._log)) if os.path.isdir(self._log) else []:
            if not name.startswith(".tmp."):
                continue
            full = os.path.join(self._log, name)
            try:
                if now - os.path.getmtime(full) >= tmp_age_floor:
                    os.unlink(full)
            except FileNotFoundError:
                pass  # a live committer's finally-unlink won the race
        return {"data_dirs": deleted_dirs, "manifests": deleted_manifests}
