"""Atomic multi-partition commit for the typed store: a snapshot manifest
over plain parquet (the missing transactionality of dynamic partition
overwrite — VERDICT r3 item 2).

Reference parity: the reference's store patches tiles in place behind a
journal (clarisma/common/store/ Store.java journaled writes;
update/Updater.java:34-55 applies a .osc as one recoverable unit) — a
crash mid-update leaves either the old or the new store after rollback.
The Spark/parquet mapping gets the same guarantee the way table formats
do (Iceberg/Delta): immutable data files + ONE atomically-swapped
pointer, instead of in-place journaled patching.

Layout (versioned stores):

    <store>/_manifest/v<N>.json    full snapshot: for every table, the
                                   partition -> [data files] map + schema.
                                   CREATING this file IS the commit
                                   (atomic put-if-absent via os.link)
    <store>/_manifest/CURRENT      -> "N"   monotonic HINT, advanced
                                   best-effort after commit; readers
                                   probe upward from it
    <table>/e<V>-<token>/pile=<v>/part-*.parquet   (one tx's staging)

Every merge batch writes NEW files into a fresh uniquely-named epoch
directory (never touching live files, never colliding with a concurrent
writer's staging), builds manifest v<V> referencing the new files for
affected partitions and the OLD files for untouched ones, and publishes
by linking the complete, fsynced manifest into place — put-if-absent on
the version number is the linearization point, exactly the Delta-log
commit protocol (open-source delta-io PROTOCOL.md; Iceberg's atomic
metadata swap).  Readers resolve version -> manifest -> explicit file
list, so they observe snapshot N or N+1, never a mix; partition pruning
happens at manifest level (the file list is filtered BEFORE Spark plans
the scan — the same planning-time pruning Iceberg does, no directory
listing at any store size).  The partition column is reconstructed from
the file path (`input_file_name()` regexp), so one multi-epoch read
needs no basePath gymnastics.

Concurrent writers (round 5; previously a documented single-writer
assumption): each StoreTx tracks its READ set (which partitions of
which tables its merge plan consumed) and WRITE set.  A writer that
loses the version race rebases: if no intervening commit touched its
read or write set, its staged files re-apply on top of the latest
snapshot and the claim retries at the next version; otherwise commit()
raises CommitConflict and the caller re-runs the batch against the new
snapshot (the merge loop in changes_full does this automatically).
This is optimistic concurrency with serializable validation over the
tracked read set — the model Iceberg/Delta use — replacing the
reference's EXCLUSIVE store lock (clarisma/common/store/Store.java
single-process journal lock; gol update serializes updaters), which has
no analogue on an object store.

Crash points: before the manifest link -> nothing published, readers
keep snapshot N; the streaming replay re-runs the batch into a fresh
epoch dir (orphaned staging expires via vacuum_store).  After the link
-> snapshot N+1 is complete and discoverable (readers probe past a
stale CURRENT hint), and a replay of the same batch is idempotent
(upserts/deletes are last-wins by id).  Superseded files expire via
DELAYED GC with a one-snapshot grace period (commit of V deletes what
only V-2 referenced), so a reader whose explicit-path plan resolved the
previous snapshot still finds every file — the Iceberg snapshot-expiry
model with retention 1.  Empty partitions need no placeholder files
(the manifest simply drops the partition — the schema travels in the
manifest), which also retires the empty-partition parquet-footer hazard
of the legacy layout.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_log = logging.getLogger(__name__)


def _manifest_dir(store_root: str) -> str:
    return os.path.join(store_root, "_manifest")


def _current_path(store_root: str) -> str:
    return os.path.join(_manifest_dir(store_root), "CURRENT")


class CommitConflict(RuntimeError):
    """An intervening commit touched this transaction's read or write
    set; the batch must be recomputed against the new snapshot."""


def _manifest_path(store_root: str, version: int) -> str:
    return os.path.join(_manifest_dir(store_root), f"v{version}.json")


def _is_committed(store_root: str, version: int) -> bool:
    """A version exists iff its manifest file parses as that version —
    guards against garbage files blocking the probe.  Fast path: only
    complete fsynced manifests are ever linked in and json.dumps puts
    "version" first, so a bounded prefix read answers the probe without
    parsing the (potentially large) partition file lists; anything that
    doesn't match the expected prefix falls back to a full parse."""
    path = _manifest_path(store_root, version)
    try:
        with open(path) as fh:
            head = fh.read(64)
            if head.startswith('{"version": '):
                rest = head[len('{"version": '):]
                digits = rest[: len(rest) - len(rest.lstrip("0123456789"))]
                if digits:
                    return int(digits) == version
            fh.seek(0)
            return json.load(fh).get("version") == version
    except (OSError, ValueError):
        return False


def is_versioned(store_root: str) -> bool:
    """CURRENT is a losable best-effort hint, and vacuum trims old
    manifests (v1 included), so the fallback probes the manifest dir for
    ANY committed version — a versioned store must never silently open
    as legacy (legacy dynamic overwrites would corrupt the epoch
    layout)."""
    if os.path.exists(_current_path(store_root)):
        return True
    try:
        names = os.listdir(_manifest_dir(store_root))
    except OSError:
        return False
    return any(
        n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
        and _is_committed(store_root, int(n[1:-5]))
        for n in names
    )


def current_version(store_root: str) -> int:
    """Latest committed snapshot: start from the CURRENT hint, VALIDATE
    it (a crash can persist the hint before the linked manifest dirent,
    so a forward hint is walked back to the newest committed version),
    then probe upward past any stale hint.  O(1) amortized — the hint is
    advanced best-effort after each commit — and trusted in neither
    direction."""
    v = 0
    try:
        with open(_current_path(store_root)) as fh:
            v = int(fh.read().strip())
    except (OSError, ValueError):
        pass
    while v > 0 and not _is_committed(store_root, v):
        v -= 1
    while _is_committed(store_root, v + 1):
        v += 1
    if v == 0:
        # hint missing or useless: find any committed version to probe from
        best = 0
        try:
            for n in os.listdir(_manifest_dir(store_root)):
                if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit():
                    cand = int(n[1:-5])
                    if cand > best and _is_committed(store_root, cand):
                        best = cand
        except OSError:
            pass
        if best == 0:
            raise FileNotFoundError(f"no committed snapshot under {store_root}")
        v = best
    return v


def list_versions(store_root: str) -> list[int]:
    """Committed snapshot versions still retained on disk, ascending —
    the store's snapshot log (Iceberg `snapshots` metadata table).  The
    last two are always fully readable (commit-time GC keeps a
    one-snapshot grace period); older retained manifests stay readable
    until vacuum_store or a later commit's GC removes their files."""
    try:
        names = os.listdir(_manifest_dir(store_root))
    except OSError:
        return []
    return sorted(
        int(n[1:-5])
        for n in names
        if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
        and _is_committed(store_root, int(n[1:-5]))
    )


def _fsync_dir(path: str) -> None:
    """Persist directory entries (the link/rename itself) — without this
    a power loss can keep a later write (e.g. the CURRENT hint) while
    losing an earlier dirent.  Best-effort: not every FS supports it."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:  # pragma: no cover - platform-specific
        return
    try:
        os.fsync(fd)
    except OSError:  # pragma: no cover - platform-specific
        pass
    finally:
        os.close(fd)


def _claim_version(store_root: str, version: int, payload: str) -> bool:
    """Atomic put-if-absent of a COMPLETE manifest: the payload is fully
    written and fsynced into a private temp file, then hard-linked to the
    version path — link(2) either installs the whole file or fails with
    EEXIST, so no reader or competing writer can ever observe a partial
    manifest.  The directory is fsynced after the link so the manifest
    dirent is durable before the CURRENT hint can be.  (Object-store
    deployments would use the native put-if-absent — e.g. S3
    If-None-Match — behind this same seam.)"""
    final = _manifest_path(store_root, version)
    tmp = os.path.join(
        _manifest_dir(store_root), f".tx-{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
    )
    try:
        with open(tmp, "w") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.link(tmp, final)
        _fsync_dir(_manifest_dir(store_root))
        return True
    except FileExistsError:
        return False
    finally:
        try:
            os.unlink(tmp)
        except OSError:  # write failed before tmp existed
            pass


def load_manifest(store_root: str, version: int | None = None) -> dict:
    v = current_version(store_root) if version is None else version
    with open(os.path.join(_manifest_dir(store_root), f"v{v}.json")) as fh:
        man = json.load(fh)
    if man.get("version") != v:
        # garbage that parses as JSON under the right name — same guard
        # as _is_committed, as a real error (not an assert: must survive
        # python -O, and callers catch ValueError)
        raise ValueError(f"manifest v{v}.json carries version {man.get('version')}")
    return man


def _atomic_write(path: str, data: str) -> None:
    """write+fsync+rename with a UNIQUE temp name: concurrent committers
    race on the CURRENT hint, and a shared .tmp path would let one
    writer's os.replace steal the other's temp file out from under it."""
    tmp = f"{path}.{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp"
    try:
        with open(tmp, "w") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
        _fsync_dir(os.path.dirname(path))
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _list_epoch_files(table_root: str, epoch: str, part: str) -> dict[str, list[str]]:
    """Files written under <table_root>/<epoch>, keyed by partition value
    (as the string from the directory name), paths relative to table_root."""
    out: dict[str, list[str]] = {}
    edir = os.path.join(table_root, epoch)
    prefix = part + "="
    if not os.path.isdir(edir):
        return out
    for d in sorted(os.listdir(edir)):
        if not d.startswith(prefix):
            continue
        pv = d[len(prefix):]
        files = [
            os.path.join(epoch, d, f)
            for f in sorted(os.listdir(os.path.join(edir, d)))
            if not f.startswith(("_", ".")) and f.endswith(".parquet")
        ]
        if files:
            out[pv] = files
    return out


def _partition_metrics(
    table_root: str, files: dict[str, list[str]]
) -> dict[str, dict]:
    """Per-partition {rows, bytes} for freshly staged files — footer-only
    reads (pyarrow metadata, zero data scan), driver-side but bounded by
    THIS tx's written files (O(affected partitions), never O(store)).
    Persisted in the manifest so snapshot row-count/byte metrics travel
    with the commit (the Iceberg snapshot-summary analogue, and the
    north-rule 'metrics persisted alongside snapshots' requirement)."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for pv, fl in files.items():
        rows = nbytes = 0
        for f in fl:
            full = os.path.join(table_root, f)
            rows += pq.ParquetFile(full).metadata.num_rows
            nbytes += os.path.getsize(full)
        out[pv] = {"rows": int(rows), "bytes": int(nbytes)}
    return out


def _part_col(part: str, ptype: str):
    """Reconstruct the partition value from the data file path."""
    return F.regexp_extract(F.input_file_name(), f"/{part}=(-?[^/]+)/", 1).cast(ptype)


def read_resolved(
    spark: SparkSession,
    table_root: str,
    entry: dict,
    parts: list | None = None,
) -> DataFrame:
    """Manifest-resolved read of one table; `parts` prunes the file list at
    planning time (the PartitionFilters analogue)."""
    sel = entry["parts"]
    if parts is not None:
        want = {str(v) for v in parts}
        sel = {k: v for k, v in sel.items() if k in want}
    files = [os.path.join(table_root, f) for fl in sel.values() for f in fl]
    schema = StructType.fromJson(json.loads(entry["schema"]))
    if not files:
        empty = spark.createDataFrame([], schema)
        return empty.withColumn(entry["part"], F.lit(None).cast(entry["ptype"]))
    return (
        spark.read.schema(schema)
        .parquet(*files)
        .withColumn(entry["part"], _part_col(entry["part"], entry["ptype"]))
    )


class StoreTx:
    """One merge batch's transaction over a versioned store: read-your-
    writes within the batch, publish-all-or-nothing at commit."""

    def __init__(
        self,
        spark: SparkSession,
        store_root: str,
        paths: dict[str, str],
        reset: bool = False,
    ):
        """reset=True gives the transaction FULL-OVERWRITE semantics (a
        bulk re-load): the new snapshot starts from an empty table map,
        so partitions/tables absent from this tx's writes disappear from
        the store instead of silently carrying the old manifest entries
        forward."""
        self.spark = spark
        self.root = store_root
        self.paths = paths
        if is_versioned(store_root):
            self.base_version = current_version(store_root)
            man = load_manifest(store_root, self.base_version)
            # _base_tables keeps the pristine parse (read-only, used for
            # conflict validation); tables gets the ONE mutable copy
            self._base_tables: dict[str, dict] = man["tables"]
            self.tables: dict[str, dict] = json.loads(json.dumps(man["tables"]))
            base_meta = man.get("meta")
        else:
            self.base_version = 0
            self._base_tables = {}
            self.tables = {}
            base_meta = None
        self.version = self.base_version + 1
        self._base_meta = base_meta
        self._reset = reset
        self._meta_set = False
        # read/write sets for optimistic-concurrency validation: partition
        # values (as manifest strings) per table; None = whole table
        self._read: dict[str, set[str] | None] = {}
        self._staged: dict[str, dict] = {}
        # unique staging namespace: concurrent writers never share an
        # epoch dir, so mode=overwrite staging cannot clobber a peer
        self._token = uuid.uuid4().hex[:8]
        # liveness heartbeat: vacuum_store must not reclaim THIS tx's
        # staging while it is still making progress, however long the
        # batch runs — the marker is touched on every staged write and
        # removed when commit() returns or conflicts; a crashed tx's
        # marker simply ages out with its staging
        os.makedirs(_manifest_dir(store_root), exist_ok=True)
        self._marker = os.path.join(
            _manifest_dir(store_root), f".inprogress-{self._token}"
        )
        with open(self._marker, "w") as fh:
            fh.write(str(os.getpid()))
        self._sweep_stale_epochs()
        if reset:
            self.tables = {}
        self._written: set[str] = set()
        # join hint for delta-derived key sets; the merge cascade swaps in
        # a no-op for oversized batches (changes_full.BROADCAST_DELTA_ROWS)
        self.bcast = F.broadcast
        # Store meta (placement/pile_zoom/indexed_keys) travels INSIDE the
        # snapshot: a bulk re-load that changes placement or pile zoom and
        # crashes before commit() must leave the OLD meta paired with the
        # OLD table map — never new meta over old data (ADVICE r4).  A tx
        # that doesn't set_meta carries the base snapshot's meta forward
        # (reset clears it with the tables).
        self.meta: dict | None = None if reset else base_meta

    # ------------------------------------------------------------ reads

    def has(self, key: str) -> bool:
        return key in self.tables

    def columns(self, key: str) -> list[str]:
        e = self.tables[key]
        schema = StructType.fromJson(json.loads(e["schema"]))
        return schema.fieldNames() + [e["part"]]

    def read_parts(
        self, key: str, part: str | None = None, parts: list | None = None
    ) -> DataFrame | None:
        if key not in self.tables:
            return None
        # record the read set: a concurrent commit that changes any
        # partition this plan consumed invalidates the whole batch
        if parts is None:
            self._read[key] = None
        elif self._read.get(key, set()) is not None:
            self._read.setdefault(key, set()).update(str(v) for v in parts)
        return read_resolved(self.spark, self.paths[key], self.tables[key], parts)

    def merge_part(
        self,
        key: str,
        part: str,
        affected: list,
        drop_keys: DataFrame,
        keycol: str,
        new_rows: DataFrame,
    ) -> None:
        """Within the affected partitions, drop rows whose `keycol` is in
        drop_keys, union the new rows, stage as this tx's epoch.  The
        merged plan reads the OLD immutable files (no lineage break
        needed — nothing it reads is overwritten before commit)."""
        cur = self.read_parts(key, part, affected)
        if cur is not None:
            merged = cur.join(
                self.bcast(drop_keys.select(keycol).distinct()), keycol, "left_anti"
            ).unionByName(new_rows.select(*cur.columns))
            self.overwrite_parts(key, merged, part, affected)
        elif not new_rows.isEmpty():
            self.overwrite_parts(key, new_rows, part, affected)

    # ------------------------------------------------------------ writes

    def overwrite_parts(
        self, key: str, df: DataFrame, part: str, affected: list, sort_within: list | None = None
    ) -> None:
        """Stage `df` (holding exactly the post-merge rows of the affected
        partitions) as this transaction's epoch for `key`; visible to this
        tx's subsequent read_parts immediately, to everyone else at
        commit.  Affected partitions absent from `df` become empty (their
        manifest entry is dropped)."""
        if key in self._written:
            # A second mode=overwrite write into the same epoch dir would
            # delete the first call's files while manifest entries for
            # partitions outside this call's `affected` list still
            # reference them — a dangling-ref corruption.  No caller
            # legitimately writes a table twice per tx; enforce it.
            raise RuntimeError(
                f"table '{key}' already staged in tx v{self.version}; "
                "one overwrite_parts/merge_part call per table per tx"
            )
        self._written.add(key)
        table_root = self.paths[key]
        epoch = f"e{self.version}-{self._token}"
        ptype = dict(df.dtypes)[part]
        out = df.repartition(F.col(part))
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        (
            out.write.mode("overwrite")
            .partitionBy(part)
            .parquet(os.path.join(table_root, epoch))
        )
        try:
            os.utime(self._marker)  # heartbeat: staging still live
        except OSError:
            pass
        files = _list_epoch_files(table_root, epoch, part)
        metrics = _partition_metrics(table_root, files)
        schema = json.dumps(df.drop(part).schema.jsonValue())
        entry = self.tables.get(key)
        if entry is None:
            entry = self.tables[key] = {
                "part": part,
                "ptype": ptype,
                "schema": schema,
                "parts": {},
                "metrics": {},
            }
        else:
            entry["schema"] = schema
            entry.setdefault("metrics", {})
        for v in {str(a) for a in affected}:
            entry["parts"].pop(v, None)
            entry["metrics"].pop(v, None)
        entry["parts"].update(files)
        entry["metrics"].update(metrics)
        # write set, replayable onto a newer snapshot if a rebase is needed
        self._staged[key] = {
            "part": part,
            "ptype": ptype,
            "schema": schema,
            "affected": {str(a) for a in affected} | set(files),
            "files": files,
            "metrics": metrics,
        }

    # ------------------------------------------------------------ commit

    def set_meta(self, meta: dict) -> None:
        """Stage store meta to publish atomically WITH this tx's table map."""
        self.meta = dict(meta)
        self._meta_set = True

    def commit(self) -> None:
        """Publish this transaction: atomic put-if-absent of the next
        version's manifest.  Losing the race triggers a rebase onto the
        latest snapshot (raises CommitConflict if an intervening commit
        touched this tx's read or write set), then the claim retries.
        Win or conflict, the tx's liveness marker is removed — a
        conflicted tx's staging becomes vacuum-reclaimable garbage."""
        try:
            os.makedirs(_manifest_dir(self.root), exist_ok=True)
            while True:
                latest = 0
                try:
                    latest = current_version(self.root)
                except FileNotFoundError:  # first commit on a fresh store
                    pass
                target = latest + 1
                if target != self.version:
                    self._rebase(target)
                man = {"version": self.version, "tables": self.tables}
                if self.meta is not None:
                    man["meta"] = self.meta
                if _claim_version(self.root, target, json.dumps(man)):
                    break
                # lost the race between probe and link: loop re-probes
            self._advance_current(target)
            self._gc(target)
        finally:
            try:
                os.unlink(self._marker)
            except OSError:
                pass

    def _rebase(self, target: int) -> None:
        """Re-target this tx at `target` after intervening commits
        (snapshots base_version+1 .. target-1 landed first).  Validation
        is against the LATEST snapshot: any partition of this tx's read
        or write set whose manifest entry differs from the base snapshot
        was touched by a competitor -> CommitConflict.  Disjoint commits
        merge: latest tables with this tx's staged entries re-applied.
        A reset tx (bulk re-load) has overwrite semantics and steamrolls
        by design."""
        man = load_manifest(self.root, target - 1)
        latest_tables = man["tables"]
        if not self._reset:
            changed = {
                k: self._changed_parts(self._base_tables.get(k), latest_tables.get(k))
                for k in set(self._base_tables) | set(latest_tables)
            }
            for k, reads in self._read.items():
                if changed.get(k) and (reads is None or reads & changed[k]):
                    raise CommitConflict(
                        f"read set of table '{k}' changed under tx "
                        f"(base v{self.base_version} -> v{target - 1})"
                    )
            for k, st in self._staged.items():
                if changed.get(k) and st["affected"] & changed[k]:
                    raise CommitConflict(
                        f"write set of table '{k}' changed under tx "
                        f"(base v{self.base_version} -> v{target - 1})"
                    )
            tables = json.loads(json.dumps(latest_tables))
            for k, st in self._staged.items():
                entry = tables.setdefault(
                    k,
                    {"part": st["part"], "ptype": st["ptype"], "schema": st["schema"],
                     "parts": {}, "metrics": {}},
                )
                entry["schema"] = st["schema"]
                entry.setdefault("metrics", {})
                for v in st["affected"]:
                    entry["parts"].pop(v, None)
                    entry["metrics"].pop(v, None)
                entry["parts"].update(st["files"])
                entry["metrics"].update(st["metrics"])
            self.tables = tables
            # meta (placement/pile_zoom/indexed_keys) is an input to every
            # merge plan — a competitor changing it mid-tx invalidates the
            # batch whether or not this tx staged new meta itself
            if man.get("meta") != self._base_meta:
                raise CommitConflict("store meta changed under tx")
        self.version = target

    @staticmethod
    def _changed_parts(base: dict | None, latest: dict | None) -> set[str]:
        """Partition values whose manifest entry differs between two
        snapshots of one table (added, dropped, or rewritten files)."""
        bp = base["parts"] if base else {}
        lp = latest["parts"] if latest else {}
        return {v for v in set(bp) | set(lp) if bp.get(v) != lp.get(v)}

    def _advance_current(self, version: int) -> None:
        """Best-effort monotonic hint: readers probe upward (and validate
        downward), so a lost hint race or a failed write only costs the
        next reader extra probe steps — nothing here may raise past a
        commit that already published.  The guard reads the raw hint
        (cheap) rather than re-probing the committed version."""
        try:
            with open(_current_path(self.root)) as fh:
                if int(fh.read().strip()) >= version:
                    return
        except (OSError, ValueError):
            pass
        try:
            _atomic_write(_current_path(self.root), str(version))
        except OSError:  # pragma: no cover - hint is advisory
            pass

    @staticmethod
    def _files_of(tables: dict) -> set[tuple[str, str]]:
        return {
            (k, f)
            for k, t in tables.items()
            for fl in t["parts"].values()
            for f in fl
        }

    def _gc(self, committed: int) -> None:
        """Delayed GC with a one-snapshot grace period: at commit of
        version V, delete files referenced by snapshot V-2 that neither
        V-1 nor V references.  A reader that resolved the PREVIOUS
        snapshot before this commit therefore still finds every file its
        (explicit-path) plan baked in; only plans two snapshots stale can
        dangle — the Iceberg snapshot-expiry model with retention 1.
        (Concurrent committers each GC their own V-2; unlinks are
        idempotent best-effort.)"""
        expire = committed - 2
        if expire < 1:
            return
        try:
            man_old = load_manifest(self.root, expire)
            man_prev = load_manifest(self.root, committed - 1)
        except (OSError, ValueError):  # already expired / never written
            return
        live = self._files_of(self.tables) | self._files_of(man_prev["tables"])
        for k, f in self._files_of(man_old["tables"]) - live:
            try:
                os.unlink(os.path.join(self.paths[k], f))
            except OSError:  # pragma: no cover - best effort
                pass
        for k in man_old["tables"]:
            self._prune_empty_dirs(self.paths[k])

    def _sweep_stale_epochs(self) -> None:
        """Remove epoch dirs from crashed attempts (epoch number above the
        committed snapshot) — they are unreferenced by construction."""
        for key in list(self.tables) or []:
            root = self.paths[key]
            if not os.path.isdir(root):
                continue
            for d in os.listdir(root):
                if d.startswith("e") and d[1:].isdigit() and int(d[1:]) > self.base_version:
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    @staticmethod
    def _prune_empty_dirs(table_root: str) -> None:
        if not os.path.isdir(table_root):
            return
        for epoch in os.listdir(table_root):
            edir = os.path.join(table_root, epoch)
            if not os.path.isdir(edir):
                continue
            for d in list(os.listdir(edir)):
                sub = os.path.join(edir, d)
                if os.path.isdir(sub) and not os.listdir(sub):
                    os.rmdir(sub)
            if not os.listdir(edir):
                os.rmdir(edir)


def vacuum_store(
    store_root: str, paths: dict[str, str], grace_sec: float = 3600, now: float | None = None
) -> dict:
    """Remove orphaned staging files (epoch dirs of crashed or
    conflict-aborted transactions, which unique-token staging leaks by
    design) and manifests older than the GC horizon — the Iceberg
    remove-orphan-files action.  Files referenced by the last two
    snapshots are live (same grace window as _gc); everything else under
    a table root older than `grace_sec` goes.  Safe alongside active
    writers by LIVENESS MARKER, not by hoping the tx outruns the grace
    window: every StoreTx keeps a `.inprogress-<token>` heartbeat in the
    manifest dir, touched on each staged write, so staging whose marker
    is fresher than `grace_sec` is never reclaimed no matter how old its
    earliest files are (an hours-long merge is safe as long as it keeps
    making progress within the window).  Aged markers (crashed txs) are
    swept with their staging, as are orphaned `.tmp` manifest/hint temp
    files; commit-time GC only ever needs manifests >= committed-1,
    which are kept."""
    import time as _time

    ts = _time.time() if now is None else now
    committed = current_version(store_root)
    # tokens of transactions still heartbeating: their staging is live
    protected: set[str] = set()
    mdir = _manifest_dir(store_root)
    try:
        for n in os.listdir(mdir):
            fp = os.path.join(mdir, n)
            try:
                if n.startswith(".inprogress-"):
                    if ts - os.path.getmtime(fp) < grace_sec:
                        protected.add(n[len(".inprogress-"):])
                    else:
                        os.unlink(fp)  # crashed/stalled tx: reclaimable
                elif n.endswith(".tmp") and ts - os.path.getmtime(fp) >= grace_sec:
                    os.unlink(fp)  # orphaned manifest/hint temp file
            except OSError:  # pragma: no cover - best effort
                pass
    except OSError:  # pragma: no cover - best effort
        pass
    live: set[str] = set()
    for v in (committed, committed - 1):
        if v >= 1 and _is_committed(store_root, v):
            for k, t in load_manifest(store_root, v)["tables"].items():
                for fl in t["parts"].values():
                    live.update(os.path.join(paths[k], f) for f in fl)
    files_removed = 0
    for root in set(paths.values()):
        if not os.path.isdir(root):
            continue
        for dirpath, _dirs, fnames in os.walk(root):
            segs = os.path.relpath(dirpath, root).split(os.sep)
            if any(
                s.startswith("e") and any(s.endswith("-" + t) for t in protected)
                for s in segs
            ):
                continue  # an in-flight tx's staging epoch
            for fn in fnames:
                fp = os.path.join(dirpath, fn)
                try:
                    if fp not in live and ts - os.path.getmtime(fp) >= grace_sec:
                        os.unlink(fp)
                        files_removed += 1
                except OSError:  # pragma: no cover - best effort
                    pass
        StoreTx._prune_empty_dirs(root)
    manifests_removed = 0
    for v in range(1, committed - 1):
        try:
            os.unlink(_manifest_path(store_root, v))
            manifests_removed += 1
        except OSError:
            pass
    return {
        "snapshot": committed,
        "files_removed": files_removed,
        "manifests_removed": manifests_removed,
    }


class LegacyTx:
    """The pre-manifest behavior behind the same interface: direct
    partition-dir reads and dynamic partition overwrites (non-atomic
    across partitions — the documented legacy window)."""

    def __init__(self, spark: SparkSession, store_root: str, paths: dict[str, str]):
        self.spark = spark
        self.root = store_root
        self.paths = paths
        self.bcast = F.broadcast  # see StoreTx.bcast

    def has(self, key: str) -> bool:
        return os.path.exists(self.paths[key])

    def columns(self, key: str) -> list[str]:
        return self.spark.read.parquet(self.paths[key]).columns

    def read_parts(
        self, key: str, part: str | None = None, parts: list | None = None
    ) -> DataFrame | None:
        if not self.has(key):
            return None
        df = self.spark.read.parquet(self.paths[key])
        if parts is not None and part is not None:
            df = df.filter(F.col(part).isin(sorted(parts)))
        return df

    def merge_part(
        self,
        key: str,
        part: str,
        affected: list,
        drop_keys: DataFrame,
        keycol: str,
        new_rows: DataFrame,
    ) -> None:
        from .changes import _dynamic_overwrite

        cur = self.read_parts(key, part, affected)
        if cur is not None:
            merged = cur.join(
                self.bcast(drop_keys.select(keycol).distinct()), keycol, "left_anti"
            ).unionByName(new_rows.select(*cur.columns))
            _dynamic_overwrite(merged, self.paths[key], part, affected)
        elif not new_rows.isEmpty():
            new_rows.write.mode("overwrite").partitionBy(part).parquet(self.paths[key])

    def overwrite_parts(
        self, key: str, df: DataFrame, part: str, affected: list, sort_within: list | None = None
    ) -> None:
        from .changes import _dynamic_overwrite

        if sort_within:
            df = df.repartition(F.col(part)).sortWithinPartitions(*sort_within)
        if os.path.exists(self.paths[key]):
            _dynamic_overwrite(df, self.paths[key], part, affected)
        elif not df.isEmpty():
            df.write.mode("overwrite").partitionBy(part).parquet(self.paths[key])

    def commit(self) -> None:  # published as it was written
        pass


def open_tx(spark: SparkSession, store_root: str, paths: dict[str, str]):
    return (
        StoreTx(spark, store_root, paths)
        if is_versioned(store_root)
        else LegacyTx(spark, store_root, paths)
    )
