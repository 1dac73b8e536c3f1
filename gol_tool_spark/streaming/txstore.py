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

    <store>/_manifest/CURRENT      -> "N"          (os.replace'd: atomic)
    <store>/_manifest/v<N>.json    full snapshot: for every table, the
                                   partition -> [data files] map + schema
    <table>/e<V>/pile=<v>/part-*.parquet           (epoch V wrote these)

Every merge batch writes NEW files into a fresh epoch directory `e<V>`
(never touching live files), builds manifest v<V> referencing the new
files for affected partitions and the OLD files for untouched ones, and
publishes with a single rename of CURRENT.  Readers resolve CURRENT ->
manifest -> explicit file list, so they observe either snapshot N or
N+1, never a mix; partition pruning happens at manifest level (the file
list is filtered BEFORE Spark plans the scan — the same planning-time
pruning Iceberg does, no directory listing at any store size).  The
partition column is reconstructed from the file path
(`input_file_name()` regexp), so one multi-epoch read needs no basePath
gymnastics.

Crash points: before the CURRENT swap -> readers keep snapshot N, and
the streaming replay re-runs the batch (epoch dirs are keyed by target
version, rewritten with mode=overwrite — deterministic).  After the
swap -> snapshot N+1 is complete; superseded files expire via DELAYED
GC with a one-snapshot grace period (commit of V deletes what only V-2
referenced), so a reader whose explicit-path plan resolved the previous
snapshot still finds every file — the Iceberg snapshot-expiry model
with retention 1.  Empty partitions need no placeholder files (the
manifest simply drops the partition — the schema travels in the
manifest), which also retires the empty-partition parquet-footer hazard
of the legacy layout.  Single writer assumed (the reference's store
lock); concurrent writers want the real Iceberg lane.
"""

from __future__ import annotations

import json
import logging
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_log = logging.getLogger(__name__)


def _manifest_dir(store_root: str) -> str:
    return os.path.join(store_root, "_manifest")


def _current_path(store_root: str) -> str:
    return os.path.join(_manifest_dir(store_root), "CURRENT")


def is_versioned(store_root: str) -> bool:
    return os.path.exists(_current_path(store_root))


def current_version(store_root: str) -> int:
    with open(_current_path(store_root)) as fh:
        return int(fh.read().strip())


def load_manifest(store_root: str, version: int | None = None) -> dict:
    v = current_version(store_root) if version is None else version
    with open(os.path.join(_manifest_dir(store_root), f"v{v}.json")) as fh:
        man = json.load(fh)
    assert man["version"] == v
    return man


def _atomic_write(path: str, data: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(data)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


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
            self.tables: dict[str, dict] = json.loads(json.dumps(man["tables"]))
            base_meta = man.get("meta")
        else:
            self.base_version = 0
            self.tables = {}
            base_meta = None
        self.version = self.base_version + 1
        self._old_files = {
            k: {os.path.join(paths[k], f) for fl in t["parts"].values() for f in fl}
            for k, t in self.tables.items()
        }
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
        epoch = f"e{self.version}"
        ptype = dict(df.dtypes)[part]
        out = df.repartition(F.col(part))
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        (
            out.write.mode("overwrite")
            .partitionBy(part)
            .parquet(os.path.join(table_root, epoch))
        )
        files = _list_epoch_files(table_root, epoch, part)
        entry = self.tables.get(key)
        if entry is None:
            entry = self.tables[key] = {
                "part": part,
                "ptype": ptype,
                "schema": json.dumps(df.drop(part).schema.jsonValue()),
                "parts": {},
                "metrics": {},
            }
            self._old_files[key] = set()
        else:
            entry["schema"] = json.dumps(df.drop(part).schema.jsonValue())
            entry.setdefault("metrics", {})
        for v in {str(a) for a in affected}:
            entry["parts"].pop(v, None)
            entry["metrics"].pop(v, None)
        entry["parts"].update(files)
        entry["metrics"].update(_partition_metrics(table_root, files))

    # ------------------------------------------------------------ commit

    def set_meta(self, meta: dict) -> None:
        """Stage store meta to publish atomically WITH this tx's table map."""
        self.meta = dict(meta)

    def commit(self) -> None:
        os.makedirs(_manifest_dir(self.root), exist_ok=True)
        man = {"version": self.version, "tables": self.tables}
        if self.meta is not None:
            man["meta"] = self.meta
        _atomic_write(
            os.path.join(_manifest_dir(self.root), f"v{self.version}.json"),
            json.dumps(man),
        )
        _atomic_write(_current_path(self.root), str(self.version))
        self._gc()

    @staticmethod
    def _files_of(tables: dict) -> set[tuple[str, str]]:
        return {
            (k, f)
            for k, t in tables.items()
            for fl in t["parts"].values()
            for f in fl
        }

    def _gc(self) -> None:
        """Delayed GC with a one-snapshot grace period: at commit of
        version V, delete files referenced by snapshot V-2 that neither
        V-1 nor V references.  A reader that resolved the PREVIOUS
        snapshot before this commit therefore still finds every file its
        (explicit-path) plan baked in; only plans two snapshots stale can
        dangle — the Iceberg snapshot-expiry model with retention 1."""
        expire = self.base_version - 1
        if expire < 1:
            return
        try:
            man_old = load_manifest(self.root, expire)
        except (OSError, ValueError):  # already expired / never written
            return
        live = self._files_of(self.tables) | {
            (k, os.path.relpath(p, self.paths[k]))
            for k, ps in self._old_files.items()
            for p in ps
        }
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
