"""Change-stream apply: the reference's `gol update` (OsmChange ingestion)
as a Structured Streaming job.

Reference parity: update/Updater.java:34-55 + update/ChangeReader.java read
gzip'd OsmChange XML, find the affected tiles (update/TileFinder.java +
update/FeatureFinder.java resolve changed feature ids to the tiles that
hold them via the store's index), and patch only those tiles.  Spark form:
a file-source stream of change records (create/modify/delete per feature
id) merged into a pile-partitioned parquet store via foreachBatch.

Partition-scoped merge (the TileFinder analogue)
------------------------------------------------
The store is parquet `partitionBy("pile")`; alongside it lives a compact
id->pile index parquet `partitionBy("ib")` where ib = xxhash64(id) mod NB.
A micro-batch merge:

  1. resolves the OLD pile of every changed id by reading ONLY the index
     buckets those ids hash to (partition-pruned: `ib IN (...)`),
  2. computes the NEW pile of every upsert from its coordinates,
  3. reads ONLY the affected piles of the store (`pile IN (...)`,
     partition-pruned at the parquet source),
  4. anti-joins the changed ids out, unions the upserts back in, and
  5. writes with partitionOverwriteMode=dynamic — untouched pile
     directories are never rewritten (their files keep their paths and
     mtimes), then applies the same merge to the index buckets.

At 10^12 rows a 1 KB OsmChange delta therefore costs O(|affected piles| +
|affected index buckets|) I/O, not a store rewrite.  Size NB so one bucket
(total_rows/NB * 16 B) is a comfortable rewrite unit — NB = 2^16 puts a
10^12-row index at ~240 MB/bucket.  On Iceberg the same merge is a single
`MERGE INTO store USING batch ON id` and the index disappears (Iceberg's
own metadata serves the id lookup); this module is the plain-parquet form.

Crash safety / exactly-once
---------------------------
There is no staged `_next` copy and no second rewrite.  Dynamic partition
overwrite replaces each affected pile via Spark's commit protocol, and the
merge is IDEMPOTENT: merge(merge(S, B), B) == merge(S, B) — the anti-join
removes exactly the rows the union re-adds.  The write order is store ->
emptied-pile cleanup -> index, so a crash BETWEEN those steps replays
correctly: the index still holds the PRE-batch pile of every changed id
until the final step, so the replayed batch recomputes a superset of the
affected piles and re-converges (a missing index — crash before the very
first index write — is detected and rebuilt from the store).  Exactly-once
= streaming checkpoint (batch replay) x idempotent merge, ASSUMING the
writer's per-partition commit is atomic: on a plain filesystem, dynamic
overwrite across multiple pile directories is not one atomic transaction,
so a crash in the middle of the overwrite itself (partition dir cleared,
staged files not yet moved) can lose unchanged rows of an affected pile
that replay cannot restore — the replayed merge recomputes from the
already-damaged store.  The in-merge compaction has the same exposure.
The fully-safe form is the Iceberg `MERGE INTO` mapping described above,
where the swap is a metadata transaction.

Change record schema (JSON lines):
    {"op": "upsert"|"delete", "id": ..., "x": ..., "y": ..., "seq": ...}

`seq` (optional, default 0) is the change-sequence number (the OsmChange
file's implicit ordering made explicit — a file-source shuffle preserves no
row order, so ordering must travel WITH the record).  Within a batch the
winner per id is the highest (seq, delete-beats-upsert) — deterministic, so
merge(S, B) is a pure function of the batch and replay converges.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import spatial as S
from ..operators import tiling

CHANGE_SCHEMA = "op string, id long, x long, y long, seq long"
PILE_ZOOM = 3  # store piles are zoom-3 cells (64 world piles + fan-out)


def read_change_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(CHANGE_SCHEMA).json(path)


def _with_pile(df: DataFrame, zoom: int, pile_zoom: int = PILE_ZOOM) -> DataFrame:
    tiled = tiling.assign_points(df, zoom)
    return tiled.withColumn(
        "pile", S.zoomed_out(F.col("tile"), zoom, pile_zoom).cast("long")
    )


def _bucket(col, nb: int):
    return F.pmod(F.xxhash64(col), F.lit(nb)).cast("int")


def write_store(
    df: DataFrame, store_path: str, zoom: int = 12, index_buckets: int = 16
) -> None:
    """Bulk-load a (id, x, y) DataFrame as a pile-partitioned store plus its
    id->pile bucket index (the structure `apply_changes` merges into)."""
    piled = _with_pile(df, zoom).select("id", "x", "y", "tile", "pile")
    piled.write.mode("overwrite").partitionBy("pile").parquet(store_path)
    (
        piled.select("id", "pile", _bucket(F.col("id"), index_buckets).alias("ib"))
        .write.mode("overwrite")
        .partitionBy("ib")
        .parquet(_idx_path(store_path))
    )


def _idx_path(store_path: str) -> str:
    return store_path.rstrip("/") + "_idx"


def _data_files(part_dir: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(part_dir, "*"))
        if not os.path.basename(p).startswith(("_", "."))
    ]


def _keep_empty_partition(path: str, part: str, value, schema: pa.Schema) -> None:
    """Replace a partition dir's data files with one empty parquet file so
    the partition (and store-level schema inference) survives a full
    delete.  Driver-side, bounded by the number of EMPTIED partitions."""
    part_dir = os.path.join(path, f"{part}={value}")
    for f in _data_files(part_dir):
        if os.path.isdir(f):
            shutil.rmtree(f)
        else:
            os.remove(f)
    os.makedirs(part_dir, exist_ok=True)
    pq.write_table(schema.empty_table(), os.path.join(part_dir, "part-empty.parquet"))


def _arrow_schema_of(df: DataFrame) -> pa.Schema:
    """Spark schema -> Arrow schema without a toPandas round-trip (an empty
    pandas frame degrades maps/arrays to a `null` Arrow type, and one such
    placeholder footer poisons the whole store's schema inference)."""
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(df.schema)
    except Exception:  # pragma: no cover - fallback for API drift
        return pa.Schema.from_pandas(df.limit(0).toPandas())


def _dynamic_overwrite(df: DataFrame, path: str, part: str, affected: list) -> None:
    """Dynamic-partition-overwrite `df` into `path`, then empty out affected
    partitions that the merge left with zero rows (dynamic overwrite never
    touches a partition absent from the output — without this, a delete of
    a pile's last feature would leave its old rows behind)."""
    out = df.localCheckpoint()  # break lineage: we overwrite a path we read
    remaining = {r[part] for r in out.select(part).distinct().collect()}
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part)
        .parquet(path)
    )
    emptied = [v for v in affected if v not in remaining]
    if emptied:
        schema = _arrow_schema_of(out.drop(part))
        for v in emptied:
            _keep_empty_partition(path, part, v, schema)


def apply_changes(
    spark: SparkSession,
    changes_path: str,
    store_path: str,
    checkpoint_path: str,
    zoom: int = 12,
    index_buckets: int = 16,
    compact_after: int | None = 8,
):
    """Run one availableNow pass applying all pending change files to the
    store (parquet partitioned by zoom-3 pile). Returns the query.

    compact_after: file-count watermark — after each merge, affected piles
    that exceed this many data files are compacted in place (sustained
    small deltas otherwise grow a hot pile's file count without bound; the
    check is a driver-side listing of ONLY the affected piles).  None
    disables."""

    idx_path = _idx_path(store_path)

    def merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark_l = batch.sparkSession
        # deterministic intra-batch resolution: per id keep the highest
        # (seq, delete-beats-upsert-on-tie) record — an upsert followed by
        # a delete of the same feature in one delta deletes it, and replays
        # always pick the same winner
        from pyspark.sql import Window

        pri = F.when(F.col("op") == "delete", 1).otherwise(0)
        w = Window.partitionBy("id").orderBy(
            F.coalesce(F.col("seq"), F.lit(0)).desc(), pri.desc()
        )
        winners = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        ups = _with_pile(winners.filter(F.col("op") == "upsert"), zoom).select(
            "id", "x", "y", "tile", "pile"
        )
        changed = batch.select("id").distinct().localCheckpoint()

        new_piles = {r.pile for r in ups.select("pile").distinct().collect()}
        old_piles: set = set()
        have_store = os.path.exists(store_path)
        if have_store and not os.path.exists(idx_path):
            # bootstrap crash window: batch 0 created the store but died
            # before the first index write — rebuild the index from the
            # store so replay doesn't fail permanently on the missing path
            (
                spark_l.read.parquet(store_path)
                .select("id", "pile", _bucket(F.col("id"), index_buckets).alias("ib"))
                .write.mode("overwrite")
                .partitionBy("ib")
                .parquet(idx_path)
            )
        if have_store:
            # TileFinder analogue: old piles via the id->pile index, reading
            # only the buckets the changed ids hash to (partition-pruned).
            buckets = [
                r.ib
                for r in changed.select(_bucket(F.col("id"), index_buckets).alias("ib"))
                .distinct()
                .collect()
            ]
            idx = spark_l.read.parquet(idx_path).filter(F.col("ib").isin(buckets))
            old_piles = {
                r.pile
                for r in idx.join(F.broadcast(changed), "id")
                .select("pile")
                .distinct()
                .collect()
            }
        affected = sorted(new_piles | old_piles)
        if not affected:
            return

        if have_store:
            cur = spark_l.read.parquet(store_path).filter(F.col("pile").isin(affected))
            merged = cur.join(F.broadcast(changed), "id", "left_anti").unionByName(ups)
        else:
            merged = ups
        _dynamic_overwrite(
            merged.select("id", "x", "y", "tile", "pile"), store_path, "pile", affected
        )

        # index merge last (see module docstring: replay correctness needs
        # the index to keep pre-batch piles until the store is committed)
        ups_idx = ups.select(
            "id", "pile", _bucket(F.col("id"), index_buckets).alias("ib")
        )
        if have_store:
            cur_idx = spark_l.read.parquet(idx_path).filter(F.col("ib").isin(buckets))
            merged_idx = cur_idx.join(F.broadcast(changed), "id", "left_anti").unionByName(
                ups_idx
            )
            _dynamic_overwrite(merged_idx, idx_path, "ib", buckets)
        else:
            ups_idx.write.mode("overwrite").partitionBy("ib").parquet(idx_path)

        # small-file hygiene: compact affected piles past the watermark
        # (listing only the piles this batch touched — driver-side, cheap)
        if compact_after is not None:
            from ..plans import compact as CP

            frag = [
                p
                for p in affected
                if len(_data_files(os.path.join(store_path, f"pile={p}")))
                > compact_after
            ]
            if frag:
                CP.compact_piles(spark_l, store_path, piles=frag)

    q = (
        read_change_stream(spark, changes_path)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    return q


def verify_change_store(spark: SparkSession, store_path: str) -> dict:
    """`gol check` for the update path: the id->pile index and the store
    must agree exactly — same id set, same pile per id, no duplicate ids in
    either (the invariants the partition-scoped merge maintains; a crash
    between the store and index writes leaves a divergence the NEXT merge
    heals, so a standing mismatch indicates external tampering or a bug).
    Returns {ok, store_rows, index_rows, dup_ids, mismatched_piles}."""
    store = spark.read.parquet(store_path).select("id", F.col("pile").cast("long").alias("pile"))
    idx = spark.read.parquet(_idx_path(store_path)).select(
        "id", F.col("pile").cast("long").alias("ipile")
    )
    store_rows = store.count()
    index_rows = idx.count()
    dup_ids = (
        store.groupBy("id").count().filter(F.col("count") > 1).count()
        + idx.groupBy("id").count().filter(F.col("count") > 1).count()
    )
    mismatched = (
        store.join(idx, "id", "full")
        .filter(
            F.col("pile").isNull()
            | F.col("ipile").isNull()
            | (F.col("pile") != F.col("ipile"))
        )
        .count()
    )
    return {
        "ok": dup_ids == 0 and mismatched == 0 and store_rows == index_rows,
        "store_rows": store_rows,
        "index_rows": index_rows,
        "dup_ids": dup_ids,
        "mismatched_piles": mismatched,
    }
