"""Store compaction: merge the small files that sustained change-stream
deltas accumulate inside hot piles.

Reference parity: the reference's mmap'd store reclaims space with a
free-block list (InfoCommand -f surface; the blob store reuses freed
pages).  Immutable parquet can't reuse pages — the analogue is periodic
per-pile compaction: piles whose FILE COUNT exceeds a threshold are
rewritten as one (or a few) right-sized files.  Pile selection reads only
footers (driver-side, no data scan); the rewrite touches ONLY selected
piles via dynamic partition overwrite — same partition-scoped discipline
as streaming/changes.merge.  On Iceberg this whole module is
`rewrite_data_files`."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024  # healthy parquet file size at scale


def partition_cols(store_path: str) -> list[str]:
    """Discover the store's partition-column chain from one leaf path
    (e.g. ['pile', 'keybits'] for the compile layout) so a rewrite keeps
    the exact directory scheme — flattening nested partitions would break
    partition discovery for the untouched directories."""
    cols: list[str] = []
    d = store_path
    while True:
        subs = sorted(s for s in os.listdir(d) if "=" in s and os.path.isdir(os.path.join(d, s)))
        if not subs:
            return cols
        cols.append(subs[0].split("=", 1)[0])
        d = os.path.join(d, subs[0])


def fragmented_piles(
    store_path: str, max_files: int = 4, part: str = "pile"
) -> list[int]:
    """Piles with more than max_files data files — footer/fs metadata only."""
    out = []
    for d in sorted(os.listdir(store_path)):
        if not d.startswith(f"{part}="):
            continue
        n = 0
        for dp, _, fs in os.walk(os.path.join(store_path, d)):
            n += sum(1 for f in fs if f.endswith(".parquet"))
        if n > max_files:
            out.append(int(d.split("=", 1)[1]))
    return out


def compact_piles(
    spark: SparkSession,
    store_path: str,
    piles: list[int] | None = None,
    max_files: int = 4,
    target_bytes: int = TARGET_FILE_BYTES,
    part: str = "pile",
) -> dict:
    """Rewrite fragmented piles as right-sized files.  Untouched piles keep
    their files byte-identical (dynamic partition overwrite).  Returns
    {compacted: [...], skipped_count: N}."""
    cand = fragmented_piles(store_path, max_files, part) if piles is None else piles
    if not cand:
        return {"compacted": [], "skipped_count": 0}
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for p in cand
        for dp, _, fs in os.walk(os.path.join(store_path, f"{part}={p}"))
        for f in fs
        if f.endswith(".parquet")
    )
    n_out = max(1, -(-total // target_bytes))  # ceil
    # keep the store's FULL partition chain (e.g. pile + keybits buckets):
    # writing a shallower partitionBy would flatten compacted piles and
    # break partition discovery against the untouched ones
    pcols = partition_cols(store_path) or [part]
    df = spark.read.parquet(store_path).filter(F.col(part).isin(cand))
    out = df.repartition(int(n_out), *pcols).localCheckpoint()
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*pcols)
        .parquet(store_path)
    )
    return {"compacted": cand, "skipped_count": 0}
