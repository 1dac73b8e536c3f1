"""Iceberg `MERGE INTO` form of the change-stream merge (feature-flagged).

changes.py documents that on Iceberg the whole partition-scoped merge
collapses to one `MERGE INTO store USING batch ON id`: Iceberg's metadata
layer replaces the id->pile bucket index (its manifests prune files by
partition + min/max id), and the commit is a metadata TRANSACTION — closing
the one crash window the plain-parquet path documents (a multi-partition
dynamic overwrite is not atomic on a raw filesystem).

This module is that slot-in.  It activates only when the Iceberg runtime
jar is on the Spark classpath and a Spark catalog is configured for it
(`spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`); the
sandbox ships no Iceberg jar, so `iceberg_available` returns False there
and `apply_changes_iceberg` raises with setup guidance — the gated test
module (tests/test_iceberg_merge.py) lights up unchanged when the jar
appears.

Semantics mirror changes.py exactly: winner-per-id within a batch
(highest seq, delete beats upsert on ties), idempotent merge, availableNow
trigger + checkpoint for exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .changes import CHANGE_SCHEMA, PILE_ZOOM, _with_pile, read_change_stream


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_store_table(spark: SparkSession, table: str) -> None:
    """Create the pile-partitioned Iceberg store table (the write_store
    analogue; `table` is a catalog-qualified name like `ice.db.store`)."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} "
        "(id BIGINT, x BIGINT, y BIGINT, tile BIGINT, pile BIGINT) "
        "USING iceberg PARTITIONED BY (pile)"
    )


def merge_batch_sql(table: str, source_view: str) -> str:
    """The one-statement merge — the whole of changes.py's read-prune/
    anti-join/union/overwrite/index dance, expressed declaratively; Iceberg
    turns it into a transactional rewrite of only the files holding
    matched ids."""
    return f"""
MERGE INTO {table} t
USING {source_view} s
ON t.id = s.id
WHEN MATCHED AND s.op = 'delete' THEN DELETE
WHEN MATCHED THEN UPDATE SET
  t.x = s.x, t.y = s.y, t.tile = s.tile, t.pile = s.pile
WHEN NOT MATCHED AND s.op != 'delete' THEN
  INSERT (id, x, y, tile, pile) VALUES (s.id, s.x, s.y, s.tile, s.pile)
"""


def apply_changes_iceberg(
    spark: SparkSession,
    changes_path: str,
    table: str,
    checkpoint_path: str,
    zoom: int = 12,
):
    """availableNow pass applying pending change files to an Iceberg store
    table via MERGE INTO.  Raises RuntimeError when the Iceberg runtime is
    absent (feature flag: presence of the jar + a configured catalog)."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath — add "
            "iceberg-spark-runtime-<ver>.jar and configure "
            "spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog; "
            "until then use changes.apply_changes (plain-parquet merge)"
        )
    create_store_table(spark, table)

    def merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
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
        piled = _with_pile(
            winners.filter(F.col("op") != "delete"), zoom
        ).select("op", "id", "x", "y", "tile", "pile")
        dels = winners.filter(F.col("op") == "delete").select(
            "op", "id",
            F.lit(None).cast("long").alias("x"), F.lit(None).cast("long").alias("y"),
            F.lit(None).cast("long").alias("tile"), F.lit(None).cast("long").alias("pile"),
        )
        view = f"_gol_changes_{batch_id}"
        piled.unionByName(dels).createOrReplaceTempView(view)
        batch.sparkSession.sql(merge_batch_sql(table, view))

    q = (
        read_change_stream(spark, changes_path)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    return q
