"""Bucketed co-located joins — removing the C2 shuffle at 100 TB.

The way-assembly join (C2) shuffles BOTH the membership table and the node
table on node id every build. At 10^12 rows that shuffle dominates the
pipeline. Bucketing both tables by the join key at ingest (a one-time cost,
amortized over every later build/query) lets Spark's bucketed-scan rule
join them with ZERO Exchange: each task reads bucket i of both sides.

This is the Spark-native equivalent of the reference's id-indexed pile
lookups (nodes.idx/ways.idx, BuildCommand.java:350-353): the bucket IS the
index. On Iceberg the same layout is `bucket(N, node_ref)` partition
transforms + storage-partitioned joins.

Tests assert the plan shape: no Exchange on either side of the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 64) -> None:
    """Persist a table bucketed+sorted by the join key."""
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def prepare_colocated(
    spark: SparkSession,
    membership: DataFrame,
    points_tiled: DataFrame,
    buckets: int = 64,
    prefix: str = "golb",
) -> tuple[str, str]:
    """One-time ingest: bucket membership and nodes by node id."""
    mem_t, nodes_t = f"{prefix}_membership", f"{prefix}_nodes"
    write_bucketed(membership, mem_t, "node_ref", buckets)
    nodes = points_tiled.select(F.col("id").alias("node_ref"), "x", "y", "tile")
    write_bucketed(nodes, nodes_t, "node_ref", buckets)
    return mem_t, nodes_t


def way_assembly_colocated(spark: SparkSession, mem_table: str, nodes_table: str) -> DataFrame:
    """C2 on the bucketed tables: shuffle-free join, then the way groupBy
    (the only remaining exchange — irreducible, it re-keys by way)."""
    mem = spark.table(mem_table)
    nodes = spark.table(nodes_table)
    resolved = mem.join(nodes, "node_ref", "inner")
    return resolved.groupBy("way_id").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("x").alias("minx"), F.min("y").alias("miny"),
        F.max("x").alias("maxx"), F.max("y").alias("maxy"),
        F.countDistinct("tile").alias("n_tiles"),
    )


def join_exchange_count(df: DataFrame, key: str = "node_ref") -> int:
    """Count Exchange-on-the-join-key operators in the physical plan (0 for
    a co-located bucketed join; callers should disable auto-broadcast so
    tiny test tables don't sidestep the shuffle question entirely)."""
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    if "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan:
        return -1
    import re

    # exchanges whose partitioning key list starts with the join key (any
    # attribute-id suffix); the unbucketed plan shuffles both sides on it
    return len(re.findall(rf"Exchange hashpartitioning\({re.escape(key)}#", plan))
