"""Stream-static routing join: incoming change records tile-assigned and
pile-routed against the (static, broadcast) tile catalog — the streaming
twin of the batch C1 pile routing.

Reference parity: the reference's updater resolves each changed feature to
its tile through the same TileCatalog pyramid the builder used
(update/TileFinder.java + TileCatalog.java:225-228); here the catalog is a
static DataFrame and the change stream flows through the identical
broadcast-pyramid joins (`tiling.pile_assignment`) — stream-static joins
keep every per-batch plan shuffle-free on the stream side.

Scale shape: the catalog is <= 64k rows (broadcast); each micro-batch is a
narrow map + K broadcast hash joins.  No state store, no watermark needed
(routing is stateless)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import tiling
from .changes import read_change_stream


def routed_change_stream(
    spark: SparkSession, changes_path: str, catalog: DataFrame, zoom: int = 12
) -> DataFrame:
    """Streaming DataFrame of upsert change records with (tile,
    assigned_tile) routing columns — ready for a partitioned sink or a
    foreachBatch merge."""
    ups = read_change_stream(spark, changes_path).filter(F.col("op") == "upsert")
    tiled = tiling.assign_points(ups, zoom)
    return tiling.pile_assignment(tiled, catalog.select("zoom", "tile"))
