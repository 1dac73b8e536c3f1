"""Tile assignment, density, rollup, catalog — the build pipeline's core.

Reference parity (SURVEY.md §2): C1 node->tile (build/Sorter.java:362-383),
A4/D2 z12 node-density scan (build/Analyzer.java:445-457,566-581), D3
hierarchical rollup (build/TileIndexBuilder.java:193-241), D4 top-K-with-
floor catalog (TileIndexBuilder.java:286-310,181-191), C2 way geometry-
assembly join (build/Sorter.java:478-554), C6 Purgatory anti-join
(build/Sorter.java:620-688), C9 relation bbox aggregation
(build/Validator.java:1287-1397).

Scale notes (100 TB / 10^12 rows):
  * tile ids are computed with built-in bit arithmetic — whole-stage codegen,
    zero Python. Assignment is a narrow transform (no shuffle).
  * density is a partial-aggregated groupBy on an int key with at most 4^12
    distinct groups — map-side combine collapses it before the shuffle.
  * the way-assembly join shuffles on node id; hot z12 cells don't matter
    here (key is the node id, uniformly hashed), while the per-way groupBy
    is bounded by way fan-in (<=2000 nodes/way in OSM). AQE skew-join stays
    on for safety.
  * catalog candidates are <= 4^12 rows -> orderBy+limit is a driver-scale
    sort; the kept catalog broadcasts everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import spatial as S

DEFAULT_ZOOMS = (0, 3, 6, 9, 12)


def assign_points(points: DataFrame, zoom: int = 12, x: str = "x", y: str = "y") -> DataFrame:
    """C1: add the packed tile id of the leaf cell containing (x, y)."""
    return points.withColumn("tile", S.tile_of_point(F.col(x), F.col(y), zoom))


def density(points: DataFrame, zoom: int = 12) -> DataFrame:
    """A4/D2: node count per zoom-z tile."""
    return (
        assign_points(points, zoom)
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def rollup(density12: DataFrame, zooms: tuple[int, ...] = DEFAULT_ZOOMS) -> DataFrame:
    """D3: roll z12 densities up through the configured zoom levels.
    Output: (zoom, tile, cnt) for every level including z12 itself."""
    top = max(zooms)
    # one union branch per level reads density12 — cache (lazily) so the
    # upstream density aggregation computes once, not once per level
    density12 = density12.cache()
    parts = [density12.select(F.lit(top).alias("zoom"), "tile", "cnt")]
    for z in sorted(zooms, reverse=True)[1:]:
        parts.append(
            density12.groupBy(S.zoomed_out(F.col("tile"), top, z).alias("tile"))
            .agg(F.sum("cnt").alias("cnt"))
            .select(F.lit(z).alias("zoom"), "tile", "cnt")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def catalog_topk(
    rolled: DataFrame,
    max_tiles: int = 64000,
    min_density: int = 75000,
    min_zoom: int = 0,
) -> DataFrame:
    """D4/F6: keep tiles with cnt >= min_density (root zoom always kept),
    capped at max_tiles — min-zoom tiles pinned first, otherwise ranked by
    density alone across zooms (TileIndexBuilder.compareTilesByDensity:
    181-191; a dense fine tile outranks a sparse coarse one when the cap
    binds)."""
    kept = rolled.filter((F.col("zoom") == min_zoom) | (F.col("cnt") >= min_density))
    return (
        kept.orderBy(
            (F.col("zoom") == min_zoom).desc(), F.col("cnt").desc(), F.col("tile").asc()
        )
        .limit(max_tiles)
    )


def pile_assignment(points_tiled: DataFrame, catalog: DataFrame, zooms=DEFAULT_ZOOMS) -> DataFrame:
    """Map each point's z12 tile to its finest kept catalog ancestor via a
    chain of BROADCAST left joins (one per zoom level, coarse->fine,
    COALESCE fine-first) — the Spark form of the reference's pyramid
    resolve (TileCatalog.java:225-228). The catalog is tiny (<=64k rows)
    so every join is a broadcast hash join: no extra shuffle of the fact
    side."""
    top = max(zooms)
    # the catalog subplan feeds one broadcast per zoom level — cache it
    # (lazily: no job at plan construction) so the rollup/top-k pipeline
    # behind it computes ONCE instead of once per level.  Cached entries
    # are KBs-scale and evict LRU; long-lived sessions calling this in a
    # loop should pass a materialized (checkpointed/written) catalog.
    catalog = catalog.cache()
    out = points_tiled
    cols = []
    for z in sorted(zooms):
        cat_z = catalog.filter(F.col("zoom") == z).select(
            F.col("tile").alias(f"_ct{z}"), F.lit(True).alias(f"_hit{z}")
        )
        anc = F.col("tile") if z == top else S.zoomed_out(F.col("tile"), top, z)
        out = out.join(
            F.broadcast(cat_z), anc == F.col(f"_ct{z}"), "left"
        )
        cols.append(f"_ct{z}")
    # finest kept ancestor wins
    assigned = F.coalesce(*[F.col(c) for c in reversed(cols)])
    drop = [c for z in sorted(zooms) for c in (f"_ct{z}", f"_hit{z}")]
    return out.withColumn("assigned_tile", assigned).drop(*drop)


def way_assembly(membership: DataFrame, points_tiled: DataFrame) -> DataFrame:
    """C2: resolve each way's node refs to coords/tiles, aggregate to way
    bbox + tile spread. membership: (way_id, seq, node_ref);
    points_tiled: (id, x, y, tile). Shuffle join on node id, then a
    map-side-combining groupBy on way_id."""
    nodes = points_tiled.select(
        F.col("id").alias("node_ref"), "x", "y", "tile"
    )
    resolved = membership.join(nodes, "node_ref", "inner")
    return resolved.groupBy("way_id").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("x").alias("minx"),
        F.min("y").alias("miny"),
        F.max("x").alias("maxx"),
        F.max("y").alias("maxy"),
        F.countDistinct("tile").alias("n_tiles"),
    )


def purgatory(membership: DataFrame, points_tiled: DataFrame) -> DataFrame:
    """C6: memberships whose node ref is missing -> Purgatory (pile 1).
    Left-anti join, then per-way dangling counts."""
    nodes = points_tiled.select(F.col("id").alias("node_ref"))
    return (
        membership.join(nodes, "node_ref", "left_anti")
        .groupBy("way_id")
        .agg(F.count(F.lit(1)).alias("n_missing"))
    )


def relation_bbox(rel_members: DataFrame, way_bboxes: DataFrame) -> DataFrame:
    """C9 (single level): relation bbox = min/max over member way bboxes.
    rel_members: (rel_id, way_id); way_bboxes: output of way_assembly."""
    return (
        rel_members.join(way_bboxes, "way_id", "inner")
        .groupBy("rel_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("minx").alias("minx"),
            F.min("miny").alias("miny"),
            F.max("maxx").alias("maxx"),
            F.max("maxy").alias("maxy"),
        )
    )


def duplicate_coords(points: DataFrame) -> DataFrame:
    """B7/D11: nodes sharing an exact (x, y) — the reference tags these
    geodesk:duplicate=yes (build/Validator.java:1797-1848)."""
    return (
        points.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_dup"), F.min("id").alias("min_id"))
        .filter(F.col("n_dup") > 1)
    )


def way_quads(way_bboxes: DataFrame, zoom: int = 12) -> DataFrame:
    """C2 output -> packed tile quads: the 1/2/4-sibling-tile footprint of
    each way (TileQuad semantics, build/Sorter.java:465-475). The zoom-out
    loop is data-dependent, so this runs the numpy kernel as an
    Arrow-batched pandas UDF rather than a Column expression."""
    import pandas as pd
    from pyspark.sql import types as Ty

    from ..kernels import tile as KT

    def _quad_fn(minx, miny, maxx, maxy):
        import numpy as np

        q = KT.quad_from_bbox(
            minx.to_numpy(np.int64), miny.to_numpy(np.int64),
            maxx.to_numpy(np.int64), maxy.to_numpy(np.int64), zoom,
        )
        return pd.Series(q)

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't infer — set real ones at runtime
    _quad_fn.__annotations__ = {c: pd.Series for c in ("minx", "miny", "maxx", "maxy", "return")}
    quad = F.pandas_udf(_quad_fn, Ty.LongType())

    return way_bboxes.withColumn(
        "quad", quad(F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"))
    )
