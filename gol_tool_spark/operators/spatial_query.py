"""Query-path operators: bbox scope, GOQL filter, polygon-intersects, kNN.

Reference parity: B2 bbox predicate (QueryCommand.java:176-179), B1 GOQL
selector (QueryCommand.java:171), B3/C10 polygon intersects filter
(QueryCommand.java:172-175, GolCommand.java:131-144 tile walk + exact test),
kNN is the cell-ring extension mandated by BASELINE.json (not in reference).

Scale notes:
  * bbox scope = tile-IN-list (partition pruning, the TileIndexWalker
    analogue) AND'd with the exact coordinate range — on a tile-partitioned
    table Catalyst prunes files before reading them.
  * polygon test is two-phase: broadcast bbox prefilter (JVM, codegen) then
    the exact ray-cast only on candidates, as an Arrow-batched pandas UDF
    over the (small) candidate set — mirroring the reference's
    tile-prune-then-exact-filter design.
  * kNN: brute force is the oracle; the scale path buckets by z-cell and
    searches the 3x3 cell ring via a grouped applyInPandas, so cost is
    O(points-in-ring), not O(all points).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from ..functions import spatial as S
from ..functions.goql import compile_goql
from ..kernels import geometry as G


def bbox_query(
    points_tiled: DataFrame,
    minx: int, miny: int, maxx: int, maxy: int,
    zoom: int = 12,
    goql: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """B2 (+B1, F1): tile-pruned bbox scope + optional GOQL + limit."""
    out = points_tiled
    # IN-list prune only while the list stays sane — and COUNT before
    # enumerating (a world bbox at z12 is a 16.7M-element list)
    if S.count_tiles_covering_bbox(minx, miny, maxx, maxy, zoom) <= 10000:
        tiles = S.tiles_covering_bbox(minx, miny, maxx, maxy, zoom)
        out = out.filter(F.col("tile").isin(tiles))
    out = out.filter(
        (F.col("x") >= minx) & (F.col("x") <= maxx)
        & (F.col("y") >= miny) & (F.col("y") <= maxy)
    )
    if goql:
        # tables without an ftype column are all-nodes (the points table)
        ftype = F.col("ftype") if "ftype" in out.columns else F.lit("n")
        out = out.filter(compile_goql(goql, ftype=ftype))
    if limit:
        out = out.limit(limit)
    return out


def points_in_polygon(
    points: DataFrame,
    exterior: list[tuple[int, int]],
    holes: list[list[tuple[int, int]]] | None = None,
) -> DataFrame:
    """B3/C10: polygon-intersects for points. Phase 1: bbox prefilter
    (JVM predicate). Phase 2: exact even-odd ray cast in an Arrow-batched
    pandas UDF (vectorized numpy; the polygon rings ride in the closure —
    the broadcast-small-side pattern)."""
    ext = np.asarray(exterior, np.int64)
    hls = [np.asarray(h, np.int64) for h in (holes or [])]
    minx, miny = int(ext[:, 0].min()), int(ext[:, 1].min())
    maxx, maxy = int(ext[:, 0].max()), int(ext[:, 1].max())

    @F.pandas_udf(Ty.BooleanType())
    def _inside(x: pd.Series, y: pd.Series) -> pd.Series:
        res = G.points_in_polygon(x.to_numpy(np.int64), y.to_numpy(np.int64), ext, hls)
        return pd.Series(res)

    pre = points.filter(
        (F.col("x") >= minx) & (F.col("x") <= maxx)
        & (F.col("y") >= miny) & (F.col("y") <= maxy)
    )
    return pre.filter(_inside(F.col("x"), F.col("y")))


def knn_bruteforce(points: DataFrame, query_points: list[tuple[int, int, int]], k: int = 10) -> DataFrame:
    """kNN oracle: exact k nearest points per query (qid, qx, qy) by
    squared Euclidean grid distance, ties by point id. Broadcast the tiny
    query side, window-rank per qid. O(N*Q) — correct, not the scale path."""
    spark = points.sparkSession
    q = spark.createDataFrame(query_points, "qid long, qx long, qy long")
    # deltas squared in DOUBLE: |delta| can reach 2^32 whose square overflows
    # int64; double is exact to 2^53 and bit-stable across engines
    dx = (F.col("x") - F.col("qx")).cast("double")
    dy = (F.col("y") - F.col("qy")).cast("double")
    d2 = dx * dx + dy * dy
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("id").asc())
    return (
        points.crossJoin(F.broadcast(q))
        .withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "rank", "d2")
    )


def _knn_ring_pass(
    points_tiled: DataFrame,
    query_points: list[tuple[int, int, int]],
    k: int,
    zoom: int,
    radius: int,
) -> DataFrame:
    spark = points_tiled.sparkSession
    rows = []
    size = 1 << (32 - zoom)
    span = range(-radius, radius + 1)
    for qid, qx, qy in query_points:
        for dr in span:
            for dc in span:
                cx, cy = qx + dc * size, qy + dr * size
                if -(1 << 31) <= cx < (1 << 31) and -(1 << 31) <= cy < (1 << 31):
                    rows.append((qid, qx, qy, cx, cy))
    ring = spark.createDataFrame(rows, "qid long, qx long, qy long, cx long, cy long")
    ring = ring.withColumn("cell", S.tile_of_point(F.col("cx"), F.col("cy"), zoom)).select(
        "qid", "qx", "qy", "cell"
    ).dropDuplicates(["qid", "cell"])

    # enumerate the ring cells driver-side: the IN-list becomes partition
    # pruning on a cell-partitioned store (TileIndexWalker analogue) and a
    # cheap prefilter here
    ring_cells = [r.cell for r in ring.select("cell").distinct().collect()]
    pts = points_tiled.withColumn("cell", S.tile_of_point(F.col("x"), F.col("y"), zoom))
    pts = pts.filter(F.col("cell").isin(ring_cells))
    cand = pts.join(F.broadcast(ring), "cell", "inner")
    dx = (F.col("x") - F.col("qx")).cast("double")
    dy = (F.col("y") - F.col("qy")).cast("double")
    d2 = dx * dx + dy * dy
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("id").asc())
    return (
        cand.withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "rank", "d2")
    )


def knn_cell_ring(
    points_tiled: DataFrame,
    query_points: list[tuple[int, int, int]],
    k: int = 10,
    zoom: int = 8,
    max_expansions: int = 3,
) -> DataFrame:
    """Scale-path kNN: queries are replicated to their cell's (2r+1)^2 ring
    at a coarse zoom; candidates = points co-located in a ring cell; exact
    top-k per query via window. A query only scans its ring — O(ring
    density), independent of table size.

    Adaptive: queries that found < k neighbors (or whose kth distance
    exceeds the guaranteed-complete radius (r*cell)^2, meaning a closer
    point could hide outside the ring) are retried with a doubled radius,
    up to max_expansions — the cell-ring expansion mandated by the north
    star. Sparse regions cost extra passes; the common case is one."""
    remaining = list(query_points)
    results: list[DataFrame] = []
    radius = 1
    size = 1 << (32 - zoom)
    for _ in range(max_expansions + 1):
        out = _knn_ring_pass(points_tiled, remaining, k, zoom, radius).cache()
        # complete iff k found AND kth distance within the safe radius
        safe_d2 = float(radius * size) ** 2
        stats = {
            r.qid: (r.n, r.maxd)
            for r in out.groupBy("qid").agg(
                F.count(F.lit(1)).alias("n"), F.max("d2").alias("maxd")
            ).collect()
        }
        done = [
            q for q in remaining
            if stats.get(q[0], (0, 0.0))[0] >= k and stats[q[0]][1] <= safe_d2
        ]
        done_ids = {q[0] for q in done}
        retry = [q for q in remaining if q[0] not in done_ids]
        if not retry or radius >= (1 << zoom) or _ == max_expansions:
            results.append(out)
            break
        results.append(out.filter(F.col("qid").isin([q[0] for q in done])))
        remaining = retry
        radius *= 2
    final = results[0]
    for r in results[1:]:
        final = final.unionByName(r)
    return final


def ways_intersect_polygon(
    way_coords: DataFrame,
    exterior: list[tuple[int, int]],
    holes: list[list[tuple[int, int]]] | None = None,
) -> DataFrame:
    """C10 for line features (the 'segment intersection for lines' path):
    bbox prefilter from the assembled coords, exact vertex-in-polygon +
    segment-edge-crossing test in an Arrow-batched mapInPandas.
    way_coords: output of measures.assemble_coords (way_id, coords)."""
    ext = np.asarray(exterior, np.int64)
    hls = [np.asarray(h, np.int64) for h in (holes or [])]
    minx, miny = int(ext[:, 0].min()), int(ext[:, 1].min())
    maxx, maxy = int(ext[:, 0].max()), int(ext[:, 1].max())

    pre = way_coords.filter(
        (F.expr("aggregate(coords, cast(-9223372036854775808 as bigint), (m, c) -> greatest(m, cast(c.x as bigint)))") >= minx)
        & (F.expr("aggregate(coords, cast(9223372036854775807 as bigint), (m, c) -> least(m, cast(c.x as bigint)))") <= maxx)
        & (F.expr("aggregate(coords, cast(-9223372036854775808 as bigint), (m, c) -> greatest(m, cast(c.y as bigint)))") >= miny)
        & (F.expr("aggregate(coords, cast(9223372036854775807 as bigint), (m, c) -> least(m, cast(c.y as bigint)))") <= maxy)
    )

    def run(batches):
        import pandas as pd

        from ..kernels import geometry as G

        for pdf in batches:
            keep = []
            for r in pdf.itertuples(index=False):
                xs = np.array([c["x"] for c in r.coords], np.int64)
                ys = np.array([c["y"] for c in r.coords], np.int64)
                if G.polyline_intersects_polygon(xs, ys, ext, hls):
                    keep.append((r.way_id,))
            yield pd.DataFrame(keep, columns=["way_id"])

    return pre.mapInPandas(run, "way_id long")
