"""IDW (inverse-distance-weighted) grid interpolation over scattered
points — the raster-estimation step of a spatial-analytics pipeline
(density/price/quality surfaces from point samples).

Not in the reference (gol-tool has no interpolation); a first-class
analytics extension like the hexgrid/DBSCAN lanes, built to be
bit-exactly oracle-checkable:

  * cell blocking: each zoom-z cell with >=1 point becomes a target; its
    neighbors are the points in the 3x3 cell ring — ONE equi-join on the
    cell key (the kNN/DBSCAN blocking discipline; never all-pairs).
  * exactness: at zoom >= 7 the ring-constrained |dx| < 1.5 * 2^(32-z)
    keeps dx^2 + dy^2 below 2^53, so d2 is EXACT in a double; the weight
    is the modified-IDW 1/(1+d2) (no 1/0 singularity, no sqrt), and the
    weighted sums run as ORDERED left folds over an id-sorted neighbor
    array — DuckDB's list_reduce reproduces every bit.
  * output quantizes to round(idw * 1e6)::bigint — one exact double per
    round decision (the way_centroid discipline).

Scale: one map-combined groupBy to find cells, a 9x explode on the
TARGET side (cells, not points), one shuffle join on the cell key, one
groupBy(target).  Skewed hot cells are the same AQE territory as the
kNN cell join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HALF = 1 << 31


def idw_grid(
    points: DataFrame,
    value_col: str = "qty",
    zoom: int = 7,
    id_col: str = "id",
) -> DataFrame:
    """(cx, cy, n_pts, idw_q) — modified-IDW estimate at the center of
    every zoom-`zoom` cell that contains at least one point, from the
    points in its 3x3 cell ring.  idw_q = round(idw * 1e6) as bigint."""
    if zoom < 7:
        raise ValueError("zoom >= 7 keeps d2 exact in a double (see module doc)")
    s = 32 - zoom
    cell_x = F.shiftright(F.col("x") + HALF, s)
    cell_y = F.shiftright(F.col("y") + HALF, s)
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col("x"), F.col("y"),
        F.col(value_col).cast("double").alias("v"),
        cell_x.alias("px"), cell_y.alias("py"),
    )
    targets = (
        pts.groupBy("px", "py")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(F.col("px").alias("cx"), F.col("py").alias("cy"))
    )
    off = F.sequence(F.lit(-1), F.lit(1))
    ring = (
        targets.select("cx", "cy", F.explode(off).alias("ox"))
        .select("cx", "cy", "ox", F.explode(off).alias("oy"))
        .select(
            "cx", "cy",
            (F.col("cx") + F.col("ox")).alias("px"),
            (F.col("cy") + F.col("oy")).alias("py"),
        )
    )
    # center of cell (cx, cy) in grid coords; exact integer math
    half_cell = 1 << (s - 1)
    ctr_x = (F.col("cx") * (1 << s)) - HALF + half_cell
    ctr_y = (F.col("cy") * (1 << s)) - HALF + half_cell
    j = ring.join(pts, ["px", "py"]).select(
        "cx", "cy", "pid", "v",
        (F.col("x") - ctr_x).cast("double").alias("dx"),
        (F.col("y") - ctr_y).cast("double").alias("dy"),
    )
    w = F.lit(1.0) / (F.lit(1.0) + (F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")))
    arr = (
        j.withColumn("w", w)
        .groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.array_sort(F.collect_list(F.struct("pid", "w", "v"))).alias("nb"),
        )
    )
    sw = F.aggregate("nb", F.lit(0.0), lambda a, e: a + e["w"])
    swv = F.aggregate("nb", F.lit(0.0), lambda a, e: a + e["w"] * e["v"])
    return arr.select(
        "cx", "cy", "n_pts",
        F.round((swv / sw) * 1e6).cast("bigint").alias("idw_q"),
    )
