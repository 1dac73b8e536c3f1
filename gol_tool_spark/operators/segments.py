"""Grid-blocked exact segment–segment intersection join.

The reference's spatial joins stop at bbox / point-in-polygon /
way-polygon intersects (FeatureUtils.java, Filters); a routing or
conflation workload over the same integer-Mercator plane also needs the
*crossing* join: which pairs of polyline segments properly intersect.
This is the classic O(n^2) predicate made tractable by grid blocking:

1. every segment emits the (<= 4) cells its endpoints' bbox touches at a
   cell width chosen >= the max segment extent (so the cover is exact
   with no range explode),
2. ONE equi-join on the cell key pairs up candidates (a < b to halve the
   work), followed by
3. the exact orientation predicate in codegen — four cross products in
   DECIMAL(38,0) (coords < 2^33, products < 2^67: exact, no overflow,
   bit-identical to the DuckDB HUGEINT twin),
4. dropDuplicates on the pair key (a pair can share up to 4 cells).

"Proper" intersection = the segments cross at an interior point of both
(strict sign changes on both orientations); collinear overlaps and
endpoint touches are excluded, matching the CGAL/LEDA definition.

Scale: shuffle carries (cell, seg endpoints) only; candidate volume per
cell is density-bounded, never all-pairs; skewed hot cells fall to AQE
skew-split.  No Python, no crossJoin, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HALF = 1 << 31
# cell bias keeps shifted coords strictly non-negative even after a
# +/-2^15 synthesis offset pushes an endpoint past +/-2^31 — floor and
# truncating integer division then agree in every engine
BIAS = (1 << 31) + (1 << 15)

# deterministic short-offset synthesis (LCG, mirrored in the SQL twin)
A_DX = 48271
A_DY = 69621
C_DY = 12345
OFF_MOD = 1 << 16  # max |offset| = 2^15 -> extent always < cell width below
CELL_SHIFT = 16  # cell width 2^16 >= max extent -> bbox cover is <= 2x2 cells


def synth_segments(points: DataFrame) -> DataFrame:
    """Deterministic segment per point: (x1,y1) = the point, (x2,y2) =
    point + LCG offsets in [-2^15, 2^15).  Degenerate (0,0) offsets bump
    dx to 1 so every segment has positive length.  Mirrored exactly in
    the oracle SQL (functions/synth.py discipline)."""
    dx = (F.col("id") * A_DX) % OFF_MOD - F.lit(OFF_MOD // 2)
    dy = (F.col("id") * A_DY + C_DY) % OFF_MOD - F.lit(OFF_MOD // 2)
    dx = F.when((dx == 0) & (dy == 0), F.lit(1)).otherwise(dx)
    return points.select(
        F.col("id").alias("seg"),
        F.col("x").cast("bigint").alias("x1"),
        F.col("y").cast("bigint").alias("y1"),
        (F.col("x") + dx).cast("bigint").alias("x2"),
        (F.col("y") + dy).cast("bigint").alias("y2"),
    )


def _cover_cells(segs: DataFrame, shift: int) -> DataFrame:
    """Explode each segment to the distinct grid cells its endpoint bbox
    touches — at most 2 per axis when cell width >= max extent."""
    cx1 = F.shiftright(F.col("x1") + BIAS, shift)
    cx2 = F.shiftright(F.col("x2") + BIAS, shift)
    cy1 = F.shiftright(F.col("y1") + BIAS, shift)
    cy2 = F.shiftright(F.col("y2") + BIAS, shift)
    return (
        segs.withColumn("_cx", F.explode(F.array_distinct(F.array(cx1, cx2))))
        .withColumn("_cy", F.explode(F.array_distinct(F.array(cy1, cy2))))
    )


def _cross(ax, ay, bx, by, px, py):
    """Orientation cross product (b-a) x (p-a) in DECIMAL(38,0) — exact."""
    d = lambda c: c.cast("decimal(38,0)")
    return (d(bx) - d(ax)) * (d(py) - d(ay)) - (d(by) - d(ay)) * (d(px) - d(ax))


def segment_intersections(segs: DataFrame, cell_shift: int = CELL_SHIFT) -> DataFrame:
    """All pairs (seg_a < seg_b) that properly cross.  Returns
    (seg_a, seg_b) exactly once per crossing pair."""
    a = _cover_cells(segs, cell_shift).select(
        F.col("seg").alias("seg_a"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"), F.col("y2").alias("ay2"),
        "_cx", "_cy",
    )
    b = _cover_cells(segs, cell_shift).select(
        F.col("seg").alias("seg_b"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"), F.col("y2").alias("by2"),
        "_cx", "_cy",
    )
    cand = a.join(b, ["_cx", "_cy"]).filter(F.col("seg_a") < F.col("seg_b"))
    d1 = _cross(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"), F.col("bx1"), F.col("by1"))
    d2 = _cross(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"), F.col("bx2"), F.col("by2"))
    d3 = _cross(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"), F.col("ax1"), F.col("ay1"))
    d4 = _cross(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"), F.col("ax2"), F.col("ay2"))
    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )
    return cand.filter(proper).select("seg_a", "seg_b").dropDuplicates(["seg_a", "seg_b"])
