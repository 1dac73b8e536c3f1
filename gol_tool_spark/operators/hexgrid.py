"""H3-style hexagonal cell index over the int-Mercator plane.

The north-star brief asks for an H3/S2-style cell index as the alternative
to the reference's quad-tile pyramid (gol-tool's TileCatalog,
`gol-tool/src/main/java/com/geodesk/gol/build/TileCatalog.java` — our quad
twin lives in kernels/tile.py).  This module provides the hex half:
a pointy-top axial hex grid, aperture 4 (cell size halves per resolution),
with H3's center-containment parent rule for hierarchical rollups (hex
grids do not nest exactly, so a child belongs to the parent cell that
contains its CENTER — the same approximation H3 documents).

Scale notes:
- Assignment is pure double arithmetic compiled into WholeStageCodegen —
  faster than the Arrow-UDF formulation the brief sketches because no rows
  ever leave the JVM (a numpy twin is provided for tests/pipelines that
  want it batch-side).
- Hex rounding IS the Voronoi assignment: every point maps to the nearest
  cell center, so densities/rollups are exact partitions of the input
  (tested against a brute-force nearest-center oracle).
- Every step is oracle-expressible: the SQL twins are generated from the
  SAME constants and expression shapes (axial_sql), so DuckDB reproduces
  cell ids bit-for-bit (IEEE doubles, identical evaluation order; the
  round-half-up vs round-half-away seam only matters at exact .5 ties,
  where both engines round away from zero).

Resolutions: 0..20 (res 0 cell size = 2^28 Mercator units ~ quarter
plane; res 20 = 256 units).  Cell id = res<<52 | (q+2^25)<<26 | (r+2^25),
a single orderable BIGINT like H3's packed index.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact repr'd doubles shared by the JVM expressions, the SQL twins, and
# the numpy twin — all three evaluate the same IEEE tree
SQRT3_3 = 0.5773502691896258  # sqrt(3)/3
ONE_3 = 0.3333333333333333  # 1/3
TWO_3 = 0.6666666666666666  # 2/3
SQRT3 = 1.7320508075688772  # sqrt(3)
SQRT3_2 = 0.8660254037844386  # sqrt(3)/2

RES0_SIZE = 1 << 28
MAX_RES = 20
OFF = 1 << 25


def cell_size(res: int) -> float:
    """Cell size (circumradius basis) at `res`; aperture 4."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"hex res must be in [0, {MAX_RES}], got {res}")
    return float(RES0_SIZE >> res)


def axial_cols(x: Column, y: Column, size: float) -> tuple[Column, Column]:
    """(q, r) axial hex coords of the cell containing (x, y) — fractional
    axial transform + cube rounding, all JVM-side."""
    xc, yc = x.cast("double"), y.cast("double")
    qf = (F.lit(SQRT3_3) * xc - F.lit(ONE_3) * yc) / F.lit(size)
    rf = (F.lit(TWO_3) * yc) / F.lit(size)
    yf = -qf - rf
    xr, yr, zr = F.round(qf), F.round(yf), F.round(rf)
    dx, dy, dz = F.abs(xr - qf), F.abs(yr - yf), F.abs(zr - rf)
    fix_x = (dx > dy) & (dx > dz)
    q = F.when(fix_x, -yr - zr).otherwise(xr).cast("long")
    r = F.when(~fix_x & ~(dy > dz), -xr - yr).otherwise(zr).cast("long")
    return q, r


def axial_sql(x: str, y: str, size: float) -> tuple[str, str]:
    """DuckDB twin of axial_cols — same constants, same evaluation order.
    Returns (q_sql, r_sql) over the given x/y SQL expressions."""
    qf = f"(({SQRT3_3!r} * CAST({x} AS DOUBLE) - {ONE_3!r} * CAST({y} AS DOUBLE)) / {size!r})"
    rf = f"(({TWO_3!r} * CAST({y} AS DOUBLE)) / {size!r})"
    yf = f"(-{qf} - {rf})"
    xr, yr, zr = f"round({qf})", f"round({yf})", f"round({rf})"
    dx, dy, dz = f"abs({xr} - {qf})", f"abs({yr} - {yf})", f"abs({zr} - {rf})"
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    q = f"CAST(CASE WHEN {fix_x} THEN -{yr} - {zr} ELSE {xr} END AS BIGINT)"
    r = (
        f"CAST(CASE WHEN NOT {fix_x} AND NOT ({dy} > {dz}) "
        f"THEN -{xr} - {yr} ELSE {zr} END AS BIGINT)"
    )
    return q, r


def axial_np(x: np.ndarray, y: np.ndarray, size: float) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized numpy twin (for Arrow-batch pipelines and tests)."""
    xc, yc = x.astype(np.float64), y.astype(np.float64)
    qf = (SQRT3_3 * xc - ONE_3 * yc) / size
    rf = (TWO_3 * yc) / size
    yf = -qf - rf
    # np.round is banker's; match round-half-away explicitly
    xr, yr, zr = (np.floor(v + 0.5) * (v >= 0) - np.floor(-v + 0.5) * (v < 0)
                  for v in (qf, yf, rf))
    dx, dy, dz = np.abs(xr - qf), np.abs(yr - yf), np.abs(zr - rf)
    fix_x = (dx > dy) & (dx > dz)
    q = np.where(fix_x, -yr - zr, xr).astype(np.int64)
    r = np.where(~fix_x & ~(dy > dz), -xr - yr, zr).astype(np.int64)
    return q, r


def center_cols(q: Column, r: Column, size: float) -> tuple[Column, Column]:
    """Cell-center Mercator coordinates (doubles) of axial (q, r)."""
    qd, rd = q.cast("double"), r.cast("double")
    cx = F.lit(size) * (F.lit(SQRT3) * qd + F.lit(SQRT3_2) * rd)
    cy = F.lit(size) * (F.lit(1.5) * rd)
    return cx, cy


def center_sql(q: str, r: str, size: float) -> tuple[str, str]:
    cx = f"({size!r} * ({SQRT3!r} * CAST({q} AS DOUBLE) + {SQRT3_2!r} * CAST({r} AS DOUBLE)))"
    cy = f"({size!r} * (1.5 * CAST({r} AS DOUBLE)))"
    return cx, cy


def hex_id_col(res: int, q: Column, r: Column) -> Column:
    return (F.lit(res).cast("long") * F.lit(1 << 52) + (q + OFF) * F.lit(1 << 26) + (r + OFF))


def hex_id_sql(res: int, q: str, r: str) -> str:
    return f"(CAST({res} AS BIGINT) * {1 << 52} + ({q} + {OFF}) * {1 << 26} + ({r} + {OFF}))"


def decode_hex_id(hid: int) -> tuple[int, int, int]:
    """(res, q, r) from a packed id — driver-side helper."""
    return hid >> 52, ((hid >> 26) & ((1 << 26) - 1)) - OFF, (hid & ((1 << 26) - 1)) - OFF


def assign_hex(
    df: DataFrame, res: int, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Add hex_q / hex_r / hex_id at `res`.  Pure codegen — no shuffle, no
    Python; the hex analogue of tiling.assign_points."""
    q, r = axial_cols(F.col(x_col), F.col(y_col), cell_size(res))
    return df.withColumns({"hex_q": q, "hex_r": r}).withColumn(
        "hex_id", hex_id_col(res, F.col("hex_q"), F.col("hex_r"))
    )


def hex_density(df: DataFrame, res: int, x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per-cell point counts at `res` — one map-side-combined groupBy."""
    return (
        assign_hex(df, res, x_col, y_col)
        .groupBy("hex_q", "hex_r", "hex_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hex_rollup(density: DataFrame, res: int) -> DataFrame:
    """Roll a res-level density up to res-1 by H3's center-containment
    rule: each child cell contributes its count to the parent cell that
    contains the child's CENTER.  Exact partition of the input counts
    (every child has exactly one parent), map-side combined."""
    if res < 1:
        raise ValueError("cannot roll up below res 0")
    cx, cy = center_cols(F.col("hex_q"), F.col("hex_r"), cell_size(res))
    pq, pr = axial_cols(cx, cy, cell_size(res - 1))
    return (
        density.select(pq.alias("hex_q"), pr.alias("hex_r"), "cnt")
        .groupBy("hex_q", "hex_r")
        .agg(F.sum("cnt").alias("cnt"))
        .select(
            "hex_q", "hex_r",
            hex_id_col(res - 1, F.col("hex_q"), F.col("hex_r")).alias("hex_id"),
            "cnt",
        )
    )
