"""Tile math as Spark Column expressions (JVM-side, codegen-friendly).

Mirrors kernels/tile.py bit-for-bit (unit tests assert agreement).  Staying
in built-in functions keeps tile assignment inside WholeStageCodegen — no
Python boundary on the 100 TB hot path; the numpy kernels remain the oracle
and the pandas-UDF fallback.

Reference parity: C1 node->tile point join (build/Sorter.java:362-383),
Tile.fromColumnRowZoom/zoomedOut (build/TileCatalog.java:201-228).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

WORLD = 1 << 32
HALF = 1 << 31
TILE_ZOOM_MULT = 1 << 24  # zoom field shift in packed tile id
TILE_ROW_MULT = 1 << 12


def _big(c: Column) -> Column:
    return c.cast("bigint")


def tile_col(x: Column, zoom: int) -> Column:
    """Column index of the zoom-z tile containing grid x."""
    if zoom == 0:
        return F.lit(0).cast("bigint")
    return F.shiftright(_big(x) + F.lit(HALF), 32 - zoom)


def tile_row(y: Column, zoom: int) -> Column:
    """Row index (row 0 = north edge)."""
    if zoom == 0:
        return F.lit(0).cast("bigint")
    return F.shiftright(F.lit(HALF - 1) - _big(y), 32 - zoom)


def tile_of_point(x: Column, y: Column, zoom: int) -> Column:
    """Packed tile id zoom<<24 | row<<12 | col."""
    return (
        F.lit(zoom * TILE_ZOOM_MULT).cast("bigint")
        + tile_row(y, zoom) * F.lit(TILE_ROW_MULT)
        + tile_col(x, zoom)
    )


def zoomed_out(tile: Column, from_zoom: int, to_zoom: int) -> Column:
    """Parent tile id at a coarser zoom."""
    dz = from_zoom - to_zoom
    row = F.shiftright(F.shiftright(_big(tile), 12).bitwiseAND(F.lit(0xFFF)), dz)
    col = F.shiftright(_big(tile).bitwiseAND(F.lit(0xFFF)), dz)
    return F.lit(to_zoom * TILE_ZOOM_MULT).cast("bigint") + row * F.lit(TILE_ROW_MULT) + col


def tile_zoom(tile: Column) -> Column:
    return F.shiftright(_big(tile), 24)


def tile_bounds(tile: Column, zoom: int) -> tuple[Column, Column, Column, Column]:
    """(minx, miny, maxx, maxy) of a packed tile id at known zoom."""
    size = 1 << (32 - zoom)
    col = _big(tile).bitwiseAND(F.lit(0xFFF))
    row = F.shiftright(_big(tile), 12).bitwiseAND(F.lit(0xFFF))
    minx = col * F.lit(size) - F.lit(HALF)
    maxy = F.lit(HALF - 1) - row * F.lit(size)
    return minx, maxy - F.lit(size - 1), minx + F.lit(size - 1), maxy


def bbox_overlaps(
    minx: Column, miny: Column, maxx: Column, maxy: Column,
    qminx: int, qminy: int, qmaxx: int, qmaxy: int,
) -> Column:
    """Bbox predicate for query scopes (B2); pure comparisons -> pushed to
    the scan by Catalyst (PushedFilters on min/max stat columns)."""
    return (
        (minx <= F.lit(qmaxx)) & (maxx >= F.lit(qminx))
        & (miny <= F.lit(qmaxy)) & (maxy >= F.lit(qminy))
    )


def count_tiles_covering_bbox(qminx: int, qminy: int, qmaxx: int, qmaxy: int, zoom: int) -> int:
    """Tile count of the covering rectangle without enumerating it."""
    c0 = (qminx + HALF) >> (32 - zoom)
    c1 = (qmaxx + HALF) >> (32 - zoom)
    r0 = ((HALF - 1) - qmaxy) >> (32 - zoom)
    r1 = ((HALF - 1) - qminy) >> (32 - zoom)
    return (r1 - r0 + 1) * (c1 - c0 + 1)


def tiles_covering_bbox(qminx: int, qminy: int, qmaxx: int, qmaxy: int, zoom: int) -> list[int]:
    """Driver-side tile enumeration for partition pruning — the Spark
    equivalent of the reference's TileIndexWalker (GolCommand.java:131-144):
    the resulting id list becomes `tile IN (...)`, which Catalyst turns into
    partition pruning on tile-partitioned tables. Callers must check
    count_tiles_covering_bbox first — a world bbox at z12 is 16.7M tiles."""
    c0 = (qminx + HALF) >> (32 - zoom)
    c1 = (qmaxx + HALF) >> (32 - zoom)
    r0 = ((HALF - 1) - qmaxy) >> (32 - zoom)
    r1 = ((HALF - 1) - qminy) >> (32 - zoom)
    return [
        zoom * TILE_ZOOM_MULT + r * TILE_ROW_MULT + c
        for r in range(r0, r1 + 1)
        for c in range(c0, c1 + 1)
    ]


def _spread_bits16(v: Column) -> Column:
    """Interleave-ready bit spread: 16-bit value -> even bit positions of a
    32-bit lane (classic magic-number expansion, 4 rounds)."""
    v = v.bitwiseAND(F.lit(0xFFFF))
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x33333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x55555555))
    return v


def morton_cell(x: Column, y: Column, zoom: int = 16) -> Column:
    """Z-order (Morton) cell id at the given zoom: interleaved (col,row)
    bits, int64. The S2-like locality key — sorting the tile store by this
    puts spatially-near features in the same parquet row groups, so bbox
    min/max stats prune like the reference's per-tile R-trees
    (compiler/SIndexTree.java:361-425; SURVEY.md §1.4 "Hilbert/Z-order").
    Pure JVM bit arithmetic (whole-stage codegen)."""
    if not 1 <= zoom <= 16:
        raise ValueError("morton_cell supports zoom 1..16")
    col = tile_col(x, zoom)
    row = tile_row(y, zoom)
    return F.shiftleft(_spread_bits16(row), 1) + _spread_bits16(col)


def hilbert_cell(x: Column, y: Column, zoom: int = 16) -> Column:
    """Hilbert-curve cell distance at the given zoom — the locality key
    with strictly better neighbor preservation than Morton (consecutive
    curve positions are always edge-adjacent cells), so a store sorted by
    it packs bbox-coherent rows into fewer parquet row groups.

    The quadrant-fold rotations are data-dependent (not a fixed bit-mix),
    so this is an Arrow-batched pandas UDF over the numpy kernel rather
    than a codegen expression — acceptable because the key is computed
    ONCE at compile layout (a build-time cost), never on the query path;
    queries prune on the resulting x/y row-group stats, not on the key."""
    import pandas as pd

    from ..kernels import tile as KT

    def _h(xs, ys):
        return pd.Series(KT.hilbert_d(xs.to_numpy(np.int64), ys.to_numpy(np.int64), zoom))

    _h.__annotations__ = {"xs": pd.Series, "ys": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_h, "long")
    return udf(x, y)
