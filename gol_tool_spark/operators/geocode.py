"""Geohash-style base32 cell ids over the integer-Mercator plane.

The reference addresses space with numeric tile/quad ids
(TileCatalog.java, kernels/tile.py here).  A data-exchange workload
also wants the *string* form of the same idea: a Z-order (Morton) cell
id rendered in the geohash base32 alphabet, where truncating the string
by one character coarsens the cell — so prefix GROUP BYs give
hierarchical rollups and prefix LIKEs give bbox-ish pruning on plain
string columns (classic geohash property, public knowledge: Morton
interleave + base32).

This is NOT geodetic geohash (that interleaves lon/lat of the WGS84
ellipsoid); it interleaves the engine's native int32 Mercator x/y, so
ids are consistent with every tile operator in the repo and the math is
EXACT — no trig, no doubles, bit-identical SQL twins in any engine with
64-bit integer ops.

Encoding: bias x/y to [0, 2^32), keep the top 30 bits of each axis,
spread to alternating bits with the standard mask-and-shift ladder
(Morton/BMI-free bit interleave), OR into a 60-bit code, render 12
chars of 5 bits each, most significant first.

Scale: pure codegen column math — no shuffle at all for the encode; the
rollup is one map-combined groupBy on the prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HALF = 1 << 31
ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"  # geohash base32 (public)

# mask ladder that spreads the low 30 bits of a 64-bit lane so bit i
# lands at position 2i (even bits); the classic interleave-by-magic
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(v: Column) -> Column:
    """Spread the low 30 bits of v to even bit positions (exact bigint)."""
    for shift, mask in _SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton60(x: Column, y: Column) -> Column:
    """60-bit Z-order code: y bits on odd positions, x bits on even —
    matching geohash's lon-first bit order (x = lon axis here)."""
    xb = F.shiftright(x.cast("bigint") + F.lit(HALF), 2)  # top 30 of 32 bits
    yb = F.shiftright(y.cast("bigint") + F.lit(HALF), 2)
    return _spread_bits(xb).bitwiseOR(F.shiftleft(_spread_bits(yb), 1))


def gridhash(x: Column, y: Column, precision: int = 12) -> Column:
    """Base32 cell-id string of `precision` chars (5 bits each, most
    significant first).  precision 12 = the full 60-bit cell (~unit
    cells); each dropped char widens the cell 32x."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    m = morton60(x, y)
    chars = [
        F.substring(
            F.lit(ALPHABET),
            (F.shiftright(m, 60 - 5 * (i + 1)).bitwiseAND(F.lit(31))).cast("int") + F.lit(1),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def gridhash_points(df: DataFrame, precision: int = 12) -> DataFrame:
    """id -> gridhash over a points table (id, x, y)."""
    return df.select("id", gridhash(F.col("x"), F.col("y"), precision).alias("gh"))


def gridhash_rollup(df: DataFrame, prefix_len: int, precision: int = 12) -> DataFrame:
    """Hierarchical density: point count per gridhash prefix of
    prefix_len chars.  One map-combined groupBy; at scale run it
    directly on a stored gh column and let the scan prune on the
    prefix range."""
    gh = gridhash(F.col("x"), F.col("y"), precision)
    return (
        df.select(F.substring(gh, 1, prefix_len).alias("gh_prefix"))
        .groupBy("gh_prefix")
        .agg(F.count(F.lit(1)).alias("n"))
    )
