"""Geometry measures: way length / ring area on the int grid, and the
stats tallies that consume them (D6 tally=length/area).

Reference parity: feature.length()/area() feeding StatsFeaturePrinter
tallies (query/StatsFeaturePrinter.java:388-420, query/Unit.java:11-18).
The reference measures on the Mercator plane via JTS; true metres need the
cos(lat) scale correction (kernels/mercator.mercator_scale).

Two length flavors:
  * manhattan_length — sum |dx|+|dy| in grid units: EXACT integer math,
    aggregation-order independent, usable in cross-engine oracles.
  * euclidean_length — sum sqrt(dx^2+dy^2): float, computed by ordered
    aggregation over the assembled coordinate array (deterministic within
    Spark; excluded from cross-engine hashing).
Both are higher-order array expressions over the way's (seq-sorted) coords
— no UDF, one shuffle (the C2 assembly's groupBy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assemble_coords(membership: DataFrame, points: DataFrame) -> DataFrame:
    """(way_id, coords array<struct<seq,x,y>> sorted by seq)."""
    nodes = points.select(F.col("id").alias("node_ref"), "x", "y")
    resolved = membership.join(nodes, "node_ref")
    return resolved.groupBy("way_id").agg(
        F.array_sort(F.collect_list(F.struct("seq", "x", "y"))).alias("coords")
    )


def _pairwise(coords: Column, fn) -> Column:
    # guard: F.sequence(0, -1) yields a DESCENDING sequence for 1-node ways
    idx = F.sequence(F.lit(0), F.size(coords) - 2)
    agg = F.aggregate(
        F.transform(idx, lambda i: fn(F.element_at(coords, i + 1), F.element_at(coords, i + 2))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(F.size(coords) >= 2, agg).otherwise(F.lit(0.0))


def manhattan_length(coords: Column) -> Column:
    """Exact integer L1 length in grid units (oracle-safe)."""
    idx = F.sequence(F.lit(0), F.size(coords) - 2)
    agg = F.aggregate(
        F.transform(
            idx,
            lambda i: F.abs(F.element_at(coords, i + 1)["x"] - F.element_at(coords, i + 2)["x"])
            + F.abs(F.element_at(coords, i + 1)["y"] - F.element_at(coords, i + 2)["y"]),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return F.when(F.size(coords) >= 2, agg).otherwise(F.lit(0).cast("bigint"))


def euclidean_length(coords: Column) -> Column:
    return _pairwise(
        coords,
        lambda a, b: F.sqrt(
            (b["x"] - a["x"]).cast("double") * (b["x"] - a["x"]).cast("double")
            + (b["y"] - a["y"]).cast("double") * (b["y"] - a["y"]).cast("double")
        ),
    )


def ring_area2(coords: Column) -> Column:
    """Twice the signed shoelace area (closed ring implied; grid units^2).
    Doubles (can exceed int64) — deterministic sequential aggregation."""
    n = F.size(coords)
    idx = F.sequence(F.lit(0), n - 1)
    agg = F.aggregate(
        F.transform(
            idx,
            lambda i: F.element_at(coords, i + 1)["x"].cast("double")
            * F.element_at(coords, (i + 1) % n + 1)["y"].cast("double")
            - F.element_at(coords, (i + 1) % n + 1)["x"].cast("double")
            * F.element_at(coords, i + 1)["y"].cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # empty coord arrays: F.sequence(0, -1) would be a descending range
    return F.when(n > 0, agg).otherwise(F.lit(0.0))


def way_measures(membership: DataFrame, points: DataFrame) -> DataFrame:
    """Per-way measures table: n_nodes, manhattan/euclidean length, closed."""
    coords = assemble_coords(membership, points)
    first = F.element_at("coords", 1)
    last = F.element_at("coords", F.size("coords"))
    return coords.select(
        "way_id",
        F.size("coords").alias("n_nodes"),
        manhattan_length(F.col("coords")).alias("l1_len"),
        euclidean_length(F.col("coords")).alias("l2_len"),
        ((first["x"] == last["x"]) & (first["y"] == last["y"]) & (F.size("coords") > 2)).alias("closed"),
    )
