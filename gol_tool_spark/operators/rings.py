"""Multipolygon ring assembly: stitch relation member ways into closed
rings (outer/inner), the geometry step behind `type=multipolygon` areas.

Reference parity: the reference materializes relation polygons via JTS
(GeoJsonFeaturePrinter.java:87-143 emits Polygon/MultiPolygon built from
member ways; area classification for relations, AreaClassifier.java:29-118).
The assembly algorithm is the standard OSM one: take each member way's
coordinate chain, repeatedly join chains whose endpoints meet (reversing
when needed), and emit maximal chains; a chain whose two ends meet is a
closed ring.

Scale shape: grouped applyInPandas per relation — a relation's member count
is bounded (thousands at worst), so per-group work is tiny and the operator
scales with the number of relations, not their total size. Input is the
assembled way-coords table joined to the membership, so the heavy lifting
(node resolution) stays in the C2 shuffle join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "rel_id long, ring_idx int, role string, closed boolean, "
    "n_points int, xs array<long>, ys array<long>, area2 double"
)


def _stitch(chains: list[tuple[list[int], list[int]]]) -> list[tuple[list[int], list[int]]]:
    """Join chains end-to-end until no more joins are possible."""
    chains = [(list(xs), list(ys)) for xs, ys in chains if len(xs) >= 2]
    merged = True
    while merged and len(chains) > 1:
        merged = False
        for i in range(len(chains)):
            if merged:
                break
            for j in range(i + 1, len(chains)):
                xi, yi = chains[i]
                xj, yj = chains[j]
                join = None
                if (xi[-1], yi[-1]) == (xj[0], yj[0]):
                    join = (xi + xj[1:], yi + yj[1:])
                elif (xi[-1], yi[-1]) == (xj[-1], yj[-1]):
                    join = (xi + xj[-2::-1], yi + yj[-2::-1])
                elif (xi[0], yi[0]) == (xj[-1], yj[-1]):
                    join = (xj + xi[1:], yj + yi[1:])
                elif (xi[0], yi[0]) == (xj[0], yj[0]):
                    join = (xj[::-1] + xi[1:], yj[::-1] + yi[1:])
                if join is not None:
                    chains[i] = join
                    del chains[j]
                    merged = True
                    break
    return chains


def assemble_rings(rel_way_coords: DataFrame) -> DataFrame:
    """rel_way_coords: (rel_id, role, coords array<struct<seq,x,y>>) — one
    row per member way. Output: one row per assembled ring with closed
    flag, point arrays and shoelace 2*area (signed; CCW positive)."""

    def per_rel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rel_id = int(key[0])
        out = []
        for role in sorted(pdf["role"].unique()):
            chains = []
            for r in pdf[pdf["role"] == role].itertuples(index=False):
                cs = sorted(r.coords, key=lambda c: c["seq"])
                chains.append(([int(c["x"]) for c in cs], [int(c["y"]) for c in cs]))
            for idx, (xs, ys) in enumerate(_stitch(chains)):
                closed = len(xs) >= 4 and (xs[0], ys[0]) == (xs[-1], ys[-1])
                ax = np.asarray(xs[:-1] if closed else xs, np.float64)
                ay = np.asarray(ys[:-1] if closed else ys, np.float64)
                area2 = float(
                    np.sum(ax * np.roll(ay, -1) - np.roll(ax, -1) * ay)
                ) if closed else 0.0
                out.append((rel_id, idx, role, closed, len(xs), xs, ys, area2))
        return pd.DataFrame(
            out,
            columns=["rel_id", "ring_idx", "role", "closed", "n_points", "xs", "ys", "area2"],
        )

    return rel_way_coords.groupBy("rel_id").applyInPandas(per_rel, OUT_SCHEMA)


POLY_SCHEMA = (
    "rel_id long, poly_idx int, is_hole boolean, ring_idx int, "
    "xs array<long>, ys array<long>"
)


def polygons_of(rings: DataFrame) -> DataFrame:
    """Group a relation's closed rings into polygons: each inner ring is
    assigned to the outer ring that contains it (ray-cast on the hole's
    first vertex — the JTS polygonization step behind
    GeoJsonFeaturePrinter.java:87-143's Polygon/MultiPolygon output).
    Output one row per ring: (rel_id, poly_idx, is_hole, ring_idx, xs, ys);
    outers get poly_idx by descending |area| (largest outer first, like the
    reference's shell ordering); a hole attaches to the INNERMOST
    containing outer (smallest containing shell — JTS polygonizer
    semantics; nested island-in-lake-in-island geometries would otherwise
    misattach); holes not inside any outer are dropped (invalid geometry,
    strict building).  Unclosed rings are excluded.

    Scale shape: per-relation applyInPandas — ring counts per relation are
    bounded, so this scales with relation count."""
    from ..kernels import geometry as G

    def per_rel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rel_id = int(key[0])
        closed = pdf[pdf["closed"]]
        outers = closed[closed["role"] != "inner"].sort_values(
            "area2", key=lambda s: -s.abs()
        )
        inners = closed[closed["role"] == "inner"]
        out = []
        rings_np = []
        for pidx, r in enumerate(outers.itertuples(index=False)):
            xs, ys = list(r.xs), list(r.ys)
            rings_np.append(np.column_stack([np.asarray(xs, np.int64), np.asarray(ys, np.int64)]))
            out.append((rel_id, pidx, False, 0, xs, ys))
        for h in inners.itertuples(index=False):
            hx, hy = np.int64(h.xs[0]), np.int64(h.ys[0])
            # innermost shell wins: outers are largest-first, so the LAST
            # containing one is the smallest enclosing shell
            best = None
            for pidx, ring_np in enumerate(rings_np):
                if G.points_in_ring(np.array([hx]), np.array([hy]), ring_np)[0]:
                    best = pidx
            if best is not None:
                nholes = sum(1 for o in out if o[1] == best and o[2])
                out.append((rel_id, best, True, nholes + 1, list(h.xs), list(h.ys)))
        return pd.DataFrame(
            out, columns=["rel_id", "poly_idx", "is_hole", "ring_idx", "xs", "ys"]
        )

    return rings.groupBy("rel_id").applyInPandas(per_rel, POLY_SCHEMA)


def multipolygon_area2(rings: DataFrame) -> DataFrame:
    """Per relation: 2*area of the multipolygon = sum |outer| - sum |inner|
    over closed rings (role-based; unclosed rings are invalid geometry and
    excluded, like the reference's strict polygon building)."""
    closed = rings.filter(F.col("closed"))
    signed = F.when(F.col("role") == "inner", -F.abs(F.col("area2"))).otherwise(
        F.abs(F.col("area2"))
    )
    return closed.groupBy("rel_id").agg(
        F.sum(signed).alias("area2"),
        F.count(F.lit(1)).alias("n_rings"),
        F.sum(F.when(F.col("role") == "inner", 1).otherwise(0)).alias("n_inner"),
    )
