"""Vectorized geometry kernels: ray-cast point-in-polygon, bbox tests,
polyline length / ring area on the int-Mercator grid.

Capability parity: the reference's polygon-intersects query filter
(QueryCommand.java:172-175 via Filters.intersects + .poly files,
GolCommand.java:96-105) and stats length/area tallies
(query/StatsFeaturePrinter.java:397-402, JTS feature.length()/area()).
Shapely is not assumed present — these are pure numpy and back the
pandas-UDF exact tests after a bbox prefilter (the cheap pass stays
JVM-side as column predicates).
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast of many points against ONE ring (Nx2 int array,
    closed implicitly). Returns bool array. Boundary points count as inside
    on the lower edge (standard crossing rule) — deterministic either way.
    Complexity O(points * vertices) but vectorized over points.
    """
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    vx = np.asarray(ring[:, 0], np.float64)
    vy = np.asarray(ring[:, 1], np.float64)
    inside = np.zeros(px.shape, bool)
    j = len(vx) - 1
    for i in range(len(vx)):
        cond = (vy[i] > py) != (vy[j] > py)
        # x coordinate where the edge crosses the horizontal through py
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = vx[i] + (py - vy[i]) / (vy[j] - vy[i]) * (vx[j] - vx[i])
        inside ^= cond & (px < xcross)
        j = i
    return inside


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, exterior: np.ndarray, holes: list[np.ndarray] | None = None
) -> np.ndarray:
    """Point-in-polygon with optional interior rings (holes subtract)."""
    res = points_in_ring(px, py, exterior)
    for h in holes or []:
        res &= ~points_in_ring(px, py, h)
    return res


def ring_area2(ring: np.ndarray) -> float:
    """Twice the signed shoelace area of a ring in grid units^2 (CCW > 0)."""
    x = np.asarray(ring[:, 0], np.float64)
    y = np.asarray(ring[:, 1], np.float64)
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polyline_length(xs: np.ndarray, ys: np.ndarray) -> float:
    """Euclidean length in grid units (callers apply Mercator scale)."""
    dx = np.diff(np.asarray(xs, np.float64))
    dy = np.diff(np.asarray(ys, np.float64))
    return float(np.sum(np.sqrt(dx * dx + dy * dy)))


def bbox_intersects(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy):
    """Vectorized bbox-overlap predicate (the tile/R-tree prune step,
    compiler/SIndexTree.java:361-425 analogue)."""
    return (
        (np.asarray(aminx) <= np.asarray(bmaxx))
        & (np.asarray(amaxx) >= np.asarray(bminx))
        & (np.asarray(aminy) <= np.asarray(bmaxy))
        & (np.asarray(amaxy) >= np.asarray(bminy))
    )
