"""Tile math on the int32 Mercator grid — packed tile ids and tile quads.

Capability parity: the reference partitions the world into a quad pyramid of
square tiles at zooms 0-12, packs (zoom,col,row) into an int
(build/TileCatalog.java:37-71, 201-228) and represents the 1/2/4-sibling-tile
footprint of multi-tile features as a packed "tile quad"
(build/Sorter.java:465-475, build/TileCatalog.java:230-306).  Packing layout
here is our own (the lib's exact bit layout is not in the reference repo):

    tile id  (int32): zoom<<24 | row<<12 | col          (zoom<=12 -> 12-bit row/col)
    quad     (int32): mask<<28 | zoom<<24 | row<<12 | col
        (row,col) = NW anchor of the aligned 2x2 sibling block (even row/col),
        mask bit0=NW bit1=NE bit2=SW bit3=SE marks occupied siblings.

Row 0 is the NORTH edge (y = MAX) so row grows south, matching slippy-map
convention.  All functions are vectorized numpy int64 ops, usable directly
and from pandas UDFs; the same arithmetic is mirrored as Spark Column
expressions in functions/spatial.py (kept JVM-side for speed) — unit tests
assert the two agree.
"""

from __future__ import annotations

import numpy as np

MAX_ZOOM = 12


def tile_col(x: np.ndarray, zoom: int) -> np.ndarray:
    """Column of the zoom-z tile containing grid x (int32, signed)."""
    return (np.asarray(x, np.int64) + (1 << 31)) >> (32 - zoom) if zoom else np.zeros_like(np.asarray(x, np.int64))


def tile_row(y: np.ndarray, zoom: int) -> np.ndarray:
    """Row of the zoom-z tile containing grid y; row 0 at the north edge."""
    return (((1 << 31) - 1) - np.asarray(y, np.int64)) >> (32 - zoom) if zoom else np.zeros_like(np.asarray(y, np.int64))


def parse_tile_spec(spec: str) -> int:
    """'z/x/y' tile spec -> packed tile id (Tile.fromString parity;
    GolCommand.java:66-81 accepts this form for -b)."""
    parts = spec.split("/")
    if len(parts) != 3:
        raise ValueError(f"{spec!r} is not a valid z/x/y tile spec")
    z, col, row = (int(p) for p in parts)
    if not (0 <= z <= 12 and 0 <= col < (1 << z) and 0 <= row < (1 << z)):
        raise ValueError(f"{spec!r} is not a valid tile")
    return int(pack(z, row, col))


def tile_bounds(tile: int) -> tuple[int, int, int, int]:
    """Packed tile id -> inclusive grid bbox (W, S, E, N) — Tile.bounds
    parity (row 0 at the north edge)."""
    z, r, c = (int(v) for v in unpack(tile))
    size = 1 << (32 - z)
    minx = c * size - (1 << 31)
    maxy = ((1 << 31) - 1) - r * size
    return minx, maxy - size + 1, minx + size - 1, maxy


def pack(zoom, row, col) -> np.ndarray:
    return (np.asarray(zoom, np.int64) << 24) | (np.asarray(row, np.int64) << 12) | np.asarray(col, np.int64)


def unpack(tile) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    t = np.asarray(tile, np.int64)
    return t >> 24, (t >> 12) & 0xFFF, t & 0xFFF


def tile_of_point(x, y, zoom: int) -> np.ndarray:
    """Reference C1: assign a node to the leaf tile containing (x,y)
    (build/Sorter.java:362-383 point-in-quadtree-cell lookup)."""
    return pack(zoom, tile_row(y, zoom), tile_col(x, zoom))


def zoomed_out(tile, to_zoom: int) -> np.ndarray:
    """Parent tile at a coarser zoom (Tile.zoomedOut, TileCatalog.java:225-228)."""
    z, r, c = unpack(tile)
    dz = z - to_zoom
    if np.any(dz < 0):
        raise ValueError("zoomed_out target must be <= tile zoom")
    return pack(to_zoom, r >> dz, c >> dz)


# ---------------------------------------------------------------- tile quads

def quad_from_bbox(minx, miny, maxx, maxy, zoom: int = MAX_ZOOM) -> np.ndarray:
    """Tile quad covering a bbox: zoom out until the bbox fits one aligned
    2x2 sibling block, then mark occupied siblings (reference semantics of
    TileQuad.addPoint/addBbox + zoomedOut, build/Sorter.java:465-475;
    validateTileQuad zoom-down rules, build/TileCatalog.java:260-306).

    Vectorized over bbox arrays; returns packed quad int64 array.
    """
    minx = np.asarray(minx, np.int64)
    miny = np.asarray(miny, np.int64)
    maxx = np.asarray(maxx, np.int64)
    maxy = np.asarray(maxy, np.int64)
    n = np.broadcast(minx, miny, maxx, maxy).shape
    out = np.zeros(n, np.int64)
    zoom_arr = np.full(n, zoom, np.int64)
    c0 = tile_col(minx, zoom)
    c1 = tile_col(maxx, zoom)
    # note: row of max-y is the NORTH (smaller) row
    r0 = tile_row(maxy, zoom)
    r1 = tile_row(miny, zoom)
    # zoom out until col and row ranges each fit an aligned sibling pair
    for _ in range(zoom):
        fits = ((c0 >> 1) == (c1 >> 1)) & ((r0 >> 1) == (r1 >> 1))
        if fits.all():
            break
        c0 = np.where(fits, c0, c0 >> 1)
        c1 = np.where(fits, c1, c1 >> 1)
        r0 = np.where(fits, r0, r0 >> 1)
        r1 = np.where(fits, r1, r1 >> 1)
        zoom_arr = np.where(fits, zoom_arr, zoom_arr - 1)
    anchor_c = (c0 >> 1) << 1
    anchor_r = (r0 >> 1) << 1
    mask = np.zeros(n, np.int64)
    for rr in (0, 1):
        for cc in (0, 1):
            tc, tr = anchor_c + cc, anchor_r + rr
            occupied = (c0 <= tc) & (tc <= c1) & (r0 <= tr) & (tr <= r1)
            mask |= occupied.astype(np.int64) << (rr * 2 + cc)
    return (mask << 28) | (zoom_arr << 24) | (anchor_r << 12) | anchor_c


def quad_tiles(quad: int) -> list[int]:
    """Expand one packed quad to its member tile ids (scalar helper)."""
    q = int(quad)
    mask, z, r, c = q >> 28, (q >> 24) & 0xF, (q >> 12) & 0xFFF, q & 0xFFF
    tiles = []
    for bit in range(4):
        if mask & (1 << bit):
            tiles.append(int(pack(z, r + bit // 2, c + bit % 2)))
    return tiles


def quad_piles(quad: int, pile_zoom: int = 3) -> list[int]:
    """Distinct pile (zoom-`pile_zoom` tile) ids covered by a packed quad's
    member tiles — the <=4-pile replication target of quad placement
    (build/Sorter.java:718-802 writes a relation into each quad tile;
    mapped onto the flat zoom-3 pile store).  Quads coarser than the pile
    zoom expand to every descendant pile of each member tile."""
    piles: set[int] = set()
    for t in quad_tiles(quad):
        z, r, c = (int(v) for v in unpack(np.int64(t)))
        if z >= pile_zoom:
            piles.add(int(pack(pile_zoom, r >> (z - pile_zoom), c >> (z - pile_zoom))))
        else:
            dz = pile_zoom - z
            for rr in range(1 << dz):
                for cc in range(1 << dz):
                    piles.add(int(pack(pile_zoom, (r << dz) + rr, (c << dz) + cc)))
    return sorted(piles)


def quad_union(qa: int, qb: int) -> int:
    """Union of two quads (TileQuad.addQuad): zoom both out to a common zoom
    where the combined footprint fits one sibling block."""
    ta, tb = quad_tiles(qa), quad_tiles(qb)
    xs, ys = [], []
    for t in ta + tb:
        z, r, c = unpack(np.int64(t))
        size = np.int64(1) << (32 - int(z))
        minx = (np.int64(c) << (32 - int(z))) - (np.int64(1) << 31)
        maxy = ((np.int64(1) << 31) - 1) - (np.int64(r) << (32 - int(z)))
        xs += [int(minx), int(minx + size - 1)]
        ys += [int(maxy - size + 1), int(maxy)]
    za = (qa >> 24) & 0xF
    zb = (qb >> 24) & 0xF
    return int(quad_from_bbox(min(xs), min(ys), max(xs), max(ys), min(za, zb)))


def _spread16(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, np.int64) & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def morton_cell(x, y, zoom: int = 16) -> np.ndarray:
    """Z-order cell id (numpy twin of functions/spatial.morton_cell)."""
    c = tile_col(x, zoom)
    r = tile_row(y, zoom)
    return (_spread16(r) << 1) + _spread16(c)


def hilbert_d(x, y, zoom: int = 16) -> np.ndarray:
    """Hilbert-curve distance of the zoom-z cell containing (x, y) —
    the locality key with better neighbor preservation than Morton
    (adjacent curve positions are always adjacent cells). Vectorized
    iterative xy->d (the classic quadrant-fold algorithm). Foundation for
    a round-2 compile-layout upgrade; Morton stays the JVM-side default
    because Hilbert's data-dependent rotations don't reduce to a few
    codegen-friendly bit ops."""
    cx = tile_col(x, zoom).astype(np.int64)
    # Hilbert operates on a y-up grid; tile_row is y-down — flip
    cy = ((1 << zoom) - 1) - tile_row(y, zoom).astype(np.int64)
    d = np.zeros_like(cx)
    s = np.int64(1 << (zoom - 1))
    rx = np.zeros_like(cx)
    ry = np.zeros_like(cy)
    while s > 0:
        rx = ((cx & s) > 0).astype(np.int64)
        ry = ((cy & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        cx_f = np.where(flip, s - 1 - cx, cx)
        cy_f = np.where(flip, s - 1 - cy, cy)
        cx_new = np.where(swap, cy_f, cx_f)
        cy_new = np.where(swap, cx_f, cy_f)
        cx, cy = cx_new, cy_new
        s >>= 1
    return d
