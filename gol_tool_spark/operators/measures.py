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


EARTH_CIRCUMFERENCE = 40075016.68557849
GRID = 4294967296.0

#: query/Unit.java:11-18 — (length factor m->unit, area factor m^2->unit^2)
UNITS = {
    "m": (1.0, 1.0),
    "km": (0.001, 0.000001),
    "mi": (0.0006213711922373339, 3.861021585424458e-7),
    "ft": (3.28084, 10.76391),
    "yd": (1.093613, 1.19599),
    "ha": (1.0, 0.0001),   # length defaults to metres (Unit.java comment)
    "ac": (1.0, 2.471053814671653e-4),
}


def to_unit(col: Column, unit: str, area: bool = False) -> Column:
    """Unit conversion (query/Unit.java): metres (or m^2) -> unit."""
    return col * F.lit(UNITS[unit][1 if area else 0])


def mercator_scale_col(y: Column) -> Column:
    """Metres per grid unit at grid-y (cos(lat) correction) — the Column
    twin of kernels/mercator.mercator_scale, written with the exact same
    operation order so DuckDB reproduces it bit-for-bit:
    cos(atan(sinh(v))) * C / 2^32, sinh(v) = (e^v - e^-v)/2."""
    v = y.cast("double") / GRID * (2.0 * 3.141592653589793)
    lat = F.atan((F.exp(v) - F.exp(-v)) / 2.0)
    return F.cos(lat) * EARTH_CIRCUMFERENCE / GRID


def ring_area2_exact(coords: Column) -> Column:
    """Twice the signed shoelace area in grid units^2 as decimal(38,0) —
    EXACT integer math (x*y products exceed 2^53, so doubles lose bits;
    decimal(38,0) in Spark == HUGEINT sums in DuckDB), making area tallies
    cross-engine hashable after one final cast."""
    n = F.size(coords)
    idx = F.sequence(F.lit(0), n - 1)
    d19, d38 = "decimal(19,0)", "decimal(38,0)"
    agg = F.aggregate(
        F.transform(
            idx,
            lambda i: (
                F.element_at(coords, i + 1)["x"].cast(d19)
                * F.element_at(coords, (i + 1) % n + 1)["y"].cast(d19)
                - F.element_at(coords, (i + 1) % n + 1)["x"].cast(d19)
                * F.element_at(coords, i + 1)["y"].cast(d19)
            ).cast(d38),
        ),
        F.lit(0).cast(d38),
        lambda acc, v: acc + v,
    )
    return F.when(n > 0, agg).otherwise(F.lit(0).cast(d38))


def area_m2(coords: Column) -> Column:
    """D6 tally=area: ring area in m^2 — |shoelace|/2 on the Mercator plane
    x scale^2 at the ring's midpoint latitude (the reference measures on
    the projected plane and corrects by latitude,
    query/StatsFeaturePrinter.java:397-420)."""
    big = F.lit(1 << 31).cast("bigint")
    miny = F.aggregate(coords, big, lambda a, c: F.least(a, c["y"].cast("bigint")))
    maxy = F.aggregate(coords, -big, lambda a, c: F.greatest(a, c["y"].cast("bigint")))
    ymid = (miny + maxy).cast("double") / 2.0
    scale = mercator_scale_col(ymid)
    return F.abs(ring_area2_exact(coords).cast("double")) / 2.0 * scale * scale


def length_m(coords: Column) -> Column:
    """Way length in metres: Euclidean grid length x scale at the way's
    midpoint latitude (same correction as area_m2)."""
    big = F.lit(1 << 31).cast("bigint")
    miny = F.aggregate(coords, big, lambda a, c: F.least(a, c["y"].cast("bigint")))
    maxy = F.aggregate(coords, -big, lambda a, c: F.greatest(a, c["y"].cast("bigint")))
    ymid = (miny + maxy).cast("double") / 2.0
    return euclidean_length(coords) * mercator_scale_col(ymid)


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


def ring_centroid(coords: Column) -> tuple[Column, Column]:
    """Shoelace-weighted polygon centroid of a closed ring (grid units):
    Cx = x0 + sum((dx_i + dx_j) * cross_ij) / (3 * A2), j = wrap-next,
    with dx/dy relative to the ring's FIRST point and every product/sum
    carried in DECIMAL(38,0) — EXACT integer arithmetic (|terms| < 1e29
    at full grid spread), so float rounding (and FMA contraction, which
    made a float version diverge from DuckDB by 1 ulp on cancellation-
    heavy bowtie rings) never enters until one final double division
    that any IEEE engine reproduces bit-for-bit.  NULL for degenerate
    rings (A2 = 0) or n < 3."""
    n = F.size(coords)
    idx = F.sequence(F.lit(0), n - 1)
    x0 = F.element_at(coords, 1)["x"]
    y0 = F.element_at(coords, 1)["y"]
    dec = "decimal(38,0)"

    def _dx(i):  # i is the 1-based element index expression
        return (F.element_at(coords, i)["x"] - x0).cast(dec)

    def _dy(i):
        return (F.element_at(coords, i)["y"] - y0).cast(dec)

    def _cross(i):  # i is the 0-based fold index
        return _dx(i + 1) * _dy((i + 1) % n + 1) - _dx((i + 1) % n + 1) * _dy(i + 1)

    def _fold(term):
        return F.aggregate(
            F.transform(idx, term), F.lit(0).cast(dec), lambda a, v: a + v
        )

    a2 = _fold(_cross)
    sx = _fold(lambda i: (_dx(i + 1) + _dx((i + 1) % n + 1)) * _cross(i))
    sy = _fold(lambda i: (_dy(i + 1) + _dy((i + 1) % n + 1)) * _cross(i))
    ok = (n >= 3) & (a2 != F.lit(0).cast(dec))
    cx = x0.cast("double") + sx.cast("double") / (F.lit(3.0) * a2.cast("double"))
    cy = y0.cast("double") + sy.cast("double") / (F.lit(3.0) * a2.cast("double"))
    return (F.when(ok, cx).otherwise(F.lit(None)), F.when(ok, cy).otherwise(F.lit(None)))


def way_centroids(membership: DataFrame, points: DataFrame) -> DataFrame:
    """Per-way shoelace centroid for CLOSED ways (the label-anchor /
    feature-point computation a renderer or geocoder runs over every
    polygon): (way_id, n_nodes, cx_r, cy_r) with centroids rounded to
    1e-2 grid units.  One shuffle (the assemble groupBy); the fold is
    whole-stage codegen over the per-way coord arrays."""
    coords = assemble_coords(membership, points)
    first = F.element_at("coords", 1)
    last = F.element_at("coords", F.size("coords"))
    closed = (
        (first["x"] == last["x"]) & (first["y"] == last["y"]) & (F.size("coords") > 2)
    )
    cx, cy = ring_centroid(F.col("coords"))
    # centi-grid-unit quantization (round(x*100)::bigint): the round
    # decision happens on one exact double in BOTH engines — fractional
    # round(x, 2) differs at scaling boundaries (DuckDB scales in float,
    # Spark in BigDecimal), which cost one row in the 9.7k-ring gate
    return (
        coords.filter(closed)
        .select(
            "way_id",
            F.size("coords").alias("n_nodes"),
            F.round(cx * 100).cast("bigint").alias("cx_c"),
            F.round(cy * 100).cast("bigint").alias("cy_c"),
        )
        .filter(F.col("cx_c").isNotNull())
    )


def simplify_ways(
    membership: DataFrame,
    points: DataFrame,
    tolerance: float,
) -> DataFrame:
    """Douglas-Peucker polyline simplification per way (grid units): the
    geometry-reduction stage of tile export — a zoom-z tile only needs
    vertices that deviate more than a pixel's worth of grid units.

    Plan shape: the assemble groupBy is the only shuffle; the DP pass is
    an Arrow-batched pandas UDF over each row's coord ARRAY (one row per
    way — never a per-vertex Python loop boundary), returning the kept
    1-based positions; the actual slicing stays JVM-side (higher-order
    filter on the original array).  Not SQL-expressible (recursive
    split), so this ships with a brute-force python twin test instead of
    a DuckDB oracle.  Kernel: kernels/geometry.dp_keep_mask."""
    import pandas as pd

    from ..kernels import geometry as G

    def _dp_fn(xs_col, ys_col, tol):
        import numpy as np

        # xs/ys arrive as Arrow list<int64> -> numpy arrays per row: no
        # per-vertex struct/dict access on the Python side (guide §4.2 —
        # only the columns the kernel needs cross the boundary, already
        # in vectorizable form)
        out = []
        for xs, ys, t in zip(xs_col, ys_col, tol):
            mask = G.dp_keep_mask(np.asarray(xs, dtype=np.int64),
                                  np.asarray(ys, dtype=np.int64), float(t))
            out.append((np.nonzero(mask)[0] + 1).astype("int32").tolist())
        return pd.Series(out)

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't infer — set real ones at runtime (tiling.py pattern)
    _dp_fn.__annotations__ = {c: pd.Series for c in ("xs_col", "ys_col", "tol", "return")}
    _dp_keep = F.pandas_udf(_dp_fn, "array<int>")

    coords = assemble_coords(membership, points)
    kept = coords.withColumn(
        "keep_idx",
        _dp_keep(F.col("coords.x"), F.col("coords.y"), F.lit(tolerance)),
    )
    pos = F.transform("coords", lambda c, i: c.withField("pos", i + 1))
    return kept.select(
        "way_id",
        F.size("coords").alias("n_in"),
        F.size("keep_idx").alias("n_kept"),
        F.transform(
            F.filter(pos, lambda c: F.array_contains("keep_idx", c["pos"])),
            lambda c: c.dropFields("pos"),
        ).alias("coords_simplified"),
    )


def convex_hulls(membership: DataFrame, points: DataFrame) -> DataFrame:
    """Convex hull per way — the footprint-summary stage (coverage
    envelopes, label placement, collision prebounds).

    Same plan shape as simplify_ways: the assemble groupBy is the only
    shuffle; the hull pass is an Arrow-batched pandas UDF returning
    1-based input positions in CCW hull order (exact big-int turn tests
    — full-plane int32 cross products exceed int64, so the kernel stays
    in Python integers; ways are bounded-size so the per-way loop is the
    same boundary class as rings.py stitching); the slicing back to
    coord structs stays JVM-side.  Not SQL-expressible — ships with
    gift-wrapping twin + invariant pytests instead of a DuckDB oracle.
    Kernel: kernels/geometry.hull_positions.
    """
    import pandas as pd

    from ..kernels import geometry as G

    def _hull_fn(xs_col, ys_col):
        import numpy as np

        out = []
        for xs, ys in zip(xs_col, ys_col):
            # .tolist() yields exact Python ints — the kernel's turn
            # tests exceed int64 on full-plane coords, so numpy scalars
            # (which would wrap silently) must not leak in
            out.append(G.hull_positions(
                np.asarray(xs).tolist(), np.asarray(ys).tolist()))
        return pd.Series(out)

    _hull_fn.__annotations__ = {c: pd.Series for c in ("xs_col", "ys_col", "return")}
    _hull = F.pandas_udf(_hull_fn, "array<int>")

    coords = assemble_coords(membership, points)
    kept = coords.withColumn("hull_idx", _hull(F.col("coords.x"), F.col("coords.y")))
    return kept.select(
        "way_id",
        F.size("coords").alias("n_in"),
        F.size("hull_idx").alias("n_hull"),
        F.transform("hull_idx", lambda i: F.element_at("coords", i)).alias("hull"),
    )


def way_diameter(membership: DataFrame, points: DataFrame) -> DataFrame:
    """Exact diameter (max pairwise squared L2 distance) per way — the
    footprint-extent measure behind label sizing, generalization cutoffs
    and "is this feature too large for its zoom" validation (the measure
    the reference derives from tile spread, reference
    gol-tool/query/Stats spread analogue, computed exactly here).

    Semantics: over DISTINCT resolved member nodes (duplicate memberships
    of one node contribute nothing to extent); ways with fewer than two
    distinct resolved nodes have no diameter and emit no row.  diam2 is
    the exact squared distance in DECIMAL(38,0) rendered as a string —
    full-plane int32 deltas square past int64, and doubles would round.

    Plan: one equi-join resolves refs (shuffle on node id), one
    self-equi-join on way_id forms the bounded per-way pairs (ways are
    small by data contract — the reference caps member fan-in the same
    way), one map-combined groupBy.  No Python, no crossJoin.
    """
    pts = points.select(F.col("id").alias("node_ref"), "x", "y")
    res = (
        membership.join(pts, "node_ref", "inner")
        .select("way_id", "node_ref", "x", "y")
        .dropDuplicates(["way_id", "node_ref"])
    )
    a = res.select(
        F.col("way_id"),
        F.col("node_ref").alias("_ra"),
        F.col("x").alias("_xa"),
        F.col("y").alias("_ya"),
    )
    b = res.select(
        F.col("way_id"),
        F.col("node_ref").alias("_rb"),
        F.col("x").alias("_xb"),
        F.col("y").alias("_yb"),
    )
    d = lambda c: c.cast("decimal(38,0)")
    dx = d(F.col("_xa")) - d(F.col("_xb"))
    dy = d(F.col("_ya")) - d(F.col("_yb"))
    pairs = a.join(b, "way_id").filter(F.col("_ra") < F.col("_rb"))
    diam = pairs.groupBy("way_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max(dx * dx + dy * dy).alias("_d2"),
    )
    n_nodes = res.groupBy("way_id").agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        diam.join(n_nodes, "way_id")
        .select(
            "way_id",
            "n_nodes",
            "n_pairs",
            F.col("_d2").cast("string").alias("diam2"),
        )
    )


def _dec_floordiv(a: Column, b: Column) -> Column:
    """floor(a / b) for DECIMAL(38,0) a and POSITIVE b, exactly: pmod
    keeps the remainder non-negative, so (a - pmod) is exactly divisible
    and the decimal division is lossless.  (A plain `a DIV b` on
    decimals silently truncates through int64 — measured, it corrupts
    23-digit dividends.)"""
    d = lambda c: c.cast("decimal(38,0)")
    return ((d(a) - F.pmod(d(a), d(b))) / d(b)).cast("decimal(38,0)")


def way_resample(
    membership: DataFrame, points: DataFrame, n_samples: int = 8
) -> DataFrame:
    """Exact arc-length resampling per way: n_samples points evenly
    spaced along the polyline's L1 length — the fixed-size geometry
    signature renderers and trajectory/shape-ML pipelines want (every
    way becomes the same-length vector regardless of vertex count).

    All integer math: sample k (0..n-1) sits at distance
    d_k = floor(k * L / (n-1)) along the chain (L = total L1 length);
    within its segment the coordinate interpolates by exact floor
    division, so endpoints land on the first/last vertex bit-for-bit.
    Zero-length segments and L = 0 ways degenerate to the segment start
    (guarded, no division by zero).  Ways with < 2 resolved nodes emit
    nothing.

    Returns (way_id, k, sx, sy).

    Plan: the assemble groupBy is the only shuffle; segment lengths,
    the prefix-sum array, the per-sample segment search (a bounded
    array filter — way sizes are bounded, same contract as the ring
    folds) and the interpolation are all whole-stage-codegen array
    expressions; the k-explode fans out n_samples rows per way.
    Products reach |dx| * len ~ 2^66, so interpolation runs in
    DECIMAL(38,0) via the exact pmod floor-division.
    """
    if n_samples < 2:
        raise ValueError("n_samples must be >= 2")
    K = n_samples - 1
    coords = assemble_coords(membership, points).filter(F.size("coords") >= 2)
    C = F.col("coords")
    seg_idx = F.sequence(F.lit(1), F.size(C) - 1)
    lens = F.transform(
        seg_idx,
        lambda i: (
            F.abs(
                F.element_at(C, (i + 1).cast("int"))["x"]
                - F.element_at(C, i.cast("int"))["x"]
            )
            + F.abs(
                F.element_at(C, (i + 1).cast("int"))["y"]
                - F.element_at(C, i.cast("int"))["y"]
            )
        ).cast("bigint"),
    )
    # cums[j] = length before segment j (1-based): [0, len1, len1+len2, ...]
    cums = F.aggregate(
        F.col("_lens"),
        F.array(F.lit(0).cast("bigint")),
        lambda acc, v: F.concat(acc, F.array(F.element_at(acc, -1) + v)),
    )
    d = (
        coords.withColumn("_lens", lens)
        .withColumn("_cums", cums)
        .withColumn("_L", F.element_at("_cums", -1))
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(K))))
    )
    dk = F.expr(f"(k * _L) DIV {K}")  # k*L <= n_samples * 2^35: int64-safe
    d = d.withColumn("_dk", dk)
    # segment pick: count prefix sums strictly below d_k, clamped
    c = F.size(F.filter(F.col("_cums"), lambda v: v < F.col("_dk")))
    seg = F.greatest(F.lit(1), F.least(F.size(C) - 1, c))
    d = d.withColumn("_i", seg.cast("int"))
    x0 = F.element_at(C, F.col("_i"))["x"]
    y0 = F.element_at(C, F.col("_i"))["y"]
    x1 = F.element_at(C, F.col("_i") + 1)["x"]
    y1 = F.element_at(C, F.col("_i") + 1)["y"]
    ln = F.element_at(F.col("_lens"), F.col("_i"))
    off = F.col("_dk") - F.element_at(F.col("_cums"), F.col("_i"))
    dd = lambda col: col.cast("decimal(38,0)")
    interp = lambda a0, a1: F.when(ln == 0, a0).otherwise(
        (dd(a0) + _dec_floordiv(dd(a1 - a0) * dd(off), dd(ln))).cast("bigint")
    )
    return d.select(
        "way_id", F.col("k").cast("int").alias("k"),
        interp(x0, x1).alias("sx"), interp(y0, y1).alias("sy"),
    )
