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


def _cross(ax, ay, bx, by, px, py, exact_int64: bool):
    """Orientation cross product (b-a) x (p-a) — exact.

    When both segments of a candidate pair touch the same cover cell and
    extents are < the cell width W = 2^shift, every endpoint difference
    here is bounded by 3W, so the products are < 3W * W and the result
    fits int64 for shift <= 30: plain bigint arithmetic is bit-exact and
    runs in whole-stage codegen an order of magnitude faster than the
    interpreted DECIMAL(38,0) path, which stays as the wide-cell
    fallback.  Only the SIGN is consumed, and both lanes compute the
    identical exact integer."""
    d = (lambda c: c) if exact_int64 else (lambda c: c.cast("decimal(38,0)"))
    return (d(bx) - d(ax)) * (d(py) - d(ay)) - (d(by) - d(ay)) * (d(px) - d(ax))


def segment_intersections(segs: DataFrame, cell_shift: int = CELL_SHIFT) -> DataFrame:
    """All pairs (seg_a < seg_b) that properly cross.  Returns
    (seg_a, seg_b) exactly once per crossing pair.

    Dedup is the reference-cell trick (no dropDuplicates shuffle on the
    pair set): a pair sharing several cover cells is emitted only from
    the lexicographically smallest COMMON cover cell — each side's cover
    set is a contiguous <= 2x2 cell rectangle, so the common set is the
    rectangle intersection and its lower corner is componentwise
    max(min_a, min_b), computable in codegen from the endpoints already
    on the row."""
    # both self-join sides are the SAME cover relation — materialize it
    # once (lazy localCheckpoint) instead of re-running the upstream
    # scan/aggregate/explode per side; the cover set is |segs| * <=4
    # slim rows, far cheaper to hold than to recompute
    cov = _cover_cells(segs, cell_shift).select(
        "seg", "x1", "y1", "x2", "y2", "_cx", "_cy"
    ).localCheckpoint(eager=False)
    a = cov.select(
        F.col("seg").alias("seg_a"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"), F.col("y2").alias("ay2"),
        "_cx", "_cy",
    )
    b = cov.select(
        F.col("seg").alias("seg_b"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"), F.col("y2").alias("by2"),
        "_cx", "_cy",
    )
    # force a SHUFFLE join on the cell key: the planner's broadcast pick
    # funnels every dense hot cell's candidate explosion into whichever
    # few tasks scan those cells, and a broadcast join is invisible to
    # AQE skew-splitting; the shuffle join spreads cells across
    # partitions and lets AQE split the hot ones (measured 3.7x on the
    # clustered fixture) — and it IS the plan shape a planet-scale
    # input gets, where neither side fits a broadcast anyway.
    cand = a.hint("shuffle_merge").join(b, ["_cx", "_cy"]).filter(F.col("seg_a") < F.col("seg_b"))
    cell = lambda c: F.shiftright(F.col(c) + BIAS, cell_shift)
    ref = (
        F.col("_cx") == F.greatest(F.least(cell("ax1"), cell("ax2")),
                                   F.least(cell("bx1"), cell("bx2")))
    ) & (
        F.col("_cy") == F.greatest(F.least(cell("ay1"), cell("ay2")),
                                   F.least(cell("by1"), cell("by2")))
    )
    exact = cell_shift <= 30  # 3W*W products stay under 2^63 — see _cross
    d1 = _cross(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"), F.col("bx1"), F.col("by1"), exact)
    d2 = _cross(F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2"), F.col("bx2"), F.col("by2"), exact)
    d3 = _cross(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"), F.col("ax1"), F.col("ay1"), exact)
    d4 = _cross(F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2"), F.col("ax2"), F.col("ay2"), exact)
    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )
    return cand.filter(ref & proper).select("seg_a", "seg_b")


def snap_points(
    points: DataFrame, segs: DataFrame, cell_shift: int = CELL_SHIFT
) -> DataFrame:
    """Map matching: snap each point to its nearest segment within one
    cell width (2^cell_shift map units).

    Candidates come from the same grid blocking as the crossing join —
    each point probes the 3x3 cell ring around its own cell, each
    segment sits in its (<= 4) bbox cover cells; because segment extent
    < cell width, every point of a segment lies inside a cover cell, so
    any segment within one cell width of the query point is guaranteed
    to share a ring cell (exact recall, no range explode).

    Distance is the classic clamped-projection point-to-segment form
    with a fixed IEEE evaluation order: the dot product and squared
    length are EXACT 64-bit integers (extent < 2^16, ring offset <
    2^18), the division/clamp/mults run in doubles in the same order as
    the DuckDB twin — bit-reproducible across engines.  Ties on d2
    break to the smallest segment id (lexicographic (d2, seg) min; the
    SQL twin spells it as min-d2-then-min-seg, which is the same order
    without relying on cross-engine struct-comparison semantics).

    Returns (id, seg, d2) — one row per point that has a segment within
    range; d2 is the squared distance in map units (double).

    Scale: shuffle carries (cell, point) x9 and (cell, segment) x<=4;
    per-cell candidate volume is density-bounded; the min-aggregations
    are map-combined on the point key.  No Python, no crossJoin.
    """
    ring = F.explode(F.array([F.lit(d) for d in (-1, 0, 1)]))
    pcx = F.shiftright(F.col("x").cast("bigint") + BIAS, cell_shift)
    pcy = F.shiftright(F.col("y").cast("bigint") + BIAS, cell_shift)
    p = (
        points.select(
            F.col("id"),
            F.col("x").cast("bigint").alias("px"),
            F.col("y").cast("bigint").alias("py"),
            pcx.alias("_bx"), pcy.alias("_by"),
        )
        .withColumn("_dx", ring)
        .withColumn("_dy", ring)
        .select(
            "id", "px", "py",
            (F.col("_bx") + F.col("_dx")).alias("_cx"),
            (F.col("_by") + F.col("_dy")).alias("_cy"),
        )
    )
    s = _cover_cells(segs, cell_shift).select("seg", "x1", "y1", "x2", "y2", "_cx", "_cy")
    # shuffle join on the cell key (not broadcast): dense cells are the
    # skew AQE must be able to split — see segment_intersections
    cand = p.hint("shuffle_merge").join(s, ["_cx", "_cy"])
    # reference-cell dedup BEFORE the distance math: a (point, segment)
    # pair meets once per cell of ring(p) ∩ cover(s) (both contiguous
    # cell rectangles, so the intersection is a rectangle) — keep only
    # the min-corner cell's row.  Candidates drop ~2.2x and only unique
    # pairs pay the projection arithmetic; the struct-min then sees one
    # row per pair (duplicates carried identical d2, so the result is
    # unchanged).
    cell = lambda c: F.shiftright(F.col(c) + BIAS, cell_shift)
    cand = cand.filter(
        (F.col("_cx") == F.greatest(F.shiftright(F.col("px") + BIAS, cell_shift) - 1,
                                    F.least(cell("x1"), cell("x2"))))
        & (F.col("_cy") == F.greatest(F.shiftright(F.col("py") + BIAS, cell_shift) - 1,
                                      F.least(cell("y1"), cell("y2"))))
    )
    dxs = F.col("x2") - F.col("x1")
    dys = F.col("y2") - F.col("y1")
    rx = F.col("px") - F.col("x1")
    ry = F.col("py") - F.col("y1")
    num = dxs * rx + dys * ry  # exact bigint
    den = dxs * dxs + dys * dys  # exact bigint, >= 1 (no degenerate segs)
    t = F.least(F.greatest(num.cast("double") / den.cast("double"), F.lit(0.0)), F.lit(1.0))
    ddx = rx.cast("double") - t * dxs.cast("double")
    ddy = ry.cast("double") - t * dys.cast("double")
    d2 = (ddx * ddx + ddy * ddy).alias("d2")
    r2 = float((1 << cell_shift) ** 2)
    scored = cand.select("id", "seg", d2).filter(F.col("d2") <= F.lit(r2))
    # ONE map-combined aggregation: lexicographic struct min == min d2
    # then min seg on ties (a min-then-join-back draft evaluated the
    # candidate subtree twice; the SQL oracle keeps that two-step form —
    # same result, clearer SQL)
    best = scored.groupBy("id").agg(F.min(F.struct("d2", "seg")).alias("_m"))
    return best.select("id", F.col("_m.seg").alias("seg"), F.col("_m.d2").alias("d2"))


def raster_cover(segs: DataFrame, cell_shift: int = 12) -> DataFrame:
    """Vector->raster: the DDA cell trace of each segment — the line-
    rasterization stage of any tile renderer / coverage-grid builder
    (the raster twin of the point-based density_raster: density counts
    POINT hits, this walks LINES across the grid).

    Sampled-DDA spec (deterministic, engine-exact): with X = x + BIAS
    (strictly non-negative, so truncating integer division == floor in
    every engine), n = max(|cell(X2) - cell(X1)|, |cell(Y2) - cell(Y1)|, 1)
    steps and samples t = 0..n at

        X_t = ((n - t) * X1 + t * X2) DIV n

    i.e. exact rational interpolation floored to map units; the sampled
    cell chain moves at most one cell per axis per step, covers both
    endpoint cells exactly, and is the classic DDA rasterization (a
    supercover variant would add corner-touch cells; this spec is the
    one the oracle reproduces verbatim).  Returns one row per segment:
    (seg, n_steps, n_cells, sum_cx, sum_cy) — the DISTINCT-cell count
    plus exact coordinate sums, pinning the cell set without exploding
    output rows.

    Scale: numerators stay under 2^40 for short segments (extent < 2^16
    here) and under 2^53 at planet extent for cell_shift >= 13 (n <=
    2^19, X < 2^33) — inside exact bigint range either way; the explode
    is bounded by the segment's own cell span, the per-segment
    distinct+agg is map-combined, and nothing joins — embarrassingly
    parallel.
    """
    cell = lambda c: F.shiftright(c, cell_shift)
    base = segs.select(
        "seg",
        (F.col("x1") + BIAS).alias("_X1"),
        (F.col("y1") + BIAS).alias("_Y1"),
        (F.col("x2") + BIAS).alias("_X2"),
        (F.col("y2") + BIAS).alias("_Y2"),
    ).withColumn(
        "_n",
        F.greatest(
            F.abs(cell(F.col("_X2")) - cell(F.col("_X1"))),
            F.abs(cell(F.col("_Y2")) - cell(F.col("_Y1"))),
            F.lit(1).cast("bigint"),
        ),
    )
    # Spark `a DIV b` = exact 64-bit integer division (truncating; both
    # operands non-negative here, so == floor == DuckDB //).
    # Two zero-/one-exchange variants were measured SLOWER than this
    # two-exchange plan at sf0.1 (r6 notes: per-row array_distinct+folds
    # 2.6s, packed-bigint collect_set 4.2s, vs 2.0s here — higher-order
    # array functions are CodegenFallback, so their per-row interpreted
    # cost exceeds the exchanges they save at this density; the exploded
    # dedup + groupBy stay whole-stage-codegen end to end).
    lerp = lambda a, b: F.expr(f"((_n - _t) * {a} + _t * {b}) DIV _n")
    cells = (
        base.withColumn("_t", F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_n"))))
        .select(
            "seg",
            "_n",
            cell(lerp("_X1", "_X2")).alias("cx"),
            cell(lerp("_Y1", "_Y2")).alias("cy"),
        )
        .dropDuplicates(["seg", "cx", "cy"])
    )
    return cells.groupBy("seg").agg(
        F.max("_n").alias("n_steps"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("cx").alias("sum_cx"),
        F.sum("cy").alias("sum_cy"),
    )


def crossing_components(
    segs: DataFrame, cell_shift: int = CELL_SHIFT, max_rounds: int = 50
) -> DataFrame:
    """Connected components of the proper-crossing graph — "which
    segments form one connected network": segment_intersections emits
    the crossing pairs (grid-blocked, exact big-int orientation tests),
    and the SAME alternating large-star/small-star CC engine that
    clusters near-dup documents (dedup.dup_clusters) contracts them to
    components in O(log n) rounds.  The road/rail/waterway connectivity
    question of network analysis, answered without ever materializing
    an all-pairs join.

    Returns (seg, comp) for EVERY input segment; comp = the smallest
    seg id reachable through crossings, so isolated segments are their
    own singleton component (LEFT join + coalesce, not an inner join
    that would silently drop them).
    """
    from gol_tool_spark.operators.dedup import dup_clusters

    pairs = segment_intersections(segs, cell_shift)
    comp = dup_clusters(pairs, a_col="seg_a", b_col="seg_b", max_rounds=max_rounds)
    comp = comp.select(F.col("doc_id").alias("seg"), "comp")
    return (
        segs.select("seg")
        .join(comp, "seg", "left")
        .select("seg", F.coalesce(F.col("comp"), F.col("seg")).alias("comp"))
    )


def crossing_triangles(segs: DataFrame, cell_shift: int = CELL_SHIFT) -> DataFrame:
    """Triangle census over the proper-crossing graph — for every segment
    in the graph, its crossing degree and the number of triangles
    (mutually-crossing triples) it participates in: the exact integer
    components of the local clustering coefficient (tri / C(deg, 2)),
    the standard "how mesh-like is this network here" statistic of
    network analysis (Watts & Strogatz 1998).

    Algorithm: compact-forward / degree ordering (Latapy 2008) — orient
    every crossing edge from the lower-rank endpoint by (degree, id),
    generate wedges only at each edge's SOURCE, and close them against
    the oriented edge set.  Ordering by degree (not id) is what makes
    this survive scale-up: a hub crossed by d segments generates wedges
    bounded by arboricity * m, not d^2 — under id-ordering one popular
    trunk line would quadratically explode.  Each triangle is generated
    exactly once (its rank-lowest corner is the wedge pivot).

    Returns (seg, deg, tri) for every segment with >= 1 crossing; tri is
    0 for nodes in no triangle (LEFT join, not inner).

    Plan: the segment_intersections pair chain, one map-combined degree
    groupBy, two broadcast-free equi-joins to attach endpoint degrees,
    one wedge self-join on the source key, one closing equi-join, one
    corner-explode groupBy.  deg/ed are localCheckpointed (each is read
    2-3 times downstream).  Never all-pairs.
    """
    pairs = segment_intersections(segs, cell_shift)
    # pin the symmetric edge list FIRST: deg and ed both derive from it,
    # and without the pin each downstream checkpoint re-executes the
    # whole crossing-pair chain while materializing (plan-audit finding)
    sym = (
        pairs.select(F.col("seg_a").alias("u"), F.col("seg_b").alias("v"))
        .unionAll(pairs.select(F.col("seg_b").alias("u"), F.col("seg_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    deg = (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .select(F.col("u").alias("seg"), "deg")
        .localCheckpoint(eager=True)
    )
    ed = (
        sym.join(deg.select(F.col("seg").alias("u"), F.col("deg").alias("_du")), "u")
        .join(deg.select(F.col("seg").alias("v"), F.col("deg").alias("_dv")), "v")
        .filter(
            (F.col("_du") < F.col("_dv"))
            | ((F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v", F.col("_dv").alias("dv"))
        .localCheckpoint(eager=True)
    )
    a, b = ed.alias("a"), ed.alias("b")
    wed = (
        a.join(b, F.col("a.u") == F.col("b.u"))
        .filter(
            (F.col("a.dv") < F.col("b.dv"))
            | ((F.col("a.dv") == F.col("b.dv")) & (F.col("a.v") < F.col("b.v")))
        )
        .select(
            F.col("a.u").alias("n1"), F.col("a.v").alias("n2"), F.col("b.v").alias("n3")
        )
    )
    tri = wed.join(
        ed.select(F.col("u").alias("n2"), F.col("v").alias("n3")), ["n2", "n3"]
    )
    corners = (
        tri.select(F.col("n1").alias("seg"))
        .unionAll(tri.select(F.col("n2").alias("seg")))
        .unionAll(tri.select(F.col("n3").alias("seg")))
    )
    tn = corners.groupBy("seg").agg(F.count(F.lit(1)).cast("bigint").alias("tri"))
    return deg.join(tn, "seg", "left").select(
        "seg", "deg", F.coalesce(F.col("tri"), F.lit(0)).cast("bigint").alias("tri")
    )


def crossing_kcore(
    segs: DataFrame, k: int = 3, max_rounds: int = 4, cell_shift: int = CELL_SHIFT
) -> DataFrame:
    """Bounded k-core peeling over the proper-crossing graph (Seidman
    1983) — iteratively remove segments with fewer than k surviving
    crossings; what remains after convergence is the k-core, the densely
    interwoven backbone of the network (the complement of the dangling
    tendrils CC and triangles both keep).

    Bounded semantics, same contract as flow_accumulation/max_rounds:
    exactly `max_rounds` peel rounds run; if the peel converges earlier
    the remaining rounds are no-ops (removing nothing is idempotent),
    and if it has not converged the result is the exact state after
    max_rounds peels — oracle-checkable either way.  Returns (seg, deg):
    surviving segments with their residual crossing degree.

    Plan: the pair chain once, then per round one map-combined degree
    groupBy + two semi-joins (u-side, v-side) against the >= k survivor
    set, localCheckpointed to cut lineage.  Work per round is O(live
    edges) and only shrinks; never all-pairs.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    pairs = segment_intersections(segs, cell_shift)
    alive = (
        pairs.select(F.col("seg_a").alias("u"), F.col("seg_b").alias("v"))
        .unionAll(pairs.select(F.col("seg_b").alias("u"), F.col("seg_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        keep = (
            alive.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= k)
            .select("u")
        )
        alive = (
            alive.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        alive.groupBy(F.col("u").alias("seg"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )


def crossing_hops(
    segs: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 3,
    cell_shift: int = CELL_SHIFT,
) -> DataFrame:
    """Multi-source BFS hop distance over the proper-crossing graph —
    for every segment reachable within max_rounds crossings of a seed
    set, the exact minimum hop count: "how many network links from the
    depot" of routing analysis (the graph sibling of the grid
    grid_distance transform).

    seeds: a DataFrame with a `seg` column; seed rows report hops = 0
    whether or not they cross anything.  Returns (seg, hops) for
    reached segments only; unreached segments emit nothing (LEFT-join
    at the call site to mark infinity).

    Plan: the pair chain once; per round ONE equi-join relaxes the
    frontier (dist_{r}(v) = min(dist_{r-1}(v), min over crossings u→v
    of dist_{r-1}(u) + 1)) followed by a map-combined min groupBy,
    localCheckpointed.  Edge weight is 1, so round r is exactly BFS
    layer r; work per round is O(edges).  The min-fold needs no
    anti-join — re-relaxed settled nodes collapse in the same groupBy.
    """
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    pairs = segment_intersections(segs, cell_shift)
    edges = (
        pairs.select(F.col("seg_a").alias("u"), F.col("seg_b").alias("v"))
        .unionAll(pairs.select(F.col("seg_b").alias("u"), F.col("seg_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    dist = seeds.select("seg").distinct().select(
        "seg", F.lit(0).cast("bigint").alias("hops")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        relax = edges.join(
            dist.select(F.col("seg").alias("u"), "hops"), "u"
        ).select(F.col("v").alias("seg"), (F.col("hops") + 1).alias("hops"))
        dist = (
            dist.unionAll(relax)
            .groupBy("seg")
            .agg(F.min("hops").cast("bigint").alias("hops"))
            .localCheckpoint(eager=True)
        )
    return dist


def crossing_sssp(
    segs: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 3,
    cell_shift: int = CELL_SHIFT,
) -> DataFrame:
    """Round-bounded weighted shortest paths over the proper-crossing
    graph — the weighted sibling of crossing_hops: network *cost* from a
    depot set, where entering segment v costs its exact L1 length
    |x2-x1| + |y2-y1| (integer metres on the int-Mercator plane; the
    reference measures way lengths the same exact-integer way,
    geom/Measure.java semantics).

    Bellman–Ford min-fold with the standard round-bounded contract:
    after r rounds dist(v) is EXACTLY the cheapest path from any seed
    using <= r crossings — oracle-checkable whether or not the graph has
    converged.  Seed rows cost 0 (the depot itself is free).

    Plan: the pair chain once; edge list carries (u, v, wt_v) where wt_v
    is the destination's traversal cost (joined once, up front, so the
    per-round relax is ONE equi-join + a map-combined min groupBy,
    localCheckpointed — identical shape to crossing_hops; weights add no
    extra shuffle).  Costs are bounded by rounds * 2^16 so bigint never
    saturates.  Returns (seg, dist) for reached segments only.
    """
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    pairs = segment_intersections(segs, cell_shift)
    wt = segs.select(
        F.col("seg"),
        (
            F.abs(F.col("x2") - F.col("x1")) + F.abs(F.col("y2") - F.col("y1"))
        ).cast("bigint").alias("wt"),
    )
    half = pairs.select(F.col("seg_a").alias("u"), F.col("seg_b").alias("v")).unionAll(
        pairs.select(F.col("seg_b").alias("u"), F.col("seg_a").alias("v"))
    )
    edges = (
        half.join(wt.withColumnRenamed("seg", "v"), "v")
        .select("u", "v", "wt")
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select("seg")
        .distinct()
        .select("seg", F.lit(0).cast("bigint").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        relax = edges.join(
            dist.select(F.col("seg").alias("u"), "dist"), "u"
        ).select(F.col("v").alias("seg"), (F.col("dist") + F.col("wt")).alias("dist"))
        dist = (
            dist.unionAll(relax)
            .groupBy("seg")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def crossing_walk_counts(
    segs: DataFrame,
    k: int = 3,
    cell_shift: int = CELL_SHIFT,
) -> DataFrame:
    """Exact k-step walk counts over the proper-crossing graph — the
    integer centrality measure (A^k applied to the all-ones vector):
    w_k(v) = number of length-k walks ending at v, the float-free
    stand-in for eigenvector/Katz centrality (for growing k the ranking
    converges to the principal eigenvector's; the counts stay exact
    integers so the ranking is bit-reproducible, unlike power iteration
    in floats).

    w_0 = 1 for every segment; each round is one equi-join + a
    map-combined sum groupBy over checkpointed state (the flow_acc /
    crossing_hops round discipline — sparse matrix-vector multiply as a
    join).  Isolated segments report 0 via the final LEFT join.  Counts
    grow like degree^k: bigint holds hubs of degree ~10^4 at k = 3;
    larger k on hub-heavy graphs should cast the accumulator wider.
    Returns (seg, walks).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    pairs = segment_intersections(segs, cell_shift)
    edges = (
        pairs.select(F.col("seg_a").alias("u"), F.col("seg_b").alias("v"))
        .unionAll(pairs.select(F.col("seg_b").alias("u"), F.col("seg_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    w = segs.select("seg", F.lit(1).cast("bigint").alias("walks"))
    for _ in range(k):
        w = (
            edges.join(
                w.select(F.col("seg").alias("u"), "walks"), "u"
            )
            .groupBy(F.col("v").alias("seg"))
            .agg(F.sum("walks").cast("bigint").alias("walks"))
            .localCheckpoint(eager=True)
        )
    return segs.select("seg").join(w, "seg", "left").select(
        "seg", F.coalesce(F.col("walks"), F.lit(0).cast("bigint")).alias("walks")
    )
