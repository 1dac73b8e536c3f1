"""Exploratory spatial data analysis: global Moran's I over grid cells.

The reference's statistics stop at counts/densities per tile
(StatisticsReport / the D2-D4 rollups here); the standard next question
a spatial analyst asks is whether those densities are CLUSTERED —
global spatial autocorrelation.  Moran's I is the canonical statistic
(public knowledge, Moran 1950):

    I = (N / W) * sum_ij w_ij z_i z_j / sum_i z_i^2

with z_i the density deviations from the mean and w_ij a binary rook
adjacency between occupied grid cells (the sparse-data convention: the
lattice is the set of occupied cells, documented, matching the tile
catalog's view of the world).

EXACT-ARITHMETIC shape: means are rationals, so instead of doubles we
scale the deviation by N — zs_i = N*c_i - T (T = total count) = N*(c_i
- mean), an exact integer.  The N^2 factor cancels in the numerator /
denominator ratio, so returning

    (n_cells, w_pairs, num = sum w_ij zs_i zs_j, den = sum zs_i^2)

as exact integers (DECIMAL(38,0) accumulators; products are bounded by
(N*max_count)^2 and sums by W times that) lets the caller form
I = n_cells / w_pairs * num / den at whatever precision they like,
while the engine's answer is bit-exact and fully SQL-oracle-checkable.

Plan: one map-combined groupBy for the cell counts, a broadcast 1-row
totals join, a 4-direction neighbor explode + ONE equi-join on the cell
key (never all-pairs), and a global agg.  Skewed hot cells are a
non-issue — the join key is the cell id itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HALF = 1 << 31


def _pin(cells: DataFrame) -> DataFrame:
    """Materialize the aggregated cell lattice ONCE (lazy
    localCheckpoint) before multi-branch consumers fan out over it.

    Why: these statistics reference `cells` from several branches
    (totals, deviations, probe, join side); without pinning, Spark's
    physical planner re-executes the WHOLE scan+aggregate subtree per
    branch (runtime exchange reuse only partially dedups under AQE —
    measured 5x the single-scan cost on a 20M-row input).  The lattice
    itself is tiny (bounded by occupied cells), so materializing it
    converts an O(branches * input) plan into O(input) + O(branches *
    cells) — the difference between one pass and five over 100 TB.
    """
    return cells.localCheckpoint(eager=False)


def morans_i(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Global Moran's I components over occupied 2^cell_shift-wide grid
    cells with rook (4-neighbor) binary weights.

    Returns ONE row: (n_cells, w_pairs, num, den) — all exact.
    w_pairs counts DIRECTED adjacent pairs (the standard W for a
    symmetric binary matrix); num sums zs_i*zs_j over those directed
    pairs; den sums zs_i^2 with zs_i = n_cells*count_i - total.
    I = (n_cells / w_pairs) * (num / den); den = 0 iff every occupied
    cell has the same count (I undefined — caller's call).
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    totals = cells.agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("c").alias("t")
    )
    d = lambda col: col.cast("decimal(38,0)")
    z = cells.join(F.broadcast(totals)).select(
        "cx", "cy", "n_cells",
        (d(F.col("n_cells")) * d(F.col("c")) - d(F.col("t"))).alias("zs"),
    )
    # 4-direction neighbor probe: each cell emits its east/west/north/
    # south neighbor key; ONE equi-join against the cell set finds the
    # occupied ones.  Directed pairs fall out naturally (each unordered
    # adjacency matches twice, once from each side).
    probe = z.select(
        F.col("zs").alias("zs_i"),
        F.explode(
            F.array(
                F.struct((F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct((F.col("cx") - 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") - 1).alias("cy")),
            )
        ).alias("_nb"),
    ).select("zs_i", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
    pairs = probe.join(z.select("cx", "cy", F.col("zs").alias("zs_j")), ["cx", "cy"])
    num_w = pairs.agg(
        # SUM over zero pairs is NULL in SQL; the statistic's empty sum is 0
        F.coalesce(
            F.sum(F.col("zs_i") * F.col("zs_j")).cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)")
        ).alias("_num"),
        F.count(F.lit(1)).alias("w_pairs"),
    )
    den_n = z.agg(
        F.max("n_cells").alias("n_cells"),
        F.sum(F.col("zs") * F.col("zs")).cast("decimal(38,0)").alias("_den"),
    )
    # the exact accumulators exceed int64 at scale; ship them as decimal
    # strings (engine-neutral exact representation — a DECIMAL column
    # would hash differently from the oracle's HUGEINT)
    return (
        den_n.join(F.broadcast(num_w))
        .select(
            "n_cells", "w_pairs",
            F.col("_num").cast("string").alias("num"),
            F.col("_den").cast("string").alias("den"),
        )
    )


def getis_ord(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Local hotspot components (Getis-Ord Gi*, Getis & Ord 1992/1995)
    over occupied 2^cell_shift-wide grid cells with binary queen weights
    INCLUDING self (the Gi* convention).

    Per occupied cell: (cx, cy, c, w_i, lsum, num) where w_i counts the
    occupied cells in the 3x3 neighborhood (self included), lsum sums
    their counts, and num = n_cells*lsum - w_i*total is the EXACT
    integer z-score numerator (the mean-scaled local excess; positive =
    hot, negative = cold).  The denominator S*sqrt((n*w_i - w_i^2)/(n-1))
    needs a square root, so the float z-score is the caller's one final
    step — the engine output stays bit-exact and SQL-oracle-checkable
    (same exact-arithmetic shape as morans_i above).

    Plan: one map-combined groupBy for cell counts, a 9-offset probe
    explode + ONE equi-join on the cell key (never all-pairs; the probe
    side carries only (key, c)), a map-combined groupBy on the target
    cell, and a broadcast 1-row totals join.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    totals = cells.agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("c").alias("t")
    )
    offsets = F.array(*[
        F.struct(
            (F.col("cx") + F.lit(dx)).alias("cx"),
            (F.col("cy") + F.lit(dy)).alias("cy"),
        )
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ])
    probe = cells.select(
        F.col("c").alias("c_j"), F.explode(offsets).alias("_nb")
    ).select("c_j", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
    local = (
        probe.join(cells.select("cx", "cy"), ["cx", "cy"])
        .groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("w_i"),
            F.sum("c_j").alias("lsum"),
        )
    )
    d = lambda col: col.cast("decimal(38,0)")
    return (
        local.join(cells, ["cx", "cy"])
        .join(F.broadcast(totals))
        .select(
            "cx", "cy", "c", "w_i", "lsum",
            (d(F.col("n_cells")) * d(F.col("lsum")) - d(F.col("w_i")) * d(F.col("t")))
            .cast("string")
            .alias("num"),
        )
    )

def gearys_c(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Global Geary's C components (Geary 1954) over occupied
    2^cell_shift-wide grid cells with rook binary weights — the
    contiguity twin of morans_i above (C weights local CONTRASTS where
    I weights local covariance; the pair is the standard ESDA toolkit).

        C = (N-1)/(2W) * sum_ij w_ij (c_i - c_j)^2 / sum_i (c_i - cbar)^2

    EXACT shape: the numerator needs no mean at all — (c_i - c_j)^2 is
    already an exact integer; the denominator reuses morans_i's N-scaled
    deviation zs_i = N*c_i - T, so den = sum zs_i^2 = N^2 * sum (c_i -
    cbar)^2.  Returns ONE row (n_cells, w_pairs, num, den) with

        C = (n_cells - 1) / (2 * w_pairs) * (n_cells^2 * num) / den

    the caller's one float step; num/den ship as DECIMAL(38,0) strings
    (they exceed int64 at scale).  w_pairs counts DIRECTED adjacent
    pairs, so sum w_ij (c_i-c_j)^2 over them double-counts each
    unordered edge exactly like the 2W in the denominator convention —
    num/w_pairs is the mean squared contrast either way.

    Plan: identical to morans_i — one map-combined groupBy, 4-direction
    probe explode, ONE equi-join on the cell key, global agg.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    totals = cells.agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("c").alias("t")
    )
    d = lambda col: col.cast("decimal(38,0)")
    probe = cells.select(
        F.col("c").alias("c_i"),
        F.explode(
            F.array(
                F.struct((F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct((F.col("cx") - 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") - 1).alias("cy")),
            )
        ).alias("_nb"),
    ).select("c_i", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
    pairs = probe.join(cells.select("cx", "cy", F.col("c").alias("c_j")), ["cx", "cy"])
    num_w = pairs.agg(
        # cast the DIFFERENCE (fits int64) before squaring — the square
        # of a planet-scale count contrast does not
        F.coalesce(
            F.sum(d(F.col("c_i") - F.col("c_j")) * d(F.col("c_i") - F.col("c_j"))),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_num"),
        F.count(F.lit(1)).alias("w_pairs"),
    )
    den_n = (
        cells.join(F.broadcast(totals))
        .select(
            "n_cells",
            (d(F.col("n_cells")) * d(F.col("c")) - d(F.col("t"))).alias("zs"),
        )
        .agg(
            F.max("n_cells").alias("n_cells"),
            F.sum(F.col("zs") * F.col("zs")).cast("decimal(38,0)").alias("_den"),
        )
    )
    return den_n.join(F.broadcast(num_w)).select(
        "n_cells", "w_pairs",
        F.col("_num").cast("string").alias("num"),
        F.col("_den").cast("string").alias("den"),
    )

def ripley_k(
    df: DataFrame,
    radii: list[int],
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Ripley's K pair-count curve (Ripley 1976): for each radius r the
    EXACT number of ORDERED point pairs (i != j) with squared distance
    <= r^2.  The caller forms K(r) = area * pairs_r / (n * (n-1)) — the
    one float step; everything the engine touches is integer.

    Plan: grid-block at cell = 2^shift >= max(radii) so every
    within-range pair meets in the 3x3 neighbor ring; 9-offset probe
    explode + ONE equi-join on the cell key (the colocation shape,
    trajectory.colocation, minus time); each ordered pair meets on
    exactly one probe row so no dedup shuffle exists.  All radii are
    answered by ONE pass over the candidate pairs (conditional sums),
    then unpivoted driver-free from the 1-row aggregate.  Candidates
    scale with local density times r^2, never all-pairs.

    Exactness bound: blocking keeps |dx|,|dy| < 2*2^shift, so d2 fits
    int64 for shift <= 30 (guarded).
    """
    if not radii:
        raise ValueError("radii must be non-empty")
    rmax = max(radii)
    shift = max(1, int(rmax - 1).bit_length())
    if shift > 30:
        raise ValueError("max radius too large for exact int64 d2")
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), shift)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(x).cast("bigint").alias("_x"),
        F.col(y).cast("bigint").alias("_y"),
        cx.alias("cx"), cy.alias("cy"),
    )
    # HALF-SPACE probing (the colocation trick): probe only (0,0) plus
    # the 4 offsets lexicographically above it.  A cross-cell unordered
    # pair then meets on exactly one probe row and stands for BOTH
    # ordered pairs (weight 2); a same-cell pair still meets in both
    # orders at (0,0) (weight 1 each).  Ordered-pair totals are
    # identical, the exploded exchange carries 5/9 of the rows and the
    # join emits about half the candidates.
    offsets = F.array(*[
        F.struct(
            (F.col("cx") + F.lit(dx)).alias("cx"),
            (F.col("cy") + F.lit(dy)).alias("cy"),
        )
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) >= (0, 0)
    ])
    probe = base.select(
        F.col("_id").alias("ia"), F.col("_x").alias("xa"), F.col("_y").alias("ya"),
        F.col("cx").alias("pbx"), F.col("cy").alias("pby"),
        F.explode(offsets).alias("_nb"),
    ).select(
        "ia", "xa", "ya", "pbx", "pby",
        F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"),
    )
    d2 = (
        (F.col("xa") - F.col("_x")) * (F.col("xa") - F.col("_x"))
        + (F.col("ya") - F.col("_y")) * (F.col("ya") - F.col("_y"))
    )
    w = F.when(
        (F.col("pbx") == F.col("cx")) & (F.col("pby") == F.col("cy")), F.lit(1)
    ).otherwise(F.lit(2))
    cand = (
        # shuffle join on the cell key (not broadcast): dense cells are
        # the skew AQE must be able to split — see
        # segments.segment_intersections
        probe.hint("shuffle_merge")
        .join(base.select("_id", "_x", "_y", "cx", "cy"), ["cx", "cy"])
        .filter(F.col("ia") != F.col("_id"))
        .select(d2.alias("d2"), w.alias("w"))
    )
    n_row = df.agg(F.count(F.lit(1)).alias("n_pts"))
    agg = cand.agg(*[
        F.coalesce(
            F.sum(F.when(F.col("d2") <= F.lit(int(r) * int(r)), F.col("w")).otherwise(F.lit(0))),
            F.lit(0),
        ).cast("bigint").alias(f"_p{i}")
        for i, r in enumerate(radii)
    ])
    curve = F.array(*[
        F.struct(
            F.lit(int(r)).cast("bigint").alias("r"),
            F.col(f"_p{i}").alias("pairs"),
        )
        for i, r in enumerate(radii)
    ])
    return (
        agg.join(F.broadcast(n_row))
        .select("n_pts", F.explode(curve).alias("_e"))
        .select(F.col("_e.r").alias("r"), "n_pts", F.col("_e.pairs").alias("pairs"))
    )

def kde_raster(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 24,
    radius: int = 2,
) -> DataFrame:
    """Kernel-density heatmap raster with an INTEGER triangular kernel —
    the standard "heatmap layer" product over point data, kept exact:
    a point in cell (cx, cy) adds weight (r+1-|dx|)*(r+1-|dy|) to every
    cell within Chebyshev distance r, so the smoothed surface is a sum
    of integers (reproducible bit-for-bit; the float normalization that
    turns weights into a density is the renderer's one step).

    Plan: ONE map-combined groupBy collapses points to occupied-cell
    counts FIRST (the explode then costs per occupied CELL, not per
    point — at planet scale that is the entire difference), then the
    SEPARABLE kernel runs as two 1-D passes — (r+1-|dx|)*(r+1-|dy|)
    factors, so convolving x then y shuffles 2*(2r+1) rows per cell
    instead of (2r+1)^2 (guide §2.3: shuffle fewer bytes; 10 vs 25 at
    r=2) — each pass a literal-weight offset explode + a map-combined
    integer-sum groupBy.  Integer sums in any order are exact, so the
    surface is bit-identical to the 2-D explode's.  No joins at all.
    """
    if radius < 1:
        raise ValueError("radius must be >= 1")
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    r = int(radius)
    spread_x = F.array(*[
        F.struct(
            (F.col("cx") + F.lit(dx)).alias("cx"),
            (F.col("c") * F.lit(r + 1 - abs(dx))).alias("w"),
        )
        for dx in range(-r, r + 1)
    ])
    xpass = (
        cells.select(F.col("cy"), F.explode(spread_x).alias("_s"))
        .select(F.col("_s.cx").alias("cx"), "cy", F.col("_s.w").alias("w"))
        .groupBy("cx", "cy")
        .agg(F.sum("w").alias("w"))
    )
    spread_y = F.array(*[
        F.struct(
            (F.col("cy") + F.lit(dy)).alias("cy"),
            (F.col("w") * F.lit(r + 1 - abs(dy))).alias("w"),
        )
        for dy in range(-r, r + 1)
    ])
    return (
        xpass.select(F.col("cx"), F.explode(spread_y).alias("_s"))
        .select("cx", F.col("_s.cy").alias("cy"), F.col("_s.w").alias("w"))
        .groupBy("cx", "cy")
        .agg(F.sum("w").alias("w_sum"))
    )


def join_counts(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
    min_count: int = 2,
) -> DataFrame:
    """Join-count statistics (Moran 1948) — the categorical member of
    the ESDA toolkit next to morans_i/gearys_c: mark each occupied grid
    cell Black when its point count >= min_count (else White) and count
    rook-adjacent (Black,Black), (White,White) and mixed edges.  Marked
    segregation shows as bw far below, clustering as bb far above, the
    free-sampling expectation the caller forms from (n_cells, n_black,
    w_pairs).

    Returns ONE row of exact int64s: (n_cells, n_black, w_pairs, bb,
    ww, bw) with bb + ww + bw = w_pairs; all counts are over DIRECTED
    adjacent pairs (gearys_c's W convention — halve for unordered
    edges; every statistic is a ratio so the factor cancels).

    Plan: identical to gearys_c — one map-combined groupBy, 4-direction
    probe explode, ONE equi-join on the cell key (never all-pairs),
    one global agg.  Everything fits int64: edge counts are bounded by
    4 * n_cells.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg((F.count(F.lit(1)) >= min_count).cast("int").alias("b"))
    )
    cells = _pin(cells)
    totals = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("b").cast("bigint").alias("n_black"),
    )
    probe = cells.select(
        F.col("b").alias("b_i"),
        F.explode(
            F.array(
                F.struct((F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct((F.col("cx") - 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") - 1).alias("cy")),
            )
        ).alias("_nb"),
    ).select("b_i", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
    pairs = probe.join(cells.select("cx", "cy", F.col("b").alias("b_j")), ["cx", "cy"])
    edge = pairs.agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.coalesce(F.sum((F.col("b_i") * F.col("b_j"))), F.lit(0)).cast("bigint").alias("bb"),
        F.coalesce(F.sum((1 - F.col("b_i")) * (1 - F.col("b_j"))), F.lit(0)).cast("bigint").alias("ww"),
        F.coalesce(
            F.sum((F.col("b_i") - F.col("b_j")) * (F.col("b_i") - F.col("b_j"))), F.lit(0)
        ).cast("bigint").alias("bw"),
    )
    return F.broadcast(totals).join(edge).select(
        "n_cells", "n_black", "w_pairs", "bb", "ww", "bw"
    )


def grid_distance(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
    seed_min_count: int = 2,
    max_hops: int = 6,
) -> DataFrame:
    """Multi-source BFS distance transform over the occupied-cell graph:
    hop distance from the nearest SEED cell (count >= seed_min_count)
    through rook-adjacent OCCUPIED cells — "how far is every populated
    cell from the nearest hotspot, walking only through populated
    cells".  The grid twin of a road-network isochrone.

    Returns (cx, cy, dist) for every cell reached within max_hops
    (dist 0 = the seeds themselves); unreachable/farther cells are
    absent.  Exact by construction (pure set algebra, no floats).

    Plan: iterative frontier expansion — per hop, ONE 4-direction probe
    explode + equi-join against occupied cells + anti-join against the
    visited set, localCheckpointed to cut lineage (relations.py's
    fixed-point discipline).  Work per hop is O(frontier), total
    O(cells * hops) worst case; the driver sees only per-hop emptiness
    booleans, never rows.  max_hops bounds the stage count (BFS depth =
    Spark stages, the standard trade of iterative graph algorithms on
    DataFrames).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    occupied = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    frontier = (
        occupied.filter(F.col("_c") >= seed_min_count).select("cx", "cy")
        .localCheckpoint(eager=True)
    )
    visited = frontier.withColumn("dist", F.lit(0))
    occ = occupied.select("cx", "cy")
    for d in range(1, max_hops + 1):
        nbrs = (
            frontier.select(
                F.explode(
                    F.array(
                        F.struct((F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")),
                        F.struct((F.col("cx") - 1).alias("cx"), F.col("cy").alias("cy")),
                        F.struct(F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")),
                        F.struct(F.col("cx").alias("cx"), (F.col("cy") - 1).alias("cy")),
                    )
                ).alias("_nb")
            )
            .select(F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
            .distinct()
        )
        new = (
            nbrs.join(occ, ["cx", "cy"])
            .join(visited.select("cx", "cy"), ["cx", "cy"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        visited = visited.union(new.withColumn("dist", F.lit(d))).localCheckpoint(eager=True)
        frontier = new
    return visited


def local_maxima(
    cells: DataFrame,
    x: str = "cx",
    y: str = "cy",
    w: str = "w_sum",
    min_weight: int = 0,
) -> DataFrame:
    """Non-maximum suppression over a raster — the peaks of a density
    surface: a cell is a local maximum iff NO 8-neighbor beats it, where
    neighbor beats center on (weight, key) — strictly larger weight, or
    equal weight and lexicographically smaller (cx, cy).  The key
    tie-break makes plateaus yield exactly one peak per connected
    equal-weight component boundary case, deterministically.  Composed
    with kde_raster this is the standard "hotspot centers" product
    (GIS focal-maximum / peak extraction).

    Plan: one 4-direction half-space probe explode + ONE equi-join on
    the cell key (each unordered adjacent pair compared exactly once —
    "beats" is a strict total order, so one comparison decides both
    directions), then an anti-join of the lattice against the beaten
    set.  Isolated cells (no occupied neighbor) are peaks by definition
    and survive the anti-join untouched.  All integer arithmetic.
    """
    c = cells.select(
        F.col(x).alias("cx"), F.col(y).alias("cy"), F.col(w).alias("w")
    )
    # `c` feeds three branches (probe, the beats join's left side, the
    # final left join) — without pinning, the whole upstream surface
    # (e.g. kde_raster's two groupBys) re-executes per branch; the
    # lattice is occupied-cells-bounded, so materialize it once.
    c = _pin(c)
    # "beats" is a strict total order on (w desc, key asc): of ANY two
    # adjacent cells exactly one beats the other.  So each unordered
    # neighbor pair needs ONE comparison: probe with the 4 half-space
    # offsets (not 8), join once per adjacent pair, and emit the BEATEN
    # cell's key; peaks = cells never emitted.  Half the exploded
    # exchange, and the anti-join absorbs duplicates for free — same
    # peak set as the 8-offset count-of-beating-neighbors form.
    probe = c.select(
        F.col("w").alias("b_w"),
        F.col("cx").alias("b_cx"),
        F.col("cy").alias("b_cy"),
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
                )
                for dx, dy in ((1, 0), (1, 1), (0, 1), (-1, 1))
            ])
        ).alias("_nb"),
    ).select("b_w", "b_cx", "b_cy", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
    b_beats_c = (
        (F.col("b_w") > F.col("w"))
        | (
            (F.col("b_w") == F.col("w"))
            & (
                (F.col("b_cx") < F.col("cx"))
                | ((F.col("b_cx") == F.col("cx")) & (F.col("b_cy") < F.col("cy")))
            )
        )
    )
    beaten = (
        c.join(probe, ["cx", "cy"])
        .select(
            F.when(b_beats_c, F.col("cx")).otherwise(F.col("b_cx")).alias("bx"),
            F.when(b_beats_c, F.col("cy")).otherwise(F.col("b_cy")).alias("by"),
        )
    )
    return (
        c.filter(F.col("w") >= min_weight)
        .join(
            beaten.select(F.col("bx").alias("cx"), F.col("by").alias("cy")),
            ["cx", "cy"],
            "left_anti",
        )
        .select("cx", "cy", "w")
    )


def cost_distance(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
    seed_min_count: int = 2,
    max_rounds: int = 4,
    cost_cap: int = 50,
) -> DataFrame:
    """Weighted cost-distance transform (GRASS r.cost / ArcGIS Cost
    Distance): least accumulated cost from the nearest SEED cell through
    rook-adjacent occupied cells, where ENTERING a cell costs
    1 + min(point_count, cost_cap) — hotspots are expensive terrain, so
    the surface models congestion-aware reachability rather than plain
    hop distance (grid_distance's weighted sibling).

    Exact by construction: integer costs, pure min-plus algebra.  After
    round i the table holds the EXACT least-cost path using <= i moves
    (bounded Bellman-Ford); `max_rounds` bounds the stage count exactly
    like grid_distance's max_hops.

    Plan: frontier relaxation — per round only cells IMPROVED last round
    probe their 4 neighbors (delta-stepping's work-efficiency argument),
    ONE equi-join against the occupied-cell costs, a min groupBy, and a
    join-update against the running distances; localCheckpoint cuts the
    iterative lineage.  Work per round is O(frontier), never O(cells^2).
    """
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    occupied = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            "cx",
            "cy",
            (F.lit(1) + F.least(F.col("_c"), F.lit(cost_cap))).alias("w"),
            F.col("_c"),
        )
        .localCheckpoint(eager=True)
    )
    dist = (
        occupied.filter(F.col("_c") >= seed_min_count)
        .select("cx", "cy", F.lit(0).cast("bigint").alias("d"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    occ = occupied.select("cx", "cy", "w")
    for _ in range(max_rounds):
        nbrs = frontier.select(
            F.col("d"),
            F.explode(
                F.array(
                    F.struct((F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")),
                    F.struct((F.col("cx") - 1).alias("cx"), F.col("cy").alias("cy")),
                    F.struct(F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")),
                    F.struct(F.col("cx").alias("cx"), (F.col("cy") - 1).alias("cy")),
                )
            ).alias("_nb"),
        ).select("d", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
        cand = (
            nbrs.join(occ, ["cx", "cy"])
            .groupBy("cx", "cy")
            .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
        )
        improved = (
            cand.join(dist, ["cx", "cy"], "left")
            .filter(F.col("d").isNull() | (F.col("nd") < F.col("d")))
            .select("cx", "cy", F.col("nd").alias("d"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("cx", "cy"), ["cx", "cy"], "left_anti")
            .union(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return dist


def semivariogram(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
    max_lag: int = 4,
) -> DataFrame:
    """Empirical directional semivariogram components (Matheron 1963)
    over occupied grid-cell counts — the kriging/spatial-interpolation
    input the ESDA set (morans_i / gearys_c / getis_ord) leads to:
    per direction d and lag k,

        2 * gamma(d, k) = (1 / n_pairs) * sum (c_i - c_{i + k*d})^2

    Four canonical directions (E, N, NE, NW) at lags 1..max_lag; each
    UNORDERED pair is counted exactly once (the directed offset leads
    with the positive axis).  Returns (dir, lag, n_pairs, gamma2) with
    gamma2 the EXACT squared-contrast sum in DECIMAL(38,0) rendered as a
    string (count contrasts square past int64 at planet scale); the one
    float division is the caller's.  (dir, lag) rows with no occupied
    pair are absent — the sparse-lattice convention of morans_i.

    Plan: one map-combined groupBy for cell counts, a 4*max_lag offset
    explode on the probe side, ONE equi-join on the cell key, one
    grouped agg.  Never all-pairs; the lag probe multiplies the SMALL
    cells table only.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    dirs = [("E", 1, 0), ("N", 0, 1), ("NE", 1, 1), ("NW", -1, 1)]
    offs = F.array(
        *[
            F.struct(
                F.lit(name).alias("dir"),
                F.lit(k).alias("lag"),
                F.lit(dx * k).alias("dx"),
                F.lit(dy * k).alias("dy"),
            )
            for name, dx, dy in dirs
            for k in range(1, max_lag + 1)
        ]
    )
    probe = cells.select(
        F.col("c").alias("c_i"), F.explode(offs).alias("_o"),
        F.col("cx"), F.col("cy"),
    ).select(
        "c_i",
        F.col("_o.dir").alias("dir"),
        F.col("_o.lag").alias("lag"),
        (F.col("cx") + F.col("_o.dx")).alias("cx"),
        (F.col("cy") + F.col("_o.dy")).alias("cy"),
    )
    d = lambda col: col.cast("decimal(38,0)")
    pairs = probe.join(
        cells.select("cx", "cy", F.col("c").alias("c_j")), ["cx", "cy"]
    )
    return (
        pairs.groupBy("dir", "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                d(F.col("c_i") - F.col("c_j")) * d(F.col("c_i") - F.col("c_j"))
            ).alias("_g2"),
        )
        .select(
            "dir", "lag", "n_pairs", F.col("_g2").cast("string").alias("gamma2")
        )
    )


def knox_stat(
    events: DataFrame,
    eps: int,
    tau: int,
    id_col: str = "event_id",
    x_col: str = "x",
    y_col: str = "y",
    t_col: str = "t",
) -> DataFrame:
    """Knox space-time interaction components (Knox 1964) — the standard
    epidemiology / incident-analysis test for whether events that are
    close in SPACE are also close in TIME (disease contagion, crime
    near-repeat victimization, aftershocks).

    Over all unordered event pairs, with closeness thresholds eps
    (L2 distance, inclusive) and tau (|dt| seconds, inclusive):

        X = pairs_both  (close in space AND time)

    whose null expectation is pairs_space * pairs_time / C(n, 2).
    Returns ONE exact row (n_events, pairs_space, pairs_time,
    pairs_both) — the ratio/simulation step is the caller's.

    Plan: the space side is the eps-cell 3x3 blocked self-join of
    geocluster.eps_pairs with the timestamps CARRIED THROUGH both sides,
    so pairs_both falls out of the same aggregate with no re-join (two
    keyed joins and two input scans fewer than the join-back form).  The
    time side blocks on tau-wide buckets with a {-1,0,1} offset probe —
    the 1-D analogue of the same pattern, one equi-join, never
    all-pairs.  All counts are exact bigints.  The raw input is NOT
    localCheckpoint-pinned (unlike the tiny _pin lattices): the five
    consumers each read a 3-4-column pruned scan, which at fact-table
    scale beats materializing a full narrow copy to executor disk.
    """
    from .geocluster import _cell

    eps = int(eps)
    ev = events.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
        F.col(t_col).cast("bigint").alias("_t"),
    )
    n_events = ev.agg(F.count(F.lit(1)).alias("n_events"))

    # eps_pairs' blocking, inlined so each side carries its timestamp
    base = ev.select(
        "_id", "_x", "_y", "_t",
        _cell("_x", eps).alias("_cx"), _cell("_y", eps).alias("_cy"),
    )
    # half-space probing (the colocation/ripley trick): only the 4
    # offsets lexicographically above (0,0) plus (0,0); a cross-cell
    # unordered pair meets on exactly one probe row (no id cut needed),
    # a same-cell pair meets in both orders and keeps the _id < _ib cut.
    # Unordered pair counts are identical with 5/9 of the exploded rows.
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) >= (0, 0)
        ]
    )
    probe = base.withColumn("_o", F.explode(offs)).select(
        F.col("_id").alias("_ib"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        F.col("_t").alias("_tb"),
        (F.col("_cx") + F.col("_o.dx")).alias("_ncx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_ncy"),
        ((F.col("_o.dx") == 0) & (F.col("_o.dy") == 0)).alias("_same"),
    )
    dx = F.col("_x") - F.col("_xb")
    dy = F.col("_y") - F.col("_yb")
    dt_ok = F.abs(F.col("_t") - F.col("_tb")) <= F.lit(int(tau))
    space_both = (
        # shuffle join (not broadcast): dense eps-cells are the skew AQE
        # must be able to split — see segments.segment_intersections
        base.hint("shuffle_merge").join(
            probe,
            (F.col("_cx") == F.col("_ncx"))
            & (F.col("_cy") == F.col("_ncy"))
            & (~F.col("_same") | (F.col("_id") < F.col("_ib"))),
        )
        .filter(dx * dx + dy * dy <= F.lit(eps * eps))
        .agg(
            F.count(F.lit(1)).alias("pairs_space"),
            F.coalesce(F.sum(F.when(dt_ok, 1)), F.lit(0)).alias("pairs_both"),
        )
    )

    tau = int(tau)
    # time blocking: bucket = floor(t / tau) over doubles is unsafe for
    # negative t; epoch seconds here are non-negative by data contract,
    # and integer DIV on non-negatives == floor in every engine
    tb = ev.select("_id", "_t", F.expr(f"_t DIV {tau}").alias("_b"))
    # 1-D half-space: offsets {0, 1} instead of {-1, 0, 1}; the id cut
    # applies only in the shared bucket (same unordered pair counts)
    probe_t = tb.select(
        F.col("_id").alias("_ib"),
        F.col("_t").alias("_tb"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("_o"),
    ).select(
        "_ib", "_tb",
        (F.col("_o") + F.expr(f"_tb DIV {tau}")).alias("_b"),
        (F.col("_o") == 0).alias("_same"),
    )
    time_pairs = (
        tb.join(probe_t, "_b")
        .filter(
            (~F.col("_same") | (F.col("_id") < F.col("_ib")))
            & (F.abs(F.col("_t") - F.col("_tb")) <= F.lit(tau))
        )
        .agg(F.count(F.lit(1)).alias("pairs_time"))
    )
    return (
        n_events.join(F.broadcast(space_both))
        .join(F.broadcast(time_pairs))
        .select("n_events", "pairs_space", "pairs_time", "pairs_both")
    )


def morans_i_bv(
    a: DataFrame,
    b: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Bivariate Moran's I components (Wartenberg 1985 / Anselin's
    standard form) — cross-set spatial correlation: are the cells dense
    in set A adjacent to the cells dense in set B (pharmacies near
    hospitals, crashes near bars)?

        I_AB = (N / W) * sum_ij w_ij zA_i zB_j / sqrt(sum zA^2 * sum zB^2)

    over the OCCUPIED-cell lattice of the UNION of both sets (rook
    binary weights, the morans_i sparse-data convention), with the same
    N-scaled exact deviations: zA_i = N*a_i - TA.  Returns ONE row
    (n_cells, w_pairs, num, den_a, den_b) — num sums zA_i*zB_j over
    DIRECTED adjacent pairs (symmetrized by direction like morans_i),
    den_a/den_b are the two exact sum-of-squares; the sqrt/ratio is the
    caller's one float step.  All three accumulate in DECIMAL(38,0),
    rendered as strings.

    Plan: ONE union + map-combined groupBy builds both counts per cell
    (conditional sums — no outer join), then the morans_i 4-direction
    probe and ONE equi-join.  Never all-pairs.
    """
    cells = (
        a.select(F.col(x).alias("x"), F.col(y).alias("y"))
        .withColumn("_t", F.lit(0))
        .unionByName(
            b.select(F.col(x).alias("x"), F.col(y).alias("y")).withColumn(
                "_t", F.lit(1)
            )
        )
        .select(
            F.shiftright(F.col("x").cast("bigint") + F.lit(HALF), cell_shift).alias("cx"),
            F.shiftright(F.col("y").cast("bigint") + F.lit(HALF), cell_shift).alias("cy"),
            "_t",
        )
        .groupBy("cx", "cy")
        .agg(
            F.coalesce(F.sum(F.when(F.col("_t") == 0, 1)), F.lit(0)).alias("ca"),
            F.coalesce(F.sum(F.when(F.col("_t") == 1, 1)), F.lit(0)).alias("cb"),
        )
    )
    cells = _pin(cells)
    totals = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("ca").alias("ta"),
        F.sum("cb").alias("tb"),
    )
    d = lambda col: col.cast("decimal(38,0)")
    z = cells.join(F.broadcast(totals)).select(
        "cx", "cy", "n_cells",
        (d(F.col("n_cells")) * d(F.col("ca")) - d(F.col("ta"))).alias("za"),
        (d(F.col("n_cells")) * d(F.col("cb")) - d(F.col("tb"))).alias("zb"),
    )
    probe = z.select(
        F.col("za").alias("za_i"),
        F.explode(
            F.array(
                F.struct((F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct((F.col("cx") - 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") - 1).alias("cy")),
            )
        ).alias("_nb"),
    ).select("za_i", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
    pairs = probe.join(z.select("cx", "cy", F.col("zb").alias("zb_j")), ["cx", "cy"])
    num_w = pairs.agg(
        F.coalesce(
            F.sum(F.col("za_i") * F.col("zb_j")).cast("decimal(38,0)"),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_num"),
        F.count(F.lit(1)).alias("w_pairs"),
    )
    dens = z.agg(
        F.max("n_cells").alias("n_cells"),
        F.sum(F.col("za") * F.col("za")).cast("decimal(38,0)").alias("_da"),
        F.sum(F.col("zb") * F.col("zb")).cast("decimal(38,0)").alias("_db"),
    )
    return dens.join(F.broadcast(num_w)).select(
        "n_cells", "w_pairs",
        F.col("_num").cast("string").alias("num"),
        F.col("_da").cast("string").alias("den_a"),
        F.col("_db").cast("string").alias("den_b"),
    )


def cell_churn(
    before: DataFrame,
    after: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Two-epoch vector change detection — the geospatial twin of the
    imagery image_diff lane: per grid cell, the before/after point
    counts and their signed delta, emitting ONLY cells that changed
    (appeared, vanished, or shifted density).  The "what did this
    update do to the map" report of an OSM-style diff apply.

    Exact integers throughout; a cell absent from an epoch counts 0.
    The no-outer-join shape of morans_i_bv: one union + conditional
    sums, one filter.  Output (cx, cy, c_before, c_after, delta) sorted
    by nothing — callers order; at 100 TB the changed-cell set is the
    delta's footprint, not the store's.
    """
    cells = (
        before.select(F.col(x).alias("x"), F.col(y).alias("y"))
        .withColumn("_t", F.lit(0))
        .unionByName(
            after.select(F.col(x).alias("x"), F.col(y).alias("y")).withColumn(
                "_t", F.lit(1)
            )
        )
        .select(
            F.shiftright(F.col("x").cast("bigint") + F.lit(HALF), cell_shift).alias("cx"),
            F.shiftright(F.col("y").cast("bigint") + F.lit(HALF), cell_shift).alias("cy"),
            "_t",
        )
        .groupBy("cx", "cy")
        .agg(
            F.coalesce(F.sum(F.when(F.col("_t") == 0, 1)), F.lit(0)).alias("c_before"),
            F.coalesce(F.sum(F.when(F.col("_t") == 1, 1)), F.lit(0)).alias("c_after"),
        )
    )
    return cells.filter(F.col("c_before") != F.col("c_after")).select(
        "cx", "cy", "c_before", "c_after",
        (F.col("c_after") - F.col("c_before")).alias("delta"),
    )


def contour_cases(
    df: DataFrame,
    threshold: int,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Marching-squares case census over the density surface — the
    isoline-extraction primitive: every 2x2 corner window of the cell
    lattice classifies into one of 16 cases by which corners sit at or
    above `threshold`; the case histogram is the contour-topology
    summary (cases 0/15 = interior, the rest = boundary windows, cases
    5/10 = saddles), and sum(boundary cases) is the isoline-length
    proxy renderers budget by.

    Windows are anchored at every occupied cell's 2x2 NEIGHBORHOOD
    (each window containing >= 1 occupied corner counted exactly once
    via its anchor = the window's lower-left lattice point; all-empty
    windows are case 0 and uncounted — the sparse convention).  Corner
    bits: 1 = lower-left (wx, wy), 2 = lower-right, 4 = upper-left,
    8 = upper-right.  Exact integers throughout.

    Plan: one cells groupBy; each occupied cell emits the 4 window
    anchors it can be a corner of, carrying its own corner bit — ONE
    map-combined groupBy on the anchor builds (case, occupied-corner
    bits) with NO join at all; a final tiny groupBy makes the census.
    """
    thr = int(threshold)
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # cell (cx, cy) is corner bit 1 of window (cx, cy), bit 2 of window
    # (cx-1, cy), bit 4 of (cx, cy-1), bit 8 of (cx-1, cy-1)
    emits = F.array(
        F.struct(F.col("cx").alias("wx"), F.col("cy").alias("wy"), F.lit(1).alias("bit")),
        F.struct((F.col("cx") - 1).alias("wx"), F.col("cy").alias("wy"), F.lit(2).alias("bit")),
        F.struct(F.col("cx").alias("wx"), (F.col("cy") - 1).alias("wy"), F.lit(4).alias("bit")),
        F.struct((F.col("cx") - 1).alias("wx"), (F.col("cy") - 1).alias("wy"), F.lit(8).alias("bit")),
    )
    hot = F.when(F.col("c") >= thr, F.col("_e.bit")).otherwise(F.lit(0))
    windows = (
        cells.select("c", F.explode(emits).alias("_e"))
        .select(
            F.col("_e.wx").alias("wx"),
            F.col("_e.wy").alias("wy"),
            hot.alias("hot_bit"),
        )
        .groupBy("wx", "wy")
        .agg(F.sum("hot_bit").cast("int").alias("mcase"))
    )
    return (
        windows.groupBy("mcase")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .select("mcase", "n_windows")
    )


def emerging_hotspots(
    events: DataFrame,
    t0: int,
    period_s: int,
    n_periods: int,
    x: str = "x",
    y: str = "y",
    t_col: str = "t",
    cell_shift: int = 26,
) -> DataFrame:
    """Emerging-hotspot components: per occupied cell, the exact
    Mann-Kendall trend statistic of its count series over `n_periods`
    fixed windows of `period_s` seconds starting at `t0` —

        S = sum over period pairs i < j of sign(c_j - c_i)

    the standard space-time "is this hotspot NEW / intensifying /
    cooling" classification (S near +max = monotone growth, near -max =
    decay, near 0 = stable/noisy).  Missing periods count ZERO — a cell
    that appears halfway through the window is genuinely emerging, which
    only the dense series captures.  Events outside [t0, t0 +
    n_periods*period_s) are ignored.  Returns (cx, cy, total, n_active,
    mk_s), all exact int64.

    Plan: one map-combined groupBy on (cell, period); per-cell series
    densify via map_from_entries + a literal period sequence (JVM array
    ops, no explode); the O(P^2) sign sum runs as a nested
    transform/aggregate INSIDE codegen — P is small by contract
    (<= ~64), so this is per-cell constant work.  No joins at all.
    """
    if n_periods < 2:
        raise ValueError("emerging_hotspots: need >= 2 periods")
    t0, period_s = int(t0), int(period_s)
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    t = F.col(t_col).cast("bigint")
    per = (
        events.filter(
            (t >= t0) & (t < t0 + n_periods * period_s)
        )
        .select(cx.alias("cx"), cy.alias("cy"), (t - t0).alias("_dt"))
        # integer DIV, not double division: near a period boundary the
        # rounded double quotient could truncate into the wrong window
        .select("cx", "cy", F.expr(f"_dt DIV {period_s}").alias("p"))
        .groupBy("cx", "cy", "p")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    series = per.groupBy("cx", "cy").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("p"), F.col("c")))
        ).alias("_m"),
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_active"),
    )
    seq = F.sequence(F.lit(0).cast("bigint"), F.lit(n_periods - 1).cast("bigint"))
    dense = F.transform(
        seq, lambda p: F.coalesce(F.col("_m")[p], F.lit(0).cast("bigint"))
    )
    withc = series.withColumn("_c", dense)
    sgn = lambda d: F.when(d > 0, 1).when(d < 0, -1).otherwise(0)
    pair_signs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_periods - 2)),
            lambda i: F.transform(
                F.sequence(i + 1, F.lit(n_periods - 1)),
                lambda j: sgn(
                    F.element_at("_c", (j + 1).cast("int"))
                    - F.element_at("_c", (i + 1).cast("int"))
                ),
            ),
        )
    )
    mk = F.aggregate(
        pair_signs, F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    return withc.select("cx", "cy", "total", "n_active", mk.alias("mk_s"))


def slope_components(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Horn's slope/aspect gradient components (Horn 1981) over the
    density surface — the terrain-analysis primitive applied to count
    rasters (where is density rising fastest, and toward where):

        gx = (c_NE + 2*c_E + c_SE) - (c_NW + 2*c_W + c_SW)
        gy = (c_NE + 2*c_N + c_NW) - (c_SE + 2*c_S + c_SW)

    per occupied cell, with absent neighbors ZERO (the sparse-lattice
    convention).  slope = atan(sqrt(gx^2+gy^2) / (8*cellsize)) and
    aspect = atan2(gy, gx) are the caller's float steps; gx/gy and the
    squared magnitude g2 = gx^2 + gy^2 ship exact (g2 in DECIMAL(38,0)
    as a string — planet-scale counts square past int64).

    Plan: cells groupBy (pinned), ONE 8-offset probe explode carrying
    per-direction weights + ONE equi-join + a map-combined groupBy on
    the target cell.  Never all-pairs.
    """
    cxc = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cyc = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cxc.alias("cx"), cyc.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    # neighbor (dx, dy) seen FROM the target cell; the probe emits the
    # reverse offset so one equi-join lands each contribution
    weights = {
        (1, 1): (1, 1), (1, 0): (2, 0), (1, -1): (1, -1),
        (-1, 1): (-1, 1), (-1, 0): (-2, 0), (-1, -1): (-1, -1),
        (0, 1): (0, 2), (0, -1): (0, -2),
    }
    offs = F.array(
        *[
            F.struct(
                F.lit(-dx).alias("dx"), F.lit(-dy).alias("dy"),
                F.lit(wx).alias("wx"), F.lit(wy).alias("wy"),
            )
            for (dx, dy), (wx, wy) in weights.items()
        ]
    )
    probe = cells.select(
        "cx", "cy", F.col("c").alias("c_j"), F.explode(offs).alias("_o")
    ).select(
        "c_j",
        (F.col("cx") + F.col("_o.dx")).alias("cx"),
        (F.col("cy") + F.col("_o.dy")).alias("cy"),
        F.col("_o.wx").alias("wx"),
        F.col("_o.wy").alias("wy"),
    )
    grads = (
        probe.join(cells.select("cx", "cy"), ["cx", "cy"])
        .groupBy("cx", "cy")
        .agg(
            F.sum(F.col("wx") * F.col("c_j")).alias("gx"),
            F.sum(F.col("wy") * F.col("c_j")).alias("gy"),
        )
    )
    d = lambda col: col.cast("decimal(38,0)")
    # LEFT join from cells: isolated occupied cells keep a flat gradient
    gx = F.coalesce(F.col("gx"), F.lit(0)).alias("gx")
    gy = F.coalesce(F.col("gy"), F.lit(0)).alias("gy")
    return cells.join(grads, ["cx", "cy"], "left").select(
        "cx", "cy", "c", gx, gy,
        (d(gx) * d(gx) + d(gy) * d(gy)).cast("string").alias("g2"),
    )


def flow_directions(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """D8 flow direction (O'Callaghan & Mark 1984, the ArcGIS FlowDir
    convention) over the density surface — for every occupied cell, which
    of its 8 neighbors receives the steepest descent of the count raster.
    The hydrology primitive applied to density: "toward where does this
    hotspot drain".

    Direction codes are the ArcGIS powers of two (E=1, SE=2, S=4, SW=8,
    W=16, NW=32, N=64, NE=128); 0 = pit/flat (no neighbor strictly
    lower).  Absent neighbors count ZERO (the sparse-lattice convention
    shared with slope_components), so boundary cells drain off the
    surface.  D8 compares drop/distance with distance 1 straight and
    sqrt(2) diagonal; to stay EXACT we compare squared rates — key =
    drop^2 * 2 for straight, drop^2 for diagonal (both sides of
    (drop_s/1)^2 vs (drop_d/sqrt2)^2 scaled by 2) in DECIMAL(38,0)
    (planet-scale counts square past int64).  Ties take the SMALLEST
    direction code — deterministic and oracle-checkable.

    Returns (cx, cy, c, d8, c_drop): the winning code, and the raw count
    drop toward it (0 for pits).

    Plan: cells groupBy (pinned), each cell explodes its 8 literal
    offsets, ONE LEFT equi-join pulls the neighbor count (absent -> 0),
    and one map-combined min(struct) argmin per cell.  Never all-pairs;
    the join key is the cell id itself so hot cells don't skew.
    """
    d = lambda c: c.cast("decimal(38,0)")
    cxc = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cyc = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cxc.alias("cx"), cyc.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    # (dx, dy, code, mult): ArcGIS D8 codes, mult 2 = straight (distance
    # 1: rate^2 scaled by 2), mult 1 = diagonal (distance sqrt(2))
    offsets = [
        (1, 0, 1, 2), (1, -1, 2, 1), (0, -1, 4, 2), (-1, -1, 8, 1),
        (-1, 0, 16, 2), (-1, 1, 32, 1), (0, 1, 64, 2), (1, 1, 128, 1),
    ]
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                F.lit(code).alias("code"), F.lit(mult).alias("mult"),
            )
            for dx, dy, code, mult in offsets
        ]
    )
    probe = cells.select(
        "cx", "cy", "c", F.explode(offs).alias("_o")
    ).select(
        "cx", "cy", "c",
        (F.col("cx") + F.col("_o.dx")).alias("nx"),
        (F.col("cy") + F.col("_o.dy")).alias("ny"),
        F.col("_o.code").alias("code"),
        F.col("_o.mult").alias("mult"),
    )
    nb = cells.select(
        F.col("cx").alias("nx"), F.col("cy").alias("ny"), F.col("c").alias("c_j")
    )
    cand = probe.join(nb, ["nx", "ny"], "left").withColumn(
        "_drop", F.col("c") - F.coalesce(F.col("c_j"), F.lit(0))
    )
    # no-flow candidates collapse to one identical (-1, 0, 0) key so the
    # argmin needs no second join back for pits
    key = F.when(
        F.col("_drop") > 0, d(F.col("_drop")) * d(F.col("_drop")) * F.col("mult")
    ).otherwise(F.lit(-1).cast("decimal(38,0)"))
    code = F.when(F.col("_drop") > 0, F.col("code")).otherwise(F.lit(0))
    drop = F.when(F.col("_drop") > 0, F.col("_drop")).otherwise(F.lit(0))
    return (
        cand.select(
            "cx", "cy", "c",
            F.struct(
                (-key).alias("negkey"), code.alias("code"), drop.alias("drop")
            ).alias("_k"),
        )
        .groupBy("cx", "cy", "c")
        .agg(F.min("_k").alias("_w"))
        .select(
            "cx", "cy", "c",
            F.col("_w.code").cast("int").alias("d8"),
            F.col("_w.drop").cast("bigint").alias("c_drop"),
        )
    )


def quadrat_counts(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 28,
) -> DataFrame:
    """Quadrat-count dispersion test components (the classic CSR check,
    Greig-Smith 1952): divide the FULL int32 plane into 4^k equal
    quadrats (k = 32 - cell_shift per axis), count points per quadrat —
    EMPTY quadrats count, unlike the occupied-only lattice every other
    statistic here uses — and ship the exact integer components of the
    variance-to-mean ratio / chi-square statistic:

        vmr_num = Q * sum_sq - n^2     (= Q^2 * sample variance * (Q-1)/Q ... )
        chi     = vmr_num / n          (the caller's float step)

    Returns ONE row: (n_quadrats, n_points, occupied, max_count,
    sum_sq, vmr_num) with the two overflow-prone accumulators as
    DECIMAL(38,0) strings (n^2 and Q*sum_sq square past int64 at planet
    scale).  Empty quadrats contribute zero to sum_sq, so the occupied
    aggregation IS the full-lattice aggregation — Q enters as a literal.

    Plan: one map-combined groupBy + a 1-row global agg.  Zero joins.
    """
    if not 16 <= cell_shift <= 31:
        raise ValueError("cell_shift must be in [16, 31]")
    k = 32 - cell_shift
    n_quadrats = 1 << (2 * k)
    d = lambda c: c.cast("decimal(38,0)")
    cxc = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cyc = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    q = (
        df.select(cxc.alias("qx"), cyc.alias("qy"))
        .groupBy("qx", "qy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return q.agg(
        F.lit(n_quadrats).cast("bigint").alias("n_quadrats"),
        F.sum("c").cast("bigint").alias("n_points"),
        F.count(F.lit(1)).cast("bigint").alias("occupied"),
        F.max("c").cast("bigint").alias("max_count"),
        F.sum(d(F.col("c")) * d(F.col("c"))).cast("string").alias("sum_sq"),
        (
            F.lit(n_quadrats).cast("decimal(38,0)")
            * F.sum(d(F.col("c")) * d(F.col("c")))
            - F.sum(d(F.col("c"))) * F.sum(d(F.col("c")))
        ).cast("string").alias("vmr_num"),
    )


def line_of_sight(
    observers: DataFrame,
    surface: DataFrame,
    towers: list[tuple[int, int, int]],
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    cell_shift: int = 24,
    block_min_count: int = 4,
) -> DataFrame:
    """Grid line-of-sight / visibility: for every observer point, is the
    straight line to its assigned tower clear of BLOCKED cells of the
    density surface (count >= block_min_count at cell_shift)?  The
    viewshed primitive of terrain analysis, with density standing in for
    elevation — "can this point see its hub without crossing a dense
    blob".

    towers is a SMALL list of (tower_id, tx, ty) literals (the
    nearest_seed K-facilities shape); each observer is assigned tower
    index id % len(towers) — deterministic and oracle-checkable.  The
    line is sampled by the raster_cover DDA spec (exact rational
    interpolation floored on +2^31-biased coordinates, n = the cell
    span, so the sample chain moves <= 1 cell per axis per step); the
    observer's own cell and the tower's cell are EXCLUDED, so standing
    inside a dense blob doesn't blind you to it and a tower on a hill
    stays reachable.

    Returns (id, tower, n_steps, n_between, n_blocked, visible): the
    DDA step count, distinct strictly-between sampled cells, how many
    of those are blocked, and the visibility verdict.

    Plan: the blocked lattice is bounded by 4^(32 - cell_shift) cells
    (65_536 at the default shift 24, where it is ALWAYS broadcastable
    independent of input size; at lower shifts it is bounded by
    occupied-and-dense cells — pick block_min_count accordingly); the DDA explode is bounded by the per-line cell
    span; one broadcast LEFT join + one map-combined groupBy.  At 100
    TB the observer side never shuffles.
    """
    if not towers:
        raise ValueError("line_of_sight: towers must be non-empty")
    if not 4 <= cell_shift <= 28:
        raise ValueError("cell_shift must be in [4, 28]")
    k = len(towers)
    cell = lambda c: F.shiftright(c, cell_shift)
    idx = (F.col(id_col).cast("bigint") % k + 1).cast("int")
    t_id = F.element_at(F.array(*[F.lit(t[0]).cast("bigint") for t in towers]), idx)
    t_x = F.element_at(F.array(*[F.lit(t[1]).cast("bigint") for t in towers]), idx)
    t_y = F.element_at(F.array(*[F.lit(t[2]).cast("bigint") for t in towers]), idx)
    base = observers.select(
        F.col(id_col).alias("id"),
        t_id.alias("tower"),
        (F.col(x).cast("bigint") + F.lit(HALF)).alias("_X1"),
        (F.col(y).cast("bigint") + F.lit(HALF)).alias("_Y1"),
        (t_x + F.lit(HALF)).alias("_X2"),
        (t_y + F.lit(HALF)).alias("_Y2"),
    ).withColumn(
        "_n",
        F.greatest(
            F.abs(cell(F.col("_X2")) - cell(F.col("_X1"))),
            F.abs(cell(F.col("_Y2")) - cell(F.col("_Y1"))),
            F.lit(1).cast("bigint"),
        ),
    )
    blocked = (
        surface.select(
            F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift).alias("cx"),
            F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= block_min_count)
        .select("cx", "cy", F.lit(1).alias("_blk"))
    )
    lerp = lambda a, b: F.expr(f"((_n - _t) * {a} + _t * {b}) DIV _n")
    samples = (
        base.withColumn(
            "_t", F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_n")))
        )
        .select(
            "id", "tower", "_n",
            cell(lerp("_X1", "_X2")).alias("cx"),
            cell(lerp("_Y1", "_Y2")).alias("cy"),
            cell(F.col("_X1")).alias("_ox"),
            cell(F.col("_Y1")).alias("_oy"),
            cell(F.col("_X2")).alias("_tx"),
            cell(F.col("_Y2")).alias("_ty"),
        )
        .filter(
            ~((F.col("cx") == F.col("_ox")) & (F.col("cy") == F.col("_oy")))
            & ~((F.col("cx") == F.col("_tx")) & (F.col("cy") == F.col("_ty")))
        )
        .dropDuplicates(["id", "cx", "cy"])
    )
    hits = samples.join(F.broadcast(blocked), ["cx", "cy"], "left")
    return (
        hits.groupBy("id", "tower")
        .agg(
            F.max("_n").cast("bigint").alias("n_steps"),
            F.count(F.lit(1)).cast("bigint").alias("n_between"),
            F.sum(F.coalesce(F.col("_blk"), F.lit(0))).cast("bigint").alias("n_blocked"),
        )
        .withColumn("visible", F.col("n_blocked") == 0)
    )


# D8 code -> unit offset (the flow_directions convention)
_D8_STEP = {
    1: (1, 0), 2: (1, -1), 4: (0, -1), 8: (-1, -1),
    16: (-1, 0), 32: (-1, 1), 64: (0, 1), 128: (1, 1),
}


def flow_accumulation(flow: DataFrame, max_rounds: int = 4) -> DataFrame:
    """Bounded D8 flow accumulation over a flow_directions() result — for
    every cell, how many cells drain THROUGH it within max_rounds hops
    (itself included): the upstream-catchment size of hydrology, applied
    to the density surface.  Because flow_directions drops are strictly
    positive, the flow graph is acyclic (count strictly decreases along
    every edge), and each cell has at most ONE outflow — a forest — so
    paths are unique and the bounded recurrence

        acc_0(v) = 1;  acc_h(v) = 1 + sum over {u : flow(u) = v} acc_{h-1}(u)

    counts exactly the cells whose flow path reaches v in <= max_rounds
    steps.  Pits (d8 = 0) contribute no edge.

    Returns (cx, cy, acc) for every cell of the input lattice.

    Plan: the relations.py fixed-point discipline — per round ONE
    equi-join on the target cell + a map-combined sum, localCheckpointed
    to cut lineage; max_rounds bounds the stage count.  Work per round
    is O(edges) = O(cells); nothing is ever all-pairs.
    """
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    step_dx = F.element_at(
        F.create_map(*[F.lit(v) for kv in _D8_STEP.items() for v in (kv[0], kv[1][0])]),
        F.col("d8"),
    )
    step_dy = F.element_at(
        F.create_map(*[F.lit(v) for kv in _D8_STEP.items() for v in (kv[0], kv[1][1])]),
        F.col("d8"),
    )
    cells = flow.select("cx", "cy").localCheckpoint(eager=True)
    edges = (
        flow.filter(F.col("d8") != 0)
        .select(
            F.col("cx").alias("fx"),
            F.col("cy").alias("fy"),
            (F.col("cx") + step_dx).alias("tx"),
            (F.col("cy") + step_dy).alias("ty"),
        )
        .localCheckpoint(eager=True)
    )
    acc = cells.withColumn("acc", F.lit(1).cast("bigint"))
    for _ in range(max_rounds):
        upstream = (
            edges.join(
                acc.select(F.col("cx").alias("fx"), F.col("cy").alias("fy"), "acc"),
                ["fx", "fy"],
            )
            .groupBy(F.col("tx").alias("cx"), F.col("ty").alias("cy"))
            .agg(F.sum("acc").alias("_up"))
        )
        acc = (
            cells.join(upstream, ["cx", "cy"], "left")
            .select(
                "cx", "cy",
                (F.lit(1) + F.coalesce(F.col("_up"), F.lit(0))).cast("bigint").alias("acc"),
            )
            .localCheckpoint(eager=True)
        )
    return acc


def watershed(flow: DataFrame, doubling_rounds: int = 4) -> DataFrame:
    """Basin (watershed) labeling over the D8 forest — for every cell,
    WHICH sink its flow path terminates at: the catchment-delineation
    primitive of hydrology (Jenson & Domingue 1988) applied to the
    density surface, and the complement of flow_accumulation ("how much
    drains through me" vs "where do I drain to").

    step(v) = the D8 target if that target is ON the lattice, else v
    itself — so terminals are pits (d8 = 0) AND edge cells whose flow
    leaves the surface (flow_directions lets boundary cells drain toward
    absent neighbors).  Because drops are strictly positive the forest
    is acyclic; pointer doubling (p_{k+1} = p_k ∘ p_k, distances add)
    resolves every path of length <= 2^doubling_rounds to its terminal
    in doubling_rounds joins instead of depth joins — the log-rounds
    discipline that keeps a continent-deep drainage network at ~40
    stages instead of ~10^6.  Cells deeper than the bound carry the cell
    reached after exactly 2^doubling_rounds steps with at_sink = false
    (bounded semantics, same contract as flow_accumulation/max_rounds).

    Returns (cx, cy, sink_x, sink_y, depth, at_sink): the basin outlet
    coordinates, the EXACT path length walked (stops growing once the
    terminal self-loop is reached), and whether the label is final.

    Plan: one LEFT join builds the total step map (target off-lattice ->
    self-loop), then doubling_rounds self-joins on the moving target
    key, each localCheckpointed to cut lineage; one final LEFT join
    marks terminal-ness.  Work per round is O(cells); never all-pairs.
    """
    if doubling_rounds < 0:
        raise ValueError("doubling_rounds must be >= 0")
    step_dx = F.element_at(
        F.create_map(*[F.lit(v) for kv in _D8_STEP.items() for v in (kv[0], kv[1][0])]),
        F.col("d8"),
    )
    step_dy = F.element_at(
        F.create_map(*[F.lit(v) for kv in _D8_STEP.items() for v in (kv[0], kv[1][1])]),
        F.col("d8"),
    )
    lattice = flow.select(
        F.col("cx").alias("_lx"), F.col("cy").alias("_ly")
    ).localCheckpoint(eager=True)
    raw = flow.select(
        "cx", "cy",
        F.when(F.col("d8") == 0, F.col("cx")).otherwise(F.col("cx") + step_dx).alias("_tx"),
        F.when(F.col("d8") == 0, F.col("cy")).otherwise(F.col("cy") + step_dy).alias("_ty"),
        (F.col("d8") != 0).alias("_moves"),
    )
    # total step map: off-lattice targets become self-loops (edge sinks)
    p = (
        raw.join(
            lattice, (F.col("_tx") == F.col("_lx")) & (F.col("_ty") == F.col("_ly")), "left"
        )
        .select(
            "cx", "cy",
            F.when(F.col("_moves") & F.col("_lx").isNotNull(), F.col("_tx"))
            .otherwise(F.col("cx")).alias("tx"),
            F.when(F.col("_moves") & F.col("_lx").isNotNull(), F.col("_ty"))
            .otherwise(F.col("cy")).alias("ty"),
            F.when(F.col("_moves") & F.col("_lx").isNotNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("bigint").alias("d"),
        )
        .localCheckpoint(eager=True)
    )
    terminals = p.filter(F.col("d") == 0).select(
        F.col("cx").alias("_sx"), F.col("cy").alias("_sy")
    ).localCheckpoint(eager=True)
    cur = p
    for _ in range(doubling_rounds):
        nxt = cur.select(
            F.col("cx").alias("_jx"), F.col("cy").alias("_jy"),
            F.col("tx").alias("_t2x"), F.col("ty").alias("_t2y"),
            F.col("d").alias("_d2"),
        )
        cur = (
            cur.join(nxt, (F.col("tx") == F.col("_jx")) & (F.col("ty") == F.col("_jy")))
            .select(
                "cx", "cy",
                F.col("_t2x").alias("tx"), F.col("_t2y").alias("ty"),
                (F.col("d") + F.col("_d2")).alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        cur.join(
            terminals, (F.col("tx") == F.col("_sx")) & (F.col("ty") == F.col("_sy")), "left"
        )
        .select(
            "cx", "cy",
            F.col("tx").alias("sink_x"), F.col("ty").alias("sink_y"),
            F.col("d").alias("depth"),
            F.col("_sx").isNotNull().alias("at_sink"),
        )
    )


def local_morans(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Local Moran's I (LISA, Anselin 1995) components per occupied grid
    cell with rook binary weights — the per-cell decomposition of the
    global morans_i: WHERE is the clustering, not just how much.

    For each occupied cell i:  I_i ∝ z_i * sum_{j in rook(i)} z_j, with
    z_i = n_cells*count_i - total (the same integer-scaled deviation the
    global statistic uses, so sum_i num_i == the global numerator).

    Returns (cx, cy, c, w, zs, lag, num, quad): the neighbor count w,
    exact z_i / spatial lag / product as DECIMAL strings, and the
    classic LISA quadrant label — 'HH'/'LL' (hotspot/coldspot core) /
    'HL'/'LH' (spatial outliers), NULL when undefined (isolated cell or
    a zero factor).  Exact integers end to end; significance (the
    permutation envelope) is intentionally out of scope.

    Plan: identical shape to morans_i — pinned lattice, broadcast
    totals, ONE equi-join on the 4-offset neighbor probe, one
    map-combined groupBy, one LEFT join back (isolated cells keep
    w = 0 rather than vanishing).  Never all-pairs; hot cells cost
    exactly 4 probe rows like every other cell.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    totals = cells.agg(F.count(F.lit(1)).alias("n_cells"), F.sum("c").alias("t"))
    d = lambda col: col.cast("decimal(38,0)")
    z = cells.join(F.broadcast(totals)).select(
        "cx", "cy", "c",
        (d(F.col("n_cells")) * d(F.col("c")) - d(F.col("t"))).alias("zs"),
    )
    probe = z.select(
        F.col("cx").alias("cx0"), F.col("cy").alias("cy0"),
        F.explode(
            F.array(
                F.struct((F.col("cx") + 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct((F.col("cx") - 1).alias("cx"), F.col("cy").alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") + 1).alias("cy")),
                F.struct(F.col("cx").alias("cx"), (F.col("cy") - 1).alias("cy")),
            )
        ).alias("_nb"),
    ).select("cx0", "cy0", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
    lag = (
        probe.join(z.select("cx", "cy", F.col("zs").alias("_zj")), ["cx", "cy"])
        .groupBy(F.col("cx0").alias("cx"), F.col("cy0").alias("cy"))
        .agg(
            F.sum("_zj").cast("decimal(38,0)").alias("_lag"),
            F.count(F.lit(1)).cast("bigint").alias("_w"),
        )
    )
    zero = F.lit(0).cast("decimal(38,0)")
    out = z.join(lag, ["cx", "cy"], "left").select(
        "cx", "cy", "c",
        F.coalesce(F.col("_w"), F.lit(0).cast("bigint")).alias("w"),
        F.col("zs"),
        F.coalesce(F.col("_lag"), zero).alias("lag"),
    )
    quad = F.when(
        (F.col("w") > 0) & (F.col("zs") != 0) & (F.col("lag") != 0),
        F.concat(
            F.when(F.col("zs") > 0, F.lit("H")).otherwise(F.lit("L")),
            F.when(F.col("lag") > 0, F.lit("H")).otherwise(F.lit("L")),
        ),
    )
    return out.select(
        "cx", "cy", "c", "w",
        F.col("zs").cast("string").alias("zs"),
        F.col("lag").cast("string").alias("lag"),
        (F.col("zs") * F.col("lag")).cast("decimal(38,0)").cast("string").alias("num"),
        quad.alias("quad"),
    )


def cell_components(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
    connectivity: int = 8,
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components over the OCCUPIED cell lattice — whole-raster
    blob labeling ("which cells form one contiguous settled area"), the
    distributed sibling of the per-image mask_components: the lattice
    here is the full density surface, not one image, so the union-find
    must be a shuffle algorithm, not a per-row Python pass.

    connectivity 4 (rook) or 8 (queen).  Returns (cx, cy, c, comp) for
    every occupied cell; comp is the smallest packed cell id reachable,
    so isolated cells are their own singleton (LEFT join + coalesce).

    Plan: the pinned lattice probes only the POSITIVE half-plane offsets
    (E, N, NE, SE for queen) so each unordered adjacency emits exactly
    once from one side; ONE equi-join finds occupied neighbors, then the
    dedup.dup_clusters alternating large/small-star engine contracts the
    edges in O(log n) rounds.  Cell ids pack as cx * 2^32 + cy (shifted
    coords are non-negative; cell_shift >= 8 keeps the pack in int64).
    """
    if connectivity not in (4, 8):
        raise ValueError("connectivity must be 4 or 8")
    if cell_shift < 8:
        raise ValueError("cell_shift must be >= 8 (packed ids exceed int64)")
    from gol_tool_spark.operators.dedup import dup_clusters

    cxc = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cyc = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cxc.alias("cx"), cyc.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    pack = lambda cx, cy: (cx * F.lit(1 << 32).cast("bigint") + cy).cast("bigint")
    offsets = [(1, 0), (0, 1)] if connectivity == 4 else [(1, 0), (0, 1), (1, 1), (1, -1)]
    probe = cells.select(
        pack(F.col("cx"), F.col("cy")).alias("id_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("_nb"),
    ).select("id_a", F.col("_nb.cx").alias("cx"), F.col("_nb.cy").alias("cy"))
    pairs = probe.join(
        cells.select("cx", "cy", pack(F.col("cx"), F.col("cy")).alias("id_b")),
        ["cx", "cy"],
    ).select("id_a", "id_b")
    comp = dup_clusters(pairs, a_col="id_a", b_col="id_b", max_rounds=max_rounds)
    comp = comp.select(F.col("doc_id").alias("_id"), "comp")
    return (
        cells.select(
            "cx", "cy", "c", pack(F.col("cx"), F.col("cy")).alias("_id")
        )
        .join(comp, "_id", "left")
        .select(
            "cx", "cy", "c",
            F.coalesce(F.col("comp"), F.col("_id")).cast("bigint").alias("comp"),
        )
    )


def stream_order(flow: DataFrame, max_rounds: int = 4) -> DataFrame:
    """Bounded Strahler stream order over the D8 forest (Strahler 1957)
    — the channel-hierarchy classification of hydrology: order 1 =
    headwater cells, and a cell's order rises only where two
    equal-order tributaries CONFLUENCE (max child order, +1 iff that
    max is achieved by >= 2 children).  Applied to the density surface
    it ranks drainage spines of the point mass.

    Bounded semantics (the flow_accumulation contract): every cell
    starts at order 1 and `max_rounds` simultaneous update rounds run;
    orders only grow, and a cell whose tributary tree is shallower than
    the bound is exact (order k needs 2^(k-1) leaves, so 4 rounds
    already resolves order 5 — continental basins top out around 12).

    Returns (cx, cy, sorder).

    Plan: per round ONE equi-join (children orders -> parent) + a
    map-combined collect_list fold — D8 in-degree is <= 8, so the list
    is bounded and the confluence rule is a codegen array expression;
    localCheckpoint per round cuts lineage.
    """
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    step_dx = F.element_at(
        F.create_map(*[F.lit(v) for kv in _D8_STEP.items() for v in (kv[0], kv[1][0])]),
        F.col("d8"),
    )
    step_dy = F.element_at(
        F.create_map(*[F.lit(v) for kv in _D8_STEP.items() for v in (kv[0], kv[1][1])]),
        F.col("d8"),
    )
    cells = flow.select("cx", "cy").localCheckpoint(eager=True)
    edges = (
        flow.filter(F.col("d8") != 0)
        .select(
            F.col("cx").alias("fx"), F.col("cy").alias("fy"),
            (F.col("cx") + step_dx).alias("cx"),
            (F.col("cy") + step_dy).alias("cy"),
        )
        .localCheckpoint(eager=True)
    )
    order = cells.withColumn("sorder", F.lit(1).cast("bigint"))
    for _ in range(max_rounds):
        child = edges.join(
            order.select(
                F.col("cx").alias("fx"), F.col("cy").alias("fy"),
                F.col("sorder").alias("_co"),
            ),
            ["fx", "fy"],
        )
        folded = (
            child.groupBy("cx", "cy")
            .agg(F.sort_array(F.collect_list("_co"), asc=False).alias("_os"))
            .select(
                "cx", "cy",
                F.when(
                    (F.size("_os") >= 2)
                    & (F.element_at("_os", 1) == F.element_at("_os", 2)),
                    F.element_at("_os", 1) + 1,
                )
                .otherwise(F.element_at("_os", 1))
                .alias("_up"),
            )
        )
        order = (
            cells.join(folded, ["cx", "cy"], "left")
            .select(
                "cx", "cy",
                F.greatest(
                    F.lit(1).cast("bigint"), F.coalesce(F.col("_up"), F.lit(1))
                ).cast("bigint").alias("sorder"),
            )
            .localCheckpoint(eager=True)
        )
    return order


def curvature_components(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Second-derivative stencil components over the density surface —
    the curvature step of the terrain suite (slope_components gives the
    gradient; this gives convexity/concavity: peaks, pits, ridges and
    saddles of the count raster):

        dxx  = c_E + c_W - 2c          dyy  = c_N + c_S - 2c
        dxy4 = c_NE + c_SW - c_NW - c_SE       (4x the mixed derivative)
        lap  = dxx + dyy               (the discrete Laplacian)

    per occupied cell, absent neighbors ZERO (the sparse-lattice
    convention shared with slope_components / flow_directions).  All
    outputs are exact BIGINTs; Gaussian/profile curvature floats are the
    caller's division.  lap < 0 marks local convexity (peak-like), the
    exact-integer sibling of the kde_peaks NMS test.

    Plan: identical shape to slope_components — cells groupBy (pinned),
    ONE 8-offset probe explode carrying per-component weights, ONE
    equi-join, a map-combined groupBy, LEFT join back so isolated cells
    report the flat stencil (-2c, -2c, 0).  Never all-pairs.
    """
    cxc = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cyc = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    cells = (
        df.select(cxc.alias("cx"), cyc.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = _pin(cells)
    # (dx, dy) -> (wxx, wyy, wxy) as seen FROM the target cell
    weights = {
        (1, 0): (1, 0, 0), (-1, 0): (1, 0, 0),
        (0, 1): (0, 1, 0), (0, -1): (0, 1, 0),
        (1, 1): (0, 0, 1), (-1, -1): (0, 0, 1),
        (-1, 1): (0, 0, -1), (1, -1): (0, 0, -1),
    }
    offs = F.array(
        *[
            F.struct(
                F.lit(-dx).alias("dx"), F.lit(-dy).alias("dy"),
                F.lit(wxx).alias("wxx"), F.lit(wyy).alias("wyy"),
                F.lit(wxy).alias("wxy"),
            )
            for (dx, dy), (wxx, wyy, wxy) in weights.items()
        ]
    )
    probe = cells.select(
        "cx", "cy", F.col("c").alias("c_j"), F.explode(offs).alias("_o")
    ).select(
        "c_j",
        (F.col("cx") + F.col("_o.dx")).alias("cx"),
        (F.col("cy") + F.col("_o.dy")).alias("cy"),
        F.col("_o.wxx").alias("wxx"),
        F.col("_o.wyy").alias("wyy"),
        F.col("_o.wxy").alias("wxy"),
    )
    sums = (
        probe.join(cells.select("cx", "cy"), ["cx", "cy"])
        .groupBy("cx", "cy")
        .agg(
            F.sum(F.col("wxx") * F.col("c_j")).alias("_sxx"),
            F.sum(F.col("wyy") * F.col("c_j")).alias("_syy"),
            F.sum(F.col("wxy") * F.col("c_j")).alias("_sxy"),
        )
    )
    z = F.lit(0).cast("bigint")
    sxx = F.coalesce(F.col("_sxx"), z)
    syy = F.coalesce(F.col("_syy"), z)
    sxy = F.coalesce(F.col("_sxy"), z)
    dxx = (sxx - 2 * F.col("c")).cast("bigint")
    dyy = (syy - 2 * F.col("c")).cast("bigint")
    return cells.join(sums, ["cx", "cy"], "left").select(
        "cx", "cy", "c",
        dxx.alias("dxx"),
        dyy.alias("dyy"),
        sxy.cast("bigint").alias("dxy4"),
        (dxx + dyy).cast("bigint").alias("lap"),
    )


def aspect_octants(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Aspect (gradient direction) classified into the eight 45-degree
    sectors — the terrain aspect map with ZERO trig: sector k covers
    [k*45, (k+1)*45) degrees counterclockwise from +x (east), and the
    classification is pure sign / magnitude comparisons on the exact
    Horn gradient (gx, gy) from slope_components:

        0: gx>0,  0<=gy<gx      (E..NE)     4: gx<0,  0>=gy>gx  (W..SW)
        1: gy>0,  gx<=gy        ... etc — axis hits start a sector,
        diagonal hits (|gx|=|gy|) belong to the counterclockwise-next
        sector, so every nonzero gradient lands in exactly one octant.

    Flat cells (gx = gy = 0) report octant -1.  The float aspect angle
    is the caller's atan2; rankings/rollups by octant never touch a
    float, so aspect histograms are bit-reproducible.

    Plan: slope_components' plan plus one codegen CASE — no extra
    shuffle.  Returns (cx, cy, c, gx, gy, octant).
    """
    g = slope_components(df, x=x, y=y, cell_shift=cell_shift)
    gx, gy = F.col("gx"), F.col("gy")
    agx, agy = F.abs(gx), F.abs(gy)
    octant = (
        F.when((gx == 0) & (gy == 0), -1)
        .when((gx > 0) & (gy >= 0) & (agy < agx), 0)
        .when((gy > 0) & (gx > 0), 1)          # remaining Q1 incl. diagonal
        .when((gy > 0) & (gx <= 0) & (agx < agy), 2)
        .when((gx < 0) & (gy > 0), 3)          # remaining Q2 incl. diagonal
        .when((gx < 0) & (gy <= 0) & (agy < agx), 4)
        .when((gy < 0) & (gx < 0), 5)          # remaining Q3 incl. diagonal
        .when((gy < 0) & (gx >= 0) & (agx < agy), 6)
        .otherwise(7)                          # remaining Q4 incl. diagonal
    )
    return g.select("cx", "cy", "c", "gx", "gy", octant.cast("int").alias("octant"))
