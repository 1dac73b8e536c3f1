"""Trajectory / movement analytics over timestamped point streams.

The reference engine's features are static OSM geometries; a fleet/GPS
workload over the same integer-Mercator grid needs the per-entity
*temporal* derivatives the static model has no surface for:

- ``track_derivatives`` — consecutive-fix deltas per entity (dt, L1/L2
  displacement, quantized speed), the building block for speed maps,
  odometer rollups, and outlier (teleport) detection.
- ``grid_dwell`` — stay-point detection: maximal runs of consecutive
  fixes inside one grid cell, kept when the run dwells long enough.
  The classic gaps-and-islands plan (two row_numbers, one subtraction)
  on the same shifted-floor cells the tiling operators use
  (kernels/tile.py; reference tile math TileCatalog.java:35).

Spark-first shape: both operators are ONE shuffle on the entity key
(window partition), then pure codegen — no Python, no crossJoin, no
driver collects.  At 100 TB the entity key is the natural partitioner
(millions of entities, bounded fixes per entity); AQE handles residual
skew on hot entities.

Exactness discipline (functions/synth.py): displacements stay in 64-bit
integers, timestamps become epoch seconds through the TZ-proof
TIMESTAMP_NTZ difference (temporal._wall_secs), and the only doubles are
IEEE-exact casts/mults/sqrt applied in the same order as the DuckDB
oracle, quantized to integer micro-units at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gol_tool_spark.operators.temporal import _wall_secs

HALF = 1 << 31


def track_derivatives(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-entity consecutive-fix derivatives, ordered by (ts, id).

    Returns one row per fix that HAS a predecessor: dt_s (epoch-second
    delta, >= 0), l1 (exact |dx|+|dy| in map units), l2_q
    (round(sqrt(dx^2+dy^2)) with the squares computed in doubles — both
    operands < 2^33 so the casts are exact and the IEEE mults/sqrt are
    deterministic), and speed_q = round(l1/dt * 1e6) micro-units/s
    (NULL when dt_s = 0, i.e. same-second fixes).
    """
    # order by (epoch second, id): deterministic and engine-independent —
    # the id tiebreak also covers same-second fixes
    w = Window.partitionBy(by).orderBy("_ws", id_col)
    ws = _wall_secs(ts)
    cur = df.select(
        F.col(by), F.col(id_col), ws.alias("_ws"),
        F.col(x).cast("bigint").alias("_x"), F.col(y).cast("bigint").alias("_y"),
    )
    lagged = (
        cur.withColumn("_pws", F.lag("_ws").over(w))
        .withColumn("_px", F.lag("_x").over(w))
        .withColumn("_py", F.lag("_y").over(w))
        .filter(F.col("_pws").isNotNull())
    )
    dx = F.col("_x") - F.col("_px")
    dy = F.col("_y") - F.col("_py")
    dt = (F.col("_ws") - F.col("_pws")).alias("dt_s")
    l1 = (F.abs(dx) + F.abs(dy)).alias("l1")
    dxd = dx.cast("double")
    dyd = dy.cast("double")
    l2_q = F.round(F.sqrt(dxd * dxd + dyd * dyd)).cast("bigint").alias("l2_q")
    out = lagged.select(F.col(by), F.col(id_col), dt, l1, l2_q)
    speed_q = F.when(
        F.col("dt_s") > 0,
        F.round(F.col("l1").cast("double") / F.col("dt_s").cast("double") * F.lit(1000000.0)).cast("bigint"),
    )
    return out.withColumn("speed_q", speed_q)


def grid_dwell(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    x: str = "x",
    y: str = "y",
    cell_shift: int = 29,
    min_dwell_s: int = 600,
    min_fixes: int = 2,
) -> DataFrame:
    """Stay-point detection: maximal runs of consecutive fixes (per
    entity, time order) that stay inside one grid cell of width
    2^cell_shift, kept when the run spans >= min_dwell_s seconds and
    >= min_fixes fixes.

    Cells are the shifted-floor grid ((x + 2^31) >> shift — identical to
    the tiling/IDW cell math so dwell output joins directly against tile
    catalogs).  Islands via the rn-difference trick: row_number over
    (entity) minus row_number over (entity, cell) is constant exactly on
    maximal same-cell runs.  One shuffle (entity key), all codegen.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    base = df.select(
        F.col(by), F.col(id_col), _wall_secs(ts).alias("_ws"),
        cx.alias("cx"), cy.alias("cy"),
    )
    w_all = Window.partitionBy(by).orderBy("_ws", id_col)
    w_cell = Window.partitionBy(by, "cx", "cy").orderBy("_ws", id_col)
    isl = (F.row_number().over(w_all) - F.row_number().over(w_cell)).alias("island")
    runs = (
        base.withColumn("island", isl)
        .groupBy(by, "cx", "cy", "island")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.min("_ws").alias("enter_s"),
            (F.max("_ws") - F.min("_ws")).alias("dwell_s"),
        )
    )
    return runs.filter(
        (F.col("dwell_s") >= F.lit(int(min_dwell_s))) & (F.col("n_fixes") >= F.lit(int(min_fixes)))
    ).select(by, "cx", "cy", "island", "n_fixes", "enter_s", "dwell_s")


def od_matrix(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    x: str = "x",
    y: str = "y",
    cell_shift: int = 29,
) -> DataFrame:
    """Origin–destination flow matrix between grid cells.

    Per entity, consecutive fixes inside the same cell collapse to one
    *visit* (the grid_dwell islands trick with no dwell threshold), so a
    ping-heavy stay contributes one visit, not n.  Each consecutive
    visit pair (time order) is one trip from the origin cell to the
    (always different — visits are maximal runs) destination cell; the
    matrix aggregates trips per (from, to) cell pair with the distinct
    entity count.

    Plan: one shuffle on the entity key (shared by both windows and the
    visit collapse — Spark reuses the exchange), a lag over visits, then
    one map-combined agg on the (from, to) key.  count_distinct(entity)
    is exact; at 100 TB swap for approx_count_distinct per taste.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    base = df.select(
        F.col(by), F.col(id_col), _wall_secs(ts).alias("_ws"),
        cx.alias("cx"), cy.alias("cy"),
    )
    w_all = Window.partitionBy(by).orderBy("_ws", id_col)
    w_cell = Window.partitionBy(by, "cx", "cy").orderBy("_ws", id_col)
    visits = (
        base.withColumn("_rn", F.row_number().over(w_all))
        .withColumn("island", F.col("_rn") - F.row_number().over(w_cell))
        .groupBy(by, "cx", "cy", "island")
        # min fix row-number = the visit's global position in the track:
        # strictly increasing and unique per entity (enter_s alone can tie
        # when same-second fixes land in different cells)
        .agg(F.min("_rn").alias("_seq"))
    )
    w_vis = Window.partitionBy(by).orderBy("_seq")
    trips = (
        visits.withColumn("from_cx", F.lag("cx").over(w_vis))
        .withColumn("from_cy", F.lag("cy").over(w_vis))
        .filter(F.col("from_cx").isNotNull())
    )
    return (
        trips.groupBy("from_cx", "from_cy", F.col("cx").alias("to_cx"), F.col("cy").alias("to_cy"))
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.countDistinct(by).alias("n_entities"),
        )
    )


def colocation(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    x: str = "x",
    y: str = "y",
    max_dt_s: int = 3600,
    max_d: int = 1 << 16,
) -> DataFrame:
    """Spatio-temporal co-location join (contact detection): entity
    pairs (a < b) that had fixes within max_dt_s seconds AND within
    max_d map units of each other, with the exact contact count and the
    closest squared distance.

    Blocking is the band-join classic on BOTH axes at once: the probe
    side explodes each fix to the 3 time buckets x 3x3 space cells that
    could hold a partner (bucket width = max_dt_s, cell width = the
    power of two >= max_d), the build side stays 1 row per fix, and ONE
    equi-join on (bucket, cx, cy) pairs candidates — each candidate fix
    pair meets on exactly one probe row (offsets are distinct), so no
    dedup shuffle is needed.  The exact |dt| and integer d^2 predicates
    then run in codegen (dx, dy <= 2*cell so d^2 is exact int64).

    Scale: probe fan-out is a fixed 27x on slim (keys, coords) rows;
    per-(bucket, cell) volume is density-bounded; hot cells land on AQE
    skew split.  No Python, no crossJoin, no driver collects.
    """
    cell_shift = max(int(max_d - 1).bit_length(), 1)
    # HALF-SPACE probing (guide §2.3: shuffle fewer bytes): instead of all
    # 27 offsets + a ua<ub orientation cut, probe only the 13 offsets
    # lexicographically above (0,0,0) plus (0,0,0) itself — an unordered
    # fix pair whose bucket/cell delta is nonzero meets on exactly one
    # probe row (whichever side's delta is positive), and a same-cell
    # pair meets twice and is cut by ea<eb below.  The exploded exchange
    # carries 14/27 = ~half the rows for the identical pair set.
    probe_sets = [
        (dt, dcx, dcy)
        for dt in (-1, 0, 1) for dcx in (-1, 0, 1) for dcy in (-1, 0, 1)
        if (dt, dcx, dcy) >= (0, 0, 0)
    ]
    base = df.select(
        F.col(by).alias("_u"), F.col(id_col).alias("_e"),
        _wall_secs(ts).alias("_ws"),
        F.col(x).cast("bigint").alias("_x"), F.col(y).cast("bigint").alias("_y"),
    ).withColumn("_tb", F.floor(F.col("_ws") / F.lit(int(max_dt_s)))) \
     .withColumn("_cx", F.shiftright(F.col("_x") + F.lit(HALF), cell_shift)) \
     .withColumn("_cy", F.shiftright(F.col("_y") + F.lit(HALF), cell_shift))
    probe = base.select(
        F.col("_u").alias("ua"), F.col("_e").alias("ea"),
        F.col("_ws").alias("wsa"), F.col("_x").alias("xa"), F.col("_y").alias("ya"),
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("_tb") + dt).alias("tb"),
                    (F.col("_cx") + dcx).alias("cx"),
                    (F.col("_cy") + dcy).alias("cy"),
                )
                for dt, dcx, dcy in probe_sets
            ])
        ).alias("_k"),
    ).select("ua", "ea", "wsa", "xa", "ya",
             F.col("_k.tb").alias("tb"), F.col("_k.cx").alias("cx"), F.col("_k.cy").alias("cy"))
    build = base.select(
        F.col("_u").alias("ub"), F.col("_e").alias("eb"),
        F.col("_ws").alias("wsb"), F.col("_x").alias("xb"), F.col("_y").alias("yb"),
        F.col("_tb").alias("tb"), F.col("_cx").alias("cx"), F.col("_cy").alias("cy"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    # offset==0 <=> the probe fix's own composite cell equals the join
    # key (recomputed in codegen from the coords already on the row);
    # only there can a pair meet twice, so only there the ea<eb cut
    # applies.  Every unordered cross-user fix pair survives exactly
    # once, in whichever orientation the probing happened — the
    # least/greatest group key restores the user_a < user_b contract.
    same_cell = (
        (F.floor(F.col("wsa") / F.lit(int(max_dt_s))) == F.col("tb"))
        & (F.shiftright(F.col("xa") + F.lit(HALF), cell_shift) == F.col("cx"))
        & (F.shiftright(F.col("ya") + F.lit(HALF), cell_shift) == F.col("cy"))
    )
    contacts = (
        probe.join(build, ["tb", "cx", "cy"])
        .filter(F.col("ua") != F.col("ub"))
        .filter(~same_cell | (F.col("ea") < F.col("eb")))
        .filter(F.abs(F.col("wsa") - F.col("wsb")) <= F.lit(int(max_dt_s)))
        .filter(d2 <= F.lit(int(max_d) * int(max_d)))
    )
    return (
        contacts.groupBy(
            F.least("ua", "ub").alias("user_a"),
            F.greatest("ua", "ub").alias("user_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_contacts"),
            F.min(d2).alias("min_d2"),
        )
    )


def resample_track(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    x: str = "x",
    y: str = "y",
    step_s: int = 3600,
) -> DataFrame:
    """Resample each entity's track onto the fixed step_s time grid by
    linear interpolation between the bracketing fixes — the
    normalization step before any cross-track analytics (alignment,
    similarity, co-location at matched timestamps).

    Grid times are the multiples of step_s inside [first fix, last fix]
    per entity.  For each grid time t: `next` = the first fix (by (ws,
    id)) with ws >= t, `prev` = the last fix with ws < t; an exact hit
    (next.ws == t) returns that fix's position, otherwise position =
    floor((x0*(t1-t) + x1*(t-t0)) / (t1-t0)) evaluated on +2^31-biased
    coordinates so every term is a non-negative exact int64 and integer
    division IS floor division in every engine (numerator <= 2^32 *
    track-span-seconds; keep spans under ~2^30 s, i.e. 34 years).

    Plan: one entity-key shuffle shared by the min/max agg, the
    grid explode, and the two IGNORE NULLS window scans over the
    union of fix and grid rows.  Pure codegen, no Python.
    """
    step = int(step_s)
    ws = _wall_secs(ts)
    fixes = df.select(
        F.col(by), ws.alias("_ws"), F.col(id_col).alias("_id"),
        (F.col(x).cast("bigint") + F.lit(HALF)).alias("_xb"),
        (F.col(y).cast("bigint") + F.lit(HALF)).alias("_yb"),
    )
    span = fixes.groupBy(by).agg(F.min("_ws").alias("_lo"), F.max("_ws").alias("_hi"))
    # an entity whose span straddles no grid multiple emits nothing
    # (sequence() would otherwise run BACKWARDS when start > stop)
    span = span.filter(
        F.ceil(F.col("_lo") / F.lit(step)) <= F.floor(F.col("_hi") / F.lit(step))
    )
    grid = span.select(
        F.col(by),
        F.explode(
            # epoch seconds are ~2^31 so the double divisions are exact
            # enough for ceil/floor (mirrored verbatim in the SQL twin)
            F.sequence(
                F.ceil(F.col("_lo") / F.lit(step)).cast("bigint"),
                F.floor(F.col("_hi") / F.lit(step)).cast("bigint"),
            )
        ).alias("_k"),
    ).select(F.col(by), (F.col("_k") * F.lit(step)).alias("_ws"))
    # union fixes + grid; grid rows sort BEFORE same-second fixes so the
    # forward scan's first fix with ws >= t includes the exact hit and
    # the backward scan's last fix has ws strictly < t
    f_rows = fixes.select(by, "_ws", F.lit(1).alias("_kind"), "_id", "_xb", "_yb")
    g_rows = grid.select(
        by, "_ws", F.lit(0).alias("_kind"),
        F.lit(None).cast("long").alias("_id"),
        F.lit(None).cast("long").alias("_xb"), F.lit(None).cast("long").alias("_yb"),
    )
    both = f_rows.unionByName(g_rows)
    # forward scan rewritten over the REVERSED sort: `first ignore nulls`
    # over (currentRow, unboundedFollowing) makes Spark recompute the
    # whole shrinking frame per row — O(rows^2) per entity; `last ignore
    # nulls` over (unboundedPreceding, currentRow) on the exact reverse
    # order (desc on every sort key, so ties reverse too) selects the
    # same row and is evaluated incrementally in O(rows).  Both windows
    # share the entity hash partitioning, so the flip costs one extra
    # in-partition sort, no exchange.
    w_fwd = (
        Window.partitionBy(by)
        .orderBy(
            F.col("_ws").desc(), F.col("_kind").desc(), F.col("_id").desc_nulls_last()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy(by)
        .orderBy("_ws", "_kind", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = (
        both.withColumn("_nws", F.last(F.when(F.col("_kind") == 1, F.col("_ws")), True).over(w_fwd))
        .withColumn("_nx", F.last("_xb", True).over(w_fwd))
        .withColumn("_ny", F.last("_yb", True).over(w_fwd))
        .withColumn("_pws", F.last(F.when(F.col("_kind") == 1, F.col("_ws")), True).over(w_bwd))
        .withColumn("_px", F.last("_xb", True).over(w_bwd))
        .withColumn("_py", F.last("_yb", True).over(w_bwd))
        .filter(F.col("_kind") == 0)
    )
    t, t0, t1 = F.col("_ws"), F.col("_pws"), F.col("_nws")
    exact = F.col("_nws") == t
    # exact integer floor division (numerators can pass 2^53, so double
    # division + floor would be wrong): name the terms, use SQL DIV
    staged = scanned.select(
        F.col(by), F.col("_ws").alias("grid_s"), exact.alias("_hit"),
        F.col("_nx"), F.col("_ny"),
        (F.col("_px") * (t1 - t) + F.col("_nx") * (t - t0)).alias("_numx"),
        (F.col("_py") * (t1 - t) + F.col("_ny") * (t - t0)).alias("_numy"),
        (t1 - t0).alias("_den"),
    )
    x_out = F.when(F.col("_hit"), F.col("_nx")).otherwise(F.expr("_numx DIV _den"))
    y_out = F.when(F.col("_hit"), F.col("_ny")).otherwise(F.expr("_numy DIV _den"))
    return staged.select(
        F.col(by), F.col("grid_s"),
        (x_out - F.lit(HALF)).alias("x"), (y_out - F.lit(HALF)).alias("y"),
    )


def radius_gyration(
    df: DataFrame,
    by: str = "user_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-entity radius of gyration components (Gonzalez et al. 2008's
    mobility statistic), in EXACT integer arithmetic.

    rog^2 = (1/n) * sum_i ((x_i - mx)^2 + (y_i - my)^2) with (mx, my)
    the centroid — a rational.  Scaling by n^2 clears it exactly:

        g2 = n * (sum x^2 + sum y^2) - (sum x)^2 - (sum y)^2
           = n^2 * rog^2

    so the engine returns (n_fix, sx, sy, g2) bit-exact (g2 as a
    DECIMAL(38,0) string — squares of 2^31-scale coords summed over the
    track exceed int64) and the caller's only float step is
    sqrt(g2)/n.  ONE map-combined groupBy on the entity key; no joins,
    no windows — the cheapest statistic in the trajectory suite.
    """
    d = lambda c: c.cast("decimal(38,0)")
    xx, yy = F.col(x).cast("bigint"), F.col(y).cast("bigint")
    agg = df.groupBy(F.col(by)).agg(
        F.count(F.lit(1)).alias("n_fix"),
        F.sum(xx).alias("sx"),
        F.sum(yy).alias("sy"),
        F.sum(d(xx * xx) + d(yy * yy)).alias("_ss"),
    )
    return agg.select(
        by, "n_fix", "sx", "sy",
        (d(F.col("n_fix")) * F.col("_ss") - d(F.col("sx")) * d(F.col("sx"))
         - d(F.col("sy")) * d(F.col("sy"))).cast("string").alias("g2"),
    )

def location_diversity(
    df: DataFrame,
    by: str = "user_id",
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
) -> DataFrame:
    """Per-entity visit-concentration components (Simpson 1949's
    diversity index over visited grid cells — the standard mobility
    "how predictable is this entity" statistic next to radius_gyration
    above; entropy needs logs, Simpson stays rational so the engine
    answer is EXACT).

    Per entity: (n_fix, n_cells, top_c, sum_sq) with n_i the fix count
    in each visited 2^cell_shift-wide cell, top_c = max n_i and
    sum_sq = sum n_i^2.  Simpson D = 1 - sum_sq / n_fix^2 is the
    caller's one float step (0 = always in one cell, ->1 = spread);
    top_c/n_fix is the top-location predictability.  sum_sq <= n_fix^2
    stays inside int64 for n_fix < 2^31 PER ENTITY — a 2-billion-fix
    single track is beyond any real workload, so no decimal lane here
    (unlike the corpus-wide accumulators in geostats).

    Plan: two map-combined groupBys on (entity, cell) then (entity) —
    no joins, no windows; the entity exchange is shared by both aggs.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    per_cell = (
        df.select(F.col(by), cx.alias("cx"), cy.alias("cy"))
        .groupBy(by, "cx", "cy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_cell.groupBy(by).agg(
        F.sum("c").alias("n_fix"),
        F.count(F.lit(1)).alias("n_cells"),
        F.max("c").alias("top_c"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )

def track_ohlc(
    df: DataFrame,
    step_s: int = 3600,
    by: str = "user_id",
    id_col: str = "event_id",
    ts: str = "ts",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-entity per-time-window track downsample — the positional
    OHLC (open/close position + per-axis extent) every telemetry
    pipeline uses to turn raw fixes into a bounded-size summary before
    long-horizon analytics.

    Window = floor(epoch_seconds / step_s); first/last fix in the
    window is chosen by (seconds, id) — the struct-MIN/MAX trick keeps
    the whole operator ONE map-combined groupBy (no window functions,
    no second shuffle; ties broken deterministically by the id).
    Outputs are exact integers end to end.
    """
    ws = _wall_secs(ts)
    sel = df.select(
        F.col(by),
        (ws - (((ws % step_s) + step_s) % step_s)).alias("win_s"),
        F.struct(ws.alias("s"), F.col(id_col).alias("i"),
                 F.col(x).alias("x"), F.col(y).alias("y")).alias("_fix"),
        F.col(x).cast("bigint").alias("_x"),
        F.col(y).cast("bigint").alias("_y"),
    )
    o = F.min("_fix")
    c = F.max("_fix")
    return sel.groupBy(by, "win_s").agg(
        F.count(F.lit(1)).alias("n_fix"),
        o.getField("x").alias("o_x"), o.getField("y").alias("o_y"),
        c.getField("x").alias("c_x"), c.getField("y").alias("c_y"),
        F.min("_x").alias("x_min"), F.max("_x").alias("x_max"),
        F.min("_y").alias("y_min"), F.max("_y").alias("y_max"),
    )

def heading_rose(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-entity movement-direction distribution ("direction rose"):
    each consecutive displacement is classified into one of eight
    45-degree sectors by INTEGER sign/magnitude comparisons only — no
    atan2, so the result is exact and engine-independent.  Sector k owns
    angles [45k, 45k+45) CCW from +x (boundaries deterministic:
    the axis/diagonal belongs to the sector it opens).  Zero
    displacements (same coordinate twice) are skipped.

    Returns (by, octant, n_moves, l1_sum) — l1_sum the exact total
    L1 length moved in that direction.  Plan: one entity-key window
    (lag) + one map-combined groupBy.
    """
    w = Window.partitionBy(by).orderBy("_ws", id_col)
    cur = df.select(
        F.col(by), F.col(id_col), _wall_secs(ts).alias("_ws"),
        F.col(x).cast("bigint").alias("_x"), F.col(y).cast("bigint").alias("_y"),
    )
    lagged = (
        cur.withColumn("_px", F.lag("_x").over(w))
        .withColumn("_py", F.lag("_y").over(w))
        .filter(F.col("_px").isNotNull())
    )
    dx = F.col("_x") - F.col("_px")
    dy = F.col("_y") - F.col("_py")
    adx, ady = F.abs(dx), F.abs(dy)
    octant = (
        F.when((dx > 0) & (dy >= 0) & (ady < adx), 0)
        .when((dx > 0) & (dy > 0) & (ady >= adx), 1)
        .when((dx <= 0) & (dy > 0) & (adx < ady), 2)
        .when((dx < 0) & (dy > 0) & (adx >= ady), 3)
        .when((dx < 0) & (dy <= 0) & (ady < adx), 4)
        .when((dx < 0) & (dy < 0) & (ady >= adx), 5)
        .when((dx >= 0) & (dy < 0) & (adx < ady), 6)
        .when((dx > 0) & (dy < 0) & (adx >= ady), 7)
    )
    moves = lagged.select(
        F.col(by), octant.alias("octant"), (adx + ady).alias("_l1")
    ).filter(F.col("octant").isNotNull())  # zero displacement matches no arm
    return moves.groupBy(by, "octant").agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.sum("_l1").alias("l1_sum"),
    )


def traj_similarity(
    df: DataFrame,
    by: str = "user_id",
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
    max_users_per_cell: int = 64,
    min_shared: int = 2,
) -> DataFrame:
    """Trajectory-similarity join: entity pairs whose visited-cell
    signatures overlap.  An entity's signature is its set of DISTINCT
    grid cells (shifted-floor, width 2^cell_shift — the same cell math
    as grid_dwell/the tiling operators).  Cells visited by more than
    ``max_users_per_cell`` entities carry no discriminative signal
    (transit hubs) and are excluded from the signature ENTIRELY —
    a deterministic stopword rule, not a recall cap, so results are
    exactly reproducible and oracle-checkable.

    Returns (user_a, user_b, n_shared, n_a, n_b) with user_a < user_b
    and n_shared >= min_shared; Jaccard = n_shared/(n_a+n_b-n_shared)
    is left to the caller as an exact-integer division.

    Plan: distinct (2-key shuffle), popularity groupBy, one cell
    equi-join for pairs (never all-pairs: fan-out per cell is capped by
    the stopword rule at max_users_per_cell^2/2), one pair groupBy, two
    size equi-joins.  At 100 TB the pair join is the cost center and
    its worst case is #cells * cap^2 — tune cap/shift per workload.
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    # the distinct signature relation feeds pop AND the pop join's other
    # side (and sizes/pairable downstream reference that join twice
    # more) — materialize the distinct once; it is already the fully
    # collapsed (entity, cell) set, far smaller than the fix log
    cells = df.select(F.col(by), cx.alias("cx"), cy.alias("cy")).distinct() \
        .localCheckpoint(eager=False)
    pop = cells.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("_nu"))
    sig = cells.join(pop, ["cx", "cy"]).filter(F.col("_nu") <= max_users_per_cell) \
        .localCheckpoint(eager=False)
    sizes = sig.groupBy(by).agg(F.count(F.lit(1)).alias("n_cells"))
    # single-user cells can't produce a pair — drop them before the
    # self-join so the shuffle carries only pairable cells
    pairable = sig.filter(F.col("_nu") >= 2).select(
        F.col(by).alias("_u"), "cx", "cy"
    )
    a = pairable.alias("a")
    b = pairable.alias("b")
    shared = (
        a.join(b, ["cx", "cy"])
        .filter(F.col("a._u") < F.col("b._u"))
        .groupBy(F.col("a._u").alias("user_a"), F.col("b._u").alias("user_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(sizes.select(F.col(by).alias("user_a"), F.col("n_cells").alias("n_a")), "user_a")
        .join(sizes.select(F.col(by).alias("user_b"), F.col("n_cells").alias("n_b")), "user_b")
        .select("user_a", "user_b", "n_shared", "n_a", "n_b")
    )


_SAX_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"  # 32 symbols (geohash set)


def traj_editdist(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    x: str = "x",
    y: str = "y",
    cell_shift: int = 26,
    max_users_per_cell: int = 64,
    min_shared: int = 2,
    max_syms: int = 512,
) -> DataFrame:
    """Trajectory edit distance over SAX-style symbol sequences: each
    entity's track becomes a string (one symbol per visited cell,
    consecutive repeats collapsed, truncated to max_syms), and
    Levenshtein distance is computed for CANDIDATE pairs only — the
    pairs traj_similarity surfaces by shared-cell signature.  Order-
    aware where Jaccard is order-blind: two commuters covering the same
    cells in opposite directions share a signature but sit a full
    reversal apart in edit distance.

    Symbolization is the deterministic 32-letter hash sym =
    alphabet[(cx*37 + cy*101) % 32] (collisions are part of the
    declared semantics, as in SAX); truncation to max_syms bounds the
    per-pair DP at max_syms^2 JVM cells.  Everything is built-in
    (window lag-collapse, struct-sort join, F.levenshtein) — zero
    Python on any path.

    Returns (user_a, user_b, n_shared, editdist, len_a, len_b).
    """
    cx = F.shiftright(F.col(x).cast("bigint") + F.lit(HALF), cell_shift)
    cy = F.shiftright(F.col(y).cast("bigint") + F.lit(HALF), cell_shift)
    sym = F.substring(
        F.lit(_SAX_ALPHABET),
        (F.pmod(cx * F.lit(37) + cy * F.lit(101), F.lit(32)) + 1).cast("int"),
        1,
    )
    base = df.select(
        F.col(by), F.col(id_col), _wall_secs(ts).alias("_ws"), sym.alias("_sym")
    )
    w_ord = Window.partitionBy(by).orderBy("_ws", id_col)
    collapsed = (
        base.withColumn("_prev", F.lag("_sym").over(w_ord))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("_sym")))
        .withColumn("_k", F.row_number().over(w_ord))
        .filter(F.col("_k") <= max_syms)
    )
    strings = collapsed.groupBy(by).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_ws", F.col(id_col).alias("_id"), "_sym"))),
                lambda s: s["_sym"],
            ),
            "",
        ).alias("_str")
    )
    cand = traj_similarity(
        df, by=by, x=x, y=y, cell_shift=cell_shift,
        max_users_per_cell=max_users_per_cell, min_shared=min_shared,
    ).select("user_a", "user_b", "n_shared")
    joined = (
        cand.join(strings.select(F.col(by).alias("user_a"), F.col("_str").alias("_sa")), "user_a")
        .join(strings.select(F.col(by).alias("user_b"), F.col("_str").alias("_sb")), "user_b")
    )
    return joined.select(
        "user_a", "user_b", "n_shared",
        F.levenshtein("_sa", "_sb").alias("editdist"),
        F.length("_sa").cast("int").alias("len_a"),
        F.length("_sb").cast("int").alias("len_b"),
    )


HMM_SCHEMA = "user_id long, event_id long, seg long, d2 double, n_cands int"


def hmm_match(
    fixes: DataFrame,
    segs: DataFrame,
    cell_shift: int = 16,
    switch_cost: float = 1.0e9,
    id_col: str = "user_id",
    fix_col: str = "event_id",
    t_col: str = "t",
) -> DataFrame:
    """Sequence-aware map matching (the sticky-HMM simplification of
    Newson & Krumm 2009): per entity, choose ONE segment per fix so the
    whole track minimizes

        sum of point-to-segment d2  +  switch_cost * (segment changes)

    — nearest-segment snapping (segments.snap_points) flaps between
    near-parallel candidates fix by fix; the Viterbi chain pays a
    penalty per switch, so tracks stick to one road until the evidence
    says otherwise.  Without a routable graph the transition model is
    the switch indicator (documented simplification; the full
    route-distance model needs the graph the data contract doesn't
    carry).

    Semantics (all deterministic, pytest-twinned): candidates per fix =
    segments within one cell width (same blocking + clamped-projection
    d2 + IEEE evaluation order as snap_points); fixes with NO candidate
    are emitted with seg NULL and BREAK the chain (costs reset — a
    tunnel/garage gap starts a fresh track); cost ties prefer staying
    on the same segment, then the smaller segment id; the final state
    ties to the smallest accumulated cost then smallest seg.  Output:
    one row per fix (matched seg or NULL) + its d2 and candidate count.

    Plan: candidate generation is the snap_points JVM join (ring
    explode x cover cells — Python never sees unmatched segments); the
    Viterbi DP runs per entity in ONE applyInPandas over bounded
    groups (fixes/entity and candidates/fix are data-contract bounded —
    the rings.py boundary class).  One shuffle on the entity key.
    """
    import pandas as pd

    from .segments import BIAS, _cover_cells

    ring = F.explode(F.array([F.lit(d) for d in (-1, 0, 1)]))
    pcx = F.shiftright(F.col("x").cast("bigint") + BIAS, cell_shift)
    pcy = F.shiftright(F.col("y").cast("bigint") + BIAS, cell_shift)
    p = (
        fixes.select(
            F.col(id_col).alias("user_id"),
            F.col(fix_col).alias("event_id"),
            F.col(t_col).cast("bigint").alias("t"),
            F.col("x").cast("bigint").alias("px"),
            F.col("y").cast("bigint").alias("py"),
            pcx.alias("_bx"), pcy.alias("_by"),
        )
        .withColumn("_dx", ring)
        .withColumn("_dy", ring)
        .select(
            "user_id", "event_id", "t", "px", "py",
            (F.col("_bx") + F.col("_dx")).alias("_cx"),
            (F.col("_by") + F.col("_dy")).alias("_cy"),
        )
    )
    s = _cover_cells(segs, cell_shift).select(
        "seg", "x1", "y1", "x2", "y2", "_cx", "_cy"
    )
    # shuffle join on the cell key (not broadcast): dense cells are the
    # skew AQE must be able to split — see segments.segment_intersections
    cand = p.hint("shuffle_merge").join(s, ["_cx", "_cy"])
    # reference-cell dedup (the snap_points trick): a (fix, segment)
    # pair meets once per cell of ring(fix) ∩ cover(seg) — keep only the
    # min-corner cell's row, so duplicates never pay the distance math,
    # never cross the Arrow boundary, and the Python-side dict dedup
    # becomes a no-op safety net.  Same pairs, same d2 per pair.
    _cell = lambda c: F.shiftright(F.col(c) + BIAS, cell_shift)
    cand = cand.filter(
        (F.col("_cx") == F.greatest(F.shiftright(F.col("px") + BIAS, cell_shift) - 1,
                                    F.least(_cell("x1"), _cell("x2"))))
        & (F.col("_cy") == F.greatest(F.shiftright(F.col("py") + BIAS, cell_shift) - 1,
                                      F.least(_cell("y1"), _cell("y2"))))
    )
    dxs = F.col("x2") - F.col("x1")
    dys = F.col("y2") - F.col("y1")
    rx = F.col("px") - F.col("x1")
    ry = F.col("py") - F.col("y1")
    num = dxs * rx + dys * ry
    den = dxs * dxs + dys * dys
    tt = F.least(F.greatest(num.cast("double") / den.cast("double"), F.lit(0.0)), F.lit(1.0))
    ddx = rx.cast("double") - tt * dxs.cast("double")
    ddy = ry.cast("double") - tt * dys.cast("double")
    d2 = (ddx * ddx + ddy * ddy).alias("d2")
    r2 = float((1 << cell_shift) ** 2)
    scored = cand.select("user_id", "event_id", "t", "seg", d2).filter(
        F.col("d2") <= F.lit(r2)
    )
    # left join back so candidate-less fixes survive as chain breaks
    base = fixes.select(
        F.col(id_col).alias("user_id"),
        F.col(fix_col).alias("event_id"),
        F.col(t_col).cast("bigint").alias("t"),
    )
    rows = base.join(scored, ["user_id", "event_id", "t"], "left")

    W = float(switch_cost)

    def per_entity(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "event_id", "seg"])
        out = []
        # group candidate rows per fix, in track order
        fixes_seq = []
        for (t, eid), sub in pdf.groupby(["t", "event_id"], sort=True):
            # a (fix, seg) pair can land via up to 4 ring/cover cell
            # combinations with the same d2 — dedupe on the seg id
            cmap = {
                int(sg): float(dd)
                for sg, dd in zip(sub["seg"], sub["d2"])
                if not pd.isna(sg)
            }
            fixes_seq.append((int(eid), sorted(cmap.items())))

        chain = []  # [(eid, [(seg, d2)...], {seg: (cost, ptr)})]

        def flush():
            if not chain:
                return
            # backtrack from the best final state
            eid_f, cands_f, states_f = chain[-1]
            best_seg = min(states_f, key=lambda sg: (states_f[sg][0], sg))
            picks = []
            sg = best_seg
            for eid_i, cands_i, states_i in reversed(chain):
                d2_i = dict(cands_i)[sg]
                picks.append((eid_i, sg, d2_i, len(cands_i)))
                sg = states_i[sg][1]
            out.extend(reversed(picks))
            chain.clear()

        for eid, cands in fixes_seq:
            if not cands:
                flush()
                out.append((eid, None, None, 0))
                continue
            if not chain:
                states = {sg: (dd, None) for sg, dd in cands}
            else:
                prev = chain[-1][2]
                bp_seg = min(prev, key=lambda sg: (prev[sg][0], sg))
                bp_cost = prev[bp_seg][0]
                states = {}
                for sg, dd in cands:
                    stay = prev[sg][0] if sg in prev else None
                    via = bp_cost + W
                    # ties prefer staying on the same segment
                    if stay is not None and stay <= via:
                        states[sg] = (dd + stay, sg)
                    else:
                        states[sg] = (dd + via, bp_seg)
            chain.append((eid, cands, states))
        flush()
        return pd.DataFrame(
            [(int(key[0]), eid, sg, dd, nc) for eid, sg, dd, nc in out],
            columns=["user_id", "event_id", "seg", "d2", "n_cands"],
        )

    return rows.groupBy("user_id").applyInPandas(per_entity, HMM_SCHEMA)


def od_compose(od: DataFrame) -> DataFrame:
    """Two-leg composition of an od_matrix() result — the Markov-chain
    step of mobility analysis: how many trip CHAINS lead from cell a
    through any intermediate to cell c,

        n_paths(a, c) = sum over b of n_trips(a, b) * n_trips(b, c),

    the (A @ A) entry of the aggregate transition matrix.  Self-returns
    (a == c through any b) are real chains and stay in.  Exact integers;
    counts square, so the accumulator ships as a DECIMAL string.

    Returns (from_cx, from_cy, to_cx, to_cy, n_paths).

    Plan: ONE equi-join on the intermediate cell + one map-combined
    groupBy — sparse matrix multiply in two operators.  The join key is
    the cell, so a mega-hub cell is a genuine skew point: AQE skew-split
    applies, and the matrix is the AGGREGATE (|cells|^2 bounded), never
    the trip log.
    """
    d = lambda c: c.cast("decimal(38,0)")
    a = od.select(
        F.col("from_cx"), F.col("from_cy"),
        F.col("to_cx").alias("_mx"), F.col("to_cy").alias("_my"),
        F.col("n_trips").alias("_na"),
    )
    b = od.select(
        F.col("from_cx").alias("_mx"), F.col("from_cy").alias("_my"),
        F.col("to_cx"), F.col("to_cy"), F.col("n_trips").alias("_nb"),
    )
    return (
        a.join(b, ["_mx", "_my"])
        .groupBy("from_cx", "from_cy", "to_cx", "to_cy")
        .agg(
            F.sum(d(F.col("_na")) * d(F.col("_nb")))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("n_paths")
        )
    )
