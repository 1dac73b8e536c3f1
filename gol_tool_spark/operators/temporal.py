"""As-of (temporal) join — the analytics-engine staple the event stream
needs downstream: attach to each left row the most recent right row at or
before it (pandas merge_asof / DuckDB ASOF JOIN / kdb aj semantics).

Spark-first shape: there is no built-in as-of join, but the semantics are
exactly "last non-null right payload in event order", so the operator is a
tagged UNION + one window — a SINGLE shuffle on the key columns, identical
cost to the sort-merge join Spark would run for an equi-join on the same
keys.  No crossJoin, no range-explode, no Python:

    union(left+side=1, right+side=0)          # narrow, no shuffle
      -> window partitionBy(by) orderBy(ts, side, tie)
         last(_r, ignoreNulls) rowsBetween(unboundedPreceding, current)
      -> filter side=1                        # left rows with match struct

Backward-inclusive matching falls out of the sort: right rows at an equal
timestamp sort BEFORE left rows (side 0 < 1) so they are visible in the
left row's frame; `strict=True` flips the right side to 2 so equal-ts
right rows sort AFTER and are excluded.  Ties between right rows at the
same (key, ts) are resolved by `tie_col` when given (latest wins), else by
union order (callers with duplicate timestamps should pass a tie column).

Scale: the window's running `last(ignoreNulls)` is a streaming frame —
Spark evaluates it in one pass over each partition after the sort, state
is one struct.  Skew equals the largest per-key event count, the same
bound as any per-key window in the engine (sessionize, top-k).  100-TB
shape: one shuffle, no broadcast needed on either side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    prefix: str = "r_",
    strict: bool = False,
    tolerance_s: int | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, the most recent right row with right.on <= left.on
    (``strict=True``: <) sharing the ``by`` keys; right payload columns come
    back ``prefix``-renamed, NULL when no right row qualifies (left join).
    ``tolerance_s`` additionally voids matches older than that many seconds
    (pandas merge_asof tolerance).
    """
    by = list(by)
    payload = [c for c in right.columns if c not in by]
    if on not in payload:
        raise ValueError(f"right side must carry the ordering column {on!r}")

    right_side = 2 if strict else 0
    r2 = right.select(
        *by,
        F.col(on),
        F.lit(right_side).alias("_side"),
        F.struct(*[F.col(c) for c in payload]).alias("_r"),
        *( [F.col(tie_col).alias("_tie")] if tie_col else [] ),
    )
    l2 = left.withColumn("_side", F.lit(1))
    u = l2.unionByName(r2, allowMissingColumns=True)

    order = [F.col(on).asc(), F.col("_side").asc()]
    if tie_col:
        order.append(F.col("_tie").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance_s is not None:
        ok = F.expr(f"{on} - _m.{on} <= INTERVAL {int(tolerance_s)} SECOND")
        matched = matched.withColumn(
            "_m", F.when(F.col("_m").isNotNull() & ok, F.col("_m"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload]
    return matched.select(*out_cols)


def _wall_secs(on: str) -> F.Column:
    """Wall-clock seconds since the epoch wall time, via NTZ difference —
    deterministic under any session timezone (LTZ inputs convert to NTZ by
    the session TZ first, the standard Spark cast)."""
    return F.expr(
        f"CAST((CAST({on} AS TIMESTAMP_NTZ)"
        f" - TIMESTAMP_NTZ '1970-01-01 00:00:00') AS BIGINT)"
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    lower_s: int = 0,
    upper_s: int = 60,
    prefix: str = "r_",
) -> DataFrame:
    """Range (interval) join: every (left, right) pair sharing the ``by``
    keys with right.on in [left.on + lower_s, left.on + upper_s] seconds —
    the temporal range join Spark has no built-in for (DuckDB/kdb window
    join territory; Structured Streaming only has it as a stream-stream
    join condition).

    Spark-first shape: epoch-bucket blocking.  Both sides bucket their
    timestamps at width W = (upper_s - lower_s); the left side explodes to
    the (at most two when the span <= W) consecutive buckets its window
    touches, then ONE equi-join on (by..., bucket) + a codegen range
    filter evaluates exact containment.  No crossJoin, no range explode
    proportional to the window, no Python; fan-out is ceil(span/W)+1 = 2
    rows per left row, independent of data volume or window size.

    Skew bound: a bucket holds W seconds of one key's events — the same
    per-key-per-window bound the sessionize/window operators already
    carry; AQE skew-split applies to the join.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    w = max(int(upper_s) - int(lower_s), 1)
    by = list(by)
    payload = [c for c in right.columns if c not in by]

    # wall-clock seconds via NTZ difference — session-TZ-independent (the
    # repo discipline: unix_timestamp() on NTZ shifts with the session TZ
    # and is non-linear across DST transitions); sub-second inputs floor
    le = _wall_secs(on)
    lo = (le + F.lit(int(lower_s))).alias("_lo")
    hi = (le + F.lit(int(upper_s))).alias("_hi")
    l2 = left.select("*", lo, hi).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col("_lo") / w), F.floor(F.col("_hi") / w)
            )
        ),
    )
    r2 = right.select(
        *by,
        F.floor(_wall_secs(on) / w).alias("_bkt"),
        _wall_secs(on).alias("_re"),
        F.struct(*[F.col(c) for c in payload]).alias("_r"),
    )
    joined = l2.join(r2, by + ["_bkt"]).filter(
        (F.col("_re") >= F.col("_lo")) & (F.col("_re") <= F.col("_hi"))
    )
    out = [F.col(c) for c in left.columns]
    out += [F.col(f"_r.{c}").alias(f"{prefix}{c}") for c in payload]
    return joined.select(*out)


def resample_locf(
    df: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    values: Sequence[str] = (),
    step_s: int = 3600,
    tie_col: str | None = None,
) -> DataFrame:
    """Gap-fill: resample each key's series onto the regular step_s grid
    (grid points are multiples of step_s in epoch seconds — globally
    aligned, not per-key phases), carrying the last observation forward
    (LOCF).  Output: (by..., on, values...) with one row per grid point
    from the first multiple >= the key's min(on) to the last <= max(on).
    An observation exactly on a grid point is visible to it (inclusive).

    Spark-first: the same tagged-union + running-last(ignoreNulls) window
    as asof_join — generate each key's grid rows with sequence()+explode
    (pure JVM, one row per grid point), union with the data rows, ONE
    window over (by) ordered by (on, side) fills every value column in a
    single pass.  Two shuffles total (per-key min/max agg + the window),
    both on the same keys.
    """
    by = list(by)
    values = list(values) or [
        c for c in df.columns if c not in by and c != on and c != tie_col
    ]
    step = int(step_s)
    e = _wall_secs(on)  # TZ-independent wall-clock seconds

    bounds = df.groupBy(*by).agg(
        (F.ceil(F.min(e) / step) * step).alias("_g0"),
        (F.floor(F.max(e) / step) * step).alias("_g1"),
    )
    grid = (
        bounds.filter(F.col("_g0") <= F.col("_g1"))
        .withColumn("_ge", F.explode(F.sequence("_g0", "_g1", F.lit(step))))
        .select(
            *by,
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
                " + make_interval(0, 0, 0, 0, 0, 0, _ge)"
            ).cast(df.schema[on].dataType).alias(on),
            F.lit(1).alias("_side"),
        )
    )
    data = df.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in values],
        *([F.col(tie_col).alias("_tie")] if tie_col else []),
    )
    u = grid.unionByName(data, allowMissingColumns=True)
    order = [F.col(on).asc(), F.col("_side").asc()]
    if tie_col:
        order.append(F.col("_tie").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *by,
        F.col(on),
        F.col("_side"),
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(c) for c in values],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def cusum_stats(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-entity CUSUM changepoint components (Page 1954) — "did this
    series drift, and where": the classic single-changepoint estimate is
    argmax_k |P_k - k*mean|, with P_k the prefix sum of the (time, id)-
    ordered values.

    EXACT shape: values are quantized ONCE to integer units (round(v *
    quant) — the only float step, applied per element, never to a sum),
    then the mean is removed by N-scaling: s_k = n*P_k - k*T is an exact
    integer = n*(P_k - k*mean), so argmax/extremes are bit-reproducible.
    Accumulators are DECIMAL(38,0) (n*P_k overflows int64 at planet
    scale) and ship as strings.

    Returns per entity: (by, n, t_q, max_s, min_s, k_max, k_min) — t_q
    the quantized total, max_s/min_s the extreme N-scaled deviations
    (max_s >= 0 >= min_s always, since s_0 = s_n = 0 and k ranges 1..n),
    k_max/k_min their SMALLEST attaining prefix positions.  The caller's
    drift score is max(max_s, -min_s) / (n * sqrt-ish normalizer of
    choice).

    Plan: ONE entity exchange — the ordered window (prefix sum + row
    number) and the unbounded totals window share it — then one
    map-combined groupBy.  No joins.
    """
    d = lambda c: c.cast("decimal(38,0)")
    vq = F.round(F.col(value) * F.lit(float(quant))).cast("bigint")
    base = df.select(
        F.col(by), F.col(id_col), _wall_secs(ts).alias("_ws"), vq.alias("_vq")
    )
    w_ord = Window.partitionBy(by).orderBy("_ws", id_col)
    w_all = Window.partitionBy(by)
    rows = base.select(
        F.col(by),
        F.row_number().over(w_ord).alias("_k"),
        F.sum("_vq").over(w_ord).alias("_p"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
        F.sum("_vq").over(w_all).alias("_t"),
    ).withColumn(
        "_s", d(F.col("_n")) * d(F.col("_p")) - d(F.col("_k")) * d(F.col("_t"))
    )
    agg = rows.groupBy(by).agg(
        F.max("_n").alias("n"),
        F.max("_t").alias("t_q"),
        F.max(F.struct(F.col("_s"), (-F.col("_k")).alias("_nk"))).alias("_mx"),
        F.min(F.struct(F.col("_s"), F.col("_k"))).alias("_mn"),
    )
    return agg.select(
        F.col(by), "n", "t_q",
        F.col("_mx._s").cast("string").alias("max_s"),
        F.col("_mn._s").cast("string").alias("min_s"),
        (-F.col("_mx._nk")).cast("int").alias("k_max"),
        F.col("_mn._k").cast("int").alias("k_min"),
    )


def funnel(
    df: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    step_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis — per entity, the FIRST completion chain of
    `steps`: t1 = first step-1 event, t2 = first step-2 event strictly
    after t1, ..., tk = first step-k event strictly after t(k-1).  The
    product-analytics staple ("view -> click -> purchase conversion"),
    with deterministic ordering on (wall-second, id).

    Spark-first shape: ONE groupBy — per entity the relevant events are
    collected, sorted, and folded by an F.aggregate chain entirely in the
    JVM (no Python, no k self-joins).  A window formulation needs k
    sequential passes; a join formulation shuffles k times.  Memory bound
    = events-per-entity after the step filter, the same bound as any
    sessionization; the step filter prunes the collected set to funnel
    events only.

    Returns (by, steps_completed, t1_ws..tk_ws): entities with at least
    one funnel-step event; t_i the wall seconds of stage completion
    (NULL past the deepest stage reached).
    """
    if len(steps) < 2:
        raise ValueError("need at least 2 steps")
    base = (
        df.filter(F.col(step_col).isin(*list(steps)))
        .select(
            F.col(by),
            F.struct(
                _wall_secs(ts).alias("w"),
                F.col(id_col).cast("bigint").alias("i"),
                F.col(step_col).alias("s"),
            ).alias("_e"),
        )
    )
    grouped = base.groupBy(by).agg(
        F.sort_array(F.collect_list("_e")).alias("_evs")
    )
    k = len(steps)
    names = [f"t{i + 1}" for i in range(k)]
    zero = F.struct(*[F.lit(None).cast("bigint").alias(n) for n in names])

    def fold(acc, e):
        fields = []
        for i, (step, name) in enumerate(zip(steps, names)):
            prev_ok = F.lit(True) if i == 0 else acc[names[i - 1]].isNotNull()
            take = acc[name].isNull() & prev_ok & (e["s"] == F.lit(step))
            fields.append(F.when(take, e["w"]).otherwise(acc[name]).alias(name))
        return F.struct(*fields)

    folded = grouped.select(
        F.col(by), F.aggregate("_evs", zero, fold).alias("_f")
    )
    completed = sum(
        F.col(f"_f.{n}").isNotNull().cast("int") for n in names
    )
    return folded.select(
        F.col(by),
        completed.cast("int").alias("steps_completed"),
        *[F.col(f"_f.{n}").alias(f"{n}_ws") for n in names],
    )


def rolling_outliers(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    w: int = 3,
    k: int = 3,
    quant: int = 1_000_000,
) -> DataFrame:
    """Robust rolling anomaly detection — flag values deviating from the
    per-entity rolling MEDIAN by more than k rolling MADs (the
    median-absolute-deviation rule; mean/stddev z-scores break on the
    very outliers they hunt).

    EXACT shape: values quantize once to integers (the cusum_stats
    discipline); the +-w-row window's values are collected ONCE per row,
    and median + MAD come from array_sort + element_at + a transform
    lambda — all JVM higher-order functions on a (2w+1)-bounded array,
    no second window pass, no Python.  Medians of ints are x.0/x.5 and
    MADs x.25-quantized, so `dev > k*mad` compares exactly-representable
    doubles: bit-reproducible across engines.

    Plan: ONE entity exchange (the single window sort); everything after
    is per-row expression work in WholeStageCodegen.  Window state is
    2w+1 rows.  Boundary rows use their truncated frame (standard ROWS
    BETWEEN semantics), identically on both engines.
    """
    if w < 1:
        raise ValueError("w must be >= 1")
    vq = F.round(F.col(value) * F.lit(float(quant))).cast("bigint")
    base = df.select(
        F.col(by),
        F.col(id_col).alias("id"),
        _wall_secs(ts).alias("ws"),
        vq.alias("vq"),
    )
    wnd = (
        Window.partitionBy(by).orderBy("ws", "id").rowsBetween(-w, w)
    )
    arr = F.array_sort(F.collect_list("vq").over(wnd))
    rows = base.withColumn("_s", arr).withColumn("_n", F.size("_s"))
    med = (
        F.element_at("_s", ((F.col("_n") + 1) / 2).cast("int"))
        + F.element_at("_s", (F.col("_n") / 2).cast("int") + 1)
    ) / F.lit(2.0)
    rows = rows.withColumn("med", med)
    devs = F.array_sort(
        F.transform("_s", lambda v: F.abs(v.cast("double") - F.col("med")))
    )
    mad = (
        F.element_at(devs, ((F.col("_n") + 1) / 2).cast("int"))
        + F.element_at(devs, (F.col("_n") / 2).cast("int") + 1)
    ) / F.lit(2.0)
    rows = rows.withColumn("mad", mad)
    dev = F.abs(F.col("vq").cast("double") - F.col("med"))
    return rows.select(
        F.col(by),
        "id",
        "ws",
        "vq",
        "med",
        "mad",
        dev.alias("dev"),
        (dev > F.lit(float(k)) * F.col("mad")).alias("is_outlier"),
    )


def acf_stats(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    lags: Sequence[int] = (1, 2, 3),
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-entity lag-k autocorrelation components — "does this series
    remember itself k steps back" (the Box-Jenkins identification
    primitive).  For each entity and each lag k, over the (time, id)-
    ordered quantized series v_1..v_n, the overlapping pairs are
    (v_i, v_{i+k}) for i = 1..n-k, and the Pearson numerator of the
    sample ACF is

        num_k = m * sum(v_i * v_{i+k}) - sum(v_i) * sum(v_{i+k})

    with m = n - k pairs.  EXACT shape (the cusum_stats discipline):
    values quantize ONCE per element (round(v * quant), the only float
    step), every accumulator is DECIMAL(38,0) and ships as a string
    (planet-scale sums of 1e6-scaled products overflow int64); the
    caller's r_k = num_k / sqrt(den_x * den_y) is the float step.

    Returns (by, lag, n_pairs, sum_x, sum_y, sum_xy, num) — one row per
    entity per lag with at least one pair.

    Plan: ONE entity exchange — every lag's lead() shares the same
    (partitionBy, orderBy) window sort — then an in-row struct explode
    and one map-combined groupBy.  No joins.
    """
    if not lags or any(k < 1 for k in lags):
        raise ValueError("lags must be positive")
    d = lambda c: c.cast("decimal(38,0)")
    vq = F.round(F.col(value) * F.lit(float(quant))).cast("bigint")
    w = Window.partitionBy(by).orderBy("_ws", id_col)
    base = df.select(
        F.col(by), F.col(id_col), _wall_secs(ts).alias("_ws"), vq.alias("_vq")
    )
    led = base.select(
        F.col(by),
        F.col("_vq"),
        *[F.lead("_vq", int(k)).over(w).alias(f"_v{k}") for k in lags],
    )
    pairs = led.select(
        F.col(by),
        F.col("_vq"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(k)).alias("lag"), F.col(f"_v{k}").alias("vk")
                    )
                    for k in lags
                ]
            )
        ).alias("_p"),
    ).filter(F.col("_p.vk").isNotNull())
    agg = pairs.groupBy(F.col(by), F.col("_p.lag").alias("lag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(d(F.col("_vq"))).alias("_sx"),
        F.sum(d(F.col("_p.vk"))).alias("_sy"),
        F.sum(d(F.col("_vq")) * d(F.col("_p.vk"))).alias("_sxy"),
    )
    return agg.select(
        F.col(by),
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.col("_sx").cast("string").alias("sum_x"),
        F.col("_sy").cast("string").alias("sum_y"),
        F.col("_sxy").cast("string").alias("sum_xy"),
        (d(F.col("n_pairs")) * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        .cast("string")
        .alias("num"),
    )


def interval_coverage(
    df: DataFrame,
    start: str = "start_s",
    end: str = "end_s",
    by: Sequence[str] = ("entity",),
    validate: bool = False,
) -> DataFrame:
    """Interval-union coverage per entity — the classic sweep-line
    "how much wall time do these overlapping intervals actually cover"
    reduction (gaps-and-islands over ranges): sessions from heartbeats,
    sensor uptime from report windows, machine-busy time from task spans.

    Intervals are half-open [start, end); rows with end < start are
    dropped (or raise, with validate=True — that costs one extra scan,
    so it is opt-in rather than a hidden driver action on the hot path).
    Returns one row per entity:
    (by..., n_intervals, n_blocks, covered_s, span_s) — the interval
    count, the number of merged maximal blocks, the EXACT union length,
    and max(end) - min(start).

    Plan: one shuffle on the entity keys; a running max(end) window
    detects block starts (an interval opens a new block iff it starts
    after everything before it has ended), a running sum numbers the
    blocks, then two map-combined groupBys fold blocks and entities.
    Tie order within equal starts cannot change the outcome (a later
    equal-start interval always lands in the same block), so the result
    is deterministic under Spark's unstable sort.  Per-entity interval
    counts bound the window state — the same skew contract as
    sessionize/asof_join.
    """
    by = list(by)
    if not by:
        raise ValueError("by must name at least one entity column")
    if validate and df.filter(F.col(end) < F.col(start)).limit(1).count():
        raise ValueError(f"interval_coverage: rows with {end} < {start}")
    d = df.select(*by, F.col(start).alias("_s"), F.col(end).alias("_e")).filter(
        F.col("_e") >= F.col("_s")
    )
    w_ord = Window.partitionBy(*by).orderBy("_s", "_e")
    prev = F.max("_e").over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
    new_blk = F.when(prev.isNull() | (F.col("_s") > prev), 1).otherwise(0)
    numbered = d.select(
        *by, "_s", "_e",
        F.sum(new_blk)
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_blk"),
    )
    blocks = numbered.groupBy(*by, "_blk").agg(
        F.min("_s").alias("_bs"),
        F.max("_e").alias("_be"),
        F.count(F.lit(1)).alias("_n"),
    )
    return blocks.groupBy(*by).agg(
        F.sum("_n").cast("bigint").alias("n_intervals"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(F.col("_be") - F.col("_bs")).cast("bigint").alias("covered_s"),
        (F.max("_be") - F.min("_bs")).cast("bigint").alias("span_s"),
    )


def time_weighted(
    df: DataFrame,
    on: str = "ts",
    value: str = "value",
    by: Sequence[str] = ("entity",),
) -> DataFrame:
    """Exact time-weighted (LOCF) integration per entity — the sensor
    statistic sample-mean gets wrong: a reading holds until the next one
    arrives, so its weight is the seconds it was current, not 1.

    twa_num = sum over consecutive samples of value_i * (t_{i+1} - t_i)
    (integer seconds x integer values, exact in DECIMAL(38,0));
    twa = twa_num / span_s is the caller's division.  The last sample
    carries no weight (nothing follows it); single-sample entities
    report span 0 / num 0.  Tied timestamps contribute zero-width
    intervals, so tie order cannot change the sum.

    Returns (by..., n_samples, span_s, twa_num) with twa_num as a
    DECIMAL string.

    Plan: one shuffle on the entity keys, a LEAD window, one
    map-combined agg.  No joins.
    """
    by = list(by)
    if not by:
        raise ValueError("by must name at least one entity column")
    t = _wall_secs(on)
    d = df.select(*by, t.alias("_t"), F.col(value).alias("_v"))
    w = Window.partitionBy(*by).orderBy("_t", "_v")
    led = d.select(
        *by, "_t", "_v", (F.lead("_t").over(w) - F.col("_t")).alias("_dt")
    )
    dd = lambda c: c.cast("decimal(38,0)")
    return led.groupBy(*by).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        (F.max("_t") - F.min("_t")).cast("bigint").alias("span_s"),
        F.coalesce(
            F.sum(dd(F.col("_v")) * dd(F.col("_dt"))).cast("decimal(38,0)"),
            F.lit(0).cast("decimal(38,0)"),
        ).cast("string").alias("twa_num"),
    )


def mann_kendall(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-entity Mann–Kendall trend statistic (Mann 1945, Kendall 1975)
    — "is this series monotonically drifting": S = sum over ordered pairs
    i < j of sign(v_j - v_i), the nonparametric complement of cusum_stats
    (CUSUM finds a level shift; MK detects monotone trend regardless of
    shape).

    EXACT shape: values quantized once per element (round(v * quant), the
    cusum_stats discipline), pair order fixed by (timestamp, id) row
    number, sign in {-1, 0, 1} as integers — S, n_pos, n_neg, n_tie are
    exact BIGINTs, bit-reproducible.  Ties contribute 0 and are counted.

    Plan: ONE entity exchange for the ordering window; the windowed rank
    table is PINNED (eager localCheckpoint, the geostats._pin
    discipline) so the self equi-join's two sides read the same
    materialized partitions instead of re-running the window subtree
    twice — measured: the unpinned plan ran 3 exchanges and the window
    twice; pinned, the window runs once and 2 exchanges remain.  Then
    rn_i < rn_j pair signs through one map-combined groupBy, and a LEFT
    join back onto per-entity counts so single-row entities report
    S = 0 instead of vanishing.

    Scale: pair fan-out is O(n_e^2) per entity — the exact statistic's
    intrinsic cost, same contract as acf_stats/ripley_k: bounded
    per-entity series (sessions, sensors, SLA windows), not unbounded
    clickstreams; cap upstream with a window filter when in doubt.
    Returns (by, n, s, n_pos, n_neg, n_tie).
    """
    vq = F.round(F.col(value) * F.lit(float(quant))).cast("bigint")
    base = df.select(
        F.col(by), F.col(id_col), _wall_secs(ts).alias("_ws"), vq.alias("_vq")
    )
    w_ord = Window.partitionBy(by).orderBy("_ws", id_col)
    r = base.select(
        F.col(by), F.row_number().over(w_ord).alias("_k"), "_vq"
    ).localCheckpoint(eager=True)
    a = r.select(F.col(by), F.col("_k").alias("_ka"), F.col("_vq").alias("_va"))
    b = r.select(F.col(by), F.col("_k").alias("_kb"), F.col("_vq").alias("_vb"))
    pairs = a.join(b, [by]).filter(F.col("_ka") < F.col("_kb"))
    pagg = pairs.groupBy(by).agg(
        F.sum(F.when(F.col("_vb") > F.col("_va"), 1).otherwise(0)).alias("_np"),
        F.sum(F.when(F.col("_vb") < F.col("_va"), 1).otherwise(0)).alias("_nn"),
        F.sum(F.when(F.col("_vb") == F.col("_va"), 1).otherwise(0)).alias("_nt"),
    )
    counts = r.groupBy(by).agg(F.count(F.lit(1)).alias("n"))
    out = counts.join(pagg, [by], "left")
    z = F.lit(0).cast("bigint")
    np_, nn_, nt_ = (F.coalesce(F.col(c), z) for c in ("_np", "_nn", "_nt"))
    return out.select(
        F.col(by),
        F.col("n").cast("bigint").alias("n"),
        (np_ - nn_).cast("bigint").alias("s"),
        np_.cast("bigint").alias("n_pos"),
        nn_.cast("bigint").alias("n_neg"),
        nt_.cast("bigint").alias("n_tie"),
    )


def ols_trend(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-entity exact least-squares trend components over the
    (time, id)-ordered rank axis — the parametric sibling of
    mann_kendall at SINGLE-PASS cost: with x = row rank k (1..n) and y
    the quantized value, the slope is sxy_n / sxx_n where

        sxy_n = n * sum(k * y) - sum(k) * sum(y)
        sxx_n = n * sum(k^2)   - sum(k)^2

    both EXACT integers in DECIMAL(38,0) (shipped as strings — the
    cusum_stats discipline; the only float step is the per-element
    quantization).  The caller divides; the engine never does.

    Plan: ONE entity exchange (the rank window), then one map-combined
    groupBy — no joins, no pair fan-out, safe for unbounded per-entity
    series.  Returns (by, n, t_q, sxy_n, sxx_n).
    """
    d = lambda c: c.cast("decimal(38,0)")
    vq = F.round(F.col(value) * F.lit(float(quant))).cast("bigint")
    base = df.select(
        F.col(by), F.col(id_col), _wall_secs(ts).alias("_ws"), vq.alias("_vq")
    )
    w_ord = Window.partitionBy(by).orderBy("_ws", id_col)
    r = base.select(F.col(by), F.row_number().over(w_ord).alias("_k"), "_vq")
    agg = r.groupBy(by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_vq").alias("_t"),
        F.sum(d(F.col("_k")) * d(F.col("_vq"))).alias("_sky"),
        F.sum(F.col("_k").cast("bigint")).alias("_sk"),
        F.sum(d(F.col("_k")) * d(F.col("_k"))).alias("_skk"),
    )
    return agg.select(
        F.col(by),
        F.col("n").cast("bigint").alias("n"),
        F.col("_t").cast("bigint").alias("t_q"),
        (d(F.col("n")) * F.col("_sky") - d(F.col("_sk")) * d(F.col("_t")))
        .cast("string").alias("sxy_n"),
        (d(F.col("n")) * F.col("_skk") - d(F.col("_sk")) * d(F.col("_sk")))
        .cast("string").alias("sxx_n"),
    )


def streaks(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-entity monotone-streak components — "how long does this series
    keep rising": maximal NONDECREASING runs over the (time, id)-ordered
    values (ties extend a run; a strict drop breaks it).  The
    stuck-sensor / winning-streak / monotone-burn-in check that
    complements mann_kendall (MK scores global trend; this finds the
    longest locally sustained one).

    Returns (by, n, n_runs, max_run, max_run_start): total rows, number
    of maximal runs, the longest run's length, and its 1-based start
    position (ties on length -> smallest start).  Exact BIGINTs via the
    cusum_stats one-shot quantization.

    Plan: classic gaps-and-islands — ONE entity exchange shared by the
    ordering window, the lag-compare, and the running break-count
    (run id); then two map-combined groupBys (run extents, entity
    rollup).  No joins, no pair fan-out, safe for unbounded series.
    """
    vq = F.round(F.col(value) * F.lit(float(quant))).cast("bigint")
    base = df.select(
        F.col(by), F.col(id_col).alias("_i"), _wall_secs(ts).alias("_ws"),
        vq.alias("_vq"),
    )
    w_ord = Window.partitionBy(by).orderBy("_ws", "_i")
    prev = F.lag("_vq").over(w_ord)
    brk = F.when(prev.isNull() | (F.col("_vq") < prev), 1).otherwise(0)
    rows = base.select(
        F.col(by),
        F.row_number().over(w_ord).alias("_k"),
        F.sum(brk).over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_run"),
    )
    runs = rows.groupBy(by, "_run").agg(
        F.count(F.lit(1)).alias("_len"), F.min("_k").alias("_start")
    )
    agg = runs.groupBy(by).agg(
        F.sum("_len").alias("n"),
        F.max("_run").alias("n_runs"),
        F.max(F.struct(F.col("_len"), (-F.col("_start")).alias("_ns"))).alias("_mx"),
    )
    return agg.select(
        F.col(by),
        F.col("n").cast("bigint").alias("n"),
        F.col("n_runs").cast("bigint").alias("n_runs"),
        F.col("_mx._len").cast("bigint").alias("max_run"),
        (-F.col("_mx._ns")).cast("bigint").alias("max_run_start"),
    )
