"""Stats/tally engine — the `-f=stats` output family.

Reference parity: D6 tally=count/length/area over tag-value permutations
(query/StatsFeaturePrinter.java:85-88,388-420), D7 tally=keys/tags
(411-494), D8 tally=roles with distinct-relation counts (323-386), D9
min-tally HAVING + "(N others)" synthetic row (96-108,466-480,612-639),
F2 orderings.

Design: one generic groupBy+agg plus a tiny driver-free HAVING/others
rewrite — total is computed by a second aggregate over the grouped result
(cheap: group count rows, not input rows), the below-floor remainder is
re-aggregated into one row and unioned. All built-in column ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tally(
    df: DataFrame,
    group_cols: list[str],
    tally_col: F.Column | None = None,
    min_tally: int | None = None,
    min_fraction: float | None = None,
    others_label: str = "(others)",
) -> DataFrame:
    """D6/D9: grouped tally with HAVING floor + '(others)' rollup row.
    tally_col None -> count(*); else sum(tally_col) (length/area tallies
    pass a geometry-measure column)."""
    measure = F.count(F.lit(1)) if tally_col is None else F.sum(tally_col)
    grouped = df.groupBy(*group_cols).agg(measure.cast("double").alias("tally"))
    if min_tally is None and min_fraction is None:
        return grouped
    total = grouped.agg(F.sum("tally").alias("_total"))
    g = grouped.crossJoin(F.broadcast(total))
    floor_expr = F.lit(float(min_tally or 0))
    if min_fraction is not None:
        floor_expr = F.greatest(floor_expr, F.col("_total") * min_fraction)
    # group cols go to string in the HAVING path so the '(others)' label row
    # unions cleanly with non-string group columns (e.g. boolean 'closed')
    keep = g.filter(F.col("tally") >= floor_expr).select(
        *[F.col(c).cast("string").alias(c) for c in group_cols], "tally"
    )
    others = (
        g.filter(F.col("tally") < floor_expr)
        .agg(F.sum("tally").alias("tally"), F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            *[F.lit(others_label).alias(c) for c in group_cols],
            F.col("tally"),
        )
    )
    return keep.unionByName(others)


def tally_keys(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """D7 tally=keys: frequency of tag keys over the result set."""
    return (
        df.select(F.explode(F.map_keys(F.col(tags_col))).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tally_tags(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """D7 tally=tags: key=value frequencies with per-key percentage
    (parent/child grouping via a window, the reference's
    StatsFeaturePrinter.java:594-605 percentage column)."""
    from pyspark.sql import Window

    kv = df.select(F.explode(F.col(tags_col)).alias("key", "value"))
    counts = kv.groupBy("key", "value").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("key")
    return counts.withColumn(
        "pct_of_key", F.round(F.col("n") / F.sum("n").over(w) * 100.0, 4)
    )


def tally_roles(rel_members: DataFrame) -> DataFrame:
    """D8 tally=roles: per member role, membership count + distinct
    relation count. rel_members: (rel_id, role, ...)."""
    return rel_members.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct("rel_id").alias("n_relations"),
    )


def grouped_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact grouped percentiles (linear interpolation — SQL
    PERCENTILE_CONT semantics) of ``value_col`` per group.  Uses the
    built-in exact `percentile` aggregate: one map-side-combined groupBy,
    all JVM.  Exactness costs a per-group value buffer — the right tool
    for bounded-cardinality groups; for 100-TB unbounded groups use
    `approx_percentile` with the same call shape (documented seam,
    deliberately not silently substituted: the two differ numerically)."""
    aggs = [
        F.expr(f"percentile({value_col}, {p})").alias(
            f"p{str(p)[2:].ljust(2, '0')}"
        )
        for p in ps
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    group_cols: list[str] = (),
) -> DataFrame:
    """Equi-width histogram of ``value_col`` over [lo, hi): bucket 0 is
    below-range, n_bins+1 above-range (SQL WIDTH_BUCKET semantics),
    optionally per group.  One map-side-combined groupBy on the bucket
    id; empty buckets are absent (join a sequence spine if a dense axis
    is needed)."""
    b = F.expr(f"width_bucket({value_col}, {float(lo)}, {float(hi)}, {int(n_bins)})")
    return (
        df.groupBy(*list(group_cols), b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str = "value",
    frac: float = 0.001,
    extra_cap: int = 0,
) -> DataFrame:
    """EXACT frequent items at sketch cost — every value whose count is
    >= ceil(frac * N), found WITHOUT shuffling the full key space
    (reference parity: the string-frequency scan's "top strings" use,
    gol/tiles/StringCatalogBuilder hot-string selection, done the way a
    100-TB corpus requires).

    Two passes:
      1. Per-partition Misra-Gries (capacity ceil(1/frac) + extra_cap)
         via mapInPandas — bounded memory, emits at most `cap` CANDIDATE
         values per partition, never a per-key shuffle.  The MG
         guarantee (any item with partition count > n_p/(cap+1) survives
         that partition's sketch) plus pigeonhole across partitions
         makes the union of candidates a SUPERSET of every item with
         global count > N/(cap+1) >= the threshold.
      2. Exact recount of candidates only: broadcast left-semi join +
         one map-combined groupBy over the (tiny) candidate set, then
         HAVING cnt >= ceil(frac * N).  The recount kills MG's
         overcounting, so the result is EXACTLY the >= threshold set —
         not an approximation.

    Plan: the full input is scanned twice but shuffled ZERO times on the
    value column for pass 1 (sketches are partition-local) and only the
    candidate-filtered remnant shuffles in pass 2.  A naive
    groupBy-HAVING shuffles every distinct value; at web scale (1e11
    distinct tokens) that is the difference between a broadcastable
    result and a dead stage.  Python touches each row once inside an
    Arrow batch (the documented sketch seam — a production build would
    register the same logic as a JVM Aggregator).

    Returns (value, cnt, n_total) — cnt the exact count, n_total the
    exact input size; output is small by construction (<= 1/frac rows).
    """
    import math

    import pandas as pd  # noqa: F401  (mapInPandas contract)

    if not (0.0 < frac < 1.0):
        raise ValueError("frac must be in (0, 1)")
    cap = int(math.ceil(1.0 / frac)) + int(extra_cap)

    # NULLs are excluded (pandas value_counts drops them; SQL semantics for
    # "frequent values" don't want a NULL bucket either)
    vals = df.select(F.col(value_col).alias("value")).filter(F.col("value").isNotNull())
    out_schema = vals.schema

    def mg_partition(batches):
        counts: dict = {}
        for pdf in batches:
            # merge the batch's exact counts into the running sketch,
            # then apply the generalized MG decrement (subtract the
            # k-th largest count from all, drop <=0) back to capacity
            for v, c in pdf["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > cap:
                dec = sorted(counts.values(), reverse=True)[cap]
                counts = {v: c - dec for v, c in counts.items() if c > dec}
        import pandas as pd

        yield pd.DataFrame({"value": list(counts.keys())})

    candidates = vals.mapInPandas(mg_partition, schema=out_schema).distinct()
    total = vals.agg(F.count(F.lit(1)).alias("n_total"))
    recount = (
        vals.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        recount.join(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(float(frac)) * F.col("n_total")))
        .select("value", "cnt", "n_total")
    )


def skyline2d(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    bucket_shift: int = 24,
) -> DataFrame:
    """2-D skyline (Pareto front, Börzsönyi 2001) minimizing both
    columns: every row no other row strictly dominates (p dominates q
    when p.x <= q.x, p.y <= q.y and one inequality is strict; exact
    (x, y) duplicates dominate nobody and survive together).  The
    "cheapest AND closest" multi-criteria filter of analytics.

    Returns distinct skyline points (x, y, cnt) with their input
    multiplicity.

    Plan — two phases so no global window ever sees the raw data:
    1. Bucket prune: min(y) per 2^bucket_shift-wide x-bucket (one
       map-combined groupBy -> a TINY table, <= x-range / 2^shift rows);
       a prefix-min window over THAT table (broadcast back) kills every
       point some strictly-lower bucket already dominates.  Skyline
       points always survive (a lower-bucket dominator would contradict
       skyline-ness), and domination chains always end in a skyline
       point, so pruning never changes the answer.
    2. Exact finish over survivors: per-x min(y) + prefix-min over the
       survivor x's.  Survivor count is the candidate staircase
       (skyline size + at most one bucket's width of stragglers per
       bucket) — for anti-correlated worst cases the skyline ITSELF is
       O(n) and no algorithm returns less.
    """
    from pyspark.sql import Window

    bkt = F.shiftright(F.col(x).cast("bigint") + F.lit(1 << 31), bucket_shift)
    bmin = df.groupBy(bkt.alias("_b")).agg(F.min(y).alias("_bmy"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bpre = bmin.select("_b", F.min("_bmy").over(wb).alias("_bpre"))
    cand = (
        df.select(F.col(x).alias("x"), F.col(y).alias("y"), bkt.alias("_b"))
        .join(F.broadcast(bpre), "_b")
        .filter(F.col("_bpre").isNull() | (F.col("_bpre") > F.col("y")))
        # pin (lazy, the geostats._pin discipline): the survivor set
        # (staircase band, small after the prune) feeds BOTH the per-x
        # aggregate and the final join — without the pin the full input
        # scan + prune runs twice (plan-audit finding)
        .localCheckpoint(eager=False)
    )
    px = cand.groupBy("x").agg(F.min("y").alias("_my"))
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    pm = px.select("x", "_my", F.min("_my").over(wx).alias("_pmin"))
    return (
        cand.join(pm, "x")
        .filter(
            (F.col("y") == F.col("_my"))
            & (F.col("_pmin").isNull() | (F.col("_pmin") > F.col("y")))
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def gini_concentration(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Exact Gini concentration components per group — the standard
    inequality/concentration measure (how skewed is revenue across
    orders, traffic across tiles, tokens across documents).

    For a group's sorted values x_(1) <= ... <= x_(n):

        gini_num = sum_i (2i - n - 1) * x_i  =  2*sum(i*x_i) - (n+1)*sum(x)
        gini     = gini_num / (n * sum(x))       (caller's division)

    Tie order cannot change the result (within a tie block the values
    are constant and the rank weights sum to a fixed total), so the
    statistic is deterministic under Spark's unstable sort.  Values must
    be non-negative integers (cents, counts) for the exact contract.

    Returns (group_cols..., n, total, gini_num) with the accumulators as
    DECIMAL strings (they square past int64 at scale).

    Plan: ONE shuffle (the window partition = the groupBy key), a
    row_number window, one map-combined agg.  No joins.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark.sql import Window

    d = lambda c: c.cast("decimal(38,0)")
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_i"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d(F.col("_v"))).cast("decimal(38,0)").alias("_s1"),
        F.sum(d(F.col("_v")) * d(F.col("_i"))).cast("decimal(38,0)").alias("_s2"),
    )
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("_s2")
        - (d(F.col("n")) + F.lit(1)) * F.col("_s1")
    )
    return agg.select(
        *group_cols, "n",
        F.col("_s1").cast("string").alias("total"),
        num.cast("decimal(38,0)").cast("string").alias("gini_num"),
    )


def kendall_tau(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    id_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """Exact Kendall rank-correlation components per group — "do these
    two variables move together" without any distributional assumption:
    over all unordered row pairs within a group,

        concordant  sign(x_j - x_i) * sign(y_j - y_i) = +1
        discordant  sign(x_j - x_i) * sign(y_j - y_i) = -1
        tie_x / tie_y / tie_both   the zero-sign cases

    All five counts are exact BIGINTs; tau_a = (nc - nd) / (n(n-1)/2)
    and tau_b's tie-adjusted denominator are the caller's one division —
    the engine ships only integers (the mann_kendall discipline; MK's S
    is exactly this operator with y = time order).

    Values are quantized once per element (round(v * quant)); the pair
    key is a deterministic (id_col) total order so each unordered pair
    counts exactly once regardless of partitioning.

    Plan: the quantized projection is PINNED (eager localCheckpoint) so
    the pair self-join's sides read the same materialized partitions;
    ONE equi-join on the group key with id_i < id_j, one map-combined
    groupBy, LEFT join back onto group counts so n<=1 groups report
    zeros.  Pair fan-out is O(per-group n^2) — the exact statistic's
    nature; same bounded-group contract as mann_kendall/acf_stats.
    """
    vq = lambda c: F.round(F.col(c) * F.lit(float(quant))).cast("bigint")
    base = df.select(
        *group_cols, F.col(id_col).alias("_i"),
        vq(x_col).alias("_x"), vq(y_col).alias("_y"),
    ).localCheckpoint(eager=True)
    a = base.select(
        *group_cols, F.col("_i").alias("_ia"),
        F.col("_x").alias("_xa"), F.col("_y").alias("_ya"),
    )
    b = base.select(
        *group_cols, F.col("_i").alias("_ib"),
        F.col("_x").alias("_xb"), F.col("_y").alias("_yb"),
    )
    sx = F.when(F.col("_xb") > F.col("_xa"), 1).when(
        F.col("_xb") < F.col("_xa"), -1
    ).otherwise(0)
    sy = F.when(F.col("_yb") > F.col("_ya"), 1).when(
        F.col("_yb") < F.col("_ya"), -1
    ).otherwise(0)
    pairs = (
        a.join(b, group_cols)
        .filter(F.col("_ia") < F.col("_ib"))
        .select(*group_cols, sx.alias("_sx"), sy.alias("_sy"))
    )
    pagg = pairs.groupBy(*group_cols).agg(
        F.sum(F.when((F.col("_sx") * F.col("_sy")) == 1, 1).otherwise(0)).alias("_nc"),
        F.sum(F.when((F.col("_sx") * F.col("_sy")) == -1, 1).otherwise(0)).alias("_nd"),
        F.sum(F.when((F.col("_sx") == 0) & (F.col("_sy") != 0), 1).otherwise(0)).alias("_tx"),
        F.sum(F.when((F.col("_sx") != 0) & (F.col("_sy") == 0), 1).otherwise(0)).alias("_ty"),
        F.sum(F.when((F.col("_sx") == 0) & (F.col("_sy") == 0), 1).otherwise(0)).alias("_tb"),
    )
    counts = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    out = counts.join(pagg, group_cols, "left")
    z = F.lit(0).cast("bigint")
    col = lambda c: F.coalesce(F.col(c), z).cast("bigint")
    return out.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        col("_nc").alias("concordant"),
        col("_nd").alias("discordant"),
        col("_tx").alias("tie_x"),
        col("_ty").alias("tie_y"),
        col("_tb").alias("tie_both"),
    )


def contingency_components(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Exact contingency-table components for two CATEGORICAL columns —
    the independence-test workhorse (is `source` independent of `lang`,
    device of outcome): for EVERY cell of the full r x c cross product
    (including never-observed combinations, which chi-square needs),

        n_ij   observed count          r_i, c_j   margins     n  total
        delta  n_ij * n - r_i * c_j    (DECIMAL string, exact)

    delta is the cross-multiplied independence deviation: zero iff the
    cell sits exactly at its expected rate; delta^2 / (r_i * c_j * n) is
    the cell's chi-square term — the caller's one float division (the
    term_drift discipline, generalized from 2 x k to r x c).

    Plan: ONE map-combined groupBy for the observed cells; margins are
    two more tiny aggregates of it; the full cross product is a
    crossJoin of the two BROADCAST margin tables (bounded by the
    categorical contract — this operator is for enum-like columns, not
    high-cardinality ids) LEFT-joined onto observed cells; the 1-row
    total broadcasts.  The fact table is read once.
    """
    d38 = lambda c: c.cast("decimal(38,0)")
    cells = (
        df.select(F.col(row_col).alias("rv"), F.col(col_col).alias("cv"))
        .groupBy("rv", "cv")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
        .localCheckpoint(eager=True)
    )
    rmar = cells.groupBy("rv").agg(F.sum("n_ij").cast("bigint").alias("r_i"))
    cmar = cells.groupBy("cv").agg(F.sum("n_ij").cast("bigint").alias("c_j"))
    tot = cells.agg(F.sum("n_ij").cast("bigint").alias("n"))
    grid = F.broadcast(rmar).crossJoin(F.broadcast(cmar)).crossJoin(F.broadcast(tot))
    out = grid.join(cells, ["rv", "cv"], "left").withColumn(
        "n_ij", F.coalesce(F.col("n_ij"), F.lit(0).cast("bigint"))
    )
    return out.select(
        F.col("rv").alias(row_col),
        F.col("cv").alias(col_col),
        "n_ij", "r_i", "c_j", "n",
        (d38(F.col("n_ij")) * d38(F.col("n"))
         - d38(F.col("r_i")) * d38(F.col("c_j"))).cast("string").alias("delta"),
    )


def digit_distribution(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Leading-significant-digit distribution per group — the Benford's
    law data-quality screen (fabricated, synthesized or unit-mangled
    numeric columns deviate from the log-uniform digit law; Nigrini's
    audit standard): per (group, digit 1..9) the exact count and the
    group total, so the caller's Benford chi-square against
    log10(1 + 1/d) is one float step over exact integers.

    The digit comes from the value's decimal string (first [1-9] match,
    so 0.05 -> 5 and negatives skip the sign); pass an INTEGER-typed
    column (cents, counts) for bit-identical cross-engine behavior —
    integer-to-string rendering is canonical everywhere, float
    rendering is not.  Zero values (no nonzero digit) are excluded from
    both counts and totals.

    Plan: one projection + ONE map-combined groupBy; the per-group total
    is a window-free second aggregate joined back on the group key.
    """
    dig = F.regexp_extract(F.col(value_col).cast("string"), "[1-9]", 0)
    base = df.select(*group_cols, dig.alias("digit")).filter(F.col("digit") != "")
    counts = base.groupBy(*group_cols, "digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("total")
    )
    return counts.join(totals, group_cols).select(
        *group_cols, F.col("digit").cast("int").alias("digit"), "n", "total"
    )
