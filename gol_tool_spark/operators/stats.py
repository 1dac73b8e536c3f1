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
