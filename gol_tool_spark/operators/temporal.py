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
