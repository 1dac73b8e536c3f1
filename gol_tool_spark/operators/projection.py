"""Column projection — the reference's `-t=` output column selection (B4).

Reference parity: QueryCommand.java:72-76 + query/AbstractFeaturePrinter.
java:90-187: exact tag keys, wildcard key patterns (`addr:*`, `*:en`),
computed columns lon/lat/x/y/geom/bbox, catch-all `*`.  All map_filter /
computed-column expressions — JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sinks.writers import lat_of, lon_of

COMPUTED = ("lon", "lat", "x", "y", "geom", "bbox")


def _wildcard_cond(pattern: str, k: Column) -> Column:
    if pattern == "*":
        return F.lit(True)
    if pattern.endswith("*"):
        return k.startswith(pattern[:-1])
    if pattern.startswith("*"):
        return k.endswith(pattern[1:])
    return k == pattern


def project_columns(
    df: DataFrame,
    specs: list[str],
    tags_col: str = "tags",
    precision: int = 7,
) -> DataFrame:
    """Apply a -t=col,col,... projection. Exact keys become top-level
    string columns; wildcard specs produce a filtered `tags` map; computed
    names produce coordinate/geometry columns."""
    out: list[Column] = [F.col("id")]
    wildcard_patterns = []
    for spec in specs:
        spec = spec.strip()
        if spec in COMPUTED:
            if spec == "lon":
                out.append(lon_of(F.col("x"), precision).alias("lon"))
            elif spec == "lat":
                out.append(lat_of(F.col("y"), precision).alias("lat"))
            elif spec in ("x", "y"):
                out.append(F.col(spec))
            elif spec == "geom":
                out.append(
                    F.concat(
                        F.lit("POINT ("),
                        lon_of(F.col("x"), precision).cast("string"), F.lit(" "),
                        lat_of(F.col("y"), precision).cast("string"), F.lit(")"),
                    ).alias("geom")
                )
            elif spec == "bbox":
                out.append(
                    F.array(F.col("x"), F.col("y"), F.col("x"), F.col("y")).alias("bbox")
                )
        elif "*" in spec:
            wildcard_patterns.append(spec)
        else:
            out.append(F.col(tags_col).getItem(spec).alias(spec))
    if wildcard_patterns:
        def keep(k: Column, _v: Column) -> Column:
            cond = _wildcard_cond(wildcard_patterns[0], k)
            for p in wildcard_patterns[1:]:
                cond = cond | _wildcard_cond(p, k)
            return cond

        out.append(F.map_filter(F.col(tags_col), keep).alias("tags"))
    return df.select(*out)
