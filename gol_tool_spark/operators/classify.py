"""Feature classification operators: area rules, problem nodes, ghosts, GST.

Reference parity:
  B6 area classification (compiler/AreaClassifier.java:29-118): a closed way
     / relation is a polygon iff its tags match the area rules — per-key
     "any value" or value whitelists/blacklists, `area=no` global override,
     `area=yes` opt-in. Rules are data (a broadcast-able table / literal
     expression), matching the reference's "TODO make customizable".
  B7 problem-node tagging (build/Validator.java:1797-1848): untagged nodes
     sharing exact (x,y) -> geodesk:duplicate=yes; untagged nodes in no way
     and no relation -> geodesk:orphan=yes.
  C3 ghost-way copies (build/Sorter.java:398-447): multi-tile ways emit a
     copy into every foreign tile their nodes occupy.
  D5 weighted GST selection (build/StringTableBuilder.java:70-210): string
     weight = 5*key_uses + 2*role_uses + value_uses, indexed keys get a
     large bonus; top max_strings by weight.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (key, mode, values): mode "any" = polygon for any value (except blacklist
# values), mode "only" = polygon only for listed values, mode "never" = the
# listed values are NOT areas. Mirrors the reference's hardcoded rule kinds.
DEFAULT_AREA_RULES = [
    ("building", "any", []),
    ("landuse", "any", []),
    ("leisure", "any", []),
    ("amenity", "any", []),
    ("area:highway", "any", []),
    ("boundary", "any", []),
    ("natural", "never", ["coastline", "cliff", "ridge", "arete", "tree_row"]),
    ("highway", "only", ["services", "rest_area", "escape", "elevator"]),
    ("railway", "only", ["station", "turntable", "roundhouse", "platform"]),
    ("waterway", "only", ["riverbank", "dock", "boatyard", "dam"]),
]


def is_area(tags: Column, closed: Column, rules=None) -> Column:
    """B6: polygon-ness of a closed ring from its tags."""
    rules = rules if rules is not None else DEFAULT_AREA_RULES
    area_tag = tags.getItem("area")
    cond = F.lit(False)
    for key, mode, values in rules:
        v = tags.getItem(key)
        if mode == "any":
            cond = cond | v.isNotNull()
        elif mode == "only":
            cond = cond | (v.isNotNull() & v.isin(*values))
        elif mode == "never":
            cond = cond | (v.isNotNull() & ~v.isin(*values))
    # explicit area=yes opts in, area=no always wins (AreaClassifier.java:85-118)
    # eqNullSafe: absent tag compares false, not NULL (3-valued-logic trap)
    return closed & F.when(area_tag.eqNullSafe("no"), F.lit(False)).otherwise(
        cond | area_tag.eqNullSafe("yes")
    )


def classify_ways(ways: DataFrame, tags_col: str = "tags", closed_col: str = "closed") -> DataFrame:
    return ways.withColumn("is_area", is_area(F.col(tags_col), F.col(closed_col)))


def problem_nodes(
    points: DataFrame, way_members: DataFrame, rel_members: DataFrame | None = None
) -> DataFrame:
    """B7: synthesize geodesk:duplicate / geodesk:orphan tags on untagged
    nodes. way_members: (node_ref,...); rel_members: (ref,...) node refs."""
    from pyspark.sql import Window

    untagged = F.size(F.col("tags")) == 0
    dup = F.count(F.lit(1)).over(Window.partitionBy("x", "y")) > 1
    refs = way_members.select(F.col("node_ref").alias("_ref")).distinct()
    if rel_members is not None:
        refs = refs.unionByName(rel_members.select(F.col("ref").alias("_ref")).distinct()).distinct()
    out = (
        points.withColumn("_dup", untagged & dup)
        .join(refs, points.id == refs._ref, "left")
        .withColumn("_orphan", untagged & F.col("_ref").isNull())
        .drop("_ref")
    )
    synth_tags = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("geodesk:duplicate"), F.lit("geodesk:orphan")),
            F.array(
                F.when(F.col("_dup"), "yes").cast("string"),
                F.when(F.col("_orphan"), "yes").cast("string"),
            ),
        ),
        lambda _, v: v.isNotNull(),
    )
    return out.withColumn("tags", F.map_concat(F.col("tags"), synth_tags)).drop("_dup", "_orphan")


def ghost_copies(membership: DataFrame, points_tiled: DataFrame) -> DataFrame:
    """C3: (way_id, tile, is_ghost) — one row per tile a way's nodes occupy;
    ghosts are copies outside the way's home (minimum) tile."""
    nodes = points_tiled.select(F.col("id").alias("node_ref"), "tile")
    wt = membership.join(nodes, "node_ref").select("way_id", "tile").distinct()
    from pyspark.sql import Window

    home = F.min("tile").over(Window.partitionBy("way_id"))
    return wt.withColumn("is_ghost", F.col("tile") != home)


def gst_strings(
    kv: DataFrame,
    max_strings: int = 64000,
    indexed_keys: list[str] | None = None,
    indexed_bonus: int = 10_000_000_000_000,
) -> DataFrame:
    """D5: global-string-table selection. kv: (s, kind) with kind in
    {key, value, role}. weight = 5*keys + 2*roles + values (+bonus for
    indexed keys); top max_strings by (weight desc, s)."""
    counts = kv.groupBy("s").agg(
        F.sum(F.when(F.col("kind") == "key", 1).otherwise(0)).alias("n_key"),
        F.sum(F.when(F.col("kind") == "value", 1).otherwise(0)).alias("n_val"),
        F.sum(F.when(F.col("kind") == "role", 1).otherwise(0)).alias("n_role"),
    )
    weight = F.col("n_key") * 5 + F.col("n_role") * 2 + F.col("n_val")
    if indexed_keys:
        weight = weight + F.when(
            F.col("s").isin(*indexed_keys) & (F.col("n_key") > 0), indexed_bonus
        ).otherwise(0)
    return (
        counts.withColumn("weight", weight.cast("bigint"))
        .orderBy(F.col("weight").desc(), F.col("s").asc())
        .limit(max_strings)
    )
