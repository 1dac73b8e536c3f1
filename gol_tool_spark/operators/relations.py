"""Relation member resolution with super-relation fixed point.

Reference parity: C4 relation->member join (build/Sorter.java:718-802), C5
super-relation fixed point over relations-referencing-relations incl. cycles
(build/Sorter.java:841-1071 — iterative passes until no tile quad changes),
C6 missing members -> Purgatory (build/Sorter.java:620-688), C9 relation
bbox aggregation loop (build/Validator.java:1287-1397,1699-1755).

Spark form: an iterative DataFrame loop — each pass joins the relation->
relation edge list against the current bbox table and re-aggregates;
stop-on-no-change mirrors the reference exactly, so cycles terminate (a
cycle's bboxes reach their joint fixed point and stop changing).  Each pass
is checkpointed (localCheckpoint) to cut lineage — at planet scale this is
the difference between O(depth) and O(depth^2) plan growth.  Iterations are
bounded by max_iters as a cycle-safety net.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BBOX_COLS = ("minx", "miny", "maxx", "maxy")


def split_members(relations: DataFrame) -> dict[str, DataFrame]:
    """C4: explode members, split by member type, drop self-references.
    relations: (rel_id, members array<struct<mtype, ref, role>>)."""
    m = relations.select(
        "rel_id",
        F.posexplode_outer("members").alias("seq", "m"),
    ).select("rel_id", "seq", F.col("m.mtype").alias("mtype"),
             F.col("m.ref").alias("ref"), F.col("m.role").alias("role"))
    m = m.filter(F.col("ref").isNotNull())
    m = m.filter(~((F.col("mtype") == "relation") & (F.col("ref") == F.col("rel_id"))))
    return {
        "node": m.filter(F.col("mtype") == "node"),
        "way": m.filter(F.col("mtype") == "way"),
        "relation": m.filter(F.col("mtype") == "relation"),
        "all": m,
    }


def resolve_bboxes(
    relations: DataFrame,
    node_bboxes: DataFrame,   # (id, minx, miny, maxx, maxy) — points: min=max
    way_bboxes: DataFrame,    # (id, minx, miny, maxx, maxy)
    max_iters: int = 25,
) -> DataFrame:
    """C5/C9: relation bboxes via convergence loop. Returns
    (rel_id, minx, miny, maxx, maxy, resolved boolean) — relations whose
    members are all missing stay unresolved (Purgatory, C6)."""
    members = split_members(relations)

    def base_join(mdf: DataFrame, src: DataFrame) -> DataFrame:
        s = src.select(F.col("id").alias("ref"), *BBOX_COLS)
        return mdf.join(s, "ref", "inner").select("rel_id", *BBOX_COLS)

    leaf = base_join(members["node"], node_bboxes).unionByName(
        base_join(members["way"], way_bboxes)
    )
    current = leaf.groupBy("rel_id").agg(
        F.min("minx").alias("minx"), F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
    )
    rel_edges = members["relation"].select("rel_id", F.col("ref").alias("child_id"))

    for _ in range(max_iters):
        child = current.select(
            F.col("rel_id").alias("child_id"), *[F.col(c).alias(f"c_{c}") for c in BBOX_COLS]
        )
        contrib = rel_edges.join(child, "child_id", "inner").select(
            "rel_id", *[F.col(f"c_{c}").alias(c) for c in BBOX_COLS]
        )
        nxt = (
            current.select("rel_id", *BBOX_COLS)
            .unionByName(contrib)
            .groupBy("rel_id")
            .agg(
                F.min("minx").alias("minx"), F.min("miny").alias("miny"),
                F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
            )
            .localCheckpoint(eager=True)
        )
        # stop-on-no-change (reference Sorter.java:934-979): compare by anti-join
        changed = (
            nxt.alias("n")
            .join(
                current.alias("c"),
                (F.col("n.rel_id") == F.col("c.rel_id"))
                & (F.col("n.minx") == F.col("c.minx")) & (F.col("n.miny") == F.col("c.miny"))
                & (F.col("n.maxx") == F.col("c.maxx")) & (F.col("n.maxy") == F.col("c.maxy")),
                "left_anti",
            )
            .limit(1)
            .count()
        )
        current = nxt
        if changed == 0:
            break

    all_rel = relations.select("rel_id").distinct()
    return (
        all_rel.join(current, "rel_id", "left")
        .withColumn("resolved", F.col("minx").isNotNull())
    )


def missing_members(relations: DataFrame, node_ids: DataFrame, way_ids: DataFrame) -> DataFrame:
    """C6: memberships whose target does not exist (node/way refs only;
    relation refs check against the relation table itself)."""
    members = split_members(relations)["all"]
    rel_ids = relations.select(F.col("rel_id").alias("id")).distinct()
    checks = {
        "node": node_ids.select("id"),
        "way": way_ids.select("id"),
        "relation": rel_ids,
    }
    parts = []
    for mtype, ids in checks.items():
        mm = members.filter(F.col("mtype") == mtype).join(
            ids.withColumnRenamed("id", "ref"), "ref", "left_anti"
        )
        parts.append(mm)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("rel_id", "seq", "mtype", "ref", "role")


def resolve_quads(
    relations: DataFrame,
    node_bboxes: DataFrame,
    way_bboxes: DataFrame,
    zoom: int = 12,
    max_iters: int = 25,
) -> DataFrame:
    """C5 at tile-quad granularity: resolve relation bboxes to the fixed
    point, then pack each into a tile quad (the reference resolves quads
    directly; bbox-then-quad yields the same footprint because quad packing
    is monotone in the bbox — the quad of the union bbox covers the union
    of member quads)."""
    from .tiling import way_quads

    boxes = resolve_bboxes(relations, node_bboxes, way_bboxes, max_iters)
    resolved = boxes.filter(F.col("resolved"))
    quads = way_quads(
        resolved.select(F.col("rel_id").alias("way_id"), *BBOX_COLS), zoom
    ).select(F.col("way_id").alias("rel_id"), "quad")
    return boxes.join(quads, "rel_id", "left")
