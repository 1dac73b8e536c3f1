"""Full-fidelity change stream: typed node/way/relation changes with tag
payloads — the complete `gol update` path (A10).

Reference parity: update/Updater.java orchestrates ChangeReader (OsmChange
XML -> ChangedNode/ChangedWay/ChangedRelation records, see osc.py),
TileFinder/FeatureFinder (resolve changed feature ids to the tiles holding
them via the store's indexes), then patches only those tiles.  Tag changes
follow tiles/TagTableBuilder.java:309 diff semantics: a change record's
tags REPLACE the stored tags (OsmChange carries the full new tag set), and
the store applies them as merge(old, diff(old, new)) through the
functions/tags.py kernels whose round-trip law merge(a, diff(a,b)) == b is
property-tested — so a `patch` op carrying a bare diff (null value =
delete key) is equally supported.

Store layout (all parquet, partition-pruned on every access):

    <store>/nodes      partitionBy pile   (id, x, y, tags, tile, pile)
    <store>/ways       partitionBy pile   (id, refs, tags, pile)
                       one row per pile the way spreads into — the C2 tile
                       spread (a way lives in every pile that holds one of
                       its nodes; build/Sorter.java:718-802)
    <store>/relations  partitionBy pile   (id, members, tags, pile)
                       pile = min over member piles (fixed point through
                       super-relations; unresolvable -> PURGATORY)
    <store>_idx/nodes        partitionBy ib  (id, pile, ib)
    <store>_idx/ways         partitionBy ib  (id, pile, ib)  per spread pile
    <store>_idx/rels         partitionBy ib  (id, pile, ib)
    <store>_idx/node_ways    partitionBy ib  (node_id, way_id, ib)
                             reverse index: which ways reference a node —
                             the TileFinder way-lookup.  Indexes ALL refs,
                             resolved or not, so creating a node later
                             re-dirties the ways that already point at it.
    <store>_idx/member_rels  partitionBy ib  (mtype, ref, rel_id, ib)
                             reverse index: which relations reference a
                             member (node/way/relation).

ib = pmod(xxhash64(key), NB) — reading only the buckets the changed ids
hash to makes every index lookup O(|batch|/NB * store/NB), never a scan.

The merge cascade (one micro-batch):
  1. nodes merge (winner-per-id, tags via diff/merge, new pile from coords)
  2. ways dirty = directly changed  ∪  ways referencing a changed node
     (node_ways index) — a node moving across a pile boundary re-runs its
     parent ways' C2 spread; only the piles in (old ∪ new spread) rewrite
  3. relations dirty = directly changed ∪ relations referencing a changed
     member, closed transitively over super-relations (member_rels index);
     re-piled by the min-member-pile fixed point
All writes are dynamic partition overwrites of ONLY the affected piles /
buckets; crash-safety is the same contract as changes.py (idempotent
merge x checkpoint replay, assuming atomic per-partition commit — Iceberg
MERGE INTO is the fully-transactional form).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import AnalysisException

_log = logging.getLogger(__name__)

from ..functions import tags as TG
from . import txstore
from .changes import PILE_ZOOM, _bucket, _dynamic_overwrite, _with_pile

# Above this many winner rows in one merge batch, the delta-derived key
# sets are no longer "small" and broadcasting them risks driver memory /
# the 8GB broadcast ceiling: the merge falls back to un-hinted joins and
# lets AQE pick the strategy.  This turns the documented delta<<store
# assumption into an enforced guard instead of a failure mode.
BROADCAST_DELTA_ROWS = int(
    os.environ.get("SPARK_GRAFT_BROADCAST_DELTA_ROWS", "5000000")
)

# Optimistic-concurrency retries per merge batch: how many times a batch
# recomputes after a competing writer's commit lands in its read/write
# set before the conflict propagates to the stream.
MERGE_CONFLICT_RETRIES = int(
    os.environ.get("SPARK_GRAFT_MERGE_CONFLICT_RETRIES", "3")
)

CHANGE_SCHEMA_FULL = (
    "op string, ftype string, id long, version long, x long, y long, "
    "tags map<string,string>, refs array<long>, "
    "members array<struct<mtype:string,ref:long,role:string>>, seq long"
)
PURGATORY = -1  # build/Sorter.java:620-688 — the tile of the unresolvable

_EMPTY_TAGS = "cast(map() as map<string,string>)"


def _paths(store_path: str) -> dict[str, str]:
    idx = store_path.rstrip("/") + "_idx"
    return {
        "nodes": os.path.join(store_path, "nodes"),
        "ways": os.path.join(store_path, "ways"),
        "relations": os.path.join(store_path, "relations"),
        "idx_nodes": os.path.join(idx, "nodes"),
        "idx_ways": os.path.join(idx, "ways"),
        "idx_rels": os.path.join(idx, "rels"),
        "idx_node_ways": os.path.join(idx, "node_ways"),
        "idx_member_rels": os.path.join(idx, "member_rels"),
    }


def _applied_tags(op, old_tags, given_tags):
    """TagTableBuilder.java:309 semantics via the tags.py kernels:
    upsert = full replacement, computed as merge(old, diff(old, new)) —
    the round-trip law makes this equal `new`; patch = merge(old, diff)
    where the record's tags column IS the diff (null value = delete)."""
    empty = F.expr(_EMPTY_TAGS)
    oldm = F.coalesce(old_tags, empty)
    givenm = F.coalesce(given_tags, empty)
    out = F.when(
        op == "patch", TG.tags_merge(oldm, givenm)
    ).otherwise(TG.tags_merge(oldm, TG.tags_diff(oldm, givenm)))
    # normalize nullability: map_concat/map_filter infer valueContainsNull=
    # false, which lands a DIFFERENT parquet value type than the bulk-loaded
    # files — mixed piles would then fail schema reconciliation at read time
    return out.cast("map<string,string>")


def read_full_change_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(CHANGE_SCHEMA_FULL).json(path)


def _winners(batch: DataFrame) -> DataFrame:
    """Deterministic intra-batch resolution per (ftype, id): highest seq
    wins, delete beats upsert on a tie — same rule as changes.py, so
    replays always pick the same winner and the merge stays idempotent.
    A final content-hash tiebreaker makes the order TOTAL: two upserts
    with equal (seq, op) would otherwise be broken by partition scan
    order, and a checkpoint replay could crown the other row — the exact
    divergence the determinism rule exists to prevent."""
    from pyspark.sql import Window

    pri = F.when(F.col("op") == "delete", 1).otherwise(0)
    content = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in batch.columns])))
    w = Window.partitionBy("ftype", "id").orderBy(
        F.coalesce(F.col("seq"), F.lit(0)).desc(), pri.desc(), content.desc()
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _pruned_index(
    tx, key: str, keys: DataFrame, keycol: str, nb: int, bcast=F.broadcast
) -> DataFrame | None:
    """Partition-pruned index lookup: index rows whose `keycol` appears in
    `keys` (a small DataFrame — bounded by the batch's dirty closure),
    reading ONLY the buckets those keys hash to (manifest file-list prune
    on versioned stores, Catalyst PartitionFilters on legacy)."""
    if not tx.has(key):
        return None
    buckets = [
        r.ib
        for r in keys.select(_bucket(F.col(keycol), nb).alias("ib")).distinct().collect()
    ]
    if not buckets:
        return None
    try:
        idx = tx.read_parts(key, "ib", buckets)
    except AnalysisException as e:
        # dir exists but holds no parquet footers (store bulk-loaded from
        # an empty DataFrame writes only _SUCCESS) — an empty index.
        # ONLY schema-inference failures mean that; any other analysis
        # error (schema drift, corrupt footer) must fail the batch —
        # swallowing it would skip the old-pile anti-join and silently
        # duplicate rows.
        ec = e.getErrorClass() if hasattr(e, "getErrorClass") else None
        if (ec and "UNABLE_TO_INFER_SCHEMA" in ec) or (
            ec is None and "nable to infer schema" in str(e)
        ):
            return None
        raise
    if idx is None:
        return None
    return idx.filter(F.col("ib").isin(buckets)).join(
        bcast(keys.select(keycol).distinct()), keycol
    )


# ---------------------------------------------------------------- bulk load


def way_spread(ways: DataFrame, node_piles: DataFrame) -> DataFrame:
    """C2 tile spread: one (id, refs, tags, pile) row per pile holding one
    of the way's nodes; a way with zero resolvable nodes goes to PURGATORY.
    ways: (id, refs, tags); node_piles: (ref, pile)."""
    refs = ways.select("id", F.explode_outer("refs").alias("ref"))
    hit = refs.join(node_piles, "ref").select("id", "pile").distinct()
    missed = ways.select("id").join(hit.select("id"), "id", "left_anti").select(
        "id", F.lit(PURGATORY).cast("long").alias("pile")
    )
    return ways.join(hit.unionByName(missed), "id").select(
        "id", "refs", "tags", "pile"
    )


def rel_piles(
    rels: DataFrame,
    node_piles: DataFrame,
    way_piles: DataFrame,
    seed_rel_piles: DataFrame | None = None,
    max_iters: int = 10,
) -> DataFrame:
    """Relation pile = min over LOCATABLE member piles, iterated to a
    fixed point through relation-type members (super-relations, C5
    analogue at pile granularity); a relation lands in PURGATORY only when
    NO member is locatable — a purgatory member (pile -1) never drags a
    relation with locatable members down there (min would otherwise always
    pick -1), it is simply not a location.
    rels: (id, members); node_piles/way_piles: (ref, pile);
    seed_rel_piles: (ref, pile) for relation members OUTSIDE `rels`."""
    m = rels.select("id", F.explode_outer("members").alias("mm")).select(
        "id", F.col("mm.mtype").alias("mtype"), F.col("mm.ref").alias("ref")
    )
    located = F.col("pile") != PURGATORY
    leaf = (
        m.filter(F.col("mtype") == "node")
        .join(node_piles.filter(located), "ref")
        .select("id", "pile")
        .unionByName(
            m.filter(F.col("mtype") == "way")
            .join(way_piles.filter(located), "ref")
            .select("id", "pile")
        )
    )
    if seed_rel_piles is not None:
        inner = rels.select(F.col("id").alias("ref"))
        ext = (
            m.filter(F.col("mtype") == "relation")
            .join(inner, "ref", "left_anti")
            .join(seed_rel_piles.filter(located), "ref")
            .select("id", "pile")
        )
        leaf = leaf.unionByName(ext)
    # eager: the leaf plan can embed pruned store reads (merge path) —
    # without the checkpoint every fixed-point pass re-runs them
    static = (
        leaf.groupBy("id").agg(F.min("pile").alias("pile")).localCheckpoint(eager=True)
    )
    edges = (
        m.filter(F.col("mtype") == "relation")
        .join(rels.select(F.col("id").alias("ref")), "ref", "left_semi")
        .filter(F.col("ref") != F.col("id"))
        .select("id", "ref")
    )
    cur = static
    for _ in range(max_iters):
        child = cur.select(F.col("id").alias("ref"), F.col("pile").alias("cpile"))
        nxt = (
            static.unionByName(
                edges.join(child, "ref").select("id", F.col("cpile").alias("pile"))
            )
            .groupBy("id")
            .agg(F.min("pile").alias("pile"))
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.alias("n")
            .join(
                cur.alias("c"),
                (F.col("n.id") == F.col("c.id")) & (F.col("n.pile") == F.col("c.pile")),
                "left_anti",
            )
            .limit(1)
            .count()
        )
        cur = nxt
        if changed == 0:
            break
    else:
        # cap reached while the last pass still changed piles — deeper
        # nesting than max_iters would stay stale with no signal otherwise
        _log.warning(
            "rel_piles fixed point did not converge in %d iterations; "
            "relations nested deeper may carry stale piles — raise max_iters",
            max_iters,
        )
    return (
        rels.select("id", "members", "tags")
        .join(cur, "id", "left")
        .withColumn("pile", F.coalesce(F.col("pile"), F.lit(PURGATORY)).cast("long"))
    )


BBOX_COLS = ("minx", "miny", "maxx", "maxy")


def rel_bboxes(
    rels: DataFrame,
    node_xy: DataFrame,
    way_bboxes: DataFrame,
    seed_rel_bboxes: DataFrame | None = None,
    max_iters: int = 10,
) -> DataFrame:
    """Relation bbox = min/max over member footprints, iterated to a fixed
    point through relation-type members — the update-path twin of
    relations.resolve_bboxes (build/Validator.java:1287-1397), extended
    with SEEDS: bboxes of child relations outside `rels` (in a merge, the
    non-dirty children contribute their STORED footprint).  Unresolvable
    relations keep NULL bboxes (their quad stays NULL — the purgatory
    footprint).  rels: (id, members); node_xy: (ref, x, y); way_bboxes /
    seed_rel_bboxes: (ref, minx, miny, maxx, maxy)."""
    m = rels.select("id", F.explode_outer("members").alias("mm")).select(
        "id", F.col("mm.mtype").alias("mtype"), F.col("mm.ref").alias("ref")
    )
    node_leaf = (
        m.filter(F.col("mtype") == "node")
        .join(node_xy, "ref")
        .select(
            "id",
            F.col("x").alias("minx"), F.col("y").alias("miny"),
            F.col("x").alias("maxx"), F.col("y").alias("maxy"),
        )
    )
    leaf = node_leaf.unionByName(
        m.filter(F.col("mtype") == "way").join(way_bboxes, "ref").select("id", *BBOX_COLS)
    )
    if seed_rel_bboxes is not None:
        inner = rels.select(F.col("id").alias("ref"))
        ext = (
            m.filter(F.col("mtype") == "relation")
            .join(inner, "ref", "left_anti")
            .join(seed_rel_bboxes.filter(F.col("minx").isNotNull()), "ref")
            .select("id", *BBOX_COLS)
        )
        leaf = leaf.unionByName(ext)

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("id").agg(
            F.min("minx").alias("minx"), F.min("miny").alias("miny"),
            F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
        )

    # eager for the same reason as rel_piles: leaf embeds pruned store
    # reads in the merge path; checkpoint once, iterate cheap
    static = agg(leaf).localCheckpoint(eager=True)
    edges = (
        m.filter(F.col("mtype") == "relation")
        .join(rels.select(F.col("id").alias("ref")), "ref", "left_semi")
        .filter(F.col("ref") != F.col("id"))
        .select("id", "ref")
    )
    cur = static
    for _ in range(max_iters):
        child = cur.select(
            F.col("id").alias("ref"), *[F.col(c).alias(f"c_{c}") for c in BBOX_COLS]
        )
        contrib = edges.join(child, "ref").select(
            "id", *[F.col(f"c_{c}").alias(c) for c in BBOX_COLS]
        )
        nxt = agg(static.unionByName(contrib)).localCheckpoint(eager=True)
        changed = (
            nxt.alias("n")
            .join(
                cur.alias("c"),
                (F.col("n.id") == F.col("c.id"))
                & (F.col("n.minx") == F.col("c.minx"))
                & (F.col("n.miny") == F.col("c.miny"))
                & (F.col("n.maxx") == F.col("c.maxx"))
                & (F.col("n.maxy") == F.col("c.maxy")),
                "left_anti",
            )
            .limit(1)
            .count()
        )
        cur = nxt
        if changed == 0:
            break
    else:
        _log.warning(
            "rel_bboxes fixed point did not converge in %d iterations; "
            "relations nested deeper may carry stale bboxes — raise max_iters",
            max_iters,
        )
    return rels.select("id").distinct().join(cur, "id", "left")


def _with_rel_geometry(rrows: DataFrame, bboxes: DataFrame) -> DataFrame:
    """Join resolved bboxes + packed tile quad (F4 zoom-desc placement,
    tiling.way_quads packing) onto relation rows."""
    from ..operators.tiling import way_quads

    resolved = bboxes.filter(F.col("minx").isNotNull())
    quads = way_quads(
        resolved.select(F.col("id").alias("way_id"), *BBOX_COLS)
    ).select(F.col("way_id").alias("id"), "quad")
    return (
        rrows.join(bboxes, "id", "left")
        .join(quads, "id", "left")
        .select(
            "id", "members", "tags",
            *BBOX_COLS, "quad",
            "pile",
        )
    )


def _quad_piles_udf(pile_zoom: int = PILE_ZOOM):
    """array<long> of pile ids covered by a packed quad (NULL-safe) —
    shared by quad placement and its verify check so the two can't
    drift."""
    import pandas as pd
    from pyspark.sql import types as Ty

    from ..kernels import tile as KT

    def _qp(quad):
        return quad.map(
            lambda q: KT.quad_piles(int(q), pile_zoom) if pd.notna(q) else None
        )

    _qp.__annotations__ = {"quad": pd.Series, "return": pd.Series}
    return F.pandas_udf(_qp, Ty.ArrayType(Ty.LongType()))


def _apply_placement(
    rrows: DataFrame, placement: str, pile_zoom: int = PILE_ZOOM
) -> DataFrame:
    """Relation placement policy (rrows: _with_rel_geometry output).

    "min" (default): ONE copy at the min-member pile — queries scope
    relations by their stored bbox instead of pile (ROUND_NOTES
    limitation 3).  "quad": replicate into every pile of the relation's
    tile quad (<=4 copies, build/Sorter.java:718-802 /
    TileCatalog.java:260-306 zoom-down rules) so per-pile contents match
    the reference's tile-for-tile placement; unresolvable relations
    (NULL quad) keep their single purgatory/min copy."""
    if placement != "quad":
        return rrows
    qp = _quad_piles_udf(pile_zoom)
    return rrows.withColumn(
        "_qpiles",
        F.when(F.col("quad").isNotNull(), qp(F.col("quad"))),
    ).select(
        "id", "members", "tags", *BBOX_COLS, "quad",
        F.explode(
            F.coalesce(F.col("_qpiles"), F.array(F.col("pile")))
        ).alias("pile"),
    )


def _meta_path(store_path: str) -> str:
    return os.path.join(store_path, "_gol_meta.json")


def _load_meta(store_path: str, version: int | None = None) -> dict:
    import json

    # Versioned stores carry meta in the committed snapshot manifest —
    # the only copy consistent-by-construction with the table map it was
    # committed with (`version` pins a retained snapshot for time-travel
    # reads).  _gol_meta.json remains for legacy stores (and for
    # versioned stores bulk-loaded before meta moved into the manifest).
    if txstore.is_versioned(store_path):
        try:
            man = txstore.load_manifest(store_path, version)
            if "meta" in man:
                return man["meta"]
        except (OSError, ValueError, AssertionError):
            if version is not None:
                raise
    try:
        with open(_meta_path(store_path)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _node_keybits(tags_col, indexed_keys: str | None):
    if not indexed_keys:
        return F.lit(0).cast("int")
    from ..functions import keybits as KB

    return KB.keybits_col(tags_col, KB.parse_schema(indexed_keys))


def write_full_store(
    nodes: DataFrame,
    ways: DataFrame | None,
    rels: DataFrame | None,
    store_path: str,
    zoom: int = 12,
    index_buckets: int = 16,
    indexed_keys: str | None = None,
    layout: str = "versioned",
    placement: str = "min",
    pile_zoom: int = PILE_ZOOM,
) -> None:
    """Bulk-load a typed store + every index apply_changes_full merges into.
    nodes: (id, x, y, tags); ways: (id, refs, tags); rels: (id, members,
    tags).  With `indexed_keys` (the reference's indexed-keys config,
    KeyIndexSchema grammar) nodes carry a `keybits` column and each pile's
    files sort by it, so a GOQL tag query's keybits prefilter prunes row
    groups via parquet min/max stats (SIndexTree bucket pruning without a
    second partition level — the merge path stays single-level and just
    recomputes the column); the schema string persists in the store's
    meta file so query_store applies the prefilter automatically.

    layout="versioned" (the default since round 5 — it benched FASTER
    than legacy locally, needs no checkpoint/lineage break, and is the
    only crash-safe lane) writes a snapshot-manifest store (txstore.py):
    subsequent merges publish each batch with ONE atomic manifest swap, so
    a crash mid-merge can never expose a torn store — the journaled-store
    crash contract of the reference (clarisma/common/store/,
    update/Updater.java:34-55) on plain parquet.  layout="legacy" keeps
    the pre-manifest dynamic-partition-overwrite layout; existing legacy
    stores remain fully readable/mergeable either way (open_tx sniffs)."""
    import json

    p = _paths(store_path)
    spark = nodes.sparkSession
    # an empty DataFrame partitionBy-writes only _SUCCESS (no schema) —
    # treat it as absent; the merge path creates the store on first use
    if ways is not None and ways.isEmpty():
        ways = None
    if rels is not None and rels.isEmpty():
        rels = None
    if layout not in ("legacy", "versioned"):
        raise ValueError(f"layout={layout!r}: expected 'legacy' or 'versioned'")
    if placement not in ("min", "quad"):
        raise ValueError(f"placement={placement!r}: expected 'min' or 'quad'")
    if not 0 <= pile_zoom <= zoom:
        raise ValueError(f"pile_zoom={pile_zoom} must be in [0, zoom]")
    # reset=True: a bulk load has full-overwrite semantics — partitions
    # and tables absent from this load must drop out of the manifest
    tx = (
        txstore.StoreTx(spark, store_path, p, reset=True)
        if layout == "versioned"
        else None
    )

    def _bulk(key: str, df: DataFrame, part: str, sort_within=None):
        if tx is not None:
            tx.overwrite_parts(key, df, part, affected=[], sort_within=sort_within)
        else:
            out = df
            if sort_within:  # nodes: Hilbert/keybits row-group locality
                out = out.repartition(F.col(part)).sortWithinPartitions(*sort_within)
            out.write.mode("overwrite").partitionBy(part).parquet(p[key])

    empty = F.expr(_EMPTY_TAGS)
    nrows = (
        _with_pile(nodes, zoom, pile_zoom)
        .select(
            "id", "x", "y",
            F.coalesce("tags", empty).alias("tags"),
            "tile", "pile",
            _node_keybits(F.coalesce("tags", empty), indexed_keys).alias("keybits"),
        )
        .localCheckpoint(eager=True)
    )
    _bulk("nodes", nrows, "pile", sort_within=["keybits", "tile", "id"])
    os.makedirs(store_path, exist_ok=True)
    meta = {"indexed_keys": indexed_keys, "zoom": zoom, "placement": placement,
            "pile_zoom": pile_zoom}
    if tx is not None:
        # versioned: meta rides INSIDE the snapshot manifest so a crash
        # before tx.commit() can never pair new placement/pile_zoom with
        # the old committed data (ADVICE r4); no _gol_meta.json is written.
        tx.set_meta(meta)
    else:
        with open(_meta_path(store_path), "w") as fh:
            json.dump(meta, fh)
    nidx = nrows.select("id", "pile", _bucket(F.col("id"), index_buckets).alias("ib"))
    _bulk("idx_nodes", nidx, "ib")

    node_piles = nrows.select(F.col("id").alias("ref"), "pile")
    wrows = None
    if ways is not None:
        wsrc = ways.select("id", "refs", F.coalesce("tags", empty).alias("tags"))
        wrows = way_spread(wsrc, node_piles).localCheckpoint(eager=True)
        _bulk("ways", wrows, "pile")
        _bulk(
            "idx_ways",
            wrows.select("id", "pile", _bucket(F.col("id"), index_buckets).alias("ib")),
            "ib",
        )
        _bulk(
            "idx_node_ways",
            wsrc.select(F.col("id").alias("way_id"), F.explode("refs").alias("node_id"))
            .distinct()
            .select("node_id", "way_id", _bucket(F.col("node_id"), index_buckets).alias("ib")),
            "ib",
        )
    if rels is not None:
        rsrc = rels.select("id", "members", F.coalesce("tags", empty).alias("tags"))
        # reuse the checkpointed spread — recomputing it would repeat the
        # dominant explode+join of the bulk load
        way_piles = (
            wrows.groupBy("id")
            .agg(F.min("pile").alias("pile"))
            .select(F.col("id").alias("ref"), "pile")
            if wrows is not None
            else spark.createDataFrame([], "ref long, pile long")
        )
        rrows = rel_piles(rsrc, node_piles, way_piles).localCheckpoint(eager=True)
        node_xy = nrows.select(F.col("id").alias("ref"), "x", "y")
        way_bb = (
            wsrc.select("id", F.explode("refs").alias("ref"))
            .join(node_xy, "ref")
            .groupBy("id")
            .agg(
                F.min("x").alias("minx"), F.min("y").alias("miny"),
                F.max("x").alias("maxx"), F.max("y").alias("maxy"),
            )
            .select(F.col("id").alias("ref"), *BBOX_COLS)
            if ways is not None
            else spark.createDataFrame(
                [], "ref long, minx long, miny long, maxx long, maxy long"
            )
        )
        bboxes = rel_bboxes(rsrc, node_xy, way_bb)
        rrows = _apply_placement(
            _with_rel_geometry(rrows, bboxes), placement, pile_zoom
        ).localCheckpoint(eager=True)
        _bulk("relations", rrows, "pile")
        _bulk(
            "idx_rels",
            rrows.select("id", "pile", _bucket(F.col("id"), index_buckets).alias("ib")),
            "ib",
        )
        _bulk(
            "idx_member_rels",
            rsrc.select(F.col("id").alias("rel_id"), F.explode("members").alias("mm"))
            .select(
                F.col("mm.mtype").alias("mtype"),
                F.col("mm.ref").alias("ref"),
                "rel_id",
            )
            .distinct()
            .withColumn("ib", _bucket(F.col("ref"), index_buckets)),
            "ib",
        )
    if tx is not None:
        tx.commit()


# -------------------------------------------------------------------- merge


def _make_merge(p: dict[str, str], zoom: int, index_buckets: int, max_rel_iters: int):
    """Build the per-batch merge closure over a store layout — shared by
    the JSON change stream (apply_changes_full) and the direct OsmChange
    stream (apply_osc_changes)."""
    store_root = os.path.dirname(p["nodes"])

    def _merge_once(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sp = batch.sparkSession
        # versioned stores: every read below resolves the committed
        # snapshot (or this tx's staged epochs), every write stages into
        # the tx, and ONE manifest swap at the end publishes the batch —
        # crash anywhere = old snapshot intact.  Legacy stores keep the
        # dynamic-overwrite behavior behind the same interface.
        tx = txstore.open_tx(sp, store_root, p)
        empty = F.expr(_EMPTY_TAGS)
        win = _winners(batch).localCheckpoint(eager=True)
        # count is a cheap scan of the checkpoint; oversized deltas drop
        # the broadcast hints everywhere below (see BROADCAST_DELTA_ROWS)
        big_delta = win.count() > BROADCAST_DELTA_ROWS
        bcast = (lambda d: d) if big_delta else F.broadcast
        tx.bcast = bcast  # merge_part's drop-key join uses the same guard

        # ---------------- 1. nodes ----------------
        nw = win.filter(F.col("ftype") == "n")
        n_ids = nw.select("id").distinct()
        have_nodes = tx.has("nodes")
        old_n = None
        n_old_piles: set = set()
        if have_nodes and not nw.isEmpty():
            nidx = _pruned_index(tx, "idx_nodes", n_ids, "id", index_buckets, bcast)
            if nidx is not None:
                n_old_piles = {r.pile for r in nidx.select("pile").distinct().collect()}
            if n_old_piles:
                old_n = (
                    tx.read_parts("nodes", "pile", sorted(n_old_piles))
                    .join(bcast(n_ids), "id", "left_semi")
                    .select(
                        F.col("id"),
                        F.col("x").alias("_ox"),
                        F.col("y").alias("_oy"),
                        F.col("tags").alias("_otags"),
                    )
                )
        ups_n_src = nw.filter(F.col("op") != "delete").select(
            "id", "op", "x", "y", "tags"
        )
        if old_n is not None:
            ups_n_src = ups_n_src.join(old_n, "id", "left")
        else:
            ups_n_src = (
                ups_n_src.withColumn("_ox", F.lit(None).cast("long"))
                .withColumn("_oy", F.lit(None).cast("long"))
                .withColumn("_otags", F.lit(None).cast("map<string,string>"))
            )
        ups_n = (
            ups_n_src.withColumn("x", F.coalesce("x", "_ox"))
            .withColumn("y", F.coalesce("y", "_oy"))
            .withColumn("tags", _applied_tags(F.col("op"), F.col("_otags"), F.col("tags")))
            .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
            .select("id", "x", "y", "tags")
        )
        # meta must come from the SNAPSHOT this tx reads: StoreTx holds
        # the base snapshot's meta, and _rebase conflicts if a competitor
        # changes it mid-batch.  Resolving the latest manifest here would
        # mix a concurrent re-load's pile_zoom/placement with base-version
        # table reads.  (LegacyTx has no snapshot; the file is the truth.)
        meta = getattr(tx, "meta", None)
        if meta is None:
            meta = _load_meta(store_root)
        indexed_keys = meta.get("indexed_keys")
        placement = meta.get("placement", "min")
        pile_zoom = meta.get("pile_zoom", PILE_ZOOM)
        ups_n = _with_pile(ups_n, zoom, pile_zoom).select(
            "id", "x", "y", "tags", "tile", "pile",
            _node_keybits(F.col("tags"), indexed_keys).alias("keybits"),
        ).localCheckpoint(eager=True)
        n_new_piles = {r.pile for r in ups_n.select("pile").distinct().collect()}
        n_affected = sorted(n_old_piles | n_new_piles)
        if n_affected:
            tx.merge_part("nodes", "pile", n_affected, n_ids, "id", ups_n)
            n_buckets = [
                r.ib
                for r in n_ids.select(_bucket(F.col("id"), index_buckets).alias("ib"))
                .distinct()
                .collect()
            ]
            tx.merge_part(
                "idx_nodes",
                "ib",
                n_buckets,
                n_ids,
                "id",
                ups_n.select("id", "pile", _bucket(F.col("id"), index_buckets).alias("ib")),
            )

        # ---------------- 2. ways ----------------
        ww = win.filter(F.col("ftype") == "w")
        w_direct = ww.select("id").distinct()
        via_node = _pruned_index(
            tx,
            "idx_node_ways",
            n_ids.select(F.col("id").alias("node_id")),
            "node_id",
            index_buckets,
        )
        dirty_w = w_direct
        if via_node is not None:
            dirty_w = dirty_w.unionByName(
                via_node.select(F.col("way_id").alias("id"))
            ).distinct()
        dirty_w = dirty_w.localCheckpoint(eager=True)
        have_ways = tx.has("ways")
        w_deleted = ww.filter(F.col("op") == "delete").select("id").distinct()
        if have_ways or not ww.isEmpty():
            old_w = None
            w_old_piles: set = set()
            if have_ways:
                widx = _pruned_index(tx, "idx_ways", dirty_w, "id", index_buckets, bcast)
                if widx is not None:
                    w_old_piles = {
                        r.pile for r in widx.select("pile").distinct().collect()
                    }
                if w_old_piles:
                    # eager: consumed again after the ways store is
                    # overwritten (node_ways bucket computation)
                    old_w = (
                        tx.read_parts("ways", "pile", sorted(w_old_piles))
                        .join(bcast(dirty_w), "id", "left_semi")
                        .select("id", "refs", "tags")
                        .dropDuplicates(["id"])
                        .localCheckpoint(eager=True)
                    )

            # target way set after this batch: direct upserts (refs/tags
            # applied against old), plus node-dirty ways carried forward —
            # minus deletes
            w_up = ww.filter(F.col("op") != "delete").select("id", "op", "refs", "tags")
            if old_w is not None:
                w_up = w_up.join(
                    old_w.select(
                        "id",
                        F.col("refs").alias("_orefs"),
                        F.col("tags").alias("_otags"),
                    ),
                    "id",
                    "left",
                )
            else:
                w_up = w_up.withColumn(
                    "_orefs", F.lit(None).cast("array<long>")
                ).withColumn("_otags", F.lit(None).cast("map<string,string>"))
            w_up = (
                w_up.withColumn("refs", F.coalesce("refs", "_orefs"))
                .withColumn(
                    "tags", _applied_tags(F.col("op"), F.col("_otags"), F.col("tags"))
                )
                .filter(F.col("refs").isNotNull())
                .select("id", "refs", "tags")
            )
            carry = (
                old_w.join(bcast(w_direct), "id", "left_anti")
                if old_w is not None
                else None
            )
            targets = w_up if carry is None else w_up.unionByName(carry)
            targets = targets.join(
                bcast(w_deleted), "id", "left_anti"
            ).localCheckpoint(eager=True)

            # re-run the C2 spread for every target way: node piles from the
            # POST-merge node index (moved nodes resolve to their new pile)
            all_refs = targets.select(F.explode("refs").alias("ref")).distinct()
            npiles = _pruned_index(
                tx,
                "idx_nodes",
                all_refs.select(F.col("ref").alias("id")),
                "id",
                index_buckets,
            )
            node_piles = (
                npiles.select(F.col("id").alias("ref"), "pile")
                if npiles is not None
                else sp.createDataFrame([], "ref long, pile long")
            )
            new_w = way_spread(targets, node_piles).localCheckpoint(eager=True)
            w_new_piles = {r.pile for r in new_w.select("pile").distinct().collect()}
            w_affected = sorted(w_old_piles | w_new_piles)
            if w_affected or not dirty_w.isEmpty():
                if w_affected:
                    tx.merge_part("ways", "pile", w_affected, dirty_w, "id", new_w)
                w_buckets = [
                    r.ib
                    for r in dirty_w.select(
                        _bucket(F.col("id"), index_buckets).alias("ib")
                    )
                    .distinct()
                    .collect()
                ]
                if w_buckets:
                    tx.merge_part(
                        "idx_ways",
                        "ib",
                        w_buckets,
                        dirty_w,
                        "id",
                        new_w.select(
                            "id", "pile", _bucket(F.col("id"), index_buckets).alias("ib")
                        ).distinct(),
                    )
                # node_ways reverse index: rows live in buckets of old AND
                # new refs of every dirty way
                ref_srcs = [targets.select(F.explode("refs").alias("node_id"))]
                if old_w is not None:
                    ref_srcs.append(old_w.select(F.explode("refs").alias("node_id")))
                all_ref_nodes = ref_srcs[0]
                for s in ref_srcs[1:]:
                    all_ref_nodes = all_ref_nodes.unionByName(s)
                nw_buckets = [
                    r.ib
                    for r in all_ref_nodes.select(
                        _bucket(F.col("node_id"), index_buckets).alias("ib")
                    )
                    .distinct()
                    .collect()
                ]
                if nw_buckets:
                    new_pairs = (
                        targets.select(
                            F.col("id").alias("way_id"),
                            F.explode("refs").alias("node_id"),
                        )
                        .distinct()
                        .select(
                            "node_id",
                            "way_id",
                            _bucket(F.col("node_id"), index_buckets).alias("ib"),
                        )
                    )
                    tx.merge_part(
                        "idx_node_ways",
                        "ib",
                        nw_buckets,
                        dirty_w.select(F.col("id").alias("way_id")),
                        "way_id",
                        new_pairs,
                    )
        else:
            new_w = None

        # ---------------- 3. relations ----------------
        rw = win.filter(F.col("ftype") == "r")
        r_direct = rw.select("id").distinct()
        # dirty closure: relations referencing any changed node/way/rel,
        # expanded transitively over super-relations (TileFinder analogue)
        changed_members = (
            n_ids.select(F.lit("node").alias("mtype"), F.col("id").alias("ref"))
            .unionByName(
                dirty_w.select(F.lit("way").alias("mtype"), F.col("id").alias("ref"))
            )
            .unionByName(
                r_direct.select(F.lit("relation").alias("mtype"), F.col("id").alias("ref"))
            )
        )
        dirty_r = r_direct
        frontier = changed_members
        for _ in range(max_rel_iters):
            hits = _pruned_index(
                tx, "idx_member_rels", frontier.select("ref"), "ref", index_buckets
            )
            if hits is None:
                break
            parents = (
                hits.join(bcast(frontier), ["mtype", "ref"], "left_semi")
                .select(F.col("rel_id").alias("id"))
                .distinct()
            )
            new_parents = parents.join(bcast(dirty_r), "id", "left_anti")
            new_parents = new_parents.localCheckpoint(eager=True)
            if new_parents.isEmpty():
                break
            dirty_r = dirty_r.unionByName(new_parents).localCheckpoint(eager=True)
            frontier = new_parents.select(
                F.lit("relation").alias("mtype"), F.col("id").alias("ref")
            )
        else:
            # loop exhausted with a non-empty frontier: super-relations
            # above max_rel_iters levels would silently miss the dirty set
            _log.warning(
                "super-relation dirty closure still expanding after %d "
                "iterations; deeper parents may keep stale piles/bboxes — "
                "raise max_rel_iters",
                max_rel_iters,
            )
        have_rels = tx.has("relations")
        r_deleted = rw.filter(F.col("op") == "delete").select("id").distinct()
        if have_rels or not rw.isEmpty():
            old_r = None
            r_old_piles: set = set()
            if have_rels:
                ridx = _pruned_index(tx, "idx_rels", dirty_r, "id", index_buckets, bcast)
                if ridx is not None:
                    r_old_piles = {
                        r.pile for r in ridx.select("pile").distinct().collect()
                    }
                if r_old_piles:
                    # eager: consumed again after the relations store is
                    # overwritten (member_rels bucket computation)
                    old_r = (
                        tx.read_parts("relations", "pile", sorted(r_old_piles))
                        .join(bcast(dirty_r), "id", "left_semi")
                        .select("id", "members", "tags")
                        .dropDuplicates(["id"])
                        .localCheckpoint(eager=True)
                    )
            r_up = rw.filter(F.col("op") != "delete").select("id", "op", "members", "tags")
            if old_r is not None:
                r_up = r_up.join(
                    old_r.select(
                        "id",
                        F.col("members").alias("_omem"),
                        F.col("tags").alias("_otags"),
                    ),
                    "id",
                    "left",
                )
            else:
                r_up = r_up.withColumn(
                    "_omem",
                    F.lit(None).cast("array<struct<mtype:string,ref:long,role:string>>"),
                ).withColumn("_otags", F.lit(None).cast("map<string,string>"))
            r_up = (
                r_up.withColumn("members", F.coalesce("members", "_omem"))
                .withColumn(
                    "tags", _applied_tags(F.col("op"), F.col("_otags"), F.col("tags"))
                )
                .filter(F.col("members").isNotNull())
                .select("id", "members", "tags")
            )
            carry_r = (
                old_r.join(bcast(r_direct), "id", "left_anti")
                if old_r is not None
                else None
            )
            r_targets = r_up if carry_r is None else r_up.unionByName(carry_r)
            r_targets = r_targets.join(
                bcast(r_deleted), "id", "left_anti"
            ).localCheckpoint(eager=True)

            # member pile lookups against the POST-merge node/way indexes
            mrefs = r_targets.select(F.explode("members").alias("mm")).select(
                F.col("mm.mtype").alias("mtype"), F.col("mm.ref").alias("ref")
            )
            np_idx = _pruned_index(
                tx,
                "idx_nodes",
                mrefs.filter(F.col("mtype") == "node").select(F.col("ref").alias("id")),
                "id",
                index_buckets,
            )
            node_piles_r = (
                np_idx.select(F.col("id").alias("ref"), "pile")
                if np_idx is not None
                else sp.createDataFrame([], "ref long, pile long")
            )
            wp_idx = _pruned_index(
                tx,
                "idx_ways",
                mrefs.filter(F.col("mtype") == "way").select(F.col("ref").alias("id")),
                "id",
                index_buckets,
            )
            way_piles_r = (
                wp_idx.groupBy("id").agg(F.min("pile").alias("pile")).select(
                    F.col("id").alias("ref"), "pile"
                )
                if wp_idx is not None
                else sp.createDataFrame([], "ref long, pile long")
            )
            # relation-type member lookups must not see children DELETED in
            # this batch: the relations store/index are read pre-merge, so
            # without the anti-join a deleted child would seed its STALE
            # pile/bbox into its dirty parents
            rel_refs = (
                mrefs.filter(F.col("mtype") == "relation")
                .select(F.col("ref").alias("id"))
                .join(bcast(r_deleted), "id", "left_anti")
            )
            rp_idx = _pruned_index(tx, "idx_rels", rel_refs, "id", index_buckets, bcast)
            seed = (
                rp_idx.select(F.col("id").alias("ref"), "pile")
                if rp_idx is not None
                else None
            )

            # member FOOTPRINTS for the bbox fixed point — same pruned-read
            # discipline: store reads scoped to the piles the (already
            # pruned) indexes report
            def _pruned_rows(store_key, idx, ids, cols):
                if idx is None:
                    return None
                piles = [r.pile for r in idx.select("pile").distinct().collect()]
                if not piles:
                    return None
                return (
                    tx.read_parts(store_key, "pile", sorted(piles))
                    .filter(F.col("pile").isin(piles))
                    .join(bcast(ids.distinct()), "id", "left_semi")
                    .select(*cols)
                )

            empty_xy = sp.createDataFrame([], "ref long, x long, y long")
            empty_bb = sp.createDataFrame(
                [], "ref long, minx long, miny long, maxx long, maxy long"
            )
            node_ids_m = mrefs.filter(F.col("mtype") == "node").select(
                F.col("ref").alias("id")
            )
            nxy = _pruned_rows("nodes", np_idx, node_ids_m, ["id", "x", "y"])
            node_xy_m = (
                nxy.select(F.col("id").alias("ref"), "x", "y")
                if nxy is not None
                else empty_xy
            )
            way_ids_m = mrefs.filter(F.col("mtype") == "way").select(
                F.col("ref").alias("id")
            )
            way_rows_m = _pruned_rows("ways", wp_idx, way_ids_m, ["id", "refs"])
            if way_rows_m is not None:
                way_rows_m = way_rows_m.dropDuplicates(["id"]).localCheckpoint(
                    eager=True
                )
                wref_ids = way_rows_m.select(F.explode("refs").alias("id")).distinct()
                wref_idx = _pruned_index(
                    tx, "idx_nodes", wref_ids, "id", index_buckets
                )
                wref_xy = _pruned_rows("nodes", wref_idx, wref_ids, ["id", "x", "y"])
                way_bb_m = (
                    way_rows_m.select("id", F.explode("refs").alias("nref"))
                    .join(
                        wref_xy.select(F.col("id").alias("nref"), "x", "y"), "nref"
                    )
                    .groupBy("id")
                    .agg(
                        F.min("x").alias("minx"), F.min("y").alias("miny"),
                        F.max("x").alias("maxx"), F.max("y").alias("maxy"),
                    )
                    .select(F.col("id").alias("ref"), *BBOX_COLS)
                    if wref_xy is not None
                    else empty_bb
                )
            else:
                way_bb_m = empty_bb
            seed_bb = None
            if have_rels and set(BBOX_COLS) <= set(tx.columns("relations")):
                seed_rows = _pruned_rows(
                    "relations", rp_idx, rel_refs, ["id", *BBOX_COLS]
                )
                if seed_rows is not None:
                    seed_bb = seed_rows.select(F.col("id").alias("ref"), *BBOX_COLS)
            bboxes_m = rel_bboxes(
                r_targets, node_xy_m, way_bb_m, seed_bb, max_rel_iters
            )
            new_r = _apply_placement(
                _with_rel_geometry(
                    rel_piles(r_targets, node_piles_r, way_piles_r, seed, max_rel_iters),
                    bboxes_m,
                ),
                placement,
                pile_zoom,
            ).localCheckpoint(eager=True)
            r_new_piles = {r.pile for r in new_r.select("pile").distinct().collect()}
            r_affected = sorted(r_old_piles | r_new_piles)
            if r_affected:
                tx.merge_part("relations", "pile", r_affected, dirty_r, "id", new_r)
            r_buckets = [
                r.ib
                for r in dirty_r.select(_bucket(F.col("id"), index_buckets).alias("ib"))
                .distinct()
                .collect()
            ]
            if r_buckets:
                tx.merge_part(
                    "idx_rels",
                    "ib",
                    r_buckets,
                    dirty_r,
                    "id",
                    new_r.select(
                        "id", "pile", _bucket(F.col("id"), index_buckets).alias("ib")
                    ),
                )
            # member_rels reverse index: buckets of old and new member refs
            mem_srcs = [r_targets.select(F.explode("members").alias("mm"))]
            if old_r is not None:
                mem_srcs.append(old_r.select(F.explode("members").alias("mm")))
            all_mem = mem_srcs[0]
            for s in mem_srcs[1:]:
                all_mem = all_mem.unionByName(s)
            mr_buckets = [
                r.ib
                for r in all_mem.select(
                    _bucket(F.col("mm.ref"), index_buckets).alias("ib")
                )
                .distinct()
                .collect()
            ]
            if mr_buckets:
                new_mem = (
                    r_targets.select(
                        F.col("id").alias("rel_id"), F.explode("members").alias("mm")
                    )
                    .select(
                        F.col("mm.mtype").alias("mtype"),
                        F.col("mm.ref").alias("ref"),
                        "rel_id",
                    )
                    .distinct()
                    .withColumn("ib", _bucket(F.col("ref"), index_buckets))
                )
                tx.merge_part(
                    "idx_member_rels",
                    "ib",
                    mr_buckets,
                    dirty_r.select(F.col("id").alias("rel_id")),
                    "rel_id",
                    new_mem,
                )

        # publish the whole batch as one snapshot (no-op on legacy stores)
        tx.commit()

    def merge(batch: DataFrame, batch_id: int) -> None:
        # optimistic-concurrency retry: a competing writer that commits
        # into this tx's read/write set invalidates the batch's plans;
        # the batch is deterministic given the delta, so recompute it
        # against the new snapshot and try again (Iceberg/Delta's retry
        # loop; replaces the reference's exclusive store lock)
        for attempt in range(MERGE_CONFLICT_RETRIES):
            try:
                return _merge_once(batch, batch_id)
            except txstore.CommitConflict as exc:
                _log.warning(
                    "merge batch %s: commit conflict (%s), retry %d/%d",
                    batch_id, exc, attempt + 1, MERGE_CONFLICT_RETRIES,
                )
        return _merge_once(batch, batch_id)  # final attempt propagates

    return merge


def apply_changes_full(
    spark: SparkSession,
    changes_path: str,
    store_path: str,
    checkpoint_path: str,
    zoom: int = 12,
    index_buckets: int = 16,
    max_rel_iters: int = 10,
):
    """One availableNow pass applying pending typed change files to the
    store.  See module docstring for the cascade; every read in the merge
    is partition-pruned by pile or index bucket, so a small delta costs
    I/O proportional to its dirty closure, never the store size."""
    merge = _make_merge(_paths(store_path), zoom, index_buckets, max_rel_iters)
    q = (
        read_full_change_stream(spark, changes_path)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    return q


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def apply_osc_changes(
    spark: SparkSession,
    osc_path: str,
    store_path: str,
    checkpoint_path: str,
    zoom: int = 12,
    index_buckets: int = 16,
    max_rel_iters: int = 10,
):
    """OsmChange files straight into the store — the reference's
    `gol update <gol> <file.osc>` as ONE stream: a binaryFile source over
    .osc/.osc.gz, per-file XML parse inside the micro-batch (distributed
    over files), then the same merge cascade as apply_changes_full.  No
    JSON staging step, no second scan; the streaming checkpoint tracks
    the .osc files themselves, so re-running after new diffs land applies
    only the new ones.

    Ordering: within a batch files are ranked by name (minutely diffs
    sort chronologically) and records keep their in-file position —
    seq = (batch_id+1)<<44 | rank<<32 | position.  rank has 12 bits, so
    the source is capped at maxFilesPerTrigger=4096 (a larger backlog
    simply splits into more availableNow micro-batches, applied in
    order).  seq is monotone WITHIN a batch and deterministic under
    checkpoint replay (batch content is replayed identically); across
    batches ordering comes from batches being applied sequentially —
    later batches physically overwrite — not from comparing seq values
    across batches."""
    merge = _make_merge(_paths(store_path), zoom, index_buckets, max_rel_iters)
    from .osc import parse_osc

    def osc_merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        paths = sorted(r.path for r in batch.select("path").distinct().collect())
        rank = {pth: i for i, pth in enumerate(paths)}
        base = (batch_id + 1) << 44

        def run(pdfs):
            import pandas as pd

            for pdf in pdfs:
                rows = []
                for pth, content in zip(pdf["path"], pdf["content"]):
                    rows.extend(
                        parse_osc(bytes(content), seq_base=base + (rank[pth] << 32))
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "op", "ftype", "id", "version", "x", "y",
                        "tags", "refs", "members", "seq",
                    ],
                )

        changes = batch.select("path", "content").mapInPandas(
            run, CHANGE_SCHEMA_FULL
        )
        merge(changes, batch_id)

    q = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        # rank is packed into 12 bits of seq — bound files/batch to match
        .option("maxFilesPerTrigger", 4096)
        .load(osc_path)
        .writeStream.foreachBatch(osc_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    return q


def _has_table(store_path: str, key: str) -> bool:
    if txstore.is_versioned(store_path):
        return key in txstore.load_manifest(store_path)["tables"]
    return os.path.exists(_paths(store_path)[key])


def _read_table(
    spark: SparkSession,
    store_path: str,
    key: str,
    parts: list | None = None,
    version: int | None = None,
) -> DataFrame:
    """Read one store table, resolving through the snapshot manifest on
    versioned stores (`parts` prunes the file list at planning time —
    the PartitionFilters analogue) and straight off the partition dirs on
    legacy ones (where Catalyst prunes from the isin filters callers
    apply).  `version` pins a retained snapshot (time travel); only the
    last two snapshots are guaranteed readable (commit-time GC keeps a
    one-snapshot grace period), so a pin behind that horizon fails FAST
    here with a clear error instead of mid-scan with PATH_NOT_FOUND
    once the scheduler hits a GC'd file."""
    p = _paths(store_path)
    if txstore.is_versioned(store_path):
        if version is not None:
            _check_horizon(store_path, version)
        entry = txstore.load_manifest(store_path, version)["tables"].get(key)
        if entry is None:
            raise FileNotFoundError(f"store table {key!r} not in manifest")
        return txstore.read_resolved(spark, p[key], entry, parts)
    if version is not None:
        raise ValueError("time-travel reads need a versioned store")
    return spark.read.parquet(p[key])


def _check_horizon(store_path: str, version: int) -> None:
    """Refuse a snapshot pin behind the GC horizon: commit-time GC frees
    files referenced only by snapshot V-2 when V commits, so any version
    older than current-1 may reference deleted files — Iceberg's expired
    snapshot.  Refusing predictably beats sometimes-works."""
    cur = txstore.current_version(store_path)
    if version < cur - 1:
        raise ValueError(
            f"snapshot v{version} is behind the GC horizon (current v{cur}; "
            f"retained: v{cur - 1}..v{cur}) — its files may have been "
            "garbage-collected at a later commit"
        )


def read_store(
    spark: SparkSession, store_path: str, kind: str, version: int | None = None
) -> DataFrame:
    """Read one typed sub-store (kind in nodes/ways/relations), optionally
    pinned to a retained snapshot version (Iceberg VERSION AS OF)."""
    return _read_table(spark, store_path, kind, version=version)


def store_history(store_path: str) -> list[dict]:
    """Snapshot log of a versioned store — the Iceberg `snapshots`
    metadata table / Delta DESCRIBE HISTORY analogue, built from the
    retained manifests and the per-partition {rows, bytes} metrics
    persisted at commit time (zero data scan, zero footer reads).  Each
    entry: {version, current, tables: {key: {parts, rows, bytes}}};
    rows/bytes are None for tables whose manifest predates persisted
    metrics.  Readability contract is list_versions'."""
    versions = txstore.list_versions(store_path)
    out = []
    for v in versions:
        man = txstore.load_manifest(store_path, v)
        tables = {}
        for k, t in man["tables"].items():
            m = t.get("metrics") or {}
            complete = set(m) >= set(t["parts"])
            tables[k] = {
                "parts": len(t["parts"]),
                "rows": sum(e["rows"] for e in m.values()) if complete else None,
                "bytes": sum(e["bytes"] for e in m.values()) if complete else None,
            }
        out.append(
            {
                "version": v,
                "current": v == versions[-1],
                # inside the GC horizon = pinned reads guaranteed to work
                "readable": v >= versions[-1] - 1,
                "tables": tables,
            }
        )
    return out


def store_snapshot_diff(
    spark: SparkSession,
    store_path: str,
    kind: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level CDC between two retained snapshots (Iceberg incremental
    scan / Delta Change Data Feed analogue; the reference's journaled
    store exposes no history at all): every row present in `to` but not
    `from` tagged op='added', the reverse op='removed' (an update = one
    removed + one added).  The partitions to compare come from the
    MANIFEST diff — file lists that are identical between the two
    snapshots are skipped before Spark ever plans a scan, so the diff
    reads O(changed partitions), never O(store), exactly the property
    that makes incremental downstream consumption viable at scale.
    Map-typed columns (tags) are canonicalized to sorted entry arrays
    for the set comparison (Spark set ops reject raw maps) and returned
    in that form.  Both endpoints must be inside the GC horizon (last
    two snapshots) — older pins fail fast like _read_table."""
    if to_version is None:
        to_version = txstore.current_version(store_path)
    _check_horizon(store_path, from_version)
    _check_horizon(store_path, to_version)
    man_from = txstore.load_manifest(store_path, from_version)
    man_to = txstore.load_manifest(store_path, to_version)
    e_from = man_from["tables"].get(kind)
    e_to = man_to["tables"].get(kind)
    changed = txstore.StoreTx._changed_parts(e_from, e_to)
    p = _paths(store_path)

    def _canon(entry: dict | None, parts: set[str]) -> DataFrame | None:
        if entry is None:
            return None
        df = txstore.read_resolved(
            spark, p[kind], entry, [v for v in parts if v in entry["parts"]]
        )
        for name, dtype in df.dtypes:
            if dtype.startswith("map<"):
                df = df.withColumn(name, F.array_sort(F.map_entries(name)))
        return df

    old = _canon(e_from, changed)
    new = _canon(e_to, changed)
    if old is None and new is None:
        raise FileNotFoundError(f"store table {kind!r} in neither snapshot")
    if old is None or new is None:
        base, op = (new, "added") if old is None else (old, "removed")
        return base.withColumn("op", F.lit(op))
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas differ for {kind!r}: {old.columns} vs {new.columns}"
        )
    new = new.select(*old.columns)
    return (
        new.exceptAll(old).withColumn("op", F.lit("added"))
        .unionByName(old.exceptAll(new).withColumn("op", F.lit("removed")))
    )


def query_store(
    spark: SparkSession,
    store_path: str,
    minx: int,
    miny: int,
    maxx: int,
    maxy: int,
    goql: str | None = None,
    kind: str = "nodes",
    version: int | None = None,
) -> DataFrame:
    """`gol query` against the typed store: the bbox resolves to its zoom-3
    pile cells, which Catalyst turns into PartitionFilters — only the pile
    directories the bbox touches are listed or read (the TileIndexWalker
    analogue on the store layout, QueryCommand.java:176-179).  Nodes get
    the exact coordinate filter + optional GOQL over the tags map; ways/
    relations return the pile-pruned candidate copies (their exact
    geometry lives through their nodes — join way_spread output onward).
    `version` pins a retained snapshot (time travel): data, meta
    (placement/pile_zoom/indexed_keys) and file list all resolve from
    that one manifest, so the query sees a CONSISTENT historical store."""
    from ..functions import spatial as S
    from ..functions.goql import compile_goql

    meta = _load_meta(store_path, version)
    pile_zoom = meta.get("pile_zoom", PILE_ZOOM)
    piles = [int(p) for p in S.tiles_covering_bbox(minx, miny, maxx, maxy, pile_zoom)]
    placement = meta.get("placement", "min")
    # manifest-level file pruning on versioned stores.  min-placement
    # relations scope by stored bbox, not pile (one copy at min-member
    # pile), so they read the full — small — table; quad-placement
    # relations have a copy in every overlapped pile and prune like ways.
    parts = (
        None
        if kind == "relations" and placement != "quad"
        else piles + [PURGATORY]
    )
    df = _read_table(spark, store_path, kind, parts=parts, version=version)
    goql_pred = (
        compile_goql(goql, ftype=F.lit(kind[0]), tags=F.col("tags")) if goql else None
    )
    pile_pred = F.col("pile").isin(piles)
    if kind != "nodes":
        if kind == "relations" and set(BBOX_COLS) <= set(df.columns):
            bbox_overlap = F.col("minx").isNull() | (
                (F.col("minx") <= maxx) & (F.col("maxx") >= minx)
                & (F.col("miny") <= maxy) & (F.col("maxy") >= miny)
            )
            if placement == "quad":
                # quad placement: a copy lives in every overlapped pile,
                # so the pile IN-list prunes like the reference's tile
                # walk; the stored-bbox test then exacts the coarser quad
                # cover (returns candidate copies, like ways)
                df = df.filter(
                    (pile_pred | (F.col("pile") == PURGATORY)) & bbox_overlap
                )
            else:
                # min placement: ONE copy at min-member pile — its
                # footprint can span piles the bbox doesn't cover, so a
                # pile prune would silently drop overlapping relations;
                # scope by the STORED bbox instead (exact overlap; NULL
                # bbox = purgatory, which scopes into every query — the
                # reference returns purgatory features for any query)
                df = df.filter(bbox_overlap)
        else:
            # ways spread one copy into EVERY touched pile, so the pile
            # IN-list is a correct (and partition-pruned) scope for them;
            # purgatory copies stay in scope
            df = df.filter(pile_pred | (F.col("pile") == PURGATORY))
        return df.filter(goql_pred) if goql_pred is not None else df
    df = df.filter(pile_pred).filter(
        (F.col("x") >= minx) & (F.col("x") <= maxx)
        & (F.col("y") >= miny) & (F.col("y") <= maxy)
    )
    if goql_pred is not None:
        indexed_keys = meta.get("indexed_keys")
        if indexed_keys and "keybits" in df.columns:
            # SIndexTree-style prefilter: keybits IN (covering masks) ANDs
            # in front of the tag predicate — the sorted-by-keybits layout
            # turns it into parquet row-group skips via min/max stats
            from ..functions import keybits as KB

            df = df.filter(
                KB.keybits_prefilter(goql, KB.parse_schema(indexed_keys))
            )
        df = df.filter(goql_pred)
    return df


def verify_full_store(spark: SparkSession, store_path: str) -> dict:
    """`gol check` for the typed store: every invariant the merge cascade
    maintains, checked store-wide.  Returns {ok, ...counts} — a standing
    violation means external tampering or a merge bug (a crash between the
    store and index writes self-heals on the next merge, like changes.py).

    Invariants: (1) node index == node store on (id, pile), no dup ids;
    (2) way index rows == way store spread rows exactly; (3) every way
    store copy's pile is justified by a node of that way in that pile, or
    is the PURGATORY copy of a way with zero resolvable nodes; (4)
    node_ways covers exactly the (ref, way) edges of the way store."""
    p = _paths(store_path)
    nodes = _read_table(spark, store_path, "nodes").select("id", "pile")
    nidx = _read_table(spark, store_path, "idx_nodes").select("id", "pile")
    node_dups = nodes.groupBy("id").count().filter(F.col("count") > 1).count()
    nidx_diff = (
        nodes.exceptAll(nidx).count() + nidx.exceptAll(nodes).count()
    )
    out = {"node_dups": node_dups, "node_idx_diff": nidx_diff}
    if _has_table(store_path, "ways"):
        ways = _read_table(spark, store_path, "ways").select("id", "refs", "pile")
        widx = _read_table(spark, store_path, "idx_ways").select("id", "pile")
        out["way_idx_diff"] = (
            ways.select("id", "pile").exceptAll(widx).count()
            + widx.exceptAll(ways.select("id", "pile")).count()
        )
        justified = (
            ways.select("id", "pile", F.explode("refs").alias("ref"))
            .join(nodes.select(F.col("id").alias("ref"), F.col("pile").alias("npile")), "ref")
            .filter(F.col("pile") == F.col("npile"))
            .select("id", "pile")
            .distinct()
        )
        resolvable = (
            ways.select("id", F.explode("refs").alias("ref"))
            .join(nodes.select(F.col("id").alias("ref")), "ref", "left_semi")
            .select("id")
            .distinct()
        )
        legit_purgatory = ways.filter(F.col("pile") == PURGATORY).join(
            resolvable, "id", "left_anti"
        )
        out["way_unjustified"] = (
            ways.select("id", "pile")
            .exceptAll(justified.unionByName(legit_purgatory.select("id", "pile")))
            .count()
        )
        nw = _read_table(spark, store_path, "idx_node_ways").select("node_id", "way_id")
        edges = (
            ways.select(F.col("id").alias("way_id"), F.explode("refs").alias("node_id"))
            .select("node_id", "way_id")
            .distinct()
        )
        out["node_ways_diff"] = (
            nw.exceptAll(edges).count() + edges.exceptAll(nw).count()
        )
    if _has_table(store_path, "relations"):
        rels = _read_table(spark, store_path, "relations").select("id", "members", "pile")
        ridx = _read_table(spark, store_path, "idx_rels").select("id", "pile")
        out["rel_idx_diff"] = (
            rels.select("id", "pile").exceptAll(ridx).count()
            + ridx.exceptAll(rels.select("id", "pile")).count()
        )
        mr = _read_table(spark, store_path, "idx_member_rels").select("mtype", "ref", "rel_id")
        medges = (
            rels.select(F.col("id").alias("rel_id"), F.explode("members").alias("mm"))
            .select(
                F.col("mm.mtype").alias("mtype"), F.col("mm.ref").alias("ref"), "rel_id"
            )
            .distinct()
        )
        out["member_rels_diff"] = (
            mr.exceptAll(medges).count() + medges.exceptAll(mr).count()
        )
        placement = _load_meta(store_path).get("placement", "min")
        if placement == "quad":
            # quad placement: the stored copies must be exactly the pile
            # expansion of the stored quad (NULL quad -> its single
            # purgatory/min copy) — the parity law of quad mode
            full = _read_table(spark, store_path, "relations").select(
                "id", "quad", "pile"
            )
            qp = _quad_piles_udf(_load_meta(store_path).get("pile_zoom", PILE_ZOOM))
            resolved = full.filter(F.col("quad").isNotNull())
            # NULL-quad relations get exactly ONE copy (their purgatory/
            # min pile).  Expect one row per id — derived as min(pile) so
            # duplicate or stray extra copies of an unresolvable relation
            # surface as a mismatch instead of being echoed back (the
            # invariant was vacuous for exactly these rows — ADVICE r4).
            want = resolved.select("id", "quad").distinct().select(
                "id", F.explode(qp(F.col("quad"))).alias("pile")
            ).unionByName(
                full.filter(F.col("quad").isNull())
                .groupBy("id")
                .agg(F.min("pile").alias("pile"))
            )
            out["rel_pile_mismatch"] = (
                full.select("id", "pile").exceptAll(want).count()
                + want.exceptAll(full.select("id", "pile")).count()
            )
        else:
            # min placement: re-run the min-member-pile fixed point from
            # the current stores and compare — a tampered pile (or a stale
            # index that let a relation skip re-piling) surfaces here
            node_piles = nodes.select(F.col("id").alias("ref"), "pile")
            way_piles = (
                _read_table(spark, store_path, "ways")
                .groupBy("id")
                .agg(F.min("pile").alias("pile"))
                .select(F.col("id").alias("ref"), "pile")
                if _has_table(store_path, "ways")
                else spark.createDataFrame([], "ref long, pile long")
            )
            want = rel_piles(
                rels.withColumn("tags", F.lit(None).cast("map<string,string>")),
                node_piles,
                way_piles,
            ).select("id", "pile")
            out["rel_pile_mismatch"] = (
                rels.select("id", "pile").exceptAll(want).count()
                + want.exceptAll(rels.select("id", "pile")).count()
            )
    out["ok"] = all(v == 0 for k, v in out.items() if k != "ok")
    return out
