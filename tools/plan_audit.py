"""Dump the physical plans of the engine's key operators into PLANS.md —
the `.explain("formatted")` audit trail: shows WholeStageCodegen spans,
PushedFilters/PartitionFilters on the store, broadcast vs shuffle joins,
and the shuffle-free bucketed C2.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from gol_tool_spark.functions import synth  # noqa: E402
from gol_tool_spark.operators import ann, dedup, hexgrid, spatial_query, text, tiling  # noqa: E402
from gol_tool_spark.plans import build_pipeline as BP  # noqa: E402
from gol_tool_spark.session import get_spark  # noqa: E402

KEEP = re.compile(
    r"WholeStageCodegen|Exchange|Join|HashAggregate|Scan|Filter|Project \[|"
    r"PushedFilters|PartitionFilters|Window|Sort |AdaptiveSparkPlan|ArrowEval|MapInPandas"
)


def condensed(df, mode="formatted", max_lines=40) -> str:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )
    lines = [l.rstrip() for l in plan.splitlines() if KEEP.search(l)]
    return "\n".join(lines[:max_lines])


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit", cpus=4, shuffle_partitions=8)
    pts = tiling.assign_points(synth.points_df(spark, sf))
    mem = synth.membership_df(spark, sf)
    sections = []

    def add(title, df, note="", mode="formatted"):
        sections.append(f"## {title}\n\n{note}\n```\n{condensed(df, mode)}\n```\n")

    add("C1 tile assignment (narrow, codegen)", pts,
        "Tile id is pure bit arithmetic inside WholeStageCodegen — a Project over "
        "the source, no Python. (The Exchange/Sort below belongs to the synthetic "
        "points table's GROUP BY dedup — the driver's lineitem has duplicate keys — "
        "not to tile assignment; on a materialized store C1 is shuffle-free, see "
        "the store-scan section.)")
    add("Hex cell index (H3-style, pure codegen)",
        hexgrid.hex_density(synth.points_df(spark, sf), res=8),
        "The axial transform + cube rounding is a Project inside "
        "WholeStageCodegen — no Python, no extra exchange beyond the one "
        "map-side-combined density groupBy (partial/final HashAggregate pair). "
        "(As in the C1 section, the LOWER Exchange/HashAggregate belongs to the "
        "synthetic points table's GROUP BY dedup, not to hex assignment — on a "
        "materialized table assignment itself is shuffle-free.)")
    add("C2 way assembly (shuffle join + partial agg)",
        tiling.way_assembly(mem, pts),
        "Join on node id; both aggregates show partial/final HashAggregate pairs "
        "(map-side combine). AQE re-plans broadcast vs shuffle by actual size.")
    cat = tiling.catalog_topk(tiling.rollup(tiling.density(pts.select("x", "y"))), 64, 20)
    add("C1b pile routing (broadcast pyramid)", tiling.pile_assignment(pts, cat),
        "Five LEFT broadcast hash joins, one per catalog zoom — the fact side never shuffles.",
        mode="simple")
    add("B2 bbox + GOQL query", spatial_query.bbox_query(
        pts, -(1 << 29), -(1 << 29), 1 << 29, 1 << 29, goql="n[returnflag=R]"),
        "Tile IN-list + range + GOQL compile to plain Filter conjuncts (pushdown-eligible).")
    add("ANN cosine top-k", ann.cosine_topk(
        spark.read.parquet(f"{sf}/embeddings.parquet"), [0, 1], k=5),
        "Broadcast the query vectors; quantized dot products are JVM higher-order "
        "aggregates; single window for ranking.", mode="simple")

    from gol_tool_spark.operators import geocluster, multimodal, temporal

    ev = spark.read.parquet(f"{sf}/events.parquet")
    add("As-of temporal join (tagged union + one running-last window)",
        temporal.asof_join(
            ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts"),
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", "ts", F.col("event_id").alias("p_id")),
            on="ts", by=["user_id"]),
        "ONE exchange on the by-keys feeding ONE Window whose running "
        "last(ignoreNulls) frame is streaming state — the same shuffle count "
        "as an equi sort-merge join on user_id; no range explode, no Python.",
        mode="simple")
    add("Interval (range) join — epoch-bucket blocking",
        temporal.interval_join(
            ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts"),
            ev.filter(F.col("event_type") == "error").select(
                "user_id", "ts", F.col("event_id").alias("err_id")),
            on="ts", by=["user_id"], lower_s=0, upper_s=86400),
        "Both sides bucket at the window width; the left explodes to its "
        "(at most 2) touched buckets, then ONE equi-join on (user_id, bucket) "
        "with the exact containment filter in codegen — no range explode "
        "proportional to the window, no crossJoin.", mode="simple")
    add("2-D box-overlap join (grid blocking + reference-point dedup)",
        spatial_query.box_overlap_join(
            synth.points_df(spark, sf).select(
                "id", F.col("x").alias("minx"), F.col("y").alias("miny"),
                (F.col("x") + 50000).alias("maxx"), (F.col("y") + 50000).alias("maxy")),
            zoom=11),
        "Each box explodes to its covered cells (sequence x sequence, pure "
        "JVM); ONE equi-join on the cell key; the reference-point conjunct "
        "(intersection min corner in THIS cell) makes each pair emerge "
        "exactly once with NO dropDuplicates shuffle on the pair set.",
        mode="simple")
    add("DBSCAN eps-pair generation (cell equi-join, never all-pairs)",
        geocluster.eps_pairs(
            synth.points_df(spark, sf).select("id", "x", "y"), eps=60000),
        "The 3x3 neighbor fan-out multiplies one side by 9 BEFORE a plain "
        "equi-join exchange on (cx, cy); the distance test is bigint codegen. "
        "Dense-cell skew is AQE skew-join territory, identical to the kNN "
        "cell-ring join.  (Core classification + the CC merge reuse the "
        "dup_clusters round audited above.)", mode="simple")
    add("Density raster (binning groupBy -> O(tiles) Python stage)",
        multimodal.density_raster(synth.points_df(spark, sf), zoom=4, grid=16),
        "The per-(tile,bx,by) binning is ONE map-side-combined HashAggregate "
        "pair over pure shift/mask codegen; only then does FlatMapGroupsInPandas "
        "run — its input is capped at grid^2 rows per tile, O(tiles) total, "
        "independent of input row count.", mode="simple")

    from gol_tool_spark.operators import measures

    _li = spark.read.parquet(f"{sf}/lineitem.parquet")
    _wb = _li.select(
        F.col("l_orderkey").alias("way_id"),
        F.col("l_linenumber").cast("int").alias("seq"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("node_ref"))
    _wc = _wb.groupBy("way_id").agg(
        F.min("node_ref").alias("node_ref"), F.count(F.lit(1)).alias("cnt")).filter("cnt>=3")
    _mem = _wb.join(_wc.select("way_id"), "way_id").unionByName(
        _wc.select("way_id", F.lit(99).alias("seq"), "node_ref"))
    add("Way centroids (exact DECIMAL(38,0) shoelace folds)",
        measures.way_centroids(_mem, synth.points_df(spark, sf).select("id", "x", "y")),
        "One shuffle (the coord-assembly groupBy); the shoelace centroid is "
        "a higher-order-function fold in EXACT decimal(38,0) integer "
        "arithmetic over each way's coord array — float rounding enters only "
        "at one final division, which is why the DuckDB HUGEINT twin "
        "hash-matches bit-for-bit.  No Python evaluation.", mode="simple")

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from gol_tool_spark.operators import retrieval

    add("BM25 ranked retrieval (postings shuffle + broadcast query batch)",
        retrieval.bm25_topk(
            docs,
            spark.createDataFrame([("q1", "spark table join")],
                                  "query_id string, qtext string"), k=10),
        "The corpus pays ONE map-combined explode->groupBy (postings); doc "
        "lengths and term df derive FROM the postings (no second corpus "
        "scan); the query terms BROADCAST into the postings so unmatched "
        "(stopword-heavy) rows never reach the score exchange; the final "
        "groupBy(query_id, doc_id) carries only matched rows and the top-k "
        "window partitions by query_id — bounded by the query batch, never "
        "the corpus.", mode="simple")
    add("Exact-substring span dedup (window hashes + island merge)",
        text.ngram_span_dedup(docs, n=8),
        "The Lee-et-al suffix-array dedup as a hash plan: one explode to "
        "~1 row/token, a map-combined groupBy(h) (hot boilerplate windows "
        "collapse pre-shuffle) with a ROW_NUMBER-free min-struct keeper, one "
        "join back on h, and a per-doc window ONLY over that doc's removal "
        "spans (gaps-and-islands) — never over the corpus.  Token excision "
        "is higher-order array functions; no Python evaluation anywhere.",
        mode="simple")
    add("Benchmark decontamination (broadcast shingle semi-join)",
        dedup.benchmark_contamination(docs, docs.filter(F.col("doc_id") % 37 == 0), n=3),
        "The held-out shingle set dedups and BROADCASTs into a LeftSemi join — "
        "the corpus side never shuffles for the overlap probe; totals/hits are "
        "partial/final HashAggregate pairs.", mode="simple")
    add("Repetition filters (zero-shuffle word stats + bigram aggs)",
        text.repetition_stats(docs),
        "Word stats are per-row JVM higher-order functions (no exchange on that "
        "branch); bigram stats are one explode feeding two map-side-combined "
        "groupBys keyed by doc_id.", mode="simple")
    add("C4 line dedup (map-combined min-struct winner + join back)",
        text.line_dedup(text.block_lines(docs)),
        "Global first-occurrence keep: the groupBy(line) min-struct aggregate is "
        "map-side combined (a partial SortAggregate below the exchange — struct min is sort-based) so hot boilerplate "
        "lines collapse pre-shuffle; the join back is a plain shuffled join AQE "
        "can skew-split; reassembly is one groupBy(doc_id).", mode="simple")
    _pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_df=100000)
    _edges = _pairs.select(F.least("doc_a", "doc_b").alias("a"),
                           F.greatest("doc_a", "doc_b").alias("b")).dropDuplicates(["a", "b"])
    _s = _edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        _edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    _m = _s.groupBy("u").agg(F.min("v").alias("mn")).select("u", F.least("mn", "u").alias("m"))
    add("Dup-cluster CC round (large-star unit, repeated O(log n) times)",
        _s.join(_m, "u").filter(F.col("v") > F.col("u"))
        .select(F.col("m").alias("a"), F.col("v").alias("b")).dropDuplicates(["a", "b"]),
        "One alternating-star round of dup_clusters: edge state only (2 ids/row), "
        "shuffled on node id, min computed via a map-combined aggregate; each "
        "round is localCheckpointed so plan depth stays O(1) per round.",
        mode="simple")

    # round-5 continuation wave
    from pyspark.sql import Row

    from gol_tool_spark.operators import geostats, measures, segments, stats

    _pxy = synth.points_df(spark, sf).select("id", "x", "y")
    add("Polygon-layer join (broadcast cover cells + codegen ray cast)",
        spatial_query.polygon_join(
            _pxy,
            spark.createDataFrame(
                [Row(poly_id=1, ring=[Row(x=300000000, y=0), Row(x=0, y=300000000),
                                      Row(x=-300000000, y=0), Row(x=0, y=-300000000)])],
                "poly_id long, ring array<struct<x: bigint, y: bigint>>")),
        "The layer explodes to its bbox cover cells and BROADCASTS; points "
        "compute one cell key — a single BroadcastHashJoin, then the exact "
        "DECIMAL even-odd crossing fold runs inside WholeStageCodegen (no "
        "Python, no float xcross).", mode="simple")
    add("2-D skyline (bucket prune -> pinned survivor staircase)",
        stats.skyline2d(_pxy.select("x", "y")),
        "The per-bucket prefix-min table is tiny and broadcast back; the only "
        "window over data rows runs on the PINNED survivor set (staircase "
        "band), never the raw input — the global-window trap avoided.",
        mode="simple")
    add("Triangle census (degree-ordered compact-forward)",
        segments.crossing_triangles(segments.synth_segments(_pxy)),
        "sym/deg/ed are localCheckpointed once (plan shows ExistingRDD scans, "
        "not re-executed crossing chains); the wedge join and the closing "
        "equi-join shuffle only (id, id, deg) triples.", mode="simple")
    add("Watershed pointer doubling (one round shown)",
        geostats.watershed(
            geostats.flow_directions(_pxy.select("x", "y"), cell_shift=26),
            doubling_rounds=1),
        "Each doubling round is ONE equi-join on the moving target key over "
        "checkpointed state — log2(depth) rounds total, the relations.py "
        "fixed-point discipline.", mode="simple")
    add("Weighted SSSP round (edge weights pre-joined)",
        segments.crossing_sssp(
            segments.synth_segments(_pxy),
            _pxy.filter(F.col("id") % 63 == 0).select(F.col("id").alias("seg")),
            max_rounds=1),
        "The L1 entry costs are joined onto the edge list ONCE before the "
        "rounds; each relax round is one equi-join + map-combined min "
        "groupBy over checkpointed state — byte-identical shuffle shape to "
        "crossing_hops, weights ride along.", mode="simple")
    add("Mann-Kendall pair signs (pinned rank table)",
        temporal.mann_kendall(ev),
        "The windowed rank table is localCheckpointed, so BOTH pair-join "
        "sides and the count lane read ExistingRDD scans — the window "
        "subtree executes once, not three times; pair signs fold in one "
        "map-combined groupBy.", mode="simple")
    add("OLS trend components (single entity exchange)",
        temporal.ols_trend(ev),
        "One exchange for the rank window; the DECIMAL cross-moments are "
        "five aggregates in ONE map-combined groupBy — no joins, no pair "
        "fan-out, safe for unbounded series.", mode="simple")
    add("Term collocations (df-capped pair join)",
        retrieval.collocations(docs, max_df=450, min_pair=2),
        "df filtering happens BEFORE pairing (hot terms never reach the "
        "pair join); the kept postings are pinned (ExistingRDD on both "
        "sides), df rides through the pair groupBy via MAX so there is no "
        "second term join; the 1-row doc total is broadcast.", mode="simple")
    add("Bearing-sector query (pure codegen, no shuffle)",
        spatial_query.sector_query(
            _pxy, ox=-300_000_000, oy=200_000_000,
            ux=1, uy=0, vx=0, vy=1, radius=1_200_000_000),
        "The x/y range prefilter is plain column compares (pushable on a "
        "stored scan, the bbox_query path); the exact half-plane and "
        "squared-distance tests are DECIMAL column math inside one "
        "WholeStageCodegen span — no join, no exchange.", mode="simple")
    add("Kendall tau pair signs (pinned projection, bounded groups)",
        __import__("gol_tool_spark.operators.stats", fromlist=["x"]).kendall_tau(
            spark.read.parquet(f"{sf}/lineitem.parquet").select(
                "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
            ["l_orderkey"], "l_quantity", "l_extendedprice", "l_linenumber"),
        "The quantized projection is localCheckpointed (ExistingRDD on both "
        "pair-join sides); signs fold in one map-combined groupBy; the LEFT "
        "join back onto counts shares the group-key partitioning.",
        mode="simple")
    add("Contingency grid (broadcast margin cross product)",
        __import__("gol_tool_spark.operators.stats", fromlist=["x"]).contingency_components(
            spark.read.parquet(f"{sf}/lineitem.parquet"), "l_returnflag", "l_linestatus"),
        "ONE fact groupBy; the full r x c grid (incl. empty cells) comes "
        "from crossJoins of BROADCAST margin tables — the fact table is "
        "never re-read.", mode="simple")
    add("Monotone streaks (gaps-and-islands, one exchange)",
        temporal.streaks(ev),
        "The ordering window, the lag-compare break flags and the running "
        "break-count run ids all share ONE entity exchange; the run-extent "
        "and entity rollup groupBys are map-combined.", mode="simple")
    add("Terrain curvature stencil (pinned probe join)",
        geostats.curvature_components(_pxy.select("x", "y"), cell_shift=26),
        "slope_components' shape with three weight slots: pinned cells, one "
        "8-offset probe explode, one equi-join, one map-combined groupBy, "
        "LEFT back for isolated cells.", mode="simple")
    add("Walk-count round (sparse matvec as a join)",
        segments.crossing_walk_counts(segments.synth_segments(_pxy), k=1),
        "Each A^k round is one equi-join on the checkpointed edge list + a "
        "map-combined sum — the flow_acc round discipline; the final LEFT "
        "join restores isolated segments as zeros.", mode="simple")
    add("Arc-length way resampling (codegen array interpolation)",
        measures.way_resample(mem, synth.points_df(spark, sf).select("id", "x", "y"),
                              n_samples=5),
        "The assemble groupBy is the only exchange; prefix sums, segment "
        "search and the exact pmod floor-division interpolation are array "
        "expressions inside WholeStageCodegen — no Python anywhere.",
        mode="simple")

    # store-scan pushdown proof
    with tempfile.TemporaryDirectory(prefix="plan_audit_") as td:
        cfg = BP.BuildConfig(out_dir=os.path.join(td, "g"), sf_dir=sf, max_tiles=30, min_density=20)
        BP.run_build(spark, cfg)
        store = spark.read.parquet(os.path.join(cfg.out_dir, "compile"))
        q = store.filter((F.col("x") >= -1000000) & (F.col("x") <= 1000000) & (F.col("pile") == 2))
        add("Store scan (pushdown + partition pruning)", q,
            "Against the compiled store, range predicates reach the parquet scan "
            "(PushedFilters) and the pile predicate prunes partitions (PartitionFilters); "
            "Z-order layout keeps row-group min/max stats tight.")
        add("Geodesic radius query on the store (pushdown prefilter + haversine residual)",
            spatial_query.radius_query_m(
                store.select("id", "x", "y"), -1500000000, -1500000000, 300000.0),
            "The conservative Mercator box (cos(lat_far) meridian correction, "
            "driver-side floats) is plain column compares — they reach the "
            "parquet scan as PushedFilters, exactly the bbox_query path; the "
            "exact great-circle distance is whole-stage-codegen trig on the "
            "survivors.  No shuffle at all: a scan-shaped predicate at any "
            "scale.")
        kq = BP.query_store(spark, os.path.join(cfg.out_dir, "compile"),
                            "n[highway]", cfg.indexed_keys)
        add("Keybits index (GOQL tag query -> bucket pruning)", kq,
            "The keybits IN-list prefilter (KeyIndexSchema/SIndexTree analogue) "
            "lands in PartitionFilters: key-index buckets whose category bits "
            "don't cover the query's required bits are pruned at planning time.")

        # typed-store query path (gol query against the changes_full store)
        from gol_tool_spark.streaming import changes_full as CF

        tstore = os.path.join(td, "typed")
        nodes_in = pts.limit(5000).select(
            "id", "x", "y", F.lit(None).cast("map<string,string>").alias("tags")
        )
        CF.write_full_store(nodes_in, None, None, tstore)  # versioned default
        tq = CF.query_store(spark, tstore, -(1 << 29), -(1 << 29), 1 << 29, 1 << 29)
        n_read = len({f.rsplit("/", 2)[1] for f in tq.inputFiles()})
        from gol_tool_spark.streaming import txstore as TX

        n_all = len(TX.load_manifest(tstore)["tables"]["nodes"]["parts"])
        add("Typed store bbox query (versioned: manifest file-list pruning)", tq,
            "query_store resolves the bbox to its zoom-3 pile cells and, on the "
            "DEFAULT versioned layout, prunes the FILE LIST at manifest "
            "resolution — before Catalyst ever plans (the Iceberg model), so "
            "no PartitionFilters entry appears: the scan simply never sees the "
            f"other piles.  Evidence this run: {n_read} of {n_all} pile "
            "partitions planned.")

        # snapshot CDC diff: partitions come from the MANIFEST diff
        import json as _json

        ch_dir = os.path.join(td, "ch")
        os.makedirs(ch_dir)
        with open(os.path.join(ch_dir, "c.json"), "w") as fh2:
            fh2.write(_json.dumps({
                "op": "upsert", "ftype": "n", "id": 1, "version": 2,
                "x": 123, "y": 456, "tags": None, "seq": 0,
            }) + "\n")
        mq = CF.apply_changes_full(spark, ch_dir, tstore, os.path.join(td, "ck"))
        assert mq.awaitTermination(180)
        dq = CF.store_snapshot_diff(spark, tstore, "nodes", 1, 2)
        d_read = len({f.rsplit("/", 2)[1] for f in dq.inputFiles()})
        add("Snapshot CDC diff (manifest-diff partition pruning)", dq,
            "store_snapshot_diff compares two retained snapshots; the "
            "partitions to scan come from diffing the two MANIFESTS, so "
            "piles whose file lists are identical are skipped before Spark "
            f"plans anything.  Evidence this run: {d_read} of {n_all} pile "
            "partitions planned across BOTH snapshot reads for a "
            "single-node change.")

        lstore = os.path.join(td, "typed_legacy")
        CF.write_full_store(nodes_in, None, None, lstore, layout="legacy")
        lq = CF.query_store(spark, lstore, -(1 << 29), -(1 << 29), 1 << 29, 1 << 29)
        add("Typed store bbox query (legacy: PartitionFilters pruning)", lq,
            "On legacy directory-partitioned stores the same pile IN-list "
            "shows up as PartitionFilters on the nodes sub-store scan — only "
            "the touched pile directories are listed/read, the "
            "TileIndexWalker analogue on the update-path store layout.")

    header = (
        "# PLANS — physical-plan audit of the key operators\n\n"
        "Generated by `python tools/plan_audit.py` (condensed: only plan lines "
        "showing codegen spans, exchanges, joins, aggregates, scans, filters).\n"
    )
    with open("PLANS.md", "w") as fh:
        fh.write(header + "\n" + "\n".join(sections))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
