"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "tiles+joined-rows/sec", "value": N, "unit": "rows/sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

The headline value is the BASELINE.json metric — (tile-assigned rows +
spatial-join output rows) per second over the tiling + spatial-join stages.
Per-query wall times are under "queries" (seconds).  Runs force full
computation via noop writes (no driver collect bottleneck) except queries
whose natural output is tiny (catalog, top-k), which collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from gol_tool_spark.functions import synth
from gol_tool_spark.operators import ann, dedup, multimodal, spatial_query, tiling
from gol_tool_spark.session import get_spark
from gol_tool_spark.sources import fixtures

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "10000"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("gol-tool-spark-bench")
    times: dict[str, float] = {}

    def timed(name, fn, repeats: int = 1):
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        times[name] = round(best, 3)

    # warm the JVM + parquet footers once
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    points = synth.points_df(spark, SF_DIR)
    n_points = points.count()
    pts_tiled = tiling.assign_points(points)

    # -- tiling stage (C1 + A4/D2-D4 + pile routing); the host is noisy, so
    # the headline stages take best-of-2 (driver runs bench once per round)
    timed("tile_assign", lambda: force(pts_tiled), repeats=2)
    # hex-index twin of the tile stage (north-star H3/S2 lane): pure-codegen
    # axial assignment + one map-combined density groupBy
    from gol_tool_spark.operators import hexgrid

    timed("hex_density", lambda: force(hexgrid.hex_density(points, res=8)))
    cat = tiling.catalog_topk(
        tiling.rollup(tiling.density(pts_tiled.select("x", "y"))),
        max_tiles=256, min_density=50,
    )
    timed("density_catalog", lambda: cat.collect(), repeats=2)
    timed("pile_assignment", lambda: force(tiling.pile_assignment(pts_tiled, cat)), repeats=2)

    # -- spatial-join stage (C2 way assembly — the big shuffle join)
    mem = synth.membership_df(spark, SF_DIR)
    ways = tiling.way_assembly(mem, pts_tiled)
    timed("way_assembly", lambda: force(ways), repeats=2)
    n_join_rows = mem.count()

    # -- query path
    timed("bbox_goql", lambda: spatial_query.bbox_query(
        pts_tiled, -(1 << 29), -(1 << 29), 1 << 29, 1 << 29,
        goql="n[returnflag=R][qty>30]").count(), repeats=2)
    timed("pip_diamond", lambda: spatial_query.points_in_polygon(
        pts_tiled, [(300000007, 0), (0, 300000007), (-300000007, 0), (0, -300000007)]).count(),
        repeats=2)
    timed("knn", lambda: spatial_query.knn_cell_ring(
        pts_tiled, [(1, 0, 0), (2, 5_000_000, -3_000_000), (3, -1_200_000_000, 900_000_000)],
        k=10, zoom=4).collect(), repeats=3)
    # relational batch kNN: 1000-query DataFrame side, no driver loops
    qdf = spark.range(1, 1001).select(
        F.col("id").alias("qid"),
        ((F.col("id") * 1597334677) % (1 << 32) - (1 << 31)).alias("qx"),
        ((F.col("id") * 3812015801 + 999331) % (1 << 32) - (1 << 31)).alias("qy"),
    )
    timed("knn_batch_1k", lambda: force(spatial_query.knn_join(pts_tiled, qdf, k=5, zoom=8)), repeats=2)

    # non-point geometry sink: assemble + distributed GeoJSON string build
    from gol_tool_spark.operators import measures
    from gol_tool_spark.sinks import writers

    timed("ways_geojson", lambda: force(
        writers.geojson_way_format(measures.assemble_coords(mem, pts_tiled), id_col="way_id")
    ))

    # -- r5 spatial-analytics lanes: grid-blocked DBSCAN over the hot-box
    # subsample (cell equi-join + CC rounds) and the vector->raster bridge
    # (one map-combined binning groupBy, then an O(tiles) Python stage)
    from gol_tool_spark.operators import geocluster

    timed("dbscan", lambda: geocluster.dbscan(
        points.filter(F.col("id") % 7 < 2).select("id", "x", "y"),
        eps=60000, min_pts=10).count())
    timed("density_raster", lambda: force(
        multimodal.density_raster(points, zoom=4, grid=16)), repeats=2)
    # 2-D range join: cell-blocked rectangle overlap with reference-point
    # dedup (no dropDuplicates shuffle on the pair set); the id%7 subsample
    # keeps the hot-cluster overlap density realistic without making the
    # in-cluster candidate count quadratic in sf
    boxes = points.filter(F.col("id") % 7 < 2).select(
        "id", F.col("x").alias("minx"), F.col("y").alias("miny"),
        (F.col("x") + 1 + (F.col("id") % 97) * 512).alias("maxx"),
        (F.col("y") + 1 + (F.col("id") % 89) * 512).alias("maxy"),
    )
    timed("box_overlap", lambda: spatial_query.box_overlap_join(boxes, zoom=13).count())

    # -- relational core
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc = F.round(F.col("l_discount") * 100).cast("bigint")
    timed("q1_pricing", lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.sum(cents * (100 - disc)), F.count(F.lit(1))).collect())

    # as-of temporal join on the event stream: one shuffle (union + window),
    # the same cost shape as an equi sort-merge join on (user_id)
    from gol_tool_spark.operators import temporal

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    timed("asof_join", lambda: force(temporal.asof_join(
        ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts"),
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("p_id"), "value"),
        on="ts", by=["user_id"], prefix="m_")), repeats=2)

    # trajectory lanes at fleet scale: 2M synthetic fixes / 1000 entities
    # (the events table is only 100k rows at sf0.1 — too small to expose
    # the window-shuffle cost these operators are built around)
    from gol_tool_spark.operators import trajectory

    fixes = spark.range(2_000_000).select(
        (F.col("id") % 1000).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") / 1000).cast("bigint") * 60 + F.col("id") % 7
        ).alias("ts"),
        ((F.col("id") * 2654435761) % (1 << 32) - (1 << 31)).alias("x"),
        ((F.col("id") * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)).alias("y"),
    )
    timed("track_speed_2m", lambda: force(trajectory.track_derivatives(fixes)), repeats=2)
    timed("grid_dwell_2m", lambda: force(
        trajectory.grid_dwell(fixes, cell_shift=24, min_dwell_s=600)))
    timed("od_matrix_2m", lambda: force(trajectory.od_matrix(fixes, cell_shift=24)))
    # contact join: 27-offset probe over 2M fixes (the blocking shuffle is
    # the cost; match volume is sparse on the uniform fixture)
    timed("colocation_2m", lambda: force(
        trajectory.colocation(fixes, max_dt_s=60, max_d=1 << 16)))
    # grid-time linear interpolation over the same 2M fixes
    timed("track_resample_2m", lambda: force(
        trajectory.resample_track(fixes, step_s=300)))
    # funnel chain + rolling median/MAD outliers over a typed 2M-event
    # variant of the same fleet (one entity exchange each)
    ev2m = fixes.withColumn(
        "event_type",
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("view"),
                    F.lit("purchase"), F.lit("click")),
            (F.col("event_id") % 5 + 1).cast("int"),
        ),
    ).withColumn("value", (F.col("event_id") % 997).cast("double"))
    timed("funnel_2m", lambda: force(temporal.funnel(ev2m)))
    timed("rolling_outliers_2m", lambda: force(temporal.rolling_outliers(ev2m)))
    # lag-1/2/3 autocorrelation components: one entity exchange, no joins
    timed("acf_2m", lambda: force(temporal.acf_stats(ev2m)))
    # exact OLS trend components: one entity exchange, no pair fan-out
    timed("ols_trend_2m", lambda: force(temporal.ols_trend(ev2m)))
    # gaps-and-islands monotone streaks: same single entity exchange
    timed("streaks_2m", lambda: force(temporal.streaks(ev2m)))
    # Mann-Kendall pair signs on the documented bounded-series shape:
    # every 16th event -> 125k rows / 1000 entities = 125-row series,
    # ~7.8M exact pair signs through one ReusedExchange self-join
    timed("mann_kendall_125k", lambda: force(
        temporal.mann_kendall(ev2m.filter(F.col("event_id") % 16 == 0))))
    # interval-union sweep: 2M overlapping spans, one entity exchange
    iv2m = ev2m.select(
        "user_id",
        (F.col("event_id") % 100000).alias("start_s"),
        (F.col("event_id") % 100000 + F.col("event_id") % 900 + 1).alias("end_s"),
    )
    timed("interval_coverage_2m", lambda: force(temporal.interval_coverage(iv2m, by=("user_id",))))

    # drop caches between sections: cached subplans (catalog, LSH sigs)
    # accumulate over the session and the GC pressure skews later entries
    spark.catalog.clearCache()

    # -- training-data ops (driver tables: capped at 5k docs even at sf0.1)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs, n=3, threshold=0.3).count(), repeats=2)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timed("ann_cosine", lambda: ann.cosine_topk(emb, [0, 1, 2, 3, 4], k=10).count())

    # -- training-data ops at sf-SCALED corpus size (50k docs at sf0.1):
    # the driver tables are overhead-dominated; these entries measure the
    # designs at a size where the plan shape is the cost (a *_500 twin of
    # each gives the 500 -> n_corpus scaling ratio in one bench file)
    n_corpus = synth.corpus_size(SF_DIR)
    docs_500 = synth.documents_synth(spark, 500)
    docs_syn = synth.documents_synth(spark, n_corpus)
    emb_syn = synth.embeddings_synth(spark, n_corpus, dim=64)
    timed("minhash_lsh_syn500", lambda: dedup.minhash_lsh_pairs(docs_500, n=3, threshold=0.3).count())
    timed("minhash_lsh_syn", lambda: dedup.minhash_lsh_pairs(docs_syn, n=3, threshold=0.3).count())
    timed("simhash_syn500", lambda: dedup.simhash_near_dups(docs_500, max_hamming=3, n=3).count())
    timed("simhash_syn", lambda: dedup.simhash_near_dups(docs_syn, max_hamming=3, n=3).count())
    timed("ann_lsh_syn", lambda: ann.ann_topk_lsh(emb_syn, [0, 1, 2, 3, 4], k=10, dim=64).count(),
        repeats=2)
    # PQ/ADC lane: codebooks train once (bounded driver sample, the real
    # index-build shape); the timed path is JVM encode + ADC shortlist +
    # exact rerank
    # exact frequent tokens via the two-pass MG sketch (zero key shuffle
    # on pass 1; the recount shuffles only candidate-filtered rows)
    from gol_tool_spark.operators import stats as stats_ops

    timed("heavy_hitters_syn", lambda: stats_ops.heavy_hitters(
        docs_syn.select(F.explode(F.split(F.col("text"), " ")).alias("tok")),
        "tok", frac=0.001).count())
    pq_books = ann.pq_train(emb_syn, m=8, dim=64, k=16, sample=1024)
    timed("pq_adc_syn", lambda: ann.pq_search(
        ann.pq_encode(emb_syn, pq_books), [0, 1, 2, 3, 4], pq_books,
        k=10, shortlist=200).count())
    # new r5 ops at corpus scale: CC clustering over the LSH pairs
    # (iterative star rounds + localCheckpoints), the Gopher repetition
    # scan (zero-shuffle word stats + bigram groupBys), and benchmark
    # decontamination (broadcast shingle semi-join)
    from gol_tool_spark.operators import text as text_ops

    timed("dup_clusters_syn", lambda: dedup.dup_clusters(
        dedup.minhash_lsh_pairs(docs_syn, n=3, threshold=0.3)).count())
    timed("repetition_syn", lambda: text_ops.repetition_stats(docs_syn).count())
    timed("contamination_syn", lambda: dedup.benchmark_contamination(
        docs_syn, docs_syn.filter(F.col("doc_id") % 37 == 0), n=3).count())
    # C4 line dedup (explode + min-struct groupBy + join back) and the PII
    # regex scrub (pure scan) — noop writes so no column prunes away
    timed("line_dedup_syn", lambda: force(
        text_ops.line_dedup(text_ops.block_lines(docs_syn))))
    timed("pii_scrub_syn", lambda: force(text_ops.scrub_pii(docs_syn)))
    # exact-substring dedup: windows ~= 1 row/token through one
    # map-combined hash groupBy + join back + per-doc island merge
    timed("span_dedup_syn", lambda: force(text_ops.ngram_span_dedup(docs_syn, n=8)))
    # sequence packing at corpus scale: the window plan vs the per-bucket
    # Arrow greedy pass (buckets = the parallelism unit)
    from gol_tool_spark.operators import packing

    timed("pack_chunks_syn", lambda: force(packing.pack_chunks(docs_syn, capacity=512, buckets=64)))
    timed("pack_greedy_syn", lambda: force(packing.pack_greedy(docs_syn, capacity=512, buckets=64)))
    # BM25 ranked retrieval: postings shuffle + broadcast query batch over
    # the synthetic corpus (the three-query batch from the gate entry)
    from gol_tool_spark.operators import retrieval

    bm25_q = spark.createDataFrame(
        [("q1", "spark table join"), ("q2", "fast scan filter window"),
         ("q3", "customer order merge stream")],
        "query_id string, qtext string")
    timed("bm25_topk_syn", lambda: force(retrieval.bm25_topk(docs_syn, bm25_q, k=10)))
    # per-doc top-5 keywords: postings + df join + WindowGroupLimit
    timed("distinctive_syn", lambda: force(retrieval.distinctive_terms(docs_syn, k=5)))
    # phrase mining: df-capped pair join + one pair groupBy, exact lift
    timed("collocations_syn", lambda: force(retrieval.collocations(
        docs_syn, max_df=n_corpus, min_pair=2)))
    # directed containment dedup: shared shingle join, both directions
    timed("containment_syn", lambda: force(dedup.containment_pairs(
        docs_syn, n=3, threshold=0.5, max_df=100000)))
    # bearing-sector cone: exact half-plane + disc tests, pure codegen
    timed("sector_query", lambda: force(spatial_query.sector_query(
        pts_tiled.select("id", "x", "y"), ox=-300_000_000, oy=200_000_000,
        ux=1, uy=0, vx=0, vy=1, radius=1_200_000_000)))
    # geodesic disc over the tiled points: range prefilter + haversine
    timed("radius_query", lambda: force(spatial_query.radius_query_m(
        pts_tiled.select("id", "x", "y"), -1500000000, -1500000000, 300000.0)),
        repeats=2)
    # lineitem-ring geometry lanes: exact-decimal centroids and the
    # Arrow-batched Douglas-Peucker pass over the same assembled ways
    from gol_tool_spark.operators import measures as _me

    _wb = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("way_id"),
        F.col("l_linenumber").cast("int").alias("seq"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("node_ref"))
    _wc = _wb.groupBy("way_id").agg(
        F.min("node_ref").alias("node_ref"), F.count(F.lit(1)).alias("cnt")).filter("cnt>=3")
    _mem = _wb.join(_wc.select("way_id"), "way_id").unionByName(
        _wc.select("way_id", F.lit(99).alias("seq"), "node_ref"))
    timed("way_centroid", lambda: force(_me.way_centroids(_mem, points.select("id", "x", "y"))))
    timed("way_simplify", lambda: force(
        _me.simplify_ways(_wb, points.select("id", "x", "y"), tolerance=2e8)
        .select("way_id", "n_in", "n_kept")))
    # modified-IDW surface over the full point set (cell join + folds)
    from gol_tool_spark.operators import interpolate as _ip

    timed("idw_grid", lambda: force(_ip.idw_grid(
        points.select("id", "x", "y", "qty"), value_col="qty", zoom=7)))
    # per-way convex hulls (Arrow-batched big-int chain, JVM slicing)
    timed("way_hull", lambda: force(measures.convex_hulls(mem, pts_tiled)))
    # exact proper-crossing join over the LCG segment set (grid-blocked,
    # DECIMAL(38,0) orientation predicate in codegen)
    from gol_tool_spark.operators import segments as _sg

    timed("seg_intersect", lambda: _sg.segment_intersections(
        _sg.synth_segments(points.select("id", "x", "y"))).count())
    # map matching: snap half the points to the other half's segments
    # (3x3 ring x <=2x2 cover candidate join, IEEE distance in codegen)
    _pxy = points.select("id", "x", "y")
    timed("snap_segments", lambda: _sg.snap_points(
        _pxy.filter(F.col("id") % 4 >= 2),
        _sg.synth_segments(_pxy.filter(F.col("id") % 4 < 2))).count())
    # base32 Morton cell-id rollup: pure-codegen encode + one groupBy
    from gol_tool_spark.operators import geocode as _gc

    timed("gridhash_rollup", lambda: force(_gc.gridhash_rollup(_pxy, prefix_len=4)))
    # global Moran's I: cell counts + 4-neighbor equi-join, exact decimals
    from gol_tool_spark.operators import geostats as _gs

    timed("morans_i", lambda: force(_gs.morans_i(_pxy, cell_shift=26)))
    # zonal stats: 512 synthetic convex zones, broadcast cover join +
    # forall half-plane test in codegen over the full point set
    from gol_tool_spark.operators.spatial_query import zonal_stats as _zs

    _zr = 1 << 22
    _zones = spark.range(512).select(
        F.col("id").alias("zone_id"),
        F.array(*[
            F.struct(
                (((F.col("id") * 2654435761) % (1 << 32) - (1 << 31)) + dx).alias("x"),
                (((F.col("id") * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)) + dy).alias("y"),
            )
            for dx, dy in ((_zr, 0), (0, _zr), (-_zr, 0), (0, -_zr))
        ]).alias("ring"),
    )
    timed("zonal_stats", lambda: force(_zs(points, _zones, value_col="qty")))
    # Gi* hotspots: 9-offset probe join + per-cell agg, exact decimals
    timed("getis_ord", lambda: force(_gs.getis_ord(_pxy, cell_shift=26)))
    # D8 flow directions: 8-offset explode + ONE left equi-join + argmin
    timed("flow_dir", lambda: force(_gs.flow_directions(_pxy, cell_shift=26)))
    # quadrat dispersion: one map-combined groupBy + 1-row agg, zero joins
    timed("quadrat", lambda: force(_gs.quadrat_counts(_pxy, cell_shift=28)))
    # bounded D8 catchment: 4 frontier rounds over the flow forest
    timed("flow_acc", lambda: force(_gs.flow_accumulation(
        _gs.flow_directions(_pxy, cell_shift=26), max_rounds=4)))
    # integer-kernel heatmap: two map-combined groupBys, 25-offset spread
    timed("kde_raster", lambda: force(_gs.kde_raster(_pxy, cell_shift=22, radius=2)))
    # Ripley pair-count curve: 2^15-blocked candidate join, one cond-sum pass
    timed("ripley_k", lambda: force(_gs.ripley_k(_pxy, [8192, 16384, 32768])))
    # hotspot centers: NMS (8-offset beat join) over the KDE surface
    timed("kde_peaks", lambda: force(_gs.local_maxima(
        _gs.kde_raster(_pxy, cell_shift=22, radius=2), min_weight=5)))
    # congestion-weighted cost distance: 4 frontier-relaxation rounds
    timed("cost_distance", lambda: force(_gs.cost_distance(
        _pxy, cell_shift=26, seed_min_count=20, max_rounds=4)))
    # per-entity mobility stats over the 2M-fix track set: map-combined
    # groupBys only, no joins
    timed("radius_gyration_2m", lambda: force(trajectory.radius_gyration(fixes)))
    timed("location_diversity_2m", lambda: force(
        trajectory.location_diversity(fixes, cell_shift=26)))
    # categorical ESDA + BFS distance transform over the same lattice
    timed("join_counts", lambda: force(_gs.join_counts(_pxy, cell_shift=26, min_count=12)))
    timed("grid_distance", lambda: force(_gs.grid_distance(
        _pxy, cell_shift=26, seed_min_count=20, max_hops=4)))
    # direction rose + signature-pair join over the 2M-fix track set:
    # the pair join (distinct + popularity cap + cell self-join) is the
    # cost center, sized by max_users_per_cell
    timed("heading_rose_2m", lambda: force(trajectory.heading_rose(fixes)))
    timed("traj_similarity_2m", lambda: force(trajectory.traj_similarity(
        fixes, cell_shift=22, max_users_per_cell=64, min_shared=2)))
    # directional variogram over the same lattice: one cells groupBy +
    # a 16-offset probe join
    timed("semivariogram", lambda: force(_gs.semivariogram(
        _pxy, cell_shift=26, max_lag=4)))
    # Knox space-time interaction at fleet scale: both marginals blocked
    # (eps cells / tau buckets); 500k fixes keeps the time-pair volume
    # in the millions, the realistic incident-analysis shape
    knox_ev = spark.range(500_000).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 2654435761) % (1 << 32) - (1 << 31)).alias("x"),
        ((F.col("id") * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)).alias("y"),
        (F.lit(1_700_000_000) + (F.col("id") / 1000).cast("bigint") * 60
         + F.col("id") % 7).alias("t"),
    )
    timed("knox_500k", lambda: force(_gs.knox_stat(knox_ev, eps=1 << 16, tau=1)))
    # exact per-way extent: ref-resolve shuffle + bounded per-way pairs
    timed("way_diameter", lambda: force(_me.way_diameter(mem, points)))
    # discrete Voronoi labels: pure-codegen argmin over 8 literal seeds
    _seeds = [(k, k * 700000000 - 1500000000,
               (k * 1111111111) % 3000000000 - 1500000000) for k in range(5)] \
        + [(5, 0, 0), (6, 1900000000, -1900000000), (7, -2000000000, 2000000000)]
    timed("nearest_seed", lambda: force(
        spatial_query.nearest_seed(points, _seeds)), repeats=2)
    # DDA line-of-sight: every 63rd point to its id%8 tower across the
    # shift-24 blocked lattice (broadcast LEFT join, bounded explode)
    timed("line_of_sight", lambda: force(_gs.line_of_sight(
        points.filter(F.col("id") % 63 == 0), points, _seeds,
        cell_shift=24, block_min_count=4)))
    # raster overview level: z4 density rasters -> z3 through the PNG codec
    timed("tile_pyramid", lambda: force(multimodal.pyramid_rollup(
        multimodal.density_raster(points, zoom=4, grid=16), zoom=4, grid=16)))
    # Horn gradients + two-epoch churn + marching-squares census: all
    # pinned-lattice shapes (one input pass each)
    timed("slope", lambda: force(_gs.slope_components(_pxy, cell_shift=26)))
    # second-derivative stencil: same probe-join shape as slope
    timed("curvature", lambda: force(_gs.curvature_components(_pxy, cell_shift=26)))
    # trig-free aspect octants: slope plan + one codegen CASE
    timed("aspect", lambda: force(_gs.aspect_octants(_pxy, cell_shift=26)))
    _moved = points.select(
        F.when(F.col("id") % 13 == 0, F.col("x") + (1 << 26))
        .otherwise(F.col("x")).alias("x"), "y")
    timed("cell_churn", lambda: force(_gs.cell_churn(_pxy, _moved, cell_shift=26)))
    timed("contour_cases", lambda: force(_gs.contour_cases(_pxy, threshold=12, cell_shift=26)))
    # Mann-Kendall drift over the 2M-fix fleet: 15 windows, codegen sign sum
    _mk_ev = fixes.select(
        "x", "y",
        F.expr("CAST((CAST(ts AS TIMESTAMP_NTZ) - TIMESTAMP_NTZ '1970-01-01 00:00:00') AS BIGINT)").alias("t"),
    )
    timed("emerging_hotspots_2m", lambda: force(_gs.emerging_hotspots(
        _mk_ev, t0=1_700_000_000, period_s=8000, n_periods=15, cell_shift=26)))
    # sticky-HMM matching over the hot-cluster fixes (bounded entity DP)
    _hot_ev = spark.range(20_000).select(
        (F.col("id") % 200).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.lit(1_700_000_000) + F.col("id")).alias("t"),
        ((F.col("id") % 5) * 700000000 - 1500000000
         + (F.col("id") * 2654435761) % (1 << 20)).alias("x"),
        (((F.col("id") % 5) * 1111111111) % 3000000000 - 1500000000
         + (F.col("id") * 2246822519 + 1013904223) % (1 << 20)).alias("y"),
    )
    _hot_segs = _sg.synth_segments(points.filter(F.col("id") % 10 < 2))
    from gol_tool_spark.operators import trajectory as _tj

    timed("hmm_match_20k", lambda: force(_tj.hmm_match(
        _hot_ev, _hot_segs, cell_shift=16, switch_cost=1.0e9)))
    # DDA line rasterization: explode bounded by each segment's own span
    timed("seg_raster", lambda: force(_sg.raster_cover(
        _sg.synth_segments(points), cell_shift=12)))
    # network connectivity: crossing pairs + large/small-star CC rounds
    timed("seg_components", lambda: force(_sg.crossing_components(
        _sg.synth_segments(points))))
    # triangle census: degree-ordered compact-forward over crossing pairs
    timed("triangles", lambda: force(_sg.crossing_triangles(
        _sg.synth_segments(points))))
    # basin labels: total step map + 4 pointer-doubling joins (16 steps)
    timed("watershed", lambda: force(_gs.watershed(
        _gs.flow_directions(_pxy, cell_shift=26), doubling_rounds=4)))
    # local Moran quadrants: pinned lattice + one probe join + LEFT back
    timed("lisa", lambda: force(_gs.local_morans(_pxy, cell_shift=26)))
    # Pareto staircase: bucket prune + per-x window over survivors
    from gol_tool_spark.operators import stats as _st

    timed("skyline", lambda: force(_st.skyline2d(_pxy)))
    # 3-core backbone: 4 peel rounds (degree groupBy + 2 semi-joins each)
    timed("kcore", lambda: force(_sg.crossing_kcore(
        _sg.synth_segments(points), k=3, max_rounds=4)))
    # BFS layers from every 63rd segment: 3 relax+min rounds
    timed("seg_hops", lambda: force(_sg.crossing_hops(
        _sg.synth_segments(points),
        points.filter(F.col("id") % 63 == 0).select(F.col("id").alias("seg")),
        max_rounds=3)))
    # weighted depot cost (L1 edge weights): same relax shape as seg_hops
    timed("seg_sssp", lambda: force(_sg.crossing_sssp(
        _sg.synth_segments(points),
        points.filter(F.col("id") % 63 == 0).select(F.col("id").alias("seg")),
        max_rounds=3)))
    # exact A^k walk centrality: 3 sparse matvec rounds (join + sum)
    timed("walk_counts", lambda: force(_sg.crossing_walk_counts(
        _sg.synth_segments(points), k=3)))
    # exact Gini components: one window shuffle + one agg
    _li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
    )
    timed("gini", lambda: force(_st.gini_concentration(_li, ["l_returnflag"], "pc")))
    # per-order rank correlation: bounded pair join (<= 7 lines/order)
    _lik = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    timed("kendall_tau", lambda: force(_st.kendall_tau(
        _lik, ["l_orderkey"], "l_quantity", "l_extendedprice", "l_linenumber")))
    # chi-square cell components: one fact groupBy + broadcast margins
    timed("contingency", lambda: force(_st.contingency_components(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
        "l_returnflag", "l_linestatus")))
    # Benford digit screen: one projection + one map-combined groupBy
    timed("benford", lambda: force(_st.digit_distribution(
        _li.select("l_returnflag", F.col("pc")), ["l_returnflag"], "pc")))
    # arc-length resampling: assemble shuffle + codegen array interpolation
    from gol_tool_spark.operators import measures as _ms2

    timed("way_resample", lambda: force(_ms2.way_resample(mem, points, n_samples=5)))
    # polygon-layer join: broadcast cover-cell layer + codegen ray cast
    import __spark_entry__ as _entry
    from pyspark.sql import Row as _Row

    _polys = spark.createDataFrame(
        [_Row(poly_id=pid, ring=[_Row(x=x, y=y) for x, y in ring])
         for pid, ring in _entry._POLY_LAYER],
        "poly_id long, ring array<struct<x: bigint, y: bigint>>",
    )
    timed("polygon_join", lambda: force(spatial_query.polygon_join(_pxy, _polys)))
    # ed<=1 vocabulary pairs: deletion-key join + levenshtein verify
    from gol_tool_spark.operators import text as _tx

    _vocab = (
        spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select(F.explode(F.split(F.lower("p_name"), " ")).alias("word"))
        .unionAll(spark.read.parquet(f"{SF_DIR}/customer.parquet")
                  .select(F.lower("c_name").alias("word")))
    )
    timed("fuzzy_vocab", lambda: force(_tx.fuzzy_pairs(_vocab)))
    # whole-raster blob labeling: positive-offset adjacency + star CC
    timed("cell_components", lambda: force(_gs.cell_components(_pxy, cell_shift=26)))
    # Strahler hierarchy: 4 bounded confluence rounds over the D8 forest
    timed("stream_order", lambda: force(_gs.stream_order(
        _gs.flow_directions(_pxy, cell_shift=26), max_rounds=4)))
    # transition-matrix square over the event OD flows
    from gol_tool_spark.operators import trajectory as _tj2

    timed("od_compose_2m", lambda: force(_tj2.od_compose(
        _tj2.od_matrix(fixes, cell_shift=24))))
    # exact LOCF integration over the 2M fleet
    timed("time_weighted_2m", lambda: force(temporal.time_weighted(
        ev2m.select("user_id", "ts", (F.col("event_id") % 997 - 400).alias("value")),
        by=("user_id",))))

    # -- image payload pipeline (generate -> place -> verify)
    spark.catalog.clearCache()
    imgs = fixtures.images(spark, N_IMAGES, partitions=64)
    timed("image_roundtrip", lambda: force(multimodal.verify_roundtrip(imgs)), repeats=2)
    # Sobel gradient stats: exact-int64 stacked convolution per shape group
    timed("image_gradient", lambda: force(multimodal.gradient_stats(imgs)))
    # variance-of-Laplacian blur metric (same stacked-int64 discipline)
    timed("image_blur", lambda: force(multimodal.blur_stats(imgs)))
    # GLCM texture components: one bincount per shape group
    timed("image_glcm", lambda: force(multimodal.glcm_stats(imgs)))
    # real ITU T.81 bitstream lane (pure-numpy Huffman codec — the interop
    # path, NOT the hot path): re-encode 2k fixtures as JFIF + verify
    from gol_tool_spark.kernels import image as img_kernel

    imgs_2k = fixtures.images(spark, min(N_IMAGES, 2000), partitions=64)

    def _jfif_verify():
        def reenc(batch_iter):
            for pdf in batch_iter:
                outs = []
                for b, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
                    px = img_kernel.decode(bytes(b), int(w), int(h), fmt)
                    outs.append(img_kernel.encode(px, "jpeg"))
                pdf = pdf.copy()
                pdf["bytes"] = outs
                pdf["fmt"] = "jpeg"
                yield pdf

        force(multimodal.verify_roundtrip(imgs_2k.mapInPandas(reenc, schema=imgs_2k.schema)))

    timed("image_jfif_2k", _jfif_verify)

    # -- typed-store incremental merge (gol update): bulk-load a store
    # subset, then apply a 1k-node delta — measures the partition-scoped
    # dirty-closure cascade (node moves re-spread parent ways), the cost
    # that stays O(delta) at 100 TB
    import shutil
    import tempfile

    from gol_tool_spark.streaming import changes_full as CF

    merge_dir = tempfile.mkdtemp(prefix="golmergebench_")
    try:
        # strides must be ODD: ids are orderkey*8+linenumber (linenumber
        # 1..7), so id % even == 0 matches NOTHING — the r2/r3 bench
        # unknowingly timed empty stores here
        sub = pts_tiled.filter(F.col("id") % 15 == 0)
        mem_sub = mem.filter(F.col("way_id") % 15 == 0)
        nodes_in = sub.select(
            "id", "x", "y", F.lit(None).cast("map<string,string>").alias("tags")
        )
        ways_in = (
            mem_sub.groupBy("way_id")
            .agg(F.array_sort(F.collect_list(F.struct("seq", "node_ref"))).alias("s"))
            .select(
                F.col("way_id").alias("id"),
                F.transform("s", lambda e: e["node_ref"]).alias("refs"),
                F.lit(None).cast("map<string,string>").alias("tags"),
            )
        )
        store = os.path.join(merge_dir, "store")  # default layout = versioned
        timed("store_bulk_load", lambda: CF.write_full_store(nodes_in, ways_in, None, store))
        delta = (
            nodes_in.filter(F.col("id") % 765 == 0)  # odd multiple of 15
            .select(
                F.lit("upsert").alias("op"), F.lit("n").alias("ftype"), "id",
                F.lit(2).alias("version"), (-F.col("x") - 1).alias("x"), "y",
                F.col("tags"), F.lit(None).cast("array<long>").alias("refs"),
                F.lit(None).cast(
                    "array<struct<mtype:string,ref:long,role:string>>"
                ).alias("members"),
                F.lit(1).alias("seq"),
            )
        )
        delta.coalesce(1).write.mode("overwrite").json(os.path.join(merge_dir, "delta"))

        # best-of-2 per lane (r4 VERDICT #3: the single driver sample of
        # the versioned lane contradicted five local samples — repeats put
        # the driver record on warmed code paths).  Each repeat uses a
        # fresh checkpoint dir so the SAME delta re-applies: an idempotent
        # upsert whose read-dirty-piles/anti-join/union/write work is
        # identical each time.
        ck_n = iter(range(100))

        def _merge_into(target, name):
            q = CF.apply_changes_full(
                spark, os.path.join(merge_dir, "delta"), target,
                os.path.join(merge_dir, f"ck{next(ck_n)}"),
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(f"{name} did not finish in 300s")

        # versioned = the default lane: merge into the store written above
        timed(
            "store_merge_delta_versioned",
            lambda: _merge_into(store, "store_merge_delta_versioned"),
            repeats=2,
        )

        # snapshot CDC read on the just-merged store: the diff's scan set
        # comes from the manifest diff, so this times O(changed piles) +
        # exceptAll — never a full-store scan.  Diff the last two
        # retained snapshots (the GC horizon): after the best-of-2 merge
        # that's re-apply vs re-apply (0 diff rows), but the SCAN work —
        # resolve both manifests, read every changed pile at both
        # versions, exceptAll — is identical to a live delta's.
        from gol_tool_spark.streaming import txstore as TX

        timed(
            "store_cdc_diff",
            lambda: CF.store_snapshot_diff(
                spark, store, "nodes", TX.current_version(store) - 1
            ).count(),
            repeats=2,
        )

        # legacy comparison lane: its own (untimed) legacy bulk load
        lstore = os.path.join(merge_dir, "lstore")
        CF.write_full_store(nodes_in, ways_in, None, lstore, layout="legacy")
        timed(
            "store_merge_delta",
            lambda: _merge_into(lstore, "store_merge_delta"),
            repeats=2,
        )
    finally:
        shutil.rmtree(merge_dir, ignore_errors=True)

    # -- full resumable build pipeline (analyze..compile) end to end
    # This lane swings 20-57 s on bit-identical code (end-of-session GC /
    # JIT state; a session-restart variant made it WORSE: cold-JIT first
    # build on a fresh JVM measured 82 s vs 24 s on the second).  Keep the
    # warm session and take best-of-2 like the headline stages.
    from gol_tool_spark.plans import build_pipeline as BP

    def _one_build():
        build_dir = tempfile.mkdtemp(prefix="golbench_")
        try:
            cfg = BP.BuildConfig(out_dir=build_dir, sf_dir=SF_DIR, max_tiles=256, min_density=50)
            BP.run_build(spark, cfg)
        finally:
            shutil.rmtree(build_dir, ignore_errors=True)

    timed("build_pipeline", _one_build, repeats=2)

    tiling_sec = times["tile_assign"] + times["pile_assignment"]
    join_sec = times["way_assembly"]
    value = round((2 * n_points + n_join_rows) / (tiling_sec + join_sec), 1)
    print(json.dumps({
        "metric": "tiles+joined-rows/sec",
        "value": value,
        "unit": "rows/sec",
        "queries": times,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_points": n_points,
        "n_join_rows": n_join_rows,
        "n_corpus": n_corpus,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }))


if __name__ == "__main__":
    main()
