"""Extra benchmarks for optimization work (guide §1.4): per-lane noop-sink
timing + .explain("formatted") capture, WITHOUT touching the frozen bench.py.

Usage:
  python bench_extra.py <lane> [<lane> ...] [--explain plans/r06/<lane>_before.txt]
  python bench_extra.py --list

Each lane mirrors the corresponding bench.py construction exactly (same
inputs, same operator calls) so numbers are comparable; the sink is noop.
Repeats: best-of-N (default 2) per lane, printed as JSON.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = [a for a in sys.argv[1:]]
    explain_dir = None
    if "--explain-dir" in args:
        i = args.index("--explain-dir")
        explain_dir = args[i + 1]
        del args[i:i + 2]
    repeats = 2
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]

    spark = get_spark("gol-tool-spark-bench-extra")
    sc = spark.sparkContext

    points = synth.points_df(spark, SF_DIR)
    pts_tiled = tiling.assign_points(points)
    _pxy = points.select("id", "x", "y")

    from gol_tool_spark.operators import geocluster, geostats as _gs, segments as _sg
    from gol_tool_spark.operators import temporal, trajectory
    from gol_tool_spark.operators import measures as _me
    from gol_tool_spark.operators import text as text_ops

    fixes = spark.range(2_000_000).select(
        (F.col("id") % 1000).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") / 1000).cast("bigint") * 60 + F.col("id") % 7
        ).alias("ts"),
        ((F.col("id") * 2654435761) % (1 << 32) - (1 << 31)).alias("x"),
        ((F.col("id") * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)).alias("y"),
    )
    ev2m = fixes.withColumn(
        "event_type",
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("view"),
                    F.lit("purchase"), F.lit("click")),
            (F.col("event_id") % 5 + 1).cast("int"),
        ),
    ).withColumn("value", (F.col("event_id") % 997).cast("double"))

    n_corpus = synth.corpus_size(SF_DIR)

    def docs_syn():
        return synth.documents_synth(spark, n_corpus)

    mem = synth.membership_df(spark, SF_DIR)

    _wb = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("way_id"),
        F.col("l_linenumber").cast("int").alias("seq"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("node_ref"))

    LANES = {
        # crossing-graph family
        "seg_intersect": lambda: _sg.segment_intersections(
            _sg.synth_segments(points.select("id", "x", "y"))).count(),
        "seg_raster": lambda: force(_sg.raster_cover(
            _sg.synth_segments(points), cell_shift=12)),
        "seg_components": lambda: force(_sg.crossing_components(
            _sg.synth_segments(points))),
        "triangles": lambda: force(_sg.crossing_triangles(
            _sg.synth_segments(points))),
        "kcore": lambda: force(_sg.crossing_kcore(
            _sg.synth_segments(points), k=3, max_rounds=4)),
        "seg_hops": lambda: force(_sg.crossing_hops(
            _sg.synth_segments(points),
            points.filter(F.col("id") % 63 == 0).select(F.col("id").alias("seg")),
            max_rounds=3)),
        "seg_sssp": lambda: force(_sg.crossing_sssp(
            _sg.synth_segments(points),
            points.filter(F.col("id") % 63 == 0).select(F.col("id").alias("seg")),
            max_rounds=3)),
        "walk_counts": lambda: force(_sg.crossing_walk_counts(
            _sg.synth_segments(points), k=3)),
        "snap_segments": lambda: _sg.snap_points(
            _pxy.filter(F.col("id") % 4 >= 2),
            _sg.synth_segments(_pxy.filter(F.col("id") % 4 < 2))).count(),
        # clustering / trajectory
        "dbscan": lambda: geocluster.dbscan(
            points.filter(F.col("id") % 7 < 2).select("id", "x", "y"),
            eps=60000, min_pts=10).count(),
        "colocation_2m": lambda: force(
            trajectory.colocation(fixes, max_dt_s=60, max_d=1 << 16)),
        "track_resample_2m": lambda: force(
            trajectory.resample_track(fixes, step_s=300)),
        "traj_similarity_2m": lambda: force(trajectory.traj_similarity(
            fixes, cell_shift=22, max_users_per_cell=64, min_shared=2)),
        "hmm_match_20k": lambda: _hmm(),
        # text / dedup
        "simhash_syn": lambda: dedup.simhash_near_dups(
            docs_syn(), max_hamming=3, n=3).count(),
        "minhash_lsh_syn": lambda: dedup.minhash_lsh_pairs(
            docs_syn(), n=3, threshold=0.3).count(),
        "containment_syn": lambda: force(dedup.containment_pairs(
            docs_syn(), n=3, threshold=0.5, max_df=100000)),
        "dup_clusters_syn": lambda: dedup.dup_clusters(
            dedup.minhash_lsh_pairs(docs_syn(), n=3, threshold=0.3)).count(),
        "collocations_syn": lambda: _colloc(),
        "pq_adc_syn": lambda: _pq(),
        "heavy_hitters_syn": lambda: _hh(),
        "fuzzy_vocab": lambda: _fuzzy(),
        # geometry / raster
        "way_simplify": lambda: force(
            _me.simplify_ways(_wb, points.select("id", "x", "y"), tolerance=2e8)
            .select("way_id", "n_in", "n_kept")),
        "kde_peaks": lambda: force(_gs.local_maxima(
            _gs.kde_raster(_pxy, cell_shift=22, radius=2), min_weight=5)),
        "kde_raster": lambda: force(_gs.kde_raster(_pxy, cell_shift=22, radius=2)),
        "box_overlap": lambda: _box_overlap(),
        "idw_grid": lambda: _idw(),
        "ways_geojson": lambda: _geojson(),
        "way_centroid": lambda: _way_centroid(),
        "knn": lambda: spatial_query.knn_cell_ring(
            pts_tiled, [(1, 0, 0), (2, 5_000_000, -3_000_000), (3, -1_200_000_000, 900_000_000)],
            k=10, zoom=4).collect(),
        "ripley_k": lambda: force(_gs.ripley_k(_pxy, [8192, 16384, 32768])),
        "grid_dwell_2m": lambda: force(
            trajectory.grid_dwell(fixes, cell_shift=24, min_dwell_s=600)),
        "od_matrix_2m": lambda: force(trajectory.od_matrix(fixes, cell_shift=24)),
        "hex_density": lambda: _hex(),
        "tile_assign": lambda: force(pts_tiled),
        "way_assembly": lambda: force(tiling.way_assembly(mem, pts_tiled)),
        "cell_components": lambda: force(_gs.cell_components(_pxy, cell_shift=26)),
    }

    def _hmm():
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
        force(trajectory.hmm_match(_hot_ev, _hot_segs, cell_shift=16, switch_cost=1.0e9))

    def _colloc():
        from gol_tool_spark.operators import retrieval
        force(retrieval.collocations(docs_syn(), max_df=n_corpus, min_pair=2))

    def _pq():
        emb_syn = synth.embeddings_synth(spark, n_corpus, dim=64)
        pq_books = ann.pq_train(emb_syn, m=8, dim=64, k=16, sample=1024)
        ann.pq_search(ann.pq_encode(emb_syn, pq_books), [0, 1, 2, 3, 4], pq_books,
                      k=10, shortlist=200).count()

    def _hh():
        from gol_tool_spark.operators import stats as stats_ops
        stats_ops.heavy_hitters(
            docs_syn().select(F.explode(F.split(F.col("text"), " ")).alias("tok")),
            "tok", frac=0.001).count()

    def _fuzzy():
        from gol_tool_spark.operators import text as _tx
        _vocab = (
            spark.read.parquet(f"{SF_DIR}/part.parquet")
            .select(F.explode(F.split(F.lower("p_name"), " ")).alias("word"))
            .unionAll(spark.read.parquet(f"{SF_DIR}/customer.parquet")
                      .select(F.lower("c_name").alias("word")))
        )
        force(_tx.fuzzy_pairs(_vocab))

    def _box_overlap():
        boxes = points.filter(F.col("id") % 7 < 2).select(
            "id", F.col("x").alias("minx"), F.col("y").alias("miny"),
            (F.col("x") + 1 + (F.col("id") % 97) * 512).alias("maxx"),
            (F.col("y") + 1 + (F.col("id") % 89) * 512).alias("maxy"),
        )
        spatial_query.box_overlap_join(boxes, zoom=13).count()

    def _idw():
        from gol_tool_spark.operators import interpolate as _ip
        force(_ip.idw_grid(points.select("id", "x", "y", "qty"), value_col="qty", zoom=7))

    def _geojson():
        from gol_tool_spark.operators import measures
        from gol_tool_spark.sinks import writers
        force(writers.geojson_way_format(
            measures.assemble_coords(mem, pts_tiled), id_col="way_id"))

    def _way_centroid():
        _wc = _wb.groupBy("way_id").agg(
            F.min("node_ref").alias("node_ref"), F.count(F.lit(1)).alias("cnt")).filter("cnt>=3")
        _mem2 = _wb.join(_wc.select("way_id"), "way_id").unionByName(
            _wc.select("way_id", F.lit(99).alias("seq"), "node_ref"))
        force(_me.way_centroids(_mem2, points.select("id", "x", "y")))

    def _hex():
        from gol_tool_spark.operators import hexgrid
        force(hexgrid.hex_density(points, res=8))

    # plan-capture targets: DataFrame factories (no execution) for explain
    knox_ev = spark.range(500_000).select(
        F.col("id").alias("event_id"),
        ((F.col("id") * 2654435761) % (1 << 32) - (1 << 31)).alias("x"),
        ((F.col("id") * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)).alias("y"),
        (F.lit(1_700_000_000) + (F.col("id") / 1000).cast("bigint") * 60
         + F.col("id") % 7).alias("t"),
    )
    PLANS = {
        "seg_intersect": lambda: _sg.segment_intersections(
            _sg.synth_segments(points.select("id", "x", "y"))),
        "snap_segments": lambda: _sg.snap_points(
            _pxy.filter(F.col("id") % 4 >= 2),
            _sg.synth_segments(_pxy.filter(F.col("id") % 4 < 2))),
        "colocation_2m": lambda: trajectory.colocation(fixes, max_dt_s=60, max_d=1 << 16),
        "track_resample_2m": lambda: trajectory.resample_track(fixes, step_s=300),
        "simhash_syn": lambda: dedup.simhash_near_dups(docs_syn(), max_hamming=3, n=3),
        "way_simplify": lambda: _me.simplify_ways(
            _wb, points.select("id", "x", "y"), tolerance=2e8)
            .select("way_id", "n_in", "n_kept"),
        "kde_peaks": lambda: _gs.local_maxima(
            _gs.kde_raster(_pxy, cell_shift=22, radius=2), min_weight=5),
        "ripley_k": lambda: _gs.ripley_k(_pxy, [8192, 16384, 32768]),
        "knox_500k": lambda: _gs.knox_stat(knox_ev, eps=1 << 16, tau=1),
        "dbscan": lambda: geocluster.dbscan(
            points.filter(F.col("id") % 7 < 2).select("id", "x", "y"),
            eps=60000, min_pts=10),
        "traj_similarity_2m": lambda: trajectory.traj_similarity(
            fixes, cell_shift=22, max_users_per_cell=64, min_shared=2),
        "fuzzy_vocab": lambda: _fuzzy_df(),
        "seg_components": lambda: _sg.crossing_components(
            _sg.synth_segments(points)),
    }

    def _fuzzy_df():
        from gol_tool_spark.operators import text as _tx
        _vocab = (
            spark.read.parquet(f"{SF_DIR}/part.parquet")
            .select(F.explode(F.split(F.lower("p_name"), " ")).alias("word"))
            .unionAll(spark.read.parquet(f"{SF_DIR}/customer.parquet")
                      .select(F.lower("c_name").alias("word")))
        )
        return _tx.fuzzy_pairs(_vocab)

    def _pq_df():
        emb_syn = synth.embeddings_synth(spark, n_corpus, dim=64)
        pq_books = ann.pq_train(emb_syn, m=8, dim=64, k=16, sample=1024)
        return ann.pq_search(ann.pq_encode(emb_syn, pq_books), [0, 1, 2, 3, 4],
                             pq_books, k=10, shortlist=200)

    PLANS.update({
        "minhash_lsh_syn": lambda: dedup.minhash_lsh_pairs(docs_syn(), n=3, threshold=0.3),
        "containment_syn": lambda: dedup.containment_pairs(
            docs_syn(), n=3, threshold=0.5, max_df=100000),
        "kde_raster": lambda: _gs.kde_raster(_pxy, cell_shift=22, radius=2),
        "seg_raster": lambda: _sg.raster_cover(_sg.synth_segments(points), cell_shift=12),
        "pq_adc_syn": _pq_df,
        "box_overlap": lambda: spatial_query.box_overlap_join(
            points.filter(F.col("id") % 7 < 2).select(
                "id", F.col("x").alias("minx"), F.col("y").alias("miny"),
                (F.col("x") + 1 + (F.col("id") % 97) * 512).alias("maxx"),
                (F.col("y") + 1 + (F.col("id") % 89) * 512).alias("maxy")), zoom=13),
        "cell_components": lambda: _gs.cell_components(_pxy, cell_shift=26),
        "heavy_hitters_syn": lambda: stats_lane_df(),
    })

    def stats_lane_df():
        from gol_tool_spark.operators import stats as stats_ops
        return stats_ops.heavy_hitters(
            docs_syn().select(F.explode(F.split(F.col("text"), " ")).alias("tok")),
            "tok", frac=0.001)

    if "--list" in args:
        print(" ".join(sorted(LANES)))
        return

    plans_only = "--plans-only" in args
    if plans_only:
        args.remove("--plans-only")
        assert explain_dir, "--plans-only needs --explain-dir"
        for name in (args or sorted(PLANS)):
            if name not in PLANS:
                continue
            os.makedirs(explain_dir, exist_ok=True)
            df = PLANS[name]()
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            print(f"## plan: {name}", file=sys.stderr)
        return

    names = args or sorted(LANES)
    out = {}
    for name in names:
        if explain_dir and name in PLANS:
            os.makedirs(explain_dir, exist_ok=True)
            df = PLANS[name]()
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        if name not in LANES:
            print(f"unknown lane: {name}", file=sys.stderr)
            continue
        best = None
        for _ in range(repeats):
            spark.catalog.clearCache()
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            LANES[name]()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        sc.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"## {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"queries": out, "sf": SF_DIR, "repeats": repeats}))


if __name__ == "__main__":
    main()
