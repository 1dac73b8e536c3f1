"""Plan-shape assertions: the physical plans we audited into PLANS.md,
pinned as tests so a refactor can't silently regress the scale story
(unpushed filters, surprise shuffles, broadcast joins degrading to
sort-merge, Python creeping onto JVM paths)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gol_tool_spark.functions import synth
from gol_tool_spark.operators import ann, dedup, spatial_query, tiling


def plan_of(df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    return tiling.assign_points(synth.points_df(spark, sf_dir))


class TestPlanShapes:
    def test_tile_assign_is_narrow(self, pts, spark, sf_dir):
        """C1 over a materialized store must be a pure Project — zero
        exchanges, zero Python."""
        stored = spark.createDataFrame(
            [(1, 2, 3)], "id long, x long, y long"
        )  # stand-in for a store scan: the transform itself adds no shuffle
        plan = plan_of(tiling.assign_points(stored))
        assert "Exchange" not in plan
        assert "ArrowEval" not in plan and "BatchEvalPython" not in plan

    def test_pile_assignment_broadcasts_every_zoom(self, pts):
        cat = tiling.catalog_topk(
            tiling.rollup(tiling.density(pts.select("x", "y"))), 64, 20
        )
        plan = plan_of(tiling.pile_assignment(pts, cat), mode="simple")
        assert "SortMergeJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 4  # one per non-leaf zoom

    def test_way_assembly_partial_aggregates(self, spark, sf_dir, pts):
        mem = synth.membership_df(spark, sf_dir)
        plan = plan_of(tiling.way_assembly(mem, pts))
        # map-side combine: partial + final HashAggregate pairs
        assert plan.count("HashAggregate") >= 2
        assert "CartesianProduct" not in plan

    def test_bbox_filter_is_plain_conjunct(self, pts):
        q = spatial_query.bbox_query(pts, -1000, -1000, 1000, 1000)
        plan = plan_of(q)
        assert "Filter" in plan and "ArrowEval" not in plan

    def test_half_world_bbox_keeps_coarse_tile_prune(self, spark):
        """r3 VERDICT 'What's wrong' #2: above 10k z12 tiles the IN-list
        must fall back to a coarser zoom, not disengage — a half-world
        bbox over a STORED-tile table still carries a tile filter
        Catalyst can push down."""
        stored = spark.createDataFrame(
            [(1, 2, 3, 4)], "id long, x long, y long, tile long"
        )  # leaf relation WITH a tile column = stored-store shape
        H = 1 << 30
        q = spatial_query.bbox_query(stored, -H, -H, H, H)
        plan = plan_of(q)
        # the coarse prune shows as a shiftright-derived INSET filter on
        # the zoomed-out tile (large IN lists compile to InSet)
        assert "shiftright" in plan and ("INSET" in plan or " IN " in plan)

    def test_tile_is_stored_detection_shapes(self, spark, sf_dir, pts, tmp_path):
        """_tile_is_stored must say True for a parquet scan carrying a
        tile column (with or without projections/filters on top), and
        False for derived-tile plans — the auto-gate's contract."""
        p = str(tmp_path / "stored_pts")
        pts.limit(100).write.parquet(p)
        stored = spark.read.parquet(p)
        assert spatial_query._tile_is_stored(stored)
        assert spatial_query._tile_is_stored(
            stored.filter(F.col("x") > 0).select("id", "x", "y", "tile")
        )
        assert not spatial_query._tile_is_stored(pts)  # computed tile
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        assert not spatial_query._tile_is_stored(raw)  # no tile anywhere

    def test_derived_tile_bbox_skips_prune(self, pts):
        """r4 VERDICT 'What's wrong' #2: when `tile` is a computed
        expression (fresh assign_points output), the IN-list costs a
        per-row tile evaluation and prunes nothing beyond the x/y range —
        bbox_query must auto-detect this and keep the pure range plan."""
        H = 1 << 30
        plan = plan_of(spatial_query.bbox_query(pts, -H, -H, H, H))
        assert "INSET" not in plan and "Filter" in plan
        # and the explicit override still attaches it
        forced = plan_of(spatial_query.bbox_query(pts, -H, -H, H, H, prune=True))
        assert "INSET" in forced or " IN " in forced

    def test_half_world_bbox_results_unchanged_by_prune(self, pts):
        """The coarse prune is a superset cover: results must equal the
        pure x/y range filter."""
        H = 1 << 30
        a = spatial_query.bbox_query(pts, -H, -H, H, H, prune=True).select("id")
        b = pts.filter(
            (F.col("x") >= -H) & (F.col("x") <= H)
            & (F.col("y") >= -H) & (F.col("y") <= H)
        ).select("id")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_minhash_lsh_no_cartesian(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = plan_of(dedup.minhash_lsh_pairs(docs, n=3, threshold=0.3))
        assert "CartesianProduct" not in plan  # banded bucket join, not all-pairs

    def test_contamination_broadcasts_benchmark_side(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bench = docs.filter(F.col("doc_id") % 37 == 0)
        plan = plan_of(dedup.benchmark_contamination(docs, bench, n=3))
        # the held-out shingle set broadcasts into a semi join — the corpus
        # side must never shuffle for the overlap probe
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    def test_ann_cosine_broadcasts_queries(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        plan = plan_of(ann.cosine_topk(emb, [0, 1], k=5), mode="simple")
        assert "Broadcast" in plan  # query side broadcast, never shuffled

    def test_knn_join_ring_path_no_python(self, spark, pts):
        q = spark.createDataFrame([(1, 0, 0)], "qid long, qx long, qy long")
        ring_only = spatial_query.knn_join(pts, q, k=3, levels=(1,), exact=False)
        plan = plan_of(ring_only)
        assert "ArrowEval" not in plan and "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan  # cell join, not all-pairs

    def test_knn_exact_residue_is_broadcast(self, spark, pts):
        """round-2 VERDICT 'What's wrong' #2: the exact fallback for
        unconverged queries must broadcast the residue (nested-loop over
        the points table), never an unbroadcast cartesian shuffle."""
        q = spark.createDataFrame([(1, 0, 0)], "qid long, qx long, qy long")
        df = spatial_query.knn_join(pts, q, k=3, levels=(1,), exact=True)
        plan = plan_of(df, mode="simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" in plan

    def test_store_scan_pushdown_and_pruning(self, spark, sf_dir, tmp_path):
        from gol_tool_spark.plans import build_pipeline as BP

        cfg = BP.BuildConfig(
            out_dir=str(tmp_path / "g"), sf_dir=sf_dir, max_tiles=30, min_density=20
        )
        BP.run_build(spark, cfg)
        store = spark.read.parquet(os.path.join(cfg.out_dir, "compile"))
        plan = plan_of(
            store.filter((F.col("x") >= -1000) & (F.col("x") <= 1000) & (F.col("pile") == 2))
        )
        assert "PushedFilters: [" in plan and "GreaterThanOrEqual(x,-1000)" in plan
        assert "PartitionFilters" in plan
        kplan = plan_of(
            BP.query_store(spark, os.path.join(cfg.out_dir, "compile"), "n[highway]", cfg.indexed_keys)
        )
        part = kplan.split("PartitionFilters")[1].split("]")[0]
        assert "keybits" in part
        # full stack: bbox + GOQL together — buckets pruned at planning,
        # ranges pushed to the scan, tag clauses residual
        full = BP.query_store(
            spark, os.path.join(cfg.out_dir, "compile"), "n[highway]",
            cfg.indexed_keys, bbox=(-1000000, -1000000, 1000000, 1000000),
        )
        fplan = plan_of(full)
        fpart = fplan.split("PartitionFilters")[1].split("]")[0]
        assert "keybits" in fpart
        assert "GreaterThanOrEqual(x,-1000000)" in fplan
        # scope via tile spec resolves to the same pruning shape
        tplan = plan_of(
            BP.query_store(
                spark, os.path.join(cfg.out_dir, "compile"),
                "n[highway]", cfg.indexed_keys, tile_spec="3/4/3",
            )
        )
        assert "PushedFilters: [" in tplan and "keybits" in tplan.split("PartitionFilters")[1].split("]")[0]


class TestAnalyticsPlanShapes:
    """Plan pins for the round-5 ESDA / mobility / zonal operators."""

    def test_zonal_stats_builds_on_cover_side(self, spark):
        """The zone cover MUST be the broadcast build side — a
        stats-blind optimizer picked the points side at tiny SF, which
        would broadcast the fact table at 100 TB (PLANS.md 'Zonal
        statistics')."""
        from gol_tool_spark.operators.spatial_query import zonal_stats

        pts = spark.range(100).select(
            F.col("id"), (F.col("id") * 7).alias("x"), (F.col("id") * 3).alias("y"),
            F.lit(1).alias("qty"))
        zones = spark.createDataFrame(
            [(1, [(-50, -50), (50, -50), (50, 50), (-50, 50)])],
            "zone_id long, ring array<struct<x: long, y: long>>")
        plan = plan_of(zonal_stats(pts, zones, value_col="qty"), mode="simple")
        assert "BroadcastHashJoin" in plan and "BuildRight" in plan
        assert "CartesianProduct" not in plan
        assert "ArrowEval" not in plan and "BatchEvalPython" not in plan

    def test_ripley_no_cartesian_no_python(self, spark):
        from gol_tool_spark.operators import geostats

        pts = spark.range(100).select(
            F.col("id"), (F.col("id") * 7).alias("x"), (F.col("id") * 3).alias("y"))
        plan = plan_of(geostats.ripley_k(pts, [64, 256]))
        assert "CartesianProduct" not in plan
        assert "ArrowEval" not in plan and "BatchEvalPython" not in plan

    def test_kde_raster_two_aggs_no_join(self, spark):
        from gol_tool_spark.operators import geostats

        pts = spark.range(100).select(
            (F.col("id") * 7).alias("x"), (F.col("id") * 3).alias("y"))
        plan = plan_of(geostats.kde_raster(pts, cell_shift=24), mode="simple")
        assert "Join" not in plan  # pure agg -> explode -> agg
        assert plan.count("HashAggregate") >= 4  # two partial+final pairs

    def test_radius_gyration_single_exchange(self, spark):
        from gol_tool_spark.operators import trajectory

        df = spark.range(100).select(
            (F.col("id") % 5).alias("user_id"),
            (F.col("id") * 7).alias("x"), (F.col("id") * 3).alias("y"))
        plan = plan_of(trajectory.radius_gyration(df), mode="simple")
        assert plan.count("Exchange") == 1  # one map-combined groupBy
        assert "Window" not in plan and "Join" not in plan

    def test_track_ohlc_no_window_functions(self, spark):
        """The struct-MIN/MAX formulation must not regress to a window
        (two sorts per entity-window) — one grouped agg only."""
        import datetime as dt
        from gol_tool_spark.operators import trajectory

        df = spark.createDataFrame(
            [(1, 1, dt.datetime(2024, 1, 1), 0, 0)],
            "user_id int, event_id long, ts timestamp_ntz, x long, y long")
        plan = plan_of(trajectory.track_ohlc(df), mode="simple")
        assert "Window" not in plan
        assert plan.count("Exchange") == 1
