"""Tests: resumable build pipeline, change stream, sinks."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.plans import build_pipeline as BP
from gol_tool_spark.sinks import writers
from gol_tool_spark.streaming import changes as CH


class TestBuildPipeline:
    @pytest.fixture()
    def cfg(self, tmp_path, sf_dir):
        return BP.BuildConfig(out_dir=str(tmp_path / "gol"), sf_dir=sf_dir,
                              max_tiles=30, min_density=20, salt_threshold=100)

    def test_full_run_and_resume(self, spark, cfg):
        m1 = BP.run_build(spark, cfg)
        assert m1["_ran"] == list(BP.STAGES)
        assert m1["sort"]["rows"] == m1["compile"]["rows"] > 0
        assert m1["validate"]["purgatory_ways"] > 0
        assert all("partitions" in m1[s] for s in ("analyze", "sort", "compile"))
        # resume: nothing re-runs
        m2 = BP.run_build(spark, cfg)
        assert m2["_ran"] == []
        # force from validate: validate + compile re-run, sort untouched
        m3 = BP.run_build(spark, cfg, force_from="validate")
        assert m3["_ran"] == ["validate", "compile"]

    def test_sorted_layout_and_salt(self, spark, cfg):
        BP.run_build(spark, cfg)
        comp = spark.read.parquet(os.path.join(cfg.out_dir, "compile"))
        assert set(comp.columns) >= {"id", "x", "y", "tile", "pile", "salt"}
        # every point routed to a pile >= 2 (purgatory pile 1 is for features)
        assert comp.filter(F.col("pile") < 2).count() == 0
        # hot piles (cnt>threshold) got salted into >1 bucket
        n_salted = comp.filter(F.col("salt") > 0).count()
        assert n_salted > 0

    def test_store_scan_pushdown(self, spark, cfg):
        """The compiled store must serve bbox queries with parquet-level
        predicate pushdown + partition pruning — the R-tree/tile-walk
        analogue (SURVEY.md §4). Derived columns can't push down; the
        materialized store exists exactly so they do."""
        BP.run_build(spark, cfg)
        store = spark.read.parquet(os.path.join(cfg.out_dir, "compile"))
        q = store.filter(
            (F.col("x") >= -1000000) & (F.col("x") <= 1000000)
            & (F.col("y") >= -1000000) & (F.col("y") <= 1000000)
        )
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PushedFilters" in plan
        assert "GreaterThanOrEqual(x,-1000000)" in plan
        # partition pruning on the pile partition column
        q2 = store.filter(F.col("pile") == 2)
        plan2 = q2._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PartitionFilters" in plan2 and "pile" in plan2

    def test_keybits_index_prunes_buckets(self, spark, cfg):
        """VERDICT round-1 item 6: GOQL tag queries AND a keybits IN-list
        prefilter; keybits is a partition column (the key-index bucket made
        literal), so non-matching buckets are pruned at planning time —
        the SIndexTree.java:273-359 skip."""
        from gol_tool_spark.functions import keybits as KB

        BP.run_build(spark, cfg)
        store_path = os.path.join(cfg.out_dir, "compile")
        goql = "n[highway]"
        got = BP.query_store(spark, store_path, goql, cfg.indexed_keys)

        # correctness: prefilter changes nothing vs the plain GOQL predicate
        from gol_tool_spark.functions.goql import compile_goql

        plain = (
            spark.read.parquet(store_path)
            .withColumn("ftype", F.lit("n"))
            .filter(compile_goql(goql))
        )
        assert got.count() == plain.count() > 0

        # the IN-list is a PartitionFilter (planning-time bucket pruning)
        plan = got._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PartitionFilters" in plan and "keybits" in plan.split("PartitionFilters")[1].split("]")[0]

        # directory-level evidence: the store has keybits buckets the query
        # does NOT match — those are skipped entirely
        schema = KB.parse_schema(cfg.indexed_keys)
        reqs = KB.query_required_bits(goql, schema)
        buckets = set()
        for dp, dirs, _ in os.walk(store_path):
            for d in dirs:
                if d.startswith("keybits="):
                    buckets.add(int(d.split("=")[1]))
        matching = {v for v in buckets if any((v & r) == r for r in reqs)}
        assert buckets and matching and matching < buckets, (matching, buckets)

    def test_lineage_manifest_shape(self, spark, cfg):
        BP.run_build(spark, cfg)
        with open(os.path.join(cfg.out_dir, "_manifest_sort.json")) as fh:
            m = json.load(fh)
        assert m["rows"] == sum(p["rows"] for p in m["partitions"])
        assert m["bytes"] > 0 and m["wall_sec"] > 0


class TestChangeStream:
    def test_upsert_delete_merge(self, spark, tmp_path):
        changes = tmp_path / "changes"
        store = str(tmp_path / "store")
        ckpt = str(tmp_path / "ckpt")
        changes.mkdir()
        (changes / "c1.json").write_text(
            '{"op": "upsert", "id": 1, "x": 100, "y": 200}\n'
            '{"op": "upsert", "id": 2, "x": -500, "y": 900}\n'
        )
        q = CH.apply_changes(spark, str(changes), store, ckpt)
        q.awaitTermination(60)
        got = {r.id: (r.x, r.y) for r in spark.read.parquet(store).collect()}
        assert got == {1: (100, 200), 2: (-500, 900)}
        # second batch: modify 1, delete 2, add 3
        (changes / "c2.json").write_text(
            '{"op": "upsert", "id": 1, "x": 111, "y": 222}\n'
            '{"op": "delete", "id": 2, "x": 0, "y": 0}\n'
            '{"op": "upsert", "id": 3, "x": 7, "y": 8}\n'
        )
        q = CH.apply_changes(spark, str(changes), store, ckpt)
        q.awaitTermination(60)
        got = {r.id: (r.x, r.y) for r in spark.read.parquet(store).collect()}
        assert got == {1: (111, 222), 3: (7, 8)}
        # tiles recomputed on upsert
        t = {r.id: r.tile for r in spark.read.parquet(store).collect()}
        from gol_tool_spark.kernels import tile as KT

        assert t[1] == int(KT.tile_of_point(111, 222, 12))


class TestSinks:
    @pytest.fixture(scope="class")
    def pts(self, spark):
        return spark.createDataFrame(
            [(1, 0, 0, "R"), (2, 1 << 30, -(1 << 30), "A")],
            "id long, x long, y long, flag string",
        )

    def test_list(self, pts):
        lines = {r.line for r in writers.list_format(pts).collect()}
        assert lines == {"node/1", "node/2"}

    def test_csv_lonlat(self, pts):
        rows = writers.csv_format(pts, ["id", "lon", "lat"]).collect()
        by_id = {r.id: (r.lon, r.lat) for r in rows}
        assert by_id[1] == (0.0, 0.0)
        assert abs(by_id[2][0] - 90.0) < 1e-6  # x = 2^30 = quarter world east
        assert abs(by_id[2][1] + 66.51326) < 1e-4

    def test_geojson_valid(self, pts):
        out = [r.feature for r in writers.geojson_format(pts).collect()]
        feats = [json.loads(s) for s in out]
        assert all(f["type"] == "Feature" for f in feats)
        g = {f["id"]: f["geometry"]["coordinates"] for f in feats}
        assert g[1] == [0.0, 0.0]
        assert any(abs(c[0] - 90.0) < 1e-6 for c in [g[2]])

    def test_wkt(self, pts):
        w = {r.wkt for r in writers.wkt_format(pts).collect()}
        assert "POINT (0.0 0.0)" in w

    def test_count_and_poly(self, spark, pts):
        assert writers.count_format(pts) == 2
        ring = spark.createDataFrame(
            [(0, 0, 0), (1, 1 << 30, 0), (2, 1 << 30, 1 << 30), (3, 0, 1 << 30)],
            "seq int, x long, y long",
        )
        poly = writers.poly_format(ring, "test")
        assert poly.startswith("test\n1\n") and poly.endswith("END\nEND")
        assert len(poly.splitlines()) == 8


class TestStatefulDedup:
    def test_first_seen_dedup_across_batches(self, spark, tmp_path):
        from gol_tool_spark.streaming import stateful

        src = tmp_path / "docs"
        ckpt = str(tmp_path / "ck")
        out = str(tmp_path / "out")
        src.mkdir()
        (src / "b1.json").write_text(
            '{"doc_id": 1, "text": "alpha beta"}\n'
            '{"doc_id": 2, "text": "alpha beta"}\n'
            '{"doc_id": 3, "text": "gamma"}\n'
        )
        q = stateful.run_dedup(spark, str(src), ckpt, out)
        q.awaitTermination(90)
        first = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert first == {1, 3}  # doc 2 is a duplicate of doc 1
        # second batch after restart: replay doc 1's text, new doc 5
        (src / "b2.json").write_text(
            '{"doc_id": 4, "text": "alpha beta"}\n'
            '{"doc_id": 5, "text": "delta"}\n'
        )
        q = stateful.run_dedup(spark, str(src), ckpt, out)
        q.awaitTermination(90)
        second = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert 5 in second and 4 not in second  # state survived the restart


class TestVerifyBuild:
    def test_checker_green_then_detects_tamper(self, spark, tmp_path, sf_dir):
        cfg = BP.BuildConfig(out_dir=str(tmp_path / "g2"), sf_dir=sf_dir,
                             max_tiles=30, min_density=20)
        BP.run_build(spark, cfg)
        rep = BP.verify_build(spark, cfg)
        assert rep["ok"] and rep["sort_vs_compile"]["ok"]
        # tamper: delete a compile parquet file -> checker must flag it
        import glob
        victim = glob.glob(os.path.join(cfg.out_dir, "compile", "**", "*.parquet"),
                           recursive=True)[0]
        os.remove(victim)
        rep2 = BP.verify_build(spark, cfg)
        assert not rep2["ok"] and not rep2["compile"]["ok"]


class TestBucketedJoin:
    def test_colocated_join_has_no_exchange(self, spark, sf_dir, tmp_path):
        from gol_tool_spark.functions import synth
        from gol_tool_spark.operators import tiling
        from gol_tool_spark.plans import bucketed as B

        mem = synth.membership_df(spark, sf_dir)
        pts = tiling.assign_points(synth.points_df(spark, sf_dir))
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force a non-broadcast join so the shuffle question is real
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            mem_t, nodes_t = B.prepare_colocated(spark, mem, pts, buckets=8, prefix="tb")
            ways = B.way_assembly_colocated(spark, mem_t, nodes_t)
            # same results as the shuffling C2
            base = tiling.way_assembly(mem, pts)
            got = {(r.way_id, r.n_nodes, r.minx, r.maxy) for r in ways.collect()}
            exp = {(r.way_id, r.n_nodes, r.minx, r.maxy) for r in base.collect()}
            assert got == exp
            # and the join itself is shuffle-free (bucketed co-location)
            assert B.join_exchange_count(ways) == 0
            # the unbucketed plan DOES shuffle on the key — the contrast
            assert B.join_exchange_count(
                mem.join(pts.select(F.col("id").alias("node_ref"), "x", "y", "tile"),
                         "node_ref").groupBy("way_id").agg(F.count(F.lit(1)).alias("n"))
            ) >= 1
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
            spark.sql("DROP TABLE IF EXISTS tb_membership")
            spark.sql("DROP TABLE IF EXISTS tb_nodes")


class TestAqeSkewJoin:
    def test_skew_split_fires_on_hot_key(self, spark):
        """Runtime skew handling (SURVEY §4 'we must add'): a 60%-hot-key
        join must show SortMergeJoin(skew=true) in the final AQE plan.
        Thresholds are lowered to make the tiny fixture 'skewed'."""
        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        }
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            left = spark.range(2_000_000).select(
                F.when(F.col("id") % 10 < 6, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
                F.col("id").alias("v"),
            )
            right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
            j = left.join(right, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
            j.collect()
            plan = j._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            assert "skew=true" in plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestTileset:
    def test_save_load_roundtrip_and_corruption(self, spark, tmp_path, sf_dir):
        from gol_tool_spark.plans import tileset as TS

        cfg = BP.BuildConfig(out_dir=str(tmp_path / "g3"), sf_dir=sf_dir,
                             max_tiles=30, min_density=20)
        BP.run_build(spark, cfg)
        store = os.path.join(cfg.out_dir, "compile")
        ts = str(tmp_path / "tileset")
        m = TS.save_tileset(store, ts)
        assert m["piles"] and "guid" in m
        # load into a fresh store: everything fetched, data identical
        store2 = str(tmp_path / "restored")
        rep = TS.load_tileset(ts, store2)
        assert sorted(rep["loaded"]) == sorted(m["piles"]) and not rep["skipped"]
        a = spark.read.parquet(store).orderBy("id").collect()
        b = spark.read.parquet(store2).orderBy("id").collect()
        assert a == b
        # second load skips everything (incremental semantics)
        rep2 = TS.load_tileset(ts, store2)
        assert not rep2["loaded"] and sorted(rep2["skipped"]) == sorted(m["piles"])
        # corruption detected
        import glob
        victim = glob.glob(os.path.join(ts, "pile=*", "**", "*.parquet"), recursive=True)[0]
        with open(victim, "ab") as fh:
            fh.write(b"junk")
        with pytest.raises(ValueError, match="checksum mismatch"):
            TS.load_tileset(ts, str(tmp_path / "r2"))

    def test_hostile_manifest_path_traversal_rejected(self, tmp_path):
        """ADVICE r2: a compromised repo must not write outside the store —
        '..' and absolute segments in manifest pile names / file lists are
        rejected before any byte lands on disk."""
        import json as _json

        from gol_tool_spark.plans import tileset as TS

        repo = tmp_path / "evilrepo"
        repo.mkdir()
        for d, files in (
            ("../escape", ["x.parquet"]),
            ("pile=1", ["../../outside.parquet"]),
            ("/abs/pile", ["x.parquet"]),
        ):
            manifest = {"piles": {d: {"checksum": "00", "files": files}}, "guid": "g"}
            (repo / "tileset.json").write_text(_json.dumps(manifest))
            with pytest.raises(ValueError, match="escapes the store"):
                TS.load_tileset(str(repo), str(tmp_path / "victim"), verify=False)
        assert not (tmp_path / "escape").exists()
        assert not (tmp_path / "outside.parquet").exists()


class TestSinkWrites:
    def test_csv_and_geojsonl_files(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 0, 0, {"name": "pub"})], "id long, x long, y long, tags map<string,string>"
        )
        csv_path = str(tmp_path / "out_csv")
        writers.write_csv(writers.csv_format(df, ["id", "lon", "lat"]), csv_path)
        back = spark.read.option("header", True).csv(csv_path).collect()
        assert len(back) == 1 and back[0].id == "1"
        gj_path = str(tmp_path / "out_gj")
        writers.write_geojsonl(df, gj_path)
        lines = spark.read.text(gj_path).collect()
        assert len(lines) == 1 and '"type":"Feature"' in lines[0].value


class TestStreamStaticRouting:
    def test_stream_routing_matches_batch(self, spark, tmp_path, sf_dir):
        """The streaming twin of C1 pile routing: stream-static broadcast
        joins produce the exact batch assignment per record."""
        from gol_tool_spark.functions import synth
        from gol_tool_spark.operators import tiling
        from gol_tool_spark.streaming import routing

        pts = tiling.assign_points(synth.points_df(spark, sf_dir))
        cat = tiling.catalog_topk(
            tiling.rollup(tiling.density(pts.select("x", "y"))), 30, 20
        ).localCheckpoint()
        sample = pts.select("id", "x", "y").limit(25).collect()
        ch = tmp_path / "ch"
        ch.mkdir()
        (ch / "a.json").write_text(
            "\n".join(
                '{"op": "upsert", "id": %d, "x": %d, "y": %d}' % (r.id, r.x, r.y)
                for r in sample
            )
        )
        q = (
            routing.routed_change_stream(spark, str(ch), cat)
            .writeStream.format("memory")
            .queryName("routed")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)
        got = {r.id: r.assigned_tile for r in spark.sql("select * from routed").collect()}
        batch = tiling.pile_assignment(
            pts.join(spark.createDataFrame([(r.id,) for r in sample], "id long"), "id"), cat
        )
        expect = {r.id: r.assigned_tile for r in batch.collect()}
        assert got == expect and len(got) == 25


class TestCompaction:
    def test_compact_merges_only_fragmented_piles(self, spark, tmp_path):
        """Sustained deltas fragment hot piles; compaction rewrites ONLY
        those, leaving healthy piles byte-identical (the parquet analogue
        of the reference's free-space reclamation)."""
        from gol_tool_spark.plans import compact as CP

        store = str(tmp_path / "store")
        # pile 0 healthy (1 file), pile 5 fragmented (many appends)
        base = spark.createDataFrame([(i, i, 0) for i in range(50)], "id long, x long, pile int")
        base.coalesce(1).write.partitionBy("pile").parquet(store)
        for k in range(6):
            frag = spark.createDataFrame(
                [(1000 + k * 10 + j, j, 5) for j in range(5)], "id long, x long, pile int"
            )
            frag.coalesce(1).write.mode("append").partitionBy("pile").parquet(store)

        def files_of(p):
            d = os.path.join(store, f"pile={p}")
            return {
                f: os.stat(os.path.join(d, f)).st_mtime_ns
                for f in os.listdir(d)
                if not f.startswith(("_", "."))
            }

        before0, before5 = files_of(0), files_of(5)
        assert len(before5) == 6
        rows_before = {(r.id, r.x) for r in spark.read.parquet(store).collect()}

        assert CP.fragmented_piles(store, max_files=4) == [5]
        rep = CP.compact_piles(spark, store, max_files=4)
        assert rep["compacted"] == [5]
        assert files_of(0) == before0                      # untouched
        assert len(files_of(5)) < len(before5)             # merged
        rows_after = {(r.id, r.x) for r in spark.read.parquet(store).collect()}
        assert rows_after == rows_before                   # lossless


class TestStoreInfo:
    def test_info_report_shape(self, spark, tmp_path, sf_dir):
        """`gol info` analogue (InfoCommand.java:23-90): footer-only store
        report — rows/bytes/piles/keybits histogram, no data scan."""
        from gol_tool_spark.plans import info as INFO
        from gol_tool_spark.plans import tileset as TS

        cfg = BP.BuildConfig(out_dir=str(tmp_path / "g5"), sf_dir=sf_dir,
                             max_tiles=30, min_density=20)
        m = BP.run_build(spark, cfg)
        store = os.path.join(cfg.out_dir, "compile")
        ts = str(tmp_path / "ts")
        TS.save_tileset(store, ts)
        rep = INFO.store_info(store, tileset_dir=ts)
        assert rep["rows"] == m["compile"]["rows"]
        assert rep["piles"] == len([d for d in os.listdir(store) if d.startswith("pile=")])
        assert rep["guid"] and rep["n_files"] > 0 and rep["n_row_groups"] >= rep["n_files"]
        assert sum(rep["keybits"].values()) == rep["rows"]
        assert sum(p["rows"] for p in rep["per_pile"].values()) == rep["rows"]
        assert all(p["buckets"] >= 1 for p in rep["per_pile"].values())


class TestLocalityLayout:
    def test_hilbert_column_matches_kernel(self, spark):
        from gol_tool_spark.functions import spatial as S
        from gol_tool_spark.kernels import tile as KT

        rows = [(i, (i * 2654435761) % (1 << 32) - (1 << 31),
                 (i * 2246822519 + 7) % (1 << 32) - (1 << 31)) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        got = {r.id: r.h for r in df.select(
            "id", S.hilbert_cell(F.col("x"), F.col("y"), 16).alias("h")).collect()}
        xs = np.array([r[1] for r in rows], np.int64)
        ys = np.array([r[2] for r in rows], np.int64)
        expect = KT.hilbert_d(xs, ys, 16)
        assert [got[i] for i in range(200)] == [int(v) for v in expect]

    def test_hilbert_rowgroup_locality_not_worse_than_morton(self, spark, tmp_path, sf_dir):
        """The point of the Hilbert layout: bbox queries touch no more (and
        typically fewer) parquet row groups than under Morton ordering.
        Footer-level measurement over deterministic bboxes."""
        import pyarrow.parquet as pq
        from gol_tool_spark.functions import spatial as S
        from gol_tool_spark.functions import synth

        pts = synth.points_df(spark, sf_dir).select("id", "x", "y")

        def write_sorted(key_fn, path):
            (pts.withColumn("k", key_fn(F.col("x"), F.col("y"), 16))
             .coalesce(1).sortWithinPartitions("k").drop("k")
             .write.option("parquet.block.size", 16384).mode("overwrite").parquet(path))

        def rg_hits(path, boxes):
            f = [os.path.join(dp, fn) for dp, _, fs in os.walk(path)
                 for fn in fs if fn.endswith(".parquet")]
            hits = total = 0
            for fp in f:
                md = pq.ParquetFile(fp).metadata
                ci = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for rg in range(md.num_row_groups):
                    xs = md.row_group(rg).column(ci["x"]).statistics
                    ys = md.row_group(rg).column(ci["y"]).statistics
                    total += 1
                    for (w, s, e, n) in boxes:
                        if xs.min <= e and xs.max >= w and ys.min <= n and ys.max >= s:
                            hits += 1
            return hits, total

        boxes = []
        for i in range(12):
            cx = ((i * 40503) % 256 - 128) * (1 << 23)
            cy = ((i * 9311 + 77) % 256 - 128) * (1 << 23)
            r = 1 << 26
            boxes.append((cx - r, cy - r, cx + r, cy + r))

        mpath, hpath = str(tmp_path / "m"), str(tmp_path / "h")
        write_sorted(S.morton_cell, mpath)
        write_sorted(S.hilbert_cell, hpath)
        mh, mt = rg_hits(mpath, boxes)
        hh, ht = rg_hits(hpath, boxes)
        assert mt > 3 and ht > 3  # enough row groups for the comparison to mean anything
        assert hh <= mh, f"hilbert touched more row groups ({hh}) than morton ({mh})"


class TestHttpTileRepo:
    def test_http_load_roundtrip_and_corruption(self, spark, tmp_path, sf_dir):
        """VERDICT round-1 item 10: LoadCommand.java:32-71 fetches tiles
        from a URL repo — serve the tileset over HTTP, load incrementally,
        detect corruption."""
        import functools
        import http.server
        import threading

        from gol_tool_spark.plans import tileset as TS

        cfg = BP.BuildConfig(out_dir=str(tmp_path / "g4"), sf_dir=sf_dir,
                             max_tiles=30, min_density=20)
        BP.run_build(spark, cfg)
        store = os.path.join(cfg.out_dir, "compile")
        ts = str(tmp_path / "tileset")
        m = TS.save_tileset(store, ts)

        handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=ts)
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            store2 = str(tmp_path / "restored")
            rep = TS.load_tileset(url, store2)
            assert sorted(rep["loaded"]) == sorted(m["piles"]) and not rep["skipped"]
            a = spark.read.parquet(store).orderBy("id").collect()
            b = spark.read.parquet(store2).orderBy("id").collect()
            assert a == b
            # incremental: second load fetches nothing
            rep2 = TS.load_tileset(url, store2)
            assert not rep2["loaded"] and sorted(rep2["skipped"]) == sorted(m["piles"])
            # server-side corruption -> checksum error, no partial pile left
            import glob

            victim = glob.glob(os.path.join(ts, "pile=*", "**", "*.parquet"), recursive=True)[0]
            with open(victim, "ab") as fh:
                fh.write(b"junk")
            with pytest.raises(ValueError, match="checksum mismatch"):
                TS.load_tileset(url, str(tmp_path / "r2"))
            bad_pile = os.path.relpath(victim, ts).split(os.sep)[0]
            assert not os.path.exists(os.path.join(str(tmp_path / "r2"), bad_pile))
        finally:
            srv.shutdown()


class TestTileSpecScope:
    def test_bbox_accepts_zxy(self, spark):
        from gol_tool_spark.kernels import tile as KT
        from gol_tool_spark.operators import spatial_query

        tile = KT.parse_tile_spec("3/2/5")
        w, s, e, n = KT.tile_bounds(tile)
        assert e - w == n - s == (1 << 29) - 1
        # a point inside that tile maps back to it
        assert int(KT.tile_of_point((w + e) // 2, (s + n) // 2, 3)) == tile
        pts = spark.createDataFrame(
            [(1, (w + e) // 2, (s + n) // 2), (2, w - 10, s - 10)],
            "id long, x long, y long",
        )
        pts = pts.withColumn("tile", F.lit(0))
        got = {r.id for r in spatial_query.bbox_query(pts, tile_spec="3/2/5", zoom=0).collect()}
        assert got == {1}
        with pytest.raises(ValueError):
            KT.parse_tile_spec("3/9/0")
        with pytest.raises(ValueError):
            spatial_query.bbox_query(pts)


class TestPartitionScopedMerge:
    """VERDICT round-1 item 1: a small delta against a multi-pile store must
    rewrite ONLY the affected pile directories (update/TileFinder.java +
    update/FeatureFinder.java semantics), leaving every untouched pile's
    parquet files at the same paths with the same mtimes."""

    @staticmethod
    def _pile_files(store):
        out = {}
        for d in sorted(os.listdir(store)):
            if not d.startswith("pile="):
                continue
            files = {}
            pd_ = os.path.join(store, d)
            for f in os.listdir(pd_):
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(pd_, f)
                files[f] = os.stat(p).st_mtime_ns
            out[d] = files
        return out

    def test_delta_rewrites_only_affected_piles(self, spark, tmp_path):
        store = str(tmp_path / "store")

        # 10 points in 10 distinct zoom-3 piles (z3 cell width = 2^29; keep
        # inside the world so nothing clamps)
        def px(i):
            return ((i % 8) - 4) * (1 << 29) + 1000

        def py(i):
            return (i // 8) * (1 << 29) + 2000

        pts = spark.createDataFrame(
            [(i, px(i), py(i)) for i in range(10)], "id long, x long, y long"
        )
        CH.write_store(pts, store)
        before = self._pile_files(store)
        assert len(before) == 10

        changes = tmp_path / "deltas"
        changes.mkdir()
        # 3-row delta: move id 1 within its pile, delete id 2, add id 100
        # into id 7's pile
        (changes / "d.json").write_text(
            '{"op": "upsert", "id": 1, "x": %d, "y": %d}\n'
            '{"op": "delete", "id": 2, "x": 0, "y": 0}\n'
            '{"op": "upsert", "id": 100, "x": %d, "y": %d}\n'
            % (px(1) + 4000, py(1) + 4000, px(7) + 64, py(7) + 64)
        )
        q = CH.apply_changes(spark, str(changes), store, str(tmp_path / "ck"))
        q.awaitTermination(120)

        got = {r.id: (r.x, r.y) for r in spark.read.parquet(store).collect()}
        expect = {r.id: (r.x, r.y) for r in pts.collect()}
        expect[1] = (px(1) + 4000, py(1) + 4000)
        del expect[2]
        expect[100] = (px(7) + 64, py(7) + 64)
        assert got == expect

        after = self._pile_files(store)
        from gol_tool_spark.kernels import tile as KT

        def pile_of(x, y):
            t12 = int(KT.tile_of_point(x, y, 12))
            return int(KT.zoomed_out(t12, CH.PILE_ZOOM))

        touched = {
            f"pile={pile_of(*expect[1])}",
            f"pile={pile_of(px(2), py(2))}",
            f"pile={pile_of(*expect[100])}",
        }
        untouched = set(before) - touched
        assert len(untouched) == 7
        for d in untouched:
            assert after[d] == before[d], f"{d} was rewritten by an unrelated delta"
        for d in touched:
            assert after[d] != before[d]
        # the id->pile index merged too, and only its affected buckets
        idx = spark.read.parquet(store + "_idx")
        assert {r.id for r in idx.select("id").collect()} == set(expect)

    def test_verify_change_store(self, spark, tmp_path):
        """gol-check for the update path: store<->index agreement holds
        after merges; tampering is detected."""
        import shutil

        store = str(tmp_path / "vstore")
        pts = spark.createDataFrame(
            [(i, i * (1 << 27), -i * (1 << 27)) for i in range(8)], "id long, x long, y long"
        )
        CH.write_store(pts, store)
        ch = tmp_path / "vch"
        ch.mkdir()
        (ch / "d.json").write_text(
            '{"op": "delete", "id": 3, "x": 0, "y": 0, "seq": 1}\n'
            '{"op": "upsert", "id": 99, "x": 5, "y": 5, "seq": 1}\n'
        )
        CH.apply_changes(spark, str(ch), store, str(tmp_path / "vck")).awaitTermination(120)
        rep = CH.verify_change_store(spark, store)
        assert rep["ok"] and rep["store_rows"] == rep["index_rows"] == 8
        # tamper: drop an index bucket -> mismatch detected
        ib_dirs = [d for d in os.listdir(store + "_idx") if d.startswith("ib=")]
        shutil.rmtree(os.path.join(store + "_idx", ib_dirs[0]))
        rep2 = CH.verify_change_store(spark, store)
        assert not rep2["ok"] and rep2["mismatched_piles"] > 0

    def test_replay_is_idempotent(self, spark, tmp_path):
        """Crash-replay safety: applying the same delta twice (fresh
        checkpoint simulates a replay after a post-commit crash) converges
        to the same store."""
        store = str(tmp_path / "store")
        pts = spark.createDataFrame(
            [(i, (i - 2) * (1 << 29), (i - 2) * (1 << 29)) for i in range(4)],
            "id long, x long, y long",
        )
        CH.write_store(pts, store)
        changes = tmp_path / "deltas"
        changes.mkdir()
        (changes / "d.json").write_text(
            '{"op": "upsert", "id": 1, "x": 77, "y": 88}\n{"op": "delete", "id": 3, "x": 0, "y": 0}\n'
        )
        for ck in ("ck1", "ck2"):
            q = CH.apply_changes(spark, str(changes), store, str(tmp_path / ck))
            q.awaitTermination(120)
        got = {r.id: (r.x, r.y) for r in spark.read.parquet(store).collect()}
        assert got == {0: (-(2 << 29), -(2 << 29)), 1: (77, 88), 2: (0, 0)}


class TestChangeStreamEdge:
    def test_intra_batch_order_is_deterministic(self, spark, tmp_path):
        """An upsert followed by a delete of the same id in ONE delta file
        must delete (seq order, delete-beats-upsert on tie) — the winner is
        a pure function of the batch, so replays converge."""
        changes = tmp_path / "ch0"
        store = str(tmp_path / "st0")
        changes.mkdir()
        (changes / "a.json").write_text(
            '{"op": "upsert", "id": 1, "x": 1, "y": 1, "seq": 1}\n'
            '{"op": "delete", "id": 1, "x": 0, "y": 0, "seq": 2}\n'
            '{"op": "upsert", "id": 2, "x": 5, "y": 5, "seq": 1}\n'
            '{"op": "upsert", "id": 2, "x": 9, "y": 9, "seq": 2}\n'
            '{"op": "delete", "id": 3, "x": 0, "y": 0, "seq": 1}\n'
            '{"op": "upsert", "id": 3, "x": 7, "y": 7, "seq": 2}\n'
        )
        q = CH.apply_changes(spark, str(changes), store, str(tmp_path / "ck0"))
        q.awaitTermination(120)
        got = {r.id: (r.x, r.y) for r in spark.read.parquet(store).collect()}
        assert got == {2: (9, 9), 3: (7, 7)}  # 1 deleted, 2 last-wins, 3 re-created

    def test_sustained_deltas_stay_compacted(self, spark, tmp_path):
        """File-count watermark: many small deltas against one pile must
        not grow its file count without bound — the merge compacts
        affected piles past compact_after."""
        changes = tmp_path / "chc"
        store = str(tmp_path / "stc")
        changes.mkdir()
        for k in range(6):
            (changes / f"d{k}.json").write_text(
                "\n".join(
                    '{"op": "upsert", "id": %d, "x": %d, "y": %d, "seq": %d}'
                    % (100 + j, j * 50, j * 50, k)
                    for j in range(4)
                )
            )
            q = CH.apply_changes(
                spark, str(changes), store, str(tmp_path / "ckc"), compact_after=2
            )
            q.awaitTermination(120)
        pile_dirs = [d for d in os.listdir(store) if d.startswith("pile=")]
        assert len(pile_dirs) == 1
        files = [
            f for f in os.listdir(os.path.join(store, pile_dirs[0]))
            if f.endswith(".parquet")
        ]
        assert len(files) <= 3, files
        assert spark.read.parquet(store).count() == 4

    def test_bootstrap_crash_missing_index_rebuilt(self, spark, tmp_path):
        """ADVICE r2: batch 0 created the store but crashed before the
        first index write — the next merge must rebuild the index from the
        store instead of failing permanently on the missing path."""
        import shutil

        changes = tmp_path / "chb"
        store = str(tmp_path / "stb")
        changes.mkdir()
        (changes / "a.json").write_text('{"op": "upsert", "id": 1, "x": 1, "y": 2, "seq": 1}\n')
        q = CH.apply_changes(spark, str(changes), store, str(tmp_path / "ckb"))
        q.awaitTermination(120)
        shutil.rmtree(store + "_idx")  # simulate the bootstrap crash window
        (changes / "b.json").write_text('{"op": "upsert", "id": 2, "x": 9, "y": 9, "seq": 2}\n')
        q = CH.apply_changes(spark, str(changes), store, str(tmp_path / "ckb"))
        q.awaitTermination(120)
        assert spark.read.parquet(store).count() == 2
        rep = CH.verify_change_store(spark, store)
        assert rep["ok"], rep

    def test_only_deletes_batch(self, spark, tmp_path):
        changes = tmp_path / "ch"
        store = str(tmp_path / "st")
        changes.mkdir()
        (changes / "a.json").write_text('{"op": "upsert", "id": 1, "x": 1, "y": 2}\n')
        q = CH.apply_changes(spark, str(changes), store, str(tmp_path / "ck"))
        q.awaitTermination(60)
        (changes / "b.json").write_text('{"op": "delete", "id": 1, "x": 0, "y": 0}\n')
        q = CH.apply_changes(spark, str(changes), store, str(tmp_path / "ck"))
        q.awaitTermination(60)
        assert spark.read.parquet(store).count() == 0


class TestTwoStepSpatialJoin:
    def test_poly_roundtrip_drives_pip(self, spark):
        """C11 CLI idiom (README.md:100-110): query 1 exports a polygon with
        -f=poly; query 2 consumes it with -a=file. Round-trip the POLY text
        and verify the PIP result matches using the original ring directly."""
        from gol_tool_spark.operators import spatial_query
        from gol_tool_spark.sources import fixtures as FX

        ring = FX.POLYGONS["concave-u"]
        ring_df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(ring)], "seq int, x long, y long"
        )
        poly_text = writers.poly_format(ring_df, "region-x")      # query 1: -f=poly
        parsed = writers.parse_poly(poly_text)                     # query 2: -a=file
        assert len(parsed) == 1 and not parsed[0][1] and len(parsed[0][0]) == len(ring)
        # lon/lat 7-decimal round trip keeps vertices within a few grid units
        for (x0, y0), (x1, y1) in zip(ring, parsed[0][0]):
            assert abs(x0 - x1) <= 5000 and abs(y0 - y1) <= 5000
        pts = spark.createDataFrame(
            [(1, 1 << 26, 1 << 26), (2, 3 << 26, 1 << 28), (3, -(1 << 28), -(1 << 28))],
            "id long, x long, y long",
        )
        direct = {r.id for r in spatial_query.points_in_polygon(pts, ring).collect()}
        via_poly = {r.id for r in spatial_query.points_in_polygon(pts, parsed[0][0]).collect()}
        assert direct == via_poly == {1}

    def test_poly_hole_marker(self, spark):
        """ADVICE: '!' ring headers mark holes; poly_rings threads them into
        points_in_polygon's holes argument."""
        from gol_tool_spark.operators import spatial_query

        text = (
            "donut\n"
            "1\n"
            "   -45.0   -45.0\n   45.0   -45.0\n   45.0   45.0\n   -45.0   45.0\n"
            "END\n"
            "!hole\n"
            "   -10.0   -10.0\n   10.0   -10.0\n   10.0   10.0\n   -10.0   10.0\n"
            "END\nEND\n"
        )
        parsed = writers.parse_poly(text)
        assert [h for _, h in parsed] == [False, True]
        ext, holes = writers.poly_rings(text)
        assert len(holes) == 1
        pts = spark.createDataFrame(
            [(1, 0, 0), (2, 1 << 28, 1 << 28), (3, 3 << 29, 0)],
            "id long, x long, y long",
        )  # 1 = inside hole, 2 = in donut body (~22 deg), 3 = outside
        got = {r.id for r in spatial_query.points_in_polygon(pts, ext, holes).collect()}
        assert got == {2}


class TestGeometrySinks:
    """VERDICT round-1 item 2: non-point geometry through GeoJSON/WKT/XML
    (GeoJsonFeaturePrinter.java:101-143, WktFeaturePrinter.java,
    OsmXmlFeaturePrinter.java way/relation branches)."""

    @staticmethod
    def _coords(pts):
        return [{"seq": i, "x": x, "y": y} for i, (x, y) in enumerate(pts)]

    def test_way_linestring_and_polygon(self, spark):
        open_way = self._coords([(0, 0), (1 << 30, 0), (1 << 30, 1 << 30)])
        closed_way = self._coords([(0, 0), (1 << 30, 0), (1 << 30, 1 << 30), (0, 0)])
        df = spark.createDataFrame(
            [(1, open_way), (2, closed_way)],
            "way_id long, coords array<struct<seq:int,x:long,y:long>>",
        )
        feats = {json.loads(r.feature)["id"]: json.loads(r.feature)
                 for r in writers.geojson_way_format(df, as_area=True).collect()}
        assert feats[1]["geometry"]["type"] == "LineString"
        assert feats[2]["geometry"]["type"] == "Polygon"
        ls = feats[1]["geometry"]["coordinates"]
        assert len(ls) == 3 and ls[0] == [0, 0] and abs(ls[1][0] - 90.0) < 1e-6
        assert feats[2]["geometry"]["coordinates"][0][0] == feats[2]["geometry"]["coordinates"][0][-1]
        wkts = {i + 1: r.wkt for i, r in enumerate(writers.wkt_way_format(df, as_area=True).collect())}
        assert wkts[1].startswith("LINESTRING (") and wkts[2].startswith("POLYGON ((")

    def test_relation_multipolygon_with_hole(self, spark):
        from gol_tool_spark.operators import rings as R

        def sq(cx, cy, r):  # closed CCW square ring
            return (
                [cx - r, cx + r, cx + r, cx - r, cx - r],
                [cy - r, cy - r, cy + r, cy + r, cy - r],
            )

        big_x, big_y = sq(0, 0, 1 << 28)
        hole_x, hole_y = sq(0, 0, 1 << 26)
        far_x, far_y = sq(3 << 28, 3 << 28, 1 << 26)
        rows = [
            (7, 0, "outer", True, 5, big_x, big_y, 2.0 * (1 << 29) ** 2),
            (7, 1, "inner", True, 5, hole_x, hole_y, 2.0 * (1 << 27) ** 2),
            (7, 2, "outer", True, 5, far_x, far_y, 2.0 * (1 << 27) ** 2),
        ]
        rings_df = spark.createDataFrame(rows, R.OUT_SCHEMA)
        polys = R.polygons_of(rings_df)
        got = {(r.poly_idx, r.is_hole) for r in polys.collect()}
        assert got == {(0, False), (0, True), (1, False)}  # hole in the BIG outer
        feat = json.loads(writers.geojson_polygon_format(polys).collect()[0].feature)
        g = feat["geometry"]
        assert g["type"] == "MultiPolygon"
        assert len(g["coordinates"]) == 2
        assert len(g["coordinates"][0]) == 2  # big outer + its hole
        assert len(g["coordinates"][1]) == 1  # far outer, no hole
        wkt = writers.wkt_polygon_format(polys).collect()[0].wkt
        assert wkt.startswith("MULTIPOLYGON (((")

    def test_nested_multipolygon_hole_attaches_to_innermost(self, spark):
        """Lake (A) with island-hole (H); island outer (B) inside H with a
        pond hole (H2) inside B: H2 must attach to B (innermost shell), not
        to the bigger A that also contains its vertex."""
        from gol_tool_spark.operators import rings as R

        def sq(cx, cy, r):
            return (
                [cx - r, cx + r, cx + r, cx - r, cx - r],
                [cy - r, cy - r, cy + r, cy + r, cy - r],
            )

        ax, ay = sq(0, 0, 1 << 28)       # lake
        hx, hy = sq(0, 0, 1 << 26)       # island boundary (hole of lake)
        bx, by = sq(0, 0, (1 << 26) - 8) # island outer, just inside H
        h2x, h2y = sq(0, 0, 1 << 20)     # pond on the island
        rows = [
            (4, 0, "outer", True, 5, ax, ay, 2.0 * float(1 << 29) ** 2),
            (4, 1, "inner", True, 5, hx, hy, 2.0 * float(1 << 27) ** 2),
            (4, 2, "outer", True, 5, bx, by, 2.0 * float((1 << 27) - 16) ** 2),
            (4, 3, "inner", True, 5, h2x, h2y, 2.0 * float(1 << 21) ** 2),
        ]
        polys = R.polygons_of(spark.createDataFrame(rows, R.OUT_SCHEMA))
        got = {(r.poly_idx, r.is_hole, tuple(r.xs)[0]) for r in polys.collect()}
        # poly 0 = lake with hole H; poly 1 = island with hole H2
        assert (0, True, hx[0]) in got
        assert (1, True, h2x[0]) in got
        assert (1, False, bx[0]) in got

    def test_relation_single_polygon(self, spark):
        from gol_tool_spark.operators import rings as R

        xs = [0, 1 << 28, 1 << 28, 0, 0]
        ys = [0, 0, 1 << 28, 1 << 28, 0]
        rings_df = spark.createDataFrame(
            [(3, 0, "outer", True, 5, xs, ys, 2.0)], R.OUT_SCHEMA
        )
        feat = json.loads(
            writers.geojson_polygon_format(R.polygons_of(rings_df)).collect()[0].feature
        )
        assert feat["geometry"]["type"] == "Polygon"
        assert len(feat["geometry"]["coordinates"]) == 1

    def test_xml_way_and_relation(self, spark):
        mem = spark.createDataFrame(
            [(5, 2, 102), (5, 1, 101), (5, 3, 103)], "way_id long, seq int, node_ref long"
        )
        xml = writers.osm_xml_way_format(mem).collect()[0].xml
        assert xml.startswith('<way id="5">') and xml.endswith("</way>")
        refs = [ln for ln in xml.splitlines() if "<nd" in ln]
        assert refs == ['  <nd ref="101"/>', '  <nd ref="102"/>', '  <nd ref="103"/>']
        members = spark.createDataFrame(
            [(9, 1, "way", 5, "outer"), (9, 0, "node", 42, None)],
            "rel_id long, seq int, mtype string, ref long, role string",
        )
        xml = writers.osm_xml_relation_format(members).collect()[0].xml
        lines = [ln for ln in xml.splitlines() if "<member" in ln]
        assert lines == [
            '  <member type="node" ref="42" role=""/>',
            '  <member type="way" ref="5" role="outer"/>',
        ]


class TestPolyHoleRoundTrip:
    def test_relation_rings_to_poly_to_pip(self, spark):
        """C11 with holes end-to-end: relation rings -> POLY text ('!'
        markers) -> parse -> points_in_polygon(exterior, holes) matches the
        direct evaluation."""
        from gol_tool_spark.operators import rings as R
        from gol_tool_spark.operators import spatial_query

        def sq(cx, cy, r):
            return (
                [cx - r, cx + r, cx + r, cx - r, cx - r],
                [cy - r, cy - r, cy + r, cy + r, cy - r],
            )

        ox, oy = sq(0, 0, 1 << 28)
        hx, hy = sq(0, 0, 1 << 26)
        rows = [
            (1, 0, "outer", True, 5, ox, oy, 2.0 * float(1 << 29) ** 2),
            (1, 1, "inner", True, 5, hx, hy, 2.0 * float(1 << 27) ** 2),
        ]
        polys = R.polygons_of(spark.createDataFrame(rows, R.OUT_SCHEMA))
        text = writers.poly_format_rings(polys, "donut")
        assert "!2" in text  # hole marker emitted
        ext, holes = writers.poly_rings(text)
        assert len(holes) == 1
        pts = spark.createDataFrame(
            [(1, 0, 0), (2, 1 << 27, 1 << 27), (3, 1 << 30, 0)],
            "id long, x long, y long",
        )  # 1 in hole, 2 in body, 3 outside
        got = {r.id for r in spatial_query.points_in_polygon(pts, ext, holes).collect()}
        direct = {
            r.id
            for r in spatial_query.points_in_polygon(
                pts, list(zip(ox, oy)), [list(zip(hx, hy))]
            ).collect()
        }
        assert got == direct == {2}


class TestSessionWindows:
    def test_gap_splits_sessions(self, spark, tmp_path):
        from gol_tool_spark.streaming import windowed

        src = tmp_path / "sev"
        src.mkdir()
        (src / "e.json").write_text(
            '{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":1,"event_type":"c","value":1.0}\n'
            '{"event_id":2,"ts":"2024-01-01T00:10:00Z","user_id":1,"event_type":"c","value":1.0}\n'
            '{"event_id":3,"ts":"2024-01-01T02:00:00Z","user_id":1,"event_type":"c","value":1.0}\n'
            '{"event_id":4,"ts":"2024-01-01T00:05:00Z","user_id":2,"event_type":"c","value":1.0}\n'
        )
        q = windowed.run_sessions_to_memory(spark, str(src), name="sess1")
        q.awaitTermination(90)
        rows = spark.sql("SELECT * FROM sess1").collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r.n_events)
        assert sorted(by_user[1]) == [1, 2]  # two sessions: events 1+2, then 3
        assert by_user[2] == [1]


class TestCompileBatches:
    """Per-tile checkpointed compile (BuildConfig.compile_batches > 1):
    kill-mid-compile resumes at the first unfinished batch, upstream
    re-runs invalidate every batch, and the batched store is row-for-row
    identical to the whole-stage store."""

    @pytest.fixture()
    def cfg(self, tmp_path, sf_dir):
        return BP.BuildConfig(out_dir=str(tmp_path / "golb"), sf_dir=sf_dir,
                              max_tiles=30, min_density=20, salt_threshold=100,
                              compile_batches=3)

    def _store_rows(self, spark, out_dir):
        df = spark.read.parquet(os.path.join(out_dir, "compile"))
        return sorted(
            (r.id, r.pile, r.keybits)
            for r in df.select("id", "pile", "keybits").collect()
        )

    def test_batched_equals_whole_stage(self, spark, cfg, tmp_path, sf_dir):
        m = BP.run_build(spark, cfg)
        assert m["compile"]["compile_batches"] == 3
        ran = [b for b in m["compile"]["batches"] if not b["skipped"]]
        assert len(ran) >= 2  # >=2 non-empty batches at 30 piles
        whole = BP.BuildConfig(out_dir=str(tmp_path / "golw"), sf_dir=sf_dir,
                               max_tiles=30, min_density=20, salt_threshold=100)
        BP.run_build(spark, whole)
        assert self._store_rows(spark, cfg.out_dir) == \
            self._store_rows(spark, whole.out_dir)

    def test_kill_mid_compile_resumes_remaining_batches(
            self, spark, cfg, monkeypatch):
        real = BP._compile_batch
        calls = []

        def dying(spark_, c, b, piles, fp):
            if len(calls) == 1:
                raise RuntimeError("simulated executor loss mid-compile")
            calls.append(b)
            return real(spark_, c, b, piles, fp)

        monkeypatch.setattr(BP, "_compile_batch", dying)
        with pytest.raises(RuntimeError, match="mid-compile"):
            BP.run_build(spark, cfg)
        # batch 0 committed, stage manifest absent -> stage not done
        assert os.path.exists(BP._batch_manifest_path(cfg, calls[0]))
        assert not os.path.exists(BP._manifest_path(cfg, "compile"))
        monkeypatch.setattr(BP, "_compile_batch", real)
        m = BP.run_build(spark, cfg)
        done = {b["batch"]: b["skipped"] for b in m["compile"]["batches"]}
        assert done[calls[0]] is True          # committed batch NOT re-run
        assert sum(not s for s in done.values()) >= 1  # the rest ran
        # resumed store is complete: every sorted row reached compile
        assert m["compile"]["rows"] == m["sort"]["rows"]

    def test_upstream_rerun_invalidates_batches(self, spark, cfg):
        BP.run_build(spark, cfg)
        m = BP.run_build(spark, cfg, force_from="sort")
        # sort manifest changed -> fingerprint moved -> no batch skipped
        assert all(not b["skipped"] for b in m["compile"]["batches"])
        assert m["compile"]["rows"] == m["sort"]["rows"]

    def test_batch_manifest_lineage(self, spark, cfg):
        BP.run_build(spark, cfg)
        with open(BP._batch_manifest_path(cfg, 0)) as fh:
            bm = json.load(fh)
        assert bm["rows"] == sum(f["rows"] for f in bm["files"]) > 0
        assert all(f["file"].startswith("pile=") for f in bm["files"])
        # batch piles are disjoint and cover the catalog
        seen = []
        b = 0
        while os.path.exists(BP._batch_manifest_path(cfg, b)):
            with open(BP._batch_manifest_path(cfg, b)) as fh:
                seen.extend(json.load(fh)["piles"])
            b += 1
        assert len(seen) == len(set(seen))


class TestStreamingTrips:
    def test_gap_split_and_timeout_flush(self, spark, tmp_path):
        import json
        import time

        from gol_tool_spark.streaming import trips

        src = tmp_path / "fixes"
        ckpt = str(tmp_path / "tck")
        out = str(tmp_path / "tout")
        src.mkdir()
        rows1 = [
            dict(user_id=1, event_id=1, ws=1000, x=0, y=0),
            dict(user_id=1, event_id=2, ws=1010, x=10, y=5),
            dict(user_id=1, event_id=3, ws=3000, x=100, y=100),  # >900s gap
            dict(user_id=2, event_id=4, ws=1000, x=0, y=0),
        ]
        (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))
        q = trips.run_trips(spark, str(src), ckpt, out, gap_s=900, timeout_ms=1000)
        q.awaitTermination(90)
        got1 = [tuple(r) for r in spark.read.parquet(out).collect()]
        # the gap-closed trip is exact (2 fixes, L1 odometer 15); open
        # trips may or may not have timed out yet (timing-dependent)
        assert (1, 1000, 1010, 2, 15, "gap") in got1
        assert all(g[5] in ("gap", "timeout") for g in got1)

        time.sleep(2.5)  # expire all processing-time deadlines
        (src / "b2.json").write_text(
            json.dumps(dict(user_id=3, event_id=5, ws=5000, x=0, y=0)))
        q = trips.run_trips(spark, str(src), ckpt, out, gap_s=900, timeout_ms=1000)
        q.awaitTermination(90)
        got2 = [tuple(r) for r in spark.read.parquet(out).collect()]
        timeouts = [g for g in got2 if g[5] == "timeout"]
        # the silent entities' final trips flushed by timeout —
        # exactly once each (state.remove() makes the flush idempotent)
        assert sorted(t[0] for t in timeouts if t[0] in (1, 2)) == [1, 2]
        assert (1, 3000, 3000, 1, 0, "timeout") in got2
        assert (2, 1000, 1000, 1, 0, "timeout") in got2
        per_user_timeout = {}
        for g in timeouts:
            per_user_timeout[g[0]] = per_user_timeout.get(g[0], 0) + 1
        assert all(v == 1 for v in per_user_timeout.values())
        # the gap trip did not re-emit on restart
        assert sum(1 for g in got2 if g[5] == "gap") == 1
