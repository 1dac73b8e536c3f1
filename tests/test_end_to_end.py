"""The whole-engine user story — what a gol-tool user does in a session,
end to end on this engine:

  gol build            -> run_build (resumable, lineage manifests)
  gol save             -> save_tileset (checksummed manifest)
  gol load URL         -> load_tileset over HTTP (incremental fetch)
  gol info             -> store_info (footer-only report)
  gol query -b -f=...  -> query_store (bucket pruning + pushdown) + sinks
  gol update           -> apply_changes (partition-scoped merge)
  re-query             -> changes visible, untouched piles untouched
"""

from __future__ import annotations

import functools
import http.server
import json
import os
import threading

from pyspark.sql import functions as F

from gol_tool_spark.plans import build_pipeline as BP
from gol_tool_spark.plans import info as INFO
from gol_tool_spark.plans import tileset as TS
from gol_tool_spark.sinks import writers
from gol_tool_spark.streaming import changes as CH


def test_full_user_story(spark, tmp_path, sf_dir):
    # 1. build
    cfg = BP.BuildConfig(out_dir=str(tmp_path / "gol"), sf_dir=sf_dir,
                         max_tiles=30, min_density=20)
    manifests = BP.run_build(spark, cfg)
    store = os.path.join(cfg.out_dir, "compile")
    assert manifests["compile"]["rows"] > 0

    # 2. save -> 3. load over HTTP into a second machine's store
    ts = str(tmp_path / "tileset")
    TS.save_tileset(store, ts)
    handler = functools.partial(http.server.SimpleHTTPRequestHandler, directory=ts)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        store2 = str(tmp_path / "mirror")
        rep = TS.load_tileset(f"http://127.0.0.1:{srv.server_address[1]}", store2)
        assert rep["loaded"] and not rep["skipped"]
    finally:
        srv.shutdown()

    # 4. info on the mirror
    report = INFO.store_info(store2, tileset_dir=ts)
    assert report["rows"] == manifests["compile"]["rows"]
    assert report["keybits"]

    # 5. query the mirror: tag + bbox through the pruning stack, then export
    q = BP.query_store(
        spark, store2, "n[highway]", cfg.indexed_keys,
        bbox=(-(1 << 30), -(1 << 30), 1 << 30, 1 << 30),
    )
    n_q = q.count()
    assert n_q > 0
    feats = writers.geojson_format(q.select("id", "x", "y"), id_col="id").limit(5).collect()
    assert all(json.loads(r.feature)["geometry"]["type"] == "Point" for r in feats)

    # 6. update: move one feature out of the bbox, delete another, add one
    rows = q.select("id").orderBy("id").limit(2).collect()
    moved, deleted = rows[0].id, rows[1].id
    changes = tmp_path / "deltas"
    changes.mkdir()
    (changes / "d.json").write_text(
        '{"op": "upsert", "id": %d, "x": %d, "y": %d, "seq": 1}\n'
        '{"op": "delete", "id": %d, "x": 0, "y": 0, "seq": 1}\n'
        '{"op": "upsert", "id": 900000001, "x": 123, "y": 456, "seq": 1}\n'
        % (moved, (1 << 30) + (1 << 27), 1 << 27, deleted)
    )
    upd_store = str(tmp_path / "upd")
    CH.write_store(
        spark.read.parquet(store2).select("id", "x", "y"), upd_store
    )
    q2 = CH.apply_changes(spark, str(changes), upd_store, str(tmp_path / "ck"))
    q2.awaitTermination(120)

    # 7. re-query: delete gone, move visible, insert present
    after = spark.read.parquet(upd_store)
    assert after.filter(F.col("id") == deleted).count() == 0
    got = after.filter(F.col("id") == moved).collect()
    assert len(got) == 1 and got[0].x == (1 << 30) + (1 << 27)
    assert after.filter(F.col("id") == 900000001).count() == 1
    # total count: -1 delete +1 insert = unchanged
    assert after.count() == report["rows"]
