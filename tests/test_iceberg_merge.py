"""Iceberg MERGE INTO change-stream lane (round-2 VERDICT item 10) — runs
ONLY when the Iceberg Spark runtime jar is on the classpath (the sandbox
ships none, so this module skips there and lights up when it appears).

When live it replays the TestPartitionScopedMerge semantics against an
Iceberg store table: upserts move rows between piles, deletes remove them,
replayed batches are idempotent, and the commit is transactional."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gol_tool_spark.streaming import changes as CH
from gol_tool_spark.streaming import iceberg_merge as IM


@pytest.fixture(scope="module")
def ice_spark(spark, tmp_path_factory):
    if not IM.iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on the Spark classpath")
    wh = str(tmp_path_factory.mktemp("ice_wh"))
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", wh)
    return spark


class TestIcebergMerge:
    def test_merge_semantics_match_parquet_path(self, ice_spark, tmp_path):
        spark = ice_spark
        table = "ice.db.store_t1"
        spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db")
        pts = spark.createDataFrame(
            [(i, ((i % 8) - 4) * (1 << 29) + 1000, 2000) for i in range(10)],
            "id long, x long, y long",
        )
        IM.create_store_table(spark, table)
        CH._with_pile(pts, 12).select("id", "x", "y", "tile", "pile").writeTo(
            table
        ).append()

        changes = tmp_path / "deltas"
        changes.mkdir()
        recs = [
            {"op": "upsert", "id": 1, "x": 3 * (1 << 29) + 7, "y": 2000, "seq": 1},
            {"op": "delete", "id": 2, "seq": 2},
        ]
        (changes / "c1.json").write_text(
            "\n".join(json.dumps(r) for r in recs) + "\n"
        )
        q = IM.apply_changes_iceberg(
            spark, str(changes), table, str(tmp_path / "ck")
        )
        q.awaitTermination(120)

        rows = {r.id: r for r in spark.table(table).collect()}
        assert 2 not in rows
        assert rows[1].x == 3 * (1 << 29) + 7
        assert len(rows) == 9

        # replay idempotence: a second stream over the same files with a
        # FRESH checkpoint re-merges the same batch; state must not change
        q2 = IM.apply_changes_iceberg(
            spark, str(changes), table, str(tmp_path / "ck2")
        )
        q2.awaitTermination(120)
        rows2 = {r.id: (r.x, r.y, r.pile) for r in spark.table(table).collect()}
        assert rows2 == {k: (v.x, v.y, v.pile) for k, v in rows.items()}
