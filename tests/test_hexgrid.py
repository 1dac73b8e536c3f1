"""Hex cell index: Voronoi property, twin agreement, rollup conservation."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import hexgrid as H


def _centers_np(q, r, size):
    cx = size * (H.SQRT3 * q.astype(np.float64) + H.SQRT3_2 * r.astype(np.float64))
    cy = size * (1.5 * r.astype(np.float64))
    return cx, cy


class TestHexMath:
    def test_center_roundtrip_all_cells(self):
        # the center of every cell in a block must assign back to that cell
        size = H.cell_size(6)
        q, r = np.meshgrid(np.arange(-40, 41), np.arange(-40, 41))
        q, r = q.ravel(), r.ravel()
        cx, cy = _centers_np(q, r, size)
        q2, r2 = H.axial_np(cx, cy, size)
        assert (q2 == q).all() and (r2 == r).all()

    def test_voronoi_nearest_center(self):
        # hex rounding must assign every point to the NEAREST cell center —
        # brute-force check against the 5x5 candidate neighborhood
        rng = np.random.default_rng(7)
        size = H.cell_size(8)
        x = rng.integers(-(1 << 30), 1 << 30, 2000)
        y = rng.integers(-(1 << 30), 1 << 30, 2000)
        q, r = H.axial_np(x, y, size)
        cx, cy = _centers_np(q, r, size)
        d_assigned = (x - cx) ** 2 + (y - cy) ** 2
        for dq in range(-2, 3):
            for dr in range(-2, 3):
                ox, oy = _centers_np(q + dq, r + dr, size)
                d_other = (x - ox) ** 2 + (y - oy) ** 2
                assert (d_assigned <= d_other + 1e-6).all()

    def test_id_encode_decode(self):
        for res, q, r in [(0, 0, 0), (6, -123, 456), (20, -(1 << 23), (1 << 23))]:
            hid = res * (1 << 52) + (q + H.OFF) * (1 << 26) + (r + H.OFF)
            assert H.decode_hex_id(hid) == (res, q, r)

    def test_res_bounds(self):
        with pytest.raises(ValueError):
            H.cell_size(21)
        with pytest.raises(ValueError):
            H.cell_size(-1)


class TestHexSpark:
    def test_spark_matches_numpy_twin(self, spark):
        rng = np.random.default_rng(11)
        xs = rng.integers(-(1 << 31), 1 << 31, 3000).tolist()
        ys = rng.integers(-(1 << 31), 1 << 31, 3000).tolist()
        df = spark.createDataFrame(
            [(i, int(xs[i]), int(ys[i])) for i in range(3000)], "id long, x long, y long"
        )
        got = H.assign_hex(df, 7).orderBy("id").select("hex_q", "hex_r").collect()
        q_np, r_np = H.axial_np(np.array(xs), np.array(ys), H.cell_size(7))
        assert [r.hex_q for r in got] == q_np.tolist()
        assert [r.hex_r for r in got] == r_np.tolist()

    def test_sql_twin_matches_spark(self, spark):
        rng = np.random.default_rng(12)
        xs = rng.integers(-(1 << 31), 1 << 31, 2000)
        ys = rng.integers(-(1 << 31), 1 << 31, 2000)
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long"
        )
        s = H.cell_size(9)
        got = set(
            (r.hex_q, r.hex_r)
            for r in H.assign_hex(df, 9).select("x", "hex_q", "hex_r").collect()
        )
        con = duckdb.connect()
        con.register("pts", df.toPandas())
        q_sql, r_sql = H.axial_sql("x", "y", s)
        oracle = set(
            map(tuple, con.execute(f"SELECT {q_sql}, {r_sql} FROM pts").fetchall())
        )
        assert got == oracle

    def test_density_partitions_input(self, spark, sf_dir):
        from gol_tool_spark.functions import synth

        pts = synth.points_df(spark, sf_dir)
        n = pts.count()
        dens = H.hex_density(pts, 6)
        assert dens.agg(F.sum("cnt")).collect()[0][0] == n
        # ids decode back to res 6 and the stored q/r
        row = dens.first()
        assert H.decode_hex_id(row.hex_id) == (6, row.hex_q, row.hex_r)

    def test_rollup_conserves_counts_and_bounds_fanin(self, spark, sf_dir):
        from gol_tool_spark.functions import synth

        pts = synth.points_df(spark, sf_dir)
        dens6 = H.hex_density(pts, 6)
        dens5 = H.hex_rollup(dens6, 6)
        assert (
            dens5.agg(F.sum("cnt")).collect()[0][0]
            == dens6.agg(F.sum("cnt")).collect()[0][0]
        )
        # aperture-4 center containment: a parent absorbs at most ~7 children
        fanin = (
            H.assign_hex(
                dens6.select(
                    *H.center_cols(F.col("hex_q"), F.col("hex_r"), H.cell_size(6))
                ).toDF("x", "y"),
                5,
            )
            .groupBy("hex_q", "hex_r")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert fanin <= 7
