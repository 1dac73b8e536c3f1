"""Brute-twin + invariant tests for nearest_seed and pyramid_rollup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.kernels import image as IMG
from gol_tool_spark.operators import multimodal, spatial_query


class TestNearestSeed:
    SEEDS = [(1, 0, 0), (2, 1000, 0), (3, -500, 800), (4, 2**30, -(2**30))]

    def test_brute_twin(self, spark):
        rows = [(i, (i * 48271) % 4001 - 2000, (i * 69621) % 4001 - 2000)
                for i in range(300)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        out = {r.id: r for r in spatial_query.nearest_seed(df, self.SEEDS).collect()}
        for i, x, y in rows:
            best = min(
                ((x - sx) ** 2 + (y - sy) ** 2, sid) for sid, sx, sy in self.SEEDS
            )
            assert (out[i].seed, int(out[i].d2)) == (best[1], best[0])

    def test_tie_breaks_to_smallest_seed(self, spark):
        # equidistant between seeds 1 (0,0) and 2 (1000,0): x=500
        df = spark.createDataFrame([(9, 500, 0)], "id long, x long, y long")
        r = spatial_query.nearest_seed(df, self.SEEDS).collect()[0]
        assert r.seed == 1 and int(r.d2) == 250000

    def test_full_plane_decimal_lane(self, spark):
        c = (1 << 31) - 1
        df = spark.createDataFrame([(1, -c - 1, -c - 1)], "id long, x long, y long")
        r = spatial_query.nearest_seed(df, [(7, c, c)]).collect()[0]
        assert int(r.d2) == 2 * ((1 << 32) - 1) ** 2

    def test_empty_seeds_raises(self, spark):
        df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
        with pytest.raises(ValueError):
            spatial_query.nearest_seed(df, [])

    def test_no_shuffle_plan(self, spark):
        # the whole argmin is one projection: no Exchange in the plan
        df = spark.createDataFrame([(1, 5, 5)], "id long, x long, y long")
        plan = spatial_query.nearest_seed(df, self.SEEDS)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


def _raster_df(spark, tiles):
    """Build a density_raster-shaped frame from {tile: grid x grid array}."""
    rows = []
    for tile, arr in tiles.items():
        rgb = np.repeat(arr.astype(np.uint8)[:, :, None], 3, axis=2)
        rows.append((tile, bytearray(IMG.encode(rgb, "png")),
                     int((arr > 0).sum()), int(arr.sum())))
    return spark.createDataFrame(rows, "tile long, png binary, filled long, px_sum long")


def _tile(zoom, row, col):
    return zoom * (1 << 24) + row * 4096 + col


class TestPyramidRollup:
    GRID = 8

    def test_four_children_loop_twin(self, spark):
        rng = np.random.RandomState(11)
        g = self.GRID
        kids = {}
        for qy in (0, 1):
            for qx in (0, 1):
                kids[_tile(4, 2 + qy, 6 + qx)] = rng.randint(0, 256, (g, g))
        out = multimodal.pyramid_rollup(_raster_df(spark, kids), zoom=4, grid=g).collect()
        assert len(out) == 1 and out[0].tile == _tile(3, 1, 3)
        mosaic = np.zeros((2 * g, 2 * g), np.int64)
        for qy in (0, 1):
            for qx in (0, 1):
                mosaic[qy * g:(qy + 1) * g, qx * g:(qx + 1) * g] = kids[_tile(4, 2 + qy, 6 + qx)]
        pooled = (mosaic[0::2, 0::2] + mosaic[0::2, 1::2]
                  + mosaic[1::2, 0::2] + mosaic[1::2, 1::2]) // 4
        assert out[0].px_sum == pooled.sum()
        assert out[0].filled == (pooled > 0).sum()
        dec = IMG.decode(bytes(out[0].png), g, g, "png")[:, :, 0]
        assert np.array_equal(dec, pooled.astype(np.uint8))

    def test_missing_children_are_zero(self, spark):
        g = self.GRID
        arr = np.full((g, g), 200, np.int64)
        # single child in the SE quadrant of parent (3, 0, 0)
        out = multimodal.pyramid_rollup(
            _raster_df(spark, {_tile(4, 1, 1): arr}), zoom=4, grid=g
        ).collect()[0]
        assert out.tile == _tile(3, 0, 0)
        # pooled SE quadrant = 200 (4 equal pixels), rest 0
        assert out.px_sum == 200 * (g // 2) ** 2
        assert out.filled == (g // 2) ** 2

    def test_two_level_chain_mass(self, spark):
        # uniform value divisible by 16 -> two pooling levels are exact,
        # total mass shrinks by exactly 4x per level (4x fewer pixels)
        g = self.GRID
        kids = {
            _tile(4, r, c): np.full((g, g), 64, np.int64)
            for r in range(2)
            for c in range(2)
        }
        l3 = multimodal.pyramid_rollup(_raster_df(spark, kids), zoom=4, grid=g)
        l2 = multimodal.pyramid_rollup(l3, zoom=3, grid=g)
        r3 = l3.agg(F.sum("px_sum")).first()[0]
        r2 = l2.agg(F.sum("px_sum")).first()[0]
        assert r3 == 4 * g * g * 64 // 4
        assert r2 == r3 // 4
