"""Invariant tests for cell_churn and pyramid_update (two-epoch wave)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.kernels import image as IMG
from gol_tool_spark.operators import geostats, multimodal

HALF = 1 << 31


def _xy(spark, pts):
    return spark.createDataFrame(pts, "x long, y long")


class TestCellChurn:
    SHIFT = 30

    def _pt(self, cx, cy, k=0):
        return ((cx << self.SHIFT) - HALF + k, (cy << self.SHIFT) - HALF + k)

    def test_loop_twin(self, spark):
        before = [self._pt(0, 0), self._pt(0, 0, 1), self._pt(1, 1), self._pt(2, 2)]
        after = [self._pt(0, 0), self._pt(1, 1), self._pt(1, 1, 3), self._pt(3, 0)]
        out = {
            (r.cx, r.cy): (r.c_before, r.c_after, r.delta)
            for r in geostats.cell_churn(
                _xy(spark, before), _xy(spark, after), cell_shift=self.SHIFT
            ).collect()
        }
        assert out == {
            (0, 0): (2, 1, -1),   # one vanished
            (1, 1): (1, 2, 1),    # one appeared
            (2, 2): (1, 0, -1),   # cell emptied
            (3, 0): (0, 1, 1),    # cell born
        }

    def test_identical_epochs_empty(self, spark):
        pts = [self._pt(0, 0), self._pt(5, 5)]
        assert geostats.cell_churn(
            _xy(spark, pts), _xy(spark, pts), cell_shift=self.SHIFT
        ).count() == 0

    def test_mass_balance(self, spark, sf_dir):
        # sum(delta) == |after| - |before| exactly
        from gol_tool_spark.functions import synth

        pts = synth.points_df(spark, sf_dir).select("x", "y")
        after = pts.limit(0)  # everything deleted
        out = geostats.cell_churn(pts, after, cell_shift=26)
        assert out.agg(F.sum("delta")).first()[0] == -pts.count()


def _tile(zoom, row, col):
    return zoom * (1 << 24) + row * 4096 + col


def _raster_df(spark, tiles, grid):
    rows = []
    for tile, arr in tiles.items():
        rgb = np.repeat(arr.astype(np.uint8)[:, :, None], 3, axis=2)
        rows.append((tile, bytearray(IMG.encode(rgb, "png")),
                     int((arr > 0).sum()), int(arr.sum())))
    return spark.createDataFrame(rows, "tile long, png binary, filled long, px_sum long")


class TestPyramidUpdate:
    GRID = 8

    def _two_parent_level(self, spark):
        g = self.GRID
        rng = np.random.RandomState(3)
        tiles = {}
        # parent (3,0,0): children rows 0-1, cols 0-1; parent (3,0,1): cols 2-3
        for r in range(2):
            for c in range(4):
                tiles[_tile(4, r, c)] = rng.randint(0, 256, (g, g))
        return tiles, _raster_df(spark, tiles, g)

    def test_partial_matches_full(self, spark):
        tiles, rasters = self._two_parent_level(spark)
        dirty = spark.createDataFrame([(_tile(4, 1, 0),)], "tile long")
        upd = multimodal.pyramid_update(rasters, dirty, zoom=4, grid=self.GRID).collect()
        assert [r.tile for r in upd] == [_tile(3, 0, 0)]  # only the touched parent
        full = {
            r.tile: r
            for r in multimodal.pyramid_rollup(rasters, zoom=4, grid=self.GRID).collect()
        }
        f = full[_tile(3, 0, 0)]
        u = upd[0]
        assert (u.filled, u.px_sum) == (f.filled, f.px_sum)
        assert bytes(u.png) == bytes(f.png)

    def test_empty_dirty_empty_output(self, spark):
        _, rasters = self._two_parent_level(spark)
        dirty = spark.createDataFrame([], "tile long")
        assert multimodal.pyramid_update(rasters, dirty, zoom=4, grid=self.GRID).count() == 0

    def test_dirty_both_parents_covers_level(self, spark):
        _, rasters = self._two_parent_level(spark)
        dirty = spark.createDataFrame(
            [(_tile(4, 0, 1),), (_tile(4, 1, 3),)], "tile long"
        )
        upd = multimodal.pyramid_update(rasters, dirty, zoom=4, grid=self.GRID)
        assert sorted(r.tile for r in upd.collect()) == [_tile(3, 0, 0), _tile(3, 0, 1)]
