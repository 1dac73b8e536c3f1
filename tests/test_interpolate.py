"""IDW grid interpolation vs a numpy twin (same cell blocking, same
modified-IDW weights), plus plan-shape guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import interpolate


def _twin(rows, zoom):
    s = 32 - zoom
    half, hc = 1 << 31, 1 << (s - 1)
    cells = {}
    for pid, x, y, v in rows:
        cells.setdefault(((x + half) >> s, (y + half) >> s), []).append((pid, x, y, v))
    out = {}
    for (cx, cy) in cells:
        ctr_x = cx * (1 << s) - half + hc
        ctr_y = cy * (1 << s) - half + hc
        nb = []
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                nb.extend(cells.get((cx + ox, cy + oy), []))
        nb.sort()
        sw = swv = 0.0
        for pid, x, y, v in nb:
            dx, dy = float(x - ctr_x), float(y - ctr_y)
            w = 1.0 / (1.0 + (dx * dx + dy * dy))
            sw += w
            swv += w * v
        out[(cx, cy)] = (len(nb), round(swv / sw * 1e6))
    return out


class TestIdwGrid:
    def _run(self, spark, rows, zoom):
        df = spark.createDataFrame(rows, "id long, x long, y long, qty double")
        got = {
            (r.cx, r.cy): (r.n_pts, r.idw_q)
            for r in interpolate.idw_grid(df, value_col="qty", zoom=zoom).collect()
        }
        return got

    def test_matches_numpy_twin(self, spark):
        rng = np.random.default_rng(3)
        n = 3000
        rows = [
            (i, int(rng.integers(-(1 << 31) + 1, (1 << 31) - 1)),
             int(rng.integers(-(1 << 30), 1 << 30)), float(rng.integers(1, 50)))
            for i in range(n)
        ]
        for zoom in (7, 9):
            assert self._run(spark, rows, zoom) == _twin(rows, zoom), zoom

    def test_single_point_cell_weights_collapse(self, spark):
        # lone point far from everything: idw == its own value
        rows = [(1, 0, 0, 42.0)]
        got = self._run(spark, rows, 7)
        ((cell, (n, q)),) = got.items()
        assert n == 1 and q == 42_000_000

    def test_zoom_guard(self, spark):
        df = spark.createDataFrame([(1, 0, 0, 1.0)], "id long, x long, y long, qty double")
        with pytest.raises(ValueError, match="zoom >= 7"):
            interpolate.idw_grid(df, zoom=5)

    def test_plan_no_cartesian_no_python(self, spark):
        df = spark.createDataFrame([(1, 0, 0, 1.0)], "id long, x long, y long, qty double")
        plan = interpolate.idw_grid(df)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert "CartesianProduct" not in plan
        for node in ("BatchEvalPython", "ArrowEval", "MapInPandas", "FlatMapGroupsInPandas"):
            assert node not in plan, node
