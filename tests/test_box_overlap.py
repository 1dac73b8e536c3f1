"""box_overlap_join vs a numpy all-pairs oracle: random boxes at several
zooms (cells-per-box from <1 to many), closed-boundary touching, identical
boxes, negative coords, multi-cell spans, and the two-table variant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import spatial_query


def _boxes(spark, seed, n, span=1 << 28, wmax=1 << 24):
    rng = np.random.default_rng(seed)
    x = rng.integers(-span, span, n)
    y = rng.integers(-span, span, n)
    w = rng.integers(0, wmax, n)
    h = rng.integers(0, wmax, n)
    pdf = pd.DataFrame(
        {"id": np.arange(n), "minx": x, "miny": y, "maxx": x + w, "maxy": y + h}
    )
    return pdf, spark.createDataFrame(pdf)


def _brute(a: pd.DataFrame, b: pd.DataFrame | None = None, ordered=False):
    bb = a if b is None else b
    out = set()
    for ra in a.itertuples():
        for rb in bb.itertuples():
            if b is None and not (ra.id < rb.id):
                continue
            if (
                ra.minx <= rb.maxx and rb.minx <= ra.maxx
                and ra.miny <= rb.maxy and rb.miny <= ra.maxy
            ):
                out.add((ra.id, rb.id))
    return out


class TestBoxOverlapJoin:
    @pytest.mark.parametrize("zoom", [4, 8, 12])
    def test_self_join_matches_bruteforce(self, spark, zoom):
        pdf, sdf = _boxes(spark, 31, 120)
        got = {(r["id_a"], r["id_b"]) for r in
               spatial_query.box_overlap_join(sdf, zoom=zoom).collect()}
        assert got == _brute(pdf)

    def test_two_table_variant(self, spark):
        pa, sa = _boxes(spark, 41, 80)
        pb, sb = _boxes(spark, 42, 90)
        got = {(r["id_a"], r["id_b"]) for r in
               spatial_query.box_overlap_join(sa, zoom=8, other=sb).collect()}
        assert got == _brute(pa, pb)

    def test_touching_edges_count_as_overlap(self, spark):
        pdf = pd.DataFrame(
            {
                "id": [1, 2, 3],
                "minx": [0, 100, 101],
                "miny": [0, 0, 0],
                "maxx": [100, 200, 300],
                "maxy": [100, 100, 100],
            }
        )
        got = {(r["id_a"], r["id_b"]) for r in
               spatial_query.box_overlap_join(spark.createDataFrame(pdf), zoom=8).collect()}
        # 1-2 share the x=100 edge (closed boxes); 1-3 are 1 unit apart
        assert got == {(1, 2), (2, 3)}

    def test_identical_and_nested_boxes_once(self, spark):
        pdf = pd.DataFrame(
            {
                "id": [1, 2, 3],
                "minx": [-(1 << 26), -(1 << 26), -1000],
                "miny": [-(1 << 26), -(1 << 26), -1000],
                "maxx": [1 << 26, 1 << 26, 1000],
                "maxy": [1 << 26, 1 << 26, 1000],
            }
        )
        rows = spatial_query.box_overlap_join(spark.createDataFrame(pdf), zoom=6).collect()
        pairs = sorted((r["id_a"], r["id_b"]) for r in rows)
        # each intersecting pair EXACTLY once despite multi-cell covers
        assert pairs == [(1, 2), (1, 3), (2, 3)]

    def test_hot_cluster_density(self, spark):
        # many boxes in one cell + a few spanning dozens: the skew shape
        pdf, sdf = _boxes(spark, 51, 150, span=1 << 22, wmax=1 << 20)
        got = {(r["id_a"], r["id_b"]) for r in
               spatial_query.box_overlap_join(sdf, zoom=10).collect()}
        assert got == _brute(pdf)


from gol_tool_spark.operators import spatial_query as gol_sq


class TestRadiusQuery:
    """Geodesic disc query: the conservative prefilter never clips the
    exact result, the exact residual matches numpy haversine, and the
    range predicate reaches a stored scan."""

    def _brute(self, rows, cx, cy, r):
        import numpy as np

        SQ = gol_sq  # alias set at module import below
        g, tp = 4294967296.0, 2 * np.pi
        x = np.array([p[1] for p in rows], dtype=np.float64)
        y = np.array([p[2] for p in rows], dtype=np.float64)
        lat = np.arctan(np.sinh(y / g * tp))
        lon = x / g * tp
        lat_c = np.arctan(np.sinh(cy / g * tp))
        lon_c = cx / g * tp
        a = np.sin((lat - lat_c) / 2) ** 2 + np.cos(lat) * np.cos(lat_c) * np.sin((lon - lon_c) / 2) ** 2
        d = 2 * SQ.EARTH_R * np.arcsin(np.sqrt(a))
        return {rows[i][0] for i in np.nonzero(d <= r)[0]}

    def test_matches_numpy_brute_force(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        n = 4000
        xs = rng.integers(-(1 << 31) + 1, (1 << 31) - 1, n)
        ys = rng.integers(-(1 << 30), (1 << 30), n)
        rows = [(i, int(xs[i]), int(ys[i])) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        for cx, cy, r in [(0, 0, 2_000_000.0), (1 << 30, -(1 << 29), 800_000.0)]:
            got = {r_.id for r_ in gol_sq.radius_query_m(df, cx, cy, r).collect()}
            assert got == self._brute(rows, cx, cy, r), (cx, cy, r)

    def test_high_latitude_meridian_convergence(self, spark):
        # near-pole disc: lon span in grid units far exceeds the naive
        # equator conversion; a prefilter without the cos(lat_far)
        # correction would clip these
        import numpy as np

        cy = int(4294967296.0 / (2 * np.pi) * np.arcsinh(np.tan(np.radians(84.0))))
        rows = [(i, int(i * 3e7 - 1.5e9), cy + (i % 7) * 1000) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        got = {r_.id for r_ in gol_sq.radius_query_m(df, 0, cy, 500_000.0).collect()}
        assert got == self._brute(rows, 0, cy, 500_000.0)
        assert got  # non-degenerate

    def test_prefilter_bounds_contain_disc(self):
        import math

        for cx, cy, r in [(0, 0, 1e6), (-1500000000, -1500000000, 3e5),
                          (2**30, 2**31 - 10_000_000, 2e6)]:
            w, s, e, n = gol_sq.radius_prefilter_bounds(cx, cy, r)
            assert w <= cx <= e and s <= cy <= n
            # the due-north/south extremes of the disc fit inside
            g, tp = 4294967296.0, 2 * math.pi
            lat_c = math.atan(math.sinh(cy / g * tp))
            half = (1 << 31) - 1
            for sgn in (-1, 1):
                lat = max(-1.5707, min(1.5707, lat_c + sgn * r / gol_sq.EARTH_R))
                # clamp like the operator: no grid point exists off-grid
                yy = max(-half, min(half, g / tp * math.asinh(math.tan(lat))))
                assert s - 2 <= yy <= n + 2

    def test_pushdown_on_stored_scan(self, spark, tmp_path):
        df = spark.range(1000).selectExpr("id", "CAST(id * 1000000 - 500000000 AS LONG) x",
                                          "CAST(id * 777 AS LONG) y")
        p = str(tmp_path / "pts")
        df.write.parquet(p)
        q = gol_sq.radius_query_m(spark.read.parquet(p), 0, 0, 1_000_000.0)
        plan = q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert "PushedFilters" in plan and "GreaterThanOrEqual(x" in plan
