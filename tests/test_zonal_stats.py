"""Zonal statistics: convex-polygon point aggregation.

Twin is a brute-force Python ray-free convex test (all-edge cross
products, arbitrary-precision ints) — independent of the blocked join
and the DECIMAL lane under test.
"""

from __future__ import annotations

from gol_tool_spark.operators import spatial_query as SQ


def _inside(px, py, ring):
    n = len(ring)
    return all(
        (ring[(k + 1) % n][0] - ring[k][0]) * (py - ring[k][1])
        - (ring[(k + 1) % n][1] - ring[k][1]) * (px - ring[k][0]) >= 0
        for k in range(n)
    )


def _twin(rows, zones):
    out = {}
    for z, ring in zones.items():
        sel = [v for _, x, y, v in rows if _inside(x, y, ring)]
        if sel:
            out[z] = (len(sel), sum(sel), min(sel), max(sel))
    return out


ZONES_SCHEMA = "zone_id long, ring array<struct<x: long, y: long>>"


class TestZonalStats:
    def test_matches_bruteforce(self, spark):
        rows = [(i, (i * 37) % 200 - 100, (i * 53) % 200 - 100, i % 7) for i in range(400)]
        zones = {
            1: [(-50, -50), (50, -50), (50, 50), (-50, 50)],
            2: [(0, -120), (120, 0), (0, 120), (-120, 0)],
            3: [(60, 60), (90, 60), (90, 90), (60, 90)],
        }
        pts = spark.createDataFrame(rows, "id long, x long, y long, qty long")
        zdf = spark.createDataFrame(list(zones.items()), ZONES_SCHEMA)
        got = {r.zone_id: (r.n_pts, r.v_sum, r.v_min, r.v_max)
               for r in SQ.zonal_stats(pts, zdf, value_col="qty").collect()}
        assert got == _twin(rows, zones)

    def test_full_plane_exactness(self, spark):
        # cross products at full int32 coordinate scale exceed int64 —
        # the DECIMAL lane must stay exact where doubles would round
        big = (1 << 31) - 1
        rows = [(1, big - 2, big - 2, 1), (2, -big, -big, 1), (3, 0, 0, 1)]
        zones = {7: [(-big, -big), (big, -big), (big, big), (-big, big)]}
        pts = spark.createDataFrame(rows, "id long, x long, y long, qty long")
        zdf = spark.createDataFrame(list(zones.items()), ZONES_SCHEMA)
        got = {r.zone_id: r.n_pts
               for r in SQ.zonal_stats(pts, zdf, cell_shift=31).collect()}
        assert got == {7: 3}

    def test_boundary_inclusive(self, spark):
        rows = [(1, 50, 0, 1), (2, 50, 50, 1), (3, 51, 0, 1)]
        zones = {1: [(-50, -50), (50, -50), (50, 50), (-50, 50)]}
        pts = spark.createDataFrame(rows, "id long, x long, y long, qty long")
        zdf = spark.createDataFrame(list(zones.items()), ZONES_SCHEMA)
        got = {r.zone_id: r.n_pts for r in SQ.zonal_stats(pts, zdf).collect()}
        assert got == {1: 2}  # edge + corner in, outside point not

    def test_cw_ring_matches_nothing(self, spark):
        # documented contract: a CW ring fails the CCW sign test
        rows = [(1, 0, 0, 1)]
        pts = spark.createDataFrame(rows, "id long, x long, y long, qty long")
        zdf = spark.createDataFrame(
            [(1, [(-50, -50), (-50, 50), (50, 50), (50, -50)])], ZONES_SCHEMA)
        assert SQ.zonal_stats(pts, zdf).count() == 0

    def test_count_only_without_value(self, spark):
        rows = [(1, 0, 0, 9), (2, 1, 1, 9)]
        pts = spark.createDataFrame(rows, "id long, x long, y long, qty long")
        zdf = spark.createDataFrame(
            [(1, [(-5, -5), (5, -5), (5, 5), (-5, 5)])], ZONES_SCHEMA)
        r = SQ.zonal_stats(pts, zdf).first()
        assert (r.n_pts, r.v_sum, r.v_min, r.v_max) == (2, 2, 1, 1)

    def test_cell_cap_guard(self, spark):
        import pytest

        pts = spark.createDataFrame([(1, 0, 0, 1)], "id long, x long, y long, qty long")
        big = (1 << 31) - 1
        zdf = spark.createDataFrame(
            [(1, [(-big, -big), (big, -big), (big, big), (-big, big)])], ZONES_SCHEMA)
        with pytest.raises(ValueError):
            SQ.zonal_stats(pts, zdf, cell_shift=20)
