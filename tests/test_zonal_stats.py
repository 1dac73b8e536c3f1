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


class TestGeofenceEvents:
    def _df(self, spark, rows):
        import datetime as dt

        data = [
            (u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), x, y)
            for u, i, s, x, y in rows
        ]
        return spark.createDataFrame(
            data, "user_id int, event_id long, ts timestamp_ntz, x long, y long")

    SQUARE = [(1, [(-50, -50), (50, -50), (50, 50), (-50, 50)])]

    def test_reentry_splits_visits(self, spark):
        from gol_tool_spark.operators import spatial_query as SQ

        t0 = 1_700_000_000
        rows = [
            (1, 1, t0 + 0, 0, 0),       # in
            (1, 2, t0 + 10, 10, 10),    # in
            (1, 3, t0 + 20, 500, 500),  # OUT -> breaks the run
            (1, 4, t0 + 30, -5, -5),    # in again (second visit)
        ]
        zdf = spark.createDataFrame(self.SQUARE, ZONES_SCHEMA)
        got = sorted(
            (r.user_id, r.zone_id, r.enter_s - t0, r.exit_s - t0, r.n_fix)
            for r in SQ.geofence_events(self._df(spark, rows), zdf).collect())
        assert got == [(1, 1, 0, 10, 2), (1, 1, 30, 30, 1)]

    def test_overlapping_zones_independent(self, spark):
        from gol_tool_spark.operators import spatial_query as SQ

        zones = [
            (1, [(-50, -50), (50, -50), (50, 50), (-50, 50)]),
            (2, [(-10, -10), (10, -10), (10, 10), (-10, 10)]),  # nested
        ]
        t0 = 1_700_000_000
        rows = [
            (1, 1, t0 + 0, 0, 0),    # in both
            (1, 2, t0 + 10, 30, 30), # in zone 1 only -> breaks zone-2 run
            (1, 3, t0 + 20, 5, 5),   # in both again
        ]
        zdf = spark.createDataFrame(zones, ZONES_SCHEMA)
        got = sorted(
            (r.zone_id, r.enter_s - t0, r.exit_s - t0, r.n_fix)
            for r in SQ.geofence_events(self._df(spark, rows), zdf).collect())
        assert got == [(1, 0, 20, 3), (2, 0, 0, 1), (2, 20, 20, 1)]

    def test_entities_independent(self, spark):
        from gol_tool_spark.operators import spatial_query as SQ

        t0 = 1_700_000_000
        rows = [(1, 1, t0, 0, 0), (2, 2, t0 + 5, 1, 1)]
        zdf = spark.createDataFrame(self.SQUARE, ZONES_SCHEMA)
        got = sorted(
            (r.user_id, r.n_fix)
            for r in SQ.geofence_events(self._df(spark, rows), zdf).collect())
        assert got == [(1, 1), (2, 1)]

    def test_same_second_order_by_id(self, spark):
        from gol_tool_spark.operators import spatial_query as SQ

        # two same-second fixes, out-fix id BETWEEN the in-fix ids:
        # track order is (id1 in, id2 out, id3 in) -> two visits
        t0 = 1_700_000_000
        rows = [(1, 1, t0, 0, 0), (1, 2, t0, 999, 999), (1, 3, t0, 5, 5)]
        zdf = spark.createDataFrame(self.SQUARE, ZONES_SCHEMA)
        got = [r.n_fix for r in SQ.geofence_events(self._df(spark, rows), zdf)
               .orderBy("enter_s").collect()]
        assert got == [1, 1]
