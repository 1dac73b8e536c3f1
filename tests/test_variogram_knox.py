"""Loop-twin + invariant tests for way_diameter, semivariogram,
knox_stat and raster_cover (the r5 diameter/variogram/Knox/DDA wave)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import geostats, measures, segments

HALF = 1 << 31
BIAS = (1 << 31) + (1 << 15)


class TestWayDiameter:
    def _mk(self, spark, mem_rows, pts_rows):
        mem = spark.createDataFrame(
            mem_rows, "way_id bigint, seq int, node_ref bigint"
        )
        pts = spark.createDataFrame(pts_rows, "id bigint, x bigint, y bigint")
        return mem, pts

    def test_brute_twin(self, spark):
        # 4 nodes on a tilted rectangle; diameter = the (0,0)-(30,40) diagonal
        pts = [(1, 0, 0), (2, 30, 40), (3, 30, 0), (4, 0, 40)]
        mem = [(7, i, i + 1) for i in range(4)]
        m, p = self._mk(spark, mem, pts)
        r = measures.way_diameter(m, p).collect()[0]
        assert r.way_id == 7 and r.n_nodes == 4 and r.n_pairs == 6
        assert r.diam2 == str(30 * 30 + 40 * 40)

    def test_duplicates_and_dangling(self, spark):
        # node 2 referenced twice, node 99 dangles: distinct nodes = {1, 2}
        pts = [(1, -5, 0), (2, 5, 0)]
        mem = [(3, 0, 1), (3, 1, 2), (3, 2, 2), (3, 3, 99)]
        m, p = self._mk(spark, mem, pts)
        r = measures.way_diameter(m, p).collect()[0]
        assert r.n_nodes == 2 and r.n_pairs == 1 and r.diam2 == "100"

    def test_single_node_way_absent(self, spark):
        m, p = self._mk(spark, [(9, 0, 1), (9, 1, 1)], [(1, 3, 4)])
        assert measures.way_diameter(m, p).count() == 0

    def test_full_plane_exceeds_int64(self, spark):
        # corner-to-corner: d2 = 2 * (2^32 - 1)^2 > 2^63 — the DECIMAL lane
        c = (1 << 31) - 1
        m, p = self._mk(
            spark, [(1, 0, 1), (1, 1, 2)], [(1, -c - 1, -c - 1), (2, c, c)]
        )
        r = measures.way_diameter(m, p).collect()[0]
        assert int(r.diam2) == 2 * ((1 << 32) - 1) ** 2

    def test_diameter_bounds_hull(self, spark, sf_dir):
        # diameter >= every consecutive-pair distance (spot check on synth)
        from gol_tool_spark.functions import synth

        mem = synth.membership_df(spark, sf_dir)
        pts = synth.points_df(spark, sf_dir)
        wd = measures.way_diameter(mem, pts)
        # n_pairs == C(n_nodes, 2) exactly
        bad = wd.filter(
            F.col("n_pairs") != F.col("n_nodes") * (F.col("n_nodes") - 1) / 2
        ).count()
        assert bad == 0


class TestSemivariogram:
    def test_loop_twin(self, spark):
        # hand-placed points on a 4x4 coarse lattice (cell_shift=30 ->
        # cells of 2^30; x,y chosen so cell = (x+HALF)>>30)
        shift = 30
        pts = []
        counts = {}
        k = 0
        for (cx, cy), n in [((0, 0), 3), ((1, 0), 1), ((2, 0), 5),
                            ((0, 1), 2), ((1, 2), 4), ((3, 3), 1)]:
            counts[(cx, cy)] = n
            for _ in range(n):
                pts.append((k, (cx << shift) - HALF + 7, (cy << shift) - HALF + 9))
                k += 1
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = {
            (r.dir, r.lag): (r.n_pairs, int(r.gamma2))
            for r in geostats.semivariogram(df, cell_shift=shift, max_lag=3).collect()
        }
        dirs = {"E": (1, 0), "N": (0, 1), "NE": (1, 1), "NW": (-1, 1)}
        for (name, (dx, dy)), lag in itertools.product(dirs.items(), (1, 2, 3)):
            pairs = [
                (c, counts[(cx + dx * lag, cy + dy * lag)])
                for (cx, cy), c in counts.items()
                if (cx + dx * lag, cy + dy * lag) in counts
            ]
            if not pairs:
                assert (name, lag) not in out
                continue
            g2 = sum((a - b) ** 2 for a, b in pairs)
            assert out[(name, lag)] == (len(pairs), g2)

    def test_constant_field_zero_gamma(self, spark):
        # equal counts everywhere -> gamma2 == 0 at every (dir, lag)
        shift = 30
        pts = [
            (i * 10 + j, (i << shift) - HALF + 1, (j << shift) - HALF + 1)
            for i in range(3)
            for j in range(3)
        ]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        rows = geostats.semivariogram(df, cell_shift=shift, max_lag=2).collect()
        assert rows and all(int(r.gamma2) == 0 for r in rows)


class TestKnox:
    def _events(self, spark, rows):
        return spark.createDataFrame(rows, "event_id long, x long, y long, t long")

    def test_brute_twin(self, spark):
        # deterministic scatter, O(n^2) python twin
        rows = []
        for i in range(120):
            x = (i * 48271) % 2001 - 1000
            y = (i * 69621 + 7) % 2001 - 1000
            t = (i * 2654435761) % 5000
            rows.append((i, x, y, t))
        eps, tau = 400, 900
        sp = tm = both = 0
        for (ia, xa, ya, ta), (ib, xb, yb, tb) in itertools.combinations(rows, 2):
            s = (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps
            t = abs(ta - tb) <= tau
            sp += s
            tm += t
            both += s and t
        r = geostats.knox_stat(self._events(spark, rows), eps=eps, tau=tau).collect()[0]
        assert (r.n_events, r.pairs_space, r.pairs_time, r.pairs_both) == (
            120, sp, tm, both,
        )

    def test_marginal_bounds(self, spark):
        rows = [(i, i * 13 % 500, i * 29 % 500, i * 97 % 1000) for i in range(80)]
        r = geostats.knox_stat(self._events(spark, rows), eps=200, tau=300).collect()[0]
        assert r.pairs_both <= min(r.pairs_space, r.pairs_time)
        n = r.n_events
        assert r.pairs_space <= n * (n - 1) // 2 and r.pairs_time <= n * (n - 1) // 2

    def test_all_pairs_when_thresholds_huge(self, spark):
        rows = [(i, i * 3, -i * 2, i * 11) for i in range(40)]
        r = geostats.knox_stat(
            self._events(spark, rows), eps=1 << 20, tau=1 << 30
        ).collect()[0]
        assert r.pairs_space == r.pairs_time == r.pairs_both == 40 * 39 // 2


class TestRasterCover:
    def _segs(self, spark, rows):
        return spark.createDataFrame(
            rows, "seg long, x1 long, y1 long, x2 long, y2 long"
        )

    @staticmethod
    def _loop_dda(x1, y1, x2, y2, shift):
        X1, Y1, X2, Y2 = (v + BIAS for v in (x1, y1, x2, y2))
        n = max(abs((X2 >> shift) - (X1 >> shift)), abs((Y2 >> shift) - (Y1 >> shift)), 1)
        cells = {
            (
                (((n - t) * X1 + t * X2) // n) >> shift,
                (((n - t) * Y1 + t * Y2) // n) >> shift,
            )
            for t in range(n + 1)
        }
        return n, cells

    def test_loop_twin(self, spark):
        shift = 12
        rows = [
            (1, 0, 0, 30000, 11000),
            (2, -20000, 15000, 4000, -9000),
            (3, 5, 5, 6, 6),          # degenerate: one cell
            (4, -32768, -32768, 32767, 32767),
            (5, 1000, -4096, 1000, 20000),  # vertical
        ]
        out = {
            r.seg: r
            for r in segments.raster_cover(self._segs(spark, rows), cell_shift=shift).collect()
        }
        for seg, x1, y1, x2, y2 in rows:
            n, cells = self._loop_dda(x1, y1, x2, y2, shift)
            r = out[seg]
            assert r.n_steps == n
            assert r.n_cells == len(cells)
            assert r.sum_cx == sum(c[0] for c in cells)
            assert r.sum_cy == sum(c[1] for c in cells)

    def test_endpoints_and_connectivity(self, spark):
        # the sampled chain moves <=1 cell per axis per step and includes
        # both endpoint cells — checked against the python twin's chain
        shift = 12
        x1, y1, x2, y2 = -31000, 2000, 29000, -27000
        X1, Y1, X2, Y2 = (v + BIAS for v in (x1, y1, x2, y2))
        n = max(abs((X2 >> shift) - (X1 >> shift)), abs((Y2 >> shift) - (Y1 >> shift)), 1)
        chain = [
            (
                (((n - t) * X1 + t * X2) // n) >> shift,
                (((n - t) * Y1 + t * Y2) // n) >> shift,
            )
            for t in range(n + 1)
        ]
        assert chain[0] == ((X1 >> shift), (Y1 >> shift))
        assert chain[-1] == ((X2 >> shift), (Y2 >> shift))
        for (ax, ay), (bx, by) in zip(chain, chain[1:]):
            assert abs(ax - bx) <= 1 and abs(ay - by) <= 1
        r = segments.raster_cover(
            self._segs(spark, [(1, x1, y1, x2, y2)]), cell_shift=shift
        ).collect()[0]
        assert r.n_cells == len(set(chain))


class TestContourCases:
    SHIFT = 30

    def _df(self, spark, counts):
        pts = []
        k = 0
        for (cx, cy), n in counts.items():
            for _ in range(n):
                pts.append((k, (cx << self.SHIFT) - HALF + 3, (cy << self.SHIFT) - HALF + 3))
                k += 1
        return spark.createDataFrame(pts, "id long, x long, y long")

    def test_loop_twin(self, spark):
        counts = {(0, 0): 5, (1, 0): 1, (2, 0): 7, (0, 1): 6,
                  (1, 1): 2, (2, 2): 9, (3, 1): 1}
        thr = 5
        out = {
            r.mcase: r.n_windows
            for r in geostats.contour_cases(
                self._df(spark, counts), threshold=thr, cell_shift=self.SHIFT
            ).collect()
        }
        # python twin: windows anchored wherever >= 1 occupied corner
        windows = {}
        for (cx, cy) in counts:
            for wx, wy in ((cx, cy), (cx - 1, cy), (cx, cy - 1), (cx - 1, cy - 1)):
                windows[(wx, wy)] = 0
        for (wx, wy) in windows:
            case = 0
            for bit, (dx, dy) in zip((1, 2, 4, 8), ((0, 0), (1, 0), (0, 1), (1, 1))):
                if counts.get((wx + dx, wy + dy), 0) >= thr:
                    case |= bit
            windows[(wx, wy)] = case
        expected = {}
        for case in windows.values():
            expected[case] = expected.get(case, 0) + 1
        assert out == expected

    def test_all_hot_island(self, spark):
        # a single hot cell yields exactly one window of each corner case
        out = {
            r.mcase: r.n_windows
            for r in geostats.contour_cases(
                self._df(spark, {(5, 5): 9}), threshold=1, cell_shift=self.SHIFT
            ).collect()
        }
        assert out == {1: 1, 2: 1, 4: 1, 8: 1}

    def test_threshold_above_everything_is_case0(self, spark):
        rows = geostats.contour_cases(
            self._df(spark, {(0, 0): 2, (1, 1): 3}), threshold=100, cell_shift=self.SHIFT
        ).collect()
        assert {r.mcase for r in rows} == {0}
        assert sum(r.n_windows for r in rows) == 7  # windows touching the 2 cells


class TestEmergingHotspots:
    SHIFT = 30

    def _ev(self, spark, rows):
        # rows: (x, y, t)
        return spark.createDataFrame(rows, "x long, y long, t long")

    def _cellpt(self, cx, cy):
        return ((cx << self.SHIFT) - HALF + 3, (cy << self.SHIFT) - HALF + 3)

    def test_loop_twin(self, spark):
        # three cells with known period series over 4 periods of 10s
        series = {(0, 0): [1, 2, 3, 4],      # monotone up: S = +6
                  (1, 1): [4, 0, 0, 1],      # down then blip
                  (2, 2): [2, 2, 2, 2]}      # constant: S = 0
        rows = []
        for cell, cs in series.items():
            x, y = self._cellpt(*cell)
            for p, c in enumerate(cs):
                rows += [(x, y, 100 + p * 10 + k) for k in range(c)]
        out = {
            (r.cx, r.cy): r
            for r in geostats.emerging_hotspots(
                self._ev(spark, rows), t0=100, period_s=10, n_periods=4,
                cell_shift=self.SHIFT,
            ).collect()
        }
        for cell, cs in series.items():
            s = sum(
                (cs[j] > cs[i]) - (cs[j] < cs[i])
                for i in range(4) for j in range(i + 1, 4)
            )
            r = out[cell]
            assert r.mk_s == s
            assert r.total == sum(cs)
            assert r.n_active == sum(1 for c in cs if c > 0)

    def test_missing_periods_count_zero(self, spark):
        # cell only active in the LAST period: S = +(n-1) (emerging)
        x, y = self._cellpt(5, 5)
        rows = [(x, y, 100 + 3 * 10 + k) for k in range(7)]
        r = geostats.emerging_hotspots(
            self._ev(spark, rows), t0=100, period_s=10, n_periods=4,
            cell_shift=self.SHIFT,
        ).collect()[0]
        assert r.mk_s == 3 and r.n_active == 1 and r.total == 7

    def test_out_of_window_ignored(self, spark):
        x, y = self._cellpt(0, 0)
        rows = [(x, y, 99), (x, y, 140), (x, y, 105)]  # only 105 is inside
        r = geostats.emerging_hotspots(
            self._ev(spark, rows), t0=100, period_s=10, n_periods=4,
            cell_shift=self.SHIFT,
        ).collect()[0]
        assert r.total == 1

    def test_bounds(self, spark):
        # |S| <= C(n, 2) on the synthetic fixture
        rows = [self._cellpt(i % 3, i % 5) + (100 + (i * 7) % 40,)
                for i in range(200)]
        rows = [(x, y, t) for (x, y), t in
                [((r[0], r[1]), r[2]) for r in rows]]
        out = geostats.emerging_hotspots(
            self._ev(spark, rows), t0=100, period_s=10, n_periods=4,
            cell_shift=self.SHIFT,
        ).collect()
        assert out
        for r in out:
            assert abs(r.mk_s) <= 6


class TestSlopeComponents:
    SHIFT = 30

    def test_loop_twin(self, spark):
        counts = {(1, 1): 5, (2, 1): 3, (0, 1): 7, (1, 2): 2,
                  (1, 0): 6, (2, 2): 1, (0, 0): 4, (9, 9): 8}
        pts = []
        k = 0
        for (cx, cy), n in counts.items():
            for _ in range(n):
                pts.append((k, (cx << self.SHIFT) - HALF + 1, (cy << self.SHIFT) - HALF + 1))
                k += 1
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = {
            (r.cx, r.cy): r
            for r in geostats.slope_components(df, cell_shift=self.SHIFT).collect()
        }
        get = lambda cx, cy: counts.get((cx, cy), 0)
        for (cx, cy), c in counts.items():
            gx = (get(cx + 1, cy + 1) + 2 * get(cx + 1, cy) + get(cx + 1, cy - 1)
                  - get(cx - 1, cy + 1) - 2 * get(cx - 1, cy) - get(cx - 1, cy - 1))
            gy = (get(cx + 1, cy + 1) + 2 * get(cx, cy + 1) + get(cx - 1, cy + 1)
                  - get(cx + 1, cy - 1) - 2 * get(cx, cy - 1) - get(cx - 1, cy - 1))
            r = out[(cx, cy)]
            assert (r.c, r.gx, r.gy) == (c, gx, gy)
            assert int(r.g2) == gx * gx + gy * gy

    def test_isolated_cell_flat(self, spark):
        df = spark.createDataFrame(
            [(1, (9 << self.SHIFT) - HALF, (9 << self.SHIFT) - HALF)],
            "id long, x long, y long",
        )
        r = geostats.slope_components(df, cell_shift=self.SHIFT).collect()[0]
        assert (r.gx, r.gy, r.g2) == (0, 0, "0")

    def test_uniform_interior_flat(self, spark):
        # constant field: every INTERIOR cell has zero gradient
        pts = []
        k = 0
        for i in range(5):
            for j in range(5):
                for _ in range(3):
                    pts.append((k, (i << self.SHIFT) - HALF + 2, (j << self.SHIFT) - HALF + 2))
                    k += 1
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = {(r.cx, r.cy): r for r in
               geostats.slope_components(df, cell_shift=self.SHIFT).collect()}
        assert out[(2, 2)].g2 == "0" and out[(1, 3)].g2 == "0"
        assert int(out[(0, 0)].g2) > 0  # corner sees the falloff


class TestCurvatureComponents:
    SHIFT = 30

    def test_loop_twin(self, spark):
        counts = {(1, 1): 5, (2, 1): 3, (0, 1): 7, (1, 2): 2,
                  (1, 0): 6, (2, 2): 1, (0, 0): 4, (9, 9): 8}
        pts = []
        k = 0
        for (cx, cy), n in counts.items():
            for _ in range(n):
                pts.append((k, (cx << self.SHIFT) - HALF + 1, (cy << self.SHIFT) - HALF + 1))
                k += 1
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = {
            (r.cx, r.cy): r
            for r in geostats.curvature_components(df, cell_shift=self.SHIFT).collect()
        }
        get = lambda cx, cy: counts.get((cx, cy), 0)
        for (cx, cy), c in counts.items():
            dxx = get(cx + 1, cy) + get(cx - 1, cy) - 2 * c
            dyy = get(cx, cy + 1) + get(cx, cy - 1) - 2 * c
            dxy4 = (get(cx + 1, cy + 1) + get(cx - 1, cy - 1)
                    - get(cx - 1, cy + 1) - get(cx + 1, cy - 1))
            r = out[(cx, cy)]
            assert (r.c, r.dxx, r.dyy, r.dxy4, r.lap) == (
                c, dxx, dyy, dxy4, dxx + dyy), (cx, cy)

    def test_isolated_cell_stencil(self, spark):
        df = spark.createDataFrame(
            [(i, (9 << self.SHIFT) - HALF + i, (9 << self.SHIFT) - HALF) for i in range(3)],
            "id long, x long, y long",
        )
        r = geostats.curvature_components(df, cell_shift=self.SHIFT).collect()[0]
        assert (r.dxx, r.dyy, r.dxy4, r.lap) == (-6, -6, 0, -12)  # -2c each axis

    def test_uniform_interior_flat_and_peak_negative(self, spark):
        pts = []
        k = 0
        for i in range(5):
            for j in range(5):
                n = 3 + (3 if (i, j) == (2, 2) else 0)  # planted peak
                for _ in range(n):
                    pts.append((k, (i << self.SHIFT) - HALF + 2, (j << self.SHIFT) - HALF + 2))
                    k += 1
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = {(r.cx, r.cy): r for r in
               geostats.curvature_components(df, cell_shift=self.SHIFT).collect()}
        assert out[(1, 3)].lap == 0          # flat interior away from the peak
        assert out[(2, 2)].lap == -12        # peak: strictly concave
        # peak neighbor: only the axis toward the peak bumps (dyy = 6+3-6)
        assert (out[(2, 1)].dxx, out[(2, 1)].dyy, out[(2, 1)].lap) == (0, 3, 3)


class TestAspectOctants:
    def test_exhaustive_direction_twin(self, spark):
        # drive the CASE chain directly through the operator by planting
        # a single neighbor so the gradient points every which way
        import math

        def twin(gx, gy):
            if gx == 0 and gy == 0:
                return -1
            ang = math.atan2(gy, gx) % (2 * math.pi)
            return int(ang // (math.pi / 4)) % 8

        SHIFT = 30
        # center cell + one neighbor in each of the 8 directions, one at
        # a time, checked against the angle twin
        for dx, dy in [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0),
                       (-1, -1), (0, -1), (1, -1)]:
            pts = [(0, (5 << SHIFT) - HALF + 3, (5 << SHIFT) - HALF + 3)]
            for k in range(4):
                pts.append((k + 1, ((5 + dx) << SHIFT) - HALF + 3,
                            ((5 + dy) << SHIFT) - HALF + 3))
            df = spark.createDataFrame(pts, "id long, x long, y long")
            out = {(r.cx, r.cy): r for r in
                   geostats.aspect_octants(df, cell_shift=SHIFT).collect()}
            r = out[(5, 5)]
            assert r.octant == twin(r.gx, r.gy), (dx, dy, r.gx, r.gy, r.octant)
            # gradient points toward the mass: same octant as (dx, dy)
            assert r.octant == twin(dx, dy), (dx, dy)

    def test_flat_is_minus_one_and_diagonal_tiebreak(self, spark):
        SHIFT = 30
        df = spark.createDataFrame(
            [(1, (9 << SHIFT) - HALF, (9 << SHIFT) - HALF)], "id long, x long, y long")
        assert geostats.aspect_octants(df, cell_shift=SHIFT).collect()[0].octant == -1
        # exact diagonal gradient (gx == gy > 0) goes to sector 1, not 0
        pts = [(0, (5 << SHIFT) - HALF, (5 << SHIFT) - HALF),
               (1, (6 << SHIFT) - HALF, (6 << SHIFT) - HALF)]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = {(r.cx, r.cy): r for r in
               geostats.aspect_octants(df, cell_shift=SHIFT).collect()}
        r = out[(5, 5)]
        assert r.gx == r.gy > 0 and r.octant == 1
