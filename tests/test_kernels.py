"""Unit tests for the pure-numpy kernels (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gol_tool_spark.kernels import catalog as K
from gol_tool_spark.kernels import geometry as G
from gol_tool_spark.kernels import image as I
from gol_tool_spark.kernels import mercator as M
from gol_tool_spark.kernels import tile as T

COORD = st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1)


class TestMercator:
    def test_known_points(self):
        x, y = M.xy_from_lonlat(np.array([0.0, 180.0, -180.0]), np.array([0.0, 0.0, 0.0]))
        assert x.tolist() == [0, (1 << 31) - 1, -(1 << 31)]
        assert y.tolist() == [0, 0, 0]

    def test_max_lat_hits_edge(self):
        _, y = M.xy_from_lonlat(np.array([0.0]), np.array([M.MAX_LAT_DEG]))
        assert y[0] == (1 << 31) - 1 or y[0] == (1 << 31) - 2  # rounding edge

    def test_roundtrip(self):
        lon = np.array([13.3777, -122.4194, 151.2093])
        lat = np.array([52.5163, 37.7749, -33.8688])
        x, y = M.xy_from_lonlat(lon, lat)
        lon2, lat2 = M.lonlat_from_xy(x, y)
        assert np.allclose(lon, lon2, atol=1e-6)
        assert np.allclose(lat, lat2, atol=1e-6)

    def test_100nd(self):
        x1, y1 = M.xy_from_100nd(np.array([133_777_000]), np.array([525_163_000]))
        x2, y2 = M.xy_from_lonlat(np.array([13.3777]), np.array([52.5163]))
        assert x1[0] == x2[0] and y1[0] == y2[0]


class TestTile:
    def test_pack_unpack(self):
        t = T.pack(12, 4095, 0)
        z, r, c = T.unpack(t)
        assert (int(z), int(r), int(c)) == (12, 4095, 0)

    def test_world_corners_z1(self):
        # NW corner of the world is tile (z=1, row=0, col=0)
        assert int(T.tile_of_point(-(1 << 31), (1 << 31) - 1, 1)) == int(T.pack(1, 0, 0))
        # SE corner is (1,1)
        assert int(T.tile_of_point((1 << 31) - 1, -(1 << 31), 1)) == int(T.pack(1, 1, 1))

    @given(x=COORD, y=COORD, z=st.integers(min_value=1, max_value=12))
    @settings(max_examples=200, deadline=None)
    def test_tile_contains_point(self, x, y, z):
        t = int(T.tile_of_point(x, y, z))
        zz, r, c = (t >> 24), (t >> 12) & 0xFFF, t & 0xFFF
        size = 1 << (32 - z)
        minx = (c << (32 - z)) - (1 << 31)
        maxy = ((1 << 31) - 1) - (r << (32 - z))
        assert zz == z and minx <= x < minx + size and maxy - size < y <= maxy

    @given(x=COORD, y=COORD)
    @settings(max_examples=100, deadline=None)
    def test_zoomed_out_consistent(self, x, y):
        t12 = T.tile_of_point(x, y, 12)
        for z in (9, 6, 3, 0):
            assert int(T.zoomed_out(t12, z)) == int(T.tile_of_point(x, y, z))

    @given(x=COORD, y=COORD)
    @settings(max_examples=100, deadline=None)
    def test_point_quad_single_tile(self, x, y):
        q = int(T.quad_from_bbox(x, y, x, y, 12))
        tiles = T.quad_tiles(q)
        assert len(tiles) == 1 and tiles[0] == int(T.tile_of_point(x, y, 12))

    @given(minx=COORD, miny=COORD, w=st.integers(0, 1 << 30), h=st.integers(0, 1 << 30))
    @settings(max_examples=200, deadline=None)
    def test_quad_covers_bbox(self, minx, miny, w, h):
        maxx = min(minx + w, (1 << 31) - 1)
        maxy = min(miny + h, (1 << 31) - 1)
        q = int(T.quad_from_bbox(minx, miny, maxx, maxy, 12))
        tiles = set(T.quad_tiles(q))
        assert 1 <= len(tiles) <= 4
        z = (q >> 24) & 0xF
        # all four bbox corners land in quad tiles
        for cx in (minx, maxx):
            for cy in (miny, maxy):
                assert int(T.tile_of_point(cx, cy, z)) in tiles

    def test_quad_union_covers_both(self):
        qa = int(T.quad_from_bbox(0, 0, 100, 100, 12))
        qb = int(T.quad_from_bbox(1 << 28, 1 << 28, (1 << 28) + 5, (1 << 28) + 5, 12))
        qu = T.quad_union(qa, qb)
        zu = (qu >> 24) & 0xF
        for t in T.quad_tiles(qa) + T.quad_tiles(qb):
            assert int(T.zoomed_out(np.int64(t), zu)) in set(T.quad_tiles(qu))


class TestCatalog:
    def _catalog(self, max_tiles=10, min_density=100):
        # 3 hot z12 tiles + background
        rng = np.random.default_rng(7)
        xs = rng.integers(-(1 << 31), (1 << 31) - 1, 5000)
        ys = rng.integers(-(1 << 31), (1 << 31) - 1, 5000)
        t12 = T.tile_of_point(xs, ys, 12)
        hot = T.tile_of_point(np.array([5, 5, 5]), np.array([5, 6, 7]), 12)
        t12 = np.concatenate([t12, np.repeat(hot, 400)])
        uniq, cnt = np.unique(t12, return_counts=True)
        return K.build_catalog(uniq, cnt, max_tiles=max_tiles, min_density=min_density), uniq, cnt

    def test_root_always_kept(self):
        cat, _, _ = self._catalog(max_tiles=1)
        assert int(T.pack(0, 0, 0)) in cat.tiles.tolist()

    def test_piles_dense_from_2(self):
        cat, _, _ = self._catalog()
        assert cat.piles.min() == 2 and cat.piles.max() == len(cat) + 1

    def test_pile_lookup_prefers_finest(self):
        cat, _, _ = self._catalog(max_tiles=50, min_density=100)
        # the hot z12 tile must be kept and points in it must map to it
        px, py = np.array([5]), np.array([5])
        pile = cat.pile_of_point(px, py)[0]
        assert int(T.tile_of_pile(int(pile)) if False else cat.tile_of_pile(int(pile))) == int(
            T.tile_of_point(px, py, 12)[0]
        )

    def test_every_point_resolves(self):
        cat, _, _ = self._catalog()
        rng = np.random.default_rng(11)
        xs = rng.integers(-(1 << 31), (1 << 31) - 1, 1000)
        ys = rng.integers(-(1 << 31), (1 << 31) - 1, 1000)
        piles = cat.pile_of_point(xs, ys)
        assert (piles >= 2).all()  # root catches everything

    def test_max_tiles_cap(self):
        cat, _, _ = self._catalog(max_tiles=5)
        assert len(cat) <= 5


class TestGeometry:
    SQUARE = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])

    def test_square(self):
        inside = G.points_in_ring(np.array([5, 15, -1]), np.array([5, 5, 5]), self.SQUARE)
        assert inside.tolist() == [True, False, False]

    def test_hole(self):
        hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]])
        res = G.points_in_polygon(np.array([5, 2]), np.array([5, 2]), self.SQUARE, [hole])
        assert res.tolist() == [False, True]

    def test_concave(self):
        u_shape = np.array([[0, 0], [30, 0], [30, 30], [20, 30], [20, 10], [10, 10], [10, 30], [0, 30]])
        res = G.points_in_ring(np.array([5, 15, 25]), np.array([20, 20, 20]), u_shape)
        assert res.tolist() == [True, False, True]

    def test_area_ccw_positive(self):
        assert G.ring_area2(self.SQUARE) == 200.0

    def test_length(self):
        assert G.polyline_length(np.array([0, 3, 3]), np.array([0, 4, 8])) == 9.0


class TestImage:
    def test_lossless_roundtrip(self):
        px = I.generate_pixels(42, 16, 12)
        for fmt in ("raw", "png"):
            out = I.decode(I.encode(px, fmt), 16, 12, fmt)
            assert np.array_equal(px, out)
            assert I.psnr(px, out) == float("inf")

    def test_lossy_psnr_gate(self):
        px = I.generate_pixels(7, 32, 32)
        out = I.decode(I.encode(px, "jpg"), 32, 32, "jpg")
        # the DCT codec must clear the north rule's lossy bar outright
        assert I.psnr(px, out) >= 40.0

    def test_phash_stability_under_lossy(self):
        px = I.generate_pixels(9, 64, 64)
        out = I.decode(I.encode(px, "jpg"), 64, 64, "jpg")
        assert I.hamming64(I.phash64(px), I.phash64(out)) <= 8

    def test_phash_distinguishes(self):
        a = I.phash64(I.generate_pixels(1, 32, 32))
        b = I.phash64(I.generate_pixels(2, 32, 32))
        assert I.hamming64(a, b) > 8


class TestSegmentIntersect:
    SQ = np.array([[0, 0], [100, 0], [100, 100], [0, 100]])

    def test_cases(self):
        from gol_tool_spark.kernels.geometry import (
            polyline_intersects_polygon,
            segment_crosses_ring,
        )

        # proper crossing
        assert segment_crosses_ring(-10, 50, 110, 50, self.SQ)
        # disjoint
        assert not segment_crosses_ring(-10, -10, -5, -5, self.SQ)
        # collinear with an edge's line but beyond the edge: no intersection
        assert not segment_crosses_ring(150, 0, 200, 0, self.SQ)
        # touch at a corner counts
        assert segment_crosses_ring(100, 100, 150, 150, self.SQ)
        # polyline fully inside (no crossing) still intersects
        assert polyline_intersects_polygon(
            np.array([10, 20]), np.array([10, 20]), self.SQ
        )
        # polyline crossing with no vertex inside
        assert polyline_intersects_polygon(
            np.array([-10, 110]), np.array([50, 50]), self.SQ
        )
        # polyline fully inside a hole does not intersect
        hole = np.array([[20, 20], [80, 20], [80, 80], [20, 80]])
        assert not polyline_intersects_polygon(
            np.array([40, 60]), np.array([40, 60]), self.SQ, [hole]
        )


class TestBatchPolylineIntersect:
    """round-2 VERDICT item 7: the batched kernel must agree with the
    per-way scalar kernel bit-for-bit and beat it >=3x on 10k ways."""

    SQ = np.array([[0, 0], [100, 0], [100, 100], [0, 100]])
    HOLE = np.array([[20, 20], [80, 20], [80, 80], [20, 80]])

    @staticmethod
    def _random_ways(n, rng, lo=-150, hi=250):
        flat_x, flat_y, offsets, ways = [], [], [0], []
        for _ in range(n):
            m = int(rng.integers(2, 8))
            xs = rng.integers(lo, hi, m).astype(np.int64)
            ys = rng.integers(lo, hi, m).astype(np.int64)
            ways.append((xs, ys))
            flat_x.extend(xs)
            flat_y.extend(ys)
            offsets.append(offsets[-1] + m)
        return (
            ways,
            np.array(flat_x, np.int64),
            np.array(flat_y, np.int64),
            np.array(offsets, np.int64),
        )

    def test_matches_scalar(self):
        from gol_tool_spark.kernels import geometry as G

        rng = np.random.default_rng(7)
        ways, fx, fy, off = self._random_ways(300, rng)
        got = G.polylines_intersect_polygon(fx, fy, off, self.SQ, [self.HOLE])
        want = np.array(
            [
                G.polyline_intersects_polygon(xs, ys, self.SQ, [self.HOLE])
                for xs, ys in ways
            ]
        )
        assert np.array_equal(got, want)
        assert got.any() and not got.all()  # both classes exercised

    def test_empty_ways_in_batch(self):
        """Empty polylines anywhere in the batch (leading offset 0 would
        index seg_mask[-1]; trailing offset len(xs) would overrun) must
        neither crash nor perturb their neighbors."""
        from gol_tool_spark.kernels import geometry as G

        xs = np.array([-10, 110, 10], np.int64)
        ys = np.array([50, 50, 10], np.int64)
        # way0 empty, way1 crosses, way2 empty, way3 = single inside vertex
        off = np.array([0, 0, 2, 2, 3], np.int64)
        got = G.polylines_intersect_polygon(xs, ys, off, self.SQ)
        assert got.tolist() == [False, True, False, True]

    def test_chunking_is_invariant(self):
        from gol_tool_spark.kernels import geometry as G

        rng = np.random.default_rng(11)
        _, fx, fy, off = self._random_ways(100, rng)
        a = G.polylines_intersect_polygon(fx, fy, off, self.SQ, [self.HOLE])
        b = G.polylines_intersect_polygon(
            fx, fy, off, self.SQ, [self.HOLE], pair_budget=64
        )
        assert np.array_equal(a, b)

    def test_batch_beats_scalar_3x_on_10k_ways(self):
        import time

        from gol_tool_spark.kernels import geometry as G

        rng = np.random.default_rng(3)
        ways, fx, fy, off = self._random_ways(10_000, rng)
        t0 = time.perf_counter()
        G.polylines_intersect_polygon(fx, fy, off, self.SQ, [self.HOLE])
        batch_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for xs, ys in ways:
            G.polyline_intersects_polygon(xs, ys, self.SQ, [self.HOLE])
        scalar_s = time.perf_counter() - t0
        assert batch_s * 3 <= scalar_s, (batch_s, scalar_s)


class TestMortonInvariants:
    @given(x=COORD, y=COORD)
    @settings(max_examples=150, deadline=None)
    def test_parent_prefix(self, x, y):
        # zooming out one level drops exactly the two low interleaved bits
        for z in (16, 12, 8):
            m = int(T.morton_cell(np.array([x]), np.array([y]), z)[0])
            mp = int(T.morton_cell(np.array([x]), np.array([y]), z - 1)[0])
            assert mp == m >> 2

    @given(x=COORD, y=COORD)
    @settings(max_examples=100, deadline=None)
    def test_same_cell_same_id(self, x, y):
        size = 1 << (32 - 16)
        # clamp the neighbor inside the same z16 cell
        nx = min(x | (size - 1), (1 << 31) - 1)
        m1 = int(T.morton_cell(np.array([x]), np.array([y]), 16)[0])
        m2 = int(T.morton_cell(np.array([nx]), np.array([y]), 16)[0])
        if (x + (1 << 31)) >> 16 == (nx + (1 << 31)) >> 16:
            assert m1 == m2


class TestHilbert:
    def test_bijective_at_small_zoom(self):
        # all 16 cells of a zoom-2 grid get distinct curve positions 0..15
        size = 1 << 30  # cell size at zoom 2
        xs, ys = [], []
        for r in range(4):
            for c in range(4):
                xs.append(-(1 << 31) + c * size + 5)
                ys.append((1 << 31) - 1 - r * size - 5)
        d = T.hilbert_d(np.array(xs), np.array(ys), 2)
        assert sorted(d.tolist()) == list(range(16))

    def test_curve_adjacency(self):
        # consecutive curve positions are edge-adjacent cells (the Hilbert
        # property Morton lacks)
        size = 1 << 30
        cells = {}
        for r in range(4):
            for c in range(4):
                x = -(1 << 31) + c * size + 5
                y = (1 << 31) - 1 - r * size - 5
                d = int(T.hilbert_d(np.array([x]), np.array([y]), 2)[0])
                cells[d] = (r, c)
        for d in range(15):
            (r1, c1), (r2, c2) = cells[d], cells[d + 1]
            assert abs(r1 - r2) + abs(c1 - c2) == 1


class TestCodecSeam:
    def test_real_codec_fmts_raise_clearly_without_lib(self):
        """input_hint mandate: fmt='jpeg' ALWAYS works (pure-numpy T.81
        bitstream when PIL is absent, PIL as an accelerator when present);
        only PIL-exclusive fmts raise the clearly-marked
        NotImplementedError, and the batch plumbing stays functional."""
        import pytest as _pytest

        from gol_tool_spark.kernels import image as IMG

        px = IMG.generate_pixels(7, 16, 16)
        rt = IMG.decode(IMG.encode(px, "jpeg"), 16, 16, "jpeg")
        assert IMG.psnr(px, rt) >= 20.0
        if not IMG.HAVE_REAL_CODEC:
            with _pytest.raises(NotImplementedError, match="image library"):
                IMG.encode(px, "webp")
            with _pytest.raises(NotImplementedError, match="image library"):
                IMG.decode(b"x", 1, 1, "webp")
        with _pytest.raises(NotImplementedError, match="unknown"):
            IMG.encode(px, "bmp")


class TestTileSpecProperties:
    @given(
        st.integers(0, 12).flatmap(
            lambda z: st.tuples(
                st.just(z), st.integers(0, (1 << z) - 1), st.integers(0, (1 << z) - 1)
            )
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_spec_bounds_roundtrip(self, zxy):
        """parse_tile_spec/tile_bounds inverse property: every corner and
        the center of a tile's bounds map back to that tile."""
        from gol_tool_spark.kernels import tile as KT

        z, x, y = zxy
        t = KT.parse_tile_spec(f"{z}/{x}/{y}")
        w, s, e, n = KT.tile_bounds(t)
        assert e - w == n - s == (1 << (32 - z)) - 1
        for px, py in ((w, s), (e, n), ((w + e) // 2, (s + n) // 2)):
            assert int(KT.tile_of_point(px, py, z)) == t

    @given(st.integers(-(1 << 31), (1 << 31) - 1), st.integers(-(1 << 31), (1 << 31) - 1),
           st.integers(1, 12))
    @settings(max_examples=200, deadline=None)
    def test_point_inside_its_tile_bounds(self, x, y, z):
        from gol_tool_spark.kernels import tile as KT

        t = int(KT.tile_of_point(x, y, z))
        w, s, e, n = KT.tile_bounds(t)
        assert w <= x <= e and s <= y <= n


class TestPolyRoundTripProperty:
    @given(
        st.lists(
            st.tuples(st.integers(-(1 << 30), 1 << 30), st.integers(-(1 << 30), 1 << 30)),
            min_size=3, max_size=12,
        ),
        st.booleans(),
    )
    @settings(max_examples=100, deadline=None)
    def test_parse_inverts_format(self, ring, has_hole):
        """POLY text round-trip: rendered rings (incl. '!' holes) parse back
        within the 7-decimal lon/lat quantization error."""
        from gol_tool_spark.sinks.writers import parse_poly

        lines = ["prop", "1"]
        import math

        def render(r):
            out = []
            for x, y in r:
                lon = x / 4294967296.0 * 360.0
                lat = math.degrees(math.atan(math.sinh(y / 4294967296.0 * 2.0 * math.pi)))
                out.append(f"   {lon:.7E}   {lat:.7E}")
            return out

        lines += render(ring) + ["END"]
        hole = [(x // 2, y // 2) for x, y in ring]
        if has_hole:
            lines += ["!2"] + render(hole) + ["END"]
        lines.append("END")
        parsed = parse_poly("\n".join(lines))
        assert [h for _, h in parsed] == ([False, True] if has_hole else [False])
        for (got, _), want in zip(parsed, [ring, hole]):
            assert len(got) == len(want)
            for (gx, gy), (wx, wy) in zip(got, want):
                assert abs(gx - wx) <= 5000 and abs(gy - wy) <= 5000
