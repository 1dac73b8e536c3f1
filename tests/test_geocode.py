"""Exact twins for the base32 gridhash and the Sobel gradient stats.

gridhash is pure 64-bit integer math — the Python twin replays the mask
ladder with arbitrary-precision ints masked to 64 bits, so equality is
bit-exact.  gradient_stats is exact int64 numpy; the twin is a per-pixel
Python loop (slow but independent of the numpy slicing under test).
"""

from __future__ import annotations

import numpy as np
import pytest

from gol_tool_spark.operators import geocode, multimodal
from gol_tool_spark.kernels import image as IMG

M64 = (1 << 64) - 1


def _spread_py(v: int) -> int:
    for shift, mask in geocode._SPREAD:
        v = ((v | (v << shift)) & mask) & M64
    return v


def _gridhash_py(x: int, y: int, prec: int = 12) -> str:
    xb = (x + (1 << 31)) >> 2
    yb = (y + (1 << 31)) >> 2
    m = _spread_py(xb) | (_spread_py(yb) << 1)
    return "".join(
        geocode.ALPHABET[(m >> (60 - 5 * (i + 1))) & 31] for i in range(prec)
    )


def _coords():
    pts = []
    for i in range(300):
        x = (i * 2654435761) % (1 << 32) - (1 << 31)
        y = (i * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)
        pts.append((i, x, y))
    # the corners and axes
    ext = [(1 << 31) - 1, -(1 << 31), 0, -1, 1]
    for j, (x, y) in enumerate((a, b) for a in ext for b in ext):
        pts.append((1000 + j, x, y))
    return pts


class TestGridhash:
    def test_matches_python_twin(self, spark):
        pts = _coords()
        df = spark.createDataFrame(pts, "id long, x long, y long")
        got = {r.id: r.gh for r in geocode.gridhash_points(df).collect()}
        want = {i: _gridhash_py(x, y) for i, x, y in pts}
        assert got == want

    def test_prefix_property(self, spark):
        # precision-k hash IS the 12-char hash truncated — the rollup
        # hierarchy depends on it
        pts = _coords()[:50]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        full = {r.id: r.gh for r in geocode.gridhash_points(df, precision=12).collect()}
        for k in (1, 4, 7):
            part = {r.id: r.gh for r in geocode.gridhash_points(df, precision=k).collect()}
            assert part == {i: h[:k] for i, h in full.items()}

    def test_locality(self, spark):
        # two points inside one ALIGNED 2^7-unit box share >= 9 chars (60
        # bits minus 2*5 low bits of the >>2'd coords = 50 bits = 10 full
        # chars); a far pair differs at the first char
        df = spark.createDataFrame(
            [(1, 1024, 2048), (2, 1054, 2148), (3, -(1 << 30), 1 << 30)],
            "id long, x long, y long",
        )
        gh = {r.id: r.gh for r in geocode.gridhash_points(df).collect()}
        assert gh[1][:9] == gh[2][:9]
        assert gh[1][0] != gh[3][0]

    def test_rollup_counts(self, spark):
        pts = _coords()
        df = spark.createDataFrame(pts, "id long, x long, y long")
        got = {r.gh_prefix: r.n for r in geocode.gridhash_rollup(df, 3).collect()}
        want: dict[str, int] = {}
        for i, x, y in pts:
            p = _gridhash_py(x, y)[:3]
            want[p] = want.get(p, 0) + 1
        assert got == want

    def test_precision_bounds(self):
        import pyspark.sql.functions as F

        with pytest.raises(ValueError):
            geocode.gridhash(F.col("x"), F.col("y"), 0)
        with pytest.raises(ValueError):
            geocode.gridhash(F.col("x"), F.col("y"), 13)


def _img_df(spark, arrays):
    rows = [
        (f"t{i}", bytearray(IMG.encode(a, "raw")), a.shape[1], a.shape[0], "raw")
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def _sobel_twin(a: np.ndarray, thr: int = 4080):
    h, w = a.shape[:2]
    lum = [[int(a[r, c, 0]) * 299 + int(a[r, c, 1]) * 587 + int(a[r, c, 2]) * 114
            for c in range(w)] for r in range(h)]
    n_edge = gl1 = gxs = gys = 0
    for r in range(1, h - 1):
        for c in range(1, w - 1):
            gx = (lum[r - 1][c + 1] + 2 * lum[r][c + 1] + lum[r + 1][c + 1]
                  - lum[r - 1][c - 1] - 2 * lum[r][c - 1] - lum[r + 1][c - 1])
            gy = (lum[r + 1][c - 1] + 2 * lum[r + 1][c] + lum[r + 1][c + 1]
                  - lum[r - 1][c - 1] - 2 * lum[r - 1][c] - lum[r - 1][c + 1])
            l1 = abs(gx) + abs(gy)
            gl1 += l1
            gxs += abs(gx)
            gys += abs(gy)
            n_edge += l1 > thr
    return n_edge, gl1, gxs, gys


class TestGradientStats:
    def test_matches_loop_twin(self, spark):
        rng = np.random.default_rng(7)
        arrays = [rng.integers(0, 256, (12, 9, 3), np.uint8) for _ in range(4)]
        out = {r.image_id: r for r in multimodal.gradient_stats(_img_df(spark, arrays)).collect()}
        for i, a in enumerate(arrays):
            r = out[f"t{i}"]
            n_edge, gl1, gxs, gys = _sobel_twin(a)
            assert (r.n_edge, r.grad_l1_sum, r.gx_abs_sum, r.gy_abs_sum) == (
                n_edge, gl1, gxs, gys,
            )
            assert r.n_interior == 10 * 7

    def test_constant_image_is_flat(self, spark):
        a = np.full((8, 8, 3), 137, np.uint8)
        r = multimodal.gradient_stats(_img_df(spark, [a])).first()
        assert (r.n_edge, r.grad_l1_sum, r.gx_abs_sum, r.gy_abs_sum) == (0, 0, 0, 0)

    def test_vertical_edge_is_gx_only(self, spark):
        a = np.zeros((8, 8, 3), np.uint8)
        a[:, 4:, :] = 255
        r = multimodal.gradient_stats(_img_df(spark, [a])).first()
        assert r.gy_abs_sum == 0 and r.gx_abs_sum > 0
        assert r.n_edge > 0

    def test_transpose_swaps_axes(self, spark):
        rng = np.random.default_rng(11)
        a = rng.integers(0, 256, (10, 14, 3), np.uint8)
        at = np.ascontiguousarray(a.transpose(1, 0, 2))
        out = {r.image_id: r for r in multimodal.gradient_stats(_img_df(spark, [a, at])).collect()}
        assert out["t0"].gx_abs_sum == out["t1"].gy_abs_sum
        assert out["t0"].gy_abs_sum == out["t1"].gx_abs_sum
        assert out["t0"].grad_l1_sum == out["t1"].grad_l1_sum

    def test_too_small_for_kernel(self, spark):
        a = np.full((2, 2, 3), 9, np.uint8)
        r = multimodal.gradient_stats(_img_df(spark, [a])).first()
        assert (r.n_interior, r.n_edge, r.grad_l1_sum) == (0, 0, 0)


class TestBlurStats:
    def test_matches_loop_twin(self, spark):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (9, 11, 3), np.uint8)
        r = multimodal.blur_stats(_img_df(spark, [a])).first()
        lum = [[int(a[i, j, 0]) * 299 + int(a[i, j, 1]) * 587 + int(a[i, j, 2]) * 114
                for j in range(11)] for i in range(9)]
        ls = lq = 0
        for i in range(1, 8):
            for j in range(1, 10):
                lap = 4 * lum[i][j] - lum[i - 1][j] - lum[i + 1][j] - lum[i][j - 1] - lum[i][j + 1]
                ls += lap
                lq += lap * lap
        assert (r.n_interior, r.lap_sum, r.lap_sq_sum) == (7 * 9, ls, lq)

    def test_linear_gradient_is_harmonic(self, spark):
        # affine luminance field -> Laplacian identically zero
        a = np.zeros((8, 8, 3), np.uint8)
        for i in range(8):
            for j in range(8):
                a[i, j, :] = 3 * i + 5 * j
        r = multimodal.blur_stats(_img_df(spark, [a])).first()
        assert (r.lap_sum, r.lap_sq_sum) == (0, 0)
        assert r.n_interior == 36

    def test_texture_beats_flat(self, spark):
        flat = np.full((8, 8, 3), 100, np.uint8)
        rng = np.random.default_rng(5)
        tex = rng.integers(0, 256, (8, 8, 3), np.uint8)
        out = {r.image_id: r for r in multimodal.blur_stats(_img_df(spark, [flat, tex])).collect()}
        assert out["t0"].lap_sq_sum == 0
        assert out["t1"].lap_sq_sum > 0


def _morans_twin(points, shift):
    cells: dict[tuple, int] = {}
    for x, y in points:
        k = ((x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift)
        cells[k] = cells.get(k, 0) + 1
    n = len(cells)
    t = sum(cells.values())
    zs = {k: n * c - t for k, c in cells.items()}
    num = w = 0
    for (cx, cy), zi in zs.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (cx + dx, cy + dy)
            if nb in zs:
                num += zi * zs[nb]
                w += 1
    den = sum(v * v for v in zs.values())
    return n, w, num, den


class TestMoransI:
    def _pts(self):
        pts = []
        for i in range(500):
            # two dense clusters + uniform background
            if i % 3 == 0:
                x = 1000 + (i * 7919) % 50_000
                y = 2000 + (i * 104729) % 50_000
            elif i % 3 == 1:
                x = (1 << 28) + (i * 7919) % 50_000
                y = -(1 << 28) + (i * 104729) % 50_000
            else:
                x = (i * 2654435761) % (1 << 32) - (1 << 31)
                y = (i * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)
            pts.append((x, y))
        return pts

    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import geostats

        pts = self._pts()
        df = spark.createDataFrame(pts, "x long, y long")
        r = geostats.morans_i(df, cell_shift=14).first()
        n, w, num, den = _morans_twin(pts, 14)
        assert (r.n_cells, r.w_pairs, int(r.num), int(r.den)) == (n, w, num, den)
        assert w > 0 and den > 0  # non-vacuous

    def test_clustered_is_positive(self, spark):
        from gol_tool_spark.operators import geostats

        # a tight blob in one corner of a coarse grid: neighboring
        # occupied cells share high counts -> positive autocorrelation
        pts = [(i * 31 % 4000, i * 17 % 4000) for i in range(300)]
        pts += [((1 << 30) + (i * 131071) % (1 << 30), (i * 524287) % (1 << 30)) for i in range(50)]
        df = spark.createDataFrame(pts, "x long, y long")
        r = geostats.morans_i(df, cell_shift=28).first()
        n, w, num, den = _morans_twin(pts, 28)
        assert (r.n_cells, r.w_pairs, int(r.num), int(r.den)) == (n, w, num, den)
        if w and den:
            assert n * num / (w * den) > 0

    def test_isolated_cells_have_no_pairs(self, spark):
        from gol_tool_spark.operators import geostats

        # cells far apart -> W = 0, num NULL (no adjacent pairs)
        df = spark.createDataFrame(
            [(0, 0), (1 << 30, 1 << 30), (-(1 << 30), -(1 << 30))], "x long, y long"
        )
        r = geostats.morans_i(df, cell_shift=26).first()
        assert r.w_pairs == 0 and int(r.num) == 0
        assert int(r.den) == 0  # equal counts -> zero deviations


def _gi_twin(points, shift):
    cells: dict[tuple, int] = {}
    for x, y in points:
        k = ((x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift)
        cells[k] = cells.get(k, 0) + 1
    n = len(cells)
    t = sum(cells.values())
    out = {}
    for (cx, cy) in cells:
        w_i = lsum = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in cells:
                    w_i += 1
                    lsum += cells[nb]
        out[(cx, cy)] = (cells[(cx, cy)], w_i, lsum, n * lsum - w_i * t)
    return out


class TestGetisOrd:
    def _pts(self):
        pts = [(i * 31 % 4000, i * 17 % 4000) for i in range(300)]
        pts += [((1 << 30) + (i * 131071) % (1 << 28), (i * 524287) % (1 << 28)) for i in range(60)]
        pts += [((i * 2654435761) % (1 << 32) - (1 << 31),
                 (i * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)) for i in range(100)]
        return pts

    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import geostats

        pts = self._pts()
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r.cx, r.cy): (r.c, r.w_i, r.lsum, int(r.num))
               for r in geostats.getis_ord(df, cell_shift=27).collect()}
        assert got == _gi_twin(pts, 27)
        assert any(v[1] > 1 for v in got.values())  # some cell has neighbors

    def test_hot_cell_positive_cold_negative(self, spark):
        from gol_tool_spark.operators import geostats

        # one dense 3x3 block + sparse singles far away: the blob's center
        # numerator must be positive, a far single cell's negative
        pts = [(dx * 100, dy * 100) for dx in range(3) for dy in range(3) for _ in range(20)]
        pts += [((1 << 29) + i * (1 << 27), -(1 << 29) - i * (1 << 27)) for i in range(4)]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = {(r.cx, r.cy): int(r.num) for r in geostats.getis_ord(df, cell_shift=26).collect()}
        twin = _gi_twin(pts, 26)
        assert rows == {k: v[3] for k, v in twin.items()}
        assert max(rows.values()) > 0 and min(rows.values()) < 0

    def test_isolated_cell_w1(self, spark):
        from gol_tool_spark.operators import geostats

        pts = [(0, 0), ((1 << 30), (1 << 30))]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = {(r.cx, r.cy): (r.w_i, r.lsum) for r in geostats.getis_ord(df, cell_shift=26).collect()}
        assert all(v == (1, 1) for v in rows.values())


def _geary_twin(points, shift):
    cells: dict[tuple, int] = {}
    for x, y in points:
        k = ((x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift)
        cells[k] = cells.get(k, 0) + 1
    n = len(cells)
    t = sum(cells.values())
    num = w = 0
    for (cx, cy), c in cells.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (cx + dx, cy + dy)
            if nb in cells:
                w += 1
                num += (c - cells[nb]) ** 2
    den = sum((n * c - t) ** 2 for c in cells.values())
    return n, w, num, den


class TestGearysC:
    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import geostats

        pts = [(i * 31 % 4000, i * 17 % 4000) for i in range(300)]
        pts += [((1 << 30) + (i * 131071) % (1 << 28), (i * 524287) % (1 << 28)) for i in range(60)]
        pts += [((i * 2654435761) % (1 << 32) - (1 << 31),
                 (i * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)) for i in range(100)]
        df = spark.createDataFrame(pts, "x long, y long")
        r = geostats.gearys_c(df, cell_shift=27).first()
        n, w, num, den = _geary_twin(pts, 27)
        assert (r.n_cells, r.w_pairs, int(r.num), int(r.den)) == (n, w, num, den)
        assert w > 0 and den > 0

    def test_smooth_gradient_low_contrast(self, spark):
        from gol_tool_spark.operators import geostats

        # equal counts on every occupied cell: all pair contrasts are 0
        # (C numerator 0 = perfect positive autocorrelation) and the
        # denominator is 0 too (no deviations) — both exact
        pts = [(cx * 100 + i, cy * 100 + i) for cx in range(4) for cy in range(4) for i in range(5)]
        df = spark.createDataFrame(pts, "x long, y long")
        r = geostats.gearys_c(df, cell_shift=26).first()
        n, w, num, den = _geary_twin(pts, 26)
        assert (r.n_cells, r.w_pairs, int(r.num), int(r.den)) == (n, w, num, den)
        assert int(r.num) == 0 and int(r.den) == 0

    def test_checkerboard_contrast_positive(self, spark):
        from gol_tool_spark.operators import geostats

        # true checkerboard (alternating in BOTH axes): every adjacency
        # is a dense/sparse contrast -> C > 1 (negative autocorrelation)
        pts = []
        for cx in range(6):
            for cy in range(6):
                reps = 12 if (cx + cy) % 2 == 0 else 2
                pts += [(cx * 64 + j % 8, cy * 64 + j // 8) for j in range(reps)]
        df = spark.createDataFrame(pts, "x long, y long")
        r = geostats.gearys_c(df, cell_shift=6).first()
        n, w, num, den = _geary_twin(pts, 6)
        assert (r.n_cells, r.w_pairs, int(r.num), int(r.den)) == (n, w, num, den)
        # C = (n-1)/(2w) * n^2*num/den > 1 flags negative autocorrelation
        assert (n - 1) * n * n * num / (2 * w * den) > 1

    def test_isolated_cells_zero_pairs(self, spark):
        from gol_tool_spark.operators import geostats

        df = spark.createDataFrame(
            [(0, 0), (1 << 30, 1 << 30), (-(1 << 30), -(1 << 30))], "x long, y long"
        )
        r = geostats.gearys_c(df, cell_shift=26).first()
        assert r.w_pairs == 0 and int(r.num) == 0 and int(r.den) == 0


def _ripley_twin(points, radii):
    # brute-force ordered pair counts (points small enough to square)
    n = len(points)
    out = []
    for r in radii:
        r2 = r * r
        pairs = sum(
            1
            for i, (xi, yi) in enumerate(points)
            for j, (xj, yj) in enumerate(points)
            if i != j and (xi - xj) ** 2 + (yi - yj) ** 2 <= r2
        )
        out.append((r, n, pairs))
    return out


class TestRipleyK:
    def test_matches_bruteforce(self, spark):
        from gol_tool_spark.operators import geostats

        pts = [(i, (i * 7919) % 400_000, (i * 104729) % 400_000) for i in range(250)]
        pts += [(1000 + i, (1 << 28) + i * 3, -(1 << 28) + i * 5) for i in range(40)]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        radii = [1_000, 30_000, 200_000]
        got = sorted(
            (r.r, r.n_pts, r.pairs)
            for r in geostats.ripley_k(df, radii).collect()
        )
        assert got == sorted(_ripley_twin([(x, y) for _, x, y in pts], radii))
        # curve is monotone in r and non-vacuous at the largest radius
        by_r = dict((g[0], g[2]) for g in got)
        assert by_r[1_000] <= by_r[30_000] <= by_r[200_000] and by_r[200_000] > 0

    def test_coincident_points_count(self, spark):
        from gol_tool_spark.operators import geostats

        # duplicates at one coordinate: all ordered pairs qualify at r=0
        df = spark.createDataFrame(
            [(1, 5, 5), (2, 5, 5), (3, 5, 5), (4, 1 << 29, 1 << 29)],
            "id long, x long, y long",
        )
        got = {r.r: r.pairs for r in geostats.ripley_k(df, [0, 1]).collect()}
        assert got == {0: 6, 1: 6}

    def test_boundary_pairs_meet_across_cells(self, spark):
        from gol_tool_spark.operators import geostats

        # two points straddling a cell boundary at exactly distance r:
        # <= is inclusive and the 3x3 ring must find the pair
        r = 4096
        df = spark.createDataFrame(
            [(1, -1, 0), (2, r - 1, 0), (3, 10 * r, 10 * r)],
            "id long, x long, y long",
        )
        got = {row.r: row.pairs for row in geostats.ripley_k(df, [r]).collect()}
        assert got == {r: 2}

    def test_guards(self, spark):
        import pytest as _pytest
        from gol_tool_spark.operators import geostats

        df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
        with _pytest.raises(ValueError):
            geostats.ripley_k(df, [])
        with _pytest.raises(ValueError):
            geostats.ripley_k(df, [1 << 31])


class TestLuminanceHistogram:
    def test_matches_loop_twin(self, spark):
        rng = np.random.default_rng(13)
        arrays = [rng.integers(0, 256, (9, 7, 3), np.uint8) for _ in range(3)]
        out = {r.image_id: r
               for r in multimodal.luminance_histogram(_img_df(spark, arrays)).collect()}
        for i, a in enumerate(arrays):
            want = [0] * 16
            lmin, lmax = 256, -1
            for rr in range(9):
                for cc in range(7):
                    lum = (int(a[rr, cc, 0]) * 299 + int(a[rr, cc, 1]) * 587
                           + int(a[rr, cc, 2]) * 114) // 1000
                    want[lum * 16 // 256] += 1
                    lmin, lmax = min(lmin, lum), max(lmax, lum)
            r = out[f"t{i}"]
            assert (list(r.hist), r.n_px, r.lum_min, r.lum_max) == (want, 63, lmin, lmax)
            assert sum(r.hist) == r.n_px

    def test_constant_image_single_bin(self, spark):
        a = np.full((8, 8, 3), 200, np.uint8)
        r = multimodal.luminance_histogram(_img_df(spark, [a])).first()
        assert sum(1 for v in r.hist if v) == 1
        assert r.hist[200 * 16 // 256] == 64
        assert r.lum_min == r.lum_max == 200

    def test_black_white_split(self, spark):
        a = np.zeros((4, 8, 3), np.uint8)
        a[:, 4:, :] = 255
        r = multimodal.luminance_histogram(_img_df(spark, [a])).first()
        assert r.hist[0] == 16 and r.hist[15] == 16
        assert (r.lum_min, r.lum_max) == (0, 255)

    def test_bins_guard(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            multimodal.luminance_histogram(
                _img_df(spark, [np.zeros((2, 2, 3), np.uint8)]), bins=0)


def _kde_twin(points, shift, r):
    cells: dict = {}
    for x, y in points:
        k = ((x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift)
        cells[k] = cells.get(k, 0) + 1
    out: dict = {}
    for (cx, cy), c in cells.items():
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                w = c * (r + 1 - abs(dx)) * (r + 1 - abs(dy))
                k = (cx + dx, cy + dy)
                out[k] = out.get(k, 0) + w
    return out


class TestKdeRaster:
    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import geostats

        pts = [(i * 31 % 4000, i * 17 % 4000) for i in range(200)]
        pts += [((i * 2654435761) % (1 << 32) - (1 << 31),
                 (i * 2246822519 + 1013904223) % (1 << 32) - (1 << 31)) for i in range(80)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r_.cx, r_.cy): r_.w_sum
               for r_ in geostats.kde_raster(df, cell_shift=27, radius=2).collect()}
        assert got == _kde_twin(pts, 27, 2)

    def test_single_point_pyramid(self, spark):
        from gol_tool_spark.operators import geostats

        # one point, r=1: center 4, edge-neighbors 2, corners 1 (sum 16)
        df = spark.createDataFrame([(100, 100)], "x long, y long")
        got = {(r_.cx, r_.cy): r_.w_sum
               for r_ in geostats.kde_raster(df, cell_shift=26, radius=1).collect()}
        c = (100 + (1 << 31)) >> 26
        assert got[(c, c)] == 4
        assert got[(c + 1, c)] == got[(c, c - 1)] == 2
        assert got[(c + 1, c + 1)] == 1
        assert sum(got.values()) == 16 and len(got) == 9

    def test_mass_conservation(self, spark):
        from gol_tool_spark.operators import geostats

        # total spread weight = n_points * (sum of kernel) for any layout
        pts = [((i * 7919) % 100000, (i * 104729) % 100000) for i in range(150)]
        df = spark.createDataFrame(pts, "x long, y long")
        r = 2
        kernel_mass = sum((r + 1 - abs(dx)) * (r + 1 - abs(dy))
                          for dx in range(-r, r + 1) for dy in range(-r, r + 1))
        tot = sum(r_.w_sum for r_ in geostats.kde_raster(df, cell_shift=24, radius=r).collect())
        assert tot == 150 * kernel_mass

    def test_radius_guard(self, spark):
        import pytest as _pytest
        from gol_tool_spark.operators import geostats

        df = spark.createDataFrame([(0, 0)], "x long, y long")
        with _pytest.raises(ValueError):
            geostats.kde_raster(df, radius=0)


class TestJoinCounts:
    @staticmethod
    def _twin(pts, shift, min_count):
        cells: dict = {}
        for x, y in pts:
            c = ((x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift)
            cells[c] = cells.get(c, 0) + 1
        mark = {c: int(n >= min_count) for c, n in cells.items()}
        bb = ww = bw = w = 0
        for (cx, cy), bi in mark.items():
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                bj = mark.get((cx + dx, cy + dy))
                if bj is None:
                    continue
                w += 1
                if bi and bj:
                    bb += 1
                elif not bi and not bj:
                    ww += 1
                else:
                    bw += 1
        return (len(mark), sum(mark.values()), w, bb, ww, bw)

    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import geostats

        pts = []
        for i in range(500):
            x = ((i * 2654435761) % (1 << 32)) - (1 << 31)
            y = ((i * 2246822519 + 17) % (1 << 32)) - (1 << 31)
            if i % 3 == 0:  # dense patch to create Black cells
                x, y = (i % 10) << 26, (i % 7) << 26
            pts.append((x, y))
        df = spark.createDataFrame(pts, "x long, y long")
        row = geostats.join_counts(df, cell_shift=27, min_count=3).collect()[0]
        got = (row.n_cells, row.n_black, row.w_pairs, row.bb, row.ww, row.bw)
        assert got == self._twin(pts, 27, 3)
        assert row.bb + row.ww + row.bw == row.w_pairs
        assert 0 < row.n_black < row.n_cells  # both colors present

    def test_checkerboard_all_mixed(self, spark):
        from gol_tool_spark.operators import geostats

        # 4x4 lattice, 2 points on black squares, 1 on white: every rook
        # edge crosses colors
        pts = []
        for cx in range(4):
            for cy in range(4):
                x, y = (cx << 26) - (1 << 31) + 5, (cy << 26) - (1 << 31) + 5
                pts.append((x, y))
                if (cx + cy) % 2 == 0:
                    pts.append((x + 1, y))
        df = spark.createDataFrame(pts, "x long, y long")
        row = geostats.join_counts(df, cell_shift=26, min_count=2).collect()[0]
        assert (row.n_cells, row.n_black) == (16, 8)
        assert row.bb == 0 and row.ww == 0 and row.bw == row.w_pairs == 48

    def test_solid_block_no_mixed(self, spark):
        from gol_tool_spark.operators import geostats

        pts = []
        for cx in range(3):
            for cy in range(3):
                x, y = (cx << 26), (cy << 26)
                pts.append((x, y))
                pts.append((x + 1, y + 1))
        df = spark.createDataFrame(pts, "x long, y long")
        row = geostats.join_counts(df, cell_shift=26, min_count=2).collect()[0]
        assert row.n_black == row.n_cells == 9
        assert row.bw == 0 and row.ww == 0 and row.bb == row.w_pairs == 24


def _otsu_twin(a: np.ndarray):
    """Brute-force exact Otsu over raw pixels (arbitrary-precision ints)."""
    h, w = a.shape[:2]
    lums = []
    for rr in range(h):
        for cc in range(w):
            lums.append((int(a[rr, cc, 0]) * 299 + int(a[rr, cc, 1]) * 587
                         + int(a[rr, cc, 2]) * 114) // 1000)
    npx, total_s = len(lums), sum(lums)
    best = None
    for t in range(255):
        n0 = sum(1 for v in lums if v <= t)
        if n0 == 0 or n0 == npx:
            continue
        s0 = sum(v for v in lums if v <= t)
        d = s0 * npx - total_s * n0
        num, den = d * d, n0 * (npx - n0)
        if best is None or num * best[2] > best[1] * den:
            best = (t, num, den, n0, s0)
    if best is None:
        return (lums[0], npx, 0, total_s, 0)
    t, _, _, n0, s0 = best
    return (t, n0, npx - n0, s0, total_s - s0)


class TestOtsuThreshold:
    def test_matches_brute_twin(self, spark):
        rng = np.random.default_rng(29)
        arrays = [rng.integers(0, 256, (8, 6, 3), np.uint8) for _ in range(4)]
        # make one clearly bimodal
        arrays[0][:, :3, :] = 10
        arrays[0][:, 3:, :] = 240
        out = {r.image_id: r
               for r in multimodal.otsu_threshold(_img_df(spark, arrays)).collect()}
        for i, a in enumerate(arrays):
            r = out[f"t{i}"]
            got = (r.threshold, r.n_bg, r.n_fg, r.s_bg, r.s_fg)
            assert got == _otsu_twin(a), i
            assert r.n_bg + r.n_fg == r.n_px == 48

    def test_bimodal_splits_between_modes(self, spark):
        a = np.zeros((4, 8, 3), np.uint8)
        a[:, 4:, :] = 200
        r = multimodal.otsu_threshold(_img_df(spark, [a])).first()
        assert 0 <= r.threshold < 200
        assert r.n_bg == 16 and r.n_fg == 16
        assert r.s_bg == 0 and r.s_fg == 16 * 200

    def test_constant_image(self, spark):
        a = np.full((5, 5, 3), 77, np.uint8)
        r = multimodal.otsu_threshold(_img_df(spark, [a])).first()
        assert (r.threshold, r.n_bg, r.n_fg) == (77, 25, 0)
        assert r.s_bg == 25 * 77 and r.s_fg == 0


def _bfs_twin(pts, shift, seed_min, max_hops):
    from collections import deque

    cells: dict = {}
    for x, y in pts:
        c = ((x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift)
        cells[c] = cells.get(c, 0) + 1
    dist = {c: 0 for c, n in cells.items() if n >= seed_min}
    q = deque(dist)
    while q:
        c = q.popleft()
        if dist[c] >= max_hops:
            continue
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (c[0] + dx, c[1] + dy)
            if nb in cells and nb not in dist:
                dist[nb] = dist[c] + 1
                q.append(nb)
    return dist


class TestGridDistance:
    def test_matches_bfs_twin(self, spark):
        from gol_tool_spark.operators import geostats

        pts = []
        for i in range(300):
            # snake of cells with a dense head, plus scattered noise
            if i % 2 == 0:
                k = i // 2
                pts.append(((k % 12) << 26, ((k // 12) % 6) << 26))
            else:
                pts.append((((i * 2654435761) % (1 << 32)) - (1 << 31),
                            ((i * 2246822519) % (1 << 32)) - (1 << 31)))
        pts += [(0, 0)] * 5  # dense seed at origin cell
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r.cx, r.cy): r.dist
               for r in geostats.grid_distance(
                   df, cell_shift=26, seed_min_count=5, max_hops=4).collect()}
        assert got == _bfs_twin(pts, 26, 5, 4)
        assert got and max(got.values()) > 0  # actually expanded

    def test_zero_hops_returns_seeds_only(self, spark):
        from gol_tool_spark.operators import geostats

        pts = [(0, 0), (0, 0), (1 << 26, 0)]
        df = spark.createDataFrame(pts, "x long, y long")
        out = geostats.grid_distance(df, cell_shift=26, seed_min_count=2,
                                     max_hops=0).collect()
        assert len(out) == 1 and out[0].dist == 0

    def test_disconnected_island_unreached(self, spark):
        from gol_tool_spark.operators import geostats

        # seed cell + neighbor, plus an occupied island 10 cells away
        pts = [(0, 0), (0, 0), (1 << 26, 0), (10 << 26, 0)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r.cx, r.cy): r.dist
               for r in geostats.grid_distance(
                   df, cell_shift=26, seed_min_count=2, max_hops=6).collect()}
        assert len(got) == 2 and set(got.values()) == {0, 1}


def _cc_twin(mask):
    """BFS 4-connectivity components over a boolean 2-D mask."""
    from collections import deque

    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    sizes = []
    for r in range(h):
        for c in range(w):
            if mask[r, c] and not seen[r, c]:
                sz = 0
                q = deque([(r, c)])
                seen[r, c] = True
                while q:
                    rr, cc = q.popleft()
                    sz += 1
                    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        nr, nc = rr + dr, cc + dc
                        if 0 <= nr < h and 0 <= nc < w and mask[nr, nc] and not seen[nr, nc]:
                            seen[nr, nc] = True
                            q.append((nr, nc))
                sizes.append(sz)
    return len(sizes), (max(sizes) if sizes else 0)


class TestMaskComponents:
    @staticmethod
    def _lum_mask(a, thr):
        p = a.astype(np.int64)
        return (p[..., 0] * 299 + p[..., 1] * 587 + p[..., 2] * 114) // 1000 >= thr

    def test_matches_bfs_twin(self, spark):
        rng = np.random.default_rng(41)
        arrays = [(rng.integers(0, 2, (10, 9, 1), np.uint8) * 255
                   ).repeat(3, axis=2) for _ in range(4)]
        out = {r.image_id: r
               for r in multimodal.mask_components(_img_df(spark, arrays), thr=128).collect()}
        for i, a in enumerate(arrays):
            m = self._lum_mask(a, 128)
            ncc, lg = _cc_twin(m)
            r = out[f"t{i}"]
            assert (r.n_components, r.largest_px, r.n_fg) == (ncc, lg, int(m.sum())), i
            assert r.n_px == 90

    def test_u_shape_single_component(self, spark):
        # a U connects across rows only through the bottom — exercises
        # the union path between non-adjacent columns
        a = np.zeros((5, 7, 3), np.uint8)
        a[:, 1, :] = 255
        a[:, 5, :] = 255
        a[4, 1:6, :] = 255
        r = multimodal.mask_components(_img_df(spark, [a]), thr=128).first()
        assert r.n_components == 1 and r.largest_px == r.n_fg == 13

    def test_blank_and_full(self, spark):
        blank = np.zeros((6, 6, 3), np.uint8)
        full = np.full((6, 6, 3), 255, np.uint8)
        out = {r.image_id: r
               for r in multimodal.mask_components(_img_df(spark, [blank, full])).collect()}
        assert (out["t0"].n_components, out["t0"].n_fg) == (0, 0)
        assert (out["t1"].n_components, out["t1"].largest_px) == (1, 36)

    def test_checkerboard_worst_case(self, spark):
        a = np.zeros((8, 8, 3), np.uint8)
        a[::2, ::2, :] = 255
        a[1::2, 1::2, :] = 255
        r = multimodal.mask_components(_img_df(spark, [a]), thr=128).first()
        assert r.n_components == 32 and r.largest_px == 1


class TestDominantColor:
    def test_matches_loop_twin(self, spark):
        rng = np.random.default_rng(53)
        arrays = [rng.integers(0, 256, (7, 5, 3), np.uint8) for _ in range(3)]
        out = {r.image_id: r
               for r in multimodal.dominant_color(_img_df(spark, arrays), bits=4).collect()}
        for i, a in enumerate(arrays):
            counts: dict = {}
            for rr in range(7):
                for cc in range(5):
                    code = ((int(a[rr, cc, 0]) >> 4) << 8) | ((int(a[rr, cc, 1]) >> 4) << 4) | (int(a[rr, cc, 2]) >> 4)
                    counts[code] = counts.get(code, 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            r = out[f"t{i}"]
            assert (r.dom_code, r.dom_px, r.n_codes) == (best[0], best[1], len(counts)), i

    def test_solid_color_and_centers(self, spark):
        a = np.zeros((4, 4, 3), np.uint8)
        a[..., 0] = 250  # bin 15 -> center floor(31*256/32) = 248
        a[..., 1] = 3    # bin 0 -> center 8
        a[..., 2] = 130  # bin 8 -> center 136
        r = multimodal.dominant_color(_img_df(spark, [a]), bits=4).first()
        assert (r.n_codes, r.dom_px) == (1, 16)
        assert (r.dom_r, r.dom_g, r.dom_b) == (248, 8, 136)

    def test_tie_breaks_to_smallest_code(self, spark):
        a = np.zeros((2, 2, 3), np.uint8)
        a[0, :, :] = 0     # code 0 x2
        a[1, :, :] = 255   # code 4095 x2
        r = multimodal.dominant_color(_img_df(spark, [a]), bits=4).first()
        assert r.dom_code == 0 and r.dom_px == 2 and r.n_codes == 2


def _lisa_twin(points, shift):
    cells: dict[tuple, int] = {}
    for x, y in points:
        k = ((x + (1 << 31)) >> shift, (y + (1 << 31)) >> shift)
        cells[k] = cells.get(k, 0) + 1
    n = len(cells)
    t = sum(cells.values())
    zs = {k: n * c - t for k, c in cells.items()}
    out = {}
    for (cx, cy), zi in zs.items():
        lag = w = 0
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (cx + dx, cy + dy)
            if nb in zs:
                lag += zs[nb]
                w += 1
        quad = None
        if w and zi and lag:
            quad = ("H" if zi > 0 else "L") + ("H" if lag > 0 else "L")
        out[(cx, cy)] = (cells[(cx, cy)], w, str(zi), str(lag), str(zi * lag), quad)
    return out


class TestLocalMorans:
    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import geostats

        pts = TestMoransI._pts(TestMoransI())
        df = spark.createDataFrame(pts, "x long, y long")
        got = {
            (r.cx, r.cy): (r.c, r.w, r.zs, r.lag, r.num, r.quad)
            for r in geostats.local_morans(df, cell_shift=14).collect()
        }
        expect = _lisa_twin(pts, 14)
        assert got == expect
        quads = {v[5] for v in got.values() if v[5]}
        assert "HH" in quads  # the clusters produce hotspot cores

    def test_sums_to_global_numerator(self, spark):
        from gol_tool_spark.operators import geostats

        pts = TestMoransI._pts(TestMoransI())
        df = spark.createDataFrame(pts, "x long, y long")
        local = geostats.local_morans(df, cell_shift=14).collect()
        glob = geostats.morans_i(df, cell_shift=14).first()
        assert sum(int(r.num) for r in local) == int(glob.num)
        assert sum(r.w for r in local) == glob.w_pairs

    def test_isolated_cell_is_null_quad(self, spark):
        from gol_tool_spark.operators import geostats

        df = spark.createDataFrame(
            [(0, 0), (1 << 30, 1 << 30), (1 << 30, (1 << 30) + 100)], "x long, y long"
        )
        got = {
            (r.cx, r.cy): (r.c, r.w, r.quad) for r in geostats.local_morans(df, cell_shift=26).collect()
        }
        assert len(got) == 2
        assert all(v[1] == 0 and v[2] is None for v in got.values())
