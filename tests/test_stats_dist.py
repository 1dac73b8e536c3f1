"""grouped_percentiles vs numpy linear interpolation; value_histogram vs
a numpy bucket oracle incl. the WIDTH_BUCKET edge semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gol_tool_spark.operators import stats


def test_grouped_percentiles_match_numpy(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {"g": rng.integers(0, 4, 800), "v": rng.normal(100, 30, 800).round(4)}
    )
    got = {
        r["g"]: (r["p50"], r["p90"], r["p99"])
        for r in stats.grouped_percentiles(
            spark.createDataFrame(pdf), ["g"], "v", [0.5, 0.9, 0.99]
        ).collect()
    }
    for g, grp in pdf.groupby("g"):
        want = np.percentile(grp["v"], [50, 90, 99])  # linear interpolation
        np.testing.assert_allclose(got[g], want, rtol=1e-12)


def test_value_histogram_edges(spark):
    pdf = pd.DataFrame(
        {"v": [-5.0, 0.0, 9.999, 10.0, 49.9, 50.0, 55.0, None]}
    )
    got = {
        (r["bucket"],): r["n"]
        for r in stats.value_histogram(
            spark.createDataFrame(pdf), "v", 0.0, 50.0, 5
        ).collect()
    }
    # below-range -> 0; hi and above -> n+1; [0,10) -> 1; NULL -> NULL bucket
    assert got[(0,)] == 1
    assert got[(1,)] == 2
    assert got[(2,)] == 1
    assert got[(5,)] == 1
    assert got[(6,)] == 2
    assert got[(None,)] == 1


def test_value_histogram_grouped_counts(spark):
    rng = np.random.default_rng(6)
    pdf = pd.DataFrame(
        {"g": rng.integers(0, 3, 500), "v": rng.uniform(-10, 110, 500).round(3)}
    )
    got = {
        (r["g"], r["bucket"]): r["n"]
        for r in stats.value_histogram(
            spark.createDataFrame(pdf), "v", 0.0, 100.0, 10, group_cols=["g"]
        ).collect()
    }
    want: dict = {}
    for g, v in zip(pdf["g"], pdf["v"]):
        b = 0 if v < 0 else 11 if v >= 100 else 1 + int(np.floor(v / 100.0 * 10))
        want[(g, b)] = want.get((g, b), 0) + 1
    assert got == want


def _skyline_twin(pts):
    out = {}
    for qx, qy in pts:
        dominated = any(
            px <= qx and py <= qy and (px < qx or py < qy) for px, py in pts
        )
        if not dominated:
            out[(qx, qy)] = out.get((qx, qy), 0) + 1
    return out


class TestSkyline2d:
    def test_matches_bruteforce(self, spark):
        from gol_tool_spark.operators import stats

        pts = [
            ((i * 7919) % 100_000 - 50_000, (i * 104729) % 100_000 - 50_000)
            for i in range(500)
        ]
        pts += [pts[3], pts[7]]  # exact duplicates
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r.x, r.y): r.cnt for r in stats.skyline2d(df, bucket_shift=40).collect()}
        assert got == _skyline_twin(pts)
        assert got  # non-vacuous
        # bucket width must not change the answer
        fine = {(r.x, r.y): r.cnt for r in stats.skyline2d(df, bucket_shift=28).collect()}
        assert fine == got

    def test_duplicates_survive_together(self, spark):
        from gol_tool_spark.operators import stats

        df = spark.createDataFrame(
            [(0, 0), (0, 0), (5, 5), (1, -1)], "x long, y long"
        )
        got = {(r.x, r.y): r.cnt for r in stats.skyline2d(df).collect()}
        # (5,5) dominated by (0,0); (1,-1) and (0,0) incomparable
        assert got == {(0, 0): 2, (1, -1): 1}

    def test_anticorrelated_staircase(self, spark):
        from gol_tool_spark.operators import stats

        pts = [(i, 100 - i) for i in range(0, 100, 7)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r.x, r.y): r.cnt for r in stats.skyline2d(df, bucket_shift=3).collect()}
        assert got == {p: 1 for p in pts}  # nothing dominates anything


def _gini_twin(rows):
    from collections import defaultdict

    per = defaultdict(list)
    for k, v in rows:
        per[k].append(v)
    out = {}
    for k, vs in per.items():
        vs.sort()
        n = len(vs)
        num = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(vs))
        out[k] = (n, str(sum(vs)), str(num))
    return out


class TestGiniConcentration:
    def test_matches_bruteforce(self, spark):
        rows = [(f"g{i % 5}", (i * 7919) % 1000) for i in range(400)]
        df = spark.createDataFrame(rows, "k string, v long")
        got = {
            r.k: (r.n, r.total, r.gini_num)
            for r in stats.gini_concentration(df, ["k"], "v").collect()
        }
        assert got == _gini_twin(rows)

    def test_extremes(self, spark):
        # perfectly equal -> gini_num 0; one-has-everything -> (n-1)*total
        rows = [("eq", 5)] * 6 + [("one", 0)] * 5 + [("one", 100)]
        df = spark.createDataFrame(rows, "k string, v long")
        got = {
            r.k: (r.n, int(r.total), int(r.gini_num))
            for r in stats.gini_concentration(df, ["k"], "v").collect()
        }
        assert got["eq"] == (6, 30, 0)
        assert got["one"] == (6, 100, 5 * 100)  # gini = 500/600

    def test_tie_invariance_and_validation(self, spark):
        import pytest

        rows = [("a", 3), ("a", 3), ("a", 3), ("a", 9)]
        df = spark.createDataFrame(rows, "k string, v long")
        r = stats.gini_concentration(df, ["k"], "v").collect()[0]
        assert (r.n, r.total, r.gini_num) == (4, "18", str((2 * 4 - 5) * 9 + (2 + 4 + 6 - 15) * 3))
        with pytest.raises(ValueError):
            stats.gini_concentration(df, [], "v")


class TestKendallTau:
    @staticmethod
    def _twin(rows, quant=1_000_000):
        # rows: (group, id, x, y)
        by_g: dict = {}
        for g, i, x, y in rows:
            by_g.setdefault(g, []).append((i, round(x * quant), round(y * quant)))
        out = {}
        for g, fx in by_g.items():
            nc = nd = tx = ty = tb = 0
            for a in range(len(fx)):
                for b in range(a + 1, len(fx)):
                    lo, hi = (fx[a], fx[b]) if fx[a][0] < fx[b][0] else (fx[b], fx[a])
                    sx = (hi[1] > lo[1]) - (hi[1] < lo[1])
                    sy = (hi[2] > lo[2]) - (hi[2] < lo[2])
                    if sx * sy == 1:
                        nc += 1
                    elif sx * sy == -1:
                        nd += 1
                    elif sx == 0 and sy == 0:
                        tb += 1
                    elif sx == 0:
                        tx += 1
                    else:
                        ty += 1
            out[g] = (len(fx), nc, nd, tx, ty, tb)
        return out

    def test_matches_pair_twin(self, spark):
        from gol_tool_spark.operators import stats as ST

        rows = []
        # g0 perfectly concordant, g1 perfectly discordant, g2 mixed with
        # ties in x, y and both, g3 singleton
        for i in range(8):
            rows.append((0, i, float(i), float(i * 2)))
            rows.append((1, i, float(i), float(-i)))
        rows += [
            (2, 0, 1.0, 5.0), (2, 1, 1.0, 7.0),   # tie_x
            (2, 2, 3.0, 7.0),                     # vs 1: tie_y
            (2, 3, 3.0, 7.0),                     # vs 2: tie_both
            (2, 4, 2.0, 6.0),
        ]
        rows.append((3, 0, 9.0, 9.0))
        df = spark.createDataFrame(rows, "g int, i long, x double, y double")
        got = {
            r.g: (r.n, r.concordant, r.discordant, r.tie_x, r.tie_y, r.tie_both)
            for r in ST.kendall_tau(df, ["g"], "x", "y", "i").collect()
        }
        assert got == self._twin(rows)
        n0 = got[0][0]
        assert got[0][1] == n0 * (n0 - 1) // 2 and got[0][2] == 0  # tau = +1
        assert got[1][2] == n0 * (n0 - 1) // 2 and got[1][1] == 0  # tau = -1
        assert got[3] == (1, 0, 0, 0, 0, 0)

    def test_pair_order_invariance(self, spark):
        # shuffling input rows never changes the counts (the id_col total
        # order fixes each unordered pair exactly once)
        from gol_tool_spark.operators import stats as ST

        rows = [(0, i, float((i * 7) % 5), float((i * 3) % 4)) for i in range(12)]
        df1 = spark.createDataFrame(rows, "g int, i long, x double, y double")
        df2 = spark.createDataFrame(rows[::-1], "g int, i long, x double, y double")
        r1 = sorted(map(tuple, ST.kendall_tau(df1, ["g"], "x", "y", "i").collect()))
        r2 = sorted(map(tuple, ST.kendall_tau(df2, ["g"], "x", "y", "i").collect()))
        assert r1 == r2


class TestContingency:
    def test_matches_twin_and_zero_cells(self, spark):
        from collections import Counter
        from gol_tool_spark.operators import stats as ST

        rows = [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"), ("b", "y"),
                ("b", "y"), ("c", "x")]  # (c, y) never observed
        df = spark.createDataFrame(rows, "r string, c string")
        got = {
            (row.r, row.c): (row.n_ij, row.r_i, row.c_j, row.n, int(row.delta))
            for row in ST.contingency_components(df, "r", "c").collect()
        }
        cnt = Counter(rows)
        rm = Counter(r for r, _ in rows)
        cm = Counter(c for _, c in rows)
        n = len(rows)
        want = {
            (r, c): (cnt[(r, c)], rm[r], cm[c], n, cnt[(r, c)] * n - rm[r] * cm[c])
            for r in rm for c in cm
        }
        assert got == want
        assert got[("c", "y")][0] == 0 and got[("c", "y")][4] < 0  # empty cell present
        # deltas sum to zero over the full table (margin identity)
        assert sum(v[4] for v in got.values()) == 0

    def test_independent_columns_all_zero_delta(self, spark):
        from gol_tool_spark.operators import stats as ST

        # perfectly independent 2x2: every cell at expected rate
        rows = [("a", "x")] * 4 + [("a", "y")] * 2 + [("b", "x")] * 2 + [("b", "y")]
        df = spark.createDataFrame(rows, "r string, c string")
        deltas = [int(r.delta) for r in ST.contingency_components(df, "r", "c").collect()]
        assert deltas == [0, 0, 0, 0]


class TestDigitDistribution:
    def test_matches_twin_and_edge_digits(self, spark):
        from collections import Counter
        from gol_tool_spark.operators import stats as ST

        vals = [905, 98, 12345, 1, 9, 100, 777, 0, -205, 3]
        rows = [("g", v) for v in vals]
        df = spark.createDataFrame(rows, "g string, v long")
        got = {r.digit: (r.n, r.total)
               for r in ST.digit_distribution(df, ["g"], "v").collect()}
        lead = Counter(int(next(c for c in str(v) if c in "123456789"))
                       for v in vals if v != 0)
        total = sum(lead.values())
        assert got == {d: (n, total) for d, n in lead.items()}
        assert 0 not in got          # zero excluded from counts AND totals
        assert got[2] == (1, 9)      # -205: sign skipped, digit 2
        assert got[9] == (3, 9)      # 905, 98, 9

    def test_benford_shaped_fixture(self, spark):
        from gol_tool_spark.operators import stats as ST

        # geometric values 2^k are Benford-distributed; digit 1 must be
        # the most frequent leading digit
        rows = [("g", 1 << k) for k in range(60)]
        df = spark.createDataFrame(rows, "g string, v long")
        got = {r.digit: r.n for r in ST.digit_distribution(df, ["g"], "v").collect()}
        assert got[1] == max(got.values())
        assert sum(got.values()) == 60
