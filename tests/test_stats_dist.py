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
