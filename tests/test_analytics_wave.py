"""Tests for the heavy-hitters / funnel / rolling-outliers wave.

heavy_hitters: the two-pass Misra-Gries result must EQUAL the exact
GROUP BY + HAVING set regardless of partitioning (the MG candidate set is
partitioning-dependent; the recounted final set is not — that is the
operator's whole guarantee).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import stats, temporal


def _exact_frequent(spark, vals, frac):
    n = vals.count()
    import math

    thr = math.ceil(frac * n)
    return {
        (r.value, r.cnt)
        for r in vals.groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    }


class TestHeavyHitters:
    def _corpus(self, spark, n=20_000):
        # zipf-ish synthetic: value = id % (id % 97 + 1) gives a skewed
        # multiset with a few very hot small values
        return spark.range(n).select(
            (F.col("id") % (F.col("id") % 97 + 1)).cast("string").alias("value")
        )

    @pytest.mark.parametrize("parts", [1, 3, 16])
    def test_equals_exact_set_any_partitioning(self, spark, parts):
        vals = self._corpus(spark).repartition(parts)
        got = {
            (r.value, r.cnt)
            for r in stats.heavy_hitters(vals, "value", frac=0.01).collect()
        }
        assert got == _exact_frequent(spark, vals, 0.01)
        assert got  # non-vacuous

    def test_superset_guarantee_tiny_cap(self, spark):
        # even with the minimum cap (extra_cap=0) nothing frequent is lost
        vals = self._corpus(spark, 5_000).repartition(7)
        got = stats.heavy_hitters(vals, "value", frac=0.05)
        exact = _exact_frequent(spark, vals, 0.05)
        assert {(r.value, r.cnt) for r in got.collect()} == exact

    def test_nulls_excluded(self, spark):
        vals = spark.range(100).select(
            F.when(F.col("id") % 10 == 0, None).otherwise(F.lit("a")).alias("value")
        )
        rows = stats.heavy_hitters(vals, "value", frac=0.5).collect()
        assert [(r.value, r.cnt, r.n_total) for r in rows] == [("a", 90, 90)]

    def test_frac_bounds(self, spark):
        vals = spark.range(10).select(F.col("id").cast("string").alias("value"))
        with pytest.raises(ValueError):
            stats.heavy_hitters(vals, "value", frac=0.0)
        with pytest.raises(ValueError):
            stats.heavy_hitters(vals, "value", frac=1.0)

    def test_n_total_exact(self, spark):
        vals = self._corpus(spark, 1_000)
        row = stats.heavy_hitters(vals, "value", frac=0.2).collect()
        for r in row:
            assert r.n_total == 1_000


def _ev(spark, rows):
    # rows: (user, ws_offset_secs, event_id, event_type, value)
    return spark.createDataFrame(
        [
            (u, f"2024-01-01 00:00:{s:02d}", i, t, v)
            for (u, s, i, t, v) in rows
        ],
        "user_id bigint, ts string, event_id bigint, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestFunnel:
    def test_full_chain_and_ordering(self, spark):
        ev = _ev(
            spark,
            [
                (1, 5, 10, "view", 0.0),
                (1, 6, 11, "click", 0.0),
                (1, 7, 12, "purchase", 0.0),
                # user 2: purchase BEFORE view -> only stage 1 counts
                (2, 1, 20, "purchase", 0.0),
                (2, 2, 21, "view", 0.0),
                # user 3: click only -> entered funnel events but 0 stages
                (3, 1, 30, "click", 0.0),
            ],
        )
        out = {r.user_id: r for r in temporal.funnel(ev).collect()}
        assert out[1].steps_completed == 3
        assert (out[1].t1_ws, out[1].t2_ws, out[1].t3_ws) == (
            1704067205,
            1704067206,
            1704067207,
        )
        assert out[2].steps_completed == 1 and out[2].t2_ws is None
        assert out[3].steps_completed == 0 and out[3].t1_ws is None

    def test_same_second_id_tiebreak(self, spark):
        # click shares the wall second with view; larger id sorts after
        # -> counts as "after" deterministically
        ev = _ev(
            spark,
            [(1, 5, 10, "view", 0.0), (1, 5, 11, "click", 0.0)],
        )
        r = temporal.funnel(ev).collect()[0]
        assert r.steps_completed == 2
        # click with SMALLER id at the same second sorts before the view
        ev2 = _ev(
            spark,
            [(1, 5, 11, "view", 0.0), (1, 5, 10, "click", 0.0)],
        )
        r2 = temporal.funnel(ev2).collect()[0]
        assert r2.steps_completed == 1

    def test_first_chain_not_best_chain(self, spark):
        # the FIRST view anchors the chain even when a later view would
        # enable an earlier purchase pairing — first-completion semantics
        ev = _ev(
            spark,
            [
                (1, 1, 1, "view", 0.0),
                (1, 2, 2, "purchase", 0.0),  # before any click: skipped
                (1, 3, 3, "click", 0.0),
                (1, 4, 4, "purchase", 0.0),
            ],
        )
        r = temporal.funnel(ev).collect()[0]
        assert r.steps_completed == 3
        assert r.t3_ws == 1704067204

    def test_generic_k_steps(self, spark):
        ev = _ev(spark, [(1, 1, 1, "a", 0.0), (1, 2, 2, "b", 0.0)])
        out = temporal.funnel(ev, steps=("a", "b")).collect()[0]
        assert out.steps_completed == 2
        with pytest.raises(ValueError):
            temporal.funnel(ev, steps=("a",))

    def test_partitioning_independent(self, spark):
        ev = _ev(
            spark,
            [(u, s, u * 100 + s, t, 0.0) for u in range(1, 8) for s, t in
             enumerate(["view", "click", "view", "purchase", "click"])],
        )
        a = sorted(map(tuple, temporal.funnel(ev.repartition(1)).collect()))
        b = sorted(map(tuple, temporal.funnel(ev.repartition(13)).collect()))
        assert a == b


class TestRollingOutliers:
    def test_python_twin(self, spark):
        rows = [(1, s, s, "x", float(v)) for s, v in
                enumerate([1, 1, 2, 1, 50, 1, 2, 1, 1, 1])]
        ev = _ev(spark, rows)
        out = {r.id: r for r in temporal.rolling_outliers(ev, w=2).collect()}

        vals = [round(v * 1_000_000) for v in [1, 1, 2, 1, 50, 1, 2, 1, 1, 1]]

        def med(xs):
            s = sorted(xs)
            n = len(s)
            return (s[(n - 1) // 2] + s[n // 2]) / 2.0

        for i in range(len(vals)):
            wnd = vals[max(0, i - 2): i + 3]
            m = med(wnd)
            mad = med([abs(v - m) for v in wnd])
            r = out[i]
            assert r.med == m and r.mad == mad
            assert r.is_outlier == (abs(vals[i] - m) > 3.0 * mad)
        # the spike is flagged, its neighbors are not
        assert out[4].is_outlier and not out[3].is_outlier

    def test_constant_series_no_outliers(self, spark):
        ev = _ev(spark, [(1, s, s, "x", 7.0) for s in range(9)])
        rows = temporal.rolling_outliers(ev).collect()
        assert all(not r.is_outlier and r.mad == 0.0 for r in rows)

    def test_w_validation(self, spark):
        ev = _ev(spark, [(1, 0, 0, "x", 1.0)])
        with pytest.raises(ValueError):
            temporal.rolling_outliers(ev, w=0)
