"""asof_join vs pandas.merge_asof (the reference semantics) on adversarial
random data: duplicate timestamps across sides, keys with no right rows,
strict/tolerance variants, and partitioning independence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import temporal


def _mk(spark, seed=7, n_left=400, n_right=300, n_keys=12):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    left = pd.DataFrame(
        {
            "lid": np.arange(n_left),
            "k": rng.integers(0, n_keys, n_left),
            # second-resolution so cross-side ts collisions actually happen
            "ts": base + pd.to_timedelta(rng.integers(0, 5000, n_left), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys - 2, n_right),  # keys 10,11 stay unmatched
            "ts": base + pd.to_timedelta(rng.integers(0, 5000, n_right), unit="s"),
            "rid": np.arange(n_right),
            "val": rng.normal(size=n_right).round(6),
        }
    )
    # force exact cross-side ts collisions to exercise the inclusive bound
    left.loc[: n_keys - 1, "ts"] = right.loc[: n_keys - 1, "ts"].values
    left.loc[: n_keys - 1, "k"] = right.loc[: n_keys - 1, "k"].values
    # dedupe right per (k, ts): merge_asof keeps the LAST row of equal ts;
    # asof_join resolves ties via tie_col, so align both to a unique key
    right = right.sort_values("rid").drop_duplicates(["k", "ts"], keep="last")
    ldf = spark.createDataFrame(left).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rdf = spark.createDataFrame(right).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return left, right, ldf, rdf


def _expected(left, right, strict=False, tolerance_s=None):
    kw = {}
    if tolerance_s is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance_s)
    return pd.merge_asof(
        left.sort_values(["ts", "lid"]),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=not strict,
        **kw,
    ).sort_values("lid")


def _got(ldf, rdf, **kw):
    out = temporal.asof_join(ldf, rdf, on="ts", by=["k"], prefix="m_", **kw)
    return (
        out.select("lid", "m_rid", "m_val")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )


def _norm(vals):
    # Spark nullable ints arrive in pandas as float64 (NaN for null);
    # normalize BOTH sides to None/int before comparing
    return [None if pd.isna(v) else int(v) for v in vals]


@pytest.mark.parametrize("strict", [False, True])
def test_matches_merge_asof(spark, strict):
    left, right, ldf, rdf = _mk(spark)
    exp = _expected(left, right, strict=strict)
    got = _got(ldf, rdf, strict=strict)
    assert _norm(got["m_rid"]) == _norm(exp["rid"])
    for g, e in zip(got["m_val"], exp["val"]):
        assert (pd.isna(g) and pd.isna(e)) or g == e


def test_tolerance(spark):
    left, right, ldf, rdf = _mk(spark, seed=11)
    exp = _expected(left, right, tolerance_s=600)
    got = _got(ldf, rdf, tolerance_s=600)
    assert _norm(got["m_rid"]) == _norm(exp["rid"])


def test_partitioning_independent(spark):
    _, _, ldf, rdf = _mk(spark, seed=23)
    a = _got(ldf, rdf)
    b = _got(ldf.repartition(13), rdf.repartition(3))
    assert a.equals(b)


def test_right_tie_resolution(spark):
    # two right rows at the SAME (k, ts): tie_col picks the larger rid
    ldf = spark.createDataFrame([(1, 1, "2024-01-01 00:10:00")], "lid int, k int, ts string")
    rdf = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 7, 1.0), (1, "2024-01-01 00:05:00", 9, 2.0)],
        "k int, ts string, rid int, val double",
    )
    ldf = ldf.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rdf = rdf.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = temporal.asof_join(ldf, rdf, on="ts", by=["k"], prefix="m_", tie_col="rid")
    assert got.select("m_rid").first()[0] == 9


def test_missing_on_column_raises(spark):
    ldf = spark.range(3).withColumn("ts", F.current_timestamp())
    rdf = spark.range(3)
    with pytest.raises(ValueError):
        temporal.asof_join(ldf, rdf, on="ts", by=[])


class TestCusumStats:
    @staticmethod
    def _twin(rows, quant=1_000_000):
        # rows: (user, event_id, epoch_s, value)
        by_u: dict = {}
        for u, i, s, v in rows:
            by_u.setdefault(u, []).append((s, i, round(v * quant)))
        out = {}
        for u, fx in by_u.items():
            fx.sort()
            n = len(fx)
            t = sum(v for _, _, v in fx)
            p = 0
            mx = mn = None
            for k, (_, _, v) in enumerate(fx, start=1):
                p += v
                s = n * p - k * t
                if mx is None or s > mx[0]:
                    mx = (s, k)
                if mn is None or s < mn[0]:
                    mn = (s, k)
            out[u] = (n, t, str(mx[0]), str(mn[0]), mx[1], mn[1])
        return out

    def test_matches_python_twin(self, spark):
        import datetime as dt
        from gol_tool_spark.operators import temporal

        rows = []
        for i in range(240):
            u = i % 3
            s = 1_700_000_000 + i
            # planted level shift for user 0 halfway through
            v = (i % 17) * 0.25 + (50.0 if (u == 0 and i > 120) else 0.0)
            rows.append((u, i, s, v))
        df = spark.createDataFrame(
            [(u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), v)
             for u, i, s, v in rows],
            "user_id int, event_id long, ts timestamp_ntz, value double")
        got = {r.user_id: (r.n, r.t_q, r.max_s, r.min_s, r.k_max, r.k_min)
               for r in temporal.cusum_stats(df).collect()}
        assert got == self._twin(rows)
        # the planted shift: user 0's |min_s| dominates and the argmin
        # sits near the change (values jump UP, so prefixes lag the mean)
        n0, _, mx0, mn0, _, kmin0 = got[0]
        assert -int(mn0) > int(mx0) and abs(kmin0 - 40) <= 2  # 40 = #fixes before shift

    def test_constant_series_all_zero(self, spark):
        import datetime as dt
        from gol_tool_spark.operators import temporal

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, i, t0 + dt.timedelta(seconds=i), 7.5) for i in range(5)],
            "user_id int, event_id long, ts timestamp_ntz, value double")
        r = temporal.cusum_stats(df).first()
        # s_k = 0 for every k on a constant series; smallest-k tie-break
        assert (r.max_s, r.min_s, r.k_max, r.k_min) == ("0", "0", 1, 1)
        assert r.n == 5 and r.t_q == 5 * 7_500_000


class TestAcfStats:
    @staticmethod
    def _twin(rows, lags=(1, 2, 3), quant=1_000_000):
        # rows: (user, event_id, epoch_s, value) -> {(user, lag): tuple}
        by_u: dict = {}
        for u, i, s, v in rows:
            by_u.setdefault(u, []).append((s, i, round(v * quant)))
        out = {}
        for u, fx in by_u.items():
            fx.sort()
            vs = [v for _, _, v in fx]
            for k in lags:
                xs, ys = vs[: len(vs) - k], vs[k:]
                if not xs:
                    continue
                m = len(xs)
                sx, sy = sum(xs), sum(ys)
                sxy = sum(a * b for a, b in zip(xs, ys))
                out[(u, k)] = (m, str(sx), str(sy), str(sxy), str(m * sxy - sx * sy))
        return out

    def _df(self, spark, rows):
        import datetime as dt

        return spark.createDataFrame(
            [(u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), v)
             for u, i, s, v in rows],
            "user_id int, event_id long, ts timestamp_ntz, value double")

    def test_matches_python_twin(self, spark):
        from gol_tool_spark.operators import temporal

        rows = []
        for i in range(150):
            u = i % 4
            # user 0: strong period-2 alternation -> negative lag-1, positive lag-2
            v = (10.0 if (i // 4) % 2 == 0 else -10.0) if u == 0 else (i % 13) * 0.5 - 3.0
            rows.append((u, i, 1_700_000_000 + i, v))
        got = {
            (r.user_id, r.lag): (r.n_pairs, r.sum_x, r.sum_y, r.sum_xy, r.num)
            for r in temporal.acf_stats(self._df(spark, rows)).collect()
        }
        assert got == self._twin(rows)
        # the planted alternation: user 0's lag-1 numerator is negative,
        # lag-2 positive
        assert int(got[(0, 1)][4]) < 0 < int(got[(0, 2)][4])

    def test_tie_ordering_and_short_series(self, spark):
        from gol_tool_spark.operators import temporal

        # same timestamp, ordering falls to event_id; series shorter than
        # the largest lag emits no row for it
        rows = [(1, 3, 100, 3.0), (1, 1, 100, 1.0), (1, 2, 100, 2.0)]
        got = {
            (r.user_id, r.lag): (r.n_pairs, r.sum_xy)
            for r in temporal.acf_stats(self._df(spark, rows), lags=(1, 2, 3)).collect()
        }
        q = 1_000_000
        assert got[(1, 1)] == (2, str(1 * 2 * q * q + 2 * 3 * q * q))
        assert got[(1, 2)] == (1, str(1 * 3 * q * q))
        assert (1, 3) not in got

    def test_validation(self, spark):
        import pytest
        from gol_tool_spark.operators import temporal

        with pytest.raises(ValueError):
            temporal.acf_stats(self._df(spark, [(1, 1, 0, 1.0)]), lags=(0,))

    def test_single_entity_exchange(self, spark):
        from gol_tool_spark.operators import temporal

        rows = [(i % 3, i, 1_700_000_000 + i, float(i % 7)) for i in range(60)]
        plan = temporal.acf_stats(self._df(spark, rows))._jdf.queryExecution().executedPlan().toString()
        import re

        # one exchange for the window sort, one for the final partial/final
        # agg pair — the three lags must NOT each add an exchange
        assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def _coverage_twin(rows):
    # rows: (entity, s, e); brute-force union per entity
    from collections import defaultdict

    per = defaultdict(list)
    for ent, s, e in rows:
        if e >= s:
            per[ent].append((s, e))
    out = {}
    for ent, iv in per.items():
        iv.sort()
        blocks = []
        for s, e in iv:
            if blocks and s <= blocks[-1][1]:
                blocks[-1][1] = max(blocks[-1][1], e)
            else:
                blocks.append([s, e])
        out[ent] = (
            len(iv),
            len(blocks),
            sum(e - s for s, e in blocks),
            max(e for _, e in iv) - min(s for s, _ in iv),
        )
    return out


class TestIntervalCoverage:
    def test_matches_bruteforce(self, spark):
        rows = []
        for i in range(400):
            ent = f"u{i % 7}"
            s = (i * 7919) % 10_000
            e = s + (i * 104729) % 500
            rows.append((ent, s, e))
        df = spark.createDataFrame(rows, "entity string, start_s long, end_s long")
        got = {
            r.entity: (r.n_intervals, r.n_blocks, r.covered_s, r.span_s)
            for r in temporal.interval_coverage(df).collect()
        }
        assert got == _coverage_twin(rows)
        assert any(v[1] > 1 for v in got.values())  # real gaps exist
        assert any(v[0] > v[1] for v in got.values())  # real merging happened

    def test_hand_cases(self, spark):
        rows = [
            ("a", 0, 10), ("a", 5, 20), ("a", 20, 30),  # [0,30) one block (touching merges: s <= max_e)
            ("a", 40, 50),                                # gap -> second block
            ("b", 0, 0),                                  # zero-length interval
            ("b", 10, 12),
        ]
        df = spark.createDataFrame(rows, "entity string, start_s long, end_s long")
        got = {
            r.entity: (r.n_intervals, r.n_blocks, r.covered_s, r.span_s)
            for r in temporal.interval_coverage(df).collect()
        }
        assert got["a"] == (4, 2, 40, 50)
        assert got["b"] == (2, 2, 2, 12)

    def test_inverted_rows(self, spark):
        df = spark.createDataFrame(
            [("a", 10, 5), ("a", 0, 3)], "entity string, start_s long, end_s long"
        )
        got = temporal.interval_coverage(df).collect()
        assert [(r.entity, r.n_intervals, r.covered_s) for r in got] == [("a", 1, 3)]
        with pytest.raises(ValueError):
            temporal.interval_coverage(df, validate=True)

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 1, 2)], "entity string, start_s long, end_s long")
        with pytest.raises(ValueError):
            temporal.interval_coverage(df, by=())


class TestTimeWeighted:
    def test_matches_bruteforce(self, spark):
        import datetime as dt
        from collections import defaultdict

        rows = []
        for i in range(300):
            ent = f"u{i % 5}"
            t = 1_700_000_000 + (i * 7919) % 10_000
            v = (i * 104729) % 500 - 100
            rows.append((ent, dt.datetime.utcfromtimestamp(t), t, v))
        df = spark.createDataFrame(
            [(e, ts, v) for e, ts, _, v in rows], "entity string, ts timestamp, value long"
        )
        got = {
            r.entity: (r.n_samples, r.span_s, r.twa_num)
            for r in temporal.time_weighted(df).collect()
        }
        per = defaultdict(list)
        for e, _, t, v in rows:
            per[e].append((t, v))
        expect = {}
        for e, sv in per.items():
            sv.sort()
            num = sum(v * (sv[i + 1][0] - t) for i, (t, v) in enumerate(sv[:-1]))
            expect[e] = (len(sv), sv[-1][0] - sv[0][0], str(num))
        assert got == expect
        assert any(int(v[2]) != 0 for v in got.values())

    def test_constant_value_integrates_to_span(self, spark):
        import datetime as dt

        rows = [("a", dt.datetime.utcfromtimestamp(1_700_000_000 + t), 7) for t in (0, 10, 25, 100)]
        df = spark.createDataFrame(rows, "entity string, ts timestamp, value long")
        r = temporal.time_weighted(df).collect()[0]
        assert (r.n_samples, r.span_s, r.twa_num) == (4, 100, "700")

    def test_single_sample_and_ties(self, spark):
        import datetime as dt

        ts = dt.datetime.utcfromtimestamp(1_700_000_000)
        df = spark.createDataFrame(
            [("one", ts, 42), ("tie", ts, 1), ("tie", ts, 99),
             ("tie", dt.datetime.utcfromtimestamp(1_700_000_010), 5)],
            "entity string, ts timestamp, value long",
        )
        got = {
            r.entity: (r.n_samples, r.span_s, r.twa_num)
            for r in temporal.time_weighted(df).collect()
        }
        assert got["one"] == (1, 0, "0")
        # tied samples carry zero width; the later of the tie (99) holds
        # for the 10 s interval under (t, v) ordering
        assert got["tie"] == (3, 10, "990")

    def test_validation(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [("a", dt.datetime.now(), 1)], "entity string, ts timestamp, value long"
        )
        with pytest.raises(ValueError):
            temporal.time_weighted(df, by=())


class TestMannKendall:
    @staticmethod
    def _rows():
        # user 0: rising with noise + a planted tie run; user 1: falling;
        # user 2: constant (all ties); user 3: single row (no pairs)
        rows = []
        for i in range(60):
            u = i % 3
            s = 1_700_000_000 + i
            if u == 0:
                v = i * 0.5 + (0.0 if i % 10 else 3.0)
            elif u == 1:
                v = 100.0 - i * 0.25
            else:
                v = 7.0
            rows.append((u, i, s, v))
        rows.append((3, 1000, 1_700_000_000, 5.0))
        return rows

    @staticmethod
    def _twin(rows, quant=1_000_000):
        by_u: dict = {}
        for u, i, s, v in rows:
            by_u.setdefault(u, []).append((s, i, round(v * quant)))
        out = {}
        for u, fx in by_u.items():
            fx.sort()
            vs = [v for _, _, v in fx]
            np_ = nn_ = nt_ = 0
            for a in range(len(vs)):
                for b in range(a + 1, len(vs)):
                    if vs[b] > vs[a]:
                        np_ += 1
                    elif vs[b] < vs[a]:
                        nn_ += 1
                    else:
                        nt_ += 1
            out[u] = (len(vs), np_ - nn_, np_, nn_, nt_)
        return out

    def test_matches_pair_twin(self, spark):
        import datetime as dt

        rows = self._rows()
        df = spark.createDataFrame(
            [(u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), v)
             for u, i, s, v in rows],
            "user_id int, event_id long, ts timestamp_ntz, value double")
        got = {r.user_id: (r.n, r.s, r.n_pos, r.n_neg, r.n_tie)
               for r in temporal.mann_kendall(df).collect()}
        assert got == self._twin(rows)
        # signs and edge shapes behave: rising, falling, all-tie, singleton
        assert got[0][1] > 0 and got[1][1] < 0
        assert got[2][1] == 0 and got[2][4] == got[2][0] * (got[2][0] - 1) // 2
        assert got[3] == (1, 0, 0, 0, 0)


class TestOlsTrend:
    @staticmethod
    def _twin(rows, quant=1_000_000):
        by_u: dict = {}
        for u, i, s, v in rows:
            by_u.setdefault(u, []).append((s, i, round(v * quant)))
        out = {}
        for u, fx in by_u.items():
            fx.sort()
            vs = [v for _, _, v in fx]
            n = len(vs)
            t = sum(vs)
            sky = sum((k + 1) * v for k, v in enumerate(vs))
            sk = n * (n + 1) // 2
            skk = sum((k + 1) ** 2 for k in range(n))
            out[u] = (n, t, str(n * sky - sk * t), str(n * skk - sk * sk))
        return out

    def test_matches_python_twin(self, spark):
        import datetime as dt

        rows = TestMannKendall._rows()
        df = spark.createDataFrame(
            [(u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), v)
             for u, i, s, v in rows],
            "user_id int, event_id long, ts timestamp_ntz, value double")
        got = {r.user_id: (r.n, r.t_q, r.sxy_n, r.sxx_n)
               for r in temporal.ols_trend(df).collect()}
        assert got == self._twin(rows)
        # slope signs agree with the MK verdicts on the same fixture
        assert int(got[0][2]) > 0 and int(got[1][2]) < 0 and int(got[2][2]) == 0
        # singleton: zero variance axis, zero numerator
        assert got[3][2] == "0" and got[3][3] == "0"


class TestStreaks:
    @staticmethod
    def _twin(rows, quant=1_000_000):
        by_u: dict = {}
        for u, i, s, v in rows:
            by_u.setdefault(u, []).append((s, i, round(v * quant)))
        out = {}
        for u, fx in by_u.items():
            fx.sort()
            vs = [v for _, _, v in fx]
            runs = []  # (len, start_k)
            for k, v in enumerate(vs, start=1):
                if k == 1 or v < vs[k - 2]:
                    runs.append([1, k])
                else:
                    runs[-1][0] += 1
            best = max(runs, key=lambda r: (r[0], -r[1]))
            out[u] = (len(vs), len(runs), best[0], best[1])
        return out

    def test_matches_python_twin(self, spark):
        import datetime as dt

        rows = []
        for i in range(120):
            u = i % 4
            s = 1_700_000_000 + i
            if u == 0:
                v = float(i)                     # one run of 30
            elif u == 1:
                v = float(-i)                    # 30 runs of 1
            elif u == 2:
                v = float((i // 4) % 3)          # ties extend, drops break
            else:
                v = 5.0                          # all ties: one run
            rows.append((u, i, s, v))
        rows.append((9, 0, 1_700_000_000, 1.0))  # singleton entity
        df = spark.createDataFrame(
            [(u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), v)
             for u, i, s, v in rows],
            "user_id int, event_id long, ts timestamp_ntz, value double")
        got = {r.user_id: (r.n, r.n_runs, r.max_run, r.max_run_start)
               for r in temporal.streaks(df).collect()}
        assert got == self._twin(rows)
        assert got[0] == (30, 1, 30, 1)      # monotone: one full-length run
        assert got[1] == (30, 30, 1, 1)      # strictly falling: all singleton runs
        assert got[3] == (30, 1, 30, 1)      # constant: ties never break
        assert got[9] == (1, 1, 1, 1)

    def test_tie_on_length_takes_earliest_start(self, spark):
        import datetime as dt

        # two equal-length runs: 1,2,3 | 0,1,2 -> earliest start wins
        vals = [1.0, 2.0, 3.0, 0.0, 1.0, 2.0]
        rows = [(0, i, 1_700_000_000 + i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            [(u, i, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None), v)
             for u, i, s, v in rows],
            "user_id int, event_id long, ts timestamp_ntz, value double")
        r = temporal.streaks(df).collect()[0]
        assert (r.n, r.n_runs, r.max_run, r.max_run_start) == (6, 2, 3, 1)
