"""interval_join vs a pandas brute-force window join, and resample_locf vs
pandas reindex+ffill — random data with duplicate timestamps, negative
window bounds, keys with no matches, and bucket-boundary adversaries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import temporal


def _events(spark, seed, n, n_keys, span_s=5000):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    pdf = pd.DataFrame(
        {
            "eid": np.arange(n),
            "k": rng.integers(0, n_keys, n),
            "ts": base + pd.to_timedelta(rng.integers(0, span_s, n), unit="s"),
            "val": rng.normal(size=n).round(6),
        }
    )
    sdf = spark.createDataFrame(pdf).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return pdf, sdf


def _brute_pairs(left, right, lower_s, upper_s):
    m = left.merge(right, on="k", suffixes=("_l", "_r"))
    d = (m["ts_r"] - m["ts_l"]).dt.total_seconds()
    m = m[(d >= lower_s) & (d <= upper_s)]
    return set(zip(m["eid_l"], m["eid_r"]))


class TestIntervalJoin:
    @pytest.mark.parametrize("lower,upper", [(0, 60), (-30, 30), (10, 10), (-300, -60)])
    def test_matches_bruteforce(self, spark, lower, upper):
        lp, ls = _events(spark, 11, 300, 8)
        rp, rs = _events(spark, 12, 400, 8)
        got = temporal.interval_join(
            ls, rs.withColumnRenamed("eid", "rid").drop("val"),
            on="ts", by=["k"], lower_s=lower, upper_s=upper,
        )
        pairs = {(r["eid"], r["r_rid"]) for r in got.collect()}
        want = _brute_pairs(lp, rp.rename(columns={"eid": "rid"}).rename(
            columns={"rid": "eid"}), lower, upper)
        assert pairs == want

    def test_bucket_boundary_exact(self, spark):
        # right rows exactly ON the window bounds must be included (closed
        # interval), even when they land in the neighboring bucket
        base = pd.Timestamp("2024-01-01")
        lp = pd.DataFrame({"eid": [1], "k": [0], "ts": [base]})
        rp = pd.DataFrame(
            {"rid": [10, 11, 12, 13], "k": 0,
             "ts": [base, base + pd.Timedelta(seconds=60),
                    base - pd.Timedelta(seconds=1), base + pd.Timedelta(seconds=61)]}
        )
        ls = spark.createDataFrame(lp).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        rs = spark.createDataFrame(rp).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        got = temporal.interval_join(ls, rs, on="ts", by=["k"], lower_s=0, upper_s=60)
        assert {r["r_rid"] for r in got.collect()} == {10, 11}

    def test_duplicate_ts_pairs_all(self, spark):
        # three right rows at one instant -> three pairs (a JOIN, not asof)
        base = pd.Timestamp("2024-01-01")
        ls = spark.createDataFrame(
            pd.DataFrame({"eid": [1], "k": [0], "ts": [base]})
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        rs = spark.createDataFrame(
            pd.DataFrame({"rid": [1, 2, 3], "k": 0, "ts": [base] * 3})
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        got = temporal.interval_join(ls, rs, on="ts", by=["k"], lower_s=0, upper_s=5)
        assert sorted(r["r_rid"] for r in got.collect()) == [1, 2, 3]

    def test_rejects_inverted_window(self, spark):
        _, ls = _events(spark, 1, 10, 2)
        with pytest.raises(ValueError):
            temporal.interval_join(ls, ls, on="ts", by=["k"], lower_s=5, upper_s=-5)


class TestResampleLocf:
    def test_matches_pandas_ffill(self, spark):
        pdf, sdf = _events(spark, 21, 500, 6, span_s=40000)
        # unique (k, ts): LOCF at a tie is order-dependent; align both sides
        pdf = pdf.sort_values("eid").drop_duplicates(["k", "ts"], keep="last")
        sdf = (
            sdf.withColumn(
                "_rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"]).Window
                    .partitionBy("k", "ts").orderBy(F.col("eid").desc())
                ),
            ).filter(F.col("_rn") == 1).drop("_rn")
        )
        step = 3600
        got = temporal.resample_locf(
            sdf.select("k", "ts", "val"), on="ts", by=["k"], values=["val"], step_s=step
        ).toPandas()

        expected = []
        for k, g in pdf.groupby("k"):
            g = g.sort_values("ts")
            e = g["ts"].astype("int64") // 10**9
            g0 = -(-e.min() // step) * step
            g1 = (e.max() // step) * step
            if g0 > g1:
                continue
            grid = pd.to_datetime(np.arange(g0, g1 + 1, step), unit="s")
            ser = g.set_index("ts")["val"].reindex(
                g["ts"].tolist() + list(grid)
            ).sort_index().ffill()
            for t in grid:
                expected.append((k, t, ser.loc[t] if not isinstance(ser.loc[t], pd.Series) else ser.loc[t].iloc[-1]))
        want = pd.DataFrame(expected, columns=["k", "ts", "val"])
        got = got.sort_values(["k", "ts"]).reset_index(drop=True)
        want = want.sort_values(["k", "ts"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
        assert (got["ts"].to_numpy() == want["ts"].to_numpy()).all()
        np.testing.assert_allclose(got["val"].to_numpy(), want["val"].to_numpy())

    def test_observation_on_grid_point_inclusive(self, spark):
        base = pd.Timestamp("2024-01-01")  # midnight = a 3600-grid point
        sdf = spark.createDataFrame(
            pd.DataFrame({"k": [0, 0], "ts": [base, base + pd.Timedelta(hours=2)],
                          "val": [1.0, 2.0]})
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        got = temporal.resample_locf(sdf, on="ts", by=["k"], values=["val"], step_s=3600)
        rows = sorted((r["ts"], r["val"]) for r in got.collect())
        assert [v for _, v in rows] == [1.0, 1.0, 2.0]

    def test_key_with_single_row_window(self, spark):
        # min==max inside one grid interval -> no grid point, key absent
        base = pd.Timestamp("2024-01-01 00:30:00")
        sdf = spark.createDataFrame(
            pd.DataFrame({"k": [7], "ts": [base], "val": [3.0]})
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        got = temporal.resample_locf(sdf, on="ts", by=["k"], values=["val"], step_s=3600)
        assert got.count() == 0
