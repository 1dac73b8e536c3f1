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
