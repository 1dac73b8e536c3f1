"""box_overlap_join vs a numpy all-pairs oracle: random boxes at several
zooms (cells-per-box from <1 to many), closed-boundary touching, identical
boxes, negative coords, multi-cell spans, and the two-table variant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.operators import spatial_query


def _boxes(spark, seed, n, span=1 << 28, wmax=1 << 24):
    rng = np.random.default_rng(seed)
    x = rng.integers(-span, span, n)
    y = rng.integers(-span, span, n)
    w = rng.integers(0, wmax, n)
    h = rng.integers(0, wmax, n)
    pdf = pd.DataFrame(
        {"id": np.arange(n), "minx": x, "miny": y, "maxx": x + w, "maxy": y + h}
    )
    return pdf, spark.createDataFrame(pdf)


def _brute(a: pd.DataFrame, b: pd.DataFrame | None = None, ordered=False):
    bb = a if b is None else b
    out = set()
    for ra in a.itertuples():
        for rb in bb.itertuples():
            if b is None and not (ra.id < rb.id):
                continue
            if (
                ra.minx <= rb.maxx and rb.minx <= ra.maxx
                and ra.miny <= rb.maxy and rb.miny <= ra.maxy
            ):
                out.add((ra.id, rb.id))
    return out


class TestBoxOverlapJoin:
    @pytest.mark.parametrize("zoom", [4, 8, 12])
    def test_self_join_matches_bruteforce(self, spark, zoom):
        pdf, sdf = _boxes(spark, 31, 120)
        got = {(r["id_a"], r["id_b"]) for r in
               spatial_query.box_overlap_join(sdf, zoom=zoom).collect()}
        assert got == _brute(pdf)

    def test_two_table_variant(self, spark):
        pa, sa = _boxes(spark, 41, 80)
        pb, sb = _boxes(spark, 42, 90)
        got = {(r["id_a"], r["id_b"]) for r in
               spatial_query.box_overlap_join(sa, zoom=8, other=sb).collect()}
        assert got == _brute(pa, pb)

    def test_touching_edges_count_as_overlap(self, spark):
        pdf = pd.DataFrame(
            {
                "id": [1, 2, 3],
                "minx": [0, 100, 101],
                "miny": [0, 0, 0],
                "maxx": [100, 200, 300],
                "maxy": [100, 100, 100],
            }
        )
        got = {(r["id_a"], r["id_b"]) for r in
               spatial_query.box_overlap_join(spark.createDataFrame(pdf), zoom=8).collect()}
        # 1-2 share the x=100 edge (closed boxes); 1-3 are 1 unit apart
        assert got == {(1, 2), (2, 3)}

    def test_identical_and_nested_boxes_once(self, spark):
        pdf = pd.DataFrame(
            {
                "id": [1, 2, 3],
                "minx": [-(1 << 26), -(1 << 26), -1000],
                "miny": [-(1 << 26), -(1 << 26), -1000],
                "maxx": [1 << 26, 1 << 26, 1000],
                "maxy": [1 << 26, 1 << 26, 1000],
            }
        )
        rows = spatial_query.box_overlap_join(spark.createDataFrame(pdf), zoom=6).collect()
        pairs = sorted((r["id_a"], r["id_b"]) for r in rows)
        # each intersecting pair EXACTLY once despite multi-cell covers
        assert pairs == [(1, 2), (1, 3), (2, 3)]

    def test_hot_cluster_density(self, spark):
        # many boxes in one cell + a few spanning dozens: the skew shape
        pdf, sdf = _boxes(spark, 51, 150, span=1 << 22, wmax=1 << 20)
        got = {(r["id_a"], r["id_b"]) for r in
               spatial_query.box_overlap_join(sdf, zoom=10).collect()}
        assert got == _brute(pdf)
