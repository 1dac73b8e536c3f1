"""Loop-twin + invariant tests for image_diff / edit_images and
morans_i_bv (the change-detection + cross-ESDA wave)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.kernels import image as IMG
from gol_tool_spark.operators import geostats, multimodal
from gol_tool_spark.sources import fixtures

HALF = 1 << 31


def _pairs(a, b):
    return a.select(
        "image_id", "w", "h",
        F.col("fmt").alias("fmt_a"), F.col("bytes").alias("bytes_a"),
    ).join(
        b.select("image_id", F.col("fmt").alias("fmt_b"), F.col("bytes").alias("bytes_b")),
        "image_id",
    )


class TestImageDiff:
    def test_identity_is_exact_zero(self, spark):
        imgs = fixtures.images(spark, 30)
        rows = multimodal.image_diff(_pairs(imgs, imgs)).collect()
        assert len(rows) == 30
        for r in rows:
            assert (r.n_changed, r.sum_abs, r.max_abs) == (0, 0, 0)

    def test_planted_quadrant_exact(self, spark):
        imgs = fixtures.images(spark, 42)
        edited = fixtures.edit_images(imgs, every=7)
        out = {r.image_id: r for r in multimodal.image_diff(_pairs(imgs, edited)).collect()}
        originals = {r["image_id"]: r for r in imgs.collect()}
        for image_id, r in out.items():
            seq = int(image_id[3:])
            o = originals[image_id]
            if seq % 7 != 0:
                assert (r.n_changed, r.sum_abs, r.max_abs) == (0, 0, 0)
                continue
            px = IMG.decode(bytes(o["bytes"]), o["w"], o["h"], o["fmt"]).astype(np.int64)
            quad = px[: o["h"] // 2, : o["w"] // 2]
            # u8 inversion never fixes a pixel (255 - v == v is unsolvable)
            assert r.n_changed == quad.shape[0] * quad.shape[1]
            assert r.sum_abs == int(np.abs(255 - 2 * quad).sum())
            assert r.max_abs == int(np.abs(255 - 2 * quad).max())
            assert r.n_px == o["w"] * o["h"]

    def test_mixed_formats_decode_both_sides(self, spark):
        # pair a png against its jpg re-encode: sum_abs equals the numpy diff
        rng = np.random.RandomState(5)
        px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        a_bytes = IMG.encode(px, "png")
        b_bytes = IMG.encode(px, "jpg")
        b_dec = IMG.decode(b_bytes, 16, 16, "jpg").astype(np.int64)
        df = spark.createDataFrame(
            [("i0", 16, 16, "png", bytearray(a_bytes), "jpg", bytearray(b_bytes))],
            "image_id string, w int, h int, fmt_a string, bytes_a binary, "
            "fmt_b string, bytes_b binary",
        )
        r = multimodal.image_diff(df).collect()[0]
        d = np.abs(px.astype(np.int64) - b_dec)
        assert r.sum_abs == int(d.sum()) and r.max_abs == int(d.max())


class TestMoransBv:
    def _xy(self, spark, pts):
        return spark.createDataFrame(pts, "x long, y long")

    def test_loop_twin(self, spark):
        shift = 30
        # mark-A counts and mark-B counts on a tiny lattice
        layout = {(0, 0): (3, 1), (1, 0): (0, 4), (0, 1): (2, 2), (2, 2): (1, 0)}
        a_pts, b_pts = [], []
        for (cx, cy), (na, nb) in layout.items():
            base = ((cx << shift) - HALF + 5, (cy << shift) - HALF + 5)
            a_pts += [base] * na
            b_pts += [base] * nb
        out = geostats.morans_i_bv(
            self._xy(spark, a_pts), self._xy(spark, b_pts), cell_shift=shift
        ).collect()[0]
        n = len(layout)
        ta = sum(v[0] for v in layout.values())
        tb = sum(v[1] for v in layout.values())
        za = {k: n * v[0] - ta for k, v in layout.items()}
        zb = {k: n * v[1] - tb for k, v in layout.items()}
        num = w = 0
        for (cx, cy) in layout:
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                j = (cx + dx, cy + dy)
                if j in layout:
                    num += za[(cx, cy)] * zb[j]
                    w += 1
        assert out.n_cells == n and out.w_pairs == w
        assert int(out.num) == num
        assert int(out.den_a) == sum(v * v for v in za.values())
        assert int(out.den_b) == sum(v * v for v in zb.values())

    def test_identical_sets_reduce_to_univariate(self, spark, sf_dir):
        from gol_tool_spark.functions import synth

        pts = synth.points_df(spark, sf_dir).select("x", "y")
        bv = geostats.morans_i_bv(pts, pts, cell_shift=26).collect()[0]
        uv = geostats.morans_i(pts, cell_shift=26).collect()[0]
        # per-mark counts equal the univariate counts (same lattice, same
        # totals), so za == zb == zs and every component matches exactly
        assert bv.n_cells == uv.n_cells and bv.w_pairs == uv.w_pairs
        assert int(bv.num) == int(uv.num)
        assert int(bv.den_a) == int(uv.den) == int(bv.den_b)
