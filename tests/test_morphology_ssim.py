"""Loop-twin + invariant tests for morphology_stats and ssim_roundtrip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gol_tool_spark.kernels import image as IMG
from gol_tool_spark.operators import multimodal
from gol_tool_spark.sources import fixtures


def _img_df(spark, arrays, fmt="png"):
    rows = []
    for i, px in enumerate(arrays):
        h, w = px.shape[:2]
        rows.append((f"img-{i}", w, h, fmt, bytearray(IMG.encode(px, fmt))))
    return spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, bytes binary"
    )


def _loop_morph(mask):
    h, w = mask.shape

    def get(r, c):
        return mask[r, c] if 0 <= r < h and 0 <= c < w else 0

    ero = np.zeros_like(mask)
    dil = np.zeros_like(mask)
    for r in range(h):
        for c in range(w):
            nb = [get(r + dr, c + dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
            ero[r, c] = min(nb)
            dil[r, c] = max(nb)
    opened = np.zeros_like(mask)
    for r in range(h):
        for c in range(w):
            nb = [
                ero[r + dr, c + dc] if 0 <= r + dr < h and 0 <= c + dc < w else 0
                for dr in (-1, 0, 1)
                for dc in (-1, 0, 1)
            ]
            opened[r, c] = max(nb)
    return ero, dil, opened


class TestMorphology:
    def test_loop_twin(self, spark):
        rng = np.random.RandomState(7)
        arrays = [rng.randint(0, 256, (12, 9, 3), dtype=np.uint8) for _ in range(4)]
        out = {r.image_id: r for r in
               multimodal.morphology_stats(_img_df(spark, arrays), thr=128).collect()}
        for i, px in enumerate(arrays):
            p = px.astype(np.int64)
            lum = (p[..., 0] * 299 + p[..., 1] * 587 + p[..., 2] * 114) // 1000
            mask = (lum >= 128).astype(np.uint8)
            ero, dil, opened = _loop_morph(mask)
            r = out[f"img-{i}"]
            assert r.n_set == mask.sum()
            assert r.n_eroded == ero.sum()
            assert r.n_dilated == dil.sum()
            assert r.n_opened == opened.sum()
            assert r.n_px == 12 * 9

    def test_containment_chain(self, spark):
        # erosion <= opening <= mask <= dilation (anti-extensive /
        # extensive morphology laws) on the standard fixtures
        imgs = fixtures.images(spark, 40)
        rows = multimodal.morphology_stats(imgs).collect()
        assert rows
        for r in rows:
            assert r.n_eroded <= r.n_opened <= r.n_set <= r.n_dilated

    def test_all_set_all_clear(self, spark):
        white = np.full((8, 8, 3), 255, np.uint8)
        black = np.zeros((8, 8, 3), np.uint8)
        out = {r.image_id: r for r in
               multimodal.morphology_stats(_img_df(spark, [white, black])).collect()}
        w = out["img-0"]
        # zero padding: the border ring never survives erosion
        assert w.n_set == 64 and w.n_eroded == 36 and w.n_dilated == 64
        # opening of the full square dilates the 6x6 core back to 8x8
        assert w.n_opened == 64
        b = out["img-1"]
        assert b.n_set == b.n_eroded == b.n_dilated == b.n_opened == 0

    def test_speckle_removed_by_opening(self, spark):
        px = np.zeros((9, 9, 3), np.uint8)
        px[4, 4] = 255  # 1-px speckle
        r = multimodal.morphology_stats(_img_df(spark, [px])).collect()[0]
        assert r.n_set == 1 and r.n_eroded == 0 and r.n_opened == 0
        assert r.n_dilated == 9


class TestSsim:
    def test_lossless_identity_exact(self, spark):
        imgs = fixtures.images(spark, 12).filter(F.col("fmt") == "png")
        rows = multimodal.ssim_roundtrip(imgs, fmt="png").collect()
        assert rows
        for r in rows:
            assert r.ssim == 1.0
            assert r.psnr == float("inf")

    def test_lossy_bounded_and_high(self, spark):
        imgs = fixtures.images(spark, 24)
        rows = multimodal.ssim_roundtrip(imgs, fmt="jpg").collect()
        assert rows
        for r in rows:
            assert 0.0 < r.ssim <= 1.0
            assert r.psnr >= 30.0  # the codec's own floor is 40dB on RGB

    def test_structure_sensitivity(self, spark):
        # SSIM of a heavily degraded pair must fall below the codec pair:
        # compare against a quantize-to-2-levels "roundtrip" done by hand
        rng = np.random.RandomState(3)
        px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        crushed = ((px >= 128).astype(np.uint8)) * 255

        def gssim(a, b):
            a = a.astype(np.int64)
            b = b.astype(np.int64)
            lx = (a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) // 1000
            ly = (b[..., 0] * 299 + b[..., 1] * 587 + b[..., 2] * 114) // 1000
            n = lx.size
            mx, my = lx.mean(), ly.mean()
            vx, vy = lx.var(), ly.var()
            cov = (lx * ly).mean() - mx * my
            C1, C2 = 6.5025, 58.5225
            return ((2 * mx * my + C1) * (2 * cov + C2)) / (
                (mx * mx + my * my + C1) * (vx + vy + C2)
            )

        spark_ssim = multimodal.ssim_roundtrip(
            _img_df(spark, [px], fmt="jpg"), fmt="jpg"
        ).collect()[0].ssim
        assert gssim(px, crushed) < spark_ssim


def _loop_glcm(px, lv):
    h, w = px.shape[:2]
    p = px.astype(np.int64)
    lum = p[..., 0] * 299 + p[..., 1] * 587 + p[..., 2] * 114
    q = lum * lv // (255_000 + 1)
    from collections import Counter

    cnt = Counter()
    contrast = n_equal = 0
    for r in range(h):
        for c in range(w - 1):
            i, j = int(q[r, c]), int(q[r, c + 1])
            cnt[(i, j)] += 1
            contrast += (i - j) ** 2
            n_equal += int(i == j)
    energy = sum(v * v for v in cnt.values())
    return h * (w - 1), contrast, n_equal, energy


class TestGlcmStats:
    def test_matches_loop_twin(self, spark):
        rng = np.random.RandomState(7)
        arrays = [
            rng.randint(0, 256, (6, 9, 3), np.uint8),
            rng.randint(0, 256, (6, 9, 3), np.uint8),
            rng.randint(0, 256, (5, 4, 3), np.uint8),  # second shape group
        ]
        got = {
            r.image_id: (r.n_pairs, r.contrast, r.n_equal, r.energy)
            for r in multimodal.glcm_stats(_img_df(spark, arrays), levels=8).collect()
        }
        for i, px in enumerate(arrays):
            assert got[f"img-{i}"] == _loop_glcm(px, 8)
        assert any(v[1] > 0 for v in got.values())

    def test_constant_image_is_pure_diagonal(self, spark):
        px = np.full((8, 8, 3), 200, np.uint8)
        r = multimodal.glcm_stats(_img_df(spark, [px]), levels=8).collect()[0]
        assert r.n_pairs == 8 * 7
        assert r.contrast == 0 and r.n_equal == r.n_pairs
        assert r.energy == r.n_pairs ** 2  # one cell holds everything

    def test_vertical_stripes_max_contrast(self, spark):
        # alternating black/white columns: every horizontal pair crosses
        # the full level range
        px = np.zeros((4, 6, 3), np.uint8)
        px[:, 1::2, :] = 255
        r = multimodal.glcm_stats(_img_df(spark, [px]), levels=8).collect()[0]
        assert r.n_equal == 0
        assert r.contrast == r.n_pairs * 49  # |0-7|^2 per pair
        exp = _loop_glcm(px, 8)
        assert (r.n_pairs, r.contrast, r.n_equal, r.energy) == exp

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            multimodal.glcm_stats(_img_df(spark, [np.zeros((2, 2, 3), np.uint8)]), levels=1)
