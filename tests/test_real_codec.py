"""Real-image-codec lane (round-2 VERDICT item 9) — runs ONLY when a real
image library (PIL) is importable; this sandbox ships none, so the module
skips there and lights up unchanged the moment the dependency exists.

What it checks when live: the kernels' plug-in seam (kernels/image.py
_REAL_FMTS) routes 'jpeg'/'png-real' through the real codec inside the
same batch API, with the BASELINE.json per-row invariant — PSNR >= 40 dB
for lossy round-trips, bit-exact for lossless — holding end to end,
including through the Spark mapInPandas lane.
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("PIL")

from gol_tool_spark.kernels import image as I  # noqa: E402


class TestRealCodecKernels:
    def test_seam_is_live(self):
        assert I.HAVE_REAL_CODEC

    def test_png_real_roundtrip_lossless(self):
        px = I.generate_pixels(5, 48, 32)
        out = I.decode(I.encode(px, "png-real"), 48, 32, "png-real")
        assert np.array_equal(px, out)

    def test_jpeg_roundtrip_psnr_40db(self):
        px = I.generate_pixels(7, 64, 64)
        out = I.decode(I.encode(px, "jpeg"), 64, 64, "jpeg")
        assert out.shape == px.shape
        mse = float(np.mean((px.astype(np.float64) - out.astype(np.float64)) ** 2))
        psnr = float("inf") if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)
        assert psnr >= 40.0, psnr

    def test_jpeg_phash_stable(self):
        px = I.generate_pixels(9, 64, 64)
        out = I.decode(I.encode(px, "jpeg"), 64, 64, "jpeg")
        assert I.hamming64(I.phash64(px), I.phash64(out)) <= 8


class TestRealCodecSparkLane:
    def test_mapinpandas_decode_real_fmt(self, spark):
        """The distributed decode lane must carry real-codec payloads with
        the same schema/batch shape as the stand-in fmts."""
        rows = [
            (int(i), I.encode(I.generate_pixels(i, 32, 32), "png-real"), 32, 32, "png-real")
            for i in range(8)
        ]
        df = spark.createDataFrame(
            rows, "image_id long, bytes binary, w int, h int, fmt string"
        )
        from gol_tool_spark.operators import multimodal

        rep = multimodal.verify_roundtrip(df)
        bad = rep.filter("NOT psnr_ok").count()
        assert bad == 0
