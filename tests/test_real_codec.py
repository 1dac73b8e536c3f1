"""Real-image-codec lanes.

The fmt="png" lane is a REAL PNG codec (pure numpy + stdlib zlib,
kernels/image.py) and runs UNSKIPPED in this sandbox: signature, CRC'd
chunks, all five scanline filters on decode, RGBA handling, and the
legacy stand-in stream fallback.  The BASELINE.json per-row invariant —
bit-exact pixels for lossless — holds end to end through the Spark
mapInPandas lane.

The PIL classes at the bottom additionally cross-check interop (our
encoder's bytes decode under PIL, PIL's bytes decode under ours) and the
'jpeg'/'png-real' plug-in seam; those skip only where PIL is absent.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from gol_tool_spark.kernels import image as I


def _filtered_png(pixels: np.ndarray, ftypes: list[int]) -> bytes:
    """Encode with explicit per-scanline filter types (forward filtering
    implemented independently of the library's decoder)."""
    h, w = pixels.shape[:2]
    ch = pixels.shape[2]
    color = 2 if ch == 3 else 6
    rows = []
    prior = np.zeros(w * ch, np.int32)
    for i in range(h):
        f = ftypes[i % len(ftypes)]
        cur = pixels[i].reshape(-1).astype(np.int32)
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        pleft = np.concatenate([np.zeros(ch, np.int32), prior[:-ch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - (left + prior) // 2
        elif f == 4:
            p = left + prior - pleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - pleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, pleft)
            )
            filt = cur - pred
        rows.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        I._PNG_SIG
        + I._png_chunk(b"IHDR", ihdr)
        + I._png_chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + I._png_chunk(b"IEND", b"")
    )


class TestNumpyPngCodec:
    def test_signature_and_lossless_roundtrip(self):
        px = I.generate_pixels(5, 48, 32)
        data = I.encode(px, "png")
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert data.endswith(
            I._png_chunk(b"IEND", b"")
        ), "stream must close with a CRC'd IEND chunk"
        out = I.decode(data, 48, 32, "png")
        assert np.array_equal(px, out)  # PSNR = inf: lossless
        assert I.psnr(px, out) == float("inf")

    def test_all_filter_types_decode(self):
        px = I.generate_pixels(11, 24, 16)
        for f in (0, 1, 2, 3, 4):
            out = I._png_decode(_filtered_png(px, [f]))
            assert np.array_equal(px, out), f"filter {f}"
        # mixed filters across scanlines
        out = I._png_decode(_filtered_png(px, [0, 1, 2, 3, 4]))
        assert np.array_equal(px, out)

    def test_rgba_decodes_to_rgb(self):
        px = I.generate_pixels(13, 10, 8)
        rgba = np.concatenate([px, np.full((8, 10, 1), 200, np.uint8)], axis=2)
        out = I._png_decode(_filtered_png(rgba, [0, 2]))
        assert np.array_equal(px, out)

    def test_crc_tamper_detected(self):
        data = bytearray(I.encode(I.generate_pixels(7, 16, 16), "png"))
        data[40] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            I._png_decode(bytes(data))

    def test_legacy_standin_stream_still_decodes(self):
        """Stores written before the real codec carried bare zlib streams
        under fmt='png' — decode must sniff and keep reading them."""
        px = I.generate_pixels(9, 20, 12)
        legacy = zlib.compress(px.tobytes(), 6)
        assert np.array_equal(I.decode(legacy, 20, 12, "png"), px)
        batch = [zlib.compress(I.generate_pixels(i, 20, 12).tobytes()) for i in range(4)]
        stack = I.decode_batch(batch, 20, 12, "png")
        assert stack.shape == (4, 12, 20, 3)

    def test_decode_batch_matches_scalar(self):
        pxs = [I.generate_pixels(i, 32, 24) for i in range(6)]
        payloads = [I.encode(p, "png") for p in pxs]
        stack = I.decode_batch(payloads, 32, 24, "png")
        assert stack.shape == (6, 24, 32, 3)
        for i, p in enumerate(pxs):
            assert np.array_equal(stack[i], p)
        # filtered payloads take the unfilter path, same result
        stack2 = I.decode_batch(
            [_filtered_png(p, [1, 4]) for p in pxs], 32, 24, "png"
        )
        assert np.array_equal(stack, stack2)

    def test_roundtrip_batch_lossless(self):
        pxs = np.stack([I.generate_pixels(i, 16, 16) for i in range(5)])
        out = I.roundtrip_batch(pxs, "png")
        assert np.array_equal(out, pxs)
        assert np.all(np.isinf(I.psnr_batch(pxs, out)))


class TestNumpyPngSparkLane:
    def test_mapinpandas_roundtrip_real_png(self, spark):
        """verify_roundtrip over genuine PNG payloads: every row lossless
        (psnr_ok via PSNR=inf) with caption equality."""
        pxs = [I.generate_pixels(i, 32, 32) for i in range(12)]
        rows = [
            (f"img{i}", I.encode(px, "png"), 32, 32, "png",
             f"caption {i}", I.phash64(px))
            for i, px in enumerate(pxs)
        ]
        df = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )
        from gol_tool_spark.operators import multimodal

        rep = multimodal.verify_roundtrip(df)
        assert rep.filter("NOT psnr_ok OR NOT caption_ok").count() == 0


class TestPilInterop:
    """Cross-codec checks — run only where PIL exists."""

    @classmethod
    def setup_class(cls):
        pytest.importorskip("PIL")

    def test_pil_reads_our_png(self):
        import io

        from PIL import Image

        px = I.generate_pixels(21, 40, 28)
        img = Image.open(io.BytesIO(I.encode(px, "png")))
        assert np.array_equal(np.asarray(img.convert("RGB")), px)

    def test_we_read_pil_png(self):
        import io

        from PIL import Image

        px = I.generate_pixels(22, 40, 28)
        buf = io.BytesIO()
        Image.fromarray(px).save(buf, format="PNG")
        assert np.array_equal(I._png_decode(buf.getvalue()), px)


class TestRealCodecKernels:
    @classmethod
    def setup_class(cls):
        pytest.importorskip("PIL")

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
    @classmethod
    def setup_class(cls):
        pytest.importorskip("PIL")

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
