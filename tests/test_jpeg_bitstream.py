"""ITU T.81 baseline JPEG bitstream codec (kernels/jpegfile.py).

The sandbox has no second JPEG implementation, so correctness rests on
three independent legs:
  1. marker-level grammar checks against the T.81/JFIF spec (structure,
     byte stuffing, standard-table payloads);
  2. EXACT equality of decode(encode(px)) with the frequency-domain
     model computed directly from the quantization math — proving the
     whole Huffman/bitstream/marker layer is bit-lossless;
  3. PSNR/phash invariants at the engine's default quality.
A PIL cross-interop test runs wherever PIL exists (skipped here).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gol_tool_spark.kernels import image as I
from gol_tool_spark.kernels import jpegfile as J


def _model_roundtrip(px: np.ndarray, quality: int, subsampling: str) -> np.ndarray:
    """The quant/dequant reconstruction with NO entropy/bitstream layer —
    what a bit-lossless Huffman layer must reproduce exactly."""
    h, w = px.shape[:2]
    qlum, qchr = J.scaled_quant_tables(quality)
    comps = J._plane_coeffs(px, subsampling, qlum, qchr)
    planes = [
        J._dequant_idct(c, qlum if i == 0 else qchr) for i, c in enumerate(comps)
    ]
    if subsampling == "4:2:0":
        planes[1] = np.repeat(np.repeat(planes[1], 2, 0), 2, 1)
        planes[2] = np.repeat(np.repeat(planes[2], 2, 0), 2, 1)
        planes = [p[: planes[0].shape[0], : planes[0].shape[1]] for p in planes]
    ycc = np.stack(planes, axis=-1)
    return J.ycbcr_to_rgb(ycc)[:h, :w]


class TestBitstreamGrammar:
    def test_marker_structure(self):
        px = I.generate_pixels(3, 48, 32)
        d = J.jpeg_encode(px, quality=90)
        assert d[:2] == b"\xff\xd8" and d[-2:] == b"\xff\xd9"
        for m in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert m in d, m
        assert b"JFIF\x00" in d
        # SOF0 carries the true dimensions
        i = d.index(b"\xff\xc0")
        _ln, _prec, hh, ww, nc = struct.unpack(">HBHHB", d[i + 2 : i + 10])
        assert (hh, ww, nc) == (32, 48, 3)

    def test_entropy_segment_is_stuffed(self):
        px = I.generate_pixels(11, 64, 64)
        d = J.jpeg_encode(px, quality=97, restart_interval=2)
        sos = d.index(b"\xff\xda")
        scan_start = sos + 2 + struct.unpack(">H", d[sos + 2 : sos + 4])[0]
        i, n = scan_start, len(d)
        while i < n - 1:
            if d[i] == 0xFF:
                nxt = d[i + 1]
                assert nxt == 0x00 or 0xD0 <= nxt <= 0xD9, hex(nxt)
                i += 2
            else:
                i += 1

    def test_standard_tables_cover_every_encoder_symbol(self):
        # a table typo would strand some (run, size) symbol — demand full
        # coverage of the baseline symbol alphabet up front
        for tid in (0, 1):
            dc = J._ENC_TABLES[("dc", tid)]
            assert set(dc) == set(range(12))
            ac = J._ENC_TABLES[("ac", tid)]
            need = {0x00, 0xF0} | {
                (r << 4) | s for r in range(16) for s in range(1, 11)
            }
            assert need <= set(ac), sorted(need - set(ac))
        # canonical code lengths stay within the 16-bit baseline bound
        for tbl in J._ENC_TABLES.values():
            assert all(1 <= ln <= 16 for _c, ln in tbl.values())

    def test_progressive_rejected_by_name(self):
        px = I.generate_pixels(1, 16, 16)
        d = bytearray(J.jpeg_encode(px))
        i = d.index(b"\xff\xc0")
        d[i + 1] = 0xC2  # relabel the frame header as progressive
        with pytest.raises(NotImplementedError, match="SOF2"):
            J.jpeg_decode(bytes(d))


class TestEntropyLayerLossless:
    """decode(encode(px)) must EXACTLY equal the frequency-domain model:
    any Huffman/bit-packing/stuffing/restart bug surfaces as a pixel diff."""

    @pytest.mark.parametrize("hw", [(64, 64), (40, 56), (17, 23), (8, 8), (9, 13)])
    @pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
    def test_exact_vs_model(self, hw, sub):
        h, w = hw
        px = I.generate_pixels(h * 100 + w, w, h)
        got = J.jpeg_decode(J.jpeg_encode(px, quality=90, subsampling=sub))
        assert np.array_equal(got, _model_roundtrip(px, 90, sub))

    def test_exact_with_restart_markers(self):
        px = I.generate_pixels(21, 56, 40)
        base = J.jpeg_decode(J.jpeg_encode(px, quality=90))
        for ri in (1, 2, 5):
            got = J.jpeg_decode(J.jpeg_encode(px, quality=90, restart_interval=ri))
            assert np.array_equal(got, base), f"restart_interval={ri}"

    def test_exact_at_extreme_qualities(self):
        px = np.zeros((16, 16, 3), np.uint8)
        px[::2, ::2] = 255  # checkerboard: max high-frequency energy
        for q in (1, 50, 100):
            got = J.jpeg_decode(J.jpeg_encode(px, quality=q))
            assert np.array_equal(got, _model_roundtrip(px, q, "4:4:4")), q


class TestPsnrInvariants:
    def test_default_quality_clears_40db_on_fixtures(self):
        # smoothed noise is transform coding's WORST case; natural content
        # clears the bar with far lower quality settings
        for seed in (5, 42, 99):
            px = I.generate_pixels(seed, 64, 64)
            out = J.jpeg_decode(J.jpeg_encode(px, quality=I.JPEG_QUALITY))
            assert I.psnr(px, out) >= 40.0

    def test_natural_content_clears_40db_at_q85(self):
        yy, xx = np.mgrid[0:64, 0:64]
        grad = np.stack([xx * 4, yy * 4, (xx + yy) * 2], axis=-1).astype(np.uint8)
        out = J.jpeg_decode(J.jpeg_encode(grad, quality=85))
        assert I.psnr(grad, out) >= 40.0

    def test_quality_monotone(self):
        px = I.generate_pixels(5, 64, 64)
        sizes, psnrs = [], []
        for q in (30, 60, 90):
            d = J.jpeg_encode(px, quality=q)
            sizes.append(len(d))
            psnrs.append(I.psnr(px, J.jpeg_decode(d)))
        assert sizes == sorted(sizes) and psnrs == sorted(psnrs)

    def test_phash_stable_under_codec(self):
        px = I.generate_pixels(9, 64, 64)
        out = J.jpeg_decode(J.jpeg_encode(px, quality=I.JPEG_QUALITY))
        assert I.hamming64(I.phash64(px), I.phash64(out)) <= 8


class TestImageKernelIntegration:
    def test_fmt_jpeg_works_without_pil(self):
        px = I.generate_pixels(7, 64, 64)
        data = I.encode(px, "jpeg")
        assert data[:2] == b"\xff\xd8"
        out = I.decode(data, 64, 64, "jpeg")
        assert I.psnr(px, out) >= 40.0

    def test_real_jpeg_ingested_under_fmt_jpg(self):
        # real-world payloads labeled 'jpg' in the input table decode via
        # the SOI sniff, alongside DCT2 and legacy-zlib vintages
        px = I.generate_pixels(13, 32, 32)
        jfif = J.jpeg_encode(px, quality=I.JPEG_QUALITY)
        out = I.decode(jfif, 32, 32, "jpg")
        assert I.psnr(px, out) >= 40.0

    def test_decode_batch_mixed_vintages_including_jfif(self):
        import zlib

        px = I.generate_pixels(17, 24, 24)
        payloads = [
            I.encode(px, "jpg"),  # DCT2
            J.jpeg_encode(px, quality=97),  # real bitstream
            zlib.compress(I.quantize(px).tobytes()),  # legacy stand-in
        ]
        stack = I.decode_batch(payloads, 24, 24, "jpg")
        assert stack.shape == (3, 24, 24, 3)
        for i in range(3):
            assert I.psnr(px, stack[i]) >= 30.0

    def test_roundtrip_batch_fmt_jpeg(self):
        stack = np.stack([I.generate_pixels(s, 32, 32) for s in (1, 2, 3)])
        out = I.roundtrip_batch(stack, "jpeg")
        assert out.shape == stack.shape
        assert all(I.psnr_batch(stack, out) >= 40.0)


class TestPilInterop:
    """Cross-implementation proof — runs wherever PIL exists."""

    @classmethod
    def setup_class(cls):
        pytest.importorskip("PIL")

    def test_pil_decodes_our_bitstream(self):
        import io

        from PIL import Image

        px = I.generate_pixels(23, 48, 32)
        for sub in ("4:4:4", "4:2:0"):
            d = J.jpeg_encode(px, quality=95, subsampling=sub)
            got = np.asarray(Image.open(io.BytesIO(d)).convert("RGB"))
            assert got.shape == px.shape
            assert I.psnr(px, got) >= 25.0

    def test_we_decode_pil_bitstream(self):
        import io

        from PIL import Image

        px = I.generate_pixels(29, 48, 32)
        buf = io.BytesIO()
        Image.fromarray(px).save(buf, format="JPEG", quality=95)
        got = J.jpeg_decode(buf.getvalue())
        assert got.shape == px.shape
        assert I.psnr(px, got) >= 25.0
